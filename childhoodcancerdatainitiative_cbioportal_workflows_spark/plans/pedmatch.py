"""Pedmatch tumor/normal somatic calling pipeline (reference:
``workflows/pedmatch-clinical-vcf-workflow.py`` pedmatch_clinical_vcf_flow,
pedmatch:704).

The reference processes one patient at a time (4-worker pool), shelling out
to bcftools for the SNV chain. Here the whole cohort is set-oriented: one
scan of all clinical VCFs keyed by ``input_file_name()``, patient pairing as
a manifest self-join, fusion pairing as a window, the bcftools chain
(sort / merge -m id / norm -m -any / view -i) as join + explode + typed
filters, and add_vaf as a broadcast join. Spark's parallelism replaces the
reference's 4/8/10-thread pools.

Fidelity note: the reference's FT gymnastics (rewriting FILTER into the
FORMAT-encoded sample column so bcftools merge preserves it,
pedmatch:326-351, then extracting it back at pedmatch:385-390) exists only
because the per-sample FILTER crosses a process boundary; in-engine the
tumor/normal FILTER columns simply survive the merge join. Same observable
semantics, no round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.genomics import basename, copy_number_to_log2, gistic_call, strip_chr
from ..operators.dedup import keep_first
from ..operators.pairing import pair_rows
from ..operators.pivot import to_wide_matrix
from ..sources.vcf import read_vcf

FUSION_OUTPUT_COLS = [
    "Sample_Id", "SV_Status", "Site1_Hugo_Symbol", "Site1_Region_Number",
    "Site2_Hugo_Symbol", "Site2_Region_Number", "NCBI_Build", "Class",
    "Method", "Event_Info", "Annotation", "DNA_Support", "RNA_Support",
    "Tumor_Read_Count", "Site1_Chromosome", "Site1_Position",
    "Site2_Chromosome", "Site2_Position",
]


def pair_patients(manifest: DataFrame) -> DataFrame:
    """Patient pairing (pedmatch:579-602): per participant exactly one
    tissue + one blood row, others skipped. Manifest self-join, not a loop."""
    t = manifest.filter(F.col("sample_type") == "tissue").select(
        "participant_id",
        F.col("sample_id").alias("tumor_sample_id"),
        F.col("file_name").alias("tumor_file"),
    )
    n = manifest.filter(F.col("sample_type") == "blood").select(
        "participant_id",
        F.col("sample_id").alias("normal_sample_id"),
        F.col("file_name").alias("normal_file"),
    )
    counts = manifest.groupBy("participant_id").agg(
        F.sum((F.col("sample_type") == "tissue").cast("int")).alias("n_t"),
        F.sum((F.col("sample_type") == "blood").cast("int")).alias("n_n"),
    )
    ok = counts.filter((F.col("n_t") == 1) & (F.col("n_n") == 1)).select("participant_id")
    return t.join(n, "participant_id").join(F.broadcast(ok), "participant_id", "left_semi")


def read_clinical_vcfs(spark: SparkSession, vcf_dir: str, manifest: DataFrame) -> DataFrame:
    """One scan over all clinical VCFs (FIXTURES.md §5: 9 fixed cols + one
    FORMAT-encoded sample column), stamped with sample_id via manifest join
    and a deterministic in-file row order (the pandas implicit index the
    fusion pairing relied on, pedmatch:127-128)."""
    files = [r.file_name for r in manifest.select("file_name").collect()]
    paths = [f"{vcf_dir}/{f}" for f in files]
    vcf = read_vcf(spark, paths, sample_cols=["SAMPLE_FMT"]).withColumn(
        "file_name", basename(F.input_file_name())
    )
    vcf = vcf.withColumn("row_order", F.monotonically_increasing_id())
    ids = manifest.select("file_name", "sample_id", "sample_type", "participant_id")
    return vcf.join(F.broadcast(ids), "file_name", "left")


def prep_clinical_vcf(vcf: DataFrame) -> DataFrame:
    """clin_vcf_file_prep (pedmatch:55-71): PASS only."""
    return vcf.filter(F.col("FILTER") == "PASS")


# ------------------------------------------------------------------- fusions

def fusion_prep(vcf: DataFrame) -> DataFrame:
    """fusion_file_prep (pedmatch:90-153): SVTYPE=Fusion rows, INFO regex
    extracts, 2-at-a-time breakend pairing per (sample, FUSION_ID) in file
    order. Emits the 18-column cBio SV shape. (The reference's loop would
    IndexError on an odd trailing breakend; unpaired rows are dropped here.)
    Exact-duplicate breakend records collapse before pairing (norm -d
    exact, r17 find: duplicates re-pair across copies); fusion tables
    are SV-sized, so the distinct's exchange is noise."""
    f = vcf.filter(
        F.coalesce(F.col("INFO").contains("SVTYPE=Fusion"), F.lit(False))
    ).dropDuplicates().select(
        "sample_id",
        "CHROM",
        "POS",
        "row_order",
        F.split(F.col("ID"), "_").getItem(0).alias("FUSION_ID"),
        F.nullif(F.regexp_extract("INFO", r"GENE_NAME=([^;]+)", 1), F.lit("")).alias("GENE"),
        F.nullif(F.regexp_extract("INFO", r"EXON_NUM=([^;]+)", 1), F.lit("")).alias("EXON"),
        F.nullif(F.regexp_extract("INFO", r"ANNOTATION=([^;]+)", 1), F.lit("")).alias("Annotation"),
        F.nullif(F.regexp_extract("INFO", r"READ_COUNT=([^;]+)", 1), F.lit("")).alias("Tumor_Read_Count"),
    )
    f = f.withColumn("_grp", F.concat_ws("|", "sample_id", "FUSION_ID"))
    paired = pair_rows(
        f,
        group_col="_grp",
        order_col="row_order",
        pair_cols=["GENE", "EXON", "CHROM", "POS", "Annotation", "Tumor_Read_Count"],
    )
    return paired.select(
        F.col("sample_id").alias("Sample_Id"),
        F.lit("SOMATIC").alias("SV_Status"),
        F.col("GENE_1").alias("Site1_Hugo_Symbol"),
        F.col("EXON_1").alias("Site1_Region_Number"),
        F.col("GENE_2").alias("Site2_Hugo_Symbol"),
        F.col("EXON_2").alias("Site2_Region_Number"),
        F.lit("GRCh37").alias("NCBI_Build"),
        F.lit("Fusion").alias("Class"),
        F.lit("Oncomine").alias("Method"),
        F.col("FUSION_ID").alias("Event_Info"),
        F.col("Annotation_2").alias("Annotation"),
        F.lit("No").alias("DNA_Support"),
        F.lit("Yes").alias("RNA_Support"),
        F.col("Tumor_Read_Count_2").alias("Tumor_Read_Count"),
        F.col("CHROM_1").alias("Site1_Chromosome"),
        F.col("POS_1").alias("Site1_Position"),
        F.col("CHROM_2").alias("Site2_Chromosome"),
        F.col("POS_2").alias("Site2_Position"),
    )


def fusion_germline_subtract(fusions: DataFrame, pairs: DataFrame) -> DataFrame:
    """fusion_flow germline subtraction (pedmatch:172-179): drop tumor
    fusions whose 4 site keys also appear in the paired normal. The
    left-join+indicator+drop-'both' is an anti-join on the site keys."""
    keys = [
        "Site1_Hugo_Symbol", "Site2_Hugo_Symbol",
        "Site1_Region_Number", "Site2_Region_Number",
    ]
    tumor = fusions.join(
        F.broadcast(pairs.select(F.col("tumor_sample_id").alias("Sample_Id"), "normal_sample_id")),
        "Sample_Id",
        "inner",
    )
    normal = fusions.select(
        F.col("Sample_Id").alias("normal_sample_id"), *keys
    )
    return tumor.join(
        normal, on=["normal_sample_id", *keys], how="left_anti"
    ).drop("normal_sample_id").select(*FUSION_OUTPUT_COLS)


# ---------------------------------------------------------------------- CNVs

def cnv_prep(vcf: DataFrame) -> DataFrame:
    """cnv_file_prep (pedmatch:186-225): ALT=='<CNV>' & Amplification rows,
    INFO extracts, log2(raw_cn/2). Long .seg-shaped output."""
    c = vcf.filter(
        (F.col("ALT") == "<CNV>")
        & F.coalesce(F.col("INFO").contains("Amplification"), F.lit(False))
    )
    raw_cn = F.nullif(F.regexp_extract("INFO", r"RAW_CN=([^;]+)", 1), F.lit("")).cast("double")
    return c.select(
        F.col("sample_id").alias("ID"),
        F.split(F.col("sample_id"), "_").getItem(0).alias("Patient_Id"),
        F.col("ID").alias("Hugo_Symbol"),
        F.col("CHROM").alias("chrom"),
        F.col("POS").alias("loc.start"),
        F.nullif(F.regexp_extract("INFO", r"END=([^;]+)", 1), F.lit("")).cast("long").alias("loc.end"),
        F.nullif(F.regexp_extract("INFO", r"NUMTILES=([^;]+)", 1), F.lit("")).alias("num.mark"),
        copy_number_to_log2(raw_cn).alias("seg.mean"),
        raw_cn.alias("copy_number"),
    )


def cnv_germline_subtract(cnvs: DataFrame, pairs: DataFrame) -> DataFrame:
    """cnv_flow (pedmatch:289-308): tumor CNVs minus paired-normal CNVs by
    Hugo_Symbol (anti-join)."""
    tumor = cnvs.join(
        F.broadcast(pairs.select(F.col("tumor_sample_id").alias("ID"), "normal_sample_id")),
        "ID",
        "inner",
    )
    normal = cnvs.select(
        F.col("ID").alias("normal_sample_id"), F.col("Hugo_Symbol")
    )
    return tumor.join(
        normal, on=["normal_sample_id", "Hugo_Symbol"], how="left_anti"
    ).drop("normal_sample_id")


def cnv_segment_table(cnvs: DataFrame) -> DataFrame:
    """cnv_segment_file_prep (pedmatch:228-243): 6-col .seg, chr stripped,
    integer positions."""
    return cnvs.select(
        "ID",
        strip_chr(F.col("chrom").cast("string")).alias("chrom"),
        F.col("`loc.start`").cast("long").alias("loc.start"),
        F.col("`loc.end`").cast("long").alias("loc.end"),
        F.col("`num.mark`"),
        F.col("`seg.mean`"),
    )


def cnv_discrete_matrix(cnvs: DataFrame) -> DataFrame:
    """cnv_discrete_file_prep (pedmatch:246-268): GISTIC bins pivoted to a
    gene x sample int matrix, 0 fill."""
    long = cnvs.select(
        "Hugo_Symbol", "ID", gistic_call(F.col("`seg.mean`")).alias("discrete_copy_number")
    )
    return to_wide_matrix(
        long, index="Hugo_Symbol", column="ID", value="discrete_copy_number", fill=0
    )


def cnv_log2_matrix(cnvs: DataFrame) -> DataFrame:
    """cnv_log2_continuous_file_prep (pedmatch:271-286): log2 pivot, NA fill."""
    long = cnvs.select(
        "Hugo_Symbol", "ID", F.col("`seg.mean`").cast("string").alias("seg.mean")
    )
    return to_wide_matrix(
        long, index="Hugo_Symbol", column="ID", value="seg.mean", fill="NA"
    )


# ---------------------------------------------------------------------- SNVs

# FORMAT-field positions (pedmatch:378-413): GT=0, DP=2, FRO=5, FAO=7, AF=8
_GT, _DP, _FRO, _FAO, _AF = 0, 2, 5, 7, 8


def _fmt(col: F.Column, idx: int) -> F.Column:
    return F.when(col.isNull(), F.lit("NA")).otherwise(
        F.split(col, ":").getItem(idx)
    )


# the bcftools `merge -m id` identity: pair scope + variant identity.
# Both sides of the full-outer merge are keyed on exactly these columns;
# the bucketed layout (plans/pedmatch_bucketed.py) bucketBys on them so
# the merge plans with zero Exchange.
SNV_MERGE_KEYS = ["normal_sample_id", "CHROM", "POS", "ID", "REF", "ALT"]


def snv_merge_sides(
    vcf: DataFrame, pairs: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """The tumor/normal sides of the variant merge (pedmatch:311-410):
    multiallelics split, each side scoped to its cohort role via a
    broadcast of the (tiny) pairs table, projected to the merge key +
    its per-side FILTER/FORMAT payload.

    Variant-identity uniqueness is ENFORCED per side (r17 adversarial
    find: duplicate records sharing a merge key fan the full-outer join
    out m x n, where bcftools would collapse them under ``norm -d
    exact`` before ``merge -m id``). The pin is INTENTIONALLY STRONGER
    than ``norm -d exact`` (r17 advice, documented): norm collapses only
    bit-identical records, while this keep-first collapses to ONE
    canonical record per variant identity even when payloads differ,
    chosen by a total payload sort — same-key/different-payload records
    are caller data-quality errors and a deterministic winner beats an
    m x n fan-out either way. The tumor side keys on the merge keys PLUS
    ``tumor_sample_id`` (two tumors paired to one normal must BOTH
    survive — r17 advice), via a run-boundary window still partitioned
    on exactly the join keys (operators/dedup.keep_first_per_run), so
    the merge reuses the window's exchange — shuffle-free relative to
    the join it precedes on both sides."""
    # split multiallelics BEFORE the merge join so allele-level identity
    # aligns (bcftools norm after merge; equivalent since the join key
    # includes ALT and split rows re-join per allele)
    v = vcf.withColumn("ALT", F.explode(F.split(F.col("ALT"), ",")))

    pair_t = pairs.select(
        F.col("tumor_sample_id"), F.col("normal_sample_id")
    )
    from ..operators.dedup import keep_first, keep_first_per_run

    t = v.join(
        F.broadcast(pair_t),
        v["sample_id"] == pair_t["tumor_sample_id"],
        "inner",
    ).select(
        "tumor_sample_id", "normal_sample_id",
        "CHROM", "POS", "ID", "REF", "ALT", "QUAL", "INFO", "FORMAT",
        F.col("FILTER").alias("tumor_FILTER"),
        F.col("SAMPLE_FMT").alias("tumor_fmt"),
    )
    t = keep_first_per_run(
        t,
        SNV_MERGE_KEYS,
        "tumor_sample_id",
        [F.col(c).asc_nulls_first() for c in
         ("tumor_FILTER", "tumor_fmt", "QUAL", "INFO", "FORMAT")],
    )
    n = v.join(
        F.broadcast(pairs.select("normal_sample_id")),
        v["sample_id"] == F.col("normal_sample_id"),
        "inner",
    ).select(
        "normal_sample_id",
        "CHROM", "POS", "ID", "REF", "ALT",
        F.col("FILTER").alias("normal_FILTER"),
        F.col("SAMPLE_FMT").alias("normal_fmt"),
    )
    n = keep_first(
        n,
        SNV_MERGE_KEYS,
        [F.col(c).asc_nulls_first() for c in ("normal_FILTER", "normal_fmt")],
    )
    return t, n


def snv_somatic(vcf: DataFrame, pairs: DataFrame) -> DataFrame:
    """The SNV chain (pedmatch:311-464) as relational ops.

    bcftools merge -m id  -> full-outer join of tumor/normal on the variant
    identity (CHROM, POS, ID, REF, ALT); norm -m -any -> explode of
    comma-split ALT (each allele keeps its row's FORMAT payloads, as bcftools
    does for per-sample fields of split records); view -i depth/AF gate and
    the compound somatic filter -> typed column predicates. Output carries
    the somatic VCF columns + af table columns."""
    t, n = snv_merge_sides(vcf, pairs)
    merged = t.join(n, on=SNV_MERGE_KEYS, how="full_outer")
    return snv_somatic_filter(merged)


def snv_somatic_filter(merged: DataFrame) -> DataFrame:
    """The post-merge tail of the SNV chain (pedmatch:378-464): FORMAT
    unpacking, the depth/AF gate, the compound somatic predicate, and
    the forced FILTER='PASS' rewrite — over the already-merged
    tumor/normal frame (from :func:`snv_somatic` in-flight, or the
    bucketed exchange-free merge in plans/pedmatch_bucketed.py)."""
    unpacked = (
        merged.withColumn("tumor_gt", _fmt(F.col("tumor_fmt"), _GT))
        .withColumn("normal_gt", _fmt(F.col("normal_fmt"), _GT))
        # in-engine the per-side FILTER survives the join; the reference's
        # FT round-trip (pedmatch:326-351,385-390) reconstructed exactly this
        .withColumn("tumor_filter", F.coalesce(F.col("tumor_FILTER"), F.lit("NA")))
        .withColumn("normal_filter", F.coalesce(F.col("normal_FILTER"), F.lit("NA")))
        # numeric casts see NULL for a missing side, not the 'NA' sentinel:
        # the reference's pandas NaN becomes SQL NULL, the depth/AF gates
        # drop the row, and ANSI mode never sees a malformed cast (an
        # unmatched full-outer row crashed here before the nullif)
        .withColumn(
            "tumor_af",
            F.nullif(_fmt(F.col("tumor_fmt"), _AF), F.lit("NA")).cast("double"),
        )
        .withColumn(
            "normal_af",
            F.nullif(_fmt(F.col("normal_fmt"), _AF), F.lit("NA")).cast("double"),
        )
        .withColumn(
            "t_depth",
            F.nullif(_fmt(F.col("tumor_fmt"), _DP), F.lit("NA")).cast("long"),
        )
        .withColumn(
            "n_depth",
            F.nullif(_fmt(F.col("normal_fmt"), _DP), F.lit("NA")).cast("long"),
        )
        .withColumn("t_alt_count", _fmt(F.col("tumor_fmt"), _FAO))
        .withColumn("t_ref_count", _fmt(F.col("tumor_fmt"), _FRO))
    )

    # bcftools view -i 'DP[0]>=20 && DP[1]>=15 && AF[0:0]>=0.05 && AF[1:0]<=0.02'
    gated = unpacked.filter(
        (F.col("t_depth") >= 20)
        & (F.col("n_depth") >= 15)
        & (F.col("tumor_af") >= 0.05)
        & (F.col("normal_af") <= 0.02)
    )
    # compound somatic predicate (pedmatch:441)
    somatic = gated.filter(
        (F.col("tumor_filter") == "PASS")
        & ~F.coalesce(F.col("INFO").contains("SVTYPE"), F.lit(False))
        & (F.col("tumor_gt") != "0/0")
        & (F.col("normal_gt") != F.col("tumor_gt"))
    )
    # forced FILTER='PASS' rewrite (pedmatch:446)
    return somatic.withColumn("FILTER", F.lit("PASS"))


def write_somatic_vcf(
    somatic: DataFrame, out_dir: str, tumor_sample_id: str
) -> dict[str, str]:
    """Somatic-SNV output files (pedmatch:443-460): the filtered somatic
    table as ``{id}_somatic_snvs.vcf`` — the reference's ``to_csv`` contract
    (tab-separated, column-name header row, no ``##`` meta; it feeds Genome
    Nexus, not bcftools) — plus the ``_backup`` copy kept for filter
    forensics. Real header-preserving VCF emission is
    ``sources.vcf.write_vcf``."""
    import os
    import shutil

    from ..sources.tsv import write_tsv

    main = os.path.join(out_dir, f"{tumor_sample_id}_somatic_snvs.vcf")
    backup = os.path.join(out_dir, f"{tumor_sample_id}_somatic_snvs_backup.vcf")
    write_tsv(somatic, main)
    shutil.copyfile(main, backup)
    return {"somatic_vcf": main, "backup": backup}


def af_table(somatic: DataFrame) -> DataFrame:
    """Per-variant allele-fraction table (pedmatch:459-462)."""
    return somatic.select(
        F.col("CHROM").alias("Chromosome"),
        F.col("POS").alias("Start_Position"),
        "t_alt_count",
        "t_ref_count",
        F.col("tumor_sample_id").alias("Tumor_Sample_Barcode"),
    )


def add_vaf(maf: DataFrame, af: DataFrame) -> DataFrame:
    """add_vaf (pedmatch:673-699): overwrite t_alt_count / t_ref_count from
    the af table by (barcode, chromosome, position); no match -> ''.

    The reference's O(n*m) per-row apply with ``.values[0]`` (first match)
    becomes keep-first dedup + broadcast left join."""
    af_clean = af.withColumn(
        "Chromosome",
        F.replace(
            F.replace(
                F.replace(F.col("Chromosome").cast("string"), F.lit("chr"), F.lit("")),
                F.lit("Chr"), F.lit(""),
            ),
            F.lit(".0"), F.lit(""),
        ),
    ).withColumn("Start_Position", F.col("Start_Position").cast("long"))
    af_clean = af_clean.withColumn("_ord", F.monotonically_increasing_id())
    af_first = keep_first(
        af_clean,
        ["Tumor_Sample_Barcode", "Chromosome", "Start_Position"],
        [F.col("_ord").asc()],
    ).select(
        "Tumor_Sample_Barcode", "Chromosome", "Start_Position",
        F.col("t_alt_count").alias("_alt"), F.col("t_ref_count").alias("_ref"),
    )
    out = maf.withColumn("Start_Position", F.col("Start_Position").cast("long")).join(
        F.broadcast(af_first),
        on=["Tumor_Sample_Barcode", "Chromosome", "Start_Position"],
        how="left",
    )
    return (
        out.withColumn("t_alt_count", F.coalesce(F.col("_alt").cast("string"), F.lit("")))
        .withColumn("t_ref_count", F.coalesce(F.col("_ref").cast("string"), F.lit("")))
        .drop("_alt", "_ref")
    )
