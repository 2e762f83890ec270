"""CNV transform pipeline (reference: ``workflows/cnv.py`` cnv_flow, cnv.py:487).

The reference runs: per-file JSON parse -> concat -> strip chr -> .seg
projection -> GTF gene-list formatting -> bedtools intersect -f 0.5 ->
cut/sed cleanup -> two pivots (log2 + GISTIC) -> count reconciliation, with
every stage materialized to local TSV. Here stages 3-12 of the flow are one
lazy DataFrame DAG; the only barriers are the declared sinks. The bedtools
process boundary becomes the in-plan binned interval join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.genomics import add_chr, gistic_call, strip_chr
from ..operators.dedup import keep_first
from ..operators.interval_join import interval_join
from ..operators.pivot import to_wide_matrix
from ..operators.reconcile import reconcile_counts
from ..sources.json_docs import read_cnv_json

SEG_COLUMNS = ["ID", "chrom", "loc.start", "loc.end", "num.mark", "seg.mean"]


def parse_segments(spark: SparkSession, cnv_json_paths: list[str] | str) -> DataFrame:
    """Raw long segment table (cnv.py:238-314 parse_segments_flow): one row
    per (sample, segment), 'chr' prefix stripped from chrom."""
    seg = read_cnv_json(spark, cnv_json_paths)
    return seg.withColumn("chrom", strip_chr(F.col("chrom")))


def to_seg_file(segments: DataFrame) -> DataFrame:
    """cBio .seg projection (cnv.py:288-310): ID, chrom, loc.start, loc.end,
    num.mark (supporting points), seg.mean (log2 ratio)."""
    return segments.select(
        F.col("sample_id").alias("ID"),
        F.col("chrom"),
        F.col("start").alias("loc.start"),
        F.col("end").alias("loc.end"),
        F.col("cnv_supporting_points").alias("num.mark"),
        F.col("log2_copy_ratio").alias("seg.mean"),
    )


def gene_list_format(gtf: DataFrame) -> DataFrame:
    """GENCODE GTF -> deduplicated protein-coding gene BED (cnv.py:349-392).

    Input columns (positional GTF): c0 seqname, c2 feature, c3 start, c4 end,
    c8 attributes. Steps: keep feature=='gene' & protein_coding &
    not readthrough & chrom != chrM (cnv.py:356); extract gene_name(s) from
    the attribute string (cnv.py:360-368); same-locus dedup keep-first
    (cnv.py:372); longest-length dedup per (chrom, gene) (cnv.py:376);
    0-based BED shift start-1 (cnv.py:382)."""
    g = gtf.select(
        F.col("c0").alias("chrom"),
        F.col("c2").alias("feature"),
        F.col("c3").cast("long").alias("start"),
        F.col("c4").cast("long").alias("end"),
        F.col("c8").alias("tags"),
    )
    g = g.filter(
        (F.col("feature") == "gene")
        & F.col("tags").contains("protein_coding")
        & ~F.col("tags").contains("readthrough_gene")
        & (F.col("chrom") != "chrM")
    )
    # extract_genes (cnv.py:360-368): entries containing 'gene_name', strip
    # the key and quotes, join multiples with ';'
    entries = F.split(F.col("tags"), ";")
    matches = F.filter(entries, lambda x: x.contains("gene_name"))
    cleaned = F.transform(
        matches,
        lambda x: F.trim(F.replace(F.replace(F.trim(x), F.lit("gene_name"), F.lit("")), F.lit('"'), F.lit(""))),
    )
    g = g.withColumn("gene_names", F.array_join(cleaned, ";")).drop("feature")

    # same-locus dedup: order by (chrom,start,end) keep first — tie-break on
    # gene_names for determinism (pandas kept file order; any stable total
    # order yields one row per locus, which is the semantic contract)
    g = keep_first(g, ["chrom", "start", "end"], [F.col("gene_names").asc()])
    # multi-position genes: keep the longest (cnv.py:376, ascending=[T,T,F])
    g = g.withColumn("length", F.col("end") - F.col("start"))
    g = keep_first(
        g,
        ["chrom", "gene_names"],
        [F.col("start").asc(), F.col("length").desc()],
    ).drop("length")
    return g.withColumn("start", F.col("start") - 1).select(
        "chrom", "start", "end", "gene_names"
    )


def segment_bed(seg_file: DataFrame) -> DataFrame:
    """.seg -> BED-ordered segment table with 'chr' re-added (cnv.py:394-411)."""
    return seg_file.select(
        add_chr(F.col("chrom")).alias("chrom"),
        F.col("`loc.start`").alias("start"),
        F.col("`loc.end`").alias("end"),
        F.col("ID").alias("sample_id"),
        F.col("`seg.mean`").alias("log2_ratio"),
    )


def gene_cnv_map(genes_bed: DataFrame, segments_bed: DataFrame) -> DataFrame:
    """bedtools intersect -a genes -b segments -wo -f 0.5 (cnv.py:413-436)
    + the cut -f/sed cleanup (cnv.py:438-462): (Hugo_Symbol, sample_id, log2)
    pairs where the segment covers >= 50% of the gene."""
    j = interval_join(
        genes_bed,
        segments_bed,
        bin_size=1_000_000,
        min_overlap_frac=0.5,
        left_prefix="g_",
        right_prefix="s_",
    )
    # sed 's/"//g; s/;//g; s/ //g' applied to the cut columns
    clean = lambda c: F.regexp_replace(c, r'["; ]', "")
    return j.select(
        clean(F.col("g_gene_names")).alias("Hugo_Symbol"),
        F.col("s_sample_id").alias("sample_id"),
        F.col("s_log2_ratio").alias("log2"),
        # kept for the reconciliation count (validation file columns)
        F.col("s_chrom").alias("seg_chrom"),
        F.col("s_start").alias("seg_start"),
        F.col("s_end").alias("seg_end"),
    )


def log2_matrix(gene_map: DataFrame) -> DataFrame:
    """data_log2_cna (cnv.py:650-666): genes x samples, values log2, NA fill.
    Values cast to string so the 'NA' sentinel is representable (the pandas
    pivot produced object cells the same way)."""
    long = gene_map.select(
        "Hugo_Symbol", "sample_id", F.col("log2").cast("string").alias("log2")
    )
    return to_wide_matrix(
        long, index="Hugo_Symbol", column="sample_id", value="log2", fill="NA"
    )


def gistic_matrix(gene_map: DataFrame) -> DataFrame:
    """data_cna (cnv.py:668-684): GISTIC-like discretized matrix, 0 fill."""
    long = gene_map.select(
        "Hugo_Symbol", "sample_id", gistic_call(F.col("log2")).alias("gistic_like")
    )
    return to_wide_matrix(
        long, index="Hugo_Symbol", column="sample_id", value="gistic_like", fill=0
    )


def validate_gene_mapping(segments: DataFrame, gene_map: DataFrame) -> DataFrame:
    """Reconciliation (cnv.py:686-711): expected counts = raw segment rows per
    (sample, chrom, start, end) with 'chr' re-added; observed = distinct
    mapped segments per same key; outer join, 0 fill, mismatch flag, plus the
    segment length column the report carries."""
    expected = (
        segments.groupBy(
            "sample_id", add_chr(F.col("chrom")).alias("chrom"), "start", "end"
        )
        .agg(F.count(F.lit(1)).alias("expected"))
    )
    observed = (
        gene_map.select(
            F.col("sample_id"),
            F.col("seg_chrom").alias("chrom"),
            F.col("seg_start").alias("start"),
            F.col("seg_end").alias("end"),
        )
        .distinct()
        .groupBy("sample_id", "chrom", "start", "end")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    rec = reconcile_counts(
        expected, observed, ["sample_id", "chrom", "start", "end"],
        expected_col="expected", observed_col="observed",
    )
    return rec.withColumn("length", F.col("end") - F.col("start"))


def cnv_pipeline(
    spark: SparkSession,
    cnv_json_paths: list[str] | str,
    gtf: DataFrame,
) -> dict[str, DataFrame]:
    """Full cnv_flow DAG; returns the five result DataFrames keyed like the
    reference's output files. All lazy — callers pick sinks."""
    segments = parse_segments(spark, cnv_json_paths)
    seg_file = to_seg_file(segments)
    genes = gene_list_format(gtf)
    seg_bed = segment_bed(seg_file)
    gmap = gene_cnv_map(genes, seg_bed)
    return {
        "segment_data_raw": segments,
        "data_cna_seg": seg_file,
        "data_log2_cna": log2_matrix(gmap),
        "data_cna": gistic_matrix(gmap),
        "validate": validate_gene_mapping(segments, gmap),
    }
