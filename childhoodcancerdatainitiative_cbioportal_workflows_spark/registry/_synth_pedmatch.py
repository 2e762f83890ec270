"""Deterministic synthetic pedmatch cohort shared by the in-flight and
bucketed somatic faces.

The VCF-shaped tumor/normal/fusion frames are pure modular arithmetic
over the shared ``customer``/``orders`` testdata, so the DuckDB oracle
(``SQL_SOMATIC_CALLS``, registry/genomics.py) can re-derive the expected
survivors from the seed arithmetic alone. Extracted from
``q_somatic_calls`` in r12 so ``q_somatic_calls_bucketed``
(registry/bucketedflows.py) runs the SAME cohort through the
exchange-free bucketed merge (plans/pedmatch_bucketed.py) and reuses the
SAME oracle — identical output is the bucketed layout's whole claim.

Cohort shape (reference workflows/pedmatch-clinical-vcf-workflow.py):
participant 0 carries a duplicate tissue sample and must vanish via the
1-tissue/1-blood pairing guard (pedmatch:579-602); a 3-breakend fusion
(k%39==0) pins the odd-trailing-row drop of the 2-at-a-time breakend
pairing (pedmatch:90-179).
"""

from __future__ import annotations

from ._common import *  # noqa: F401,F403

_K = F.col("o_orderkey")
_P = F.col("o_custkey") % 20


def pedmatch_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-participant manifest: one tissue + one blood sample each,
    plus the duplicate P0 tissue sample that trips the pairing guard."""
    c = load_table(spark, sf_dir, "customer")
    ps = c.select((F.col("c_custkey") % 20).alias("p")).distinct()
    mk = lambda suf, typ, fsuf: ps.select(  # noqa: E731
        F.concat(F.lit("P"), F.col("p")).alias("participant_id"),
        F.concat(F.lit("P"), F.col("p"), F.lit(suf)).alias("sample_id"),
        F.lit(typ).alias("sample_type"),
        F.concat(F.lit("f"), F.col("p"), F.lit(fsuf)).alias("file_name"),
    )
    return (
        mk("_T", "tissue", "_t.vcf")
        .unionByName(mk("_N", "blood", "_n.vcf"))
        .unionByName(
            mk("_T2", "tissue", "_t2.vcf").filter(F.col("sample_id") == "P0_T2")
        )
    )


def pedmatch_snv_vcf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumor ∪ normal VCF-shaped rows; FORMAT slots GT=0 DP=2 FRO=5
    FAO=7 AF=8 (the 9-slot payload the FORMAT unpack indexes into)."""
    o = load_table(spark, sf_dir, "orders")
    k, p = _K, _P
    t_fmt = F.concat_ws(
        ":",
        F.when(k % 17 == 0, F.lit("0/0")).otherwise(F.lit("0/1")),
        F.lit("x"), (k % 40 + 10), F.lit("x"), F.lit("x"),
        (k % 50), F.lit("x"), (k % 30),
        F.concat(F.lit("0."), F.lpad((k % 20).cast("string"), 2, "0")),
    )
    tumor = o.select(
        F.concat(F.lit("P"), p, F.lit("_T")).alias("sample_id"),
        F.concat(F.lit("chr"), (k % 22 + 1)).alias("CHROM"),
        ((k * 37) % 1000000).alias("POS"),
        F.concat(F.lit("v"), k).alias("ID"),
        F.lit("A").alias("REF"),
        F.when(k % 3 == 0, F.lit("T"))
        .when(k % 3 == 1, F.lit("G"))
        .otherwise(F.lit("C,G"))
        .alias("ALT"),
        F.lit("100").alias("QUAL"),
        F.when(k % 11 == 0, F.lit("SVTYPE=Fusion;X=1"))
        .otherwise(F.lit("X=1"))
        .alias("INFO"),
        F.lit("GT:A:DP:B:C:FRO:D:FAO:AF").alias("FORMAT"),
        F.when(k % 5 == 0, F.lit("FAIL")).otherwise(F.lit("PASS")).alias("FILTER"),
        t_fmt.alias("SAMPLE_FMT"),
    )
    n_fmt = F.concat_ws(
        ":",
        F.when(k % 2 == 0, F.lit("0/0")).otherwise(F.lit("0/1")),
        F.lit("x"), (k % 30 + 12), F.lit("x"), F.lit("x"),
        (k % 50), F.lit("x"), (k % 30),
        F.element_at(
            F.array(F.lit("0.00"), F.lit("0.01"), F.lit("0.02"), F.lit("0.03")),
            (k % 4 + 1).cast("int"),
        ),
    )
    normal = o.filter(k % 3 == 0).select(
        F.concat(F.lit("P"), p, F.lit("_N")).alias("sample_id"),
        F.concat(F.lit("chr"), (k % 22 + 1)).alias("CHROM"),
        ((k * 37) % 1000000).alias("POS"),
        F.concat(F.lit("v"), k).alias("ID"),
        F.lit("A").alias("REF"),
        F.lit("T").alias("ALT"),
        F.lit("100").alias("QUAL"),
        F.lit("X=1").alias("INFO"),
        F.lit("GT:A:DP:B:C:FRO:D:FAO:AF").alias("FORMAT"),
        F.lit("PASS").alias("FILTER"),
        n_fmt.alias("SAMPLE_FMT"),
    )
    return tumor.unionByName(normal)


def pedmatch_fusion_vcf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fusion breakend rows: 2 per fusion (3 when k%39==0 — the odd
    trailing row must drop), with a germline twin at k%26==0 that the
    subtraction removes."""
    o = load_table(spark, sf_dir, "orders")
    k = _K
    fo = o.filter(k % 13 == 0)
    fb = fo.select(
        "o_orderkey",
        "o_custkey",
        F.explode(
            F.when(
                k % 39 == 0,
                F.array(F.lit(1), F.lit(2), F.lit(3)),
            ).otherwise(F.array(F.lit(1), F.lit(2)))
        ).alias("bno"),
    )
    b = F.col("bno")
    fus_info = F.concat(
        F.lit("SVTYPE=Fusion;GENE_NAME=G"), k + b - 1,
        F.lit(";EXON_NUM="), k % 10 + b - 1,
        F.lit(";ANNOTATION=a"), k,
        F.lit(";READ_COUNT="), (k + b) % 97,
    )
    mk_fus = lambda side: fb.select(  # noqa: E731
        F.concat(F.lit("P"), F.col("o_custkey") % 20, F.lit(side)).alias("sample_id"),
        F.concat(F.lit("chr"), (k % 22 + 1)).alias("CHROM"),
        (k * 3 + b).alias("POS"),
        (k * 10 + b).alias("row_order"),
        F.concat(F.lit("F"), k, F.lit("_"), b).alias("ID"),
        fus_info.alias("INFO"),
    )
    return mk_fus("_T").unionByName(
        mk_fus("_N").filter(F.col("ID").startswith("F") & (k % 26 == 0))
    )


def somatic_summary(somatic: DataFrame, kept_fusions: DataFrame) -> DataFrame:
    """Per-participant summary of somatic SNV survivors + kept fusions —
    the shared output schema both somatic faces certify against
    ``SQL_SOMATIC_CALLS``."""
    snv_counts = (
        somatic.groupBy("tumor_sample_id")
        .agg(
            F.count(F.lit(1)).alias("n_somatic"),
            F.sum("POS").alias("sum_pos"),
        )
        .select(
            F.split("tumor_sample_id", "_").getItem(0).alias("participant_id"),
            "n_somatic",
            "sum_pos",
        )
    )
    fus_counts = kept_fusions.groupBy(
        F.split("Sample_Id", "_").getItem(0).alias("participant_id")
    ).agg(
        F.count(F.lit(1)).alias("n_fusions"),
        F.max(F.col("Tumor_Read_Count").cast("int")).alias("max_read_count"),
    )
    return fus_counts.join(snv_counts, "participant_id", "full_outer").select(
        "participant_id",
        F.coalesce("n_fusions", F.lit(0)).alias("n_fusions"),
        F.coalesce("max_read_count", F.lit(0)).alias("max_read_count"),
        F.coalesce("n_somatic", F.lit(0)).alias("n_somatic"),
        F.coalesce("sum_pos", F.lit(0)).alias("sum_pos"),
    )
