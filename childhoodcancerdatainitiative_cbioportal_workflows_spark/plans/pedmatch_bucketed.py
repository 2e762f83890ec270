"""Exchange-free bucketed layout for the somatic variant merge.

The tumor/normal full-outer merge (bcftools ``merge -m id``;
reference workflows/pedmatch-clinical-vcf-workflow.py:311-464) is the
dominant cost of the somatic chain — SCALE_NOTES r10's end-to-end probe
measured it at ~50% of ``somatic_calls`` wall, a shuffle of BOTH
cohort-sized sides on the near-unique variant-identity key
(``plans.pedmatch.SNV_MERGE_KEYS``): nothing to broadcast, no skew to
salt — the exchange IS the semantics. At 100 TB the knob is the same
one the interval join already uses (``sources/bucketed.py``): pay that
shuffle ONCE at ingest by writing both VCF sides bucketed (and
bucket-sorted) on the merge key; every later merge of the same cohort —
re-runs, re-gating with new thresholds, per-study reprocessing — then
plans with ZERO Exchange on either side (plan-asserted in
``tests/test_partitioning.py::test_snv_merge_bucketed_exchange_free``).

Bucket-count sizing per the ``sources/bucketed.py`` contract: one
bucket of the larger (tumor) side ≈ an executor core's working set
(e.g. 4096 buckets for a 100 TB cohort), divisor-rich so
differently-bucketed studies can still coalesce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.bucketed import read_bucketed, write_bucketed
from .pedmatch import SNV_MERGE_KEYS, snv_merge_sides, snv_somatic_filter


def write_snv_sides_bucketed(
    vcf: DataFrame,
    pairs: DataFrame,
    tumor_table: str,
    normal_table: str,
    n_buckets: int,
    tumor_path: str | None = None,
    normal_path: str | None = None,
) -> None:
    """Ingest-time half of the exchange-free merge: split multiallelics,
    scope each side to its cohort role (broadcast of the pairs table),
    and persist both sides bucketed + bucket-sorted on
    ``SNV_MERGE_KEYS``. This write shuffles each side once — the
    exchange the merge would otherwise pay on every run."""
    t, n = snv_merge_sides(vcf, pairs)
    write_bucketed(
        t, tumor_table, SNV_MERGE_KEYS, n_buckets,
        sort_cols=SNV_MERGE_KEYS, path=tumor_path,
    )
    write_bucketed(
        n, normal_table, SNV_MERGE_KEYS, n_buckets,
        sort_cols=SNV_MERGE_KEYS, path=normal_path,
    )


def snv_somatic_bucketed(
    spark: SparkSession, tumor_table: str, normal_table: str
) -> DataFrame:
    """The somatic SNV chain over pre-bucketed merge sides: identical
    rows to ``plans.pedmatch.snv_somatic`` (parity-tested), but the
    full-outer variant merge reads both sides' bucket metadata and plans
    with no Exchange — the post-merge tail (FORMAT unpack, depth/AF
    gate, compound somatic predicate) is per-row and adds none."""
    t = read_bucketed(spark, tumor_table)
    n = read_bucketed(spark, normal_table)
    merged = t.join(n, on=SNV_MERGE_KEYS, how="full_outer")
    return snv_somatic_filter(merged)
