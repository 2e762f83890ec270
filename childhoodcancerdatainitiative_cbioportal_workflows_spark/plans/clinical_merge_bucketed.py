"""Exchange-free bucketed layout for the megaMAF dedup window.

The clinical merge's one corpus-wide exchange is the
dedup-with-preference window: ``keep_first`` partitions the unioned
megaMAF on the 7-column MAF identity (``MAF_DEDUP_KEYS``,
plans/clinical_merge.py; reference mci_clinical_variant_merge.py:263-282),
which shuffles the full study MAF on every re-merge. Same knob as the
somatic variant merge (plans/pedmatch_bucketed.py): persist the megaMAF
``bucketBy`` the dedup keys once at ingest, and every later merge's
window reads the bucket metadata — Catalyst's ClusteredDistribution
requirement for the window is satisfied by the scan's HashPartitioning,
so the plan carries ZERO Exchange (plan-asserted in
tests/test_partitioning.py::test_maf_dedup_bucketed_exchange_free). The
within-partition sort on the preference key remains — it is computed
from the row (Not-Reported flags + source), cannot be a write-time
sortBy, and is the cheap local part.

This module is the storage-layout face of the flow; the certified
in-flight face is ``registry/flows.py q_clinical_merge_flow``.

One contract the guard below enforces: FLOAT-TYPED dedup keys defeat
the layout. Catalyst wraps floating-point partition keys in
``normalizenanandzero`` before hashing (NaN != NaN and 0.0 == -0.0
would otherwise split groups), so the window's required distribution is
an EXPRESSION over the column — which a bucketed scan's raw-column
HashPartitioning can never satisfy; the Exchange silently stays. The
reference's pandas float artifact (positions as ``7675088.0``) must be
normalized to integers at ingest — the clean at-scale schema anyway.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..sources.bucketed import read_bucketed, write_bucketed
from .clinical_merge import MAF_DEDUP_KEYS, dedup_preferring_clinical, merge_stats


def write_maf_bucketed(
    maf: DataFrame,
    table: str,
    n_buckets: int,
    path: str | None = None,
    extra_keys: Sequence[str] = (),
) -> None:
    """Persist a (mega)MAF bucketed on the dedup identity. The write
    shuffles once on ``MAF_DEDUP_KEYS`` — the exchange the dedup window
    would otherwise pay per merge. Raises on float-typed keys (see
    module docstring: NaN/-0.0 normalization makes the bucket layout
    useless for them — cast positions to bigint at ingest)."""
    keys = list(MAF_DEDUP_KEYS) + list(extra_keys)
    floaty = [
        f.name for f in maf.schema.fields
        if f.name in keys
        and isinstance(f.dataType, (T.DoubleType, T.FloatType))
    ]
    if floaty:
        raise ValueError(
            "write_maf_bucketed: float-typed dedup keys "
            f"{floaty} defeat the bucketed layout (Catalyst normalizes "
            "NaN/-0.0 before hashing, so the window's required "
            "distribution can never match the bucket partitioning); "
            "cast positions to bigint at ingest"
        )
    write_bucketed(maf, table, keys, n_buckets, path=path)


def read_maf_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read the bucketed megaMAF with its bucket metadata intact."""
    return read_bucketed(spark, table)


def normalize_positions_bigint(unioned: DataFrame) -> DataFrame:
    """Ingest normalization the float-key guard demands: the reference's
    pandas artifact ships positions as exact-integer DOUBLEs
    (``7675088.0``); cast them to bigint so the bucket layout's
    HashPartitioning can satisfy the dedup window's required
    distribution (see module docstring — ``normalizenanandzero`` defeats
    bucket reuse on float keys). Lossless for the artifact's values and
    the clean at-scale schema anyway; the downstream ``.0``-strip
    normalization degenerates to a plain int-to-string cast."""
    out = unioned
    for c in ("Start_Position", "End_Position"):
        if c in out.columns and isinstance(
            out.schema[c].dataType, (T.DoubleType, T.FloatType)
        ):
            out = out.withColumn(c, F.col(c).cast("bigint"))
    return out


def merge_clinical_variants_bucketed(
    spark: SparkSession, table: str
) -> tuple[DataFrame, dict]:
    """The merge tail over a megaMAF union AT REST in the bucketed
    layout: same (deduped, stats) contract as
    ``clinical_merge.merge_clinical_variants_to_maf``, but both
    traversals — the dedup-with-preference window and the mci:294 stats
    aggregate — read the bucketed scan's HashPartitioning and plan with
    ZERO Exchange (plan-asserted in tests/test_partitioning.py). No
    localCheckpoint either: the table on disk IS the materialization, so
    re-merges (re-runs, new thresholds, per-study reprocessing) pay
    neither the union recompute nor the corpus-wide shuffle."""
    unioned = read_maf_bucketed(spark, table)
    return dedup_preferring_clinical(unioned), merge_stats(unioned)
