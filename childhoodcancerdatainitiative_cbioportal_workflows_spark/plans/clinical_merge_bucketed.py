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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..sources.bucketed import read_bucketed, write_bucketed
from .clinical_merge import MAF_DEDUP_KEYS


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
