"""Shared synthesis helpers for the scale probe scripts.

Every ``scale_round*.py`` probe used to carry its own copy of the
session builder, the noop-sink timer, and its data generators; identical
data shapes across rounds are what make round-over-round probe numbers
comparable, so the generators live here once (r10 verdict task 6). All
bodies are verbatim moves from their original scripts — probe outputs
are unchanged.

Generators are deterministic in (n, seed): numpy ``default_rng(seed)``
for the pandas-built frames, ``xxhash64`` arithmetic on ``spark.range``
for the distributed ones (the cohort/lineitem shapes that must scale
past driver memory).
"""

from __future__ import annotations

import time

import numpy as np


# ---------------------------------------------------------------- session


def get_spark(cores: int = 32, shuffle_partitions: int | None = None,
              driver_mem: str = "24g"):
    """The probe session: local[cores], AQE on, driver memory raised
    (the raw builder's 1g default OOMs where the package session's 48g
    would not — probes must never look slow for that reason)."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions else cores),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def noop_time(df) -> float:
    """Wall seconds to execute ``df`` into the noop sink (full compute,
    no collect/driver transfer)."""
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


# ------------------------------------------------------- pandas generators


def synth_documents(n: int, seed: int) -> "pd.DataFrame":
    import pandas as pd

    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i}" for i in range(5000)])
    texts = [" ".join(rng.choice(vocab, rng.integers(50, 200))) for _ in range(n)]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


def synth_embeddings(n: int, dim: int, seed: int) -> "pd.DataFrame":
    import pandas as pd

    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float64)
    return pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": [list(v) for v in vecs]}
    )


def synth_events_daily(n: int, seed: int) -> "pd.DataFrame":
    """The r5b events shape: unsorted second-resolution timestamps over
    30 days, users ~ n/67."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    users = max(10, n // 67)
    base = np.datetime64("2024-01-01T00:00:00")
    ts = base + rng.integers(0, 30 * 24 * 3600, n).astype("timedelta64[s]")
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, users, n).astype(np.int64),
            "event_type": rng.choice(["click", "purchase", "view"], n),
            "value": rng.uniform(0, 100, n).round(2),
        }
    )


def synth_events_stream(n: int, n_users: int, seed: int):
    """The r7b events shape: globally time-sorted microsecond
    timestamps (a stream replay), explicit user count."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    offs = np.sort(rng.integers(0, 30 * 86400 * 1_000_000, n))
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts0 + offs.astype("timedelta64[us]"),
            "user_id": rng.integers(0, n_users, n).astype(np.int64),
            "event_type": rng.choice(
                ["click", "view", "purchase", "error"], n
            ),
            "value": np.round(rng.uniform(0, 200, n), 2),
        }
    )


def synth_edges(n_edges: int, mean_deg: int, seed: int):
    """Undirected simple graph: n_nodes = 2·edges/mean_deg, self-loops
    dropped, canonical (min, max) endpoint order, deduped."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    n_nodes = max(2, (2 * n_edges) // mean_deg)
    a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    keep = a != b
    return pd.DataFrame(
        {"id_a": np.minimum(a, b)[keep], "id_b": np.maximum(a, b)[keep]}
    ).drop_duplicates()


# --------------------------------------------------- distributed generators

_CHROMS = 24  # chr1..chr22, X, Y
_CHR_LEN = 250_000_000


def synth_intervals(spark, n: int, skewed: bool, seed: int):
    """n intervals; skewed=True puts 80% on chr1, rest uniform over the
    other 23 chroms (cnv.py's real shape). Lengths ~ U[1k, 200k]."""
    from pyspark.sql import functions as F

    df = spark.range(n).withColumn(
        "_h", F.xxhash64(F.col("id") + seed)
    )
    u = (F.col("_h") % 1000 + 1000) % 1000  # non-negative residue
    if skewed:
        chrom = F.when(u < 800, F.lit("chr1")).otherwise(
            F.concat(F.lit("chr"), ((u % 23) + 2).cast("string"))
        )
    else:
        chrom = F.concat(F.lit("chr"), ((u % _CHROMS) + 1).cast("string"))
    h2 = F.xxhash64(F.col("id") * 31 + seed)
    start = ((h2 % _CHR_LEN) + _CHR_LEN) % _CHR_LEN
    length = ((F.xxhash64(F.col("id") * 97 + seed) % 199_000) + 199_000) % 199_000 + 1_000
    return df.select(
        chrom.alias("chrom"),
        start.cast("long").alias("start"),
        (start + length).cast("long").alias("end"),
    )


def synth_cohort(spark, n_rows: int, n_pat: int):
    """The somatic face's synthetic VCF cohort (registry/genomics.py
    q_somatic_calls), parameterized: k rides spark.range, p = k % n_pat.
    Returns (vcf, manifest)."""
    from pyspark.sql import functions as F

    o = spark.range(1, n_rows + 1).select(F.col("id").alias("o_orderkey"))
    k = F.col("o_orderkey")
    p = k % n_pat

    ps = spark.range(n_pat).select(F.col("id").alias("p"))
    mk = lambda suf, typ: ps.select(  # noqa: E731
        F.concat(F.lit("P"), F.col("p")).alias("participant_id"),
        F.concat(F.lit("P"), F.col("p"), F.lit(suf)).alias("sample_id"),
        F.lit(typ).alias("sample_type"),
        F.concat(F.lit("f"), F.col("p")).alias("file_name"),
    )
    manifest = mk("_T", "tissue").unionByName(mk("_N", "blood"))

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
        F.when(k % 5 == 0, F.lit("FAIL")).otherwise(F.lit("PASS")).alias(
            "FILTER"
        ),
        t_fmt.alias("SAMPLE_FMT"),
    )
    n_fmt = F.concat_ws(
        ":",
        F.when(k % 2 == 0, F.lit("0/0")).otherwise(F.lit("0/1")),
        F.lit("x"), (k % 30 + 12), F.lit("x"), F.lit("x"),
        (k % 50), F.lit("x"), (k % 30),
        F.element_at(
            F.array(
                F.lit("0.00"), F.lit("0.01"), F.lit("0.02"), F.lit("0.03")
            ),
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
    return tumor.unionByName(normal), manifest

def synth_lineitem(spark, n_rows: int):
    """TPC-H-shaped (orderkey, suppkey, returnflag): ~4 lines per order,
    suppliers hash-spread, ~25% R rows (the testdata's flag mix)."""
    from pyspark.sql import functions as F

    return spark.range(n_rows).select(
        (F.col("id") / 4).cast("long").alias("l_orderkey"),
        (
            (F.xxhash64("id") % 10_000 + 10_000) % 10_000
        ).alias("l_suppkey"),
        F.when(F.xxhash64(F.col("id") + 7) % 4 == 0, F.lit("R"))
        .otherwise(F.lit("N"))
        .alias("l_returnflag"),
    )
