"""SparkSession factory.

Single place where scale-relevant knobs live. Local runs use local[N];
on a real cluster the same builder applies minus the master/memory knobs
(supplied by the cluster manager). AQE is always on: it re-plans skewed
joins and coalesces small shuffle partitions at runtime, which matters
for the genomic interval join (chr1 >> chrY skew) and for wide unions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F


def get_spark(
    app_name: str = "ccdi-cbioportal-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # pandas-UDF stages (annotation providers, multimodal decode) get
        # bounded Arrow batches instead of whole partitions in memory.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        # testdata events.parquet carries TIMESTAMP(NANOS), which Spark's
        # parquet reader rejects; read as long and convert in load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    # Only force a master when we're not already inside a cluster submit.
    if "SPARK_MASTER" not in os.environ and not os.environ.get("SPARK_SUBMIT_DEPLOY_MODE"):
        builder = builder.master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def spread(df, min_partitions: int | None = None):
    """Fan a narrow input out to the cluster before a compute-heavy per-row
    stage (shingle hashing, bit votes, vector projections). At corpus scale
    inputs arrive in thousands of splits and this is a no-op; a bench-scale
    single-file scan otherwise pins the whole stage to ONE task (the testdata
    parquet is one row group, so no scan-split parallelism is possible) and
    32 cores serialize behind it. The repartition shuffles only the small
    input and never changes results.

    r19 (guide §1.2 driver overhead): the ``df.rdd.getNumPartitions()``
    probe builds the FULL physical plan and converts it to an RDD on the
    driver — one planning pass per call site per run (~36 sites; the bench
    repeats every face 4x, so ~140 redundant plan builds per rep cycle).
    The partition count is a pure function of the ANALYZED plan within one
    session (same file set, same session confs -> same scan splits; a
    post-shuffle frame's count is its shuffle partitioning), so the probe
    result is memoized per session keyed on the analyzed plan's
    ``semanticHash`` plus the schema's dtypes (the hash is 32-bit; the
    dtype tuple makes an accidental collision need a same-shape twin, and
    a collision could only flip a redundant repartition decision, never a
    result — repartition is result-neutral by contract). The decision
    logic, and therefore every plan this helper emits, is byte-identical
    to the probing form; only repeat probes of the same logical plan are
    elided."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    cache = getattr(spark, "_spread_npart_cache", None)
    if cache is None:
        cache = {}
        spark._spread_npart_cache = cache
    try:
        key = (
            df._jdf.queryExecution().analyzed().semanticHash(),
            tuple(t for _, t in df.dtypes),
        )
    except Exception:
        key = None
    nparts = cache.get(key) if key is not None else None
    if nparts is None:
        nparts = df.rdd.getNumPartitions()
        if key is not None:
            cache[key] = nparts
    if nparts >= target:
        return df
    return df.repartition(target)


def run_id(spark: SparkSession, fmt: str = "yyyyMMdd_'T'HHmmss") -> str:
    """Run-stamp string for output naming — the reference's EST timestamp
    IDs (src/utils.py:13-18). Uses the session clock/timezone so distributed
    writers in one run share one stamp."""
    return spark.range(1).select(
        F.date_format(F.current_timestamp(), fmt).alias("ts")
    ).first()["ts"]


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark reads them as long
    (legacy conf above); we convert back to TimestampType (µs) ourselves."""
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa

        schema = pq.read_schema(path)
        return [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver-generated parquet table (TESTDATA.md)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    # the caller's session may not come from get_spark (the driver builds its
    # own); the nanos conf is runtime-settable, so apply it here too.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(path)
    for c in _nanos_timestamp_cols(path):
        # integer division: long nanos -> µs, no double round-trip
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df
