"""Pipeline runner resume semantics + the JDBC export/restore flows.
The live round-trip runs against embedded Apache Derby, which ships in
Spark's own jars directory — a real ``write.jdbc``/``read.jdbc`` cycle with
no external database service."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.runner import (
    PipelineRunner,
    Stage,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources.jdbc import (
    export_tables,
    reconcile_restore,
    restore_tables,
    table_counts,
)

DERBY = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}


def _derby_url(tmp_path, name: str) -> str:
    return f"jdbc:derby:{tmp_path}/{name};create=true"


def test_live_jdbc_export_restore_roundtrip(spark, tmp_path):
    """export_db/restore_db semantics against a real JDBC database:
    seed Derby -> export_tables (jdbc read -> parquet snapshot + counts) ->
    restore_tables (parquet -> jdbc write -> readback reconcile)."""
    try:
        spark._jvm.java.lang.Class.forName(DERBY["driver"])
    except Exception:
        pytest.skip("Derby driver not on the JVM classpath")
    src = _derby_url(tmp_path, "srcdb")
    # seed the "production" database
    seed = {
        "regions": spark.read.parquet("/root/testdata/sf0.001/region.parquet"),
        "nations": spark.read.parquet("/root/testdata/sf0.001/nation.parquet"),
    }
    for t, df in seed.items():
        w = df.write.format("jdbc").option("url", src).option("dbtable", t)
        for k, v in DERBY.items():
            w = w.option(k, v)
        w.mode("overwrite").save()

    snap = str(tmp_path / "snap")
    counts = export_tables(
        spark, src, ["regions", "nations"], snap, options=DERBY
    ).toPandas().set_index("table_name")
    assert counts.loc["regions"].expected == 5
    assert counts.loc["nations"].expected == 25

    dst = _derby_url(tmp_path, "dstdb")
    rec = restore_tables(
        spark, snap, dst, ["regions", "nations"], options=DERBY
    ).toPandas().set_index("table_name")
    assert not rec.mismatch.any()

    # the restored DB is a faithful copy, value-for-value
    readback = (
        spark.read.format("jdbc").option("url", dst).option("dbtable", "regions")
        .options(**DERBY).load()
    )
    got = {(r.r_regionkey, r.r_name) for r in readback.collect()}
    want = {(r.r_regionkey, r.r_name) for r in seed["regions"].collect()}
    assert got == want


def test_runner_computes_then_resumes(spark, tmp_path):
    calls = {"a": 0, "b": 0}

    def build_a(ctx):
        calls["a"] += 1
        return spark.range(10).withColumnRenamed("id", "x")

    def build_b(ctx):
        calls["b"] += 1
        return ctx["a"].withColumn("y", F.col("x") * 2)

    stages = [Stage("a", build_a), Stage("b", build_b, deps=("a",))]
    runner = PipelineRunner(spark, str(tmp_path / "wd"))

    r1 = runner.run(stages)
    assert r1.computed == ["a", "b"] and r1.resumed == []
    assert calls == {"a": 1, "b": 1}

    r2 = runner.run(stages)
    assert r2.computed == [] and r2.resumed == ["a", "b"]
    assert calls == {"a": 1, "b": 1}  # nothing re-ran

    r3 = runner.run(stages, force_from="b")
    assert r3.computed == ["b"] and r3.resumed == ["a"]
    assert calls == {"a": 1, "b": 2}

    # a recomputed upstream must invalidate downstream sinks (staleness)
    os.remove(os.path.join(str(tmp_path / "wd"), "a", "_SUCCESS"))
    r4 = runner.run(stages)
    assert r4.computed == ["a", "b"] and r4.resumed == []
    assert calls == {"a": 2, "b": 3}

    out = spark.read.parquet(os.path.join(str(tmp_path / "wd"), "b"))
    assert out.count() == 10 and set(out.columns) == {"x", "y"}


def test_export_restore_reconciliation(spark, tmp_path):
    """Snapshot counts + restore reconciliation using the driver's real
    tables as the 'database' (FIXTURES.md §10)."""
    snap = str(tmp_path / "snap")
    tables = {}
    for t in ("region", "nation", "customer"):
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        df.write.mode("overwrite").parquet(os.path.join(snap, t))
        tables[t] = spark.read.parquet(os.path.join(snap, t))

    counts = table_counts(tables, "expected")
    counts.write.mode("overwrite").parquet(os.path.join(snap, "_counts"))
    cpdf = counts.toPandas().set_index("table_name")
    assert cpdf.loc["region"].expected == 5
    assert cpdf.loc["region"].n_cols == 2

    # clean restore -> no mismatches
    rec = reconcile_restore(spark, snap, tables).toPandas()
    assert not rec.mismatch.any()

    # corrupt restore (drop rows from one table) -> flagged
    bad = dict(tables)
    bad["customer"] = tables["customer"].limit(3)
    rec2 = reconcile_restore(spark, snap, bad).toPandas().set_index("table_name")
    assert bool(rec2.loc["customer"].mismatch)
    assert not bool(rec2.loc["region"].mismatch)
