"""Oracle type-canonicalization gate (round-5 verdict #2).

The driver value-hashes the Spark result against the DuckDB oracle result.
DuckDB silently widens some expressions past the Spark type — windowed
SUM(BIGINT) -> HUGEINT (renders as float64 in pandas: 72.0 != 72),
integer division -> DOUBLE, len() arithmetic -> BIGINT — and any such
widening makes the value hash fail even when every value is numerically
identical (the r4 sequence_pack / llm_corpus_pipeline failures).

This test pins the rule structurally: for EVERY registered oracle, the
DuckDB logical column type must canonicalize to the same family as the
Spark schema type. Neither side is executed — Spark's schema comes from
analysis only and DuckDB's from relation binding — so the sweep covers
the full registry in seconds and the widening class of failure cannot
recur silently.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import types as T

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

_INTEGRAL_DUCK = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def _canon_duck(t) -> str:
    s = str(t).upper()
    if s in _INTEGRAL_DUCK:
        return "int"
    if s == "HUGEINT":
        # HUGEINT arrives in pandas as float64 — never hash-compatible
        # with a Spark integral column; always a bug in the oracle SQL.
        return "hugeint"
    if s in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if s.startswith("DECIMAL"):
        return "decimal"
    if s == "VARCHAR":
        return "str"
    if s == "BOOLEAN":
        return "bool"
    if s.startswith("TIMESTAMP"):
        return "ts"
    if s == "DATE":
        return "date"
    if "[]" in s or s.startswith(("LIST", "STRUCT", "MAP")):
        return "nested"
    return s


def _canon_spark(dt) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return "nested"
    return str(dt)


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_dtype_parity(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)  # lazy: analysis only, no jobs
    spark_types = {f.name: _canon_spark(f.dataType) for f in sdf.schema.fields}

    con = _duck(SF_DIR)
    rel = con.sql(ORACLES[name])  # lazy: binder resolves types, no scan
    duck_types = dict(zip(rel.columns, (_canon_duck(t) for t in rel.types)))

    assert sorted(spark_types) == sorted(duck_types), (
        f"{name}: column sets differ: {sorted(spark_types)} vs {sorted(duck_types)}"
    )
    mismatches = {
        c: (spark_types[c], duck_types[c])
        for c in spark_types
        if spark_types[c] != duck_types[c]
    }
    assert not mismatches, (
        f"{name}: oracle type drift (spark, duckdb): {mismatches} — "
        f"add an explicit CAST in the oracle SQL (or fix the Spark side)"
    )
