"""Local replica of the driver's t2 gate: every queries() entry must match
its oracle_sql() on the same parquet, value-exactly (the driver hashes
values, so near-enough is not enough)."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime64"):
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64)
        if str(df[c].dtype) in ("Int64", "Int32", "int32", "uint64"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "bool":
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    con = _duck(SF_DIR)
    odf = con.sql(ORACLES[name]).df()
    s, o = _normalize(sdf), _normalize(odf)
    assert list(s.columns) == list(o.columns), f"columns differ: {list(s.columns)} vs {list(o.columns)}"
    assert len(s) == len(o), f"row count {len(s)} vs {len(o)}"
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        if sv.dtype.kind == "f":
            both_nan = np.isnan(sv.astype(float)) & np.isnan(ov.astype(float))
            eq = (sv == ov) | both_nan
        else:
            eq = (pd.isna(s[c]) & pd.isna(o[c])) | (s[c] == o[c])
            eq = eq.to_numpy()
        if not eq.all():
            i = int(np.argmin(eq))
            raise AssertionError(
                f"{name}: column {c} mismatch at row {i}: spark={sv[i]!r} oracle={ov[i]!r}"
            )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Queries without a SQL oracle (hash-based LSH ops) must still execute
    and return a stable schema; their semantics are pinned in test_llm_ops."""
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns
    assert df.count() >= 0


def test_no_driver_unsortable_outputs(spark):
    """The driver's canonicalizer sorts result columns with raw
    pandas.sort_values, which raises on array/map/struct cells
    (unhashable list) — the exact failure that red-flagged
    quantize_embeddings in CORRECTNESS_r06 while this local replica
    stayed green (its astype(str) normalization is more lenient).
    Guard the whole registry: every registered query face must emit
    only scalar-typed columns. Operators may still return typed
    arrays; the *face* must serialize them (array_join/to_json)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad: list[str] = []
    for name, fn in QUERIES.items():
        schema = fn(spark, SF_DIR).schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, (
        "driver-unsortable output columns (serialize in the face): " + "; ".join(bad)
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.columns


def _ledger():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "registry_ledger",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "registry_ledger.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_regate_policy_detects_synthetic_change():
    """The rotation rule is a CHECK, not a habit (r7 verdict task 2): a
    query whose fingerprint differs from its certified snapshot and that
    sits outside the gate must be reported as an offender; the same
    change inside the gate is fine (it will re-certify)."""
    led = _ledger()
    order = ["a", "b", "c", "d", "e"]
    current = {"a": "f1", "b": "f2", "c": "f3", "d": "f4", "e": "f5"}
    stored = {
        "a": {"fpr": "f1", "round": 7},
        "b": {"fpr": "STALE", "round": 5},   # changed, inside gate: ok
        "c": {"fpr": "STALE", "round": 5},   # changed, outside gate: offender
        # "d" missing: never snapshotted, outside gate: offender
        "e": {"fpr": "STALE", "round": 0},   # never CERTIFIED: exempt —
        # nothing to invalidate; it leads the next rotation instead
    }
    got = led.regate_offenders(order, stored, current, gate=2)
    assert got == ["c", "d"]
    assert led.regate_offenders(order, stored, current, gate=5) == []


def test_regate_policy_holds_on_this_repo():
    """Every registered face whose content fingerprint differs from its
    last-certified snapshot must currently sit inside the driver gate.
    This test FAILS whenever a face (or an operator module it uses) is
    edited without rotating it into the first 50 registry positions —
    rerun scripts/registry_ledger.py and front-load the change."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.registry import (
        _REGISTRY,
    )
    import json

    led = _ledger()
    assert os.path.exists(led.FPR_STORE), "run scripts/registry_ledger.py once"
    stored = json.load(open(led.FPR_STORE))
    order = list(QUERIES)
    current = {
        name: led.face_fingerprint(fn, sql)
        for name, (fn, sql) in _REGISTRY.items()
    }
    offenders = led.regate_offenders(order, stored, current)
    # Overflow waiver (r19, replaces the r18 optimization-round waiver whose
    # full-registry-recertification premise was false): offenders are
    # excused ONLY when regate_waiver verifies, against the tree, that the
    # changed set exceeds the gate, the gate is maximally packed with
    # changed faces, and every offender is listed in REGATE_WAIVER.json
    # with its CURRENT fingerprint. Every waived face must still be
    # covered by this suite's full-registry value-exact parity run — that
    # is the waiver's certification evidence.
    if offenders:
        rounds_seen = sorted(
            {r for h in led.load_history().values() for r in h}
        )
        changed = {
            n for n in order
            if n not in stored or stored[n].get("fpr") != current[n]
        }
        fired, reason = led.regate_waiver(
            rounds_seen, offenders, changed, order, current
        )
        if fired:
            from childhoodcancerdatainitiative_cbioportal_workflows_spark.registry import (  # noqa: E501
                _REGISTRY,
            )

            missing = [n for n in offenders if n not in _REGISTRY]
            assert missing == [], (
                "waived offenders missing from the registry (so outside the "
                f"full-registry parity suite): {missing}"
            )
            return
        assert offenders == [], (
            "changed since certification but not in the driver gate "
            f"(waiver did not fire: {reason}) — front-load these and rerun "
            f"scripts/registry_ledger.py: {offenders}"
        )
