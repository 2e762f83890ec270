#!/usr/bin/env python3
"""Pre-flight replica of the driver's CORRECTNESS gate, down to the two
details the local pytest suite does NOT replicate:

* a VANILLA SparkSession (the driver builds its own — none of
  core.session.get_spark's confs exist there), and
* the first-``GATE`` slice of the insertion-ordered registry (exactly
  the rows the driver will sample).

Run before round close; a face that is parity-green under the test
session but breaks under a vanilla session (conf-dependent behavior,
session-state leakage) surfaces HERE instead of in the round's one
driver shot.

    python3 scripts/gate_dryrun.py [n_faces] [sf_dir]

Prints one status line per face and a JSON summary; exits 1 on any
mismatch.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    import duckdb
    import numpy as np
    import pandas as pd
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    n_faces = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    sys.path.insert(0, os.path.join(ROOT, "tests"))
    from test_oracle_parity import _normalize  # the driver-canonical compare

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries, oracles = entry.queries(), entry.oracle_sql()
    gate = list(queries)[:n_faces]
    results: dict[str, str] = {}
    for name in gate:
        t0 = time.monotonic()
        try:
            s = _normalize(queries[name](spark, sf_dir).toPandas())
            o = _normalize(con.sql(oracles[name]).df())
            ok = list(s.columns) == list(o.columns) and len(s) == len(o)
            if ok:
                for c in s.columns:
                    sv, ov = s[c].to_numpy(), o[c].to_numpy()
                    if sv.dtype.kind == "f":
                        eq = (sv == ov) | (
                            np.isnan(sv.astype(float))
                            & np.isnan(ov.astype(float))
                        )
                    else:
                        eq = (
                            (pd.isna(s[c]) & pd.isna(o[c])) | (s[c] == o[c])
                        ).to_numpy()
                    if not eq.all():
                        ok = False
                        break
            results[name] = "green" if ok else "MISMATCH"
        except Exception as e:  # noqa: BLE001 — a dry run reports, not dies
            results[name] = f"ERR {type(e).__name__}: {e}"[:200]
        print(f"{results[name]:>9.9}  {time.monotonic() - t0:5.1f}s  {name}")
    spark.stop()
    bad = {k: v for k, v in results.items() if v != "green"}
    print(
        json.dumps(
            {"gate": len(gate), "green": len(gate) - len(bad), "bad": bad}
        )
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
