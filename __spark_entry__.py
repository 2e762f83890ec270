"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator class from SURVEY.md §2 on
the driver's testdata tables; ``oracle_sql()`` holds the DuckDB-equivalent
SQL. Aggregates over DOUBLE columns are summed through DECIMAL(18,4) in BOTH
engines so the result is order-independent and bit-identical (double
summation order differs between engines/partitionings).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# the driver may load this module by file path; make the sibling package
# importable regardless of cwd/sys.path
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

# the full query surface lives in the registry package (per-family modules);
# `import *` honors its __all__, so every q_*/SQL_*/helper name stays
# importable from this module for tests and external callers
from childhoodcancerdatainitiative_cbioportal_workflows_spark.registry import *  # noqa: E402,F401,F403
from childhoodcancerdatainitiative_cbioportal_workflows_spark.registry import (  # noqa: E402
    _REGISTRY,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_tpch_q1(spark, SF0001)  # noqa: F405


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}
