from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS_DIR = os.path.join(REPO_ROOT, "tests")

# Python workers unpickle closures defined in test modules (mapInPandas
# doubles); they need the repo root and tests dir on their path.
os.environ["PYTHONPATH"] = os.pathsep.join(
    [REPO_ROOT, TESTS_DIR, os.environ.get("PYTHONPATH", "")]
)
for p in (REPO_ROOT, TESTS_DIR):
    if p not in sys.path:
        sys.path.insert(0, p)

from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ccdi-spark-tests", shuffle_partitions=8)
    yield s
