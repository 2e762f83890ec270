from __future__ import annotations

import pytest

from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ccdi-spark-tests", shuffle_partitions=8)
    yield s
