"""Registry surface invariants (no SparkSession needed).

The driver face (``__spark_entry__``) and the split/ledger scripts
consume the registry through ``from registry import *`` — so ``__all__``
must carry the FULL q_*/SQL_* surface. r11 advice found the two newest
oracles missing (plus 26 older stragglers); this pins completeness.
"""

from __future__ import annotations

import re
import inspect

from childhoodcancerdatainitiative_cbioportal_workflows_spark import registry


def test_all_exports_registry_surface():
    """Every face callable and every oracle-SQL constant reachable from
    ``_REGISTRY`` must be re-exported via ``__all__``."""
    src = inspect.getsource(registry)
    entries = re.findall(r'"\w+": \((q_\w+), (SQL_\w+|None)\)', src)
    assert len(entries) == len(registry._REGISTRY)
    need = set()
    for q, s in entries:
        need.add(q)
        if s != "None":
            need.add(s)
    missing = sorted(need - set(registry.__all__))
    assert not missing, f"_REGISTRY names absent from __all__: {missing}"


def test_all_names_resolve():
    """``import *`` must not raise: every __all__ name is bound."""
    unbound = [n for n in registry.__all__ if not hasattr(registry, n)]
    assert not unbound, f"__all__ names not bound on the package: {unbound}"


def test_registry_values_are_callable_with_sql():
    for name, (fn, sql) in registry._REGISTRY.items():
        assert callable(fn), name
        assert sql is None or (isinstance(sql, str) and sql.strip()), name
