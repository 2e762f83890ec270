"""Plan-shape regression guard (r19, VERDICT r18 task 8): the two
optimization rounds' evidence is the SHAPE of the optimized faces' plans
— Exchange counts flattened, join strategies pinned, Python-eval nodes
removed. This guard rebuilds every pinned face's plan under the exact
session config the pin was generated with and fails on ANY counter
drift, so a later edit cannot silently re-inflate what the rounds
flattened. Regenerate pins deliberately with
scripts/gen_plan_shape_pins.py when a plan change is intentional."""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PINS_PATH = os.path.join(REPO_ROOT, "plans", "plan_shape_pins.json")

sys.path.insert(0, os.path.join(REPO_ROOT, "scripts"))


def test_optimized_faces_plan_shapes_are_pinned():
    from profile_faces import plan_shape

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
        get_spark,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        release_plan_caches,
    )

    assert os.path.exists(PINS_PATH), (
        "plans/plan_shape_pins.json missing — run scripts/gen_plan_shape_pins.py"
    )
    pins = json.load(open(PINS_PATH))
    sf_dir = pins["sf_dir"]
    if not os.path.isdir(sf_dir):
        pytest.skip(f"pinned sf dir {sf_dir} not present")

    # the guard must rebuild plans under the generator's exact config —
    # its own session, not the suite fixture (join strategy and exchange
    # placement depend on shuffle partitioning and size estimates)
    spark = get_spark(
        "plan-shape-guard", shuffle_partitions=pins["shuffle_partitions"]
    )
    import __spark_entry__ as entry

    qs = entry.queries()
    drifted: dict[str, dict] = {}
    for name, pinned in sorted(pins["faces"].items()):
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        shape = plan_shape(txt)
        release_plan_caches(df)
        got = {k: shape[k] for k in pins["counters"]}
        if got != pinned:
            drifted[name] = {
                "pinned": pinned,
                "got": got,
                "diff": {
                    k: (pinned[k], got[k])
                    for k in pins["counters"]
                    if pinned[k] != got[k]
                },
            }
    assert drifted == {}, (
        "plan-shape drift on optimized faces (re-run "
        "scripts/gen_plan_shape_pins.py ONLY if the change is an "
        f"intentional, documented optimization): {json.dumps(drifted, indent=1)}"
    )
