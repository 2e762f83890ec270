"""Degenerate-input sweep: empty tables and single-row groups through the
round-7 operator surface. At 100 TB someone WILL feed an empty partition,
an empty delta, or a one-event user into every operator; each must return
an empty/correct frame with the right schema — never crash, never emit a
null-stats row (the ks_drift empty-side ANSI divide-by-zero this sweep
originally caught)."""

from __future__ import annotations

import datetime as dt

import pytest


@pytest.fixture(scope="module")
def empties(spark):
    return {
        "docs": spark.createDataFrame([], "doc_id long, text string"),
        "events": spark.createDataFrame(
            [], "user_id long, event_id long, ts timestamp, value double"
        ),
        "pairs": spark.createDataFrame([], "id_a long, id_b long"),
    }


def test_text_ops_empty(spark, empties):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        collocations,
        exact_substring_spans,
        phrase_search,
    )

    assert exact_substring_spans(empties["docs"]).count() == 0
    assert phrase_search(empties["docs"], ["a", "b"]).count() == 0
    assert collocations(empties["docs"]).count() == 0


def test_graph_empty(spark, empties):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        kcore_peel,
    )

    out = kcore_peel(empties["pairs"], k=2, iters=2)
    assert out.columns == ["id", "deg"] and out.count() == 0


def test_stats_empty_and_undefined(spark, empties):
    """Empty inputs give EMPTY outputs; a one-sided-empty KS is undefined
    and must emit no row rather than divide by zero under ANSI."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        anomaly_flags,
        exact_quantiles,
        ks_drift,
        trend_slopes,
    )

    ev = empties["events"]
    assert trend_slopes(ev, "user_id", "ts", "value").count() == 0
    assert anomaly_flags(ev, "user_id", "value", "event_id").count() == 0
    assert exact_quantiles(ev, "value", [0.5]).count() == 0
    one = spark.createDataFrame([(1.0,)], "value double")
    assert ks_drift(one, ev.select("value"), "value").count() == 0
    assert ks_drift(ev.select("value"), one, "value").count() == 0
    assert ks_drift(ev.select("value"), ev.select("value"), "value").count() == 0


def test_throttle_empty_and_single(spark, empties):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.throttle import (
        throttle_events,
    )

    ev = empties["events"].select("user_id", "event_id", "ts")
    assert throttle_events(ev, "user_id", "ts", 60, "event_id").count() == 0
    single = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1))],
        "user_id long, event_id long, ts timestamp",
    )
    assert throttle_events(single, "user_id", "ts", 60, "event_id").count() == 1


def test_incremental_empty_delta_and_base(spark):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.incremental import (
        merge_partial_aggs,
        partial_agg_state,
    )

    aggs = {"n": ("v", "count"), "s": ("v", "sum")}
    base_rows = spark.createDataFrame([("x", 1.0)], "k string, v double")
    empty = spark.createDataFrame([], "k string, v double")
    base = partial_agg_state(base_rows, ["k"], aggs)
    # empty delta: base unchanged
    got = merge_partial_aggs(base, empty, ["k"], aggs).collect()
    assert [(r["k"], r["n"], r["s"]) for r in got] == [("x", 1, 1.0)]
    # empty base: result == delta's own partial state
    got2 = merge_partial_aggs(
        partial_agg_state(empty, ["k"], aggs), base_rows, ["k"], aggs
    ).collect()
    assert [(r["k"], r["n"], r["s"]) for r in got2] == [("x", 1, 1.0)]


def test_exact_quantiles_degenerate_distributions(spark):
    """All-equal values and a single row: every quantile is the value."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        exact_quantiles,
    )

    same = spark.createDataFrame([(5.0,)] * 10, "value double")
    out = exact_quantiles(same, "value", [0.25, 0.5, 0.99]).collect()
    assert [(r["p"], r["value"]) for r in out] == [
        (0.25, 5.0), (0.5, 5.0), (0.99, 5.0),
    ]
    one = spark.createDataFrame([(7.5,)], "value double")
    out1 = exact_quantiles(one, "value", [0.5]).collect()
    assert [(r["p"], r["value"], r["rank"]) for r in out1] == [(0.5, 7.5, 1)]
