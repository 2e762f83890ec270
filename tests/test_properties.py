"""Property-based tests (hypothesis): operator semantics pinned against
brute-force models over generated inputs, not hand-picked fixtures
(SURVEY §5's determinism/ordering concerns, systematically explored).
Example counts are small — every example runs Spark jobs."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
    quality_score,
    token_count,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
    interval_join,
    keep_first,
    pair_rows,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_interval = st.tuples(
    st.sampled_from(["chr1", "chr2"]),
    st.integers(0, 400),
    st.integers(1, 300),  # length (allows bin-spanning at bin_size=100)
)


@given(
    left=st.lists(_interval, min_size=1, max_size=12),
    right=st.lists(_interval, min_size=1, max_size=12),
    frac=st.sampled_from([0.0, 0.25, 0.5, 1.0]),
)
@SETTINGS
def test_interval_join_matches_model(spark, left, right, frac):
    g = pd.DataFrame(
        [(i, c, s, s + ln) for i, (c, s, ln) in enumerate(left)],
        columns=["gid", "chrom", "start", "end"],
    )
    s = pd.DataFrame(
        [(i, c, st_, st_ + ln) for i, (c, st_, ln) in enumerate(right)],
        columns=["sid", "chrom", "start", "end"],
    )
    out = interval_join(
        spark.createDataFrame(g),
        spark.createDataFrame(s),
        bin_size=100,
        min_overlap_frac=frac,
        left_prefix="g_",
        right_prefix="s_",
    ).toPandas()
    m = g.merge(s, on="chrom", suffixes=("_g", "_s"))
    ov = np.minimum(m.end_g, m.end_s) - np.maximum(m.start_g, m.start_s)
    exp = m[(ov > 0) & (ov >= frac * (m.end_g - m.start_g))]
    assert set(zip(out.g_gid, out.s_sid)) == set(zip(exp.gid, exp.sid))
    assert len(out) == len(exp)  # no duplicate pairs from bin spanning


@given(
    sizes=st.lists(st.integers(1, 7), min_size=1, max_size=4),
    drop=st.booleans(),
)
@SETTINGS
def test_pair_rows_model(spark, sizes, drop):
    rows, k = [], 0
    for gi, n in enumerate(sizes):
        for j in range(n):
            rows.append((f"g{gi}", j, f"v{k}"))
            k += 1
    pdf = pd.DataFrame(rows, columns=["grp", "ord", "val"])
    out = (
        pair_rows(spark.createDataFrame(pdf), "grp", "ord", ["val"], drop_unpaired=drop)
        .toPandas()
        .sort_values(["grp", "pair_id"])
    )
    for gi, n in enumerate(sizes):
        got = out[out.grp == f"g{gi}"]
        assert len(got) == (n // 2 if drop else (n + 1) // 2)
        grp_vals = pdf[pdf.grp == f"g{gi}"].sort_values("ord").val.tolist()
        for r in got.itertuples():
            assert r.val_1 == grp_vals[2 * int(r.pair_id)]
            partner = 2 * int(r.pair_id) + 1
            expect_2 = grp_vals[partner] if partner < n else None
            assert (r.val_2 == expect_2) or (expect_2 is None and pd.isna(r.val_2))


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-5, 5), st.integers(0, 99)),
        min_size=1,
        max_size=20,
    )
)
@SETTINGS
def test_keep_first_matches_pandas(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "v", "uid"]).drop_duplicates("uid")
    out = (
        keep_first(
            spark.createDataFrame(pdf),
            ["k"],
            [F.col("v").asc(), F.col("uid").asc()],  # total order -> determinism
        )
        .toPandas()
        .sort_values("k")
    )
    exp = (
        pdf.sort_values(["k", "v", "uid"]).drop_duplicates("k").sort_values("k")
    )
    assert out.uid.tolist() == exp.uid.tolist()


_texts = st.text(
    alphabet=st.sampled_from(list("ab .!?é中")), max_size=40
)


@given(texts=st.lists(_texts, min_size=1, max_size=10))
@SETTINGS
def test_text_function_bounds(spark, texts):
    df = spark.createDataFrame(pd.DataFrame({"t": texts}))
    out = df.select(
        token_count(F.col("t")).alias("n"), quality_score(F.col("t")).alias("q")
    ).toPandas()
    assert (out.n == pd.Series([len(t.split()) for t in texts])).all()
    assert ((out.q >= 0) & (out.q <= 1)).all()
