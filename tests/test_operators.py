"""Operator unit tests against independently-computed expectations."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.contracts import (
    CNV_MANIFEST,
    Contract,
    ContractViolation,
    validate,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
    interval_join,
    keep_first,
    dedup_with_preference,
    pair_rows,
    to_wide_matrix,
    reconcile_counts,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.pivot import (
    DuplicateCellError,
)


def test_interval_join_matches_bruteforce(spark):
    """Binned interval join == brute-force O(n*m) overlap join, including
    pairs that span many bins and min-overlap-fraction filtering."""
    rng = np.random.default_rng(7)
    chroms = ["chr1", "chr1", "chr2", "chr3"]  # skewed on purpose
    genes = pd.DataFrame(
        {
            "gid": range(200),
            "chrom": rng.choice(chroms, 200),
            "start": rng.integers(0, 5_000_000, 200),
        }
    )
    genes["end"] = genes["start"] + rng.integers(1, 2_000_000, 200)  # spans bins
    segs = pd.DataFrame(
        {
            "sid": range(300),
            "chrom": rng.choice(chroms, 300),
            "start": rng.integers(0, 5_000_000, 300),
        }
    )
    segs["end"] = segs["start"] + rng.integers(1, 3_000_000, 300)

    out = interval_join(
        spark.createDataFrame(genes),
        spark.createDataFrame(segs),
        bin_size=1_000_000,
        min_overlap_frac=0.5,
        left_prefix="g_",
        right_prefix="s_",
    ).toPandas()

    m = genes.merge(segs, on="chrom", suffixes=("_g", "_s"))
    ov = np.minimum(m.end_g, m.end_s) - np.maximum(m.start_g, m.start_s)
    m["overlap_bp"] = ov
    exp = m[(ov > 0) & (ov >= 0.5 * (m.end_g - m.start_g))]

    got = set(zip(out.g_gid, out.s_sid, out.overlap_bp))
    want = set(zip(exp.gid, exp.sid, exp.overlap_bp))
    assert got == want
    assert len(out) == len(exp), "no duplicate pairs from multi-bin overlap"


def test_keep_first_deterministic_under_repartition(spark):
    pdf = pd.DataFrame(
        {"k": [1, 1, 1, 2, 2], "v": [3, 1, 2, 9, 8], "tag": list("abcde")}
    )
    df = spark.createDataFrame(pdf)
    for nparts in (1, 7):
        out = (
            keep_first(df.repartition(nparts), ["k"], [F.col("v").asc()])
            .toPandas()
            .sort_values("k")
        )
        assert list(out.tag) == ["b", "e"]


def test_keep_first_per_run_matches_superset_keep_first(spark):
    """keep_first_per_run(subset, run_col) ≡ keep_first(subset+[run_col])
    value-for-value, while its window partitions on subset alone (one
    exchange a downstream join on subset can reuse — the r18 pedmatch
    tumor-side shape). Deterministic under any repartition."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.dedup import (
        keep_first_per_run,
    )

    pdf = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 2, 2],
            "run": ["t1", "t1", "t2", "t2", "t1", "t1"],
            "v": [3, 1, 2, 4, 9, 8],
            "tag": list("abcdef"),
        }
    )
    df = spark.createDataFrame(pdf)
    for nparts in (1, 5):
        got = (
            keep_first_per_run(
                df.repartition(nparts), ["k"], "run", [F.col("v").asc()]
            )
            .toPandas()
            .sort_values(["k", "run"])
        )
        want = (
            keep_first(
                df.repartition(nparts), ["k", "run"], [F.col("v").asc()]
            )
            .toPandas()
            .sort_values(["k", "run"])
        )
        assert list(got.tag) == list(want.tag) == ["b", "c", "f"]
    plan = (
        keep_first_per_run(df, ["k"], "run", [F.col("v").asc()])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the exchange hashes on the subset alone, never the run column
    import re

    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert parts and all(p.startswith("k#") and "run" not in p for p in parts)


def test_snv_merge_multi_tumor_pairs_both_survive(spark):
    """Two tumor samples paired to ONE normal at the same variant must
    BOTH survive the tumor-side dedup (r17 advice: the merge-key-only
    keep_first silently dropped one tumor). pair tables from
    pair_patients can't mint this shape (1-tissue/1-blood guard) but
    snv_merge_sides accepts arbitrary pairs — the operator must not
    lose data on them."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.pedmatch import (
        snv_merge_sides,
    )

    fmt = "GT:GQ:DP:MDP:MAF:FRO:QUAL2:FAO:AF:OTHER"
    rows = [
        # two tumors, same variant identity, different payloads + one
        # bit-duplicate of tumor A (must collapse within its run)
        ("tA", "chr1", 100, "v1", "A", "T", "50", "PASS", "DP=30", fmt, "0/1:99:30:0:0:30:50:20:0.40:x"),
        ("tA", "chr1", 100, "v1", "A", "T", "50", "PASS", "DP=30", fmt, "0/1:99:30:0:0:30:50:20:0.40:x"),
        ("tB", "chr1", 100, "v1", "A", "T", "60", "PASS", "DP=40", fmt, "0/1:99:40:0:0:35:50:25:0.50:x"),
        ("nrm", "chr1", 100, "v1", "A", "T", "50", "PASS", "DP=30", fmt, "0/0:99:30:0:0:30:50:0:0.01:x"),
    ]
    vcf = spark.createDataFrame(
        rows,
        "sample_id string, CHROM string, POS long, ID string, REF string, "
        "ALT string, QUAL string, FILTER string, INFO string, FORMAT string, "
        "SAMPLE_FMT string",
    )
    pairs = spark.createDataFrame(
        [("tA", "nrm"), ("tB", "nrm")],
        "tumor_sample_id string, normal_sample_id string",
    )
    t, n = snv_merge_sides(vcf, pairs)
    tp = t.toPandas().sort_values("tumor_sample_id")
    assert list(tp.tumor_sample_id) == ["tA", "tB"], "both tumors survive"
    assert n.count() == 1


def test_dedup_with_preference(spark):
    pdf = pd.DataFrame(
        {
            "k": ["x", "x", "y", "y"],
            "src": ["raw", "clinical", "raw", "raw"],
            "val": [1, 2, 3, 4],
        }
    )
    df = spark.createDataFrame(pdf)
    pref = F.when(F.col("src") == "clinical", 0).otherwise(1)
    out = dedup_with_preference(df, ["k"], pref, [F.col("val").asc()]).toPandas()
    out = out.sort_values("k")
    assert list(out.val) == [2, 3]  # clinical wins for x; lowest val for y


def test_pair_rows_odd_group_dropped(spark):
    pdf = pd.DataFrame(
        {
            "fid": ["f1"] * 3 + ["f2"] * 2,  # f1 has an odd trailing row
            "ord": [1, 2, 3, 1, 2],
            "gene": ["A", "B", "C", "D", "E"],
        }
    )
    out = pair_rows(
        spark.createDataFrame(pdf), "fid", "ord", ["gene"]
    ).toPandas().sort_values("fid")
    assert list(out.gene_1) == ["A", "D"]
    assert list(out.gene_2) == ["B", "E"]
    assert "C" not in set(out.gene_1) | set(out.gene_2)


def test_pair_rows_null_payload_partner_kept(spark):
    """A genuine pair whose SECOND row has a NULL pair column must survive
    drop_unpaired: the reference's 2-at-a-time loop
    (``pedmatch-clinical-vcf-workflow.py:125-151``) emits it with NaN Site2
    fields. Partner detection must use row position, not a nullable payload."""
    pdf = pd.DataFrame(
        {
            "fid": ["f1", "f1", "f2", "f2", "f3"],
            "ord": [1, 2, 1, 2, 1],
            # f1's second row and f2's FIRST row have null gene
            "gene": ["A", None, None, "D", "E"],
        }
    )
    out = (
        pair_rows(spark.createDataFrame(pdf), "fid", "ord", ["gene"])
        .toPandas()
        .sort_values("fid")
    )
    # both complete pairs kept; odd f3 row dropped
    assert list(out.fid) == ["f1", "f2"]
    assert out.gene_2.isna().tolist() == [True, False]
    assert out.gene_1.isna().tolist() == [False, True]


def test_pair_rows_deterministic_under_repartition(spark):
    """SURVEY §5(d): order-dependent ops must be stable under partitioning."""
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "fid": rng.choice(["f1", "f2", "f3"], 40),
            "ord": range(40),
            "gene": [f"G{i}" for i in range(40)],
        }
    )
    df = spark.createDataFrame(pdf)
    results = []
    for nparts in (1, 3, 11):
        out = (
            pair_rows(df.repartition(nparts), "fid", "ord", ["gene"])
            .toPandas()
            .sort_values(["fid", "pair_id"])
            .reset_index(drop=True)
        )
        results.append(out)
    assert results[0].equals(results[1]) and results[1].equals(results[2])


def test_pivot_duplicate_cells_raise(spark):
    pdf = pd.DataFrame(
        {"g": ["TP53", "TP53"], "s": ["s1", "s1"], "v": [0.1, 0.2]}
    )
    with pytest.raises(DuplicateCellError):
        to_wide_matrix(spark.createDataFrame(pdf), "g", "s", "v")


def test_pivot_fill(spark):
    pdf = pd.DataFrame(
        {"g": ["TP53", "EGFR"], "s": ["s1", "s2"], "v": [1.0, 2.0]}
    )
    out = (
        to_wide_matrix(spark.createDataFrame(pdf), "g", "s", "v", fill=0.0)
        .toPandas()
        .set_index("g")
        .sort_index()
    )
    assert out.loc["TP53", "s1"] == 1.0 and out.loc["TP53", "s2"] == 0.0


def test_wide_matrix_lines_matches_pivot(spark):
    """The text-path matrix writer (no pivotMaxValues bound) must render the
    same cells as groupBy().pivot() in the same column order."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        wide_matrix_lines,
    )

    pdf = pd.DataFrame(
        {
            "Hugo_Symbol": ["TP53", "TP53", "EGFR"],
            "sample_id": ["s1", "s2", "s1"],
            "log2": ["0.5", "-1.2", "2.0"],
        }
    )
    df = spark.createDataFrame(pdf)
    samples = ["s1", "s2", "s3"]
    wide = to_wide_matrix(
        df, "Hugo_Symbol", "sample_id", "log2", fill="NA", column_values=samples
    ).toPandas().set_index("Hugo_Symbol")
    lines = wide_matrix_lines(
        df, "Hugo_Symbol", "sample_id", "log2", column_values=samples, fill="NA"
    ).toPandas().set_index("Hugo_Symbol")
    for gene in ("TP53", "EGFR"):
        expected = "\t".join([gene] + [str(wide.loc[gene, s]) for s in samples])
        assert lines.loc[gene, "line"] == expected


def test_pivot_max_values_boundary(spark):
    """At the documented spark.sql.pivotMaxValues boundary the wide writer
    must fail LOUDLY (not truncate), and the long/text path must render
    the identical matrix — the drop-in scale face (VERDICT r6 task 8)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        wide_matrix_lines,
    )

    n_samples = 8
    pdf = pd.DataFrame(
        {
            "g": ["TP53"] * n_samples + ["EGFR"] * n_samples,
            "s": [f"s{i}" for i in range(n_samples)] * 2,
            "v": [str(round(0.1 * i, 1)) for i in range(2 * n_samples)],
        }
    )
    df = spark.createDataFrame(pdf)
    old = spark.conf.get("spark.sql.pivotMaxValues")
    spark.conf.set("spark.sql.pivotMaxValues", str(n_samples - 1))
    try:
        # width > pivotMaxValues and no explicit column_values: the wide
        # writer must raise (Spark's overflow error names the conf), never
        # silently drop columns
        with pytest.raises(Exception, match="pivotMaxValues|overflow"):
            to_wide_matrix(df, "g", "s", "v").collect()
        # the long/text path has no width bound and needs no conf change
        samples = [f"s{i}" for i in range(n_samples)]
        lines = {
            r["g"]: r["line"]
            for r in wide_matrix_lines(
                df, "g", "s", "v", column_values=samples
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.pivotMaxValues", old)
    # identical matrix: compare against the wide pivot rendered with the
    # cap restored (explicit column_values skips the distinct job)
    wide = (
        to_wide_matrix(df, "g", "s", "v", fill="NA", column_values=samples)
        .toPandas()
        .set_index("g")
    )
    assert set(lines) == {"TP53", "EGFR"}
    for gene, line in lines.items():
        assert line == "\t".join([gene] + [str(wide.loc[gene, s]) for s in samples])


def test_interval_join_inverted_intervals_and_large_coords(spark):
    """Two r8-advice regressions pinned: (a) inverted/empty intervals
    (end <= start) are dropped before the bin explode — `sequence` would
    otherwise count DOWNWARD and manufacture bin rows; (b) bin ids ride
    integer division, so coordinates past 2^53 (where float floor loses
    bucket boundaries) still join exactly."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.interval_join import (
        interval_join,
    )

    base = 1 << 55  # past the float-exact integer range
    left = spark.createDataFrame(
        [
            ("chr1", base + 10, base + 10),      # empty
            ("chr1", base + 500, base + 100),    # inverted
            ("chr1", base + 100, base + 200),    # real
        ],
        "chrom string, start long, end long",
    )
    right = spark.createDataFrame(
        [
            ("chr1", base + 150, base + 160),    # overlaps the real one
            ("chr1", base + 90, base + 80),      # inverted on the right
        ],
        "chrom string, start long, end long",
    )
    out = interval_join(
        left, right, bin_size=64, left_prefix="l_", right_prefix="r_"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["l_start"], r["r_start"], r["overlap_bp"]) == (
        base + 100,
        base + 150,
        10,
    )
    # exactness check: the same coords shifted by 1 must still dedup to
    # exactly one row per overlapping pair (float floor at 2^55 cannot
    # distinguish adjacent bins)
    left2 = spark.createDataFrame(
        [("chr1", base + i * 64, base + i * 64 + 65) for i in range(20)],
        "chrom string, start long, end long",
    )
    got = interval_join(
        left2, left2, bin_size=64, left_prefix="a_", right_prefix="b_"
    ).count()
    # each interval overlaps itself + both neighbours (1-bp spill)
    assert got == 20 + 2 * 19


def test_interval_join_bin_sizes(spark):
    """Result must be invariant to bin width (intervals >> bin and << bin)."""
    genes = spark.createDataFrame(
        pd.DataFrame(
            {"gid": [1, 2], "chrom": ["c", "c"], "start": [0, 5000], "end": [10000, 5100]}
        )
    )
    segs = spark.createDataFrame(
        pd.DataFrame(
            {"sid": [7, 8], "chrom": ["c", "c"], "start": [4000, 9999], "end": [6000, 20000]}
        )
    )
    results = []
    for bs in (10, 1000, 1_000_000):
        out = interval_join(
            genes, segs, bin_size=bs, left_prefix="g_", right_prefix="s_"
        ).toPandas()
        results.append(sorted(zip(out.g_gid, out.s_sid, out.overlap_bp)))
    assert results[0] == results[1] == results[2]
    assert (1, 7, 2000) in results[0] and (2, 7, 100) in results[0]
    assert (1, 8, 1) in results[0]
    # auto width produces the same result as every pinned width
    auto = interval_join(
        genes, segs, bin_size="auto", left_prefix="g_", right_prefix="s_"
    ).toPandas()
    assert sorted(zip(auto.g_gid, auto.s_sid, auto.overlap_bp)) == results[0]


def test_interval_join_auto_bin_bounds_pathological_mixes(spark):
    """The auto-derived width keeps replication bounded on the worst
    length mixes SURVEY §7 flags: many 1 bp reads + a few chromosome-arm
    segments (small-p95 corpora must not shred the arms into millions of
    bins), and the reverse (arm-dominated corpora must not key-collapse
    the reads). Bound: total binned rows <= 3x input intervals, which is
    exactly the sum(ceil(len/W)) <= 2N guarantee of W >= mean plus slack
    for the pow2 rounding."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.interval_join import (
        _binned,
        derive_bin_size,
    )

    arm = 50_000_000
    reads = pd.DataFrame(
        {
            "rid": range(2000),
            "chrom": ["c1"] * 2000,
            "start": [i * 17 % 1_000_000 for i in range(2000)],
        }
    )
    reads["end"] = reads["start"] + 1
    segs = pd.DataFrame(
        {
            "sid": range(5),
            "chrom": ["c1"] * 5,
            "start": [0, arm, 2 * arm, 0, arm],
            "end": [arm, 2 * arm, 3 * arm, 2 * arm, 3 * arm],
        }
    )
    for l_pd, r_pd in [(reads, segs), (segs, reads)]:
        l_df = spark.createDataFrame(l_pd)
        r_df = spark.createDataFrame(r_pd)
        w = derive_bin_size(l_df, r_df)
        n_in = len(l_pd) + len(r_pd)
        n_binned = (
            _binned(l_df, "chrom", "start", "end", w, "l_").count()
            + _binned(r_df, "chrom", "start", "end", w, "r_").count()
        )
        assert n_binned <= 3 * n_in, (w, n_binned, n_in)
        # and the join over the auto width is still exact vs brute force
        got = interval_join(
            l_df, r_df, bin_size=w, left_prefix="l_", right_prefix="r_"
        )
        brute = l_df.toPandas().merge(r_df.toPandas(), on="chrom", suffixes=("_l", "_r"))
        brute = brute[
            (brute.start_l < brute.end_r) & (brute.start_r < brute.end_l)
        ]
        assert got.count() == len(brute)


def test_reconcile_counts(spark):
    e = spark.createDataFrame(pd.DataFrame({"k": ["a", "b"], "expected": [2, 1]}))
    o = spark.createDataFrame(pd.DataFrame({"k": ["b", "c"], "observed": [1, 5]}))
    out = reconcile_counts(e, o, ["k"]).toPandas().set_index("k").sort_index()
    assert out.loc["a"].expected == 2 and out.loc["a"].observed == 0
    assert bool(out.loc["a"].mismatch) and not bool(out.loc["b"].mismatch)
    assert bool(out.loc["c"].mismatch)


def test_salted_aggregate_and_join(spark):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        salted_aggregate,
        salted_join,
    )

    # heavily skewed key distribution: 'hot' holds 90% of rows
    pdf = pd.DataFrame(
        {
            "k": ["hot"] * 900 + ["cold"] * 100,
            "v": list(range(900)) + list(range(100)),
        }
    )
    df = spark.createDataFrame(pdf)
    agg = salted_aggregate(
        df, ["k"], {"total": ("v", "sum"), "n": ("v", "count"), "mx": ("v", "max")}
    ).toPandas().set_index("k")
    assert agg.loc["hot"].total == sum(range(900)) and agg.loc["hot"].n == 900
    assert agg.loc["cold"].mx == 99

    dim = spark.createDataFrame(pd.DataFrame({"k": ["hot", "cold"], "label": ["H", "C"]}))
    joined = salted_join(df, dim, on=["k"]).toPandas()
    assert len(joined) == 1000  # no row duplication or loss
    assert set(joined[joined.k == "hot"].label) == {"H"}


def test_read_whitespace(spark, tmp_path):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources.tsv import (
        read_whitespace,
    )

    p = tmp_path / "wc.txt"
    p.write_text("  120 /out/a_annotated.maf\n 33   /out/b_annotated.maf\n\n")
    out = read_whitespace(spark, str(p), ["line_count", "file_name"]).toPandas()
    assert list(out.line_count) == ["120", "33"]
    assert out.file_name.iloc[0].endswith("a_annotated.maf")


def test_contract_validation(spark):
    good = spark.createDataFrame(
        pd.DataFrame(
            {
                "sample_id": ["s1", "s2"],
                "s3_url": ["s3://b/f1", "s3://b/f2"],
                "file_name": ["f1", "f2"],
                "md5sum": ["m1", "m2"],
                "file_size": [10, 20],
            }
        )
    )
    validate(good, CNV_MANIFEST)  # should not raise

    with pytest.raises(ContractViolation, match="missing"):
        validate(good.drop("md5sum"), CNV_MANIFEST)
    dup = good.union(good.limit(1))
    with pytest.raises(ContractViolation, match="duplicate"):
        validate(dup, CNV_MANIFEST)
    withnull = good.withColumn(
        "sample_id", F.when(F.col("file_size") == 10, None).otherwise(F.col("sample_id"))
    )
    with pytest.raises(ContractViolation, match="null"):
        validate(withnull, CNV_MANIFEST)
    with pytest.raises(ContractViolation, match="enum"):
        validate(
            good.withColumn("sample_type", F.lit("plasma")),
            Contract(enums={"sample_type": ("tissue", "blood")}),
        )


def test_approx_profile_error_bounds(spark):
    """Sketch profile vs exact answers: HLL++ distinct within its rsd
    envelope, percentile_approx within rank error, one row per group."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        approx_profile,
    )

    df = spark.range(50_000).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        (F.col("id") % 7919).alias("user"),  # 7919 distinct per full cycle
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    got = {r["grp"]: r for r in approx_profile(df, "grp", "user", "v").collect()}
    exact = {
        r["grp"]: r["d"]
        for r in df.groupBy("grp").agg(F.countDistinct("user").alias("d")).collect()
    }
    for g, row in got.items():
        assert abs(row["approx_distinct"] - exact[g]) / exact[g] < 0.05
        p50, p95, p99 = row["approx_percentiles"]
        assert abs(p50 - 500) < 25 and abs(p95 - 950) < 25 and abs(p99 - 990) < 25
        assert row["n_rows"] > 0


def test_contract_empty_string_semantics(spark):
    """Pin both empty-string modes: the default treats '' as null (matching
    the reference's read_csv-mediated isnull), empty_is_null=False is the
    strict isnull() that lets '' through."""
    df = spark.createDataFrame(
        pd.DataFrame({"sample_id": ["s1", ""], "other": [1, 2]})
    )
    with pytest.raises(ContractViolation, match="null/empty"):
        validate(df, Contract(no_null=("sample_id",)))
    # strict isnull(): '' is a value, passes
    validate(df, Contract(no_null=("sample_id",), empty_is_null=False))
    # a true null fails in both modes
    withnull = df.withColumn(
        "sample_id",
        F.when(F.col("other") == 2, None).otherwise(F.col("sample_id")),
    )
    with pytest.raises(ContractViolation, match="null"):
        validate(withnull, Contract(no_null=("sample_id",), empty_is_null=False))


def test_kcore_peel_chain_vs_clique(spark):
    """2-core semantics on a known graph: a 4-chain peels away entirely
    (iteratively — endpoints first, then the rest), a 4-clique survives
    with degree 3, and a pendant vertex on the clique is removed without
    harming it. Also pins convergence: iters=3 equals iters=6 here."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        kcore_peel,
    )

    edges = [
        # chain 10-11-12-13
        (10, 11), (11, 12), (12, 13),
        # clique 1,2,3,4
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        # pendant 5 on the clique
        (4, 5),
    ]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["deg"] for r in kcore_peel(pairs, k=2, iters=3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    got6 = {r["id"]: r["deg"] for r in kcore_peel(pairs, k=2, iters=6).collect()}
    assert got6 == got


def test_kcore_face_converged_on_corpus(spark):
    """The registered face documents that 3 peel rounds converge on the
    shared documents pair graph — verify iters=3 == iters=4 there."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
        load_table,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ngram_jaccard_pairs,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        kcore_peel,
    )

    d = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        F.col("doc_id") < 1000
    )
    pairs = ngram_jaccard_pairs(d, threshold=0.5).select("id_a", "id_b")
    pairs = pairs.persist()
    a = sorted(map(tuple, kcore_peel(pairs, k=2, iters=3).collect()))
    b = sorted(map(tuple, kcore_peel(pairs, k=2, iters=4).collect()))
    pairs.unpersist()
    assert a == b and len(a) > 0


def test_ks_drift_known_value(spark):
    """Exact KS on hand-checkable samples: a=[1,2,3,4], b=[3,4,5,6] →
    D = 1/2 at x just below 3 (c_a=2,c_b=0): d_cross = |2*4-0*4| = 8,
    d_fp = 500000. Identical values across bucket counts (boundaries
    must never affect the statistic)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        ks_drift,
    )

    a = spark.createDataFrame([(v,) for v in [1, 2, 3, 4]], "v int")
    b = spark.createDataFrame([(v,) for v in [3, 4, 5, 6]], "v int")
    for nb in (1, 2, 64):
        row = ks_drift(a, b, "v", n_buckets=nb).collect()[0]
        assert (row["n_a"], row["n_b"], row["d_cross"], row["d_fp"]) == (
            4, 4, 8, 500000,
        ), f"n_buckets={nb}: {row}"


def test_phrase_search_overlapping_and_boundaries(spark):
    """Index-plan semantics pinned on hand-built docs: overlapping
    occurrences both count ('a a a' contains 'a a' twice), phrases never
    match across the token boundary of a longer token ('ab c' is not
    'a b'), and every occurrence in a doc is counted."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        phrase_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "a a a"),          # 'a a' at positions 0 and 1 -> 2 hits
            (2, "x a b y a b"),    # 'a b' twice
            (3, "ab c a"),         # substring trap: no 'a b' here
            (4, "b a"),            # reversed: no hit
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_hits"]
        for r in phrase_search(docs, ["a", "a"]).collect()
    }
    assert got == {1: 2}
    got2 = {
        r["doc_id"]: r["n_hits"]
        for r in phrase_search(docs, ["a", "b"]).collect()
    }
    assert got2 == {2: 2}


def test_merge_partial_aggs_equals_full_recompute(spark):
    """Fold algebra: base partial state + delta == full recompute for
    every mergeable fn, including keys present only in the delta and
    only in the base."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.incremental import (
        merge_partial_aggs,
        partial_agg_state,
    )

    rows = [
        ("x", 1.0), ("x", 2.0), ("y", 10.0),           # base
        ("x", 4.0), ("z", 7.0),                        # delta (z is new)
    ]
    full = spark.createDataFrame(rows, "k string, v double")
    base_rows, delta_rows = rows[:3], rows[3:]
    aggs = {
        "n": ("v", "count"),
        "s": ("v", "sum"),
        "mn": ("v", "min"),
        "mx": ("v", "max"),
    }
    base = partial_agg_state(
        spark.createDataFrame(base_rows, "k string, v double"), ["k"], aggs
    )
    merged = merge_partial_aggs(
        base, spark.createDataFrame(delta_rows, "k string, v double"), ["k"], aggs
    )
    want = {
        tuple(r)
        for r in partial_agg_state(full, ["k"], aggs).collect()
    }
    assert {tuple(r) for r in merged.collect()} == want
    assert {r["k"] for r in merged.collect()} == {"x", "y", "z"}


def test_throttle_events_greedy_not_lag(spark):
    """The chain case that separates throttle (previous KEPT) from a lag
    window (previous ROW): events at t=0,3,5 with gap 4 keep {0, 5} —
    a lag-based filter would drop 5 (only 2 after 3). Also: ties broken
    by the tiebreak column, first event always kept, keys independent."""
    import datetime as dt

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.throttle import (
        throttle_events,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 10, t0),
        (1, 11, t0 + dt.timedelta(seconds=3)),
        (1, 12, t0 + dt.timedelta(seconds=5)),
        (2, 20, t0),  # other key unaffected
        (2, 21, t0),  # same-ts tie: event_id 20 kept, 21 throttled
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    kept = {
        r["event_id"]
        for r in throttle_events(
            df, "user_id", "ts", gap_seconds=4, tiebreak_col="event_id"
        ).collect()
    }
    assert kept == {10, 12, 20}


def test_throttle_null_keys_one_group(spark):
    """NULL keys throttle as ONE group (first kept, rest gated on the
    gap), matching the old applyInPandas grouping — for BOTH null
    representations the Arrow bridge produces: object-dtype None (string
    key) and float NaN (nullable long key, where a naive numpy ``!=``
    fragments the group because NaN != NaN)."""
    import datetime as dt

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.throttle import (
        throttle_events,
    )

    t0 = dt.datetime(2024, 1, 1)
    for other_key, schema in (
        ("a", "k string, eid long, ts timestamp"),
        (7, "k long, eid long, ts timestamp"),
    ):
        rows = [
            (None, 1, t0),
            (None, 2, t0 + dt.timedelta(seconds=1)),  # throttled (gap 10)
            (None, 3, t0 + dt.timedelta(seconds=12)),  # kept
            (other_key, 4, t0),
        ]
        df = spark.createDataFrame(rows, schema)
        kept = {
            r["eid"]
            for r in throttle_events(df, "k", "ts", 10, "eid").collect()
        }
        assert kept == {1, 3, 4}, schema


def test_throttle_cursor_across_arrow_batches(spark):
    """A key split across Arrow batches resumes the carried cursor: with
    maxRecordsPerBatch=4 a 30-event key spans ~8 batches, and the result
    must still equal the sequential greedy model (the resume path the
    default 10k batch size never exercises)."""
    import datetime as dt

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.throttle import (
        throttle_events,
    )

    t0 = dt.datetime(2024, 1, 1)
    # key 1: events every 3s, gap 7 -> keep t=0,9,18,... (greedy jumps);
    # key 2 interleaved to exercise a batch-internal key change too.
    rows = [(1, i, t0 + dt.timedelta(seconds=3 * i)) for i in range(30)]
    rows += [(2, 100 + i, t0 + dt.timedelta(seconds=5 * i)) for i in range(5)]
    df = spark.createDataFrame(rows, "k long, eid long, ts timestamp")

    want = set()
    for k in (1, 2):
        last = None
        for kk, eid, ts in sorted(r for r in rows if r[0] == k):
            if last is None or (ts - last).total_seconds() >= 7:
                want.add(eid)
                last = ts
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(conf, "10000")
    spark.conf.set(conf, "4")
    try:
        got = {
            r["eid"]
            for r in throttle_events(df, "k", "ts", 7, "eid").collect()
        }
    finally:
        spark.conf.set(conf, old)
    assert got == want


def test_throttle_oracle_null_safe_join(spark):
    """The DuckDB oracle's recursive step joins NULL-safely
    (IS NOT DISTINCT FROM): on an input with NULL keys it must agree with
    the engine fold — a plain equality join would drop every NULL-key row
    after the first."""
    import datetime as dt

    import duckdb

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.throttle import (
        throttle_events,
        throttle_events_sql,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (None, 1, t0),
        (None, 2, t0 + dt.timedelta(seconds=3)),
        (None, 3, t0 + dt.timedelta(seconds=20)),
        (None, 4, t0 + dt.timedelta(seconds=25)),
        ("u", 5, t0),
        ("u", 6, t0 + dt.timedelta(seconds=30)),
    ]
    df = spark.createDataFrame(rows, "k string, eid long, ts timestamp")
    got = {
        r["eid"] for r in throttle_events(df, "k", "ts", 10, "eid").collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (k VARCHAR, eid BIGINT, ts TIMESTAMP)"
    )
    con.executemany("INSERT INTO ev VALUES (?, ?, ?)", rows)
    sql = throttle_events_sql(
        "SELECT k, eid, ts FROM ev",
        key_col="k",
        ts_col="ts",
        gap_seconds=10,
        tiebreak_col="eid",
        out_cols="eid",
    )
    want = {r[0] for r in con.execute(sql).fetchall()}
    assert got == want == {1, 3, 5, 6}


def test_countmin_merge_and_upper_bound(spark):
    """The Count-Min sketch is LINEAR: sketches of disjoint shards sum
    counter-wise into the full-corpus sketch (the property that makes it
    a 100 TB structure), and every estimate upper-bounds the true
    count."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    words = (["spark"] * 30 + ["hash"] * 20 + ["scan"] * 10
             + [f"rare{i}" for i in range(40)])
    full = spark.createDataFrame([(w,) for w in words], "token string")
    half_a = spark.createDataFrame([(w,) for w in words[:50]], "token string")
    half_b = spark.createDataFrame([(w,) for w in words[50:]], "token string")
    d, w = 4, 64  # narrow width -> collisions guaranteed, bound still holds
    sk_full = {(r["row"], r["bucket"]): r["c"]
               for r in countmin_sketch(full, "token", d, w).collect()}
    merged: dict = {}
    for shard in (half_a, half_b):
        for r in countmin_sketch(shard, "token", d, w).collect():
            key = (r["row"], r["bucket"])
            merged[key] = merged.get(key, 0) + r["c"]
    assert merged == sk_full
    probes = full.select("token").distinct()
    est = {
        r["token"]: r["est_n"]
        for r in countmin_estimate(
            countmin_sketch(full, "token", d, w), probes, "token", d, w
        ).collect()
    }
    true = {w_: words.count(w_) for w_ in set(words)}
    assert all(est[t] >= n for t, n in true.items())
    assert est["spark"] >= 30 and est["hash"] >= 20


def test_hll_merge_and_error_bound(spark):
    """The portable HLL merges register-wise by MAX: shard sketches of
    disjoint corpus halves merge into exactly the full-corpus register
    table (the 100 TB property, mirroring countmin's linearity test),
    duplicates never move a register, and the deterministic md5-derived
    estimate lands within the 3-sigma 1.04/sqrt(m) band of the truth."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_sketch,
    )

    items = [f"item-{i}" for i in range(5000)]
    full = spark.createDataFrame([(w,) for w in items], "k string")
    half_a = spark.createDataFrame([(w,) for w in items[:2500]], "k string")
    # overlap on purpose: rows 2000-2500 appear in both shards
    half_b = spark.createDataFrame([(w,) for w in items[2000:]], "k string")
    p, m = 9, 512
    regs = lambda df: {  # noqa: E731
        (r["idx"], r["rho"]) for r in hll_sketch(df, "k", p).collect()
    }
    merged = hll_merge(hll_sketch(half_a, "k", p), hll_sketch(half_b, "k", p))
    assert regs(full) == {(r["idx"], r["rho"]) for r in merged.collect()}
    # duplicates are free: sketch of the corpus 3x == sketch of the corpus
    tripled = full.union(full).union(full)
    assert regs(tripled) == regs(full)
    row = hll_estimate(hll_sketch(full, "k", p), p).collect()[0]
    assert abs(row["est_n"] - 5000) <= 3 * 1.04 / (m ** 0.5) * 5000
    assert row["s_sum"] > 0 and row["n_present"] + row["n_zero"] == m


def test_hll_linear_counting_branch(spark):
    """At tiny cardinality the raw HLL estimator is biased high; the
    library's est_corrected DOUBLE applies linear counting m*ln(m/V)
    and must land near the truth (the certified faces select the
    integer columns only — this branch is the library convenience)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.sketches import (
        hll_estimate,
        hll_sketch,
    )

    small = spark.createDataFrame([(f"t{i}",) for i in range(30)], "k string")
    row = hll_estimate(hll_sketch(small, "k", 9), 9).collect()[0]
    assert row["est_n"] > 30  # raw estimate: biased in this regime
    assert abs(row["est_corrected"] - 30) <= 5  # LC lands on target


def test_hll_grouped_matches_per_group_sketch(spark):
    """The grouped HLL is EXACTLY the per-group application of the
    single-key sketch: registers and integer estimates agree group by
    group with independently-built sketches, and each group's estimate
    lands in the 3-sigma band of its true cardinality."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.sketches import (
        hll_estimate,
        hll_estimate_grouped,
        hll_sketch,
        hll_sketch_grouped,
    )

    rows = [(f"g{i % 3}", f"item-{i % 3}-{i // 3 % (2000 * (i % 3 + 1))}")
            for i in range(18000)]
    df = spark.createDataFrame(rows, "g string, k string")
    grouped = hll_estimate_grouped(
        hll_sketch_grouped(df, "g", "k", 9), "g", 9
    ).collect()
    for row in grouped:
        solo = hll_estimate(
            hll_sketch(df.filter(df.g == row["g"]), "k", 9), 9
        ).collect()[0]
        assert (row["s_sum"], row["est_n"]) == (solo["s_sum"], solo["est_n"])
        true_n = df.filter(df.g == row["g"]).select("k").distinct().count()
        assert abs(row["est_n"] - true_n) <= 3 * 1.04 / (512 ** 0.5) * true_n


def test_hll_null_values_are_not_set_members(spark):
    """NULLs are not set members (r8 advice): a sketch over a column with
    NULLs must equal the sketch over the NULL-free slice — no (NULL, NULL)
    register row inflating n_present — and an all-NULL group must estimate
    0 with s_sum = m * 2^49 (not NULL s_sum) in the grouped face."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.sketches import (
        hll_estimate,
        hll_estimate_grouped,
        hll_sketch,
        hll_sketch_grouped,
    )

    vals = [(f"g{i % 2}", f"item-{i}") for i in range(400)]
    rows = vals + [("g0", None), ("g1", None), ("gnull", None)]
    df = spark.createDataFrame(rows, "g string, k string")
    clean = spark.createDataFrame(vals, "g string, k string")

    dirty_regs = sorted(
        (r["idx"], r["rho"]) for r in hll_sketch(df, "k", 9).collect()
    )
    clean_regs = sorted(
        (r["idx"], r["rho"]) for r in hll_sketch(clean, "k", 9).collect()
    )
    assert dirty_regs == clean_regs
    assert all(i is not None for i, _ in dirty_regs)

    est = {
        r["g"]: r
        for r in hll_estimate_grouped(
            hll_sketch_grouped(df, "g", "k", 9), "g", 9
        ).collect()
    }
    # the all-NULL group contributes no register rows at all, so it is
    # absent from the grouped sketch (an empty set has no sketch rows)
    assert "gnull" not in est
    for g in ("g0", "g1"):
        solo = hll_estimate(
            hll_sketch(clean.filter(clean.g == g), "k", 9), 9
        ).collect()[0]
        assert (est[g]["s_sum"], est[g]["est_n"]) == (
            solo["s_sum"],
            solo["est_n"],
        )
    # the coalesce path: a grouped sketch with an injected empty register
    # table still yields integer s_sum = m * 2^49 for missing groups only
    # via hll_estimate on an EMPTY sketch
    empty = hll_sketch(df.filter("k IS NULL AND g = 'gnull'"), "k", 9)
    row = hll_estimate(empty, 9).collect()[0]
    assert row["n_present"] == 0 and row["s_sum"] == 512 * (1 << 49)
    assert row["est_n"] is not None


def test_bloom_no_false_negatives_and_merge(spark):
    """The Bloom membership guarantee under FORCED collisions (m=256 for
    600 members => heavy bit sharing): every true member still probes
    maybe_member (zero false negatives — the property that lets a dedup
    pre-filter skip exact checks for 'definitely new'), false positives
    DO appear in this regime (the filter is honest about being
    approximate), and shard filters OR-merge into exactly the full
    filter."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.sketches import (
        bloom_build,
        bloom_merge,
        bloom_probe,
    )

    members = [f"m{i}" for i in range(600)]
    others = [f"x{i}" for i in range(600)]
    mdf = spark.createDataFrame([(s,) for s in members], "key string")
    odf = spark.createDataFrame([(s,) for s in others], "key string")
    k, m = 4, 256
    bloom = bloom_build(mdf, "key", k, m).persist()
    got_m = {
        r["key"]: r["maybe_member"]
        for r in bloom_probe(bloom, mdf, "key", k, m).collect()
    }
    assert all(got_m.values())  # zero false negatives, always
    got_o = [
        r["maybe_member"]
        for r in bloom_probe(bloom, odf, "key", k, m).collect()
    ]
    assert any(got_o)  # collisions forced: FPs must exist at this load
    # merge: shard filters OR together into exactly the full bit table
    half_a = bloom_build(mdf.filter(F.col("key") < "m3"), "key", k, m)
    half_b = bloom_build(mdf.filter(F.col("key") >= "m3"), "key", k, m)
    merged = {
        (r["row"], r["bit"]) for r in bloom_merge(half_a, half_b).collect()
    }
    assert merged == {(r["row"], r["bit"]) for r in bloom.collect()}
    bloom.unpersist()


def test_hll_overlap_consistent_with_single_sketch_path(spark):
    """hll_overlap's one-pass triple sketch must agree EXACTLY with the
    already-certified hll_sketch/hll_merge/hll_estimate composition on
    each component, and the overlap estimate must track the true
    intersection within HLL noise (~1.04/sqrt(m) per sketch)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_overlap,
        hll_sketch,
    )

    a = spark.range(0, 3000).selectExpr("CAST(id AS STRING) AS k")
    b = spark.range(2000, 6000).selectExpr("CAST(id AS STRING) AS k")
    got = hll_overlap(a, b, "k", p=9).collect()[0]
    sa, sb = hll_sketch(a, "k", 9), hll_sketch(b, "k", 9)
    ea = hll_estimate(sa, 9).collect()[0]["est_n"]
    eb = hll_estimate(sb, 9).collect()[0]["est_n"]
    eu = hll_estimate(hll_merge(sa, sb), 9).collect()[0]["est_n"]
    assert (got["est_a"], got["est_b"], got["est_union"]) == (ea, eb, eu)
    assert got["est_overlap"] == max(0, ea + eb - eu)
    # true overlap 1000; three-sketch inclusion-exclusion compounds the
    # per-sketch ~4.6% rse so allow a generous but bounded band
    assert 300 <= got["est_overlap"] <= 1700


def test_interval_join_rejects_negative_starts(spark):
    """Regression (r9 advice): `div` truncates toward zero, so a negative
    start would mis-bin relative to floor and silently DROP overlapping
    pairs. The BED non-negativity assumption is now enforced per row —
    negative coordinates fail loudly instead of mis-joining."""
    import pytest

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.interval_join import (
        interval_join,
    )

    left = spark.createDataFrame(
        [("chr1", -70, 10)], "chrom string, start long, end long"
    )
    right = spark.createDataFrame(
        [("chr1", 0, 5)], "chrom string, start long, end long"
    )
    with pytest.raises(Exception, match="negative start"):
        interval_join(
            left, right, bin_size=64, left_prefix="l_", right_prefix="r_"
        ).collect()
