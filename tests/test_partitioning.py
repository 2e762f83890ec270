"""Partitioned layout: pruning must reach the scan (the 100 TB contract —
a partition-scoped query reads one directory, not the table)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources import (
    write_partitioned,
)


def test_partition_pruning_reaches_scan(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).cast("string").alias("day"),
        (F.col("id") * 3).alias("value"),
    )
    path = str(tmp_path / "events_by_day")
    write_partitioned(df, path, ["day"])
    # hive layout on disk
    assert os.path.isdir(os.path.join(path, "day=3"))

    back = spark.read.parquet(path).filter(F.col("day") == "3")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan
    # the non-partition filter must ALSO push to parquet when present
    both = spark.read.parquet(path).filter(
        (F.col("day") == "3") & (F.col("value") > 100)
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        both.explain("formatted")
    formatted = buf.getvalue()
    assert "PushedFilters" in formatted and "GreaterThan(value" in formatted
    got = back.count()
    want = df.filter(F.col("day") == "3").count()
    assert got == want


def test_multi_column_partitioning_roundtrip(spark, tmp_path):
    """Nested partition dirs (study/day) prune on either column and the
    partition columns come back typed as read (string dirs)."""
    df = spark.range(400).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias("study"),
        (F.col("id") % 5).cast("string").alias("day"),
        F.col("id").alias("value"),
    )
    path = str(tmp_path / "events_nested")
    write_partitioned(df, path, ["study", "day"])
    assert os.path.isdir(os.path.join(path, "study=s1", "day=4"))
    back = spark.read.parquet(path)
    one = back.filter((F.col("study") == "s1") & (F.col("day") == "4"))
    assert one.count() == df.filter(
        (F.col("study") == "s1") & (F.col("day") == "4")
    ).count()
    # pruning on the OUTER column alone also reaches the scan
    plan = back.filter(F.col("study") == "s0")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "study" in plan


def test_sql_face_plans(spark):
    """Plan shapes through the SQL face: Q5's dims broadcast with no
    cartesian product; Q4's EXISTS decorrelates to a semi join; Q17's
    correlated scalar aggregate decorrelates to an aggregate+join (no
    per-row subquery node survives planning)."""
    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    p5 = m.q_tpch_q5_shape(spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p5 and "CartesianProduct" not in p5
    p4 = m.q_tpch_q4_exists(spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in p4
    p17 = (
        m.q_tpch_q17_avg_subquery(spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the correlated scalar subquery must be decorrelated away entirely —
    # assert the absence of any surviving per-row subquery node directly
    # (the old `"Subquery" not in p17 or "HashAggregate" in p17` was
    # vacuous: every aggregate plan contains a HashAggregate)
    assert "ScalarSubquery" not in p17 and "Subquery" not in p17
    # and the decorrelated shape: the avg is a join input, not a probe
    assert "HashAggregate" in p17 and (
        "SortMergeJoin" in p17 or "BroadcastHashJoin" in p17 or "ShuffledHashJoin" in p17
    )


def test_bucketed_join_eliminates_exchange(spark, tmp_path):
    """Two tables bucketed on the same key with the same bucket count must
    join with NO Exchange on either side (the shuffle was paid at write
    time), and results must match the plain-parquet join exactly."""
    import pandas as pd

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources.bucketed import (
        read_bucketed,
        write_bucketed,
    )

    n = 5000
    left = spark.createDataFrame(
        pd.DataFrame({"k": [i % 700 for i in range(n)], "a": range(n)})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [i % 700 for i in range(n)], "b": range(n)})
    )
    write_bucketed(left, "t_bkt_l", ["k"], 8, sort_cols=["k"],
                   path=str(tmp_path / "l"))
    write_bucketed(right, "t_bkt_r", ["k"], 8, sort_cols=["k"],
                   path=str(tmp_path / "r"))
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            bl, br = read_bucketed(spark, "t_bkt_l"), read_bucketed(spark, "t_bkt_r")
            joined = bl.join(br, "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert "SelectedBucketsCount" in plan
            got = joined.groupBy("k").count()
            want = left.join(right, "k").groupBy("k").count()
            assert sorted(map(tuple, got.collect())) == sorted(
                map(tuple, want.collect())
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_l")
        spark.sql("DROP TABLE IF EXISTS t_bkt_r")


def test_bucket_pruning_on_equality_predicate(spark, tmp_path):
    """An equality predicate on the bucket key must scan only the matching
    bucket's files (SelectedBucketsCount 1 out of 8)."""
    import pandas as pd
    import re

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources.bucketed import (
        read_bucketed,
        write_bucketed,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"k": [i % 64 for i in range(2000)], "v": range(2000)})
    )
    write_bucketed(df, "t_bkt_p", ["k"], 8, path=str(tmp_path / "p"))
    # autoBucketedScan only credits shuffle elimination, not pruning — a
    # filter-only query gets its bucketed scan "disabled by query planner"
    # unless forced (the conf a pruning-reliant deployment sets)
    old = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        q = read_bucketed(spark, "t_bkt_p").filter(F.col("k") == 7)
        plan = q._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m, plan
        assert (m.group(1), m.group(2)) == ("1", "8"), m.groups()
        assert q.count() == sum(1 for i in range(2000) if i % 64 == 7)
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", old
        )
        spark.sql("DROP TABLE IF EXISTS t_bkt_p")


def test_interval_join_bucketed_exchange_free(spark, tmp_path):
    """The 100 TB face of the one custom physical op: both interval sides
    written pre-binned and co-bucketed on (_chrom, _bin) must (a) produce
    byte-identical rows to the in-flight interval_join and (b) plan the
    join with ZERO Exchange nodes — the bin-explode shuffle was paid once
    at write time (genomics workloads re-join the same gene/segment
    tables per cohort; cnv.py:430 reruns per run)."""
    import pandas as pd

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.interval_join import (
        interval_join,
        interval_join_bucketed,
        write_binned_bucketed,
    )

    rng = range(400)
    genes = spark.createDataFrame(
        pd.DataFrame(
            {
                "chrom": [f"chr{i % 5 + 1}" for i in rng],
                "start": [i * 977 % 50_000 for i in rng],
                "end": [i * 977 % 50_000 + 120 + i % 900 for i in rng],
                "gene": [f"g{i}" for i in rng],
            }
        )
    )
    segs = spark.createDataFrame(
        pd.DataFrame(
            {
                "chrom": [f"chr{i % 5 + 1}" for i in rng],
                "start": [i * 1663 % 50_000 for i in rng],
                "end": [i * 1663 % 50_000 + 200 + i % 1500 for i in rng],
                "seg": list(rng),
            }
        )
    )
    w = 4096
    write_binned_bucketed(genes, "t_ij_l", bin_size=w, n_buckets=8,
                          prefix="l_", path=str(tmp_path / "l"))
    write_binned_bucketed(segs, "t_ij_r", bin_size=w, n_buckets=8,
                          prefix="r_", path=str(tmp_path / "r"))
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            got = interval_join_bucketed(
                spark, "t_ij_l", "t_ij_r", bin_size=w, min_overlap_frac=0.5
            )
            plan = got._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert "SelectedBucketsCount" in plan
            want = interval_join(
                genes, segs, bin_size=w, min_overlap_frac=0.5
            )
            key = lambda r: (r["l_gene"], r["r_seg"])  # noqa: E731
            got_rows = sorted(map(tuple, got.collect()))
            want_rows = sorted(map(tuple, want.select(*got.columns).collect()))
            assert got_rows == want_rows and got_rows
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ij_l")
        spark.sql("DROP TABLE IF EXISTS t_ij_r")


def test_snv_merge_bucketed_exchange_free(spark, tmp_path):
    """The 100 TB knob for the somatic chain's dominant cost (r10
    SCALE_NOTES: the tumor/normal full-outer variant merge is ~50% of
    somatic_calls wall): both VCF sides written bucketed + bucket-sorted
    on SNV_MERGE_KEYS must (a) produce exactly the rows of the in-flight
    snv_somatic and (b) plan the merge + somatic tail with ZERO Exchange
    nodes — the variant-identity shuffle was paid once at ingest."""
    import pandas as pd

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.pedmatch import (
        snv_somatic,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.pedmatch_bucketed import (
        snv_somatic_bucketed,
        write_snv_sides_bucketed,
    )

    def fmt(gt, dp, fro, fao, af):
        return f"{gt}:x:{dp}:x:x:{fro}:x:{fao}:{af:.2f}"

    t_rows, n_rows = [], []
    for i in range(360):
        pid = i % 2 + 1
        t_rows.append(
            (f"P{pid}_T", f"chr{i % 5 + 1}", i * 37 % 10_000, f"v{i}",
             "A", "C,G" if i % 7 == 0 else "T", "100",
             "FAIL" if i % 11 == 0 else "PASS",
             "SVTYPE=Fusion;X=1" if i % 13 == 0 else "X=1",
             "GT:A:DP:B:C:FRO:D:FAO:AF",
             fmt("0/0" if i % 17 == 0 else "0/1",
                 i % 40 + 10, i % 50, i % 30, (i % 20) / 100))
        )
        if i % 3 == 0:  # unmatched tumor rows exercise the full-outer
            n_rows.append(
                (f"P{pid}_N", f"chr{i % 5 + 1}", i * 37 % 10_000, f"v{i}",
                 "A", "T", "100", "PASS", "X=1",
                 "GT:A:DP:B:C:FRO:D:FAO:AF",
                 fmt("0/0" if i % 2 == 0 else "0/1",
                     i % 30 + 12, i % 50, i % 30, (i % 4) / 100))
            )
    cols = ["sample_id", "CHROM", "POS", "ID", "REF", "ALT", "QUAL",
            "FILTER", "INFO", "FORMAT", "SAMPLE_FMT"]
    vcf = spark.createDataFrame(pd.DataFrame(t_rows + n_rows, columns=cols))
    pairs = spark.createDataFrame(
        pd.DataFrame(
            {"tumor_sample_id": ["P1_T", "P2_T"],
             "normal_sample_id": ["P1_N", "P2_N"]}
        )
    )

    write_snv_sides_bucketed(
        vcf, pairs, "t_snv_t", "t_snv_n", n_buckets=8,
        tumor_path=str(tmp_path / "t"), normal_path=str(tmp_path / "n"),
    )
    try:
        # at cohort scale neither merge side broadcasts; pin the SMJ
        # shape the 100 TB plan would take (Catalyst correctly narrows
        # the full-outer to inner under the null-rejecting gates, and at
        # test size would then broadcast the normal side)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            got = snv_somatic_bucketed(spark, "t_snv_t", "t_snv_n")
            plan = got._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert "SelectedBucketsCount" in plan
            want = snv_somatic(vcf, pairs)
            got_rows = sorted(map(tuple, got.select(*want.columns).collect()))
            want_rows = sorted(map(tuple, want.collect()))
            assert got_rows == want_rows and got_rows
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_snv_t")
        spark.sql("DROP TABLE IF EXISTS t_snv_n")


def test_maf_dedup_bucketed_exchange_free(spark, tmp_path):
    """The clinical merge's one corpus-wide exchange is the
    dedup-with-preference window on the 7-column MAF identity; a
    megaMAF written bucketed on those keys must (a) dedup to exactly
    the in-flight keep_first rows and (b) plan the window with ZERO
    Exchange. Also pins the float-key contract: DOUBLE positions make
    Catalyst wrap the partition keys in normalizenanandzero, which a
    bucketed scan can never satisfy — write_maf_bucketed must refuse
    them loudly instead of silently keeping the shuffle."""
    import pandas as pd
    import pytest as _pytest

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.dedup import (
        keep_first,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.clinical_merge import (
        MAF_DEDUP_KEYS,
        _not_reported,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.clinical_merge_bucketed import (
        read_maf_bucketed,
        write_maf_bucketed,
    )

    cols = ["Tumor_Sample_Barcode", "Hugo_Symbol", "Chromosome",
            "Start_Position", "End_Position", "Variant_Classification",
            "HGVSp_Short", "Reported.Significance System",
            "Reported.Significance", "_src"]
    rows = [
        (f"S{i % 10}", f"G{i % 50}", str(i % 22 + 1), i * 10, i * 10 + 10,
         "Missense_Mutation", f"p.{i % 97}",
         "AMP/ASCO/CAP" if i % 3 == 0 else "Not Reported",
         "Tier I" if i % 3 == 0 else "Not Reported", i % 2)
        for i in range(500)
    ]
    maf = spark.createDataFrame(pd.DataFrame(rows, columns=cols))
    pref = [
        _not_reported(F.col("`Reported.Significance System`")).asc(),
        _not_reported(F.col("`Reported.Significance`")).asc(),
        F.col("_src").asc(),
    ]

    write_maf_bucketed(maf, "t_maf_bkt", n_buckets=8,
                       path=str(tmp_path / "mafb"))
    try:
        got = keep_first(read_maf_bucketed(spark, "t_maf_bkt"),
                         MAF_DEDUP_KEYS, pref)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SelectedBucketsCount" in plan
        want = keep_first(maf, MAF_DEDUP_KEYS, pref)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS t_maf_bkt")

    floaty = maf.withColumn(
        "Start_Position", F.col("Start_Position").cast("double")
    )
    with _pytest.raises(ValueError, match="float-typed dedup keys"):
        write_maf_bucketed(floaty, "t_maf_bkt_f", n_buckets=8,
                           path=str(tmp_path / "maff"))


def test_q21_single_fact_scan(spark):
    """Plan contract for the Q21 rewrite (r9 verdict task 3): the
    per-order-counts formulation must read lineitem exactly ONCE — the
    semi/anti self-join plan it replaced scanned the fact table three
    times with no reusable exchange (Catalyst pulls the candidate
    distinct above the joins, defeating ReuseExchange)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.registry.tpch import (
        q_tpch_q21_sole_returns,
    )

    df = q_tpch_q21_sole_returns(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("lineitem.parquet") == 1, plan
    # both quantifier collapses are plain hash aggregates — partial
    # (map-side) combine must be present on the pair aggregate
    assert "partial_" in plan


def test_merge_clinical_variants_bucketed_matches_inflight(spark, tmp_path):
    """The r12 driver face's underlying function: the merge tail over a
    bucketed megaMAF must return byte-identical (deduped, stats) to the
    in-flight merge_clinical_variants_to_maf, with the dedup window
    riding the bucket layout (the only Exchange left is the output-
    canonical range sort — no hash exchange on the dedup identity)."""
    import pandas as pd

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.clinical_merge import (
        clin_union,
        merge_clinical_variants_to_maf,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.clinical_merge_bucketed import (
        merge_clinical_variants_bucketed,
        normalize_positions_bigint,
        write_maf_bucketed,
    )

    maf_cols = ["Tumor_Sample_Barcode", "Hugo_Symbol", "Chromosome",
                "Start_Position", "End_Position", "Variant_Classification",
                "HGVSp_Short", "Entrez_Gene_Id"]
    maf = spark.createDataFrame(pd.DataFrame(
        [(f"S{i % 7}", f"G{i % 31}", str(i % 22 + 1),
          float(i * 10), float(i * 10 + 10), "Missense_Mutation",
          f"p.{i % 13}", float(i % 99) if i % 5 else None)
         for i in range(400)],
        columns=maf_cols,
    ))
    clin_cols = maf_cols[:7] + ["Reported.Significance System",
                                "Reported.Significance"]
    clin = spark.createDataFrame(pd.DataFrame(
        [(f"S{i % 7}", f"G{i % 31}", str(i % 22 + 1),
          float(i * 10), float(i * 10 + 10), "Missense_Mutation",
          f"p.{i % 13}", "AMP/ASCO/CAP", "Pathogenic")
         for i in range(0, 400, 3)],
        columns=clin_cols,
    ))

    want_df, want_stats = merge_clinical_variants_to_maf(maf, clin)
    unioned = normalize_positions_bigint(clin_union(maf, clin))
    write_maf_bucketed(unioned, "t_merge_bkt", n_buckets=8,
                       path=str(tmp_path / "mb"))
    try:
        got_df, got_stats = merge_clinical_variants_bucketed(spark, "t_merge_bkt")
        assert got_stats == want_stats
        cols = want_df.columns
        got_rows = sorted(
            map(tuple, got_df.select(*[F.col(f"`{c}`") for c in cols]).collect())
        )
        want_rows = sorted(map(tuple, want_df.collect()))
        assert got_rows == want_rows and got_rows
        plan = got_df._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount" in plan
        # exactly one Exchange: the output-canonical range sort; the
        # dedup identity hash exchange was paid once at ingest
        assert plan.count("Exchange") == 1 and "rangepartitioning" in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_merge_bkt")


def test_bucketed_write_one_file_per_bucket(spark, tmp_path):
    """The small-files contract (r12): Spark's bucketed writer splits
    every input task into per-bucket files, so a 32-partition input
    would write up to 32x8 files; write_bucketed's repartition on the
    bucket keys must collapse that to exactly ONE file per non-empty
    bucket (repartition's Murmur3-pmod assignment and the bucket id are
    the same function), and the bucketed read must stay exchange-free."""
    import glob
    import re

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources.bucketed import (
        read_bucketed,
        write_bucketed,
    )

    df = (
        spark.range(10_000)
        .repartition(32)  # the wide-ingest shape that explodes files
        .select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    )
    write_bucketed(df, "t_bkt_onefile", ["k"], 8, sort_cols=["k"],
                   path=str(tmp_path / "b"))
    try:
        files = glob.glob(str(tmp_path / "b" / "part-*"))
        buckets = [
            int(m.group(1))
            for f in files
            if (m := re.search(r"_(\d{5})\.", os.path.basename(f)))
        ]
        assert len(buckets) == len(files)
        # one file per bucket, all 8 buckets populated
        assert sorted(buckets) == list(range(8)), sorted(buckets)
        back = read_bucketed(spark, "t_bkt_onefile")
        agg = back.groupBy("k").agg(F.sum("v").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert back.count() == 10_000
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_onefile")


def test_bucketed_write_skew_escape_hatch_stays_exchange_free(spark, tmp_path):
    """The one_file_per_bucket=False escape hatch (r12 advice; the r14
    skew probe measured a 1.35-2.1x write penalty at 60% hot-key
    concentration that the hatch avoids) must preserve BOTH halves of
    the bucketed contract even though it writes multiple files per
    bucket: the bucketed scan stays exchange-free downstream, and
    values round-trip exactly. If this broke, the documented
    skewed-ingest guidance would silently trade the whole layout away."""
    import glob

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources.bucketed import (
        read_bucketed,
        write_bucketed,
    )

    df = (
        spark.range(10_000)
        .repartition(16)
        .select((F.col("id") % 100).alias("k"), (F.col("id") * 3).alias("v"))
    )
    write_bucketed(df, "t_bkt_free", ["k"], 8, path=str(tmp_path / "f"),
                   one_file_per_bucket=False)
    try:
        files = glob.glob(str(tmp_path / "f" / "part-*"))
        # the hatch's cost: more than one file per bucket (16 tasks x 8)
        assert len(files) > 8
        back = read_bucketed(spark, "t_bkt_free")
        agg = back.groupBy("k").agg(F.sum("v").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        expected = {
            (r["k"], r["s"])
            for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
        }
        assert {(r["k"], r["s"]) for r in agg.collect()} == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_free")


def test_stale_bucket_dir_sweep(tmp_path, monkeypatch):
    """The r13-advice tempdir cleanup: session-keyed bucketed warehouse
    dirs older than the stale bar are swept on startup; fresh dirs and
    the live session's own dir survive whatever their age."""
    import tempfile
    import time as _time

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.registry import (
        bucketedflows as bf,
    )

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    old = tmp_path / "spark_graft_bucketed_app-old"
    fresh = tmp_path / "spark_graft_bucketed_app-fresh"
    mine = tmp_path / "spark_graft_bucketed_app-mine"
    unrelated = tmp_path / "some_other_dir"
    for d in (old, fresh, mine, unrelated):
        d.mkdir()
    stale_ts = _time.time() - bf._STALE_AFTER_S - 60
    os.utime(old, (stale_ts, stale_ts))
    os.utime(mine, (stale_ts, stale_ts))  # keep= wins over age
    os.utime(unrelated, (stale_ts, stale_ts))  # prefix mismatch: untouched

    bf._sweep_stale_bucket_dirs(keep=str(mine))

    assert not old.exists()
    assert fresh.exists()
    assert mine.exists()
    assert unrelated.exists()


def test_stale_sweep_spares_live_owner(tmp_path, monkeypatch):
    """The r14-advice liveness fix: a dir whose owner.pid names a LIVE
    process survives the sweep even when its mtime is past the stale bar
    (a >6 h session still reading its registered tables refreshes
    nothing at the top level); a dead owner's dir is still swept."""
    import tempfile
    import time as _time

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.registry import (
        bucketedflows as bf,
    )

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    live = tmp_path / "spark_graft_bucketed_app-live"
    dead = tmp_path / "spark_graft_bucketed_app-dead"
    mine = tmp_path / "spark_graft_bucketed_app-mine"
    for d in (live, dead, mine):
        d.mkdir()
    (live / bf._PIDFILE).write_text(str(os.getpid()))
    # A pid that cannot exist on Linux (> pid_max default) => dead owner.
    (dead / bf._PIDFILE).write_text("4999999")
    stale_ts = _time.time() - bf._STALE_AFTER_S - 60
    for d in (live, dead):
        os.utime(d, (stale_ts, stale_ts))

    bf._sweep_stale_bucket_dirs(keep=str(mine))

    assert live.exists()
    assert not dead.exists()
    assert mine.exists()


def test_stale_sweep_rejects_untrusted_pidfiles(tmp_path, monkeypatch):
    """The r15-advice hardening: owner.pid sits in world-writable /tmp so
    its content is untrusted. A pid past the kernel pid space (10**20
    would raise OverflowError out of os.kill and fail BOTH gate faces),
    pid 0 (os.kill(0, 0) signals OUR OWN process group and always
    succeeds => immortal dir), a negative pid (process group), and
    non-numeric garbage must all read as dead owners."""
    import tempfile
    import time as _time

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.registry import (
        bucketedflows as bf,
    )

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    bad = {
        "overflow": str(10**20),
        "zero": "0",
        "negative": "-1",
        "garbage": "not-a-pid",
    }
    dirs = {}
    stale_ts = _time.time() - bf._STALE_AFTER_S - 60
    for name, content in bad.items():
        d = tmp_path / f"spark_graft_bucketed_app-{name}"
        d.mkdir()
        (d / bf._PIDFILE).write_text(content)
        os.utime(d, (stale_ts, stale_ts))
        dirs[name] = d
        assert not bf._owner_alive(str(d)), name

    bf._sweep_stale_bucket_dirs(keep=str(tmp_path / "none"))
    for name, d in dirs.items():
        assert not d.exists(), name


def test_stale_sweep_pidfile_trust_window(tmp_path, monkeypatch):
    """The r15-advice pid-recycling cap: a LIVE owner pid defers the
    sweep only while the dir mtime is inside the trust window. Past it,
    the pid is presumed recycled (a real session that old re-touches its
    dir via os.utime on every face run) and the dir is swept; inside the
    window the live pid still wins over the 6 h stale bar."""
    import tempfile
    import time as _time

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.registry import (
        bucketedflows as bf,
    )

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    recycled = tmp_path / "spark_graft_bucketed_app-recycled"
    fresh_live = tmp_path / "spark_graft_bucketed_app-freshlive"
    for d in (recycled, fresh_live):
        d.mkdir()
        (d / bf._PIDFILE).write_text(str(os.getpid()))  # definitely live
    ancient = _time.time() - bf._PIDFILE_TRUST_S - 60
    os.utime(recycled, (ancient, ancient))
    recent = _time.time() - bf._STALE_AFTER_S - 60  # stale but in-window
    os.utime(fresh_live, (recent, recent))

    assert not bf._owner_alive(str(recycled))
    assert bf._owner_alive(str(fresh_live))

    bf._sweep_stale_bucket_dirs(keep=str(tmp_path / "none"))
    assert not recycled.exists()
    assert fresh_live.exists()


def test_spread_memo_matches_direct_probe(spark, tmp_path):
    """r19 (guide §1.2): spread() memoizes the partition-count probe per
    session keyed on the analyzed plan's semanticHash + dtypes. The memo
    must never change a decision: a narrow single-file scan repartitions
    exactly as the direct probe would (the single-row-group testdata
    behavior the helper exists for), a RE-READ of the same parquet hits
    the memo (the bench re-runs every face 4x), and a post-shuffle frame
    with >= target partitions stays untouched (no extra Exchange)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
        spread,
    )

    target = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "narrow.parquet")
    spark.createDataFrame(
        [(i,) for i in range(100)], "x int"
    ).coalesce(1).write.parquet(path)
    spark._spread_npart_cache = {}
    narrow = spark.read.parquet(path)
    assert narrow.rdd.getNumPartitions() == 1  # single row group, one split
    out1 = spread(narrow)
    assert out1.rdd.getNumPartitions() == target
    n_entries = len(spark._spread_npart_cache)
    assert n_entries == 1
    # a fresh scan of the same file is semantically identical -> memo hit
    spread(spark.read.parquet(path))
    assert len(spark._spread_npart_cache) == n_entries
    # an already-wide frame (post-shuffle partitioning == target) is a
    # no-op: spread must return it unchanged, not stack a repartition
    wide = spark.read.parquet(path).repartition(target)
    out3 = spread(wide)
    assert out3 is wide
    # and its (different) plan got its own memo slot, not a collision
    assert len(spark._spread_npart_cache) == n_entries + 1
