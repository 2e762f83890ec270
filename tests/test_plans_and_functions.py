"""Physical-plan assertions (the scale contract: pushdown, broadcast, no
cartesian blowups) + unit tests for scalar functions not covered by the
pipeline suites."""

from __future__ import annotations

import io
import re
import contextlib

import pandas as pd
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions import (
    gtf_attribute,
    strip_chr,
    strip_chr_prefix_only,
    strip_dot_zero,
    basename,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources.vcf import (
    read_vcf_meta_lines,
)

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = entrymod.queries()[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_pushdown_and_pruning(spark):
    p = _plan(spark, "tpch_q1_agg")
    assert "LessThanOrEqual(l_shipdate" in p  # predicate reached the scan
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = m.group(1)
    assert "l_orderkey" not in cols  # column pruning: unused cols not read
    assert "l_quantity" in cols


def test_dim_joins_broadcast(spark):
    p = _plan(spark, "join_dims_broadcast")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_interval_join_no_nested_loop(spark):
    """The binned interval join must plan as an equi hash/merge join — a
    BroadcastNestedLoopJoin or CartesianProduct means the binning broke."""
    p = _plan(spark, "interval_join")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", p)


def test_semi_anti_plan_shapes(spark):
    assert "LeftSemi" in _plan(spark, "semi_join")
    assert "LeftAnti" in _plan(spark, "anti_join")


def test_composition_plan_shapes(spark):
    """The round-4 composition/pipeline queries must keep their scale
    shapes: no cartesian anywhere, the interval join broadcasting its
    binned gene side, and dataset_split staying a pure projection (zero
    exchanges — the assignment must be pushable into a scan-side
    filter)."""
    p = _plan(spark, "cnv_matrix")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p
    p = _plan(spark, "sequence_pack")
    assert "CartesianProduct" not in p
    p = _plan(spark, "dataset_split")
    assert "Exchange" not in p


def test_llm_scan_pushdown(spark):
    """The doc_id bounds on the LLM queries must reach the parquet scan as
    pushed filters — at 100 TB an unpushed bound reads the whole corpus."""
    for q in ("minhash_lsh", "rolling_fingerprint", "simhash_pairs"):
        p = _plan(spark, q)
        assert re.search(r"PushedFilters: \[[^\]]*LessThan\(doc_id", p), q


def test_minhash_ride_through_single_join(spark):
    """minhash_lsh carries signatures through the band self-join: exactly
    one join in the plan (no verify re-joins), and at runtime the two
    identical banded sides collapse into one exchange (ReusedExchange) so
    the md5+affine signature stage runs once without any persist."""
    df = entrymod.queries()["minhash_lsh"](spark, SF)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"(ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin)\b", p)) == 1
    df.collect()  # exchange reuse is finalized by adaptive execution
    fin = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in fin


def test_new_ann_plans_no_cartesian(spark):
    """ann_ivf's only wide comparison is the broadcast centroid assignment
    (16-row side); embedding_dups must have no cross product at all."""
    assert "CartesianProduct" not in _plan(spark, "ann_ivf")
    emb = _plan(spark, "embedding_dups")
    assert "CartesianProduct" not in emb and "BroadcastNestedLoopJoin" not in emb


def test_gtf_attribute(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "attrs": [
                    'gene_id "G1"; gene_type "protein_coding"; gene_name "TP53"; ',
                    'gene_name "A"; tag "x"; gene_name "B"; ',
                    'gene_id "G3"; gene_type "lncRNA"; ',
                ]
            }
        )
    )
    out = df.select(gtf_attribute(F.col("attrs"), "gene_name").alias("g")).toPandas()
    assert list(out.g) == ["TP53", "A;B", ""]


def test_string_scalars(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "c": ["chr1", "1chr2", "X"],
                "n": [7157.0, None, 12.05],
                "p": ["s3://b/dir/f.vcf.gz", "plain", "a/b/c.maf"],
            }
        )
    )
    out = df.select(
        strip_chr(F.col("c")).alias("sc"),
        strip_chr_prefix_only(F.col("c")).alias("sp"),
        strip_dot_zero(F.col("n")).alias("dz"),
        basename(F.col("p")).alias("bn"),
    ).toPandas()
    assert list(out.sc) == ["1", "12", "X"]        # literal replace anywhere
    assert list(out.sp) == ["1", "1chr2", "X"]     # prefix-only variant
    # .0 strip applies to ANY occurrence (mci:285-289 reproduced exactly)
    assert list(out.dz) == ["7157", "", "125"]
    assert list(out.bn) == ["f.vcf.gz", "plain", "c.maf"]


def test_bucketed_join_avoids_shuffle(spark):
    """Joining two tables bucketed on the join key must plan WITHOUT an
    Exchange (the co-located join contract)."""
    import contextlib
    import io as _io

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources import (
        read_table,
        write_bucketed,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    write_bucketed(
        li.select("l_orderkey", "l_quantity"), "b_lineitem",
        ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"],
    )
    write_bucketed(
        o.select("o_orderkey", "o_totalprice"), "b_orders",
        ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"],
    )
    bl, bo = read_table(spark, "b_lineitem"), read_table(spark, "b_orders")
    # disable broadcast so the join exercises the bucketed SMJ path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # both sides read pre-bucketed
        assert j.count() == li.count()  # every lineitem matches its order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_audit_files(spark, tmp_path):
    import hashlib

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources import (
        audit_files,
        audit_summary,
    )

    d = tmp_path / "data"
    d.mkdir()
    (d / "a.bin").write_bytes(b"alpha")
    (d / "b.bin").write_bytes(b"beta")
    (d / "extra.bin").write_bytes(b"x")
    manifest = spark.createDataFrame(
        pd.DataFrame(
            {
                "file_name": ["a.bin", "b.bin", "missing.bin"],
                "md5sum": [
                    hashlib.md5(b"alpha").hexdigest(),
                    hashlib.md5(b"WRONG").hexdigest(),
                    hashlib.md5(b"z").hexdigest(),
                ],
            }
        )
    )
    rep = audit_files(spark, manifest, str(d)).toPandas().set_index("file_name")
    assert rep.loc["a.bin"].status == "OK"
    assert rep.loc["b.bin"].status == "MD5_MISMATCH"
    assert rep.loc["missing.bin"].status == "MISSING"
    assert rep.loc["extra.bin"].status == "UNEXPECTED"
    summary = audit_summary(audit_files(spark, manifest, str(d))).toPandas()
    assert dict(zip(summary.status, summary.n)) == {
        "OK": 1, "MD5_MISMATCH": 1, "MISSING": 1, "UNEXPECTED": 1,
    }


def test_vcf_meta_lines(spark, tmp_path):
    p = tmp_path / "m.vcf"
    p.write_text(
        "##fileformat=VCFv4.2\n##contig=<ID=chr1>\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\nchr1\t1\t.\tA\tT\t9\tPASS\tDP=1\n"
    )
    lines = read_vcf_meta_lines(spark, str(p))
    assert lines == ["##fileformat=VCFv4.2", "##contig=<ID=chr1>"]


def test_round8_analytics_plan_shapes(spark):
    """Wave-8 analytics faces: no cartesian/nested-loop anywhere; the
    sorted-neighborhood window join and the disjunctive filter join
    must be real hash/merge joins, and the range frame must not fall
    into a single global partition (it is partitioned by user)."""
    for name in ("sorted_neighborhood", "disjunctive_filter", "rrf_fusion"):
        p = _plan(spark, name)
        assert "CartesianProduct" not in p, name
        # rrf_fusion broadcasts one single-row stats frame (the BM25
        # corpus stats), which Spark plans as a BroadcastNestedLoopJoin
        # on purpose; real data joins must never be one
        if name != "rrf_fusion":
            assert "BroadcastNestedLoopJoin" not in p, name
    p = _plan(spark, "sorted_neighborhood")
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", p)
    p = _plan(spark, "range_rolling")
    # the window spec itself must be keyed on user_id — asserting the
    # bare column name would pass on ANY plan (it appears in ReadSchema)
    assert re.search(r"windowspecdefinition\(user_id", p)
    # (heavy_hitters / bfs / sssp / hierarchy localCheckpoint eagerly,
    # so their RETURNED plan is just a scan of checkpointed partitions —
    # asserting on it would be a tautology that still executes the whole
    # iterative job; their join shapes are pinned by the operator model
    # tests and the in-loop code instead)
