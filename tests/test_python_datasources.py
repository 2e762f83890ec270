"""Spark-4 Python DataSource formats: executor-side xlsx scan (per-file
partitions over a drop zone of workbooks) and the statement-level sqldump
relation. Both must agree with the driver-side readers they complement."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from test_excel import write_xlsx
from test_sqldump import EXTENDED, SKIP_EXTENDED


@pytest.fixture()
def registered(spark):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources import (
        register_python_sources,
    )

    register_python_sources(spark)
    return spark


def test_xlsx_format_reads_a_directory_of_workbooks(registered, tmp_path):
    spark = registered
    rows_a = [["sample_id", "chrom", "vaf"], ["s1", 17, 0.31], ["s2", "X", 0.5]]
    rows_b = [["sample_id", "chrom", "vaf"], ["s3", 2, None]]
    write_xlsx(str(tmp_path / "site_a.xlsx"), {"Sheet1": rows_a})
    write_xlsx(str(tmp_path / "site_b.xlsx"), {"Sheet1": rows_b})

    df = spark.read.format("xlsx").load(str(tmp_path))
    assert df.columns == ["sample_id", "chrom", "vaf", "_src_file"]
    got = {
        (r["sample_id"], r["chrom"], r["vaf"], os.path.basename(r["_src_file"]))
        for r in df.collect()
    }
    # all values surface as strings (mixed int/str chrom across files);
    # None stays None
    assert got == {
        ("s1", "17", "0.31", "site_a.xlsx"),
        ("s2", "X", "0.5", "site_a.xlsx"),
        ("s3", "2", None, "site_b.xlsx"),
    }
    # one partition per workbook — the distribution claim
    assert df.rdd.getNumPartitions() == 2


def test_xlsx_format_agrees_with_driver_reader(registered, tmp_path):
    spark = registered
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources import (
        read_excel,
    )

    rows = [["id", "name"], [1, "alpha"], [2, "beta"], [3, None]]
    p = str(tmp_path / "one.xlsx")
    write_xlsx(p, {"Sheet1": rows})
    via_ds = (
        spark.read.format("xlsx")
        .load(p)
        .select("id", "name")
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    via_driver = (
        read_excel(spark, p)
        .select(F.col("id").cast("string"), F.col("name").cast("string"))
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert via_ds.equals(via_driver)


def test_xlsx_format_rejects_mismatched_headers(registered, tmp_path):
    spark = registered
    write_xlsx(str(tmp_path / "a.xlsx"), {"Sheet1": [["x", "y"], [1, 2]]})
    write_xlsx(str(tmp_path / "b.xlsx"), {"Sheet1": [["x", "z"], [1, 2]]})
    with pytest.raises(Exception, match="share a header"):
        spark.read.format("xlsx").load(str(tmp_path)).collect()


def test_sqldump_format_statement_relation(registered, tmp_path):
    spark = registered
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources import (
        parse_sql_dump_counts,
    )

    (tmp_path / "ext.sql").write_text(EXTENDED)
    (tmp_path / "skip.sql").write_text(SKIP_EXTENDED)
    df = spark.read.format("sqldump").load(str(tmp_path))
    # statement-level: the extended dump has 3 INSERTs, the skip dump 7
    kinds = (
        df.groupBy("stmt_kind").count().toPandas().set_index("stmt_kind")["count"]
    )
    assert kinds["create"] == 6 and kinds["insert"] == 10
    # aggregating the relation reproduces parse_sql_dump_counts exactly
    agg = (
        df.filter(F.col("stmt_kind") == "insert")
        .groupBy("table_name")
        .agg(F.sum("n_rows").alias("n_rows"))
    )
    created = df.filter(F.col("stmt_kind") == "create").select(
        "table_name"
    ).distinct()
    full = (
        created.join(agg, "table_name", "full")
        .fillna(0, ["n_rows"])
        .toPandas()
        .set_index("table_name")["n_rows"]
        .astype(int)
        .to_dict()
    )
    want = (
        parse_sql_dump_counts(spark, str(tmp_path))
        .toPandas()
        .set_index("table_name")["n_rows"]
        .astype(int)
        .to_dict()
    )
    assert full == want and want["patients"] == 10 and want["empty_tbl"] == 0


def test_xlsx_streaming_drop_zone(registered, tmp_path):
    """readStream.format('xlsx'): new workbooks are picked up per
    micro-batch, already-seen ones are not re-read, and rows land with
    lineage."""
    spark = registered
    zone = tmp_path / "zone"
    zone.mkdir()
    write_xlsx(str(zone / "w1.xlsx"), {"S": [["id", "v"], [1, "a"], [2, "b"]]})

    stream = (
        spark.readStream.format("xlsx")
        .option("path", str(zone))
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("xlsx_zone")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = spark.sql("SELECT * FROM xlsx_zone").collect()
        assert {(r["id"], r["v"]) for r in first} == {("1", "a"), ("2", "b")}
        write_xlsx(str(zone / "w2.xlsx"), {"S": [["id", "v"], [3, "c"]]})
        q.processAllAvailable()
        allrows = spark.sql("SELECT * FROM xlsx_zone").collect()
        assert {(r["id"], r["v"]) for r in allrows} == {
            ("1", "a"), ("2", "b"), ("3", "c"),
        }
        # no re-ingestion: w1's rows appear exactly once
        assert len(allrows) == 3
    finally:
        q.stop()
