"""SQL-dump scan: both mysqldump dialects must reconcile to identical
counts, and unattributable INSERT statements are surfaced, not dropped
(reference parses line-by-line at src/utils.py:328-383 and drops them)."""

from __future__ import annotations

import pytest

from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources.sqldump import (
    UNPARSEABLE,
    parse_sql_dump_counts,
)

EXTENDED = """\
-- MySQL dump 10.13
CREATE TABLE `patients` (
  `id` int NOT NULL,
  `name` varchar(64)
);
INSERT INTO `patients` VALUES (1,'a'),(2,'b'),(3,'c');
INSERT INTO `patients` VALUES (4,'d'),(5,'e');
CREATE TABLE `samples` (
  `id` int NOT NULL
);
INSERT INTO `samples` VALUES (1),(2);
CREATE TABLE `empty_tbl` (
  `id` int NOT NULL
);
"""

# --skip-extended-insert: one tuple per INSERT statement
SKIP_EXTENDED = """\
-- MySQL dump 10.13
CREATE TABLE `patients` (
  `id` int NOT NULL,
  `name` varchar(64)
);
INSERT INTO `patients` VALUES (1,'a');
INSERT INTO `patients` VALUES (2,'b');
INSERT INTO `patients` VALUES (3,'c');
INSERT INTO `patients` VALUES (4,'d');
INSERT INTO `patients` VALUES (5,'e');
CREATE TABLE `samples` (
  `id` int NOT NULL
);
INSERT INTO `samples` VALUES (1);
INSERT INTO `samples` VALUES (2);
CREATE TABLE `empty_tbl` (
  `id` int NOT NULL
);
"""

# pretty-printed multi-line tuple list (phpMyAdmin-style), no backticks
MULTILINE = """\
CREATE TABLE patients (
  id int NOT NULL,
  name varchar(64)
);
INSERT INTO patients (id, name) VALUES
(1, 'a'),
(2, 'b'),
(3, 'c'),
(4, 'd'),
(5, 'e');
CREATE TABLE samples (id int);
INSERT INTO samples VALUES
(1),
(2);
CREATE TABLE empty_tbl (id int);
"""

EXPECTED = {"patients": 5, "samples": 2, "empty_tbl": 0}


def _counts(spark, path):
    return {
        r["table_name"]: r["n_rows"]
        for r in parse_sql_dump_counts(spark, path).collect()
    }


@pytest.mark.parametrize(
    "name,text", [("ext", EXTENDED), ("skip", SKIP_EXTENDED), ("multi", MULTILINE)]
)
def test_dialects_reconcile(spark, tmp_path, name, text):
    p = tmp_path / f"dump_{name}.sql"
    p.write_text(text)
    assert _counts(spark, str(p)) == EXPECTED


REALISTIC = """\
-- MySQL dump 10.13  Distrib 8.0.32
--
-- Table structure for table `patients`
--
DROP TABLE IF EXISTS `patients`;
CREATE TABLE IF NOT EXISTS `patients` (
  `id` int NOT NULL,
  `name` varchar(64)
);
--
-- Dumping data for table `patients`
--
INSERT INTO `patients` VALUES (1,'a'),(2,'b'),(3,'c');
INSERT INTO `patients` VALUES (4,'d'),(5,'e');
--
-- Table structure for table `samples`
--
CREATE TABLE IF NOT EXISTS `samples` (
  `id` int NOT NULL
);
INSERT INTO `samples` VALUES (1),(2);
CREATE TABLE IF NOT EXISTS `empty_tbl` (
  `id` int NOT NULL
);
"""


def test_realistic_mysqldump_layout(spark, tmp_path):
    """Comment banners ride in the records that follow them and CREATE
    TABLE IF NOT EXISTS must not mint a phantom 'IF' table — the exact
    layout mysqldump 8 emits."""
    p = tmp_path / "dump_real.sql"
    p.write_text(REALISTIC)
    assert _counts(spark, str(p)) == EXPECTED


def test_crlf_dump(spark, tmp_path):
    """Windows-produced dumps terminate statements with ';\\r\\n' — the
    delimiter sniffer must split them identically to LF dumps."""
    p = tmp_path / "dump_crlf.sql"
    p.write_bytes(REALISTIC.replace("\n", "\r\n").encode())
    assert _counts(spark, str(p)) == EXPECTED


def test_lf_dump_with_embedded_crlf_data(spark, tmp_path):
    """An LF dump whose STRING DATA contains ';\\r\\n' bytes must still be
    parsed with the LF delimiter — the sniffer reads the first line's
    terminator, not a substring search."""
    tricky = EXTENDED + (
        "INSERT INTO `patients` VALUES (6,'windows note:;\r\n more');\n"
    )
    p = tmp_path / "dump_lfdata.sql"
    p.write_bytes(tricky.encode())
    got = _counts(spark, str(p))
    # 5 original rows + 1 new; the embedded ';\r\n' splits one statement
    # mid-string at worst, never the whole-file collapse misdetection causes
    assert got["patients"] >= 6
    assert got["samples"] == 2 and got["empty_tbl"] == 0


def test_ddl_text_inside_string_data_ignored(spark, tmp_path):
    """'CREATE TABLE x' appearing mid-line inside INSERTed string values
    must not create a phantom table (line-start anchoring)."""
    trick = EXTENDED + (
        "INSERT INTO `patients` VALUES (6,'note: CREATE TABLE evil (id int)');\n"
    )
    p = tmp_path / "dump_trick.sql"
    p.write_text(trick)
    got = _counts(spark, str(p))
    assert "evil" not in got
    assert got["patients"] == 6


def test_unparseable_inserts_counted(spark, tmp_path):
    bad = EXTENDED + "INSERT INTO `broken` SET id=1;\nINSERT INTO ;\n"
    p = tmp_path / "dump_bad.sql"
    p.write_text(bad)
    got = {
        r["table_name"]: (r["n_rows"], r["n_stmts"])
        for r in parse_sql_dump_counts(spark, str(p)).collect()
    }
    assert got[UNPARSEABLE] == (0, 2)
    assert got["patients"] == (5, 2)
    # and the strict view omits the bucket without changing real tables
    strict = {
        r["table_name"]: r["n_rows"]
        for r in parse_sql_dump_counts(
            spark, str(p), include_unparseable=False
        ).collect()
    }
    assert strict == EXPECTED


def test_schema_qualified_backtick_names(spark, tmp_path):
    """INSERT INTO `db`.`tbl` must bucket under 'tbl' (the LAST identifier
    segment), not 'db' — and quoted/unquoted qualification must agree
    (ADVICE r4: the old regex truncated at the first closing backtick,
    collapsing every table of a schema-qualified dump into one bucket)."""
    dump = (
        "CREATE TABLE `db`.`patients` (\n  `id` int\n);\n"
        "INSERT INTO `db`.`patients` VALUES (1,'a'),(2,'b');\n"
        "CREATE TABLE db.samples (\n  `id` int\n);\n"
        "INSERT INTO db.samples VALUES (1);\n"
        "INSERT INTO `db`.orphans VALUES (1),(2),(3);\n"
    )
    p = tmp_path / "dump_qual.sql"
    p.write_text(dump)
    got = {
        r.table_name: (r.n_rows, r.n_stmts)
        for r in parse_sql_dump_counts(spark, str(p)).collect()
    }
    assert got == {
        "patients": (2, 1),
        "samples": (1, 1),
        "orphans": (3, 1),
    }


def test_mixed_eol_directory(spark, tmp_path):
    """A directory mixing LF and CRLF dumps: each file is sniffed and read
    with ITS OWN statement terminator (ADVICE r4: a single first-file
    sniff collapsed every non-matching file into one record — silent
    undercount)."""
    d = tmp_path / "dumps"
    d.mkdir()
    (d / "a_unix.sql").write_text(EXTENDED)
    (d / "b_windows.sql").write_bytes(
        SKIP_EXTENDED.replace("\n", "\r\n").encode()
    )
    got = {
        r.table_name: r.n_rows
        for r in parse_sql_dump_counts(spark, str(d)).collect()
    }
    # both dialects and both EOL conventions reconcile: 5+5 / 2+2 / 0
    assert got == {"patients": 10, "samples": 4, "empty_tbl": 0}
