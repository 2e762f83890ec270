"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator class from SURVEY.md §2 on
the driver's testdata tables; ``oracle_sql()`` holds the DuckDB-equivalent
SQL. Aggregates over DOUBLE columns are summed through DECIMAL(18,4) in BOTH
engines so the result is order-independent and bit-identical (double
summation order differs between engines/partitionings).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# the driver may load this module by file path; make the sibling package
# importable regardless of cwd/sys.path
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark.sql import DataFrame, SparkSession, functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
    load_table,
    spread,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
    interval_join,
    keep_first,
    dedup_with_preference,
    pair_rows,
    to_wide_matrix,
    reconcile_counts,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions import (
    gistic_call,
    copy_number_to_log2,
    fingerprint,
    ws_tokens,
    stopword_ratio,
    lang_id,
)

SF0001 = "/root/testdata/sf0.001"


def _dsum(c, alias):
    """Order-independent double sum: sum through DECIMAL(18,4), emit DOUBLE."""
    return F.sum(c.cast("decimal(18,4)")).cast("double").alias(alias)


# ---------------------------------------------------------------- aggregation

def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship scan->filter->groupBy/agg (TPC-H Q1 shape). Demonstrates
    predicate pushdown + partial aggregation (SURVEY §2.4)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1997-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1997-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas value_counts (vcf_anno.py:430) == groupBy().count()."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


SQL_VALUE_COUNTS = """
SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority
"""


def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """drop_duplicates / sort|uniq (cnv.py:619,692) == dropDuplicates."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").dropDuplicates()


SQL_DISTINCT_ROWS = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


def q_dup_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-detection QA (cnv.py:42-52): keys occurring more than once."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(fingerprint(F.col("text")).alias("fp"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper_id"))
        .filter(F.col("n_copies") > 1)
    )


SQL_DUP_DETECTION = """
SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
       COUNT(*) AS n_copies, MIN(doc_id) AS keeper_id
FROM documents GROUP BY 1 HAVING COUNT(*) > 1
"""


# ---------------------------------------------------------------------- joins

def q_join_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join chain with broadcast dims (restore_db.py:115 shape)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), _dsum(F.col("c_acctbal"), "sum_acctbal"))
    )


SQL_JOIN_DIMS = """
SELECT r_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_left_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left equi-join manifest<-counts shape (vcf_anno.py:426,434)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


SQL_LEFT_JOIN_COUNTS = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list / isin filter (mci:27) == left_semi join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


SQL_SEMI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT-IN filter (vcf_anno.py:468, pedmatch:303) == left_anti join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


SQL_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_reconcile_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected-vs-observed reconciliation (cnv.py:686-711): full-outer join
    of two count tables, null->0, mismatch flag."""
    o = load_table(spark, sf_dir, "orders")
    expected = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("expected"))
    )
    observed = (
        o.filter(F.col("o_totalprice") > 100000)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    return reconcile_counts(expected, observed, ["custkey"])


SQL_RECONCILE_COUNTS = """
WITH expected AS (
  SELECT o_custkey AS custkey, COUNT(*) AS expected FROM orders
  WHERE o_orderstatus = 'O' GROUP BY 1
), observed AS (
  SELECT o_custkey AS custkey, COUNT(*) AS observed FROM orders
  WHERE o_totalprice > 100000 GROUP BY 1
)
SELECT COALESCE(e.custkey, ob.custkey) AS custkey,
       COALESCE(e.expected, 0) AS expected,
       COALESCE(ob.observed, 0) AS observed,
       COALESCE(e.expected, 0) <> COALESCE(ob.observed, 0) AS mismatch
FROM expected e FULL OUTER JOIN observed ob ON e.custkey = ob.custkey
"""


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned interval join == bedtools intersect -wo -f 0.5 (cnv.py:413-436).
    Interval tables derived deterministically from part (genes) and orders
    (segments); overlap must cover >= 50% of the gene."""
    p = load_table(spark, sf_dir, "part")
    o = load_table(spark, sf_dir, "orders")
    genes = p.select(
        F.col("p_partkey").alias("gene_id"),
        F.concat(F.lit("c"), (F.col("p_partkey") % 5).cast("string")).alias("chrom"),
        ((F.col("p_partkey") * 37) % 100000).alias("start"),
        (((F.col("p_partkey") * 37) % 100000) + 200 + F.col("p_size") * 11).alias("end"),
    )
    segs = o.select(
        F.col("o_orderkey").alias("seg_id"),
        F.concat(F.lit("c"), (F.col("o_orderkey") % 5).cast("string")).alias("chrom"),
        ((F.col("o_orderkey") * 13) % 100000).alias("start"),
        (((F.col("o_orderkey") * 13) % 100000) + 600).alias("end"),
    )
    # auto-derived bin width (derive_bin_size): the result is width-
    # invariant, so the oracle stays exact while the driver certifies the
    # auto path; cnv_matrix keeps a pinned width to cover the other path.
    j = interval_join(
        genes, segs, bin_size="auto", min_overlap_frac=0.5,
        left_prefix="g_", right_prefix="s_",
    )
    return j.select(
        F.col("g_gene_id").alias("gene_id"),
        F.col("s_seg_id").alias("seg_id"),
        F.col("overlap_bp").cast("long").alias("overlap_bp"),
    )


SQL_INTERVAL_JOIN = """
WITH genes AS (
  SELECT p_partkey AS gene_id,
         'c' || CAST(p_partkey % 5 AS VARCHAR) AS chrom,
         (p_partkey * 37) % 100000 AS g_start,
         (p_partkey * 37) % 100000 + 200 + p_size * 11 AS g_end
  FROM part
), segs AS (
  SELECT o_orderkey AS seg_id,
         'c' || CAST(o_orderkey % 5 AS VARCHAR) AS chrom,
         (o_orderkey * 13) % 100000 AS s_start,
         (o_orderkey * 13) % 100000 + 600 AS s_end
  FROM orders
)
SELECT gene_id, seg_id,
       CAST(LEAST(g_end, s_end) - GREATEST(g_start, s_start) AS BIGINT) AS overlap_bp
FROM genes JOIN segs USING (chrom)
WHERE LEAST(g_end, s_end) - GREATEST(g_start, s_start) > 0
  AND LEAST(g_end, s_end) - GREATEST(g_start, s_start) >= 0.5 * (g_end - g_start)
"""


# -------------------------------------------------------------------- windows

def q_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sort_values().drop_duplicates(keep='first') (cnv.py:372) == window
    top-1: first line of each order by (shipdate, linenumber)."""
    li = load_table(spark, sf_dir, "lineitem")
    return keep_first(
        li, ["l_orderkey"], [F.col("l_shipdate").asc(), F.col("l_linenumber").asc()]
    ).select("l_orderkey", "l_partkey", "l_linenumber", "l_shipdate")


SQL_TOP1_PER_GROUP = """
SELECT l_orderkey, l_partkey, l_linenumber, l_shipdate
FROM lineitem
QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber) = 1
"""


def q_dedup_preference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-with-source-preference (mci_clinical_variant_merge.py:263-282):
    one event per user, 'purchase' rows preferred, then earliest."""
    e = load_table(spark, sf_dir, "events")
    pref = F.when(F.col("event_type") == "purchase", 0).otherwise(1)
    return dedup_with_preference(
        e, ["user_id"], pref, [F.col("ts").asc(), F.col("event_id").asc()]
    ).select("user_id", "event_id", "event_type", "ts")


SQL_DEDUP_PREFERENCE = """
SELECT user_id, event_id, event_type, ts FROM events
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY user_id
  ORDER BY CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END, ts, event_id
) = 1
"""


def q_pair_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fusion breakend pairing (pedmatch:123-151): consecutive rows per group
    taken 2-at-a-time via row_number + lead."""
    e = load_table(spark, sf_dir, "events")
    paired = pair_rows(
        e.select("user_id", "event_id", "event_type"),
        group_col="user_id",
        order_col="event_id",
        pair_cols=["event_id", "event_type"],
    )
    return paired.select(
        "user_id", "pair_id", "event_id_1", "event_id_2", "event_type_1", "event_type_2"
    )


SQL_PAIR_ROWS = """
WITH ordered AS (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
         LEAD(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS event_id_2,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS event_type_2
  FROM events
)
SELECT user_id, CAST((rn - 1) / 2 AS BIGINT) AS pair_id,
       event_id AS event_id_1, event_id_2,
       event_type AS event_type_1, event_type_2
FROM ordered WHERE rn % 2 = 1 AND event_id_2 IS NOT NULL
"""


# ---------------------------------------------------------------- pivot/union

def q_pivot_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide matrix pivot (cnv.py:650-684): priority x status counts."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    wide = to_wide_matrix(
        counts, index="o_orderpriority", column="o_orderstatus",
        value="n", fill=0, column_values=["O", "F", "P"],
    )
    return wide.select(
        "o_orderpriority",
        F.col("O").alias("n_open"),
        F.col("F").alias("n_finished"),
        F.col("P").alias("n_pending"),
    )


SQL_PIVOT_MATRIX = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
FROM orders GROUP BY o_orderpriority
"""


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment: md5-nibble hash
    bucket of doc_id (llm/sampling.py) — stable across reruns and
    re-partitioning, reproducible in any engine (vs rand()/df.sample).
    Returns the full per-document assignment so the oracle checks every
    bucket and label."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import dataset_split
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.sampling import (
        hash_bucket,
    )

    d = load_table(spark, sf_dir, "documents")
    return (
        dataset_split(d)
        .select(
            "doc_id",
            hash_bucket(F.col("doc_id")).alias("bucket"),
            "split",
        )
    )


_NIBFOLD_SPLIT = (
    "list_reduce(list_transform(range(1,9), i -> "
    "(CASE WHEN ascii(h[i]) >= 97 THEN ascii(h[i])-87 ELSE ascii(h[i])-48 END)::BIGINT), "
    "(a,b) -> a*16+b)"
)

SQL_DATASET_SPLIT = f"""
WITH hx AS (
  SELECT doc_id, md5(doc_id::VARCHAR) AS h FROM documents
), b AS (
  SELECT doc_id, {_NIBFOLD_SPLIT} % 10000 AS bucket FROM hx
)
SELECT doc_id, bucket,
       CASE WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fraction sampling (llm/sampling.hash_sample):
    membership is a pure function of md5(doc_id) — stable across reruns
    and re-partitioning, unlike rand()/df.sample — and the filter is a
    narrow per-row projection (no shuffle; Catalyst pushes it into the
    scan). Registered face for the one LLM-sampling operator that lacked
    a CORRECTNESS row (r4 verdict #6)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import hash_sample
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.sampling import (
        hash_bucket,
    )

    d = load_table(spark, sf_dir, "documents")
    return hash_sample(d, 0.25).select(
        "doc_id", hash_bucket(F.col("doc_id")).alias("bucket")
    )


SQL_HASH_SAMPLE = f"""
WITH hx AS (
  SELECT doc_id, md5(doc_id::VARCHAR) AS h FROM documents
), b AS (
  SELECT doc_id, {_NIBFOLD_SPLIT} % 10000 AS bucket FROM hx
)
SELECT doc_id, bucket FROM b WHERE bucket < 2500
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-prep chunking (llm/sampling.chunk_documents): 64-token
    chunks with 16-token overlap (stride 48), chunk counts integer-exact —
    one scan, one explode, no shuffle; the exploded rows are the
    downstream embedding/indexing parallelism unit."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        chunk_documents,
    )

    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(d, chunk_tokens=64, overlap=16)


SQL_CHUNK_DOCUMENTS = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents
), s AS (
  SELECT doc_id, toks, len(toks) AS n,
         (GREATEST(len(toks) - 16, 1) + 47) // 48 AS n_chunks
  FROM t WHERE len(toks) > 0
), c AS (
  SELECT doc_id, UNNEST(range(0, n_chunks)) AS chunk_id, toks, n FROM s
)
SELECT doc_id,
       chunk_id::BIGINT AS chunk_id,
       (LEAST(chunk_id * 48 + 64, n) - chunk_id * 48)::BIGINT AS n_tokens,
       array_to_string(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')
         AS chunk_text
FROM c
"""


def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing (llm/sampling.stratified_hash_sample): per-source
    deterministic sampling fractions in ONE narrow pass — up-weight two
    curated sources, keep a floor elsewhere; membership reads the same md5
    bucket as hash_sample/dataset_split so mixes nest and compose."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        stratified_hash_sample,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.sampling import (
        hash_bucket,
    )

    d = load_table(spark, sf_dir, "documents")
    out = stratified_hash_sample(
        d,
        {"src13": 0.9, "src8": 0.6},
        strata_col="source",
        default_fraction=0.25,
    )
    return out.select(
        "doc_id", "source", hash_bucket(F.col("doc_id")).alias("bucket")
    )


SQL_DOMAIN_MIX = f"""
WITH hx AS (
  SELECT doc_id, source, md5(doc_id::VARCHAR) AS h FROM documents
), b AS (
  SELECT doc_id, source, {_NIBFOLD_SPLIT} % 10000 AS bucket FROM hx
)
SELECT doc_id, source, bucket
FROM b
WHERE bucket < CASE source WHEN 'src13' THEN 9000
                           WHEN 'src8' THEN 6000
                           ELSE 2500 END
"""


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting (functions/text.token_count + bpe_ish_token_count):
    whitespace tokens vs sub-word-ish pieces (word runs and individual
    punctuation marks counted separately) per document. Proves the bpe-ish
    regex's Java/RE2 parity claim against the DuckDB oracle
    (r4 verdict #8)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
        bpe_ish_token_count,
        token_count,
    )

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("ws_tokens"),
        bpe_ish_token_count(F.col("text")).cast("long").alias("bpe_tokens"),
    )


SQL_TOKEN_COUNTS = r"""
SELECT doc_id,
       len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT
         AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^\sA-Za-z0-9_]'))::BIGINT
         AS bpe_tokens
FROM documents
"""


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (functions/text.pii_redact): typed-placeholder redaction
    of emails / SSNs / phones / IPv4s plus per-type pre-redaction counts —
    the standard pre-training privacy pass, a pure codegen'd
    regexp_replace chain (patterns restricted to Java/RE2-common
    constructs so the oracle reproduces them)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
        pii_count,
        pii_redact,
    )

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        pii_redact(F.col("text")).alias("clean_text"),
        pii_count(F.col("text"), "email").alias("n_emails"),
        pii_count(F.col("text"), "ssn").alias("n_ssns"),
        pii_count(F.col("text"), "phone").alias("n_phones"),
        pii_count(F.col("text"), "ipv4").alias("n_ips"),
    )


SQL_PII_REDACT = r"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
           '\b(?:\+?\d{1,2}[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g'),
         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS clean_text,
       len(regexp_extract_all(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
       len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b'))::BIGINT AS n_ssns,
       len(regexp_extract_all(text,
         '\b(?:\+?\d{1,2}[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b'))::BIGINT AS n_phones,
       len(regexp_extract_all(text,
         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ips
FROM documents
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (llm/dedup.decontaminate): flag corpus
    docs sharing any 4-gram with the held-out 'benchmark' set (here: the
    hash-bucket test split, bucket >= 9000). Benchmark shingles broadcast;
    the corpus pass is a narrow shingle probe — no corpus-side shuffle,
    the training-set leakage guard at 100 TB."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import decontaminate
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.sampling import (
        hash_bucket,
    )

    d = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id"))
    corpus = d.filter(bucket < 9000)
    bench = d.filter(bucket >= 9000)
    return decontaminate(corpus, bench, n=4)


SQL_DECONTAMINATE = f"""
WITH hx AS (
  SELECT doc_id, text, md5(doc_id::VARCHAR) AS h FROM documents
), b AS (
  SELECT doc_id, text, {_NIBFOLD_SPLIT} % 10000 AS bucket FROM hx
), t AS (
  SELECT doc_id, bucket,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM b
), sh AS (
  SELECT doc_id, bucket,
         CASE WHEN len(toks) >= 4
           THEN list_distinct(list_transform(range(1, len(toks) - 2),
                                             i -> array_to_string(toks[i:i+3], ' ')))
           ELSE [] END AS shingles
  FROM t
), bench AS (
  SELECT DISTINCT UNNEST(shingles) AS shingle FROM sh WHERE bucket >= 9000
), corp AS (
  SELECT doc_id, UNNEST(shingles) AS shingle FROM sh WHERE bucket < 9000
), hits AS (
  SELECT doc_id, COUNT(*) AS n_hits FROM corp JOIN bench USING (shingle)
  GROUP BY doc_id
)
SELECT c.doc_id,
       COALESCE(h.n_hits, 0)::BIGINT AS n_hits,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM sh WHERE bucket < 9000) c
LEFT JOIN hits h USING (doc_id)
"""


def q_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary encoding (llm/sampling.encode_tokens): documents to
    (doc_id, pos, token_id) through the df-bounded vocab (min_df=5,
    max_df=50%), OOV -> 0. Vocab broadcasts (~1e5-1e6 rows at any scale);
    the corpus pass is posexplode + broadcast probe, zero corpus-side
    shuffle."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        build_vocab,
        encode_tokens,
    )

    d = load_table(spark, sf_dir, "documents")
    vocab = build_vocab(d, min_df=5, max_df_frac=0.5)
    return encode_tokens(d, vocab)


SQL_ENCODE_TOKENS = """
WITH toks AS (
  SELECT DISTINCT doc_id AS doc, t.token
  FROM documents,
       unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))
         AS t(token)
), n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
dfreq AS (
  SELECT token, COUNT(*) AS df FROM toks GROUP BY token
), vocab AS (
  SELECT token,
         CAST(ROW_NUMBER() OVER (ORDER BY df DESC, token) AS BIGINT) AS vocab_id
  FROM dfreq, n
  WHERE df >= 5 AND df <= n.n_docs * 0.5
), seq AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tk
  FROM documents
), pos AS (
  SELECT doc_id, UNNEST(range(1, len(tk) + 1)) AS pos, tk FROM seq
), tokpos AS (
  SELECT doc_id, pos::BIGINT AS pos, tk[pos] AS token FROM pos
)
SELECT tp.doc_id, tp.pos, COALESCE(v.vocab_id, 0)::BIGINT AS token_id
FROM tokpos tp LEFT JOIN vocab v USING (token)
"""


def q_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency-bounded vocabulary build (llm/sampling.py
    build_vocab): distinct (doc, token) -> one-shuffle df count -> band
    filter (min_df=5, max_df=50%) -> contiguous vocab ids by (df desc,
    token)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import build_vocab

    d = load_table(spark, sf_dir, "documents")
    return build_vocab(d, min_df=5, max_df_frac=0.5)


SQL_VOCAB_BUILD = """
WITH toks AS (
  SELECT DISTINCT doc_id AS doc, t.token
  FROM documents,
       unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))
         AS t(token)
), n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
dfreq AS (
  SELECT token, COUNT(*) AS df FROM toks GROUP BY token
)
SELECT token, df,
       CAST(ROW_NUMBER() OVER (ORDER BY df DESC, token) AS INTEGER) AS vocab_id
FROM dfreq, n
WHERE df >= 5 AND df <= n.n_docs * 0.5
"""


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (llm/sampling.pack_sequences):
    hash-sharded document streams, per-shard window cumsum offsets,
    budget-floor pack ids — the pretraining row layout, num_shards-way
    parallel with no global window."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import pack_sequences

    d = load_table(spark, sf_dir, "documents")
    return pack_sequences(d, budget=2048, num_shards=8)


SQL_SEQUENCE_PACK = f"""
WITH hx AS (
  SELECT doc_id, text, md5(doc_id::VARCHAR) AS h FROM documents
), t AS (
  SELECT doc_id,
         {_NIBFOLD_SPLIT} % 10000 % 8 AS shard,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::BIGINT
           AS n_tokens
  FROM hx
), o AS (
  SELECT doc_id, shard, n_tokens,
         -- DuckDB SUM(BIGINT) widens to HUGEINT -> pandas float64; pin BIGINT
         CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS "offset"
  FROM t
)
SELECT doc_id, shard, n_tokens, "offset",
       CAST(FLOOR("offset" / 2048) AS BIGINT) AS pack_id
FROM o
"""


def q_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition quality filter (functions/text.
    repetition_ratio): 1 - distinct/total trigram shingles, floor-scaled."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import spread
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
        repetition_ratio,
    )

    # spread: the testdata parquet is one row group; without fanning out,
    # the whole shingle+distinct pass runs as ONE task (measured 10.5 s
    # serial vs ~0.5 s spread at sf0.1)
    d = spread(load_table(spark, sf_dir, "documents"))
    return d.select("doc_id", repetition_ratio(F.col("text"), n=3).alias("rep_ratio"))


SQL_REPETITION_PROFILE = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [] END AS shingles
  FROM t
)
SELECT doc_id,
       CASE WHEN len(shingles) > 0
         THEN FLOOR((1.0 - len(list_distinct(shingles)) / CAST(len(shingles) AS DOUBLE)) * 10000) / 10000
         ELSE 0.0 END AS rep_ratio
FROM sh
"""


def q_llm_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus pipeline composition — the LLM-surface
    analogue of cnv_matrix's composition proof: quality scoring + language
    ID → filter (quality >= 0.3, lang = 'en') → exact dedup by normalized
    fingerprint (keep min doc_id) → deterministic train split (md5-bucket
    80%) → token-budget sequence packing. One lazy DAG over five operator
    families, one oracle."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import spread
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
        fingerprint,
        lang_id,
        quality_score,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        dataset_split,
        pack_sequences,
    )

    d = spread(load_table(spark, sf_dir, "documents"))
    profiled = d.select(
        "doc_id",
        "text",
        quality_score(F.col("text")).alias("quality"),
        lang_id(F.col("text")).alias("lang"),
        fingerprint(F.col("text")).alias("fp"),
    )
    filtered = profiled.filter((F.col("quality") >= 0.3) & (F.col("lang") == "en"))
    deduped = keep_first(filtered, ["fp"], [F.col("doc_id").asc()])
    train = dataset_split(deduped).filter(F.col("split") == "train")
    return pack_sequences(train, budget=2048, num_shards=8)


SQL_LLM_CORPUS_PIPELINE = f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
), m AS (
  SELECT doc_id, text, toks, CAST(len(toks) AS DOUBLE) AS n,
    CASE WHEN len(toks) > 0
         THEN len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS distinct_ratio,
    CASE WHEN len(toks) > 0
         THEN len(list_filter(toks, x -> lower(x) IN
              ('the','a','of','and','to','in','is','that','it','for')))
              / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS sw,
    len(list_filter(toks, x -> lower(x) IN ('the','a','of','and','to','in','is','that','it','for'))) AS c_en,
    len(list_filter(toks, x -> lower(x) IN ('el','la','de','que','y','en','un','es','se','no'))) AS c_es,
    len(list_filter(toks, x -> lower(x) IN ('le','la','de','et','un','en','que','est','pour','qui'))) AS c_fr,
    len(list_filter(toks, x -> lower(x) IN ('der','die','das','und','ist','von','ein','zu','mit','den'))) AS c_de,
    CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE) AS punct
  FROM t
), prof AS (
  SELECT doc_id, text, toks,
    FLOOR(GREATEST(LEAST(
        0.25 * LEAST(n / 100.0, 1.0)
      + 0.25 * distinct_ratio
      + 0.35 * LEAST(sw * 5, 1.0)
      + 0.15 * (1 - LEAST(CASE WHEN length(text) > 0 THEN punct / length(text) ELSE 1.0 END * 4, 1.0)),
      1.0), 0.0) * 10000) / 10000 AS quality,
    CASE WHEN GREATEST(c_en, c_es, c_fr, c_de) = 0 THEN 'und'
         WHEN c_en = GREATEST(c_en, c_es, c_fr, c_de) THEN 'en'
         WHEN c_es = GREATEST(c_en, c_es, c_fr, c_de) THEN 'es'
         WHEN c_fr = GREATEST(c_en, c_es, c_fr, c_de) THEN 'fr'
         ELSE 'de' END AS lang,
    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
  FROM m
), ded AS (
  SELECT doc_id, toks FROM prof
  WHERE quality >= 0.3 AND lang = 'en'
  QUALIFY ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1
), hx AS (
  SELECT doc_id, toks, md5(doc_id::VARCHAR) AS h FROM ded
), tr0 AS (
  SELECT doc_id, toks, {_NIBFOLD_SPLIT} % 10000 AS bucket FROM hx
), tr AS (
  SELECT * FROM tr0 WHERE bucket < 8000
), o AS (
  SELECT doc_id, bucket % 8 AS shard, len(toks)::BIGINT AS n_tokens,
         -- DuckDB SUM(BIGINT) widens to HUGEINT -> pandas float64; pin BIGINT
         CAST(SUM(len(toks)::BIGINT) OVER (PARTITION BY bucket % 8 ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - len(toks)::BIGINT AS BIGINT) AS "offset"
  FROM tr
)
SELECT doc_id, shard, n_tokens, "offset",
       CAST(FLOOR("offset" / 2048) AS BIGINT) AS pack_id
FROM o
"""


def q_cnv_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end CNV pipeline composition (the cnv_flow DAG shape of
    plans/cnv.py:181 cnv_pipeline, re-expressed over the shared testdata):
    gene-locus window-dedup (gene_list_format keep-longest, cnv.py:376) →
    binned interval join at 50% overlap (bedtools intersect -f 0.5,
    cnv.py:413-436) → per-(gene,sample) window-dedup → GISTIC scalar
    binning (cnv.py:465-481) → fixed-column wide pivot (data_cna,
    cnv.py:668-684). One lazy DAG, one oracle — proves the operators
    compose, not just pass unit checks."""
    p = load_table(spark, sf_dir, "part")
    o = load_table(spark, sf_dir, "orders")
    genes_raw = p.select(
        F.col("p_partkey").alias("gene_id"),
        F.concat(F.lit("g"), (F.col("p_partkey") % 200).cast("string")).alias("gene"),
        F.concat(F.lit("c"), (F.col("p_partkey") % 5).cast("string")).alias("chrom"),
        ((F.col("p_partkey") * 37) % 100000).alias("start"),
        (((F.col("p_partkey") * 37) % 100000) + 200 + F.col("p_size") * 11).alias("end"),
    )
    # multi-locus genes: keep the longest transcript per (chrom, gene)
    genes = keep_first(
        genes_raw.withColumn("length", F.col("end") - F.col("start")),
        ["chrom", "gene"],
        [F.col("length").desc(), F.col("start").asc(), F.col("gene_id").asc()],
    ).drop("length")
    segs = o.select(
        F.col("o_orderkey").alias("seg_id"),
        F.concat(F.lit("s"), (F.col("o_custkey") % 10).cast("string")).alias("sample_id"),
        F.concat(F.lit("c"), (F.col("o_orderkey") % 5).cast("string")).alias("chrom"),
        ((F.col("o_orderkey") * 13) % 100000).alias("start"),
        (((F.col("o_orderkey") * 13) % 100000) + 600).alias("end"),
        (((F.col("o_orderkey") * 7) % 600) / F.lit(100.0) - F.lit(3.0)).alias("log2"),
    )
    j = interval_join(
        genes, segs, bin_size=10_000, min_overlap_frac=0.5,
        left_prefix="g_", right_prefix="s_",
    )
    # strongest segment per (gene, sample) cell — the uniqueness the
    # reference's pandas pivot demands (cnv.py:664-666)
    cell = keep_first(
        j.select(
            F.col("g_gene").alias("gene"),
            F.col("s_sample_id").alias("sample_id"),
            F.col("s_seg_id").alias("seg_id"),
            F.col("g_start").alias("g_start"),
            F.col("s_log2").alias("log2"),
        ),
        ["gene", "sample_id"],
        [F.col("log2").desc(), F.col("seg_id").asc(), F.col("g_start").asc()],
    )
    long = cell.select("gene", "sample_id", gistic_call(F.col("log2")).alias("gistic"))
    samples = [f"s{i}" for i in range(10)]
    # keep_first guarantees (gene, sample) uniqueness by construction; the
    # pivot's safety assert would re-run the whole join DAG a second time
    return to_wide_matrix(
        long, index="gene", column="sample_id", value="gistic",
        fill=0, column_values=samples, check_unique=False,
    )


SQL_CNV_MATRIX = """
WITH genes_raw AS (
  SELECT p_partkey AS gene_id,
         'g' || CAST(p_partkey % 200 AS VARCHAR) AS gene,
         'c' || CAST(p_partkey % 5 AS VARCHAR) AS chrom,
         (p_partkey * 37) % 100000 AS g_start,
         (p_partkey * 37) % 100000 + 200 + p_size * 11 AS g_end
  FROM part
), genes AS (
  SELECT gene_id, gene, chrom, g_start, g_end FROM genes_raw
  QUALIFY ROW_NUMBER() OVER (PARTITION BY chrom, gene
                             ORDER BY g_end - g_start DESC, g_start, gene_id) = 1
), segs AS (
  SELECT o_orderkey AS seg_id,
         's' || CAST(o_custkey % 10 AS VARCHAR) AS sample_id,
         'c' || CAST(o_orderkey % 5 AS VARCHAR) AS chrom,
         (o_orderkey * 13) % 100000 AS s_start,
         (o_orderkey * 13) % 100000 + 600 AS s_end,
         ((o_orderkey * 7) % 600) / 100.0 - 3.0 AS log2
  FROM orders
), j AS (
  SELECT gene, sample_id, seg_id, g_start, log2
  FROM genes JOIN segs USING (chrom)
  WHERE LEAST(g_end, s_end) - GREATEST(g_start, s_start) > 0
    AND LEAST(g_end, s_end) - GREATEST(g_start, s_start) >= 0.5 * (g_end - g_start)
), cell AS (
  SELECT gene, sample_id, log2 FROM j
  QUALIFY ROW_NUMBER() OVER (PARTITION BY gene, sample_id
                             ORDER BY log2 DESC, seg_id, g_start) = 1
), long AS (
  SELECT gene, sample_id,
         CASE WHEN log2 > 2.0 THEN 2
              WHEN log2 > 0.3 THEN 1
              WHEN log2 < -1.0 THEN -2
              WHEN log2 < -0.3 THEN -1
              ELSE 0 END AS gistic
  FROM cell
)
SELECT gene,
       COALESCE(MAX(gistic) FILTER (WHERE sample_id = 's0'), 0) AS s0,
       COALESCE(MAX(gistic) FILTER (WHERE sample_id = 's1'), 0) AS s1,
       COALESCE(MAX(gistic) FILTER (WHERE sample_id = 's2'), 0) AS s2,
       COALESCE(MAX(gistic) FILTER (WHERE sample_id = 's3'), 0) AS s3,
       COALESCE(MAX(gistic) FILTER (WHERE sample_id = 's4'), 0) AS s4,
       COALESCE(MAX(gistic) FILTER (WHERE sample_id = 's5'), 0) AS s5,
       COALESCE(MAX(gistic) FILTER (WHERE sample_id = 's6'), 0) AS s6,
       COALESCE(MAX(gistic) FILTER (WHERE sample_id = 's7'), 0) AS s7,
       COALESCE(MAX(gistic) FILTER (WHERE sample_id = 's8'), 0) AS s8,
       COALESCE(MAX(gistic) FILTER (WHERE sample_id = 's9'), 0) AS s9
FROM long GROUP BY gene
"""


def q_union_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat_mafs semantics (vcf_anno.py:350-398): union already-schematized
    parts, then the line-count ledger as one aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A")
    b = li.filter(F.col("l_returnflag") != "A")
    return (
        a.unionByName(b)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"), _dsum(F.col("l_quantity"), "sum_qty"))
    )


SQL_UNION_CONCAT = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM (
  SELECT * FROM lineitem WHERE l_returnflag = 'A'
  UNION ALL
  SELECT * FROM lineitem WHERE l_returnflag <> 'A'
)
GROUP BY l_returnflag
"""


# -------------------------------------------------------------------- scalars

def q_scalar_gistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GISTIC binning + log2 ratio scalars (cnv.py:465-481, pedmatch:73-87)
    applied to the events value column."""
    e = load_table(spark, sf_dir, "events")
    v = (F.col("value") - 15.0) / 5.0
    return e.select(
        "event_id",
        gistic_call(v).alias("gistic"),
        copy_number_to_log2(F.col("value")).alias("log2_cn"),
    )


SQL_SCALAR_GISTIC = """
SELECT event_id,
       CASE WHEN (value - 15.0) / 5.0 > 2.0 THEN 2
            WHEN (value - 15.0) / 5.0 > 0.3 THEN 1
            WHEN (value - 15.0) / 5.0 < -1.0 THEN -2
            WHEN (value - 15.0) / 5.0 < -0.3 THEN -1
            ELSE 0 END AS gistic,
       CASE WHEN value > 0 THEN ROUND(LOG2(value / 2), 4) END AS log2_cn
FROM events
"""


def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INFO-field regex extraction (pedmatch:118-121,203-205) applied to the
    events props JSON-ish string."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.regexp_extract(F.col("props"), r'k": (\d+)', 1).cast("long").alias("k_val"),
    )


SQL_REGEX_EXTRACT = """
SELECT event_id, TRY_CAST(regexp_extract(props, 'k": (\\d+)', 1) AS BIGINT) AS k_val
FROM events
"""


# ------------------------------------------------------------ text / LLM ops

def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnest (explode) — the CNV segments[] unnest (cnv.py:207-217) shape,
    applied to document tokens; plus token frequencies."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(ws_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_EXPLODE_TOKENS = """
SELECT token, COUNT(*) AS n FROM (
  SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS token
  FROM documents
) GROUP BY token
"""


def q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-analysis ops (north star): token count, stopword ratio, heuristic
    language ID, md5 content fingerprint."""
    d = spread(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.size(ws_tokens(F.col("text"))).cast("long").alias("n_tokens"),
        F.round(stopword_ratio(F.col("text")), 4).alias("sw_ratio"),
        lang_id(F.col("text")).alias("lang_guess"),
        fingerprint(F.col("text")).alias("fp"),
    )


SQL_TEXT_PROFILE = """
WITH toks AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tokens
  FROM documents
), counts AS (
  SELECT doc_id, text, tokens,
    len(list_filter(tokens, x -> lower(x) IN ('the','a','of','and','to','in','is','that','it','for'))) AS c_en,
    len(list_filter(tokens, x -> lower(x) IN ('el','la','de','que','y','en','un','es','se','no'))) AS c_es,
    len(list_filter(tokens, x -> lower(x) IN ('le','la','de','et','un','en','que','est','pour','qui'))) AS c_fr,
    len(list_filter(tokens, x -> lower(x) IN ('der','die','das','und','ist','von','ein','zu','mit','den'))) AS c_de
  FROM toks
)
SELECT doc_id,
       CAST(len(tokens) AS BIGINT) AS n_tokens,
       ROUND(CASE WHEN len(tokens) > 0 THEN CAST(c_en AS DOUBLE) / len(tokens) ELSE 0.0 END, 4) AS sw_ratio,
       CASE WHEN GREATEST(c_en, c_es, c_fr, c_de) = 0 THEN 'und'
            WHEN c_en = GREATEST(c_en, c_es, c_fr, c_de) THEN 'en'
            WHEN c_es = GREATEST(c_en, c_es, c_fr, c_de) THEN 'es'
            WHEN c_fr = GREATEST(c_en, c_es, c_fr, c_de) THEN 'fr'
            ELSE 'de' END AS lang_guess,
       md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
FROM counts
"""


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window (batch form of the Structured Streaming
    surface, SURVEY §2.8/§7): hourly counts + value sums per event type."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), _dsum(F.col("value"), "sum_value"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n", "sum_value")
    )


SQL_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS hour_start, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k similarity search (north star): for the first
    10 vectors, the 5 nearest neighbours by cosine. Dot products computed as
    sequential double folds in BOTH engines for bit-identical results."""
    emb = load_table(spark, sf_dir, "embeddings")
    as_double = F.col("embedding").cast("array<double>")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), as_double.alias("q_emb")
    )
    c = emb.select(F.col("vec_id").alias("c_id"), as_double.alias("c_emb"))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("q_id") != F.col("c_id"))
    cos = dot(F.col("q_emb"), F.col("c_emb")) / (
        F.sqrt(dot(F.col("q_emb"), F.col("q_emb")))
        * F.sqrt(dot(F.col("c_emb"), F.col("c_emb")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("c_id").asc())
    return (
        pairs.withColumn("cos_sim", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "c_id", F.round("cos_sim", 4).alias("cos_sim"), "rank")
    )


SQL_COSINE_TOPK = """
WITH q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id < 10
), c AS (
  SELECT vec_id AS c_id, embedding::DOUBLE[] AS c_emb FROM embeddings
), pairs AS (
  SELECT q_id, c_id,
    list_reduce(list_transform(list_zip(q_emb, c_emb), x -> x[1] * x[2]), (a, b) -> a + b)
      / (sqrt(list_reduce(list_transform(q_emb, x -> x * x), (a, b) -> a + b))
         * sqrt(list_reduce(list_transform(c_emb, x -> x * x), (a, b) -> a + b))) AS cos_sim
  FROM c, q WHERE q_id <> c_id
)
SELECT q_id, c_id, ROUND(cos_sim, 4) AS cos_sim, rank FROM (
  SELECT q_id, c_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rank
  FROM pairs
) WHERE rank <= 5
"""


# ------------------------------------------------------- LLM ops / streaming

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (north star): one row per normalized content fingerprint,
    keeper = min doc_id."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import exact_dedup

    return exact_dedup(load_table(spark, sf_dir, "documents"))


SQL_DEDUP_EXACT = """
SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
       MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


def q_token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: top-100 token frequencies (explode ->
    count), the classic first pass of tokenizer/vocab budgeting. Total
    order (count desc, token asc) makes the LIMIT deterministic."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(ws_tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(100)
    )


SQL_TOKEN_FREQUENCY = """
SELECT token, COUNT(*) AS n
FROM (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS token
  FROM documents
)
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 100
"""


def q_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rabin-Karp rolling-hash document fingerprinting with content-defined
    (mod-p) sampling — integer-only Horner folds, reproduced bit-for-bit by
    the oracle."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
        ROLLING_MOD,
        with_rolling_fingerprints,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    staged = with_rolling_fingerprints(d, hashes_col="_hashes", kept_col="_kept")
    checksum = (
        F.aggregate(F.col("_kept"), F.lit(0).cast("bigint"), lambda a, x: a + x)
        % ROLLING_MOD
    )
    return staged.select(
        "doc_id",
        F.size("_hashes").cast("bigint").alias("n_grams"),
        F.size("_kept").cast("bigint").alias("n_kept"),
        checksum.alias("fp_checksum"),
        # try_element_at: ANSI mode makes element_at THROW on empty arrays
        F.coalesce(F.try_element_at("_kept", F.lit(1)), F.lit(-1)).alias("fp_min"),
    )


SQL_ROLLING_FINGERPRINT = """
WITH nrm AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
  FROM documents WHERE doc_id < 500
), cd AS (
  SELECT doc_id, s,
         list_transform(range(1, length(s) + 1), i -> ascii(s[i])::BIGINT) AS codes
  FROM nrm
), hs AS (
  SELECT doc_id,
         CASE WHEN length(s) >= 8
           THEN list_transform(range(1, length(s) - 6),
                  i -> list_reduce(codes[i:i+7], (a,b) -> (a*257 + b) % 2147483647))
           ELSE [] END AS hashes
  FROM cd
), k AS (
  SELECT doc_id, hashes,
         list_sort(list_distinct(list_filter(hashes, h -> h % 64 = 0))) AS kept
  FROM hs
)
SELECT doc_id,
       len(hashes)::BIGINT AS n_grams,
       len(kept)::BIGINT AS n_kept,
       (COALESCE(list_sum(kept), 0) % 2147483647)::BIGINT AS fp_checksum,
       COALESCE(kept[1], -1)::BIGINT AS fp_min
FROM k
"""


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring + sub-word token counting (north star)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions import (
        bpe_ish_token_count,
        quality_score,
    )

    d = spread(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        quality_score(F.col("text")).alias("quality"),
        bpe_ish_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
    )


SQL_DOC_QUALITY = """
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
), m AS (
  SELECT doc_id, text, toks,
         CAST(len(toks) AS DOUBLE) AS n,
         CASE WHEN len(toks) > 0
              THEN len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE)
              ELSE 0.0 END AS distinct_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, x -> lower(x) IN
                   ('the','a','of','and','to','in','is','that','it','for')))
                   / CAST(len(toks) AS DOUBLE)
              ELSE 0.0 END AS sw,
         CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) AS punct
  FROM t
)
SELECT doc_id,
       FLOOR(GREATEST(LEAST(
           0.25 * LEAST(n / 100.0, 1.0)
         + 0.25 * distinct_ratio
         + 0.35 * LEAST(sw * 5, 1.0)
         + 0.15 * (1 - LEAST(CASE WHEN length(text) > 0 THEN punct / length(text) ELSE 1.0 END * 4, 1.0)),
         1.0), 0.0) * 10000) / 10000 AS quality,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^\\sA-Za-z0-9_]')) AS BIGINT) AS n_bpe_tokens
FROM m
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trigram-Jaccard near-dup pairs (north star). Bounded to the
    first 1000 docs so the shingle self-join stays proportionate in bench."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ngram_jaccard_pairs,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return ngram_jaccard_pairs(d, n=3, threshold=0.5)


SQL_NGRAM_JACCARD = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE doc_id < 1000
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [] END)) AS shingle
  FROM t
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5
"""


def q_ngram_jaccard_stoplist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-Jaccard near-dup pairs with the doc-frequency stoplist ON —
    the skew-bounded production shape: shingles appearing in more than
    max_doc_freq documents are dropped BEFORE the self-join, so every join
    key is bounded to max_doc_freq^2 pairs (without it one boilerplate
    shingle shared by k docs lands k^2 rows on a single reducer). Jaccard
    is computed over the filtered shingle space on both sides of the
    ratio; the DuckDB oracle mirrors the doc-freq filter."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ngram_jaccard_pairs,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return ngram_jaccard_pairs(d, n=3, threshold=0.5, max_doc_freq=5)


SQL_NGRAM_JACCARD_STOPLIST = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE doc_id < 1000
), sh0 AS (
  SELECT doc_id,
         unnest(list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [] END)) AS shingle
  FROM t
), hot AS (  -- doc-freq stoplist, mirrors ngram_jaccard_pairs(max_doc_freq=5)
  SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) > 5
), sh AS (
  SELECT doc_id, shingle FROM sh0
  WHERE shingle NOT IN (SELECT shingle FROM hot)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5
"""


# ---- generated-oracle helpers: the md5-derived hash families and the LSH
# plane literals are deterministic, so the DuckDB SQL below is GENERATED to
# embed the exact same constants the Spark plans use. Integer constructions
# (nibble folds, affine hashes, bit votes) are bit-exact across engines;
# float dot products agree to the last ulp only (DuckDB's list_reduce is a
# pairwise fold), which sign/round checks tolerate — validated end-to-end by
# tests/test_oracle_parity.py.

_DUCK_NIBFOLD = (
    "list_reduce(list_transform(range({a},{b}), i -> "
    "(CASE WHEN ascii(h[i]) >= 97 THEN ascii(h[i])-87 ELSE ascii(h[i])-48 END)::BIGINT), "
    "(a,b) -> a*16+b)"
)


def _duck_shingle_cte(n: int, doc_bound: int) -> str:
    """tokens -> n-word shingle lists (not distinct), mirroring
    functions.text.word_shingles."""
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE doc_id < {doc_bound}
), sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= {n}
           THEN list_transform(range(1, len(toks) - {n - 2}),
                               i -> array_to_string(toks[i:i+{n - 1}], ' '))
           ELSE [] END AS shingles
  FROM t
), hx AS (
  SELECT doc_id, list_transform(shingles, s -> md5(s)) AS hs
  FROM sh WHERE len(shingles) > 0
)"""


def _sql_minhash_universal(
    doc_bound: int, num_hashes: int, bands: int, threshold: float, seed: int
) -> str:
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        minhash_universal_coeffs,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        MERSENNE31,
    )

    a_co, b_co = minhash_universal_coeffs(num_hashes, seed)
    rpb = num_hashes // bands
    a_sql = "[" + ",".join(str(x) for x in a_co) + "]::BIGINT[]"
    b_sql = "[" + ",".join(str(x) for x in b_co) + "]::BIGINT[]"
    est = (
        "len(list_filter(list_zip(a.sig, b.sig), p -> p[1] = p[2]))"
        " / CAST(len(a.sig) AS DOUBLE)"
    )
    return f"""{_duck_shingle_cte(3, doc_bound)}, bp AS (
  SELECT doc_id,
         list_transform(hs, h -> {_DUCK_NIBFOLD.format(a=1, b=9)} % {MERSENNE31}) AS bps
  FROM hx
), co AS (
  SELECT {a_sql} AS ca, {b_sql} AS cb
), sigs AS (
  SELECT doc_id,
         list_transform(range(0, {num_hashes}),
           j -> list_aggregate(
                  list_transform(bps, x -> (ca[j+1] * x + cb[j+1]) % {MERSENNE31}),
                  'min')) AS sig
  FROM bp, co
), banded AS (
  SELECT doc_id, sig, b AS band,
         array_to_string(sig[b*{rpb}+1 : b*{rpb}+{rpb}], ',') AS bucket
  FROM sigs, unnest(range(0, {bands})) AS u(b)
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND({est}, 4) AS est_jaccard
FROM banded a JOIN banded b USING (band, bucket)
WHERE a.doc_id < b.doc_id AND ROUND({est}, 4) >= {threshold}
"""


def _sql_simhash_md5(doc_bound: int, max_hamming: int, blocks: int, combo_m: int) -> str:
    """Mirrors llm.dedup.simhash_dedup_pairs_md5's multi-index pigeonhole
    construction: packed per-block chunks, one join key per combination of
    combo_m chunks, bit_count(xor) Hamming verify on the packed 32-bit
    halves — integer-only, bit-exact across engines."""
    import itertools

    width = 64 // blocks
    combos = list(itertools.combinations(range(blocks), combo_m))

    def _key_expr(c: tuple[int, ...]) -> str:
        e = f"chunks[{c[0] + 1}]"
        for b in c[1:]:
            e = f"({e}) * {1 << width} + chunks[{b + 1}]"
        return e

    arms = "\n  UNION ALL ".join(
        f"SELECT doc_id, fp_lo, fp_hi, {ci} AS combo, {_key_expr(c)} AS bkey FROM pz"
        for ci, c in enumerate(combos)
    )
    ham = "bit_count(xor(a.fp_lo, b.fp_lo)) + bit_count(xor(a.fp_hi, b.fp_hi))"
    return f"""{_duck_shingle_cte(2, doc_bound)}, pk AS (
  SELECT doc_id,
         list_transform(hs, h -> {_DUCK_NIBFOLD.format(a=1, b=9)}) AS los,
         list_transform(hs, h -> {_DUCK_NIBFOLD.format(a=9, b=17)}) AS his
  FROM hx
), bits AS (
  SELECT doc_id,
         list_transform(range(0, 64), i -> CASE WHEN
           (CASE WHEN i < 32
                 THEN list_sum(list_transform(los, v -> ((v >> i) & 1) * 2 - 1))
                 ELSE list_sum(list_transform(his, v -> ((v >> (i - 32)) & 1) * 2 - 1))
            END) > 0 THEN 1 ELSE 0 END) AS bits
  FROM pk
), pz AS (
  SELECT doc_id,
         list_reduce(bits[1:32]::BIGINT[], (a,b) -> a*2+b) AS fp_lo,
         list_reduce(bits[33:64]::BIGINT[], (a,b) -> a*2+b) AS fp_hi,
         list_transform(range(0, {blocks}),
           b -> list_reduce(bits[b*{width}+1 : b*{width}+{width}]::BIGINT[],
                            (a,c) -> a*2+c)) AS chunks
  FROM bits
), keyed AS (
  {arms}
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST({ham} AS INTEGER) AS hamming
FROM keyed a JOIN keyed b USING (combo, bkey)
WHERE a.doc_id < b.doc_id AND {ham} <= {max_hamming}
"""


def _duck_plane_lit(plane: list[float]) -> str:
    return "[" + ",".join(repr(x) for x in plane) + "]::DOUBLE[]"


def _duck_bucket_expr(planes: list[list[float]]) -> str:
    """Integer bucket = sum of 2^j over planes with non-negative projection;
    matches the Spark double-weight sum exactly (distinct powers of two)."""
    terms = [
        "(CASE WHEN list_reduce(list_transform(list_zip("
        + _duck_plane_lit(p)
        + ", vec), x -> x[1]*x[2]), (a,b) -> a+b) >= 0 THEN "
        + str(1 << j)
        + " ELSE 0 END)"
        for j, p in enumerate(planes)
    ]
    return "(" + " + ".join(terms) + ")"


def _sql_ann_lsh(
    dim: int, k: int, num_planes: int, num_tables: int, seed: int, q_bound: int
) -> str:
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.similarity import (
        _hyperplanes,
    )

    arms = "\n  UNION ALL ".join(
        f"SELECT id, vec, {t} AS t, {_duck_bucket_expr(_hyperplanes(dim, num_planes, seed + t))} AS bucket FROM v"
        for t in range(num_tables)
    )
    return f"""
WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
cb AS (
  {arms}
),
qb AS (SELECT id, t, bucket FROM cb WHERE id < {q_bound}),
pairs AS (
  SELECT DISTINCT qb.id AS q_id, cb.id AS c_id
  FROM cb JOIN qb ON cb.t = qb.t AND cb.bucket = qb.bucket
  WHERE qb.id <> cb.id
),
nv AS (SELECT id, vec,
       sqrt(list_reduce(list_transform(vec, x -> x*x), (a,b) -> a+b)) AS nrm FROM v),
sc AS (
  SELECT q_id, c_id,
         list_reduce(list_transform(list_zip(qv.vec, cv.vec), x -> x[1]*x[2]),
                     (a,b) -> a+b) / (qv.nrm * cv.nrm) AS cos
  FROM pairs JOIN nv cv ON cv.id = pairs.c_id JOIN nv qv ON qv.id = pairs.q_id
)
SELECT q_id, c_id, ROUND(cos, 4) AS cos_sim, CAST(rank AS INTEGER) AS rank FROM (
  SELECT q_id, c_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
  FROM sc
) WHERE rank <= {k}
"""


def _sql_embedding_dups_lsh(
    dim: int, threshold: float, num_planes: int, num_tables: int, seed: int
) -> str:
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.similarity import (
        _hyperplanes,
    )

    arms = "\n  UNION ALL ".join(
        f"SELECT id, vec, {t} AS t, {_duck_bucket_expr(_hyperplanes(dim, num_planes, seed + t))} AS bucket FROM v"
        for t in range(num_tables)
    )
    cos = (
        "list_reduce(list_transform(list_zip(av.vec, bv.vec), x -> x[1]*x[2]),"
        " (a,b) -> a+b) / (av.nrm * bv.nrm)"
    )
    return f"""
WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
cb AS (
  {arms}
),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM cb a JOIN cb b ON a.t = b.t AND a.bucket = b.bucket
  WHERE a.id < b.id
),
nv AS (SELECT id, vec,
       sqrt(list_reduce(list_transform(vec, x -> x*x), (a,b) -> a+b)) AS nrm FROM v)
SELECT id_a, id_b, ROUND({cos}, 4) AS cos_sim
FROM pairs JOIN nv av ON av.id = pairs.id_a JOIN nv bv ON bv.id = pairs.id_b
WHERE ROUND({cos}, 4) >= {threshold}
"""


def q_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding cosine near-dup pairs routed through random-hyperplane LSH
    buckets — no cross product anywhere in the plan (the r1 brute-force form
    was the designated scale-killer; see q_embedding_dups_exact for the
    bounded exact variant). Oracle SQL embeds the identical plane literals."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        embedding_dup_pairs_lsh,
    )

    return embedding_dup_pairs_lsh(
        load_table(spark, sf_dir, "embeddings"),
        threshold=0.45,
        dim=64,
        num_planes=8,
        num_tables=12,
        seed=29,
    )


# num_planes 8 (r2: 5): 2^5 buckets/table held ~650k candidate pairs at
# n=2000 (a third of the cross product — quadratic creep); 2^8 cuts that
# ~7x while true near-dup recall (cos >= 0.9) stays ~0.98 over 12 tables.
# The library's num_planes=None auto-P derives this from n; the registered
# query pins it so the generated oracle shares the constants.
SQL_EMBEDDING_DUPS = _sql_embedding_dups_lsh(
    dim=64, threshold=0.45, num_planes=8, num_tables=12, seed=29
)


def q_embedding_dups_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine near-dup pairs on a bounded slice — the verify-stage /
    ground-truth face of q_embedding_dups (brute force is O(n^2); keep it
    bounded)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        embedding_dup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    return embedding_dup_pairs(emb, threshold=0.45)


SQL_EMBEDDING_DUPS_EXACT = """
WITH v AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS vec,
         sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
                          (a, b) -> a + b)) AS nrm
  FROM embeddings WHERE vec_id < 300
)
SELECT a.id AS id_a, b.id AS id_b,
       ROUND(list_reduce(list_transform(list_zip(a.vec, b.vec), x -> x[1] * x[2]),
                         (p, q) -> p + q) / (a.nrm * b.nrm), 4) AS cos_sim
FROM v a, v b
WHERE a.id < b.id
  AND ROUND(list_reduce(list_transform(list_zip(a.vec, b.vec), x -> x[1] * x[2]),
                        (p, q) -> p + q) / (a.nrm * b.nrm), 4) >= 0.45
"""


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates verified by estimated Jaccard, using
    classic universal hashing (md5 base hash + affine maps mod 2^31-1) —
    integer-only, so the DuckDB oracle reproduces signatures, bands,
    candidates and est_jaccard bit-for-bit at full production sizing
    (64 hashes x 16 bands). The JVM-only xxhash64 family
    (llm.dedup.minhash_dedup_pairs) keeps its semantics pinned by
    tests/test_llm_ops.py against true Jaccard."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        minhash_dedup_pairs_universal,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return minhash_dedup_pairs_universal(
        d, threshold=0.5, num_hashes=64, bands=16, seed=29
    )


SQL_MINHASH_LSH = _sql_minhash_universal(
    doc_bound=1000, num_hashes=64, bands=16, threshold=0.5, seed=29
)


def q_minhash_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH with md5 string-min hashing: the oracle-checkable variant
    — DuckDB reproduces the identical signatures, bands, candidates and
    estimated Jaccard. Bounded to 200 docs (md5 string hashing is the slow
    family; the xxhash64 variant is the production path)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        minhash_dedup_pairs_md5,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return minhash_dedup_pairs_md5(d, threshold=0.5, num_hashes=32, bands=8)


SQL_MINHASH_LSH_MD5 = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE doc_id < 200
), sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [] END AS shingles
  FROM t  -- doc bound + 32x8 sizing mirror the Spark side exactly
), sigs AS (
  SELECT doc_id,
         list_transform(range(0, 32),
           j -> list_aggregate(
                  list_transform(shingles, s -> md5(j::VARCHAR || '|' || s)),
                  'min')) AS sig
  FROM sh WHERE len(shingles) > 0
), banded AS (
  SELECT doc_id,
         b AS band,
         md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bucket
  FROM sigs, unnest(range(0, 8)) AS u(b)
), cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b USING (band, bucket)
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       ROUND(len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2]))
             / CAST(len(sa.sig) AS DOUBLE), 4) AS est_jaccard
FROM cands
JOIN sigs sa ON sa.doc_id = id_a
JOIN sigs sb ON sb.doc_id = id_b
WHERE len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2]))
      / CAST(len(sa.sig) AS DOUBLE) >= 0.5
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs by multi-index Hamming pigeonhole blocks
    (combinations of combo_m=2 chunks as join keys — a 2^16 key space per
    combo instead of the old fixed 2^8, so random-collision candidates
    shrink ~256x), bits derived from md5 hex nibbles packed into two 32-bit
    halves — integer-only, so the DuckDB oracle reproduces every bit vote,
    combo key and bit_count(xor) Hamming distance. combo_m is pinned here
    so the generated oracle shares the constants; the library auto-derives
    it from corpus size when unset. The JVM-only xxhash64 variant
    (llm.dedup.simhash_dedup_pairs) stays pinned by tests/test_llm_ops.py."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        simhash_dedup_pairs_md5,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return simhash_dedup_pairs_md5(d, max_hamming=6, blocks=8, combo_m=2)


SQL_SIMHASH_PAIRS = _sql_simhash_md5(doc_bound=1000, max_hamming=6, blocks=8, combo_m=2)


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate nearest neighbours. The hyperplanes are a
    seeded deterministic matrix, so the generated oracle SQL embeds the
    identical plane literals and reproduces bucketing, candidate pairs and
    the ranked top-k; recall vs the exact top-k is additionally pinned by
    tests/test_llm_ops.py."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import lsh_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_ann_topk(
        emb,
        emb.filter(F.col("vec_id") < 50),
        k=5,
        dim=64,
        num_planes=10,
        num_tables=4,
        seed=13,
    )


SQL_ANN_LSH = _sql_ann_lsh(
    dim=64, k=5, num_planes=10, num_tables=4, seed=13, q_bound=50
)


def _ivf_centroid_ids(n_pool: int = 500, k: int = 16, seed: int = 7) -> list[int]:
    """Deterministic coarse-quantizer sample, valid at every SF (ids 0..499
    exist from sf0.001 up); shared by the Spark plan and the oracle SQL."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return sorted(int(x) for x in rng.choice(n_pool, size=k, replace=False))


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat approximate nearest neighbours: inverted lists under a
    deterministic sampled coarse quantizer, nprobe-list probing. The
    centroid id sample is seeded, so the oracle rebuilds the identical
    index."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import ivf_flat_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_flat_topk(
        emb,
        emb.filter(F.col("vec_id") < 50),
        centroid_ids=_ivf_centroid_ids(),
        k=5,
        nprobe=4,
    )


def _sql_ivf_body(nc_cte: str, k: int, nprobe: int, q_bound: int) -> str:
    """Shared IVF oracle: assignment/probe/pair/score/rank over whatever
    ``nc_cte`` supplies as the (cid, cvec, cnrm) quantizer table — the
    sampled and trained variants differ ONLY in that CTE (mirroring
    _ivf_topk_core on the Spark side)."""
    acos = (
        "list_reduce(list_transform(list_zip(nv.vec, nc.cvec), x -> x[1]*x[2]),"
        " (a,b) -> a+b) / (nv.nrm * nc.cnrm)"
    )
    return f"""
WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
nv AS (SELECT id, vec,
       sqrt(list_reduce(list_transform(vec, x -> x*x), (a,b) -> a+b)) AS nrm FROM v),
nc AS ({nc_cte}),
assign AS (
  SELECT nv.id, nc.cid,
         row_number() OVER (PARTITION BY nv.id ORDER BY {acos} DESC, nc.cid) AS rn
  FROM nv CROSS JOIN nc
),
cand_lists AS (SELECT id, cid AS list_id FROM assign WHERE rn = 1),
qprobe AS (SELECT id AS q_id, cid AS list_id FROM assign
           WHERE id < {q_bound} AND rn <= {nprobe}),
pairs AS (
  SELECT DISTINCT q_id, cl.id AS c_id
  FROM qprobe JOIN cand_lists cl USING (list_id)
  WHERE cl.id <> q_id
),
sc AS (
  SELECT q_id, c_id,
         list_reduce(list_transform(list_zip(qv.vec, cv.vec), x -> x[1]*x[2]),
                     (a,b) -> a+b) / (qv.nrm * cv.nrm) AS cos
  FROM pairs JOIN nv cv ON cv.id = pairs.c_id JOIN nv qv ON qv.id = pairs.q_id
)
SELECT q_id, c_id, ROUND(cos, 4) AS cos_sim, CAST(rank AS INTEGER) AS rank FROM (
  SELECT q_id, c_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
  FROM sc
) WHERE rank <= {k}
"""


def _sql_ann_ivf(k: int, nprobe: int, q_bound: int) -> str:
    ids = ",".join(str(i) for i in _ivf_centroid_ids())
    nc = (
        "SELECT id AS cid, vec AS cvec,\n"
        "       sqrt(list_reduce(list_transform(vec, x -> x*x), (a,b) -> a+b)) AS cnrm\n"
        f"       FROM v WHERE id IN ({ids})"
    )
    return _sql_ivf_body(nc, k, nprobe, q_bound)


SQL_ANN_IVF = _sql_ann_ivf(k=5, nprobe=4, q_bound=50)


def q_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat under the TRAINED coarse quantizer: k-means|| centroids
    checked in as literals (llm/ivf_centroids.py, trained offline by
    scripts/train_ivf_centroids.py on the SF-stable vec_id<500 pool), so
    the index follows corpus density instead of a uniform id sample. The
    same literals inline into the oracle SQL — identical assignment,
    probing and ranking in both engines."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ivf_flat_topk_trained,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.ivf_centroids import (
        TRAINED_CENTROIDS,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_flat_topk_trained(
        emb,
        emb.filter(F.col("vec_id") < 50),
        centroids=TRAINED_CENTROIDS,
        k=5,
        nprobe=4,
    )


def _sql_ann_ivf_trained(k: int, nprobe: int, q_bound: int) -> str:
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.ivf_centroids import (
        TRAINED_CENTROIDS,
    )

    cent_rows = ",\n  ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(TRAINED_CENTROIDS)
    )
    nc = (
        "SELECT cid, cvec,\n"
        "       sqrt(list_reduce(list_transform(cvec, x -> x*x), (a,b) -> a+b)) AS cnrm\n"
        "       FROM (VALUES\n"
        f"  {cent_rows}) AS c(cid, cvec)"
    )
    return _sql_ivf_body(nc, k, nprobe, q_bound)


SQL_ANN_IVF_TRAINED = _sql_ann_ivf_trained(k=5, nprobe=4, q_bound=50)


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster canonicalization: connected components (min-label
    propagation, an iterative driver loop of join+agg rounds) over the
    n-gram Jaccard near-dup pairs. The DuckDB oracle walks the same graph
    with a recursive CTE — component labels are canonical (min id), so the
    results are engine-comparable."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        dedup_components,
        ngram_jaccard_pairs,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return dedup_components(ngram_jaccard_pairs(d, threshold=0.5))


SQL_DEDUP_COMPONENTS = """
WITH RECURSIVE t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE doc_id < 1000
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [] END)) AS shingle
  FROM t
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5
), e AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
), walk AS (
  SELECT s AS id, s AS comp FROM e
  UNION
  SELECT e.s AS id, walk.comp FROM e JOIN walk ON e.d = walk.id
)
SELECT id, MIN(comp) AS component FROM walk GROUP BY id
"""


def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user, 30-min inactivity gap (the batch face of
    the Structured Streaming surface — streaming/events.sessionize)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), _dsum(F.col("value"), "sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


SQL_SESSION_WINDOWS = """
WITH o AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM s GROUP BY user_id, sid
"""


# ----------------------------------------------------- breadth beyond ref

def q_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join + agg + global top-k (TPC-H Q3 shape): top 10 orders by
    revenue for one market segment. Exercises join planning + the
    TakeOrderedAndProject physical top-k (no full sort)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


SQL_TOPK_REVENUE = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping-set combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), _dsum(F.col("l_quantity"), "sum_qty")
    )


SQL_CUBE_AGG = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field access (the CNV-JSON struct path of cnv.py:204-217 for
    string-typed JSON columns): get_json_object over the events props."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k_json"),
    )


SQL_JSON_EXTRACT = """
SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k_json FROM events
"""


def q_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1h window, 30m slide): each event lands
    in two windows."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), _dsum(F.col("value"), "sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


SQL_SLIDING_WINDOWS = """
WITH slid AS (
  SELECT e.*, ws.window_start
  FROM events e, LATERAL (
    SELECT unnest([
      CAST(to_timestamp(floor(epoch(e.ts) / 1800) * 1800) AT TIME ZONE 'UTC' AS TIMESTAMP),
      CAST(to_timestamp(floor(epoch(e.ts) / 1800) * 1800 - 1800) AT TIME ZONE 'UTC' AS TIMESTAMP)
    ]) AS window_start
  ) ws
  WHERE e.ts >= ws.window_start
    AND e.ts < ws.window_start + INTERVAL 1 HOUR
)
SELECT window_start, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM slid GROUP BY 1, 2
"""


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) aggregation (beyond the reference's surface; a core
    engine capability — expand-based distinct aggregation)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


SQL_DISTINCT_AGG = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region -> nation -> total) over customers."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), _dsum(F.col("c_acctbal"), "sum_acctbal"))
    )


SQL_ROLLUP_AGG = """
SELECT r_name, n_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# ------------------------------------- relevance / clustering / incremental

_BM25_TERMS = ("join", "window", "stream", "vector")
_BM25_K1P1 = repr(1.2 + 1.0)  # exact double literal shared with the oracle


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search (llm/relevance.bm25_topk): ranked retrieval over
    the corpus for a fixed query. The corpus is never exploded — per-term
    tf is a narrow array fold, stats reduce to ONE broadcast row, top-k is
    TakeOrderedAndProject. idf is floor-scaled fixed point and the score
    chain is fixed-order, so the oracle reproduces every bit."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import bm25_topk

    d = load_table(spark, sf_dir, "documents")
    return bm25_topk(d, list(_BM25_TERMS), k=20)


def _sql_bm25(terms: tuple[str, ...], k: int) -> str:
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(tk, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(terms))
    )
    norm_len = (
        "(1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE) / "
        "(CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))"
    )
    contribs = " + ".join(
        f"(CAST(CAST(floor(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df{i} AS DOUBLE)"
        f" + 0.5) / (CAST(df{i} AS DOUBLE) + 0.5)) * 1000000) AS BIGINT) AS DOUBLE)"
        f" / 1000000.0) * (CAST(tf{i} AS DOUBLE) * {_BM25_K1P1}"
        f" / (CAST(tf{i} AS DOUBLE) + 1.2 * {norm_len}))"
        for i in range(len(terms))
    )
    matched = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(terms))
    )
    return f"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tk
  FROM documents
), base AS (
  SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl,
         {tf_cols}
  FROM d
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_dl,
         {df_cols}
  FROM base
), scored AS (
  SELECT doc_id,
         {contribs} AS score_raw,
         CAST({matched} AS INTEGER) AS matched_terms
  FROM base, stats
)
SELECT doc_id, floor(score_raw * 10000) / 10000 AS score, matched_terms
FROM scored WHERE matched_terms > 0
ORDER BY score DESC, doc_id
LIMIT {k}
"""


SQL_BM25_SEARCH = _sql_bm25(_BM25_TERMS, k=20)


def q_quality_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring (llm/relevance.unigram_logprob_profile):
    per-document mean log probability under the corpus's Laplace-smoothed
    unigram model. Log-probs are 1e-6 fixed point at birth, so document
    sums are exact BIGINT sums (order-independent) and the mean is one
    double division."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        unigram_logprob_profile,
    )

    return unigram_logprob_profile(load_table(spark, sf_dir, "documents"))


SQL_QUALITY_LM = """
WITH tok AS (
  SELECT doc_id, t.token
  FROM documents,
       unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))
         AS t(token)
), counts AS (
  SELECT token, COUNT(*) AS c FROM tok GROUP BY token
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t_tokens, CAST(COUNT(*) AS BIGINT) AS v_size
  FROM counts
), lm AS (
  SELECT token,
         CAST(floor(ln(CAST(c + 1 AS DOUBLE) / CAST(t_tokens + v_size AS DOUBLE))
                    * 1000000) AS BIGINT) AS lp6
  FROM counts, tot
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(lp6) AS BIGINT) AS sum_lp6,
       (CAST(SUM(lp6) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / 1000000.0
         AS mean_logprob
FROM tok JOIN lm USING (token)
GROUP BY doc_id
"""


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality filter (functions/text.gopher_metrics): the
    standard pre-training heuristic battery (word-count bounds, mean word
    length, symbol ratio, alphabetic fraction, stopword floor) as narrow
    per-row built-ins plus the combined keep decision."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
        gopher_keep,
        gopher_metrics,
    )

    d = load_table(spark, sf_dir, "documents")
    m = gopher_metrics(F.col("text"))
    return d.select(
        "doc_id",
        m["n_words"].alias("n_words"),
        m["mean_word_len"].alias("mean_word_len"),
        m["symbol_ratio"].alias("symbol_ratio"),
        m["alpha_frac"].alias("alpha_frac"),
        m["n_stopwords"].alias("n_stopwords"),
        gopher_keep(m).alias("keep"),
    )


SQL_GOPHER_QUALITY = """
WITH d AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(tk) AS BIGINT) AS n_words,
         COALESCE(CAST(list_sum(list_transform(tk, x -> length(x))) AS BIGINT), 0)
           AS word_chars,
         CAST(len(regexp_extract_all(text, '#|…|\\.\\.\\.')) AS BIGINT) AS n_sym,
         CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT)
           AS n_alpha,
         CAST(len(list_filter(tk, x -> list_contains(
              ['the','a','of','and','to','in','is','that','it','for'], lower(x))))
           AS BIGINT) AS n_stopwords
  FROM d
), r AS (
  SELECT doc_id, n_words,
         CASE WHEN n_words > 0
              THEN CAST(word_chars AS DOUBLE) / CAST(n_words AS DOUBLE)
              ELSE 0.0 END AS mean_word_len,
         CASE WHEN n_words > 0
              THEN CAST(n_sym AS DOUBLE) / CAST(n_words AS DOUBLE)
              ELSE 0.0 END AS symbol_ratio,
         CASE WHEN n_words > 0
              THEN CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE)
              ELSE 0.0 END AS alpha_frac,
         n_stopwords
  FROM m
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac, n_stopwords,
       (n_words >= 20 AND n_words <= 80
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
        AND n_stopwords >= 1) AS keep
FROM r
"""


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-corpus clustering profile (llm/clustering.cluster_profile):
    every vector assigned to its nearest trained k-means centroid via the
    shuffle-free array fold, then ONE per-cluster aggregation (size + mean
    member-to-centroid cosine, fixed-point summed). The same centroid
    literals inline into the oracle."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        cluster_profile,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.ivf_centroids import (
        TRAINED_CENTROIDS,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return cluster_profile(emb, TRAINED_CENTROIDS)


def _sql_kmeans_clusters() -> str:
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.ivf_centroids import (
        TRAINED_CENTROIDS,
    )

    cent_rows = ",\n  ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(TRAINED_CENTROIDS)
    )
    acos = (
        "list_reduce(list_transform(list_zip(nv.vec, nc.cvec), x -> x[1]*x[2]),"
        " (a,b) -> a+b) / (nc.cnrm * nv.nrm)"
    )
    return f"""
WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
nv AS (SELECT id, vec,
       sqrt(list_reduce(list_transform(vec, x -> x*x), (a,b) -> a+b)) AS nrm FROM v),
nc AS (
  SELECT cid, cvec,
         sqrt(list_reduce(list_transform(cvec, x -> x*x), (a,b) -> a+b)) AS cnrm
  FROM (VALUES
  {cent_rows}) AS c(cid, cvec)
), assign AS (
  SELECT nv.id, nc.cid, {acos} AS cos
  FROM nv CROSS JOIN nc
), ranked AS (
  SELECT id, cid, cos,
         row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid) AS rn
  FROM assign
)
SELECT CAST(cid AS BIGINT) AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       (CAST(SUM(CAST(floor(cos * 10000) AS BIGINT)) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE)) / 10000.0 AS mean_cos
FROM ranked WHERE rn = 1
GROUP BY cid
"""


SQL_KMEANS_CLUSTERS = _sql_kmeans_clusters()


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus incremental dedup (llm/dedup.incremental_dedup): a new
    ingest batch (tail split of the corpus, plus a simulated re-crawl of
    old documents and a duplicated slice of itself) dedups against the
    seen-corpus fingerprint snapshot without re-reading old text: narrow
    fingerprinting, one groupBy(fp) for intra-batch min-id dedup, LEFT
    ANTI against the store."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        exact_dedup,
        incremental_dedup,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.sampling import (
        hash_bucket,
    )

    d = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id"))
    seen = exact_dedup(d.filter(bucket < 8000)).select("fp")
    new = d.filter(bucket >= 8000).select("doc_id", "text")
    dup_new = (
        d.filter(bucket >= 9500)
        .select((F.col("doc_id") + 2000000).alias("doc_id"), "text")
    )
    recrawl = (
        d.filter(bucket < 1000)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    batch = new.unionByName(dup_new).unionByName(recrawl)
    return incremental_dedup(batch, seen)


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5-family composition proof (like cnv_matrix / llm_corpus_
    pipeline): Gopher rule battery -> unigram-LM floor (LM built on the
    FULL corpus, the realistic order) -> quality-weighted sampling, as ONE
    lazy DAG with one oracle. The corpus stays narrow until the single
    doc_id join against the vocabulary-derived LM profile."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions import (
        quality_score,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
        gopher_keep,
        gopher_metrics,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        unigram_logprob_profile,
        weighted_hash_sample,
    )

    d = load_table(spark, sf_dir, "documents")
    m = gopher_metrics(F.col("text"))
    kept = d.filter(gopher_keep(m))
    lm = unigram_logprob_profile(d)
    joined = kept.join(lm, "doc_id").filter(F.col("mean_logprob") >= F.lit(-3.41))
    q = quality_score(F.col("text"))
    return weighted_hash_sample(joined, q).select(
        "doc_id", "n_tokens", "mean_logprob", q.alias("quality")
    )


SQL_CURATION_PIPELINE = f"""
WITH d AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM documents
), gm AS (
  SELECT doc_id, text,
         CAST(len(tk) AS BIGINT) AS n_words,
         COALESCE(CAST(list_sum(list_transform(tk, x -> length(x))) AS BIGINT), 0)
           AS word_chars,
         CAST(len(regexp_extract_all(text, '#|…|\\.\\.\\.')) AS BIGINT) AS n_sym,
         CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT)
           AS n_alpha,
         CAST(len(list_filter(tk, x -> list_contains(
              ['the','a','of','and','to','in','is','that','it','for'], lower(x))))
           AS BIGINT) AS n_stopwords
  FROM d
), kept AS (
  SELECT doc_id, text FROM gm
  WHERE n_words >= 20 AND n_words <= 80
    AND (CASE WHEN n_words > 0
              THEN CAST(word_chars AS DOUBLE) / CAST(n_words AS DOUBLE)
              ELSE 0.0 END) >= 3.0
    AND (CASE WHEN n_words > 0
              THEN CAST(word_chars AS DOUBLE) / CAST(n_words AS DOUBLE)
              ELSE 0.0 END) <= 10.0
    AND (CASE WHEN n_words > 0
              THEN CAST(n_sym AS DOUBLE) / CAST(n_words AS DOUBLE)
              ELSE 0.0 END) <= 0.1
    AND (CASE WHEN n_words > 0
              THEN CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE)
              ELSE 0.0 END) >= 0.8
    AND n_stopwords >= 1
), tok AS (
  SELECT doc_id, t.token
  FROM documents,
       unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))
         AS t(token)
), counts AS (
  SELECT token, COUNT(*) AS c FROM tok GROUP BY token
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t_tokens, CAST(COUNT(*) AS BIGINT) AS v_size
  FROM counts
), lmt AS (
  SELECT token,
         CAST(floor(ln(CAST(c + 1 AS DOUBLE) / CAST(t_tokens + v_size AS DOUBLE))
                    * 1000000) AS BIGINT) AS lp6
  FROM counts, tot
), perdoc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         (CAST(SUM(lp6) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / 1000000.0
           AS mean_logprob
  FROM tok JOIN lmt USING (token)
  GROUP BY doc_id
), qm AS (
  SELECT doc_id, text, tk AS toks,
         CAST(len(tk) AS DOUBLE) AS n,
         CASE WHEN len(tk) > 0
              THEN len(list_distinct(tk)) / CAST(len(tk) AS DOUBLE)
              ELSE 0.0 END AS distinct_ratio,
         CASE WHEN len(tk) > 0
              THEN len(list_filter(tk, x -> lower(x) IN
                   ('the','a','of','and','to','in','is','that','it','for')))
                   / CAST(len(tk) AS DOUBLE)
              ELSE 0.0 END AS sw,
         CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE) AS punct
  FROM d
), qual AS (
  SELECT doc_id,
         FLOOR(GREATEST(LEAST(
             0.25 * LEAST(n / 100.0, 1.0)
           + 0.25 * distinct_ratio
           + 0.35 * LEAST(sw * 5, 1.0)
           + 0.15 * (1 - LEAST(CASE WHEN length(text) > 0 THEN punct / length(text) ELSE 1.0 END * 4, 1.0)),
           1.0), 0.0) * 10000) / 10000 AS quality
  FROM qm
), bk AS (
  SELECT doc_id, {_NIBFOLD_SPLIT} % 10000 AS bucket
  FROM (SELECT doc_id, md5(doc_id::VARCHAR) AS h FROM documents)
)
SELECT k.doc_id, p.n_tokens, p.mean_logprob, q.quality
FROM kept k
JOIN perdoc p ON p.doc_id = k.doc_id
JOIN qual q ON q.doc_id = k.doc_id
JOIN bk b ON b.doc_id = k.doc_id
WHERE p.mean_logprob >= -3.41
  AND b.bucket < CAST(FLOOR(q.quality * 10000) AS BIGINT)
"""


def q_tfidf_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF featurization (llm/relevance.tfidf_features) over the
    df-bounded vocab (min_df=5, max_df=50%): map-side-combined tf counts,
    broadcast vocab probe, fixed-point smooth idf — one exact product per
    weight."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        build_vocab,
        tfidf_features,
    )

    d = load_table(spark, sf_dir, "documents")
    return tfidf_features(d, build_vocab(d, min_df=5, max_df_frac=0.5))


SQL_TFIDF_FEATURES = """
WITH toksd AS (
  SELECT DISTINCT doc_id AS doc, t.token
  FROM documents,
       unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))
         AS t(token)
), n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
dfreq AS (
  SELECT token, COUNT(*) AS df FROM toksd GROUP BY token
), vocab AS (
  SELECT token, df,
         CAST(ROW_NUMBER() OVER (ORDER BY df DESC, token) AS BIGINT) AS vocab_id
  FROM dfreq, n
  WHERE df >= 5 AND df <= n.n_docs * 0.5
), tok AS (
  SELECT doc_id, t.token
  FROM documents,
       unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))
         AS t(token)
), tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
SELECT tf.doc_id, v.vocab_id AS token_id, tf.tf,
       CAST(tf.tf AS DOUBLE) *
       (CAST(CAST(floor(ln(CAST(1 + nn.n_docs AS DOUBLE)
                            / CAST(1 + v.df AS DOUBLE)) * 1000000) AS BIGINT) AS DOUBLE)
        / 1000000.0) AS tfidf
FROM tf JOIN vocab v USING (token), nn
"""


def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health dashboard: doc/token volume, mean quality
    (exact — quality is 4-decimal fixed point, summed through DECIMAL),
    Gopher keep-rate. The grouped-aggregation face of the quality family;
    one shuffle keyed by source with map-side combine."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions import (
        quality_score,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
        gopher_keep,
        gopher_metrics,
        token_count,
    )

    d = load_table(spark, sf_dir, "documents")
    m = gopher_metrics(F.col("text"))
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text")).cast("bigint")).alias("total_tokens"),
        _dsum(quality_score(F.col("text")), "sum_quality"),
        F.sum(gopher_keep(m).cast("bigint")).alias("n_keep"),
    )
    return agg.select(
        "source",
        "n_docs",
        "total_tokens",
        (F.col("sum_quality") / F.col("n_docs").cast("double")).alias("avg_quality"),
        (F.col("n_keep").cast("double") / F.col("n_docs").cast("double")).alias(
            "keep_rate"
        ),
    )


SQL_CORPUS_REPORT = """
WITH d AS (
  SELECT doc_id, text, source,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM documents
), per AS (
  SELECT source,
         CAST(len(tk) AS BIGINT) AS n_tokens,
         FLOOR(GREATEST(LEAST(
             0.25 * LEAST(CAST(len(tk) AS DOUBLE) / 100.0, 1.0)
           + 0.25 * (CASE WHEN len(tk) > 0
                          THEN len(list_distinct(tk)) / CAST(len(tk) AS DOUBLE)
                          ELSE 0.0 END)
           + 0.35 * LEAST((CASE WHEN len(tk) > 0
                          THEN len(list_filter(tk, x -> lower(x) IN
                               ('the','a','of','and','to','in','is','that','it','for')))
                               / CAST(len(tk) AS DOUBLE)
                          ELSE 0.0 END) * 5, 1.0)
           + 0.15 * (1 - LEAST(CASE WHEN length(text) > 0
                          THEN CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE)
                               / length(text) ELSE 1.0 END * 4, 1.0)),
           1.0), 0.0) * 10000) / 10000 AS quality,
         CASE WHEN CAST(len(tk) AS BIGINT) >= 20 AND CAST(len(tk) AS BIGINT) <= 80
               AND (CASE WHEN len(tk) > 0
                    THEN CAST(COALESCE(CAST(list_sum(list_transform(tk, x -> length(x))) AS BIGINT), 0) AS DOUBLE)
                         / CAST(len(tk) AS DOUBLE) ELSE 0.0 END) >= 3.0
               AND (CASE WHEN len(tk) > 0
                    THEN CAST(COALESCE(CAST(list_sum(list_transform(tk, x -> length(x))) AS BIGINT), 0) AS DOUBLE)
                         / CAST(len(tk) AS DOUBLE) ELSE 0.0 END) <= 10.0
               AND (CASE WHEN len(tk) > 0
                    THEN CAST(len(regexp_extract_all(text, '#|…|\\.\\.\\.')) AS DOUBLE)
                         / CAST(len(tk) AS DOUBLE) ELSE 0.0 END) <= 0.1
               AND (CASE WHEN len(tk) > 0
                    THEN CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
                         / CAST(len(tk) AS DOUBLE) ELSE 0.0 END) >= 0.8
               AND CAST(len(list_filter(tk, x -> list_contains(
                    ['the','a','of','and','to','in','is','that','it','for'], lower(x))))
                    AS BIGINT) >= 1
              THEN 1 ELSE 0 END AS keep
  FROM d
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(CAST(quality AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS avg_quality,
       CAST(SUM(keep) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS keep_rate
FROM per GROUP BY source
"""


def q_bigram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-bigram collocation counts (llm/sampling.bigram_counts) —
    the counting step of a BPE/WordPiece merge round: narrow per-doc pair
    transform, one map-side-combined aggregation, TakeOrdered top-100."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import bigram_counts

    return bigram_counts(load_table(spark, sf_dir, "documents"), top_k=100)


SQL_BIGRAM_TOP = """
WITH d AS (
  SELECT list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tk
  FROM documents
), p AS (
  SELECT tk[i] AS token_a, tk[i + 1] AS token_b
  FROM d, unnest(range(1, len(tk))) AS r(i)
)
SELECT token_a, token_b, COUNT(*) AS n
FROM p GROUP BY 1, 2
ORDER BY n DESC, token_a ASC, token_b ASC
LIMIT 100
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic near-dup pairs (llm/clustering.
    semantic_dup_pairs): bucket by nearest trained k-means centroid,
    pairwise cosine only within a cluster — the density-adaptive
    counterpart of the hyperplane-LSH bucketing in embedding_dups. Same
    0.45 threshold as the LSH face so the two candidate generators are
    directly comparable."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        semantic_dup_pairs,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.ivf_centroids import (
        TRAINED_CENTROIDS,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dup_pairs(emb, TRAINED_CENTROIDS, threshold=0.45)


def _sql_semantic_dedup(threshold: float) -> str:
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.ivf_centroids import (
        TRAINED_CENTROIDS,
    )

    cent_rows = ",\n  ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(TRAINED_CENTROIDS)
    )
    acos = (
        "list_reduce(list_transform(list_zip(nv.vec, nc.cvec), x -> x[1]*x[2]),"
        " (a,b) -> a+b) / (nc.cnrm * nv.nrm)"
    )
    pcos = (
        "list_reduce(list_transform(list_zip(va.vec, vb.vec), x -> x[1]*x[2]),"
        " (a,b) -> a+b) / (va.nrm * vb.nrm)"
    )
    return f"""
WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
nv AS (SELECT id, vec,
       sqrt(list_reduce(list_transform(vec, x -> x*x), (a,b) -> a+b)) AS nrm FROM v),
nc AS (
  SELECT cid, cvec,
         sqrt(list_reduce(list_transform(cvec, x -> x*x), (a,b) -> a+b)) AS cnrm
  FROM (VALUES
  {cent_rows}) AS c(cid, cvec)
), assign AS (
  SELECT nv.id, nc.cid, {acos} AS cos
  FROM nv CROSS JOIN nc
), ranked AS (
  SELECT id, cid,
         row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid) AS rn
  FROM assign
), cl AS (
  SELECT id, cid FROM ranked WHERE rn = 1
), pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM cl a JOIN cl b ON a.cid = b.cid AND a.id < b.id
)
SELECT id_a, id_b, ROUND({pcos}, 4) AS cos_sim
FROM pairs JOIN nv va ON va.id = pairs.id_a JOIN nv vb ON vb.id = pairs.id_b
WHERE ROUND({pcos}, 4) >= {threshold}
"""


SQL_SEMANTIC_DEDUP = _sql_semantic_dedup(threshold=0.45)


def q_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling (llm/sampling.
    weighted_hash_sample): per-document acceptance probability equals the
    quality score — the quality-proportional subsampling step of
    pre-training data mixes, as one narrow pushdown-safe filter (the
    md5 bucket and the score are both per-row expressions)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions import (
        quality_score,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        weighted_hash_sample,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.sampling import (
        hash_bucket,
    )

    d = load_table(spark, sf_dir, "documents")
    q = quality_score(F.col("text"))
    return weighted_hash_sample(d, q).select(
        "doc_id",
        q.alias("quality"),
        hash_bucket(F.col("doc_id")).alias("bucket"),
    )


SQL_QUALITY_WEIGHTED_SAMPLE = f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
), m AS (
  SELECT doc_id, text, toks,
         CAST(len(toks) AS DOUBLE) AS n,
         CASE WHEN len(toks) > 0
              THEN len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE)
              ELSE 0.0 END AS distinct_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, x -> lower(x) IN
                   ('the','a','of','and','to','in','is','that','it','for')))
                   / CAST(len(toks) AS DOUBLE)
              ELSE 0.0 END AS sw,
         CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE) AS punct
  FROM t
), q AS (
  SELECT doc_id,
         FLOOR(GREATEST(LEAST(
             0.25 * LEAST(n / 100.0, 1.0)
           + 0.25 * distinct_ratio
           + 0.35 * LEAST(sw * 5, 1.0)
           + 0.15 * (1 - LEAST(CASE WHEN length(text) > 0 THEN punct / length(text) ELSE 1.0 END * 4, 1.0)),
           1.0), 0.0) * 10000) / 10000 AS quality
  FROM m
), hx AS (
  SELECT doc_id, quality, md5(doc_id::VARCHAR) AS h FROM q
), b AS (
  SELECT doc_id, quality, {_NIBFOLD_SPLIT} % 10000 AS bucket FROM hx
)
SELECT doc_id, quality, bucket
FROM b WHERE bucket < CAST(FLOOR(quality * 10000) AS BIGINT)
"""


SQL_INCREMENTAL_DEDUP = f"""
WITH hx AS (
  SELECT doc_id, text, md5(doc_id::VARCHAR) AS h FROM documents
), b AS (
  SELECT doc_id, text, {_NIBFOLD_SPLIT} % 10000 AS bucket FROM hx
), seen AS (
  SELECT DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
  FROM b WHERE bucket < 8000
), batch AS (
  SELECT doc_id, text FROM b WHERE bucket >= 8000
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text FROM b WHERE bucket >= 9500
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM b WHERE bucket < 1000
), fresh AS (
  SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
         MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_copies
  FROM batch GROUP BY 1
)
SELECT doc_id, fp, n_copies
FROM fresh WHERE fp NOT IN (SELECT fp FROM seen)
"""


# ------------------------------------------- round-5b: time-series + curation

def q_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.asof_join): each purchase event picks up
    the most recent click at-or-before it for the same user. Single
    shuffle on user_id via union + running last(ignorenulls) — no range
    explosion (the naive l.ts >= r.ts join is O(|l|x|r|) per user).
    Tie rule pinned: latest event_id wins among equal-ts clicks."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        asof_join,
    )

    e = load_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = e.filter(F.col("event_type") == "click")
    return asof_join(
        left,
        right,
        on=["user_id"],
        ts="ts",
        right_cols=["value"],
        tiebreak="event_id",
    )


SQL_ASOF_ENRICH = """
SELECT l.event_id, l.user_id, l.ts, l.value,
       (SELECT r.ts FROM events r
         WHERE r.event_type = 'click' AND r.user_id = l.user_id
           AND r.ts <= l.ts
         ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS asof_ts,
       (SELECT r.value FROM events r
         WHERE r.event_type = 'click' AND r.user_id = l.user_id
           AND r.ts <= l.ts
         ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS asof_value
FROM events l
WHERE l.event_type = 'purchase'
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k-per-group (operators/dedup.keep_topk, the k>1 form of the
    reference's sort+drop_duplicates window at cnv.py:372): top 3 orders
    per customer by price. One shuffle; row_number under a total order."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        keep_topk,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return keep_topk(
        o,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
        rank_col="rnk",
    )


SQL_TOPK_PER_GROUP = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


def q_percentile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (corpus length profiling
    per source): single mergeable aggregate, no second pass. Values are
    rounded to 4 decimals in both engines (interpolation arithmetic
    order is engine-internal)."""
    d = load_table(spark, sf_dir, "documents")
    pct = F.percentile(F.col("n_chars").cast("double"), F.array(
        F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.95)
    ))
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            pct.alias("_p"),
        )
        .select(
            "source",
            "n_docs",
            F.round(F.element_at("_p", 1), 4).alias("p25"),
            F.round(F.element_at("_p", 2), 4).alias("p50"),
            F.round(F.element_at("_p", 3), 4).alias("p75"),
            F.round(F.element_at("_p", 4), 4).alias("p95"),
        )
    )


SQL_PERCENTILE_PROFILE = """
WITH q AS (
  SELECT source, COUNT(*) AS n_docs,
         quantile_cont(CAST(n_chars AS DOUBLE), [0.25, 0.5, 0.75, 0.95]) AS p
  FROM documents GROUP BY source
)
SELECT source, n_docs,
       ROUND(p[1], 4) AS p25, ROUND(p[2], 4) AS p50,
       ROUND(p[3], 4) AS p75, ROUND(p[4], 4) AS p95
FROM q
"""


def q_running_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic frames (rowsBetween): per-customer running spend and
    3-order moving average. Sums ride DECIMAL so the prefix/frame
    aggregation is order-exact in both engines (DuckDB's windowed SUM
    uses a segment tree — double addition order differs)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last3 = w.rowsBetween(-2, Window.currentRow)
    dec = F.col("o_totalprice").cast("decimal(18,4)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.row_number().over(w).alias("order_seq"),
        F.sum(dec).over(run).cast("double").alias("cum_spend"),
        (F.sum(dec).over(last3).cast("double")
         / F.count(F.lit(1)).over(last3)).alias("ma3"),
    )


SQL_RUNNING_WINDOW = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(ROW_NUMBER() OVER w AS INT) AS order_seq,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            OVER (w ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_spend,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            OVER (w ROWS 2 PRECEDING) AS DOUBLE)
         / COUNT(*) OVER (w ROWS 2 PRECEDING) AS ma3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-robust exact dedup (functions/text.normalize_text):
    lowercase + non-alphanumeric collapse before fingerprinting, catching
    re-punctuated near-copies byte-exact dedup misses. One shuffle on the
    16-byte fingerprint, same as dedup_exact."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions import (
        normalize_text,
    )

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            F.md5(normalize_text(F.col("text"))).alias("fp"),
            "doc_id",
        )
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


SQL_NORMALIZE_DEDUP = r"""
SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-representative selection over duplicate clusters: the
    near-dup components (dedup_components over n-gram Jaccard pairs)
    joined back to the corpus, one representative per cluster by
    (max n_chars, min doc_id) — the keep/drop decision that turns a
    dup graph into a dedup action list. The argmax is a map-side
    combinable max_by, not a window over the full corpus."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        dedup_components,
        ngram_jaccard_pairs,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    comp = dedup_components(ngram_jaccard_pairs(d, threshold=0.5))
    m = comp.join(
        d.select(F.col("doc_id").alias("id"), "n_chars"), on="id", how="inner"
    )
    canon = m.groupBy("component").agg(
        F.max_by(
            "id", F.struct(F.col("n_chars"), (-F.col("id")).alias("neg_id"))
        ).alias("canonical_id")
    )
    return (
        m.join(canon, on="component")
        .select(
            "id",
            "component",
            "canonical_id",
            (F.col("id") == F.col("canonical_id")).alias("is_canonical"),
        )
    )


SQL_DEDUP_CANONICAL = """
WITH RECURSIVE t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE doc_id < 1000
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [] END)) AS shingle
  FROM t
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5
), e AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
), walk AS (
  SELECT s AS id, s AS comp FROM e
  UNION
  SELECT e.s AS id, walk.comp FROM e JOIN walk ON e.d = walk.id
), comp AS (
  SELECT id, MIN(comp) AS component FROM walk GROUP BY id
), m AS (
  SELECT c.id, c.component, d.n_chars
  FROM comp c JOIN documents d ON d.doc_id = c.id
), ranked AS (
  SELECT id, component,
         ROW_NUMBER() OVER (PARTITION BY component
                            ORDER BY n_chars DESC, id ASC) AS rn
  FROM m
), canon AS (
  SELECT component, id AS canonical_id FROM ranked WHERE rn = 1
)
SELECT m.id, m.component, canon.canonical_id,
       m.id = canon.canonical_id AS is_canonical
FROM m JOIN canon ON m.component = canon.component
"""


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe two-phase aggregation (operators/skew.salted_aggregate):
    identical result to a plain groupBy — the oracle IS the unsalted SQL,
    proving the salt is semantics-free. At 100 TB this is the escape
    hatch when one grouping key holds a large share of all rows and AQE
    can't split a single-key reducer."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        salted_aggregate,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("decimal(18,4)").alias("qty"),
        F.col("l_extendedprice").cast("decimal(18,4)").alias("price"),
    )
    out = salted_aggregate(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("qty", "sum"),
            "sum_price": ("price", "sum"),
            "n_rows": ("qty", "count"),
            "max_qty": ("qty", "max"),
        },
        salt=16,
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_price").cast("double").alias("sum_price"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("max_qty").cast("double").alias("max_qty"),
    )


SQL_SALTED_AGG = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_rows,
       CAST(MAX(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS max_qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 symmetric embedding quantization (llm/quantize): 4x narrower
    vectors for the ANN index families, plus the per-vector max
    reconstruction-error audit. Pure per-row HOF projection — zero
    shuffles; rounding pinned to floor(x/scale*127 + 0.5) so both
    engines bit-match."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        quantize_embeddings,
    )

    e = load_table(spark, sf_dir, "embeddings")
    return quantize_embeddings(e)


SQL_QUANTIZE_EMBEDDINGS = """
WITH s AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) AS scale
  FROM embeddings
), q AS (
  SELECT vec_id, scale, embedding,
         list_transform(embedding, x -> CAST(
             CASE WHEN scale = 0 THEN 0
                  ELSE GREATEST(-127.0, LEAST(127.0,
                       FLOOR(CAST(x AS DOUBLE) / scale * 127.0 + 0.5)))
             END AS INT)) AS qvec
  FROM s
)
SELECT vec_id, scale, qvec,
       list_max(list_transform(range(1, len(embedding) + 1),
           i -> abs(CAST(embedding[i] AS DOUBLE)
                    - qvec[i] * scale / 127.0))) AS max_err
FROM q
"""


def q_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram containment pairs (llm/dedup.containment_pairs):
    |A∩B| / min(|A|,|B|) — surfaces subset-duplicates (doc embedded in a
    longer doc) that union-normalized Jaccard under-scores. Same bounded
    shingle self-join plan as ngram_jaccard."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        containment_pairs,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return containment_pairs(d, n=3, threshold=0.8)


SQL_CONTAINMENT_DEDUP = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE doc_id < 1000
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [] END)) AS shingle
  FROM t
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(n_common / CAST(LEAST(sa.n_sh, sb.n_sh) AS DOUBLE), 4) AS containment
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE ROUND(n_common / CAST(LEAST(sa.n_sh, sb.n_sh) AS DOUBLE), 4) >= 0.8
"""


def q_ngram_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional prefix-filtered Jaccard join (llm/dedup.
    ngram_jaccard_pairs_prefix, ppjoin-family pruning): IDENTICAL result
    to ngram_jaccard — same oracle — but candidates join only on each
    document's rarest ``m - ceil(t*m) + 1`` shingles, so the hot
    stopword keys never reach a reducer. This is the 100-TB plan for the
    exact-Jaccard family."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ngram_jaccard_pairs_prefix,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return ngram_jaccard_pairs_prefix(d, n=3, threshold=0.5)


def q_histogram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram per group (corpus length distribution per
    source): a single map-side-combinable groupBy on (source, bucket) —
    the profiling face a 100 TB curation run reports per shard."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.least(F.lit(19), F.floor(F.col("n_chars") / 200.0)).cast("int")
    return (
        d.groupBy("source", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


SQL_HISTOGRAM_PROFILE = """
SELECT source,
       CAST(LEAST(19, FLOOR(n_chars / 200.0)) AS INT) AS bucket,
       COUNT(*) AS n_docs,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars
FROM documents
GROUP BY 1, 2
"""


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-funnel analysis: per user, how many 'view' events converted
    to a 'purchase' within 1 hour. NOT a range self-join (O(views x
    purchases) per user) — one shuffle on user_id and a forward-looking
    min-over-frame window that finds each view's next purchase."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    next_purchase = F.min(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    ).over(w)
    views = e.withColumn("_np", next_purchase).filter(
        F.col("event_type") == "view"
    )
    # microsecond-exact bound: whole-second truncation would admit a
    # view->purchase gap in (3600, 3601) s that the fractional-epoch
    # oracle excludes (same truncation class SQL_TWAP_DAILY avoids).
    # ts is TIMESTAMP_NTZ (nanos parquet); cast to timestamp first.
    micros = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    converted = (
        F.col("_np").isNotNull()
        & (micros(F.col("_np")) - micros(F.col("ts")) <= 3600 * 1_000_000)
    ).cast("int")
    return views.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_views"),
        F.sum(converted).cast("long").alias("n_converted"),
    )


SQL_FUNNEL_CONVERSION = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type
  FROM events WHERE event_type IN ('view', 'purchase')
), f AS (
  SELECT user_id, ts, event_type,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS np
  FROM e
)
SELECT user_id,
       COUNT(*) AS n_views,
       CAST(SUM(CASE WHEN np IS NOT NULL
                      AND epoch_us(np) - epoch_us(ts) <= CAST(3600 AS BIGINT) * 1000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM f
WHERE event_type = 'view'
GROUP BY user_id
"""


def q_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly LOCF gap-fill (operators/resample.resample_locf): each
    user's irregular events regularized onto an hourly grid, last value
    carried forward. Grid generated per key from its own bounds (narrow
    sequence+explode), one shuffle total."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        resample_locf,
    )

    e = load_table(spark, sf_dir, "events")
    return resample_locf(
        e, ["user_id"], "ts", "value", step="1 hour", unit="hour",
        tiebreak="event_id",
    )


SQL_RESAMPLE_LOCF = """
WITH b AS (
  SELECT user_id, date_trunc('hour', MIN(ts)) AS t0,
         date_trunc('hour', MAX(ts)) AS t1
  FROM events GROUP BY user_id
), g AS (
  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS tick
  FROM b
), u AS (
  SELECT user_id, ts AS tick, 0 AS side, value, event_id FROM events
  UNION ALL
  SELECT user_id, tick, 1 AS side, NULL AS value, NULL AS event_id FROM g
), c AS (
  SELECT user_id, tick, side,
         LAST_VALUE(value IGNORE NULLS)
           OVER (PARTITION BY user_id
                 ORDER BY tick, side, event_id NULLS FIRST
                 ROWS UNBOUNDED PRECEDING) AS locf
  FROM u
)
SELECT user_id, tick AS bucket, locf AS locf_value
FROM c WHERE side = 1
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention-cohort triangle: users grouped by first-activity
    week, distinct-user counts per week offset. Two shuffles (first-seen
    agg + cohort rollup), both map-side combinable."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


SQL_RETENTION_COHORTS = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
)
SELECT CAST(f.cohort_week AS DATE) AS cohort_week,
       CAST(date_diff('day', CAST(f.cohort_week AS DATE),
                      CAST(a.week AS DATE)) / 7 AS INT) AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM activity a JOIN firsts f USING (user_id)
GROUP BY 1, 2
"""


def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sparse sign projection (llm/projection):
    64-dim embeddings onto 8 random +/-1 planes, fixed-point bigint sums
    so the result is exact and order-free in any engine. Zero shuffles —
    the matrix is a plan literal."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        random_projection,
    )

    e = load_table(spark, sf_dir, "embeddings")
    return random_projection(e, k=8, dim=64, seed=42)


from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (  # noqa: E402
    projection_sql as _projection_sql,
)

SQL_RANDOM_PROJECTION = _projection_sql(k=8, dim=64, seed=42)


def q_cooccurrence_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram co-occurrence counts (llm/sampling.cooccurrence_counts),
    window 2 — the word2vec/GloVe statistic: narrow per-doc pair
    transforms (one per distance), single map-side-combined aggregation,
    TakeOrdered top-100."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        cooccurrence_counts,
    )

    return cooccurrence_counts(
        load_table(spark, sf_dir, "documents"), window=2, top_k=100
    )


SQL_COOCCURRENCE_TOP = """
WITH d AS (
  SELECT list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tk
  FROM documents
), p AS (
  SELECT tk[i] AS token_a, tk[i + 1] AS token_b, 1 AS dist
  FROM d, unnest(range(1, len(tk))) AS r(i)
  UNION ALL
  SELECT tk[i] AS token_a, tk[i + 2] AS token_b, 2 AS dist
  FROM d, unnest(range(1, len(tk) - 1)) AS r(i)
)
SELECT token_a, token_b, CAST(dist AS INT) AS dist, COUNT(*) AS n
FROM p GROUP BY 1, 2, 3
ORDER BY n DESC, token_a ASC, token_b ASC, dist ASC
LIMIT 100
"""


def q_trending_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly trending items: top-3 event types per hour by count —
    grouped aggregation composed with keep_topk (the windowed-rank face
    a streaming leaderboard materializes per trigger)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        keep_topk,
    )

    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return keep_topk(
        hourly,
        ["hour"],
        [F.col("n_events").desc(), F.col("event_type").asc()],
        k=3,
        rank_col="rnk",
    )


SQL_TRENDING_HOURLY = """
SELECT hour, event_type, n_events, rnk FROM (
  SELECT hour, event_type, n_events,
         CAST(ROW_NUMBER() OVER (PARTITION BY hour
              ORDER BY n_events DESC, event_type ASC) AS INT) AS rnk
  FROM (
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n_events
    FROM events GROUP BY 1, 2
  )
) WHERE rnk <= 3
"""


def q_winsorize_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization: clamp document lengths to each source's
    [p05, p95] — outlier taming before length-weighted sampling. Two
    stages: a tiny per-source percentile aggregate broadcast back over
    the corpus; the corpus itself is touched once, narrow."""
    d = load_table(spark, sf_dir, "documents")
    pct = F.percentile(F.col("n_chars").cast("double"), F.array(F.lit(0.05), F.lit(0.95)))
    stats = d.groupBy("source").agg(
        F.round(F.element_at(pct, 1), 4).alias("p05"),
        F.round(F.element_at(pct, 2), 4).alias("p95"),
    )
    return (
        d.join(F.broadcast(stats), "source")
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.least(
                F.greatest(F.col("n_chars").cast("double"), F.col("p05")),
                F.col("p95"),
            ).alias("clamped"),
        )
    )


SQL_WINSORIZE_LENGTHS = """
WITH stats AS (
  SELECT source,
         ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.05), 4) AS p05,
         ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.95), 4) AS p95
  FROM documents GROUP BY source
)
SELECT d.doc_id, d.source, d.n_chars,
       LEAST(GREATEST(CAST(d.n_chars AS DOUBLE), s.p05), s.p95) AS clamped
FROM documents d JOIN stats s USING (source)
"""


# ------------------------------------------- SQL-surface relational breadth

def _register_tables(spark: SparkSession, sf_dir: str, names: list[str]) -> None:
    for t in names:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def q_tpch_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape through the engine's SQL face: six-way join
    (region→nation→customer/supplier→orders→lineitem) with the
    local-supplier predicate, revenue per nation. Catalyst reorders the
    joins and broadcasts every dim; the DECIMAL sum keeps the revenue
    order-exact."""
    _register_tables(
        spark, sf_dir,
        ["region", "nation", "customer", "supplier", "orders", "lineitem"],
    )
    return spark.sql("""
        SELECT n.n_name,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
                        AND s.s_nationkey = c.c_nationkey
        WHERE r.r_name = 'AMERICA'
        GROUP BY n.n_name
    """)


SQL_TPCH_Q5_SHAPE = """
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'AMERICA'
GROUP BY n.n_name
"""


def q_tpch_q4_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS correlated subquery (TPC-H Q4 shape): orders with at least
    one late-shipping lineitem, counted per priority. Catalyst rewrites
    the EXISTS into a left-semi join — subquery decorrelation through the
    SQL face."""
    _register_tables(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
        )
        GROUP BY o_orderpriority
    """)


SQL_TPCH_Q4_EXISTS = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
)
GROUP BY o_orderpriority
"""


def q_tpch_q17_avg_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar-aggregate subquery (TPC-H Q17 shape): lineitems
    below 40% of their part's average quantity. Decorrelates to an
    aggregate + join; the comparison runs on exact DECIMAL averages so
    the boundary is engine-independent."""
    _register_tables(spark, sf_dir, ["part", "lineitem"])
    return spark.sql("""
        SELECT l.l_partkey,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS below_avg_revenue,
               COUNT(*) AS n_small
        FROM lineitem l
        WHERE CAST(l.l_quantity AS DECIMAL(18,4)) < (
            SELECT CAST(0.4 AS DECIMAL(5,2))
                   * AVG(CAST(l2.l_quantity AS DECIMAL(18,4)))
            FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
        )
        GROUP BY l.l_partkey
    """)


SQL_TPCH_Q17_AVG_SUBQUERY = """
SELECT l.l_partkey,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
         AS below_avg_revenue,
       COUNT(*) AS n_small
FROM lineitem l
WHERE CAST(l.l_quantity AS DECIMAL(18,4)) < (
    SELECT CAST(0.4 AS DECIMAL(5,2))
           * AVG(CAST(l2.l_quantity AS DECIMAL(18,4)))
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
)
GROUP BY l.l_partkey
"""


def q_tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer-join count distribution (TPC-H Q13 shape): orders-per-customer
    histogram including zero-order customers — left outer + two-level
    aggregation."""
    _register_tables(spark, sf_dir, ["customer", "orders"])
    return spark.sql("""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT OUTER JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
    """)


SQL_TPCH_Q13_CUSTDIST = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT OUTER JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
)
GROUP BY c_count
"""


def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt): the inverse of the pivot operator — the
    per-flag aggregate table unpivoted to (flag, metric, value) rows.
    Native UNPIVOT node, no explode-of-struct hand-rolling."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        _dsum(F.col("l_quantity"), "sum_qty"),
        _dsum(F.col("l_extendedprice"), "sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_rows"),
    )
    return wide.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_price", "n_rows"],
        "metric",
        "value",
    )


SQL_UNPIVOT_METRICS = """
WITH wide AS (
  SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
         CAST(COUNT(*) AS DOUBLE) AS n_rows
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, metric, value
FROM wide
UNPIVOT (value FOR metric IN (sum_qty, sum_price, n_rows))
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond the cube/rollup faces): chosen
    subtotal combinations with GROUPING() disambiguation of real nulls
    vs subtotal rows."""
    _register_tables(spark, sf_dir, ["lineitem"])
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
    """)


SQL_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


def q_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: customers with orders in BOTH priority classes
    (INTERSECT) and high-priority-only customers (EXCEPT), one labeled
    union. Spark plans both as hash joins over distinct sets."""
    o = load_table(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    lo = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    both = hi.intersect(lo).withColumn("class", F.lit("both"))
    # subtract = EXCEPT (distinct); exceptAll would leave leftover
    # multiplicities for customers holding more urgent than low orders
    only_hi = hi.subtract(lo).withColumn("class", F.lit("urgent_only"))
    return both.unionByName(only_hi)


SQL_EXCEPT_INTERSECT = """
WITH hi AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
     lo AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
SELECT o_custkey, 'both' AS class
FROM (SELECT o_custkey FROM hi INTERSECT SELECT o_custkey FROM lo)
UNION ALL
SELECT o_custkey, 'urgent_only' AS class
FROM (SELECT DISTINCT o_custkey FROM hi
      EXCEPT SELECT DISTINCT o_custkey FROM lo)
"""


def q_array_agg_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic array aggregation: per-order sorted linenumber list
    plus its max — collect_list is partition-order-dependent, so the
    engine pins sort_array (the order-explicit-dedup discipline applied
    to array building)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_linenumber")).alias("line_numbers"),
        F.max("l_linenumber").alias("max_line"),
    )


SQL_ARRAY_AGG_LINES = """
SELECT l_orderkey,
       list(l_linenumber ORDER BY l_linenumber) AS line_numbers,
       MAX(l_linenumber) AS max_line
FROM lineitem WHERE l_orderkey < 2000
GROUP BY l_orderkey
"""


def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q-gram blocked Levenshtein self-join (operators/fuzzy) over the
    DISTINCT part-name dictionary (min partkey as representative) —
    entity resolution matches name VARIANTS, so the dictionary is the
    right input; joining raw rows would just emit every dup-class
    quadratically (3.9M pairs at sf0.1 from 64 names). Exact result;
    candidates from a trigram equi-join + length prefilter, never the
    n² cross product."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        fuzzy_self_join,
    )

    p = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.min("p_partkey").alias("rep_id"))
    )
    return fuzzy_self_join(p, "rep_id", "p_name", max_dist=1, q=3)


SQL_FUZZY_JOIN = """
WITH d AS (
  SELECT p_name, MIN(p_partkey) AS rep_id FROM part GROUP BY p_name
)
SELECT a.rep_id AS id_a, b.rep_id AS id_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
FROM d a JOIN d b ON a.rep_id < b.rep_id
WHERE levenshtein(a.p_name, b.p_name) <= 1
"""


def q_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price (TWAP) per user per day: each event's
    value holds until the next event or end-of-day, weights are holding
    seconds. One window (lead) + one aggregation; value*weight rides
    DECIMAL so the weighted sum is order-exact. Cross-midnight carry is
    intentionally clipped at the day boundary (documented simplification
    — a LOCF resample would seed the next day)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    day = F.date_trunc("day", F.col("ts"))
    day_end = day + F.expr("interval 1 day")
    nxt = F.lead("ts").over(w)
    hold_until = F.least(F.coalesce(nxt, day_end), day_end)
    # integer MICROsecond weights: whole-second casts truncate and
    # DuckDB's epoch() returns fractional doubles — micros are exact
    # bigints in both engines
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    weighted = e.select(
        "user_id",
        day.cast("date").alias("day"),
        (us(hold_until) - us(F.col("ts"))).alias("w_us"),
        F.col("value"),
    ).filter(F.col("w_us") > 0)
    return weighted.groupBy("user_id", "day").agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)") * F.col("w_us"))
            .cast("double")
            / F.sum("w_us").cast("double"),
            6,
        ).alias("twap"),
        F.sum("w_us").cast("long").alias("covered_us"),
    )


SQL_TWAP_DAILY = """
WITH x AS (
  SELECT user_id,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         epoch_us(LEAST(COALESCE(LEAD(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id),
                                 date_trunc('day', ts) + INTERVAL 1 DAY),
                        date_trunc('day', ts) + INTERVAL 1 DAY))
           - epoch_us(ts) AS w_us,
         value
  FROM events
)
SELECT user_id, day,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4)) * w_us) AS DOUBLE)
             / CAST(SUM(w_us) AS DOUBLE), 6) AS twap,
       CAST(SUM(w_us) AS BIGINT) AS covered_us
FROM x WHERE w_us > 0
GROUP BY user_id, day
"""


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the near-dup pair graph (a<b<c edge-join
    ordering, each triangle counted once) — the density statistic that
    distinguishes tight duplicate cliques from chains before
    canonicalization. The pair list is persisted before the triple
    self-join (same lineage lesson as pagerank's edge list,
    operators/graph.py): unpersisted, the whole shingle->jaccard
    derivation would execute once per join branch."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ngram_jaccard_pairs,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        _with_caches,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    e = ngram_jaccard_pairs(d, threshold=0.5).select("id_a", "id_b").persist()
    e1 = e.toDF("a", "b")
    e2 = e.toDF("b", "c")
    e3 = e.toDF("a", "c")
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    return _with_caches(
        tri.agg(F.count(F.lit(1)).alias("n_triangles")), [e]
    )


SQL_TRIANGLE_COUNT = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE doc_id < 1000
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [] END)) AS shingle
  FROM t
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5
)
SELECT COUNT(*) AS n_triangles
FROM pairs e1
JOIN pairs e2 ON e2.id_a = e1.id_b
JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
"""


def q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group sampling: 2 documents per source by md5
    hash order (keep_topk over the hash) — the per-stratum quota sampler
    that composes with domain_mix's fractional sampler."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        keep_topk,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    return keep_topk(
        d, ["source"], [F.col("h").asc(), F.col("doc_id").asc()], k=2,
        rank_col="rnk",
    ).drop("h")


SQL_GROUP_SAMPLE = """
SELECT doc_id, source, rnk FROM (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY md5(doc_id::VARCHAR) ASC, doc_id ASC) AS INT) AS rnk
  FROM documents
) WHERE rnk <= 2
"""


def q_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-score calibration: percent_rank within each
    source maps raw quality onto [0,1] uniformly — comparable across
    sources with different score distributions (the quantile-normalize
    step before cross-source quality-weighted sampling). Rank arithmetic
    is integer, so the result is engine-exact without rounding."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions import (
        quality_score,
    )
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("quality").asc())
    return (
        d.select("doc_id", "source", quality_score(F.col("text")).alias("quality"))
        .withColumn("calibrated", F.percent_rank().over(w))
    )


SQL_SCORE_CALIBRATION = """
WITH t AS (
  SELECT doc_id, source, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
), m AS (
  SELECT doc_id, source, text, toks,
         CAST(len(toks) AS DOUBLE) AS n,
         CASE WHEN len(toks) > 0
              THEN len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE)
              ELSE 0.0 END AS distinct_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, x -> lower(x) IN
                   ('the','a','of','and','to','in','is','that','it','for')))
                   / CAST(len(toks) AS DOUBLE)
              ELSE 0.0 END AS sw,
         CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) AS punct
  FROM t
), q AS (
  SELECT doc_id, source,
         FLOOR(GREATEST(LEAST(
             0.25 * LEAST(n / 100.0, 1.0)
           + 0.25 * distinct_ratio
           + 0.35 * LEAST(sw * 5, 1.0)
           + 0.15 * (1 - LEAST(CASE WHEN length(text) > 0 THEN punct / length(text) ELSE 1.0 END * 4, 1.0)),
           1.0), 0.0) * 10000) / 10000 AS quality
  FROM m
)
SELECT doc_id, source, quality,
       PERCENT_RANK() OVER (PARTITION BY source ORDER BY quality ASC)
         AS calibrated
FROM q
"""


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 validity intervals (operators/scd.scd2_intervals):
    each user's signup events become [valid_from, valid_to) state rows
    with an open current interval — the warehouse CDC materialization.
    One shuffle, one lead window."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        scd2_intervals,
    )

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "signup"
    ).select("event_id", "user_id", "ts", "value")
    return scd2_intervals(e, ["user_id"], "ts", tiebreak="event_id")


SQL_SCD2_INTERVALS = """
SELECT event_id, user_id, ts, value,
       ts AS valid_from,
       LEAD(ts) OVER w AS valid_to,
       LEAD(ts) OVER w IS NULL AS is_current
FROM events
WHERE event_type = 'signup'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency binning (ntile): per-source document-length
    deciles with bounds and counts — the quantile-bucket profile a
    curation run uses to choose length cutoffs. The window partitions by
    source: a GLOBAL ntile funnels the corpus through one reducer, so at
    scale the global variant is approx-percentile cutpoints + bucketing
    (operators/sketches), never an unpartitioned window."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc()
    )
    return (
        d.select("source", "n_chars", F.ntile(10).over(w).alias("decile"))
        .groupBy("source", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("lo"),
            F.max("n_chars").alias("hi"),
        )
    )


SQL_DECILE_STATS = """
SELECT source, decile, COUNT(*) AS n_docs,
       MIN(n_chars) AS lo, MAX(n_chars) AS hi
FROM (
  SELECT source, n_chars,
         CAST(NTILE(10) OVER (PARTITION BY source
              ORDER BY n_chars ASC, doc_id ASC) AS INT) AS decile
  FROM documents
)
GROUP BY source, decile
"""


def q_balance_resets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional cumulative sum with reset: per-user running spend that
    resets at every signup event — the cumsum-of-reset-flags trick turns
    'reset' into a derived sub-partition, so the whole thing stays two
    window passes over ONE shuffle (no iterative logic)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.sum(
        (F.col("event_type") == "signup").cast("int")
    ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    seg = Window.partitionBy("user_id", "epoch").orderBy("ts", "event_id")
    run = seg.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        e.withColumn("epoch", epoch)
        .select(
            "event_id",
            "user_id",
            "ts",
            "epoch",
            F.sum(F.col("value").cast("decimal(18,4)"))
            .over(run)
            .cast("double")
            .alias("balance"),
        )
    )


SQL_BALANCE_RESETS = """
WITH tagged AS (
  SELECT event_id, user_id, ts, value,
         CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS epoch
  FROM events
)
SELECT event_id, user_id, ts, epoch,
       CAST(SUM(CAST(value AS DECIMAL(18,4)))
            OVER (PARTITION BY user_id, epoch ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS balance
FROM tagged
"""


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank, 3 iterations, over the near-dup pair graph
    (operators/graph.pagerank_fixed): every rank is an integer in 1e-9
    units and every step is floor division + integer sums, so the
    iterative recurrence is BIT-comparable across engines — the
    oracle-checkable face of iterative graph algorithms (components'
    star contraction being the other)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ngram_jaccard_pairs,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        pagerank_fixed,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    pairs = ngram_jaccard_pairs(d, threshold=0.5).select("id_a", "id_b")
    return pagerank_fixed(pairs, iters=3)


_PAIRS_CTE_BODY = """WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE doc_id < 1000
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [] END)) AS shingle
  FROM t
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5"""


def _sql_pagerank() -> str:
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        pagerank_fixed_sql,
    )

    return pagerank_fixed_sql(_PAIRS_CTE_BODY, iters=3)


SQL_PAGERANK = _sql_pagerank()


def q_contingency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency-table profiling (source x lang): observed counts,
    expected-under-independence, and per-cell chi-square contribution.
    Expected values come from integer marginal products, so the doubles
    are exact; only the final contribution is rounded. Per-CELL output
    (no global chi2 sum) keeps everything order-independent."""
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    rows = d.groupBy("source").agg(F.count(F.lit(1)).alias("_row_n"))
    colsm = d.groupBy("lang").agg(F.count(F.lit(1)).alias("_col_n"))
    total = d.agg(F.count(F.lit(1)).alias("_total"))
    j = (
        cells.join(F.broadcast(rows), "source")
        .join(F.broadcast(colsm), "lang")
        .crossJoin(F.broadcast(total))
    )
    expected = (F.col("_row_n") * F.col("_col_n")).cast("double") / F.col("_total")
    contrib = (F.col("n") - expected) * (F.col("n") - expected) / expected
    return j.select(
        "source",
        "lang",
        "n",
        F.round(expected, 4).alias("expected"),
        F.round(contrib, 4).alias("chi2_contrib"),
    )


SQL_CONTINGENCY_PROFILE = """
WITH cells AS (
  SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2
), r AS (SELECT source, COUNT(*) AS row_n FROM documents GROUP BY 1),
   c AS (SELECT lang, COUNT(*) AS col_n FROM documents GROUP BY 1),
   t AS (SELECT COUNT(*) AS total FROM documents)
SELECT cells.source, cells.lang, cells.n,
       ROUND(CAST(r.row_n * c.col_n AS DOUBLE) / t.total, 4) AS expected,
       ROUND((cells.n - CAST(r.row_n * c.col_n AS DOUBLE) / t.total)
             * (cells.n - CAST(r.row_n * c.col_n AS DOUBLE) / t.total)
             / (CAST(r.row_n * c.col_n AS DOUBLE) / t.total), 4)
         AS chi2_contrib
FROM cells JOIN r USING (source) JOIN c USING (lang), t
"""


def q_correlation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per group in EXACT arithmetic: value has two
    decimals (x100 -> bigint) and hour-of-day is a small int, so every
    sufficient statistic (S_x, S_y, S_xx, S_yy, S_xy) is an exact
    integer sum; only the final r assembles doubles from exact ints —
    order-independent where a naive corr() aggregation is not. Per
    event_type: does spend correlate with time of day."""
    e = load_table(spark, sf_dir, "events")
    v = F.round(F.col("value") * 100, 0).cast("long")
    h = F.hour(F.col("ts")).cast("long")
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("sx"),
        F.sum(h).alias("sy"),
        F.sum(v * v).alias("sxx"),
        F.sum(h * h).alias("syy"),
        F.sum(v * h).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return stats.select(
        "event_type",
        "n",
        F.round(num / den, 6).alias("pearson_r"),
    )


SQL_CORRELATION_PROFILE = """
WITH s AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sx,
         CAST(SUM(CAST(hour(ts) AS BIGINT)) AS BIGINT) AS sy,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)
                  * CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sxx,
         CAST(SUM(CAST(hour(ts) AS BIGINT) * CAST(hour(ts) AS BIGINT))
              AS BIGINT) AS syy,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)
                  * CAST(hour(ts) AS BIGINT)) AS BIGINT) AS sxy
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS pearson_r
FROM s
"""


def q_weighted_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size-k weighted sampling (llm/sampling.weighted_sample_k,
    Efraimidis-Spirakis exponential keys): 100 documents drawn without
    replacement with probability proportional to quality — guarantees
    the sample size that Bernoulli quality_weighted_sample only hits in
    expectation. TakeOrderedAndProject; the ln key is fixed-point at
    birth."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions import (
        quality_score,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        weighted_sample_k,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    w = quality_score(F.col("text")) + F.lit(0.01)
    return weighted_sample_k(d, w, k=100).select("doc_id", "source", "logkey_fp")


SQL_WEIGHTED_SAMPLE_K = f"""
WITH t AS (
  SELECT doc_id, source, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
), m AS (
  SELECT doc_id, source, text, toks,
         CAST(len(toks) AS DOUBLE) AS n,
         CASE WHEN len(toks) > 0
              THEN len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE)
              ELSE 0.0 END AS distinct_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, x -> lower(x) IN
                   ('the','a','of','and','to','in','is','that','it','for')))
                   / CAST(len(toks) AS DOUBLE)
              ELSE 0.0 END AS sw,
         CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE) AS punct
  FROM t
), q AS (
  SELECT doc_id, source,
         FLOOR(GREATEST(LEAST(
             0.25 * LEAST(n / 100.0, 1.0)
           + 0.25 * distinct_ratio
           + 0.35 * LEAST(sw * 5, 1.0)
           + 0.15 * (1 - LEAST(CASE WHEN length(text) > 0 THEN punct / length(text) ELSE 1.0 END * 4, 1.0)),
           1.0), 0.0) * 10000) / 10000 + 0.01 AS w
  FROM m
), hx AS (
  SELECT doc_id, source, w, md5(doc_id::VARCHAR) AS h FROM q
), b AS (
  SELECT doc_id, source, w,
         ({_NIBFOLD_SPLIT} % 10000 + 1) / 10001.0 AS u
  FROM hx
)
SELECT doc_id, source,
       CAST(FLOOR(ln(u) / w * 1000000) AS BIGINT) AS logkey_fp
FROM b
ORDER BY logkey_fp DESC, doc_id ASC
LIMIT 100
"""


# ------------------------------------------------------------------ registry

_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    # Order note: the driver's CORRECTNESS gate samples the first 50 entries of
    # this insertion-ordered dict. Rotated in round 6 so the 55 queries that only
    # had local-oracle proofs in r05 come first and get driver-certified; the 50
    # entries below them already carry green rows in CORRECTNESS_r05.json.
    "ngram_jaccard_stoplist": (q_ngram_jaccard_stoplist, SQL_NGRAM_JACCARD_STOPLIST),
    "dedup_components": (q_dedup_components, SQL_DEDUP_COMPONENTS),
    "embedding_dups": (q_embedding_dups, SQL_EMBEDDING_DUPS),
    "embedding_dups_exact": (q_embedding_dups_exact, SQL_EMBEDDING_DUPS_EXACT),
    "minhash_lsh": (q_minhash_lsh, SQL_MINHASH_LSH),
    "minhash_lsh_md5": (q_minhash_lsh_md5, SQL_MINHASH_LSH_MD5),
    "simhash_pairs": (q_simhash, SQL_SIMHASH_PAIRS),
    "ann_lsh": (q_ann_lsh, SQL_ANN_LSH),
    "ann_ivf": (q_ann_ivf, SQL_ANN_IVF),
    "ann_ivf_trained": (q_ann_ivf_trained, SQL_ANN_IVF_TRAINED),
    "session_windows": (q_session_windows, SQL_SESSION_WINDOWS),
    "topk_revenue": (q_topk_revenue, SQL_TOPK_REVENUE),
    "cube_agg": (q_cube_agg, SQL_CUBE_AGG),
    "json_extract": (q_json_extract, SQL_JSON_EXTRACT),
    "sliding_windows": (q_sliding_windows, SQL_SLIDING_WINDOWS),
    "distinct_agg": (q_distinct_agg, SQL_DISTINCT_AGG),
    "rollup_agg": (q_rollup_agg, SQL_ROLLUP_AGG),
    "asof_enrich": (q_asof_enrich, SQL_ASOF_ENRICH),
    "topk_per_group": (q_topk_per_group, SQL_TOPK_PER_GROUP),
    "percentile_profile": (q_percentile_profile, SQL_PERCENTILE_PROFILE),
    "running_window": (q_running_window, SQL_RUNNING_WINDOW),
    "normalize_dedup": (q_normalize_dedup, SQL_NORMALIZE_DEDUP),
    "dedup_canonical": (q_dedup_canonical, SQL_DEDUP_CANONICAL),
    "salted_agg": (q_salted_agg, SQL_SALTED_AGG),
    "quantize_embeddings": (q_quantize_embeddings, SQL_QUANTIZE_EMBEDDINGS),
    "containment_dedup": (q_containment_dedup, SQL_CONTAINMENT_DEDUP),
    "ngram_jaccard_prefix": (q_ngram_jaccard_prefix, SQL_NGRAM_JACCARD),
    "histogram_profile": (q_histogram_profile, SQL_HISTOGRAM_PROFILE),
    "funnel_conversion": (q_funnel_conversion, SQL_FUNNEL_CONVERSION),
    "resample_locf": (q_resample_locf, SQL_RESAMPLE_LOCF),
    "retention_cohorts": (q_retention_cohorts, SQL_RETENTION_COHORTS),
    "random_projection": (q_random_projection, SQL_RANDOM_PROJECTION),
    "cooccurrence_top": (q_cooccurrence_top, SQL_COOCCURRENCE_TOP),
    "trending_hourly": (q_trending_hourly, SQL_TRENDING_HOURLY),
    "winsorize_lengths": (q_winsorize_lengths, SQL_WINSORIZE_LENGTHS),
    "tpch_q5_shape": (q_tpch_q5_shape, SQL_TPCH_Q5_SHAPE),
    "tpch_q4_exists": (q_tpch_q4_exists, SQL_TPCH_Q4_EXISTS),
    "tpch_q17_avg_subquery": (q_tpch_q17_avg_subquery, SQL_TPCH_Q17_AVG_SUBQUERY),
    "tpch_q13_custdist": (q_tpch_q13_custdist, SQL_TPCH_Q13_CUSTDIST),
    "unpivot_metrics": (q_unpivot_metrics, SQL_UNPIVOT_METRICS),
    "grouping_sets": (q_grouping_sets, SQL_GROUPING_SETS),
    "except_intersect": (q_except_intersect, SQL_EXCEPT_INTERSECT),
    "array_agg_lines": (q_array_agg_lines, SQL_ARRAY_AGG_LINES),
    "fuzzy_join": (q_fuzzy_join, SQL_FUZZY_JOIN),
    "twap_daily": (q_twap_daily, SQL_TWAP_DAILY),
    "triangle_count": (q_triangle_count, SQL_TRIANGLE_COUNT),
    "group_sample": (q_group_sample, SQL_GROUP_SAMPLE),
    "score_calibration": (q_score_calibration, SQL_SCORE_CALIBRATION),
    "scd2_intervals": (q_scd2_intervals, SQL_SCD2_INTERVALS),
    "decile_stats": (q_decile_stats, SQL_DECILE_STATS),
    "balance_resets": (q_balance_resets, SQL_BALANCE_RESETS),
    "pagerank": (q_pagerank, SQL_PAGERANK),
    "contingency_profile": (q_contingency_profile, SQL_CONTINGENCY_PROFILE),
    "correlation_profile": (q_correlation_profile, SQL_CORRELATION_PROFILE),
    "weighted_sample_k": (q_weighted_sample_k, SQL_WEIGHTED_SAMPLE_K),
    "tpch_q1_agg": (q_tpch_q1, SQL_TPCH_Q1),
    "value_counts": (q_value_counts, SQL_VALUE_COUNTS),
    "distinct_rows": (q_distinct_rows, SQL_DISTINCT_ROWS),
    "dup_detection": (q_dup_detection, SQL_DUP_DETECTION),
    "join_dims_broadcast": (q_join_dims, SQL_JOIN_DIMS),
    "left_join_counts": (q_left_join_counts, SQL_LEFT_JOIN_COUNTS),
    "semi_join": (q_semi_join, SQL_SEMI_JOIN),
    "anti_join": (q_anti_join, SQL_ANTI_JOIN),
    "reconcile_counts": (q_reconcile_counts, SQL_RECONCILE_COUNTS),
    "interval_join": (q_interval_join, SQL_INTERVAL_JOIN),
    "top1_per_group": (q_top1_per_group, SQL_TOP1_PER_GROUP),
    "dedup_preference": (q_dedup_preference, SQL_DEDUP_PREFERENCE),
    "pair_rows": (q_pair_rows, SQL_PAIR_ROWS),
    "pivot_matrix": (q_pivot_matrix, SQL_PIVOT_MATRIX),
    "union_concat": (q_union_concat, SQL_UNION_CONCAT),
    "cnv_matrix": (q_cnv_matrix, SQL_CNV_MATRIX),
    "dataset_split": (q_dataset_split, SQL_DATASET_SPLIT),
    "hash_sample": (q_hash_sample, SQL_HASH_SAMPLE),
    "domain_mix": (q_domain_mix, SQL_DOMAIN_MIX),
    "chunk_documents": (q_chunk_documents, SQL_CHUNK_DOCUMENTS),
    "token_counts": (q_token_counts, SQL_TOKEN_COUNTS),
    "pii_redact": (q_pii_redact, SQL_PII_REDACT),
    "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "encode_tokens": (q_encode_tokens, SQL_ENCODE_TOKENS),
    "bm25_search": (q_bm25_search, SQL_BM25_SEARCH),
    "quality_lm": (q_quality_lm, SQL_QUALITY_LM),
    "gopher_quality": (q_gopher_quality, SQL_GOPHER_QUALITY),
    "kmeans_clusters": (q_kmeans_clusters, SQL_KMEANS_CLUSTERS),
    "incremental_dedup": (q_incremental_dedup, SQL_INCREMENTAL_DEDUP),
    "semantic_dedup": (q_semantic_dedup, SQL_SEMANTIC_DEDUP),
    "bigram_top": (q_bigram_top, SQL_BIGRAM_TOP),
    "curation_pipeline": (q_curation_pipeline, SQL_CURATION_PIPELINE),
    "corpus_report": (q_corpus_report, SQL_CORPUS_REPORT),
    "tfidf_features": (q_tfidf_features, SQL_TFIDF_FEATURES),
    "quality_weighted_sample": (q_quality_weighted_sample, SQL_QUALITY_WEIGHTED_SAMPLE),
    "vocab_build": (q_vocab_build, SQL_VOCAB_BUILD),
    "sequence_pack": (q_sequence_pack, SQL_SEQUENCE_PACK),
    "repetition_profile": (q_repetition_profile, SQL_REPETITION_PROFILE),
    "llm_corpus_pipeline": (q_llm_corpus_pipeline, SQL_LLM_CORPUS_PIPELINE),
    "scalar_gistic": (q_scalar_gistic, SQL_SCALAR_GISTIC),
    "regex_extract": (q_regex_extract, SQL_REGEX_EXTRACT),
    "explode_tokens": (q_explode_tokens, SQL_EXPLODE_TOKENS),
    "text_profile": (q_text_profile, SQL_TEXT_PROFILE),
    "events_hourly": (q_events_hourly, SQL_EVENTS_HOURLY),
    "cosine_topk": (q_cosine_topk, SQL_COSINE_TOPK),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "doc_quality": (q_doc_quality, SQL_DOC_QUALITY),
    "rolling_fingerprint": (q_rolling_fingerprint, SQL_ROLLING_FINGERPRINT),
    "token_frequency": (q_token_frequency, SQL_TOKEN_FREQUENCY),
    "ngram_jaccard": (q_ngram_jaccard, SQL_NGRAM_JACCARD),
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_tpch_q1(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}
