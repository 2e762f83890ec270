"""Core relational operators: counts, distinct, joins (broadcast/semi/anti/full), dedup, pivot, windows.

Each q_* returns a DataFrame; each SQL_* is its DuckDB oracle
(value-exact at any SF). Split out of __spark_entry__.py (round 6)."""

from ._common import *  # noqa: F401,F403
from ._common import (  # noqa: F401
    _BM25_K1P1,
    _BM25_TERMS,
    _DUCK_NIBFOLD,
    _NIBFOLD_SPLIT,
    _PAIRS_CTE_BODY,
    _dsum,
    _duck_bucket_expr,
    _duck_plane_lit,
    _duck_shingle_cte,
    _ivf_centroid_ids,
    _projection_sql,
    _register_tables,
    _sql_ann_ivf,
    _sql_ann_ivf_trained,
    _sql_ann_lsh,
    _sql_bm25,
    _sql_embedding_dups_lsh,
    _sql_ivf_body,
    _sql_kmeans_clusters,
    _sql_minhash_universal,
    _sql_pagerank,
    _sql_semantic_dedup,
    _sql_simhash_md5,
)


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


def q_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sort_values().drop_duplicates(keep='first') (cnv.py:372) == window
    top-1: first line of each order by (shipdate, linenumber, partkey).
    partkey is in the key to make the ordering TOTAL over the projected
    columns: the shared testdata has duplicate (orderkey, linenumber)
    pairs at sf0.1, and a non-total sort key makes top-1 engine-
    nondeterministic — found by the round-9 sf0.1 parity sweep, invisible
    at the sf0.01 gate scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return keep_first(
        li,
        ["l_orderkey"],
        [
            F.col("l_shipdate").asc(),
            F.col("l_linenumber").asc(),
            F.col("l_partkey").asc(),
        ],
    ).select("l_orderkey", "l_partkey", "l_linenumber", "l_shipdate")


SQL_TOP1_PER_GROUP = """
SELECT l_orderkey, l_partkey, l_linenumber, l_shipdate
FROM lineitem
QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey
                           ORDER BY l_shipdate, l_linenumber, l_partkey) = 1
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


def q_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov drift check
    (operators/stats.ks_drift): URGENT vs LOW order totalprice
    distributions. The engine runs a DISTRIBUTED two-phase prefix sum
    (sketch-bucketed, bucket-local windows — no global sort); the oracle
    is the naive single-window cumsum. The ECDF difference is the exact
    integer cross product |c_a*n_b - c_b*n_a| (DECIMAL-routed), so both
    plans agree bit-for-bit even though their physical shapes differ
    completely — the point of the query."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        ks_drift,
    )

    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_totalprice")
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_totalprice")
    return ks_drift(a, b, "o_totalprice")


SQL_DISTRIBUTION_DRIFT = """
WITH t AS (
  SELECT o_totalprice AS val,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ga
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    AND o_totalprice IS NOT NULL
), v AS (
  SELECT val, CAST(SUM(ga) AS BIGINT) AS ca,
         CAST(SUM(1 - ga) AS BIGINT) AS cb
  FROM t GROUP BY val
), c AS (
  SELECT SUM(ca) OVER (ORDER BY val) AS c1,
         SUM(cb) OVER (ORDER BY val) AS c2
  FROM v
), tot AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b
  FROM v
)
SELECT tot.n_a, tot.n_b,
       CAST(MAX(ABS(CAST(c1 AS HUGEINT) * tot.n_b
                    - CAST(c2 AS HUGEINT) * tot.n_a)) AS BIGINT) AS d_cross,
       CAST((CAST(MAX(ABS(CAST(c1 AS HUGEINT) * tot.n_b
                          - CAST(c2 AS HUGEINT) * tot.n_a)) AS HUGEINT)
             * 1000000) // (CAST(tot.n_a AS HUGEINT) * tot.n_b)
            AS BIGINT) AS d_fp
FROM c, tot
GROUP BY tot.n_a, tot.n_b
"""


def q_skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join certified against plain-join semantics
    (operators/skew.salted_join): lineitem joined to the nation dim
    through supplier with the big side salted 8 ways and the small side
    replicated — the hot-key mitigation AQE can't always reach. The
    oracle is the PLAIN join: salting must be a physical rewrite only,
    never visible in the result."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.skew import (
        salted_join,
    )

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dim = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        F.col("s_suppkey").alias("l_suppkey"), "n_name"
    )
    joined = salted_join(li, dim, on=["l_suppkey"])
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_qty"),
    )


SQL_SKEW_JOIN_SALTED = """
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY n.n_name
"""


def q_delta_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh
    (operators/incremental.merge_partial_aggs): mergeable partial state
    (count/sum/min/max — never avg) over the cold orders partition
    (o_orderdate < 1995-01-01), then the 1995+ delta folded in with
    delta-sized work. The oracle is the FULL recompute over all orders —
    the fold algebra must be invisible in the result. Sums ride
    DECIMAL(18,4) so the two-step fold is order-free."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.incremental import (
        merge_partial_aggs,
        partial_agg_state,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(18,4)").alias("price"),
    )
    cutoff = F.lit("1995-01-01").cast("date")
    aggs = {
        "n_orders": ("price", "count"),
        "sum_total": ("price", "sum"),
        "min_total": ("price", "min"),
        "max_total": ("price", "max"),
    }
    base = partial_agg_state(
        o.filter(F.col("o_orderdate") < cutoff), ["o_orderpriority"], aggs
    )
    merged = merge_partial_aggs(
        base, o.filter(F.col("o_orderdate") >= cutoff), ["o_orderpriority"], aggs
    )
    return merged.select(
        "o_orderpriority",
        "n_orders",
        F.col("sum_total").cast("double").alias("sum_total"),
        F.col("min_total").cast("double").alias("min_total"),
        F.col("max_total").cast("double").alias("max_total"),
    )


SQL_DELTA_AGG_MAINTENANCE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_total,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS min_total,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS max_total
FROM orders
GROUP BY o_orderpriority
"""


def q_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT order-statistic quantiles of o_totalprice WITHOUT a global
    sort (operators/stats.exact_quantiles): one histogram scan locates
    each rank's bucket, one filtered scan + per-bucket window resolves
    the exact value — distributed selection, rank = ceil(p*n), DuckDB
    quantile_disc semantics. The oracle states the ground truth as the
    naive ROW_NUMBER query; the engine must agree bit-for-bit while
    never sorting more than one bucket's value-grid."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        exact_quantiles,
    )

    o = load_table(spark, sf_dir, "orders")
    # validate=True (r16): the adversarial-parity sweep fed a half-cent
    # price and the face silently QUANTIZED it onto the cents lattice
    # while the ROW_NUMBER oracle returned the raw value — the exact
    # failure mode the lattice guard exists for (r8 verdict task 7). The
    # grouped sibling already carried the flag; now both fail fast on
    # off-lattice data instead of disagreeing with their ground truth.
    return exact_quantiles(
        o, "o_totalprice", [0.25, 0.5, 0.75, 0.9, 0.99], validate=True
    )


SQL_EXACT_QUANTILES = """
WITH s AS (
  SELECT o_totalprice AS v FROM orders
), r AS (
  SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM s
), n AS (
  SELECT COUNT(*) AS c FROM s
), t AS (
  SELECT CAST(p AS DOUBLE) AS p,
         CAST(CEIL(p * n.c) AS BIGINT) AS rank
  FROM (VALUES (0.25), (0.5), (0.75), (0.9), (0.99)) AS ps(p), n
)
SELECT t.p, CAST(r.v AS DOUBLE) AS value, t.rank
FROM t JOIN r ON r.rn = t.rank
ORDER BY t.p
"""


def q_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group quantiles of l_extendedprice per l_returnflag
    (operators/stats.grouped_quantiles) — the distributed exact
    equivalent of the reference's pandas ``groupby().quantile()``
    cohort profiling, at rank = ceil(p*n) (quantile_disc) semantics.

    Unlike the global exact_quantiles face there is NO driver collect
    anywhere: one (key, value) count shuffle, one window over the
    per-group distinct-value lattice, integer basis-point rank math.
    The oracle replays the identical lattice construction in DuckDB.

    ``validate=True`` runs the fixed-point contract guard
    (operators/lattice): TPC-H prices are cents-aligned so the guard
    passes; continuous data would fail fast here instead of returning
    silently-quantized ranks (r8 verdict task 7)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        grouped_quantiles,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return grouped_quantiles(
        li,
        "l_returnflag",
        "l_extendedprice",
        [0.25, 0.5, 0.75, 0.95],
        validate=True,
    )


SQL_GROUPED_QUANTILES = """
WITH vals AS (
  SELECT l_returnflag AS k,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS _v
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL
), counts AS (
  SELECT k, _v, COUNT(*) AS c FROM vals GROUP BY k, _v
), cum AS (
  SELECT k, _v, c,
         SUM(c) OVER (PARTITION BY k ORDER BY _v) AS cum,
         SUM(c) OVER (PARTITION BY k) AS n
  FROM counts
), probed AS (
  SELECT k, _v, c, cum, n, p_bp,
         (p_bp * n + 9999) // 10000 AS rank
  FROM cum
  CROSS JOIN (VALUES (2500), (5000), (7500), (9500)) AS ps(p_bp)
)
SELECT k AS l_returnflag,
       CAST(p_bp AS DOUBLE) / 10000.0 AS p,
       CAST(_v AS DOUBLE) / 100.0 AS value,
       CAST(rank AS BIGINT) AS rank,
       CAST(n AS BIGINT) AS n
FROM probed
WHERE cum >= rank AND cum - c < rank
"""


def q_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Gini–Simpson diversity of the documents source mix
    (operators/stats.simpson_diversity): corpus-health profiling with an
    EXACT rational core — the only float operations are one
    correctly-rounded cast+divide on exact integers, so the oracle
    agrees bit-for-bit with no tolerance anywhere."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        simpson_diversity,
    )

    docs = load_table(spark, sf_dir, "documents")
    return simpson_diversity(docs, "lang", "source")


SQL_SOURCE_DIVERSITY = """
WITH counts AS (
  SELECT lang, source, COUNT(*) AS c
  FROM documents GROUP BY lang, source
), per_key AS (
  SELECT lang,
         SUM(c) AS n,
         COUNT(*) AS n_cats,
         SUM(CAST(c AS HUGEINT) * (c - 1)) AS num
  FROM counts GROUP BY lang
)
SELECT lang,
       CAST(n AS BIGINT) AS n_rows,
       CAST(n_cats AS BIGINT) AS n_cats,
       CASE WHEN n > 1
            THEN 1.0 - CAST(num AS DOUBLE)
                       / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)
       END AS diversity
FROM per_key
"""


def q_drift_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment exact KS drift (operators/stats.ks_drift_by_key):
    o_totalprice distribution of even- vs odd-keyed orders, one exact
    KS row per o_orderpriority. The deterministic even/odd split plays
    the role of this-refresh vs last-refresh; the oracle replays the
    identical lattice + cross-multiplication in DuckDB HUGEINT."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        ks_drift_by_key,
    )

    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.expr("o_orderkey % 2 = 0"))
    b = o.filter(F.expr("o_orderkey % 2 = 1"))
    return ks_drift_by_key(a, b, "o_orderpriority", "o_totalprice")


SQL_DRIFT_BY_SEGMENT = """
WITH tagged AS (
  SELECT o_orderpriority AS k, o_totalprice AS val,
         CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS ga
  FROM orders
  WHERE o_totalprice IS NOT NULL
), vals AS (
  SELECT k, val, SUM(ga) AS ca, SUM(1 - ga) AS cb
  FROM tagged GROUP BY k, val
), cum AS (
  SELECT k,
         SUM(ca) OVER (PARTITION BY k ORDER BY val) AS c1,
         SUM(cb) OVER (PARTITION BY k ORDER BY val) AS c2,
         SUM(ca) OVER (PARTITION BY k) AS n_a,
         SUM(cb) OVER (PARTITION BY k) AS n_b
  FROM vals
), agg AS (
  SELECT k,
         MAX(n_a) AS n_a,
         MAX(n_b) AS n_b,
         MAX(ABS(CAST(c1 AS HUGEINT) * n_b - CAST(c2 AS HUGEINT) * n_a))
           AS d_cross
  FROM cum GROUP BY k
  HAVING MAX(n_a) > 0 AND MAX(n_b) > 0
)
SELECT k AS o_orderpriority,
       CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       CAST(d_cross AS BIGINT) AS d_cross,
       CAST((CAST(d_cross AS HUGEINT) * 1000000)
            // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS d_fp
FROM agg
"""


def q_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted exact quantiles: the l_extendedprice at the median (and
    p90) UNIT per l_returnflag — rank walks total l_quantity, not row
    count (operators/stats.grouped_quantiles with weight_col). Same
    lattice plan as grouped_quantiles; the count just becomes a
    weight-sum, which the oracle replays exactly."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        grouped_quantiles,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return grouped_quantiles(
        li, "l_returnflag", "l_extendedprice", [0.5, 0.9],
        weight_col="l_quantity",
    )


SQL_WEIGHTED_QUANTILES = """
WITH vals AS (
  SELECT l_returnflag AS k,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS _v,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
), counts AS (
  SELECT k, _v, SUM(w) AS c FROM vals GROUP BY k, _v
), cum AS (
  SELECT k, _v, c,
         SUM(c) OVER (PARTITION BY k ORDER BY _v) AS cum,
         SUM(c) OVER (PARTITION BY k) AS n
  FROM counts
), probed AS (
  SELECT k, _v, c, cum, n, p_bp,
         (p_bp * n + 9999) // 10000 AS rank
  FROM cum
  CROSS JOIN (VALUES (5000), (9000)) AS ps(p_bp)
)
SELECT k AS l_returnflag,
       CAST(p_bp AS DOUBLE) / 10000.0 AS p,
       CAST(_v AS DOUBLE) / 100.0 AS value,
       CAST(rank AS BIGINT) AS rank,
       CAST(n AS BIGINT) AS n
FROM probed
WHERE cum >= rank AND cum - c < rank
"""
