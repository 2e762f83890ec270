"""TPC-H-shaped SQL-face queries: aggregates, subquery decorrelation, cubes/rollups/grouping sets, set ops.

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
HAVING COUNT(*) > 0  -- empty-input pin, see SQL_ROLLUP_AGG
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
-- HAVING COUNT(*) > 0 is a NO-OP on any non-empty input (every grouping
-- set's row aggregates >= 1 source row) and exists only to pin the
-- empty-input convention to Spark's: Spark emits NO grand-total row over
-- zero rows, DuckDB/ANSI emit one (r16 adversarial dims sweep).
HAVING COUNT(*) > 0
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
HAVING COUNT(*) > 0  -- empty-input pin, see SQL_ROLLUP_AGG
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
    to array building). The face serializes the array to a CSV string —
    the driver canonicalizer cannot sort array cells (same class of
    failure as quantize_embeddings in CORRECTNESS_r06)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.sort_array(F.collect_list("l_linenumber")).cast("array<string>"), ","
        ).alias("line_numbers_csv"),
        F.max("l_linenumber").alias("max_line"),
    )


SQL_ARRAY_AGG_LINES = """
SELECT l_orderkey,
       array_to_string(list(CAST(l_linenumber AS VARCHAR)
                            ORDER BY l_linenumber), ',') AS line_numbers_csv,
       MAX(l_linenumber) AS max_line
FROM lineitem WHERE l_orderkey < 2000
GROUP BY l_orderkey
"""


def q_tpch_q11_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (group share vs a global scalar): nations whose
    order revenue exceeds the all-nation average. The share predicate is
    CROSS-MULTIPLIED onto the integer lattice (rev_fp * n_nations >
    total_fp, DECIMAL(38,0) sums of order cents) so the boundary is
    exact in both engines — comparing against a float average would let
    a last-ulp disagreement flip boundary nations. Plan: one keyed agg,
    one single-row broadcast (the scalar subquery), no second scan."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_name")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100)
        .cast("decimal(38,0)")
        .alias("_fp"),
    )
    per_nat = (
        o.join(cust, o["o_custkey"] == cust["c_custkey"])
        .groupBy("c_nationkey")
        .agg(F.sum("_fp").alias("rev_fp"))
    )
    tot = per_nat.agg(
        F.sum("rev_fp").alias("_total"),
        F.count(F.lit(1)).alias("_n"),
    )
    return (
        per_nat.crossJoin(F.broadcast(tot))
        .filter(F.col("rev_fp") * F.col("_n") > F.col("_total"))
        .join(F.broadcast(nat), per_nat["c_nationkey"] == nat["n_nationkey"])
        .select(
            "n_name", F.col("rev_fp").cast("bigint").alias("rev_cents")
        )
    )


SQL_TPCH_Q11_SHARE = """
WITH per AS (
  SELECT c_nationkey, SUM(CAST(round(o_totalprice * 100) AS HUGEINT)) AS rev_fp
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey
), tot AS (
  SELECT SUM(rev_fp) AS total, COUNT(*) AS n FROM per
)
SELECT n_name, CAST(rev_fp AS BIGINT) AS rev_cents
FROM per
CROSS JOIN tot
JOIN nation ON n_nationkey = c_nationkey
WHERE rev_fp * n > total
"""


def q_tpch_q15_maxview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier over a revenue view): per-supplier
    Q1-1996 revenue on the EXACT integer lattice (cents x discount
    basis: round(price*100) * (100 - round(discount*100)), DECIMAL-
    routed), then the supplier(s) achieving the scalar MAX — exact
    integer equality, so ties and the winner are engine-independent
    where a float MAX comparison would not be. Plan: one keyed agg, one
    single-row broadcast, broadcast supplier dim."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .select(
            "l_suppkey",
            (
                F.round(F.col("l_extendedprice") * 100).cast("decimal(38,0)")
                * (100 - F.round(F.col("l_discount") * 100)).cast(
                    "decimal(38,0)"
                )
            ).alias("_fp"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("_fp").alias("total_fp"))
    )
    mx = rev.agg(F.max("total_fp").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_fp") == F.col("_mx"))
        .join(F.broadcast(sup), rev["l_suppkey"] == sup["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_fp").cast("bigint").alias("revenue_fp"),
        )
    )


SQL_TPCH_Q15_MAXVIEW = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(round(l_extendedprice * 100) AS HUGEINT)
             * CAST(100 - round(l_discount * 100) AS HUGEINT)) AS total_fp
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_fp AS BIGINT) AS revenue_fp
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_fp = (SELECT MAX(total_fp) FROM rev)
"""


def q_tpch_q21_sole_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (correlated EXISTS + NOT EXISTS): suppliers that
    are the SOLE returning ('R') supplier on orders that involve at
    least one other supplier — the waiting-supplier query reshaped onto
    this dataset's columns (the shared testdata carries no
    commit/receipt dates; reference Q21 semantics otherwise intact).

    Plan shape (r9 verdict task 3): the textbook semi/anti self-join
    plan scanned lineitem THREE times (probe: scripts/scale_round10.py
    q21) — Catalyst even pulls the candidate distinct above the joins,
    so no exchange is reusable. Both correlated quantifiers instead
    collapse into per-order COUNTS over one (orderkey, suppkey, is_r)
    aggregate: EXISTS(other supplier) == n_sup > 1, NOT EXISTS(other R
    supplier) == n_r = 1, and the sole R supplier is recoverable as
    max(suppkey where is_r) exactly when n_r = 1. ONE fact-table scan,
    two map-side-combinable exchanges (ok,sk then ok), no broadcast of
    any fact-table derivative — the 100 TB shape. The semi/anti plan
    form itself stays certified by tpch_q4_exists / anti_join; the
    oracle here KEEPS the correlated EXISTS/NOT-EXISTS form, so
    agreement certifies the rewrite, not just the arithmetic.
    Plan contract pinned by test_partitioning
    (test_q21_single_fact_scan)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    pairs = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("is_r")
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_sup"),
        F.sum("is_r").alias("n_r"),
        F.max(F.when(F.col("is_r") == 1, F.col("l_suppkey"))).alias(
            "l_suppkey"
        ),
    )
    sole = per_order.filter((F.col("n_sup") > 1) & (F.col("n_r") == 1))
    return (
        sole.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
    )


SQL_TPCH_Q21_SOLE_RETURNS = """
WITH r1 AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
), cand AS (
  SELECT r1.l_orderkey, r1.l_suppkey FROM r1
  WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = r1.l_orderkey AND l2.l_suppkey <> r1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = r1.l_orderkey AND l3.l_suppkey <> r1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
)
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM cand JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_suppkey, s_name
"""


def q_tpch_q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (anti-join + scalar-average predicate): customers
    with above-average positive balance and NO RECENT orders (none
    since 1998-01-01), grouped by a
    synthetic country code (c_custkey % 7 — the shared testdata's c_name
    carries no phone prefix). The average predicate is cross-multiplied
    (bal_fp * n > sum_fp, integer cents) so boundary customers cannot
    flip on a float-average ulp; the no-orders quantifier is a left-anti
    join. Output: code, customer count, exact cent total."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_fp"),
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
        )
        .select(F.col("o_custkey").alias("_ck"))
    )
    pos = cust.filter(F.col("bal_fp") > 0).agg(
        F.sum(F.col("bal_fp").cast("decimal(38,0)")).alias("_sum"),
        F.count(F.lit(1)).alias("_n"),
    )
    return (
        cust.crossJoin(F.broadcast(pos))
        .filter(
            F.col("bal_fp").cast("decimal(38,0)") * F.col("_n")
            > F.col("_sum")
        )
        .join(o, cust["c_custkey"] == o["_ck"], "left_anti")
        .groupBy((F.col("c_custkey") % 7).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("bal_fp").cast("decimal(38,0)"))
            .cast("bigint")
            .alias("totacctbal_fp"),
        )
    )


SQL_TPCH_Q22_IDLE_BALANCES = """
WITH cust AS (
  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_fp
  FROM customer
), pos AS (
  SELECT SUM(CAST(bal_fp AS HUGEINT)) AS s, COUNT(*) AS n
  FROM cust WHERE bal_fp > 0
)
SELECT c_custkey % 7 AS cntrycode,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(bal_fp AS HUGEINT)) AS BIGINT) AS totacctbal_fp
FROM cust, pos
WHERE CAST(bal_fp AS HUGEINT) * n > s
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1998-01-01')
GROUP BY cntrycode
"""
