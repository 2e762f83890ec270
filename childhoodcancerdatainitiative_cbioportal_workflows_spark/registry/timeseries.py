"""Event-time operators: windows, as-of, funnel, LOCF resample, retention, TWAP, SCD2, run-length resets.

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
         -- STRICT >: Spark's built-in session_window MERGES an event at
         -- exactly start+gap (probed; the r16 sessionize property test
         -- pins it) — a >= here would disagree on any exact-gap pair.
         -- The shipped events table's microsecond timestamps never
         -- produce one, which is how >= survived 15 green rounds.
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
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


def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (operators/asof, direction='nearest'):
    each purchase picks whichever click — most recent at-or-before or
    earliest at-or-after — is CLOSER in microsecond-exact event time
    (equal distance breaks backward, the pandas convention; ties within a
    direction pinned by event_id). Driver-certifies the r6 unix_micros
    distance discipline: whole-second truncation inverts picks when both
    candidates sit within ~2s. Same single-exchange union+carry plan as
    the backward face — the reversed-order window is a second local sort,
    not a second shuffle."""
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
        direction="nearest",
    )


SQL_ASOF_NEAREST = """
WITH l AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT l.event_id, l.user_id, l.ts, l.value,
         (SELECT r.ts FROM events r
           WHERE r.event_type = 'click' AND r.user_id = l.user_id
             AND r.ts <= l.ts
           ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS b_ts,
         (SELECT r.value FROM events r
           WHERE r.event_type = 'click' AND r.user_id = l.user_id
             AND r.ts <= l.ts
           ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS b_value,
         (SELECT r.ts FROM events r
           WHERE r.event_type = 'click' AND r.user_id = l.user_id
             AND r.ts >= l.ts
           ORDER BY r.ts ASC, r.event_id ASC LIMIT 1) AS f_ts,
         (SELECT r.value FROM events r
           WHERE r.event_type = 'click' AND r.user_id = l.user_id
             AND r.ts >= l.ts
           ORDER BY r.ts ASC, r.event_id ASC LIMIT 1) AS f_value
  FROM l
)
SELECT event_id, user_id, ts, value,
       CASE WHEN b_ts IS NULL THEN f_ts
            WHEN f_ts IS NULL THEN b_ts
            WHEN epoch_us(f_ts) - epoch_us(ts) < epoch_us(ts) - epoch_us(b_ts)
                 THEN f_ts ELSE b_ts END AS asof_ts,
       CASE WHEN b_ts IS NULL THEN f_value
            WHEN f_ts IS NULL THEN b_value
            WHEN epoch_us(f_ts) - epoch_us(ts) < epoch_us(ts) - epoch_us(b_ts)
                 THEN f_value ELSE b_value END AS asof_value
FROM c
"""


def q_throttle_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-user event throttle (operators/throttle): keep an event
    iff it is >= 24h after the previously KEPT event of that user — the
    alert-dedup semantics no window function expresses (lag sees the
    previous ROW, not the previous kept row). The engine side is the
    package's canonical legitimate Pandas-UDF fold (r10: a mapInPandas
    partition fold with a cross-batch cursor — see operators/throttle);
    the oracle replays the identical fold as a linear recursive CTE, so
    the Pandas-UDF code path is driver-certified like any declarative
    plan."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.throttle import (
        throttle_events,
    )

    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return throttle_events(
        e, key_col="user_id", ts_col="ts", gap_seconds=86400, tiebreak_col="event_id"
    )


def _sql_throttle_events() -> str:
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.throttle import (
        throttle_events_sql,
    )

    return throttle_events_sql(
        "SELECT user_id, event_id, ts FROM events",
        key_col="user_id",
        ts_col="ts",
        gap_seconds=86400,
        tiebreak_col="event_id",
        out_cols="user_id, event_id, ts",
    )


SQL_THROTTLE_EVENTS = _sql_throttle_events()


def q_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS value-trend slope in exact integer arithmetic
    (operators/stats.trend_slopes): x = whole seconds since the user's
    first event, y = value on a 0.01 grid, slope as an integer
    fixed-point ratio with the numerator DECIMAL-routed — the per-entity
    drift feature computed with two shuffle-sharing aggregations, no
    window, no sort."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        trend_slopes,
    )

    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    return trend_slopes(e, "user_id", "ts", "value")


SQL_TREND_SLOPES = """
WITH t0 AS (
  SELECT user_id, MIN(ts) AS t0 FROM events GROUP BY user_id
), s AS (
  SELECT e.user_id,
         (epoch_us(e.ts) - epoch_us(t0.t0)) // 1000000 AS x,
         CAST(round(e.value * 100) AS BIGINT) AS y
  FROM events e JOIN t0 USING (user_id)
), st AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM s GROUP BY user_id
)
SELECT user_id, n,
       CAST(((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy) * 1000000)
            // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
            AS BIGINT) AS slope_fp
FROM st
WHERE n >= 2
  AND (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) <> 0
"""


def q_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 3-sigma outlier events (operators/stats.anomaly_flags):
    |x - mean| > 3*std evaluated as the cross-multiplied integer
    inequality (n*x - sum)^2 > 9*(n*sumsq - sum^2) — no float mean, no
    sqrt, DECIMAL-routed squares, so every boundary case is bit-stable
    across engines. One stats agg + one join back, no window."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        anomaly_flags,
    )

    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    return anomaly_flags(e, "user_id", "value", "event_id", k=3)


SQL_ANOMALY_FLAGS = """
WITH s AS (
  SELECT user_id, event_id,
         CAST(round(value * 100) AS BIGINT) AS y_fp
  FROM events
), st AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y_fp) AS BIGINT) AS sy,
         CAST(SUM(y_fp * y_fp) AS BIGINT) AS syy
  FROM s GROUP BY user_id
  HAVING COUNT(*) >= 3
)
SELECT s.user_id, s.event_id, s.y_fp, st.n
FROM s JOIN st USING (user_id)
WHERE (CAST(st.n AS HUGEINT) * s.y_fp - st.sy)
      * (CAST(st.n AS HUGEINT) * s.y_fp - st.sy)
      > CAST(9 AS HUGEINT)
        * (CAST(st.n AS HUGEINT) * st.syy - CAST(st.sy AS HUGEINT) * st.sy)
"""


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-path mining: per (user, session) the ORDERED event-type
    path string ('view>click>purchase'), sessions cut at >30min
    inactivity via the gaps-and-islands window. Determinism discipline:
    the path is array_join over array_sort of (ts, event_id, type)
    structs — collect_list alone is partition-order-dependent, the
    explicit sort key makes it total."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        e.withColumn("_prev", F.lag("ts").over(w))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull()
                | (
                    # NTZ needs the intermediate timestamp cast; the
                    # difference cancels the session-tz interpretation.
                    # Microsecond-exact gap (r16): per-side whole-second
                    # truncation (cast long) disagrees with a fractional
                    # oracle on any true gap in (1800, 1801) s whose
                    # floors difference to exactly 1800 — the same
                    # truncation class q_funnel_conversion documents.
                    # Every shipped events row has fractional micros, so
                    # this was one adjacent-pair alignment away from a
                    # red driver row.
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.unix_micros(F.col("_prev").cast("timestamp"))
                    > 1800 * 1_000_000
                ),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "sid",
            F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path"),
    ).select("user_id", "session_start", "n_events", "path")


SQL_SESSION_PATHS = """
WITH s AS (
  SELECT user_id, event_id, ts, event_type,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), i AS (
  SELECT user_id, event_id, ts, event_type,
         -- epoch_us, not epoch(): DuckDB's epoch() is a DOUBLE whose ULP
         -- at 2020-era values (~2e-7 s) can flip an exact-boundary gap;
         -- integer microseconds match the Spark side bit-for-bit (r16)
         SUM(CASE WHEN prev IS NULL
                    OR epoch_us(ts) - epoch_us(prev)
                       > CAST(1800 AS BIGINT) * 1000000 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
)
SELECT user_id, MIN(ts) AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       array_to_string(list(event_type ORDER BY ts, event_id), '>') AS path
FROM i GROUP BY user_id, sid
"""


def q_cumulative_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-user growth curve: per day, the users seen for
    the FIRST time and the cumulative distinct total — the classic
    'running COUNT(DISTINCT)' that naive window SQL cannot express
    scalably. Engine shape: one groupBy(user) for first-seen dates, one
    per-date count, then a prefix sum over the (tiny) date spine — the
    distinct state never enters a window."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    first_seen = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("day")
    )
    per_day = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


SQL_CUMULATIVE_ACTIVES = """
WITH f AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
), d AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users FROM f GROUP BY day
)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_users
FROM d
"""


def q_attribution_lastclick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution (operators/asof reused as marketing
    attribution): each purchase joined to the user's most recent click
    at-or-before it, within a 7-day window — the asof operator's
    backward+tolerance mode wearing its other hat. Output keeps
    unattributed purchases (null click) to make the coverage visible."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.asof import (
        asof_join,
    )

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        ts="ts",
        right_cols=["click_id"],
        tiebreak="click_id",
        direction="backward",
        tolerance_seconds=7 * 86400,
    )
    return out.select(
        "user_id",
        "purchase_id",
        F.col("asof_click_id").alias("click_id"),
        # exact integer µs difference then truncating div: per-side
        # second-truncation (cast long) disagrees with the oracle's
        # difference-then-truncate by 1 on fractional seconds
        F.expr(
            "(unix_micros(CAST(ts AS TIMESTAMP))"
            " - unix_micros(CAST(asof_ts AS TIMESTAMP))) div 1000000"
        ).alias("gap_seconds"),
    )


SQL_ATTRIBUTION_LASTCLICK = """
SELECT p.user_id, p.event_id AS purchase_id,
       c.event_id AS click_id,
       (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS gap_seconds
FROM events p
LEFT JOIN LATERAL (
  SELECT event_id, ts FROM events c
  WHERE c.user_id = p.user_id AND c.event_type = 'click'
    AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 7 DAY
  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
) c ON TRUE
WHERE p.event_type = 'purchase'
"""
