"""Sessionization and pivot analytics over the events stream.

Sessionization is the classical lag+cumsum composition (the batch
equivalent of streaming ``session_window``); the pivot is conditional
aggregation, which at scale beats a true PIVOT because it stays a
single partial+final aggregate with no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.timeutil import ts_micros
from ..plans.registry import register
from ..sources.tables import load_table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes in microseconds

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "q18_sessionization",
    f"""
    WITH lagged AS (
      SELECT user_id, event_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN prev_ts IS NULL
                    OR epoch_us(ts) - epoch_us(prev_ts) > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_sess
      FROM lagged
    ), sess AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    doc="Sessionization: lag() gap detection + running cumsum session "
    "ids + per-session rollup. Microsecond-precision gap compare so "
    "batch and oracle agree exactly. Batch twin of session_window().",
)
def q18_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.withColumn("prev_ts", F.lag("ts").over(order))
    new_sess = F.when(
        F.col("prev_ts").isNull()
        | (ts_micros("ts") - ts_micros("prev_ts") > SESSION_GAP_US),
        F.lit(1),
    ).otherwise(F.lit(0))
    flagged = lagged.withColumn("new_sess", new_sess)
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn("session_id", F.sum("new_sess").over(run).cast("long"))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "q19_event_type_pivot",
    f"""
    SELECT user_id,
           {", ".join(f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in EVENT_TYPES)},
           COUNT(*) AS n_total
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Pivot by conditional aggregation: one pass, one shuffle, wide "
    "counters per device — the exchanged_msgs-by-interface map of the "
    "reference (queries.ex:493-494) unrolled to columns.",
)
def q19_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    aggs = [
        F.count(F.when(F.col("event_type") == t, F.lit(1))).alias(f"n_{t}")
        for t in EVENT_TYPES
    ]
    return (
        ev.groupBy("user_id")
        .agg(*aggs, F.count(F.lit(1)).alias("n_total"))
        .orderBy("user_id")
    )


_M = "DECIMAL(12,4)"
_R = "DECIMAL(8,4)"


@register(
    "q09_cube_revenue",
    f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS {_R})) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS {_M})) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="Grouping-sets surface: CUBE over (returnflag, linestatus) — "
    "all four grouping sets in ONE partial+final aggregate pass (Spark "
    "expands the sets before the shuffle; no re-scan per set). Exact "
    "decimal sums keep subtotal and grand-total rows hash-stable.",
)
def q09_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import dmoney, drate

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(drate("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dmoney("l_extendedprice")).cast("double").alias("sum_price"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "q29_value_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99,
           round(MIN(value), 6) AS v_min,
           round(MAX(value), 6) AS v_max
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Exact interpolated percentiles per group (both engines sort "
    "and linearly interpolate, so rounded values hash-match). At scale "
    "the exact form is a sort-based aggregate per group; the cheap "
    "path is approx_percentile, kept out of the oracle contract "
    "because it is sketch-based by design.",
)
def q29_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
            F.round(F.min("value"), 6).alias("v_min"),
            F.round(F.max("value"), 6).alias("v_max"),
        )
        .orderBy("event_type")
    )


@register(
    "q56_approx_sketches",
    """
    SELECT event_type,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS exact_devices,
           CAST(1 AS BIGINT) AS hll_within_rsd,
           CAST(1 AS BIGINT) AS p50_in_bounds,
           CAST(1 AS BIGINT) AS p90_in_bounds
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Approximate aggregation surface: HyperLogLog++ distinct counts "
    "and quantile sketches per group — the scale path when exact "
    "DISTINCT/percentile shuffles are too expensive. Sketch values "
    "can't hash-match DuckDB by construction, so the oracle contract "
    "is a BOUNDS check: the Spark side emits its exact aggregates plus "
    "flags asserting the HLL estimate lands within 3x its configured "
    "rsd (0.05) of the exact distinct count and each approx quantile "
    "lands between the exact neighboring quantiles (+-0.01 in rank "
    "space — far beyond the sketch's 1/accuracy = 1e-4 rank-error "
    "guarantee); the oracle recomputes the exact aggregates and emits "
    "constant-true flags. A hash match therefore proves both that the "
    "exact aggregates agree AND that every sketch estimate is inside "
    "its error bound.",
)
def q56_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    approx = F.percentile_approx("value", [0.5, 0.9], 10000)
    exact = F.expr("percentile(value, array(0.49, 0.51, 0.89, 0.91))")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("exact_devices"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("hll"),
        F.element_at(approx, 1).alias("ap50"),
        F.element_at(approx, 2).alias("ap90"),
        F.element_at(exact, 1).alias("q49"),
        F.element_at(exact, 2).alias("q51"),
        F.element_at(exact, 3).alias("q89"),
        F.element_at(exact, 4).alias("q91"),
    )
    hll_ok = (
        F.abs(F.col("hll") - F.col("exact_devices"))
        <= F.col("exact_devices") * F.lit(0.15)
    )
    p50_ok = F.col("ap50").between(F.col("q49"), F.col("q51"))
    p90_ok = F.col("ap90").between(F.col("q89"), F.col("q91"))
    return agg.select(
        "event_type",
        "n_rows",
        "exact_devices",
        hll_ok.cast("long").alias("hll_within_rsd"),
        p50_ok.cast("long").alias("p50_in_bounds"),
        p90_ok.cast("long").alias("p90_in_bounds"),
    ).orderBy("event_type")


@register(
    "q58_salted_skew_join",
    """
    WITH dim AS (
      SELECT event_type, MAX(value) AS type_max
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(e.user_id % 10 AS BIGINT) AS user_bucket,
           COUNT(*) AS n_events,
           round(MAX(d.type_max - e.value), 6) AS max_gap
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY e.event_type, user_bucket
    ORDER BY e.event_type, user_bucket
    """,
    doc="Skewed fact x dim enrichment through functions.skew.salted_join: "
    "event_type has ~5 distinct values, so an unsalted shuffle join puts "
    "each hot key on one task; the salt spreads every key across 8 "
    "sub-keys while the dim side is replicated 8x. Result is provably "
    "identical to the plain join (tests/test_skew.py), and the oracle "
    "here checks it against DuckDB's unsalted plan. Aggregates avoid "
    "double-precision sums (COUNT + MAX only) so values hash-match.",
)
def q58_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(F.max("value").alias("type_max"))
    joined = salted_join(ev, dim, ["event_type"], salt_from="event_id", n_salts=8)
    return (
        joined.groupBy(
            "event_type",
            (F.col("user_id") % 10).cast("long").alias("user_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.max(F.col("type_max") - F.col("value")), 6).alias("max_gap"),
        )
        .orderBy("event_type", "user_bucket")
    )


@register(
    "q68_ranking_windows",
    """
    SELECT user_id, event_id, value,
           ROW_NUMBER()   OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn,
           RANK()         OVER (PARTITION BY user_id ORDER BY value DESC) AS rnk,
           DENSE_RANK()   OVER (PARTITION BY user_id ORDER BY value DESC) AS drnk,
           round(PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY value DESC), 6) AS prnk,
           round(CUME_DIST()    OVER (PARTITION BY user_id ORDER BY value DESC), 6) AS cdist,
           NTILE(4)       OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS quartile,
           LAG(value)     OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           LEAD(value)    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
           FIRST_VALUE(value) OVER (
             PARTITION BY user_id ORDER BY value DESC, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS max_value,
           LAST_VALUE(value) OVER (
             PARTITION BY user_id ORDER BY value DESC, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS min_value
    FROM events
    WHERE event_type = 'purchase'
    ORDER BY user_id, event_id
    """,
    doc="The ranking-window family in one declared query: row_number / "
    "rank / dense_rank / percent_rank / cume_dist / ntile / lag / lead "
    "/ first+last_value with explicit frames. All windows share the "
    "user_id partitioning, so Catalyst evaluates them over a SINGLE "
    "shuffle with per-partition sorts — rank ties are deterministic "
    "because tie-broken orders include event_id and tie-INSENSITIVE "
    "functions (rank, percent_rank) order by value alone.",
)
def q68_ranking_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    by_val = Window.partitionBy("user_id").orderBy(F.col("value").desc())
    by_val_id = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    by_ts = Window.partitionBy("user_id").orderBy("ts", "event_id")
    full_frame = by_val_id.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            "value",
            F.row_number().over(by_val_id).cast("long").alias("rn"),
            F.rank().over(by_val).cast("long").alias("rnk"),
            F.dense_rank().over(by_val).cast("long").alias("drnk"),
            F.round(F.percent_rank().over(by_val), 6).alias("prnk"),
            F.round(F.cume_dist().over(by_val), 6).alias("cdist"),
            F.ntile(4).over(by_val_id).cast("long").alias("quartile"),
            F.lag("value").over(by_ts).alias("prev_value"),
            F.lead("value").over(by_ts).alias("next_value"),
            F.first("value").over(full_frame).alias("max_value"),
            F.last("value").over(full_frame).alias("min_value"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "q73_event_funnel",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT v.user_id AS user_id, v.t_view, c.t_click, p.t_purchase,
           CASE WHEN p.user_id IS NOT NULL THEN 3
                WHEN c.user_id IS NOT NULL THEN 2
                ELSE 1 END AS funnel_depth
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    ORDER BY v.user_id
    """,
    doc="Strict-order funnel (view -> click -> purchase): each stage "
    "is the earliest event AFTER the previous stage's timestamp, so a "
    "click that precedes the first view never counts. Stage frames "
    "are per-user aggregates — bounded by |users|, broadcast onto the "
    "event scan — so each stage is one map-side-partial aggregate "
    "over a broadcast-joined scan, never an event x event self-join. "
    "Three passes over events is the price of strict ordering; at "
    "100 TB each pass is a pruned 3-column scan.",
)
def q73_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def stage(event_type: str, prev: DataFrame, prev_ts: str, out_ts: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == event_type)
        return (
            e.join(F.broadcast(prev), "user_id")
            .filter(F.col("ts") > F.col(prev_ts))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    clicks = stage("click", views, "t_view", "t_click")
    purchases = stage("purchase", clicks, "t_click", "t_purchase")
    depth = (
        F.when(F.col("t_purchase").isNotNull(), F.lit(3))
        .when(F.col("t_click").isNotNull(), F.lit(2))
        .otherwise(F.lit(1))
    )
    return (
        views.join(clicks, "user_id", "left")
        .join(purchases, "user_id", "left")
        .select("user_id", "t_view", "t_click", "t_purchase", depth.alias("funnel_depth"))
        .orderBy("user_id")
    )


@register(
    "q79_cohort_retention",
    """
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(date_trunc('week', e.ts) AS TIMESTAMP) AS active_week,
           COUNT(DISTINCT e.user_id) AS n_active
    FROM events e JOIN first_seen f ON f.user_id = e.user_id
    GROUP BY f.cohort_week, CAST(date_trunc('week', e.ts) AS TIMESTAMP)
    ORDER BY cohort_week, active_week
    """,
    doc="Cohort retention matrix: users keyed by first-seen week, "
    "counted distinct per (cohort, activity) week. The per-user "
    "first-seen frame is an aggregate bounded by |users| and "
    "broadcast back onto the event scan, so the whole query is one "
    "full shuffle (the groupBy) plus a map-side join — the retention "
    "triangle every growth dashboard needs, at event-log scale.",
)
def q79_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        ev.join(F.broadcast(first_seen), "user_id")
        .groupBy("cohort_week", F.date_trunc("week", F.col("ts")).alias("active_week"))
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "active_week")
    )


HIST_BUCKET_WIDTH = 25


@register(
    "q81_value_histogram",
    f"""
    SELECT event_type,
           CAST(floor(value / {HIST_BUCKET_WIDTH}) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           MIN(value) AS v_min,
           MAX(value) AS v_max
    FROM events
    GROUP BY event_type, CAST(floor(value / {HIST_BUCKET_WIDTH}) AS BIGINT)
    ORDER BY event_type, bucket
    """,
    doc="Fixed-width histogram per event type: bucket = floor(value / "
    "width), counted in one partial+final aggregate — the "
    "distribution-profiling primitive that runs BEFORE choosing "
    "quantile cuts at scale (cardinality = types x buckets, tiny "
    "regardless of input size). Min/max per bucket are "
    "order-independent exact doubles, so the result hash-matches "
    "without decimal routing.",
)
def q81_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / HIST_BUCKET_WIDTH).cast("bigint")
    return (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
        )
        .orderBy("event_type", "bucket")
    )


@register(
    "q82_mode_per_user",
    """
    SELECT user_id, event_type AS mode_event_type, n FROM (
      SELECT user_id, event_type, COUNT(*) AS n,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type
             ) AS rn
      FROM events
      GROUP BY user_id, event_type
    )
    WHERE rn = 1
    ORDER BY user_id
    """,
    doc="Statistical mode per key (most frequent event type, "
    "lexicographic tie-break): count-then-rank — the counts shuffle "
    "is partial+final so the heavy lifting is map-side, and the rank "
    "window runs over at most |event types| rows per key. The "
    "label-vote shape (q51 kNN vote is the same plan over joined "
    "neighbors).",
)
def q82_mode_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_event_type"), "n")
        .orderBy("user_id")
    )


_SLIDE_US = 15 * 60 * 1_000_000  # 15-minute hop
_WIN_SLICES = 4  # 1-hour window = 4 hops


@register(
    "q84_sliding_windows",
    f"""
    SELECT make_timestamp(
             (epoch_us(ts) // {_SLIDE_US}) * {_SLIDE_US} - n.n * {_SLIDE_US}
           ) AS window_start,
           event_type,
           COUNT(*) AS n_events
    FROM events, (SELECT unnest(range(0, {_WIN_SLICES})) AS n) n
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    doc="Sliding event-time windows (1-hour width, 15-minute hop): "
    "every event lands in exactly 4 overlapping windows, which "
    "Spark's window(ts, '1 hour', '15 minutes') expands BEFORE the "
    "aggregate — the 4x row expansion happens map-side and is "
    "immediately collapsed by partial aggregation, so the shuffle "
    "carries (window x type) partials, not 4x the events. The oracle "
    "derives the same window starts with integer epoch arithmetic. "
    "Batch twin of the streaming sliding window (s81).",
)
def q84_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
        .orderBy("window_start", "event_type")
    )


@register(
    "q89_cumulative_distinct",
    """
    WITH first_seen AS (
      SELECT event_type, user_id, min(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS d
      FROM events GROUP BY event_type, user_id
    ),
    daily AS (
      SELECT event_type, d, COUNT(*) AS new_users
      FROM first_seen GROUP BY event_type, d
    )
    SELECT event_type, d AS day,
           CAST(SUM(new_users) OVER (
             PARTITION BY event_type ORDER BY d
             ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS cum_distinct_users
    FROM daily
    ORDER BY event_type, day
    """,
    doc="Cumulative distinct users per event type by day — via the "
    "FIRST-APPEARANCE rewrite: a user contributes on the day they "
    "first appear, so the running distinct count is a cumulative sum "
    "of first-appearance counts. Neither engine supports "
    "COUNT(DISTINCT) OVER, and the naive per-day re-scan is "
    "O(days x events); this form is one distinct-keys aggregate + "
    "one tiny window — the only formulation that survives an "
    "unbounded event log.",
)
def q89_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("event_type", "user_id").agg(
        F.min(F.date_trunc("day", F.col("ts"))).alias("d")
    )
    daily = first_seen.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        daily.select(
            "event_type",
            F.col("d").alias("day"),
            F.sum("new_users").over(w).cast("bigint").alias("cum_distinct_users"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "q94_map_functions",
    """
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY user_id, event_type
    ), kept AS (
      SELECT user_id, event_type AS k, c * 10 AS v FROM counts WHERE c >= 2
    ), totals AS (
      SELECT user_id, '__total' AS k, CAST(SUM(c) AS BIGINT) AS v
      FROM counts GROUP BY user_id
    )
    SELECT user_id, k, v FROM kept
    UNION ALL
    SELECT user_id, k, v FROM totals
    """,
    doc="Map-typed function surface (map_from_entries, map_filter, "
    "transform_values, map_values, map_concat, aggregate, explode-of-map) "
    "mirroring the reference's per-device keyed counter maps "
    "(impl.ex:623-674). All map ops are JVM-side higher-order functions "
    "over a single grouped row — no extra shuffle beyond the one "
    "count aggregate; the oracle states the same result relationally.",
)
def q94_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    per_user = counts.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "c"))).alias("m")
    )
    enriched = per_user.select(
        "user_id",
        F.map_concat(
            F.transform_values(
                F.map_filter("m", lambda _k, v: v >= F.lit(2)),
                lambda _k, v: v * F.lit(10),
            ),
            F.create_map(
                F.lit("__total"),
                F.aggregate(
                    F.map_values("m"),
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x,
                ),
            ),
        ).alias("m2"),
    )
    return enriched.select("user_id", F.explode("m2").alias("k", "v"))


@register(
    "q127_column_profile",
    """
    SELECT 'o_custkey' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(o_custkey) AS BIGINT) AS n_non_null,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_s,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_s
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           CAST(MIN(o_orderpriority) AS VARCHAR),
           CAST(MAX(o_orderpriority) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           CAST(CAST(MIN(o_totalprice) AS DECIMAL(12,4)) AS VARCHAR),
           CAST(CAST(MAX(o_totalprice) AS DECIMAL(12,4)) AS VARCHAR)
    FROM orders
    ORDER BY col
    """,
    doc="ANALYZE-style column profiling: row count, non-null count, "
    "exact distinct count, and min/max (stringified; the money column "
    "through exact DECIMAL so the rendering is engine-identical) per "
    "profiled column of orders — the table-statistics pass that feeds "
    "optimizer estimates and data-quality dashboards. One scan per "
    "profile ROW in the SQL statement, but the Spark side computes "
    "every column's aggregates in a SINGLE pass (one partial+final "
    "aggregate over all profiled columns, then an unpivot of the "
    "results) — the difference between O(cols) scans and O(1) scans "
    "is the whole game when the table is 100 TB.",
)
def q127_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("nn_custkey"),
        F.countDistinct("o_custkey").alias("nd_custkey"),
        F.min("o_custkey").cast("string").alias("mn_custkey"),
        F.max("o_custkey").cast("string").alias("mx_custkey"),
        F.count("o_orderpriority").alias("nn_prio"),
        F.countDistinct("o_orderpriority").alias("nd_prio"),
        F.min("o_orderpriority").alias("mn_prio"),
        F.max("o_orderpriority").alias("mx_prio"),
        F.count("o_totalprice").alias("nn_price"),
        F.countDistinct("o_totalprice").alias("nd_price"),
        F.min(F.col("o_totalprice").cast("decimal(12,4)")).cast("string").alias("mn_price"),
        F.max(F.col("o_totalprice").cast("decimal(12,4)")).cast("string").alias("mx_price"),
    )
    profiles = F.array(
        F.struct(
            F.lit("o_custkey").alias("col"),
            F.col("n_rows"),
            F.col("nn_custkey").alias("n_non_null"),
            F.col("nd_custkey").alias("n_distinct"),
            F.col("mn_custkey").alias("min_s"),
            F.col("mx_custkey").alias("max_s"),
        ),
        F.struct(
            F.lit("o_orderpriority").alias("col"),
            F.col("n_rows"),
            F.col("nn_prio").alias("n_non_null"),
            F.col("nd_prio").alias("n_distinct"),
            F.col("mn_prio").alias("min_s"),
            F.col("mx_prio").alias("max_s"),
        ),
        F.struct(
            F.lit("o_totalprice").alias("col"),
            F.col("n_rows"),
            F.col("nn_price").alias("n_non_null"),
            F.col("nd_price").alias("n_distinct"),
            F.col("mn_price").alias("min_s"),
            F.col("mx_price").alias("max_s"),
        ),
    )
    return (
        agg.select(F.explode(profiles).alias("p"))
        .select(
            F.col("p.col").alias("col"),
            F.col("p.n_rows").cast("long").alias("n_rows"),
            F.col("p.n_non_null").cast("long").alias("n_non_null"),
            F.col("p.n_distinct").cast("long").alias("n_distinct"),
            F.col("p.min_s").alias("min_s"),
            F.col("p.max_s").alias("max_s"),
        )
        .orderBy("col")
    )


# ---------------------------------------------------------------------------
# q141 — Count-Min sketch heavy hitters with exact verification
# ---------------------------------------------------------------------------

#: sketch geometry: depth (independent hash rows) x width (buckets).
#: With w=64 the additive overestimate bound is eps*N = N/w; depth 4
#: drives the probability of exceeding it to (1/e)^4.
CM_DEPTH = 4
CM_WIDTH = 64
#: pairwise-independent integer hash family over the 32-bit term hash:
#: bucket_d(h) = ((a_d * h + b_d) mod P) mod w, P = 2^31 - 1
CM_PRIME = 2147483647
CM_ROWS = [(1299721, 7), (2750161, 131), (4256233, 977), (5800079, 4099)]
#: report the exact top-N terms and their sketch estimates
CM_TOPN = 20

#: 32-bit term hash shared with the MinHash ladder: first 8 hex chars
#: of md5, parsed base-16 (functions/text.py:shingle_h32)
_CM_H32_DUCK = "('0x' || substr(md5(term), 1, 8))::BIGINT"
_CM_BUCKETS_DUCK = ", ".join(
    f"(({a} * h32 + {b}) % {CM_PRIME}) % {CM_WIDTH} AS b{d}"
    for d, (a, b) in enumerate(CM_ROWS)
)


@register(
    "q141_countmin_heavy_hitters",
    f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    cnt AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS exact_n FROM toks
      WHERE term <> '' GROUP BY term
    ),
    h AS (SELECT term, exact_n, {_CM_H32_DUCK} AS h32 FROM cnt),
    hb AS (SELECT term, exact_n, {_CM_BUCKETS_DUCK} FROM h),
    -- the sketch: for each depth row, bucket counts summed over terms
    sk AS (
      SELECT d, bucket, SUM(exact_n) AS cell
      FROM (
        {" UNION ALL ".join(f"SELECT {d} AS d, b{d} AS bucket, exact_n FROM hb" for d in range(CM_DEPTH))}
      ) GROUP BY d, bucket
    ),
    top AS (
      SELECT term, exact_n, {", ".join(f"b{d}" for d in range(CM_DEPTH))}
      FROM hb ORDER BY exact_n DESC, term LIMIT {CM_TOPN}
    ),
    est AS (
      SELECT t.term, t.exact_n,
             CAST(min(s.cell) AS BIGINT) AS cm_estimate
      FROM top t
      JOIN sk s ON ({" OR ".join(f"(s.d = {d} AND s.bucket = t.b{d})" for d in range(CM_DEPTH))})
      GROUP BY t.term, t.exact_n
    )
    SELECT term, exact_n, cm_estimate,
           cm_estimate - exact_n AS overestimate
    FROM est ORDER BY exact_n DESC, term
    """,
    doc="Count-Min sketch frequency estimation, verified against "
    "exact counts: every corpus term hashes into a 4x64 counter "
    "array through a pairwise-independent integer hash family over "
    "the shared md5-based 32-bit term hash, and the estimate for a "
    "term is the MIN of its 4 cells — always an OVERestimate, within "
    "N/64 with high probability. The sketch build is one groupBy "
    "(map-side combinable: counters are sums) after a 4-way explode "
    "of (depth, bucket) pairs, the fixed-size 256-cell array "
    "broadcasts to probe the exact top-20, and the output pins both "
    "the estimates and the per-term overestimate — the mergeable-"
    "summary pattern (each partition sketches locally, cells add) "
    "that answers frequency queries over 100 TB without a second "
    "scan.",
)
def q141_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import shingle_h32

    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
    )
    hb = cnt.withColumn("h32", shingle_h32(F.col("term")))
    for d, (a, b) in enumerate(CM_ROWS):
        hb = hb.withColumn(
            f"b{d}", ((F.lit(a) * F.col("h32") + b) % CM_PRIME) % CM_WIDTH
        )
    pairs = F.array(
        *[
            F.struct(F.lit(d).alias("d"), F.col(f"b{d}").alias("bucket"))
            for d in range(CM_DEPTH)
        ]
    )
    sk = (
        hb.select("exact_n", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
        .agg(F.sum("exact_n").alias("cell"))
    )
    top = hb.orderBy(F.col("exact_n").desc(), "term").limit(CM_TOPN)
    probe_cond = None
    for d in range(CM_DEPTH):
        c = (F.col("s.d") == d) & (F.col("s.bucket") == F.col(f"t.b{d}"))
        probe_cond = c if probe_cond is None else (probe_cond | c)
    est = (
        top.alias("t")
        .join(F.broadcast(sk.alias("s")), probe_cond)
        .groupBy("t.term", "t.exact_n")
        .agg(F.min("s.cell").cast("long").alias("cm_estimate"))
    )
    return est.select(
        "term",
        "exact_n",
        "cm_estimate",
        (F.col("cm_estimate") - F.col("exact_n")).alias("overestimate"),
    ).orderBy(F.col("exact_n").desc(), "term")


# ---------------------------------------------------------------------------
# q153 — data-contract validation suite
# ---------------------------------------------------------------------------


@register(
    "q153_data_contract",
    """
    WITH o AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_cust,
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS dup_keys,
             CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                      THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
             CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS bad_price
      FROM orders
    ),
    orphans AS (
      -- NOT EXISTS, not NOT IN: NOT IN yields zero rows the moment either
      -- side holds a NULL key, which is exactly the dirty-data case a
      -- contract gate must catch.  NULL o_custkey is the not_null rule's
      -- violation, not an orphan, so it is excluded here on BOTH engines.
      SELECT CAST(COUNT(*) AS BIGINT) AS n_orphans
      FROM orders o2
      WHERE o2.o_custkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o2.o_custkey)
    ),
    li AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
                  AS BIGINT) AS dup_lines,
             CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                      THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty
      FROM lineitem
    )
    SELECT rule, n_checked, n_violations, n_violations = 0 AS passed
    FROM (
      SELECT 'orders.custkey_not_null' AS rule, o.n AS n_checked,
             o.null_cust AS n_violations FROM o
      UNION ALL SELECT 'orders.orderkey_unique', o.n, o.dup_keys FROM o
      UNION ALL SELECT 'orders.status_accepted_values', o.n, o.bad_status FROM o
      UNION ALL SELECT 'orders.totalprice_positive', o.n, o.bad_price FROM o
      UNION ALL SELECT 'orders.custkey_ref_customer', o.n, orphans.n_orphans
                FROM o, orphans
      UNION ALL SELECT 'lineitem.pk_unique', li.n, li.dup_lines FROM li
      UNION ALL SELECT 'lineitem.quantity_in_range', li.n, li.bad_qty FROM li
    )
    ORDER BY rule
    """,
    doc="Data-contract validation (the expectation-suite shape): "
    "null checks, key uniqueness, accepted value sets, numeric "
    "ranges, and cross-table referential integrity, each reported as "
    "(rule, checked, violations, passed). Everything per table "
    "computes in ONE conditional-aggregate scan (not one scan per "
    "rule — O(1) passes however many expectations the contract "
    "grows); the referential check is a broadcast-dim anti-join "
    "count. Violation counts are exact integers, so the report is "
    "hash-tight — this is the pre-ingestion gate a 100 TB landing "
    "zone runs before promoting a batch, and the same plan shape "
    "extends to quarantining violating rows instead of counting "
    "them.",
)
def q153_data_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("o_custkey").isNull().cast("int")).cast("long").alias(
            "null_cust"
        ),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).cast("long").alias(
            "dup_keys"
        ),
        F.sum((~F.col("o_orderstatus").isin("F", "O", "P")).cast("int"))
        .cast("long")
        .alias("bad_status"),
        F.sum((F.col("o_totalprice") <= 0).cast("int")).cast("long").alias(
            "bad_price"
        ),
    )
    orphans = (
        # NULL o_custkey is counted by the not_null rule, never as an orphan
        # — keeps anti-join semantics identical to the oracle's NOT EXISTS
        # even on dirty data where NOT IN would silently return zero.
        orders.filter(F.col("o_custkey").isNotNull())
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "leftanti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
    )
    l = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.count(F.lit(1)) - F.countDistinct("l_orderkey", "l_linenumber"))
        .cast("long")
        .alias("dup_lines"),
        F.sum(((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).cast("int"))
        .cast("long")
        .alias("bad_qty"),
    )

    # unpivot each 1-row aggregate with stack() so every rule of a
    # table rides the SAME scan — O(1) passes per table, not per rule
    o_rules = o.crossJoin(F.broadcast(orphans)).select(
        F.col("n").alias("n_checked"),
        F.expr(
            "stack(5, "
            "'orders.custkey_not_null', null_cust, "
            "'orders.orderkey_unique', dup_keys, "
            "'orders.status_accepted_values', bad_status, "
            "'orders.totalprice_positive', bad_price, "
            "'orders.custkey_ref_customer', n_orphans) AS (rule, n_violations)"
        ),
    )
    l_rules = l.select(
        F.col("n").alias("n_checked"),
        F.expr(
            "stack(2, "
            "'lineitem.pk_unique', dup_lines, "
            "'lineitem.quantity_in_range', bad_qty) AS (rule, n_violations)"
        ),
    )
    return (
        o_rules.unionByName(l_rules)
        .select("rule", "n_checked", "n_violations",
                (F.col("n_violations") == 0).alias("passed"))
        .orderBy("rule")
    )


# ---------------------------------------------------------------------------
# q158 — Markov transition matrix over event streams
# ---------------------------------------------------------------------------


@register(
    "q158_markov_transitions",
    """
    WITH ordered AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ordered WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    ),
    outdeg AS (
      SELECT from_type, SUM(n) AS n_out FROM trans GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, t.n,
           CAST(t.n AS DOUBLE) / o.n_out AS p
    FROM trans t JOIN outdeg o USING (from_type)
    ORDER BY from_type, to_type
    """,
    doc="First-order Markov transition matrix of the event stream: "
    "per-user consecutive event-type pairs (LEAD over the same "
    "(user, ts, event_id) order every sessionizer here uses) are "
    "counted globally, then normalized into transition "
    "probabilities by the exact out-degree — each probability is "
    "ONE division of two exact integers, so the matrix is "
    "bit-deterministic. One keyed window pass + a 25-cell "
    "aggregate: the behavioral-model fit (next-action prediction, "
    "anomaly scoring against expected flows) that runs over "
    "billions of events with a single shuffle on user_id.",
)
def q158_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = ordered.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    outdeg = trans.groupBy("from_type").agg(F.sum("n").alias("n_out"))
    return (
        trans.join(F.broadcast(outdeg), "from_type")
        .select(
            "from_type", "to_type", "n",
            (F.col("n").cast("double") / F.col("n_out")).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


# ---------------------------------------------------------------------------
# q159 — behavioral entropy per user
# ---------------------------------------------------------------------------


@register(
    "q159_user_entropy",
    """
    WITH c AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY user_id, event_type
    ),
    tot AS (SELECT user_id, SUM(n) AS n_tot FROM c GROUP BY user_id),
    contrib AS (
      SELECT c.user_id, c.n, t.n_tot,
             CAST(floor(-(CAST(c.n AS DOUBLE) / t.n_tot)
                  * ln(CAST(c.n AS DOUBLE) / t.n_tot) * 1000000000) AS BIGINT)
               AS h_e9
      FROM c JOIN tot t USING (user_id)
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(MAX(n_tot) AS BIGINT) AS n_events,
           CAST(SUM(h_e9) AS BIGINT) AS entropy_e9
    FROM contrib
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Shannon entropy of each user's event-type distribution — "
    "the behavioral-diversity signal (bots are low-entropy, organic "
    "users high): per-(user, type) exact counts, per-term "
    "-p*ln(p) computed with identical double arithmetic on both "
    "engines and floored to 1e-9 fixed point, so the per-user SUM "
    "is exact integer arithmetic — associative under any "
    "aggregation order (the q140/q157 determinism discipline). Two "
    "keyed aggregates on the same user key (partitioning reused), "
    "no window, linear at any scale. Overflow bound: each |h_e9| "
    "<= max(-p*ln p)*1e9 < 3.7e8 and the per-user sum is <= "
    "ln(n_types)*1e9, so entropy_e9 stays under int64 until a user "
    "has ~e^(9.2e9) distinct event types — safe by construction, no "
    "widening needed (unlike q162/q170's unbounded regression sums).",
)
def q159_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = c.groupBy("user_id").agg(F.sum("n").alias("n_tot"))
    p = F.col("n").cast("double") / F.col("n_tot")
    contrib = c.join(tot, "user_id").select(
        "user_id",
        "n_tot",
        F.floor(-p * F.log(p) * 1000000000).cast("long").alias("h_e9"),
    )
    return (
        contrib.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.max("n_tot").cast("long").alias("n_events"),
            F.sum("h_e9").cast("long").alias("entropy_e9"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q160 — top session paths
# ---------------------------------------------------------------------------

#: path length cap: the first K event types of each session
PATH_K = 4
#: report the top-N most common session openings
PATH_TOPN = 15


@register(
    "q160_top_session_paths",
    f"""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_type, ts, event_id,
             SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM ordered
    ),
    ranked AS (
      SELECT user_id, sess_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, sess_id ORDER BY ts, event_id) AS pos
      FROM sess
    ),
    paths AS (
      SELECT user_id, sess_id,
             array_to_string(list(event_type ORDER BY pos), '>') AS path
      FROM ranked WHERE pos <= {PATH_K}
      GROUP BY user_id, sess_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths
    GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT {PATH_TOPN}
    """,
    doc="Top session openings: events sessionize on the shared "
    "30-minute gap rule (gaps-and-islands prefix sum), each "
    "session's first 4 event types concatenate into a path string, "
    "and the most common paths rank globally — the funnel-discovery "
    "complement to q73's fixed-pattern funnel (there the pattern is "
    "given; here the data surfaces it). Two windows over the same "
    "(user, ts, event_id) order — one partitioning, reused — a "
    "position-capped collect per session, and a bounded top-k. Ties "
    "rank by path string so both engines cut the same top-15.",
)
def q160_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "event_type", "ts", "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                ts_micros("ts") - ts_micros(F.lag("ts").over(w))
                > SESSION_GAP_US
            ),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = ordered.withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ranked = sess.withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy("user_id", "sess_id").orderBy("ts", "event_id")
        ),
    ).filter(F.col("pos") <= PATH_K)
    paths = ranked.groupBy("user_id", "sess_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(PATH_TOPN)
    )


# ---------------------------------------------------------------------------
# q164 — semi-structured extraction (schema-on-read JSON props)
# ---------------------------------------------------------------------------


@register(
    "q164_json_extraction",
    """
    WITH parsed AS (
      SELECT event_type,
             CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_parsed,
           CAST(SUM(COALESCE(k, 0)) AS BIGINT) AS sum_k,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k
    FROM parsed
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Schema-on-read over the semi-structured props column: the "
    "Spark side parses with from_json against a declared schema "
    "(the real mechanism — typed, null on malformed rows, no "
    "regex), the oracle replays it with a regex extract, and the "
    "per-event-type parse-rate + value stats must agree exactly. "
    "Everything rides the ONE scan the group-aggregate needs; "
    "from_json stays inside codegen. This is the landing-zone "
    "pattern for event payloads too variable to pre-declare as "
    "columns — parse at query time, monitor the parse rate.",
)
def q164_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json(F.col("props"), "k BIGINT")["k"].alias("k"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("k").isNotNull().cast("int")).cast("long").alias(
                "n_parsed"
            ),
            F.sum(F.coalesce(F.col("k"), F.lit(0))).cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q165 — Bloom filter build + measured false-positive rate
# ---------------------------------------------------------------------------

#: filter geometry: m bits, k hash functions
BLOOM_M = 16384
BLOOM_K = 7
#: pairwise-independent hash rows over the integer key
BLOOM_ROWS = [
    (2654435761, 1), (2246822519, 3), (3266489917, 7), (668265263, 13),
    (374761393, 31), (2654435789, 61), (2246822579, 127),
]
BLOOM_PRIME = 2147483647
#: synthetic non-member probe count
BLOOM_PROBES = 4096


def _bloom_pos_sql(key: str, d: int) -> str:
    a, b = BLOOM_ROWS[d]
    return f"(({a} * ({key}) + {b}) % {BLOOM_PRIME}) % {BLOOM_M}"


@register(
    "q165_bloom_fpr",
    f"""
    WITH keys AS (SELECT DISTINCT o_orderkey AS key FROM orders),
    bits AS (
      SELECT DISTINCT pos FROM (
        {" UNION ALL ".join(f"SELECT {_bloom_pos_sql('key', d)} AS pos FROM keys" for d in range(BLOOM_K))}
      )
    ),
    maxk AS (SELECT MAX(key) AS mk FROM keys),
    probes AS (
      SELECT mk + 1 + UNNEST(range(0, {BLOOM_PROBES})) AS pkey FROM maxk
    ),
    probe_hits AS (
      SELECT p.pkey,
             CAST({" + ".join(
               f"CASE WHEN EXISTS (SELECT 1 FROM bits WHERE pos = {_bloom_pos_sql('p.pkey', d)}) THEN 1 ELSE 0 END"
               for d in range(BLOOM_K))} AS BIGINT) AS n_set
      FROM probes p
    )
    SELECT CAST((SELECT COUNT(*) FROM keys) AS BIGINT) AS n_keys,
           CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS n_bits_set,
           CAST({BLOOM_M} AS BIGINT) AS m,
           CAST({BLOOM_K} AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN n_set = {BLOOM_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_pos,
           CAST(SUM(CASE WHEN n_set = {BLOOM_K} THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS fpr
    FROM probe_hits
    """,
    doc="Bloom filter as a first-class mergeable summary, with its "
    "false-positive rate MEASURED instead of assumed: the order-key "
    "set hashes through 7 pairwise-independent rows into a 16384-bit "
    "filter (the bit set is a distinct-aggregate — per-partition "
    "filters OR together, the property that lets each executor "
    "build locally and merge), then 4096 guaranteed-non-member "
    "probes count how many pass all 7 bits. With n~1500 keys, "
    "m/n~11, k=7 the analytic FPR is <1%; the measured rate is "
    "pinned exactly. The probe check is a broadcast semi-join "
    "against the bounded bit table — the same shape Spark's own "
    "runtime bloom pushdown (q97) uses internally, here surfaced "
    "as an operator a dedup/routing pipeline can persist and ship.",
)
def q165_bloom_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key")
    ).distinct()

    def pos(col, d):
        a, b = BLOOM_ROWS[d]
        return ((F.lit(a) * col + b) % BLOOM_PRIME) % BLOOM_M

    bits = (
        keys.select(
            F.explode(
                F.array(*[pos(F.col("key"), d) for d in range(BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
    )
    maxk = keys.agg(F.max("key").alias("mk"))
    probes = (
        spark.range(BLOOM_PROBES)
        .crossJoin(F.broadcast(maxk))
        .select((F.col("mk") + 1 + F.col("id")).alias("pkey"))
    )
    probe_pos = probes.select(
        "pkey",
        F.posexplode(
            F.array(*[pos(F.col("pkey"), d) for d in range(BLOOM_K)])
        ).alias("d", "pos"),
    )
    hits = (
        probe_pos.join(F.broadcast(bits.withColumn("set_", F.lit(1))), "pos", "left")
        .groupBy("pkey")
        .agg(F.sum(F.coalesce(F.col("set_"), F.lit(0))).alias("n_set"))
    )
    stats = keys.agg(F.count(F.lit(1)).cast("long").alias("n_keys")).crossJoin(
        F.broadcast(bits.agg(F.count(F.lit(1)).cast("long").alias("n_bits_set")))
    )
    fp = hits.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum((F.col("n_set") == BLOOM_K).cast("int")).cast("long").alias(
            "n_false_pos"
        ),
    )
    return (
        stats.crossJoin(F.broadcast(fp))
        .select(
            "n_keys",
            "n_bits_set",
            F.lit(BLOOM_M).cast("long").alias("m"),
            F.lit(BLOOM_K).cast("long").alias("k"),
            "n_probes",
            "n_false_pos",
            (F.col("n_false_pos").cast("double") / F.col("n_probes")).alias("fpr"),
        )
    )


# ---------------------------------------------------------------------------
# q167 — A/B experiment analysis (two-proportion z-test)
# ---------------------------------------------------------------------------


@register(
    "q167_ab_test",
    """
    WITH firsts AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ),
    assign AS (
      SELECT user_id, user_id % 2 AS variant,
             CAST(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS BIGINT)
               AS converted
      FROM firsts WHERE rn = 1
    ),
    arms AS (
      SELECT variant,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_converted
      FROM assign GROUP BY variant
    ),
    wide AS (
      SELECT MAX(CASE WHEN variant = 0 THEN n_users END) AS n0,
             MAX(CASE WHEN variant = 0 THEN n_converted END) AS c0,
             MAX(CASE WHEN variant = 1 THEN n_users END) AS n1,
             MAX(CASE WHEN variant = 1 THEN n_converted END) AS c1
      FROM arms
    )
    SELECT n0, c0, n1, c1,
           CAST(c0 AS DOUBLE) / n0 AS rate0,
           CAST(c1 AS DOUBLE) / n1 AS rate1,
           CAST(floor(
             (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
             / nullif(sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (1.0 / n0 + 1.0 / n1)), 0.0)
             * 1000000000) AS BIGINT) AS z_e9
    FROM wide
    """,
    doc="A/B experiment readout: users assign to variants by id "
    "parity, a user converts when their FIRST event (by event time) "
    "is a signup — the activation metric — and the two-proportion pooled "
    "z-statistic compares arms — every input to the z formula is an "
    "exact integer count, the formula evaluates in one fixed "
    "expression order on both engines, and the statistic is floored "
    "to 1e-9 fixed point so the readout is hash-tight. |z| > 1.96 "
    "is the conventional 95% significance gate. Two keyed "
    "aggregates (user, then variant) and a 2-row pivot: the "
    "experimentation query every event platform serves continuously.",
)
def q167_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    assign = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            (F.col("user_id") % 2).alias("variant"),
            (F.col("event_type") == "signup").cast("long").alias("converted"),
        )
    )
    arms = assign.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c1"),
    )
    r0 = F.col("c0").cast("double") / F.col("n0")
    r1 = F.col("c1").cast("double") / F.col("n1")
    pooled = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    z = (r1 - r0) / F.nullif(
        F.sqrt(
            pooled * (1.0 - pooled) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
        ),
        F.lit(0.0),
    )
    return wide.select(
        "n0", "c0", "n1", "c1",
        r0.alias("rate0"),
        r1.alias("rate1"),
        F.floor(z * 1000000000).cast("long").alias("z_e9"),
    )


# ---------------------------------------------------------------------------
# q181 — K-fold target encoding (leakage-safe categorical feature)
# ---------------------------------------------------------------------------

#: folds for the out-of-fold encoding
TE_FOLDS = 5


@register(
    "q181_target_encoding",
    f"""
    WITH base AS (
      SELECT event_type,
             CAST(user_id % {TE_FOLDS} AS BIGINT) AS fold,
             CAST(ROUND(value * 100) AS BIGINT) AS y
      FROM events
    ),
    per_cat AS (
      SELECT event_type, CAST(SUM(y) AS BIGINT) AS cat_sum,
             CAST(COUNT(*) AS BIGINT) AS cat_cnt
      FROM base GROUP BY event_type
    ),
    per_fold AS (
      SELECT event_type, fold, CAST(SUM(y) AS BIGINT) AS fold_sum,
             CAST(COUNT(*) AS BIGINT) AS fold_cnt
      FROM base GROUP BY event_type, fold
    )
    SELECT f.event_type, f.fold,
           f.fold_cnt AS n_in_fold,
           CAST(c.cat_cnt - f.fold_cnt AS BIGINT) AS n_out_of_fold,
           CAST(c.cat_sum - f.fold_sum AS BIGINT) AS enc_num,
           CAST(c.cat_sum - f.fold_sum AS DOUBLE)
             / (c.cat_cnt - f.fold_cnt) / 100.0 AS encoding
    FROM per_fold f JOIN per_cat c USING (event_type)
    ORDER BY event_type, fold
    """,
    doc="K-fold target encoding, the leakage-safe form: each fold's "
    "encoding for a category is the mean target over the OTHER folds "
    "(subtracting the fold's own sums from the category totals), so "
    "no row's label influences its own feature — the difference "
    "between a usable feature and silent target leakage. Targets "
    "snap to 1e-2 fixed point; numerators/denominators are exact "
    "BIGINT differences of two keyed aggregates SHARING the "
    "event_type partitioning, and the single double division is "
    "engine-identical. At 100 TB this is two map-side-combined "
    "aggregates and one broadcast-size join — per-category state, "
    "never per-row.",
)
def q181_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        (F.col("user_id") % TE_FOLDS).cast("long").alias("fold"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    per_cat = base.groupBy("event_type").agg(
        F.sum("y").alias("cat_sum"), F.count(F.lit(1)).alias("cat_cnt")
    )
    per_fold = base.groupBy("event_type", "fold").agg(
        F.sum("y").alias("fold_sum"), F.count(F.lit(1)).alias("fold_cnt")
    )
    return (
        per_fold.join(F.broadcast(per_cat), "event_type")
        .select(
            "event_type",
            "fold",
            F.col("fold_cnt").cast("long").alias("n_in_fold"),
            (F.col("cat_cnt") - F.col("fold_cnt"))
            .cast("long")
            .alias("n_out_of_fold"),
            (F.col("cat_sum") - F.col("fold_sum"))
            .cast("long")
            .alias("enc_num"),
            (
                (F.col("cat_sum") - F.col("fold_sum")).cast("double")
                / (F.col("cat_cnt") - F.col("fold_cnt"))
                / 100.0
            ).alias("encoding"),
        )
        .orderBy("event_type", "fold")
    )


# ---------------------------------------------------------------------------
# q182 — compaction planning (small-file OPTIMIZE bin-packing)
# ---------------------------------------------------------------------------

#: target compacted file size (bytes) and the synthetic bytes-per-row of
#: the manifest derived from the events layout
COMPACT_TARGET = 1 << 16
COMPACT_ROW_BYTES = 64


@register(
    "q182_compaction_plan",
    f"""
    WITH manifest AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             user_id AS file_id,
             CAST(COUNT(*) * {COMPACT_ROW_BYTES} AS BIGINT) AS bytes
      FROM events GROUP BY 1, 2
    ),
    ordered AS (
      SELECT day, file_id, bytes,
             COALESCE(SUM(bytes) OVER (PARTITION BY day
               ORDER BY bytes DESC, file_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM manifest
    ),
    planned AS (
      SELECT day, file_id, bytes,
             CAST(cum_before // {COMPACT_TARGET} AS BIGINT) AS bin
      FROM ordered
    )
    SELECT day, bin,
           CAST(COUNT(*) AS BIGINT) AS n_inputs,
           CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
           CAST(MIN(bytes) AS BIGINT) AS min_file,
           CAST(MAX(bytes) AS BIGINT) AS max_file
    FROM planned
    GROUP BY day, bin
    ORDER BY day, bin
    """,
    doc="Small-file compaction planning — the OPTIMIZE bin-packing step "
    "of table maintenance: a per-(day, writer) file manifest is "
    "derived from the events layout, and within each day files pack "
    "into target-size rewrite bins by the greedy size-descending "
    "cumulative rule real compactors use (sort desc, cut at target "
    "boundaries — the exclusive prefix sum makes bin assignment a "
    "pure integer division). Everything is keyed windows and "
    "aggregates PER DAY — compaction of a 100 TB table parallelizes "
    "over partition directories, and the plan (inputs per bin, bin "
    "bytes) is exact integers, hash-tight.",
)
def q182_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    manifest = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.col("user_id").alias("file_id"),
    ).agg((F.count(F.lit(1)) * COMPACT_ROW_BYTES).cast("long").alias("bytes"))
    w = (
        Window.partitionBy("day")
        .orderBy(F.col("bytes").desc(), "file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = manifest.withColumn(
        "bin",
        F.floor(
            F.coalesce(F.sum("bytes").over(w), F.lit(0)) / COMPACT_TARGET
        ).cast("long"),
    )
    return (
        planned.groupBy("day", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_inputs"),
            F.sum("bytes").cast("long").alias("bin_bytes"),
            F.min("bytes").cast("long").alias("min_file"),
            F.max("bytes").cast("long").alias("max_file"),
        )
        .orderBy("day", "bin")
    )


# ---------------------------------------------------------------------------
# KMV distinct-count sketch (q202)
# ---------------------------------------------------------------------------

#: sketch size: the K smallest hash values are kept per group
KMV_K = 64
#: salt fan-out for the partial-sketch tree level
KMV_SALTS = 32
#: hash domain size: shingle_h32 values are uniform in [0, 2^32)
KMV_DOMAIN = 4294967296.0


@register(
    "q202_kmv_distinct_sketch",
    f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM events
    ),
    ranked AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h
    ),
    kth AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k, MAX(h) AS kth_hash
      FROM ranked WHERE rn <= {KMV_K} GROUP BY event_type
    ),
    ex AS (
      SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM events GROUP BY event_type
    ),
    est AS (
      SELECT e.event_type, e.exact_distinct, t.k, t.kth_hash,
             CASE WHEN t.k < {KMV_K} THEN CAST(t.k AS DOUBLE)
                  ELSE round((t.k - 1) * {KMV_DOMAIN} / t.kth_hash, 6)
             END AS est_distinct
      FROM ex e JOIN kth t USING (event_type)
    )
    SELECT event_type, exact_distinct, k, kth_hash, est_distinct,
           round(abs(est_distinct - exact_distinct) / exact_distinct, 6)
             AS rel_err
    FROM est
    ORDER BY event_type
    """,
    doc="KMV (k-minimum-values) distinct-count sketch per event type, "
    "estimate (k-1) * domain / kth_smallest_hash (Bar-Yossef et al. "
    "2002 / the theta-sketch family) — the MERGEABLE distinct sketch "
    "whose state is exactly K hashes, built here as Spark would build "
    "it at 100 TB: a two-level tree (per-(group, salt) top-K via a "
    "keyed window over {KMV_SALTS} salt buckets, then a merge of the "
    "bounded K x {KMV_SALTS} survivors) so no single task ever ranks "
    "a whole group's distinct stream and union-merge across "
    "partitions/days is the same top-K-of-union operation. Unlike "
    "HLL (q56's bounds contract) the KMV state is deterministic given "
    "the hash function, so the shared md5-h32 family makes the "
    "estimate EXACTLY reproducible on both engines — the oracle "
    "hash-matches estimate, kth hash, and relative error, and the "
    "two-level Spark tree provably equals the oracle's flat rank "
    "(each salt bucket keeps a superset of its global-top-K members).",
)
def q202_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import shingle_h32

    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        "event_type", shingle_h32(F.col("user_id").cast("string")).alias("h")
    ).distinct()
    # level 1: top-K per (group, salt) — bounded keyed windows, no
    # group-wide rank of the full distinct stream
    w1 = Window.partitionBy("event_type", "salt").orderBy("h")
    partial = (
        h.withColumn("salt", F.pmod("h", F.lit(KMV_SALTS)))
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= KMV_K)
        .select("event_type", "h")
    )
    # level 2: top-K of the <= K * SALTS survivors per group
    w2 = Window.partitionBy("event_type").orderBy("h")
    sketch = (
        partial.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.max("h").alias("kth_hash"),
        )
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    est = F.when(
        F.col("k") < KMV_K, F.col("k").cast("double")
    ).otherwise(
        F.round((F.col("k") - 1) * F.lit(KMV_DOMAIN) / F.col("kth_hash"), 6)
    )
    return (
        exact.join(sketch, "event_type")
        .withColumn("est_distinct", est)
        .select(
            "event_type",
            "exact_distinct",
            "k",
            "kth_hash",
            "est_distinct",
            F.round(
                F.abs(F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                6,
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q209 — exact weighted median, bucketed two-phase (no fat group window)
# ---------------------------------------------------------------------------

#: price bucket width in cents for the weighted-median pre-aggregation
#: (l_extendedprice < ~$110k -> a few hundred buckets per group)
WMED_BUCKET_C = 100_000

_WMED_ORACLE = f"""
    WITH s AS (
      SELECT l_returnflag AS grp,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
    ),
    cum AS (
      SELECT grp, price_c, w,
             SUM(w) OVER (PARTITION BY grp ORDER BY price_c
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cw,
             SUM(w) OVER (PARTITION BY grp) AS tw
      FROM s
    )
    SELECT grp AS l_returnflag,
           CAST(MAX(tw) AS BIGINT) AS total_weight,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN price_c END) AS DOUBLE) / 100.0
             AS weighted_median
    FROM cum
    GROUP BY grp
    ORDER BY l_returnflag
    """


@register(
    "q209_weighted_median",
    _WMED_ORACLE,
    doc="EXACT weighted median (lower weighted median: the smallest "
    "value whose inclusive cumulative weight reaches half the total) "
    "of extended price weighted by quantity, per return flag — the "
    "robust 'typical order value' that a plain median misses when "
    "line sizes vary. Scale shape: a handful of groups would make "
    "the naive per-group cumulative window a few giant single-task "
    "sorts, so the plan is BUCKETED TWO-PHASE: (1) weights "
    "pre-aggregate onto (group, $1000 price bucket) — a bounded "
    "frame, hundreds of rows — whose running sums locate each "
    "group's median BUCKET and the exact weight carried into it; "
    "(2) only rows of that one bucket per group are revisited, "
    "pre-aggregated by distinct price, and the crossing point is an "
    "exact integer comparison 2*(carry + cum) >= total. Ties need no "
    "tie-break: whatever order equal prices accumulate in, the "
    "crossing value is the same. All weights are BIGINT sums — "
    "bit-deterministic under any partitioning; the oracle states the "
    "same median via the naive per-group window, affordable at test "
    "scale, so equality proves the two-phase refinement lossless.",
)
def q209_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    b = s.withColumn("bucket", (F.col("price_c") / WMED_BUCKET_C).cast("long"))
    # phase 1: bounded (grp, bucket) weight frame -> median bucket +
    # carried-in weight, all on a few hundred rows
    bw = b.groupBy("grp", "bucket").agg(F.sum("w").alias("bw"))
    lo = bw.select(
        F.col("grp").alias("lo_g"), F.col("bucket").alias("lo_b"),
        F.col("bw").alias("lo_w"),
    )
    cumb = (
        bw.join(F.broadcast(lo), (F.col("lo_g") == F.col("grp")))
        .groupBy("grp", "bucket", "bw")
        .agg(
            F.sum(F.when(F.col("lo_b") < F.col("bucket"), F.col("lo_w"))
                  .otherwise(0)).alias("carry"),
            F.sum("lo_w").alias("tw"),
        )
    )
    med_bucket = (
        cumb.filter(2 * (F.col("carry") + F.col("bw")) >= F.col("tw"))
        .groupBy("grp")
        .agg(
            F.min_by(F.struct("bucket", "carry", "tw"), "bucket").alias("mb")
        )
        .select(
            "grp", F.col("mb.bucket").alias("bucket"),
            F.col("mb.carry").alias("carry"), F.col("mb.tw").alias("tw"),
        )
    )
    # phase 2: revisit ONLY the median bucket's rows, pre-aggregated by
    # distinct price; keyed window over (grp, bucket) — one bounded
    # partition per group, never the whole group
    inb = (
        b.join(F.broadcast(med_bucket), ["grp", "bucket"])
        .groupBy("grp", "bucket", "carry", "tw", "price_c")
        .agg(F.sum("w").alias("pw"))
    )
    wcum = Window.partitionBy("grp", "bucket").orderBy("price_c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hit = inb.withColumn("cum", F.sum("pw").over(wcum)).filter(
        2 * (F.col("carry") + F.col("cum")) >= F.col("tw")
    )
    return (
        hit.groupBy("grp")
        .agg(
            F.max("tw").alias("total_weight"),
            (F.min("price_c").cast("double") / 100.0).alias("weighted_median"),
        )
        .select(
            F.col("grp").alias("l_returnflag"), "total_weight",
            "weighted_median",
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q213 — theta-sketch cross-source shingle overlap (KMV set operations)
# ---------------------------------------------------------------------------


def _q213_oracle() -> str:
    from .dedup import _SH_SQL

    return f"""
    WITH sh AS ({_SH_SQL}),
    sh2 AS (
      SELECT DISTINCT d.source, s.shingle AS h
      FROM sh s JOIN documents d USING (doc_id)
    ),
    ranked AS (
      SELECT source, h,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
      FROM sh2
    ),
    sk AS (SELECT source, h FROM ranked WHERE rn <= {KMV_K}),
    stats AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS k_n, MAX(h) AS kth
      FROM sk GROUP BY source
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             a.k_n AS k_a, b.k_n AS k_b,
             LEAST(a.kth, b.kth) AS theta
      FROM stats a JOIN stats b ON a.source < b.source
    ),
    ca AS (
      SELECT p.source_a, p.source_b, CAST(COUNT(*) AS BIGINT) AS n_a
      FROM pairs p JOIN sk s ON s.source = p.source_a AND s.h <= p.theta
      GROUP BY p.source_a, p.source_b
    ),
    cb AS (
      SELECT p.source_a, p.source_b, CAST(COUNT(*) AS BIGINT) AS n_b
      FROM pairs p JOIN sk s ON s.source = p.source_b AND s.h <= p.theta
      GROUP BY p.source_a, p.source_b
    ),
    cm AS (
      SELECT p.source_a, p.source_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM pairs p
      JOIN sk x ON x.source = p.source_a AND x.h <= p.theta
      JOIN sk y ON y.source = p.source_b AND y.h = x.h
      GROUP BY p.source_a, p.source_b
    )
    SELECT p.source_a, p.source_b, p.k_a, p.k_b, p.theta,
           COALESCE(ca.n_a, 0) + COALESCE(cb.n_b, 0)
             - COALESCE(cm.n_common, 0) AS n_union,
           COALESCE(cm.n_common, 0) AS n_common,
           CAST(COALESCE(cm.n_common, 0) AS DOUBLE)
             / (COALESCE(ca.n_a, 0) + COALESCE(cb.n_b, 0)
                - COALESCE(cm.n_common, 0)) AS jaccard_est,
           round(COALESCE(cm.n_common, 0) * {KMV_DOMAIN} / p.theta, 6)
             AS est_intersection
    FROM pairs p
    LEFT JOIN ca USING (source_a, source_b)
    LEFT JOIN cb USING (source_a, source_b)
    LEFT JOIN cm USING (source_a, source_b)
    ORDER BY source_a, source_b
    """


@register(
    "q213_theta_sketch_overlap",
    _q213_oracle(),
    doc="Theta-sketch SET OPERATIONS over per-source KMV sketches: "
    "every source keeps only its K smallest distinct word-shingle "
    "hashes (the q202 sketch, one corpus pass), and every source "
    "PAIR's shared-vocabulary size and Jaccard are then estimated "
    "from sketches alone — restrict both sketches to h <= theta = "
    "min(kth_a, kth_b) (below theta each sketch is a FULL record of "
    "its set's hashes, so intersection/union counts there are exact "
    "samples at rate theta/domain), then est_intersection = n_common "
    "* domain / theta and jaccard = n_common / n_union. This is the "
    "cross-source overlap matrix WITHOUT the q191 pair ladder: at "
    "100 TB the corpus is read ONCE to build #sources x K longs of "
    "state, and the quadratic part runs on sketches (bounded by "
    "sources^2 x K, independent of corpus bytes) — the standard "
    "Theta-sketch workflow (Dasgupta et al., 'Theta-Sketch "
    "Framework'). Deterministic md5-h32 hashing makes every estimate "
    "bit-reproducible on both engines; pairs with zero sketch "
    "overlap emit explicit zero rows (LEFT joins, the q161 "
    "zero-class rule). Spark's per-source top-K is the q202 "
    "two-level salt tree — no group-wide rank of a full distinct "
    "stream; the pair stage broadcasts the bounded sketch frame.",
)
def q213_theta_sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.fragments import fragment
    from .dedup import _shingle_sets

    sh = fragment(
        spark, sf_dir, "shingle_sets", lambda: _shingle_sets(spark, sf_dir)
    )
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sh2 = (
        sh.select("doc_id", F.explode("shingles").alias("h"))
        .join(src, "doc_id")
        .select("source", "h")
        .distinct()
    )
    w1 = Window.partitionBy("source", "salt").orderBy("h")
    partial = (
        sh2.withColumn("salt", F.pmod("h", F.lit(KMV_SALTS)))
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= KMV_K)
        .select("source", "h")
    )
    w2 = Window.partitionBy("source").orderBy("h")
    sk = (
        partial.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= KMV_K)
        .select("source", "h")
    )
    stats = sk.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("k_n"), F.max("h").alias("kth")
    )
    a = stats.select(
        F.col("source").alias("source_a"),
        F.col("k_n").alias("k_a"),
        F.col("kth").alias("kth_a"),
    )
    b = stats.select(
        F.col("source").alias("source_b"),
        F.col("k_n").alias("k_b"),
        F.col("kth").alias("kth_b"),
    )
    pairs = (
        a.join(b, F.col("source_a") < F.col("source_b"))
        .select(
            "source_a", "source_b", "k_a", "k_b",
            F.least("kth_a", "kth_b").alias("theta"),
        )
    )
    sk_a = sk.select(F.col("source").alias("source_a"), "h")
    sk_b = sk.select(F.col("source").alias("source_b"), F.col("h").alias("hb"))
    bp = F.broadcast(pairs)
    ca = (
        bp.join(sk_a, "source_a")
        .filter(F.col("h") <= F.col("theta"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    )
    cb = (
        bp.join(
            sk_b.withColumnRenamed("hb", "h"), "source_b"
        )
        .filter(F.col("h") <= F.col("theta"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    )
    # common hashes: restrict A-side to <= theta, equi-join B's sketch on h
    cm = (
        bp.join(sk_a, "source_a")
        .filter(F.col("h") <= F.col("theta"))
        .join(
            sk.select(F.col("source").alias("source_b"), "h"),
            ["source_b", "h"],
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    n_a = F.coalesce("n_a", F.lit(0))
    n_b = F.coalesce("n_b", F.lit(0))
    n_common = F.coalesce("n_common", F.lit(0))
    n_union = n_a + n_b - n_common
    return (
        pairs.join(ca, ["source_a", "source_b"], "left")
        .join(cb, ["source_a", "source_b"], "left")
        .join(cm, ["source_a", "source_b"], "left")
        .select(
            "source_a", "source_b", "k_a", "k_b", "theta",
            n_union.alias("n_union"),
            n_common.alias("n_common"),
            (n_common.cast("double") / n_union).alias("jaccard_est"),
            F.round(n_common * F.lit(KMV_DOMAIN) / F.col("theta"), 6).alias(
                "est_intersection"
            ),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# q216 — winsorized robust stats per event type
# ---------------------------------------------------------------------------

WINSOR_LO = 0.05
WINSOR_HI = 0.95


@register(
    "q216_winsorized_stats",
    f"""
    WITH cuts AS (
      SELECT event_type,
             quantile_cont(value, {WINSOR_LO}) AS lo,
             quantile_cont(value, {WINSOR_HI}) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(c.lo, 6) AS p05,
           round(c.hi, 6) AS p95,
           round(AVG(e.value), 6) AS mean_raw,
           round(AVG(LEAST(GREATEST(e.value, c.lo), c.hi)), 6)
             AS mean_winsor,
           CAST(SUM(CASE WHEN e.value < c.lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clip_lo,
           CAST(SUM(CASE WHEN e.value > c.hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clip_hi
    FROM events e JOIN cuts c USING (event_type)
    GROUP BY e.event_type, c.lo, c.hi
    ORDER BY e.event_type
    """,
    doc="Winsorized feature statistics per event type: exact "
    "interpolated p05/p95 cut points (the q29 percentile contract — "
    "both engines sort-and-interpolate, values hash-match after "
    "round 6), values clamped into [p05, p95], and the raw vs "
    "winsorized mean side by side with clip counts — the standard "
    "feature-engineering guard against heavy-tailed telemetry "
    "before normalization or model training (one fat-fingered "
    "sensor reading no longer drags the feature mean). Plan: one "
    "sort-based percentile aggregate over the bounded event-type "
    "key space, the tiny (type, lo, hi) cut table broadcast back "
    "onto the scan, one partial+final aggregate — two passes over "
    "the fact, zero windows, zero Python; exactly how a cluster "
    "job winsorizes 100 TB (the cut table is KB-sized for any "
    "real key cardinality).",
)
def q216_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cuts = ev.groupBy("event_type").agg(
        F.expr(f"percentile(value, {WINSOR_LO})").alias("lo"),
        F.expr(f"percentile(value, {WINSOR_HI})").alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.first("lo"), 6).alias("p05"),
            F.round(F.first("hi"), 6).alias("p95"),
            F.round(F.avg("value"), 6).alias("mean_raw"),
            F.round(F.avg(clamped), 6).alias("mean_winsor"),
            F.sum((F.col("value") < F.col("lo")).cast("int"))
            .cast("long")
            .alias("n_clip_lo"),
            F.sum((F.col("value") > F.col("hi")).cast("int"))
            .cast("long")
            .alias("n_clip_hi"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q217 — deterministic bootstrap CI for the per-type mean
# ---------------------------------------------------------------------------

#: bootstrap replicates; each is a deterministic half-sample keyed by
#: md5(event_id:rep), so the resample replays identically under any
#: partitioning and on both engines
BOOT_REPS = 32


@register(
    "q217_bootstrap_ci",
    f"""
    WITH reps AS (
      SELECT e.event_type, t.rep, e.value
      FROM events e, UNNEST(range(0, {BOOT_REPS})) AS t(rep)
      WHERE ('0x' || substr(md5(CAST(e.event_id AS VARCHAR) || ':'
                                || CAST(t.rep AS VARCHAR)), 1, 8))::BIGINT
            % 2 = 0
    ),
    rep_means AS (
      SELECT event_type, rep, AVG(value) AS m
      FROM reps GROUP BY event_type, rep
    ),
    fullm AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             AVG(value) AS full_mean
      FROM events GROUP BY event_type
    )
    SELECT r.event_type, f.n,
           round(f.full_mean, 6) AS full_mean,
           CAST(COUNT(*) AS BIGINT) AS n_reps,
           round(AVG(r.m), 6) AS boot_mean,
           round(quantile_cont(r.m, 0.025), 6) AS ci_lo,
           round(quantile_cont(r.m, 0.975), 6) AS ci_hi
    FROM rep_means r JOIN fullm f USING (event_type)
    GROUP BY r.event_type, f.n, f.full_mean
    ORDER BY r.event_type
    """,
    doc=f"Distribution-free confidence interval for the per-type mean "
    f"via a DETERMINISTIC bootstrap: {BOOT_REPS} half-sample "
    f"replicates, where replicate r includes an event iff "
    f"md5-h32(event_id:r) is even — the hash-seeded resampling "
    f"pattern that replays identically under any partitioning, "
    f"retry, or engine (the property Math.random-style resampling "
    f"loses on a cluster; cf. Kleiner et al.'s bag-of-little-"
    f"bootstraps for why resampling at scale must be shard-"
    f"deterministic). The CI is the 2.5/97.5 interpolated "
    f"percentile of the replicate means (q29 percentile contract). "
    f"Plan: the replicate fan-out is a constant-factor explode "
    f"(x{BOOT_REPS}) feeding one partial+final aggregate on "
    f"(type, rep) — map-side combine collapses it before the "
    f"shuffle, so the wire carries one row per (type, rep); the "
    f"percentile then runs over {BOOT_REPS} rows per type. No "
    f"windows, no Python, no driver state.",
)
def q217_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import shingle_h32

    ev = load_table(spark, sf_dir, "events")
    reps = ev.select(
        "event_type", "event_id", "value",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_REPS - 1))).alias("rep"),
    ).filter(
        F.pmod(
            shingle_h32(
                F.concat(
                    F.col("event_id").cast("string"),
                    F.lit(":"),
                    F.col("rep").cast("string"),
                )
            ),
            F.lit(2),
        )
        == 0
    )
    rep_means = reps.groupBy("event_type", "rep").agg(F.avg("value").alias("m"))
    full = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("value").alias("full_mean"),
    )
    return (
        rep_means.join(F.broadcast(full), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("n").alias("n"),
            F.round(F.first("full_mean"), 6).alias("full_mean"),
            F.count(F.lit(1)).cast("long").alias("n_reps"),
            F.round(F.avg("m"), 6).alias("boot_mean"),
            F.round(F.expr("percentile(m, 0.025)"), 6).alias("ci_lo"),
            F.round(F.expr("percentile(m, 0.975)"), 6).alias("ci_hi"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q220 — k-anonymity equivalence-class audit
# ---------------------------------------------------------------------------

#: minimum class size below which a quasi-identifier combination is a
#: re-identification risk (the classical k in k-anonymity)
K_ANON = 5

#: value band width for the quasi-identifier tuple
K_ANON_BAND = 25.0


@register(
    "q220_k_anonymity_audit",
    f"""
    WITH q AS (
      SELECT event_type,
             CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
             CAST(FLOOR(value / {K_ANON_BAND}) AS BIGINT) AS value_band,
             user_id
      FROM events
    )
    SELECT event_type, day, hour, value_band,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           COUNT(*) < {K_ANON} AS is_violation
    FROM q
    GROUP BY event_type, day, hour, value_band
    ORDER BY event_type, day, hour, value_band
    """,
    doc=f"k-anonymity audit over the released-event shape (the privacy "
    f"gate a governance pipeline runs before publishing telemetry or "
    f"training on user data): rows group into equivalence classes by "
    f"their quasi-identifier tuple (event type, day, hour, "
    f"value band of width {K_ANON_BAND:g}) and any class with fewer "
    f"than k={K_ANON} rows is flagged — a row in a small class is "
    f"re-identifiable by linking those attributes alone. Emits every "
    f"class with its row count, distinct-user count (the stricter "
    f"k-map variant rides along), and the violation flag, so the "
    f"suppress-or-generalize rewrite downstream has its exact "
    f"worklist. One keyed groupBy; distinct-user is the standard "
    f"two-phase expand — nothing global. The band uses FLOOR of an "
    f"exact double division, identical in both engines.",
)
def q220_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.hour("ts").cast("long").alias("hour"),
        F.floor(F.col("value") / K_ANON_BAND).cast("long").alias("value_band"),
        "user_id",
    )
    return (
        q.groupBy("event_type", "day", "hour", "value_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .withColumn("is_violation", F.col("n_rows") < K_ANON)
        .orderBy("event_type", "day", "hour", "value_band")
    )
