"""Batch re-expressions of the reference's per-device stateful semantics.

The events table is stream-shaped (TESTDATA.md): ``user_id`` plays the
device, ``event_type`` the interface path, ``props`` the payload. Each
query here is the batch (reprocessing) form of a stateful operator that
``streaming/state_machine.py`` implements incrementally:

- latest-value per key  = properties last-write-wins read
  (reference ``queries.ex:121-155`` upsert semantics)
- lag() change detection = value_change trigger events
  (reference ``impl.ex:233-309,353-370``)
- counters per device    = total/per-interface exchanged counters
  (reference ``impl.ex:623-674``)
- first-seen per path    = datastream path registry
  (reference ``queries.ex:353-393``)

Scale notes: every window partitions by (user_id[, event_type]) — the
natural shard key, same as the reference's consistent-hash routing —
so state never concentrates on one executor; no global sorts except
final presentation ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import drate
from ..plans.registry import register
from ..sources.tables import load_table

_R = "DECIMAL(8,4)"


@register(
    "q10_latest_value_per_key",
    """
    SELECT user_id, event_type, ts AS last_ts, value AS last_value
    FROM (
      SELECT user_id, event_type, ts, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) t
    WHERE rn = 1
    ORDER BY user_id, event_type
    """,
    doc="Properties LWW read: latest value per (device, path). "
    "row_number over a desc (ts, event_id) order reproduces Cassandra's "
    "last-write-wins upsert (queries.ex:121-155).",
)
def q10_latest_value_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("last_ts"),
            F.col("value").alias("last_value"),
        )
        .orderBy("user_id", "event_type")
    )


@register(
    "q11_value_change_events",
    """
    SELECT user_id, event_type, ts, value AS new_value, prev_value AS old_value
    FROM (
      SELECT user_id, event_type, ts, value,
             LAG(value) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) AS prev_value
      FROM events
    ) t
    WHERE prev_value IS NOT NULL AND value <> prev_value
    ORDER BY user_id, event_type, ts
    """,
    doc="value_change trigger feed: the reference fetches the previous "
    "stored value per path and emits a change event when it differs "
    "(impl.ex:233-309). Batch form: lag() per key in arrival order.",
)
def q11_value_change_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_value", F.lag("value").over(w))
        .filter(F.col("prev_value").isNotNull() & (F.col("value") != F.col("prev_value")))
        .select(
            "user_id",
            "event_type",
            "ts",
            F.col("value").alias("new_value"),
            F.col("prev_value").alias("old_value"),
        )
        .orderBy("user_id", "event_type", "ts")
    )


@register(
    "q12_device_counters",
    f"""
    SELECT
      user_id,
      COUNT(*) AS total_received_msgs,
      CAST(SUM(CAST(value AS {_R})) AS DOUBLE) AS total_received_bytes,
      MIN(ts) AS first_seen,
      MAX(ts) AS last_seen,
      COUNT(DISTINCT event_type) AS n_interfaces
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Device counters (impl.ex:623-674, queries.ex:478-510): total "
    "messages/bytes plus first/last activity per device, as one "
    "partial+final aggregate.",
)
def q12_device_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("total_received_msgs"),
            F.sum(drate("value")).cast("double").alias("total_received_bytes"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
            F.countDistinct("event_type").alias("n_interfaces"),
        )
        .orderBy("user_id")
    )


@register(
    "q13_interface_counters",
    f"""
    SELECT
      user_id,
      event_type,
      COUNT(*) AS exchanged_msgs,
      CAST(SUM(CAST(value AS {_R})) AS DOUBLE) AS exchanged_bytes
    FROM events
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
    doc="Per-(device, interface) exchanged msgs/bytes counters "
    "(queries.ex:493-494 Cassandra map '+' merge) as a grouped aggregate.",
)
def q13_interface_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("exchanged_msgs"),
            F.sum(drate("value")).cast("double").alias("exchanged_bytes"),
        )
        .orderBy("user_id", "event_type")
    )


@register(
    "q14_path_registry",
    """
    SELECT user_id, event_type, MIN(ts) AS first_seen_ts, COUNT(*) AS n_points
    FROM events
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
    doc="Datastream path registry (queries.ex:353-393): first-seen "
    "timestamp per (device, path) discovered from the stream itself.",
)
def q14_path_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("first_seen_ts"), F.count(F.lit(1)).alias("n_points"))
        .orderBy("user_id", "event_type")
    )


@register(
    "q15_topk_per_device",
    """
    SELECT user_id, event_id, event_type, ts, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY value DESC, event_id
      ) AS rn
      FROM events
    ) t
    WHERE rn <= 3
    ORDER BY user_id, value DESC, event_id
    """,
    doc="Per-key top-k: the per-partition LIMIT of the reference's "
    "clustering-key reads generalized; window row_number <= k avoids a "
    "global sort.",
)
def q15_topk_per_device(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "event_type", "ts", "value")
        .orderBy("user_id", F.col("value").desc(), "event_id")
    )


@register(
    "q16_hourly_windows",
    f"""
    SELECT
      date_trunc('hour', ts) AS window_start,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS {_R})) AS DOUBLE) AS sum_value,
      COUNT(DISTINCT user_id) AS n_devices
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    doc="Tumbling 1-hour event-time window aggregate — the batch shape of "
    "the streaming windowed rollup (streaming side uses window() + "
    "watermark; semantics identical on closed windows).",
)
def q16_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(drate("value")).cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_devices"),
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "q17_running_total",
    f"""
    SELECT user_id, event_id, ts,
      CAST(SUM(CAST(value AS {_R})) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS DOUBLE) AS running_bytes
    FROM events
    ORDER BY user_id, ts, event_id
    """,
    doc="Running per-device byte counter — the incremental counter state "
    "of impl.ex:623-674 materialized as a cumulative window frame.",
)
def q17_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(drate("value")).over(w).cast("double").alias("running_bytes"),
    ).orderBy("user_id", "ts", "event_id")


@register(
    "q90_scd2_intervals",
    """
    SELECT user_id, event_type,
           value AS state_value,
           ts AS valid_from,
           LEAD(ts) OVER (
             PARTITION BY user_id, event_type ORDER BY ts, event_id
           ) AS valid_to,
           CAST(LEAD(ts) OVER (
             PARTITION BY user_id, event_type ORDER BY ts, event_id
           ) IS NULL AS BOOLEAN) AS is_current
    FROM events
    ORDER BY user_id, event_type, valid_from
    """,
    doc="Slowly-changing-dimension type 2 materialization: every "
    "observed value becomes a validity interval [valid_from, "
    "valid_to) with the successor's timestamp as the exclusive upper "
    "bound and NULL marking the current row — the historized form of "
    "the properties table (q10 reads only the is_current slice; the "
    "reference keeps just that last write, queries.ex:121-155, and "
    "this is what it costs to keep ALL of history queryable). One "
    "shuffle on the SCD key, one in-partition sort, lead() fills both "
    "the bound and the current flag in a single window pass — the "
    "as-of audit-query substrate at any scale.",
)
def q90_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    valid_to = F.lead("ts").over(w)
    return (
        ev.select(
            "user_id",
            "event_type",
            F.col("value").alias("state_value"),
            F.col("ts").alias("valid_from"),
            valid_to.alias("valid_to"),
            valid_to.isNull().alias("is_current"),
        )
        .orderBy("user_id", "event_type", "valid_from")
    )
