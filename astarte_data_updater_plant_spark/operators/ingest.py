"""The ingest engine itself as declared, oracle-checked queries.

These entries run the COMPLETE reference dataflow — BSON decode,
introspection handling, schema validation, endpoint resolution, typed
routing, keyed state — over a message stream synthesized from the
shared events table, then check the materialized storage tables
against plain SQL on the ORIGINAL events. A hash match proves the
whole pipeline is lossless and deterministic end-to-end:

  events -> BSON wire format -> state machine -> typed tables == SQL

s72 additionally runs the windowed aggregate through Structured
Streaming (file source, complete mode) and hash-checks the streaming
result against the same batch oracle — streaming/batch unification on
real execution, not by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.stream import events_as_messages, telemetry_interface
from ..sources.tables import load_table
from ..streaming.pipeline import (
    datastream_table,
    device_snapshots_table,
    run_batch,
)

_R = "DECIMAL(8,4)"

#: BSON {v: double} payload is a fixed 16 bytes; the introspection
#: announcement is 21 bytes — the oracle reconstructs byte counters
#: arithmetically (see s71).
_BSON_DOUBLE_LEN = 16
_INTRO_LEN = 21


@register(
    "s70_ingest_datastreams",
    """
    SELECT CAST(user_id AS VARCHAR) AS device_id,
           '/' || event_type || '/value' AS path,
           ts AS value_timestamp,
           value AS double_value
    FROM events
    ORDER BY device_id, path, value_timestamp
    """,
    doc="Full ingest path, oracle-checked: events re-encoded as BSON "
    "messages, decoded and validated by the state machine, routed into "
    "individual_datastreams typed columns — must equal SQL over the "
    "original events bit-for-bit (doubles round-trip BSON exactly).",
)
def s70_ingest_datastreams(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = events_as_messages(spark, sf_dir)
    out = run_batch(msgs, interfaces=(telemetry_interface(),))
    ds = datastream_table(out)
    return ds.select(
        "device_id", "path", "value_timestamp", "double_value"
    ).orderBy("device_id", "path", "value_timestamp")


@register(
    "s71_ingest_device_counters",
    f"""
    SELECT CAST(user_id AS VARCHAR) AS device_id,
           CAST(COUNT(*) + 1 AS BIGINT) AS total_received_msgs,
           CAST(COUNT(*) * {_BSON_DOUBLE_LEN} + {_INTRO_LEN} AS BIGINT) AS total_received_bytes
    FROM events
    GROUP BY user_id
    ORDER BY device_id
    """,
    doc="Keyed-state counters, oracle-checked arithmetically: the state "
    "machine's per-device totals must equal count(*)+1 messages (one "
    "introspection each) and 16*count+21 payload bytes.",
)
def s71_ingest_device_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = events_as_messages(spark, sf_dir)
    out = run_batch(msgs, interfaces=(telemetry_interface(),))
    snap = device_snapshots_table(out)
    return snap.select(
        "device_id", "total_received_msgs", "total_received_bytes"
    ).orderBy("device_id")


@register(
    "s72_stream_hourly_windows",
    f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS {_R})) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    doc="Structured Streaming tumbling window (complete mode, file "
    "source) hash-checked against the batch SQL oracle: the streaming "
    "result of window(ts, 1 hour) equals the batch date_trunc "
    "aggregate on closed input.",
)
def s72_stream_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..sources.tables import table_path

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # schema for readStream: as stored (ts is nanos -> bigint)
    stored = spark.read.parquet(table_path(sf_dir, "events"))
    # FileStreamSource needs a directory: stream the sf dir with a
    # glob restricted to the events file
    stream = (
        spark.readStream.schema(stored.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(8,4)")).cast("double").alias("sum_value"),
        )
    )
    qname = "s72_stream_hourly"
    for q in spark.streams.active:
        if q.name == qname:
            q.stop()
    query = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="s72_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(600)
    return (
        spark.table(qname)
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )
