"""Checkpoint restart recovery for the stateful streaming pipeline.

The reference survives a crash because the broker redelivers unacked
messages and the per-device GenServer replays its Cassandra-backed
state; the Spark analog is Structured Streaming checkpointing — source
offsets AND the applyInPandasWithState GroupState must both come back
on restart. This test runs the pipeline, kills the query, appends more
source files (including a redelivery of an already-processed message
id), restarts from the same checkpoint, and asserts:

- batch-1 outputs are not re-emitted (offset recovery),
- the redelivered message id is deduped (DeviceState.seen_message_ids
  recovered from the state store — the cross-restart half of A3 that
  s74 cannot cover in a single run).
"""

from __future__ import annotations

import tempfile

from astarte_data_updater_plant_spark.functions.payloads import encode_document
from astarte_data_updater_plant_spark.streaming.pipeline import (
    MESSAGE_SCHEMA,
    datastream_table,
    run_stream,
)

from .fixtures_flow import DEVICE, REALM, _t


def _base():
    return dict(realm=REALM, device_id=DEVICE, interface=None, path=None,
                payload=None, ip_address=None)


BATCH1 = [
    dict(_base(), message_id="r01", reception_timestamp=_t(0), msg_type="connection",
         ip_address="10.0.0.1"),
    dict(_base(), message_id="r02", reception_timestamp=_t(1), msg_type="introspection",
         payload=b"com.test.SimpleStreamTest:1:0"),
    dict(_base(), message_id="r03", reception_timestamp=_t(2), msg_type="data",
         interface="com.test.SimpleStreamTest", path="/0/value",
         payload=encode_document({"v": 5})),
]

BATCH2 = [
    # broker redelivery of r03 after the "crash" — must be deduped
    # against state recovered from the checkpoint
    dict(_base(), message_id="r03", reception_timestamp=_t(2), msg_type="data",
         interface="com.test.SimpleStreamTest", path="/0/value",
         payload=encode_document({"v": 5})),
    dict(_base(), message_id="r04", reception_timestamp=_t(3), msg_type="data",
         interface="com.test.SimpleStreamTest", path="/0/value",
         payload=encode_document({"v": 6})),
]


def _write_batch(spark, src_dir, msgs):
    rows = [tuple(m.get(f.name) for f in MESSAGE_SCHEMA.fields) for m in msgs]
    spark.createDataFrame(rows, MESSAGE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)


def _run_until_drained(spark, src_dir, out_dir, ckpt_dir):
    stream = spark.readStream.schema(MESSAGE_SCHEMA).parquet(src_dir)
    ds = datastream_table(run_stream(stream))
    query = (
        ds.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(600)


def test_restart_recovers_offsets_and_state(spark):
    src_dir = tempfile.mkdtemp(prefix="recov_src_")
    out_dir = tempfile.mkdtemp(prefix="recov_out_")
    ckpt_dir = tempfile.mkdtemp(prefix="recov_ckpt_")

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
    )
    try:
        _write_batch(spark, src_dir, BATCH1)
        _run_until_drained(spark, src_dir, out_dir, ckpt_dir)

        first = spark.read.parquet(out_dir).collect()
        assert [r.integer_value for r in first] == [5]

        # "crash": the query is stopped; new files (with a redelivery)
        # arrive; restart the SAME pipeline on the SAME checkpoint
        _write_batch(spark, src_dir, BATCH2)
        _run_until_drained(spark, src_dir, out_dir, ckpt_dir)

        rows = spark.read.parquet(out_dir).orderBy("reception_timestamp").collect()
        # exactly two datastream rows: 5 (batch 1, not re-emitted) and
        # 6 (batch 2); the redelivered r03 was dropped by recovered state
        assert [r.integer_value for r in rows] == [5, 6]
        assert all(r.device_id == DEVICE and r.realm == REALM for r in rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
