"""Connector surface: Kafka wire-frame parse + graceful degradation.

The frame->message projection is the testable core of the Kafka
source adapter (the reference's AMQP header dispatch,
amqp_data_consumer.ex:167-270); the broker itself is not in this
container, so the stream constructor must fail with an actionable
error instead of a stack trace from deep inside the DataSource
resolution.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import types as T

from astarte_data_updater_plant_spark.functions.payloads import encode_document
from astarte_data_updater_plant_spark.sources.connectors import (
    ConnectorUnavailable,
    kafka_message_stream,
    parse_wire_frames,
)
from astarte_data_updater_plant_spark.streaming.pipeline import MESSAGE_SCHEMA

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("value", T.BinaryType()),
                    ]
                )
            ),
        ),
    ]
)


def _headers(**kv: str) -> list[tuple[str, bytes]]:
    return [(k, v.encode()) for k, v in kv.items()]


def test_parse_wire_frames_maps_headers_and_payload(spark):
    payload = encode_document({"v": 21.5})
    ts = dt.datetime(2024, 1, 1, 12, 0, 0)
    frames = spark.createDataFrame(
        [
            (
                None,
                payload,
                "astarte-data",
                0,
                7,
                ts,
                _headers(
                    x_realm="benchrealm",
                    x_device="dev-1",
                    x_type="data",
                    x_interface="com.iot.Telemetry",
                    x_path="/click/value",
                    x_message_id="m-7",
                ),
            ),
            # no x_message_id / x_type headers: falls back to
            # topic-partition-offset id and the 'data' default
            (None, payload, "astarte-data", 2, 40, ts,
             _headers(x_realm="benchrealm", x_device="dev-2")),
        ],
        schema=FRAME_SCHEMA,
    )
    msgs = parse_wire_frames(frames)
    assert msgs.schema.fieldNames() == MESSAGE_SCHEMA.fieldNames()
    rows = {r.message_id: r for r in msgs.collect()}
    assert rows["m-7"].realm == "benchrealm"
    assert rows["m-7"].device_id == "dev-1"
    assert rows["m-7"].interface == "com.iot.Telemetry"
    assert rows["m-7"].path == "/click/value"
    assert bytes(rows["m-7"].payload) == payload
    fallback = rows["astarte-data-2-40"]
    assert fallback.msg_type == "data"
    assert fallback.interface is None


def test_kafka_stream_raises_actionable_error_without_jar(spark):
    with pytest.raises(ConnectorUnavailable, match="spark-sql-kafka"):
        kafka_message_stream(spark, "localhost:9092", "astarte-data")
