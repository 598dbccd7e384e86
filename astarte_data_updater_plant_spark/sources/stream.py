"""Message-stream synthesis: events table -> A1-shaped message rows.

The driver's generic events table is stream-shaped (TESTDATA.md):
``user_id`` = device, ``event_type`` = sensor path, ``value`` =
payload. This module turns it into the engine's wire format — BSON
``{v: value}`` data messages plus one introspection announcement per
device — so the full ingest path (decode -> validate -> route ->
typed storage) can be exercised and oracle-checked on shared data.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Aggregation, Interface, InterfaceType, Mapping, Ownership
from ..types import ValueType
from .tables import load_table

TELEMETRY_REALM = "benchrealm"
TELEMETRY_INTERFACE = "com.iot.Telemetry"
TELEMETRY_INTROSPECTION = b"com.iot.Telemetry:1:0"


def telemetry_interface() -> Interface:
    """One parametric double endpoint: /%{sensor}/value."""
    return Interface(
        name=TELEMETRY_INTERFACE,
        major=1,
        minor=0,
        type=InterfaceType.DATASTREAM,
        ownership=Ownership.DEVICE,
        aggregation=Aggregation.INDIVIDUAL,
        interface_id="telemetry-0001",
        mappings=(
            Mapping("/%{sensor}/value", ValueType.DOUBLE, endpoint_id="telemetry-value"),
        ),
    )


def events_as_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> message_stream rows (MESSAGE_SCHEMA).

    Data messages carry real BSON payloads built in an Arrow-batched
    mapInPandas stage; one introspection message per device precedes
    its data (reception = min(ts) - 1s). Both branches stay
    partition-parallel; the only shuffle is the introspection groupBy
    on device.
    """
    from ..functions.payloads import encode_document
    from ..streaming.pipeline import MESSAGE_SCHEMA

    ev = load_table(spark, sf_dir, "events")

    def to_msgs(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "message_id": pdf["event_id"].map(lambda i: f"ev-{i}"),
                    "reception_timestamp": pdf["ts"],
                    "realm": TELEMETRY_REALM,
                    "device_id": pdf["user_id"].astype(str),
                    "msg_type": "data",
                    "interface": TELEMETRY_INTERFACE,
                    "path": pdf["event_type"].map(lambda t: f"/{t}/value"),
                    "payload": pdf["value"].map(lambda v: encode_document({"v": float(v)})),
                    "ip_address": None,
                }
            )

    data_msgs = ev.select("event_id", "ts", "user_id", "event_type", "value").mapInPandas(
        to_msgs, schema=MESSAGE_SCHEMA
    )
    intro_msgs = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select(
            F.concat(F.lit("intro-"), F.col("user_id").cast("string")).alias("message_id"),
            (F.col("first_ts") - F.expr("INTERVAL 1 SECOND")).alias("reception_timestamp"),
            F.lit(TELEMETRY_REALM).alias("realm"),
            F.col("user_id").cast("string").alias("device_id"),
            F.lit("introspection").alias("msg_type"),
            F.lit(None).cast("string").alias("interface"),
            F.lit(None).cast("string").alias("path"),
            F.lit(TELEMETRY_INTROSPECTION).alias("payload"),
            F.lit(None).cast("string").alias("ip_address"),
        )
    )
    return data_msgs.unionByName(intro_msgs)


# self-ship for the mapInPandas closure
try:
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover
    pass


OBJECT_INTERFACE = "com.iot.ObjectTelemetry"
OBJECT_INTROSPECTION = b"com.iot.ObjectTelemetry:1:0"


def object_interface() -> Interface:
    """Object-aggregated twin of the telemetry interface: every message
    is one wide row with a string and a double leaf (the TestObject
    shape, database_test_helper.exs:243-254)."""
    return Interface(
        name=OBJECT_INTERFACE,
        major=1,
        minor=0,
        type=InterfaceType.DATASTREAM,
        ownership=Ownership.DEVICE,
        aggregation=Aggregation.OBJECT,
        interface_id="objtelemetry-01",
        mappings=(
            Mapping("/kind", ValueType.STRING, endpoint_id="obj-kind"),
            Mapping("/reading", ValueType.DOUBLE, endpoint_id="obj-reading"),
        ),
    )


def events_as_object_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> object-aggregated data messages: BSON
    {v: {kind, reading}} at path '/' (one wide row per message,
    queries.ex:199-297)."""
    from ..functions.payloads import encode_document
    from ..streaming.pipeline import MESSAGE_SCHEMA

    ev = load_table(spark, sf_dir, "events")

    def to_msgs(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "message_id": pdf["event_id"].map(lambda i: f"ob-{i}"),
                    "reception_timestamp": pdf["ts"],
                    "realm": TELEMETRY_REALM,
                    "device_id": pdf["user_id"].astype(str),
                    "msg_type": "data",
                    "interface": OBJECT_INTERFACE,
                    "path": "/",
                    "payload": [
                        encode_document({"v": {"kind": k, "reading": float(v)}})
                        for k, v in zip(pdf["event_type"], pdf["value"])
                    ],
                    "ip_address": None,
                }
            )

    data_msgs = ev.select("event_id", "ts", "user_id", "event_type", "value").mapInPandas(
        to_msgs, schema=MESSAGE_SCHEMA
    )
    intro_msgs = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select(
            F.concat(F.lit("ob-intro-"), F.col("user_id").cast("string")).alias("message_id"),
            (F.col("first_ts") - F.expr("INTERVAL 1 SECOND")).alias("reception_timestamp"),
            F.lit(TELEMETRY_REALM).alias("realm"),
            F.col("user_id").cast("string").alias("device_id"),
            F.lit("introspection").alias("msg_type"),
            F.lit(None).cast("string").alias("interface"),
            F.lit(None).cast("string").alias("path"),
            F.lit(OBJECT_INTROSPECTION).alias("payload"),
            F.lit(None).cast("string").alias("ip_address"),
        )
    )
    return data_msgs.unionByName(intro_msgs)
