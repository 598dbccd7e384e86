"""Broker / database connector surface.

The reference consumes AMQP queues with header-based dispatch
(``amqp_data_consumer.ex:109-126,167-270``: 5 message types routed on
``x_astarte_*`` headers, prefetch 300) and writes Cassandra tables
(``queries.ex``). Spark has no AMQP DataSource; in a Spark deployment
the broker tier is Kafka (or an AMQP->Kafka bridge), and this module
maps the reference's consumption contract onto the Kafka source
one-to-one:

  ==============================  =================================
  reference (AMQP)                this engine (Kafka source)
  ==============================  =================================
  durable data queue range        topic partitions (``subscribe``)
  consumer prefetch 300           ``maxOffsetsPerTrigger``
  header-based type dispatch      Kafka record headers -> columns
  per-device ordering (A2/A3)     per-partition order + keyed state
  ack after process               checkpointed offsets
  ==============================  =================================

The wire-frame parse (``parse_wire_frames``) is pure column logic and
fully tested; ``kafka_message_stream`` only composes it onto
``readStream.format("kafka")`` and raises ``ConnectorUnavailable``
with a clear message when the Kafka connector jar is not on the
classpath (it is not shipped in this environment).

The Cassandra side is the same shape: ``cassandra_write`` targets the
Spark-Cassandra connector format when its jar is present; the
engine's own lakehouse layout (``storage/``) is the first-class sink
and the default.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Header keys, mirroring the reference's x_astarte_* routing headers
#: (amqp_data_consumer.ex:167-270).
H_REALM = "x_realm"
H_DEVICE = "x_device"
H_TYPE = "x_type"
H_INTERFACE = "x_interface"
H_PATH = "x_path"
H_IP = "x_ip"
H_MESSAGE_ID = "x_message_id"

#: The reference's consumer prefetch (config.exs:25): max in-flight
#: messages per consumer, which on the Kafka source is the per-trigger
#: offset cap.
DEFAULT_PREFETCH = 300


class ConnectorUnavailable(RuntimeError):
    """Raised when an external connector jar is not on the classpath."""


def _header(name: str) -> Column:
    """Value of Kafka record header ``name`` as a string (null when
    absent) — the header-based dispatch of the reference, as a column
    expression over the Kafka source's ``headers`` array<struct>."""
    match = F.filter(F.col("headers"), lambda h: h["key"] == name)
    # try_element_at: absent header -> NULL (element_at throws under
    # ANSI semantics when the filtered array is empty)
    return F.try_element_at(match, F.lit(1))["value"].cast("string")


def parse_wire_frames(frames: DataFrame) -> DataFrame:
    """Kafka record frame -> MESSAGE_SCHEMA rows.

    ``frames`` must carry the Kafka source schema (key, value, topic,
    partition, offset, timestamp, headers). Routing metadata comes
    from headers exactly like the reference's AMQP dispatch; the BSON
    payload passes through opaque for the decode stage. Pure
    projection — runs identically on a stream or a batch of captured
    frames, zero shuffles.
    """
    return frames.select(
        F.coalesce(
            _header(H_MESSAGE_ID),
            F.concat_ws(
                "-", F.col("topic"), F.col("partition"), F.col("offset")
            ),
        ).alias("message_id"),
        F.col("timestamp").alias("reception_timestamp"),
        _header(H_REALM).alias("realm"),
        _header(H_DEVICE).alias("device_id"),
        F.coalesce(_header(H_TYPE), F.lit("data")).alias("msg_type"),
        _header(H_INTERFACE).alias("interface"),
        _header(H_PATH).alias("path"),
        F.col("value").alias("payload"),
        _header(H_IP).alias("ip_address"),
    )


def kafka_message_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    *,
    prefetch: int = DEFAULT_PREFETCH,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """The A1 source on Kafka: subscribe, cap in-flight offsets at the
    reference's prefetch, surface headers, and parse the wire frame.

    Raises ConnectorUnavailable when spark-sql-kafka is not on the
    classpath (this container does not ship it; on a real cluster add
    ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("maxOffsetsPerTrigger", str(prefetch))
        .option("includeHeaders", "true")
        .option("failOnDataLoss", "false")
    )
    try:
        frames = reader.load()
    except Exception as exc:  # connector jar missing -> actionable error
        raise ConnectorUnavailable(
            "Kafka source not on the classpath; add the "
            "spark-sql-kafka-0-10 package to the cluster"
        ) from exc
    return parse_wire_frames(frames)


def cassandra_write(
    table: str,
    keyspace: str,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body writing a micro-batch to Cassandra via the
    Spark-Cassandra connector (jar required on a real cluster); the
    engine's default sinks are the lakehouse tables in ``storage/``,
    and this adapter exists for parity with the reference's CQL
    writes (queries.ex:157-297).
    """

    def write(batch: DataFrame, _epoch: int) -> None:
        try:
            (
                batch.write.format("org.apache.spark.sql.cassandra")
                .mode("append")
                .options(table=table, keyspace=keyspace)
                .save()
            )
        except Exception as exc:
            raise ConnectorUnavailable(
                "Cassandra connector not on the classpath; add the "
                "spark-cassandra-connector package to the cluster"
            ) from exc

    return write
