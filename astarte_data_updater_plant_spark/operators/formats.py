"""Source/sink format coverage: CSV and JSON round-trips.

The reference's sources and sinks are AMQP queues and Cassandra
tables (``amqp_data_consumer.ex:109-126``, ``queries.ex``); a Spark
engine's equivalent surface is the DataSource API. Parquet is the
primary format everywhere else in this repo; this module proves the
row-oriented interchange formats (CSV, JSON-lines) read and write
losslessly through the same DataFrame plans.

Scale notes: both formats are splittable line-oriented text when
uncompressed, so a 100 TB CSV/JSON landing zone scans with full
parallelism; schema is supplied explicitly (never inferSchema, which
triggers an extra full scan). The checksum aggregates are exact
(integer / DECIMAL), so the round-trip equality is bit-tight, not
approximate.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum
from ..plans.registry import register
from ..sources.tables import load_table

_M = "DECIMAL(12,4)"


@register(
    "q75_format_roundtrip",
    f"""
    SELECT 'csv_nation' AS source, COUNT(*) AS n_rows,
           CAST(SUM(n_nationkey + n_regionkey) AS DOUBLE) AS checksum
    FROM nation
    UNION ALL
    SELECT 'json_orders', COUNT(*),
           CAST(SUM(CAST(o_totalprice AS {_M})) AS DOUBLE)
    FROM orders
    ORDER BY source
    """,
    doc="Format round-trip proof: nation is written to CSV and orders "
    "to JSON-lines (explicit schema on re-read — inferSchema would "
    "cost an extra full scan), read back through the DataSource API, "
    "and checksum-aggregated. The oracle computes the same checksums "
    "from the original parquet, so a single flipped value, lost row, "
    "or type coercion anywhere in the write/read path breaks the "
    "hash match.",
)
def q75_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")

    root = tempfile.mkdtemp(prefix="q75_roundtrip_")
    csv_dir = os.path.join(root, "nation_csv")
    json_dir = os.path.join(root, "orders_json")
    nation.write.mode("overwrite").option("header", "true").csv(csv_dir)
    orders.write.mode("overwrite").json(json_dir)

    nation_rt = (
        spark.read.schema(nation.schema).option("header", "true").csv(csv_dir)
    )
    orders_rt = spark.read.schema(orders.schema).json(json_dir)

    nation_sum = nation_rt.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("n_nationkey") + F.col("n_regionkey"))
        .cast("double")
        .alias("checksum"),
    ).select(F.lit("csv_nation").alias("source"), "n_rows", "checksum")
    orders_sum = orders_rt.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("o_totalprice", "checksum"),
    ).select(F.lit("json_orders").alias("source"), "n_rows", "checksum")
    return nation_sum.unionByName(orders_sum).orderBy("source")
