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


@register(
    "q117_columnar_roundtrip",
    f"""
    SELECT 'orc_lineitem' AS source, COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS {_M})) AS DOUBLE) AS checksum
    FROM lineitem WHERE l_quantity < 25
    UNION ALL
    SELECT 'part_parquet_orders', COUNT(*),
           CAST(SUM(CAST(o_totalprice AS {_M})) AS DOUBLE)
    FROM orders WHERE o_orderpriority = '1-URGENT'
    ORDER BY source
    """,
    doc="Columnar round-trips: lineitem is written to ORC and read "
    "back through a pushed-down predicate (the ORC reader serves the "
    "l_quantity filter from stripe statistics), and orders is written "
    "as HIVE-PARTITIONED parquet on o_orderpriority and read back "
    "with a partition filter — the scan lists exactly one partition "
    "directory, the pruning that turns a 100 TB landing zone into a "
    "one-partition read. Checksums are exact DECIMAL sums computed "
    "against the original table by the oracle, so a value flipped by "
    "either writer/reader, a dropped row, or a partition-column type "
    "coercion (partition values come back from directory NAMES as "
    "strings) breaks the hash match.",
)
def q117_columnar_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders")

    root = tempfile.mkdtemp(prefix="q117_roundtrip_")
    orc_dir = os.path.join(root, "lineitem_orc")
    part_dir = os.path.join(root, "orders_part")
    lineitem.write.mode("overwrite").orc(orc_dir)
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(part_dir)

    li_rt = spark.read.schema(lineitem.schema).orc(orc_dir)
    # partition columns materialize from directory names: read with an
    # explicit schema so o_orderpriority stays a string, then filter —
    # the catalyst plan prunes to the single matching directory
    ord_rt = spark.read.parquet(part_dir)

    li_sum = (
        li_rt.filter(F.col("l_quantity") < 25)
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum("l_extendedprice", "checksum"))
        .select(F.lit("orc_lineitem").alias("source"), "n_rows", "checksum")
    )
    ord_sum = (
        ord_rt.filter(F.col("o_orderpriority") == "1-URGENT")
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum("o_totalprice", "checksum"))
        .select(F.lit("part_parquet_orders").alias("source"), "n_rows", "checksum")
    )
    return li_sum.unionByName(ord_sum).orderBy("source")
