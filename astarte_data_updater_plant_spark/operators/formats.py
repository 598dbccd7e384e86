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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum
from ..plans.registry import register
from ..storage.scratch import scratch_dir
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

    root = scratch_dir(prefix="q75_roundtrip_")
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

    root = scratch_dir(prefix="q117_roundtrip_")
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


@register(
    "q136_schema_evolution",
    """
    WITH v AS (
      SELECT doc_id, doc_id % 2 AS version, lang, n_chars,
             CASE WHEN doc_id % 2 = 1
                  THEN CAST(CAST(n_chars % 1000 AS DECIMAL(18,1)) / 10
                       AS DECIMAL(18,1))
             END AS quality_score
      FROM documents
    )
    SELECT version,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN version = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS lang_nulls,
           CAST(SUM(CASE WHEN version = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS score_nulls,
           CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
           CAST(SUM(quality_score) AS DOUBLE) AS sum_score
    FROM v GROUP BY version ORDER BY version
    """,
    doc="Schema evolution across parquet batches: a v0 writer emits "
    "(doc_id, lang, n_chars), a later v1 writer drops lang and adds "
    "quality_score; both land in the SAME table directory. The read "
    "side uses mergeSchema=true, so the scan unions the file schemas "
    "by name and back-fills missing columns with null — the way a "
    "100 TB landing zone absorbs producer upgrades without rewriting "
    "history. The aggregate pins per-version row counts, the null "
    "pattern the merge must produce (lang null exactly in v1 rows, "
    "score null exactly in v0 rows), an exact integer checksum, and "
    "an exact DECIMAL score sum; the oracle computes all of it from "
    "the ORIGINAL table, so a column silently dropped, misaligned, "
    "or type-coerced by the merged read breaks the hash.",
)
def q136_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    root = scratch_dir(prefix="q136_evolution_")
    v0 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang", "n_chars")
    v1 = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id",
        "n_chars",
        (F.col("n_chars").cast("long") % 1000)
        .cast("decimal(18,1)")
        .alias("raw_score"),
    ).select(
        "doc_id",
        "n_chars",
        (F.col("raw_score") / 10).cast("decimal(18,1)").alias("quality_score"),
    )
    v0.write.mode("overwrite").parquet(root)
    v1.write.mode("append").parquet(root)

    merged = spark.read.option("mergeSchema", "true").parquet(root)
    return (
        merged.withColumn("version", F.col("doc_id") % 2)
        .groupBy("version")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("lang").isNull().cast("int")).cast("long").alias(
                "lang_nulls"
            ),
            F.sum(F.col("quality_score").isNull().cast("int")).cast("long").alias(
                "score_nulls"
            ),
            F.sum("n_chars").cast("long").alias("sum_n_chars"),
            F.sum("quality_score").cast("double").alias("sum_score"),
        )
        .orderBy("version")
    )
