"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``astarte_data_updater_plant_spark``; this
module only adapts the registry to the driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from astarte_data_updater_plant_spark.plans.registry import oracle_sql_map, queries_map

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: latest-value-per-key (the properties LWW read —
    the reference's core storage semantic) on sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return queries_map()["q10_latest_value_per_key"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return queries_map()


def oracle_sql() -> dict[str, str]:
    return oracle_sql_map()
