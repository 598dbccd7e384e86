"""Salted join: result equivalence with the plain join under skew."""

from __future__ import annotations

from pyspark.sql import functions as F

from astarte_data_updater_plant_spark.functions.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # heavily skewed fact: 90% of rows share one key
    fact = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"cold{i}", float(i)) for i in range(2000)],
        "row_id long, key string, v double",
    )
    dim = spark.createDataFrame(
        [("hot", 1), ("cold10", 2), ("cold100", 3), ("absent", 4)],
        "key string, dim_val int",
    )
    plain = fact.join(dim, ["key"], "inner").select("row_id", "key", "dim_val")
    salted = salted_join(
        fact, dim, ["key"], salt_from="row_id", n_salts=8
    ).select("row_id", "key", "dim_val")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # the salted plan spreads the hot key over multiple join keys
    assert salted.count() == plain.count() > 0


def test_salted_left_join_preserves_unmatched(spark):
    fact = spark.createDataFrame(
        [(i, "hot", float(i)) for i in range(100)]
        + [(1000, "nomatch", 0.0)],
        "row_id long, key string, v double",
    )
    dim = spark.createDataFrame([("hot", 1)], "key string, dim_val int")
    out = salted_join(fact, dim, ["key"], salt_from="row_id", n_salts=4, how="left")
    assert out.count() == 101
    assert out.filter(F.col("dim_val").isNull()).count() == 1
