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


def test_guarded_self_pairs_adversarial_bucket(spark):
    """A boilerplate bucket holding 30% of all docs must still produce
    EXACTLY the plain self-join's pairs (the guard changes physical
    distribution, never semantics), and the hot path must engage."""
    import pyspark.sql.functions as F

    from astarte_data_updater_plant_spark.functions.skew import (
        guarded_self_pairs,
    )

    n = 1000
    # docs 0..299 share one pathological bucket key; the rest spread
    # over small healthy buckets of ~4
    bands = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("band"),
        F.when(F.col("id") < 300, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 175).cast("string")))
        .alias("bkey"),
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in guarded_self_pairs(
            bands, ["band", "bkey"], "doc_id", cap=64, n_salts=8
        ).collect()
    }
    a, b = bands.alias("a"), bands.alias("b")
    exp = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .collect()
    }
    assert got == exp
    assert len(got) >= 300 * 299 // 2  # the hot bucket's pairs all present
