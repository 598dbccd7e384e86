"""Semantic invariants of the round-4 operator additions — properties
the DuckDB hash-parity gate cannot express because they relate columns
WITHIN a result (conservation laws, bounds, audit zeros), not results
across engines."""

from __future__ import annotations

import math

import pytest

from astarte_data_updater_plant_spark.plans.registry import queries_map

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return queries_map()


def test_waterfill_conserves_budget(spark, qs):
    rows = qs["q147_token_waterfill"](spark, SF_DIR).collect()
    total = sum(r["n_tokens"] for r in rows)
    budget = total * 3 // 5
    assert sum(r["allocation"] for r in rows) == budget
    for r in rows:
        assert 0 <= r["allocation"] <= r["n_tokens"]
        # capped sources may pick up a +1 remainder token but can
        # never exceed their own mass or the uncapped sources' floor
        if not r["capped"]:
            assert r["allocation"] == r["n_tokens"]


def test_roc_auc_bounds_and_u_consistency(spark, qs):
    for r in qs["q145_roc_auc"](spark, SF_DIR).collect():
        assert 0.0 <= r["auc"] <= 1.0
        assert r["n_pos"] > 0 and r["n_neg"] > 0
        assert r["u_x2"] == round(r["auc"] * 2 * r["n_pos"] * r["n_neg"])


def test_psi_total_is_sum_of_contributions(spark, qs):
    rows = qs["q157_psi_drift"](spark, SF_DIR).collect()
    assert sorted(r["bin"] for r in rows) == list(range(10))
    assert rows[0]["psi_e9"] == sum(r["contrib_e9"] for r in rows)
    # parity split of one corpus: distributions near-identical, PSI
    # far below the 0.2 retrain threshold
    assert rows[0]["psi_e9"] < 200_000_000


def test_erasure_cascade_is_complete(spark, qs):
    rows = {r["tbl"]: r for r in qs["q155_erasure_propagation"](spark, SF_DIR).collect()}
    assert set(rows) == {"customer", "orders", "lineitem"}
    for r in rows.values():
        assert r["residual_refs"] == 0
        assert r["rows_after"] == r["rows_before"] - r["rows_erased"]
        assert r["rows_erased"] >= 0


def test_triangle_counts_conserve(spark, qs):
    rows = qs["q148_triangle_count"](spark, SF_DIR).collect()
    total = rows[0]["total_triangles"]
    assert all(r["total_triangles"] == total for r in rows)
    assert sum(r["n_triangles"] for r in rows) == 3 * total
    assert total > 0


def test_classifier_prf_confusion_sums(spark, qs):
    docs_per_source: dict[str, int] = {}
    from astarte_data_updater_plant_spark.sources.tables import load_table

    for r in (
        load_table(spark, SF_DIR, "documents").groupBy("source").count().collect()
    ):
        docs_per_source[r["source"]] = r["count"]
    for r in qs["q146_classifier_prf"](spark, SF_DIR).collect():
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == docs_per_source[r["source"]]
        if r["precision"] is not None:
            assert 0.0 <= r["precision"] <= 1.0
        if r["f1"] is not None:
            assert 0.0 <= r["f1"] <= 1.0


def test_entropy_bounds(spark, qs):
    for r in qs["q159_user_entropy"](spark, SF_DIR).collect():
        # 0 <= H <= ln(n_types); allow the 1e-9 floor slack per term
        assert -r["n_types"] <= r["entropy_e9"]
        assert r["entropy_e9"] <= math.log(r["n_types"]) * 1e9 + r["n_types"]


def test_markov_rows_are_distributions(spark, qs):
    rows = qs["q158_markov_transitions"](spark, SF_DIR).collect()
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r["from_type"]] = by_from.get(r["from_type"], 0.0) + r["p"]
    for total in by_from.values():
        assert abs(total - 1.0) < 1e-9


def test_jl_projection_distortion_reasonable(spark, qs):
    rows = qs["q139_jl_projection"](spark, SF_DIR).collect()
    # JL with 16 dims: distortion concentrates around 1; the mean must
    # be near 1 even though individual vectors swing
    mean = sum(r["distortion"] for r in rows) / len(rows)
    assert 0.7 < mean < 1.3


def test_countmin_never_underestimates(spark, qs):
    for r in qs["q141_countmin_heavy_hitters"](spark, SF_DIR).collect():
        assert r["cm_estimate"] >= r["exact_n"]
        assert r["overestimate"] == r["cm_estimate"] - r["exact_n"]


def test_perceptual_near_dup_groups_recovered(spark, qs):
    rows = qs["q154_perceptual_near_dup"](spark, SF_DIR).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    # every within-group clone pair (<=2 bit perturbation) must be found
    import duckdb

    (n_docs,) = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()
    missing = []
    for g in range(n_docs // 3):
        for a, b in ((3 * g, 3 * g + 1), (3 * g, 3 * g + 2), (3 * g + 1, 3 * g + 2)):
            if b < n_docs and (a, b) not in pairs:
                missing.append((a, b))
    assert not missing, f"clone pairs missed: {missing[:5]}"


def test_regression_sums_survive_large_vocabulary(spark):
    """q162/q170's widened DECIMAL(38,0) accumulation is exact where the
    old int64 path wrapped: a 200k-term Zipf-shaped vocabulary drives
    n*sxy past 2^63; the Spark plan must match Python bignum arithmetic
    bit-for-bit (ADVICE r4, corpus.py q170 overflow)."""
    import pyspark.sql.functions as F

    n_terms = 200_000
    pts = spark.range(1, n_terms + 1).select(
        F.floor(F.log(F.col("id")) * 1000000).cast("long").alias("x"),
        F.floor(F.log(F.lit(float(n_terms)) / F.col("id")) * 1000000)
        .cast("long")
        .alias("y"),
    )
    xd = F.col("x").cast("decimal(12,0)")
    yd = F.col("y").cast("decimal(12,0)")
    agg = pts.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(xd).cast("decimal(38,0)").alias("sx"),
        F.sum(yd).cast("decimal(38,0)").alias("sy"),
        F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    row = agg.select(
        num.cast("decimal(38,0)").alias("num"),
        den.cast("decimal(38,0)").alias("den"),
        F.col("sxy"),
    ).collect()[0]

    import math

    xs = [math.floor(math.log(r) * 1000000) for r in range(1, n_terms + 1)]
    ys = [
        math.floor(math.log(n_terms / r) * 1000000)
        for r in range(1, n_terms + 1)
    ]
    n = n_terms
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    assert n * sxy > 2**63, "fixture must actually exceed int64"
    assert int(row["num"]) == n * sxy - sx * sy
    assert int(row["den"]) == n * sxx - sx * sx
    assert int(row["sxy"]) == sxy


def test_systematic_resample_draws_exactly_n(spark, qs):
    """q183: sum(multiplicity) must equal RS_N exactly (the systematic
    sampler's defining property) and every doc's multiplicity must be
    within +/-1 of its expected count n*w/W."""
    from astarte_data_updater_plant_spark.operators.corpus import RS_N

    rows = qs["q183_systematic_resample"](spark, SF_DIR).collect()
    assert sum(r["multiplicity"] for r in rows) == RS_N
    total_w = None
    import duckdb

    (total_w,) = duckdb.sql(
        f"SELECT SUM(len(string_split(text, ' '))) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()
    for r in rows:
        expected = RS_N * r["weight"] / total_w
        assert abs(r["multiplicity"] - expected) <= 1.0


def test_with_global_order_matches_window_semantics(spark):
    """functions/ranks.with_global_order must equal the single-partition
    window functions it replaces — across skewed, tiny, desc, and
    n<buckets inputs (the shapes that broke earlier designs)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    from astarte_data_updater_plant_spark.functions.ranks import (
        with_global_order,
    )

    def dataset(kind):
        if kind == "uniform":
            return spark.range(5000).select(
                F.col("id"), F.xxhash64("id").alias("k")
            )
        if kind == "skewed":  # 60% of rows share one key prefix
            return spark.range(5000).select(
                F.col("id"),
                F.when(F.col("id") % 5 < 3, F.lit(7))
                .otherwise(F.col("id"))
                .alias("k"),
            )
        if kind == "tiny":
            return spark.range(3).select(F.col("id"), F.col("id").alias("k"))
        return spark.range(40).select(  # fewer rows than buckets
            F.col("id"), (F.col("id") % 7).alias("k")
        )

    for kind in ("uniform", "skewed", "tiny", "small"):
        df = dataset(kind)
        got = with_global_order(
            df, ["k", "id"], rank="rn", total="n",
            ntile=(32, "t"),
            cumsums=[("id", "cs", "inclusive"), ("id", "cse", "exclusive")],
        ).orderBy("rn").collect()
        wo = W.orderBy("k", "id")
        run = wo.rowsBetween(W.unboundedPreceding, W.currentRow)
        exp = (
            df.select(
                "id", "k",
                F.row_number().over(wo).alias("rn"),
                F.count(F.lit(1)).over(
                    wo.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
                ).alias("n"),
                F.ntile(32).over(wo).alias("t"),
                F.sum("id").over(run).alias("cs"),
            )
            .orderBy("rn")
            .collect()
        )
        assert len(got) == len(exp), kind
        for g, e in zip(got, exp):
            assert (g["id"], g["rn"], g["n"], g["t"], g["cs"]) == (
                e["id"], e["rn"], e["n"], e["t"], e["cs"]
            ), (kind, g, e)
            assert g["cse"] == e["cs"] - e["id"], (kind, g)

    # desc ordering equals the window's desc ordering
    df = dataset("uniform")
    got = (
        with_global_order(df, [(F.col("k"), "desc"), "id"], rank="rn")
        .orderBy("rn")
        .collect()
    )
    exp = (
        df.select(
            "id", F.row_number().over(W.orderBy(F.col("k").desc(), "id")).alias("rn")
        )
        .orderBy("rn")
        .collect()
    )
    assert [g["id"] for g in got] == [e["id"] for e in exp]

    # null sort keys: the driver-side boundary sample sort must use a
    # null-safe key matching Spark's ASC NULLS FIRST, or it raises
    # TypeError the moment the probe samples a null (surfaced by
    # q223's gated-null weight, ADVICE r9)
    dfn = spark.range(500).select(
        F.col("id"),
        F.when(F.col("id") % 7 == 0, F.lit(None)).otherwise(
            F.col("id") * 3 % 101
        ).alias("k"),
    )
    got = (
        with_global_order(dfn, ["k", "id"], rank="rn")
        .orderBy("rn")
        .collect()
    )
    exp = (
        dfn.select(
            "id", F.row_number().over(W.orderBy("k", "id")).alias("rn")
        )
        .orderBy("rn")
        .collect()
    )
    assert [g["id"] for g in got] == [e["id"] for e in exp]


def test_bigrams_expr_survives_short_documents(spark):
    """_BIGRAMS_EXPR must yield the empty list for 0- and 1-token
    documents instead of throwing INVALID_ARRAY_INDEX_IN_ELEMENT_AT:
    sequence(1, 0) in Spark is the DESCENDING [1, 0], so the unguarded
    transform indexed element_at(ts, 2) on a 1-token array (ADVICE r5,
    textops.py q178/q184). DuckDB's range(1, 1) is empty, so the guard
    also keeps Spark/oracle parity on short docs."""
    import duckdb
    import pyspark.sql.functions as F

    from astarte_data_updater_plant_spark.operators.textops import (
        _BIGRAMS_EXPR,
        _BIGRAMS_SQL,
    )

    texts = ["", "one", "two tokens", "now three tokens"]
    df = spark.createDataFrame([(t,) for t in texts], "text string").select(
        F.split("text", " ").alias("ts")
    )
    got = [r["bg"] for r in df.select(F.expr(_BIGRAMS_EXPR).alias("bg")).collect()]
    exp = [
        duckdb.sql(
            f"SELECT {_BIGRAMS_SQL} FROM (SELECT string_split(?, ' ') AS ts)",
            params=[t],
        ).fetchone()[0]
        for t in texts
    ]
    # note: split('', ' ') is [''] in both engines — a 1-token doc
    assert got == exp
    assert got[0] == [] and got[1] == []
    assert got[3] == ["now three", "three tokens"]
