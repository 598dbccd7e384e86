"""Bucketed ANN — the scale path for similarity search.

Brute-force cosine (q50) is exact but O(queries x corpus); at 100 TB
the corpus side must be pruned first. Random-hyperplane LSH does it
with the same bucket-join topology as MinHash dedup: each vector's
bucket is the sign pattern of its projections onto P fixed +/-1
hyperplanes, candidates come from an equi-join on the bucket key, and
the exact cosine re-rank runs only inside buckets.

The hyperplanes are pseudo-random +/-1 vectors derived from md5 at
import time (deterministic — embedded as literals in both the Spark
plan and the DuckDB oracle), so the whole operator is hash-stable.
Recall is partial by construction; that's the documented trade
(recall vs candidate count scales with P and multi-probe).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_with_norms, norm, to_double_array
from ..plans.fragments import fragment
from ..plans.registry import register
from ..sources.tables import load_table

N_PLANES = 8
DIM = 64
TOP_K = 3
QUERY_STRIDE = 100


def _plane(p: int) -> list[int]:
    """Deterministic +/-1 hyperplane from md5 — public-knowledge
    sign-random-projection construction."""
    signs = []
    for d in range(DIM):
        h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
        signs.append(1 if int(h[0], 16) % 2 == 0 else -1)
    return signs


PLANES = [_plane(p) for p in range(N_PLANES)]


def _bucket_sql(col: str) -> str:
    bits = []
    for plane in PLANES:
        arr = "[" + ", ".join(f"{s}.0" for s in plane) + "]::DOUBLE[]"
        bits.append(
            f"CASE WHEN list_dot_product(CAST({col} AS DOUBLE[]), {arr}) >= 0 THEN '1' ELSE '0' END"
        )
    return " || ".join(bits)


def _bucket_col(emb) -> F.Column:
    bits = []
    for plane in PLANES:
        arr = F.array(*[F.lit(float(s)) for s in plane])
        dot = F.aggregate(
            F.zip_with(emb, arr, lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


@register(
    "q53_lsh_ann_topk",
    f"""
    WITH base AS (
      SELECT vec_id, label, embedding, {_bucket_sql("embedding")} AS bucket
      FROM embeddings
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             c.label AS neighbor_label, q.bucket,
             round(
               list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))),
               6) AS sim
      FROM base q
      JOIN base c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
      WHERE q.vec_id % {QUERY_STRIDE} = 0
    )
    SELECT query_id, neighbor_id, neighbor_label, bucket, sim
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id
      ) AS rn FROM pairs
    ) t
    WHERE rn <= {TOP_K}
    ORDER BY query_id, sim DESC, neighbor_id
    """,
    doc="LSH-bucketed ANN: sign-random-projection bucket key, candidate "
    "generation by bucket equi-join (no all-pairs scan), exact cosine "
    "re-rank in-bucket, per-query top-k.",
)
def q53_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array(F.col("embedding")).alias("embedding")
    )
    base = fragment(
        spark,
        sf_dir,
        "lsh_ann_base",
        lambda: emb.withColumn("bucket", _bucket_col(F.col("embedding"))).withColumn(
            "nrm", norm(F.col("embedding"))
        ),
    )
    q = base.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket"),
        F.col("nrm").alias("qn"),
    )
    c = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("cv"),
        F.col("bucket").alias("c_bucket"),
        F.col("nrm").alias("cn"),
    )
    pairs = q.join(
        c,
        (F.col("c_bucket") == F.col("bucket")) & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "neighbor_id",
        "neighbor_label",
        "bucket",
        cosine_with_norms(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "neighbor_label", "bucket", "sim")
        .orderBy("query_id", F.col("sim").desc(), "neighbor_id")
    )


# ---------------------------------------------------------------------------
# q222 — multi-probe LSH (flip-1-bit bucket probing)
# ---------------------------------------------------------------------------


def _probe_sql() -> str:
    """DuckDB: the 9 probe buckets (home + each 1-bit flip) for q.bucket."""
    cases = ["q.bucket"]
    for i in range(1, N_PLANES + 1):
        flip = (
            f"substr(q.bucket, 1, {i - 1}) || "
            f"(CASE substr(q.bucket, {i}, 1) WHEN '0' THEN '1' ELSE '0' END)"
            f" || substr(q.bucket, {i + 1})"
        )
        cases.append(flip)
    return "[" + ", ".join(cases) + "]"


@register(
    "q222_multiprobe_lsh_topk",
    f"""
    WITH base AS (
      SELECT vec_id, label, embedding, {_bucket_sql("embedding")} AS bucket
      FROM embeddings
    ),
    probes AS (
      SELECT q.vec_id AS query_id, q.embedding AS qv, q.bucket AS home,
             UNNEST({_probe_sql()}) AS probe
      FROM base q WHERE q.vec_id % {QUERY_STRIDE} = 0
    ),
    pairs AS (
      SELECT p.query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
             c.bucket = p.home AS in_home_bucket,
             round(
               list_dot_product(CAST(p.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(p.qv AS DOUBLE[]), CAST(p.qv AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))),
               6) AS sim
      FROM probes p
      JOIN base c ON c.bucket = p.probe AND c.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, neighbor_label, in_home_bucket, sim
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id
      ) AS rn FROM pairs
    ) t
    WHERE rn <= {TOP_K}
    ORDER BY query_id, sim DESC, neighbor_id
    """,
    doc=f"Multi-probe LSH (Lv et al.): each query probes its home "
    f"bucket PLUS the {N_PLANES} buckets at Hamming distance 1 (one "
    f"sign bit flipped) — the standard way to buy recall without "
    f"building more hash tables, because a near neighbor that "
    f"narrowly lands on the other side of one hyperplane is in "
    f"exactly such a bucket. Candidates still come from an EQUI-join "
    f"(probe string = bucket string; a vector has one bucket, so no "
    f"candidate appears twice and no dedup pass is needed), exact "
    f"cosine re-ranks in-bucket only, and `in_home_bucket` exposes "
    f"per neighbor whether single-probe q53 would have found it — "
    f"the measured recall lift of probing. Probe fan-out is a "
    f"bounded {N_PLANES + 1}x explode of the tiny query side; the "
    f"corpus side is scanned once and shuffled once on the bucket "
    f"key, identical to q53's topology.",
)
def q222_multiprobe_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array(F.col("embedding")).alias("embedding")
    )
    base = fragment(
        spark,
        sf_dir,
        "lsh_ann_base",
        lambda: emb.withColumn("bucket", _bucket_col(F.col("embedding"))).withColumn(
            "nrm", norm(F.col("embedding"))
        ),
    )
    home = F.col("bucket")
    probes_arr = [home]
    for i in range(1, N_PLANES + 1):
        flipped = F.concat(
            F.substring(home, 1, i - 1),
            F.when(F.substring(home, i, 1) == "0", F.lit("1")).otherwise(F.lit("0")),
            F.substring(home, i + 1, N_PLANES),
        )
        probes_arr.append(flipped)
    q = (
        base.filter(F.col("vec_id") % QUERY_STRIDE == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.col("nrm").alias("qn"),
            home.alias("home"),
            F.explode(F.array(*probes_arr)).alias("probe"),
        )
    )
    c = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("cv"),
        F.col("bucket").alias("c_bucket"),
        F.col("nrm").alias("cn"),
    )
    pairs = q.join(
        c,
        (F.col("c_bucket") == F.col("probe"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "neighbor_id",
        "neighbor_label",
        (F.col("c_bucket") == F.col("home")).alias("in_home_bucket"),
        cosine_with_norms(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "neighbor_label", "in_home_bucket", "sim")
        .orderBy("query_id", F.col("sim").desc(), "neighbor_id")
    )
