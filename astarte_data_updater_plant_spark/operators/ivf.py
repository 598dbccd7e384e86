"""IVF-style ANN and embedding-cosine near-dup — the coarse-quantize
scale path for vector search.

Two candidate-pruning strategies over the embeddings table, completing
the ANN ladder (q50 brute-force exact -> q53 LSH buckets -> here):

- **IVF (inverted-file) top-k**: assign every vector to its nearest
  coarse centroid (the inverted lists), probe only the query's own
  cell, exact cosine re-rank inside the cell. Centroids here are a
  deterministic pre-picked subset (vec_id < K) standing in for a
  k-means codebook — the plan topology (broadcast centroids ->
  argmin assign -> cell equi-join -> windowed top-k) is exactly what a
  trained codebook would use, and is the part that must scale.
- **Cosine near-dup pairs**: same sign-random-projection buckets as
  q53; candidate pairs come from the bucket equi-join, a cosine
  threshold keeps near-duplicates. Recall is partial by construction
  (bucket-boundary pairs are missed) — the documented LSH trade.

At 100 TB: the centroid table stays broadcastable (K << corpus); the
only shuffles are the cell/bucket equi-joins, partitioned by cell key;
inverted lists are bounded by corpus/K so no cell explodes under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, cosine_with_norms, norm, to_double_array
from ..plans.fragments import fragment
from ..plans.registry import register
from ..sources.tables import load_table
from .ann import _bucket_col, _bucket_sql

N_CENTROIDS = 16
TOP_K = 3
QUERY_STRIDE = 100
NEAR_DUP_COS = 0.4

_COS = (
    "round(list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[])))), 6)"
)


@register(
    "q54_cosine_near_dup",
    f"""
    WITH base AS (
      SELECT vec_id, label, embedding, {_bucket_sql("embedding")} AS bucket
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket,
           {_COS.format(a="a.embedding", b="b.embedding")} AS sim
    FROM base a
    JOIN base b ON b.bucket = a.bucket AND a.vec_id < b.vec_id
    WHERE {_COS.format(a="a.embedding", b="b.embedding")} >= {NEAR_DUP_COS}
    ORDER BY vec_a, vec_b
    """,
    doc="Embedding-cosine near-dup pairs: sign-random-projection bucket "
    "equi-join generates candidates (never all-pairs), exact cosine "
    "threshold verifies. Same topology as MinHash-LSH text dedup, on "
    "vectors.",
)
def q54_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array(F.col("embedding")).alias("v")
    )
    base = emb.withColumn("bucket", _bucket_col(F.col("v"))).withColumn(
        "nrm", norm(F.col("v"))
    )
    a = base.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "bucket",
        F.col("nrm").alias("na"),
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("bucket").alias("b_bucket"),
        F.col("nrm").alias("nb"),
    )
    sim = cosine_with_norms(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    return (
        a.join(
            b,
            (F.col("b_bucket") == F.col("bucket"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b", "bucket", sim.alias("sim"))
        .filter(F.col("sim") >= NEAR_DUP_COS)
        .orderBy("vec_a", "vec_b")
    )


@register(
    "q55_ivf_ann_topk",
    f"""
    WITH cents AS (
      SELECT vec_id AS centroid_id, embedding AS cv
      FROM embeddings WHERE vec_id < {N_CENTROIDS}
    ),
    assigned AS (
      SELECT vec_id, label, embedding, centroid_id FROM (
        SELECT e.vec_id, e.label, e.embedding, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_COS.format(a="e.embedding", b="c.cv")} DESC, c.centroid_id
               ) AS rn
        FROM embeddings e CROSS JOIN cents c
      ) t WHERE rn = 1
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, q.centroid_id,
             n.vec_id AS neighbor_id, n.label AS neighbor_label,
             {_COS.format(a="q.embedding", b="n.embedding")} AS sim
      FROM assigned q
      JOIN assigned n
        ON n.centroid_id = q.centroid_id AND n.vec_id <> q.vec_id
      WHERE q.vec_id % {QUERY_STRIDE} = 0
    )
    SELECT query_id, centroid_id, neighbor_id, neighbor_label, sim
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id
      ) AS rn FROM pairs
    ) t
    WHERE rn <= {TOP_K}
    ORDER BY query_id, sim DESC, neighbor_id
    """,
    doc="IVF ANN: broadcast coarse-centroid assign (argmax cosine, "
    "deterministic tie-break), nprobe=1 cell equi-join for candidates, "
    "exact cosine re-rank, per-query windowed top-k.",
)
def q55_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _assigned() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "label", to_double_array(F.col("embedding")).alias("v")
        )
        cents = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
            F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
        )
        w_assign = Window.partitionBy("vec_id").orderBy(
            F.col("sim_c").desc(), F.col("centroid_id")
        )
        return (
            emb.crossJoin(F.broadcast(cents))
            .withColumn("sim_c", cosine(F.col("v"), F.col("cv")))
            .withColumn("rn", F.row_number().over(w_assign))
            .filter(F.col("rn") == 1)
            .select("vec_id", "label", "v", "centroid_id")
            .withColumn("nrm", norm(F.col("v")))
        )

    # the assignment is an IVF *index*: build once per application,
    # reuse across every probe (within one call, an uncached shared
    # assignment was a measured wash — the stride filter pushes below
    # the argmin so the query side recomputes ~1% — but across calls
    # the corpus-side rebuild is the whole cost, and the pinned state
    # is one row per vector, the same footprint any ANN index pays)
    assigned = fragment(spark, sf_dir, "ivf_assigned", _assigned)
    q = assigned.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        "centroid_id",
        F.col("nrm").alias("qn"),
    )
    n = assigned.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("v").alias("nv"),
        F.col("centroid_id").alias("n_centroid"),
        F.col("nrm").alias("nn"),
    )
    pairs = q.join(
        n,
        (F.col("n_centroid") == F.col("centroid_id"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "centroid_id",
        "neighbor_id",
        "neighbor_label",
        cosine_with_norms(F.col("qv"), F.col("nv"), F.col("qn"), F.col("nn")).alias("sim"),
    )
    w_topk = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w_topk))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "centroid_id", "neighbor_id", "neighbor_label", "sim")
        .orderBy("query_id", F.col("sim").desc(), "neighbor_id")
    )
