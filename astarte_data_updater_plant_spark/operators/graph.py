"""Iterative graph algorithms (fixed-iteration PageRank) on DataFrames.

The reference resolves graph-shaped metadata (device -> interface ->
path fan-out) with recursive walks; the general Spark-native pattern
for iterative fixed-point algorithms is a driver-side loop that
re-declares the next iteration's DataFrame from the previous one —
each iteration is one join + one aggregation, and Catalyst sees the
whole unrolled plan.

The graph here is the bipartite part<->supplier graph from lineitem
(both edge directions, so no dangling nodes).  Five damped PageRank
iterations; ranks are rounded to 12 decimals each iteration so the
Spark and oracle float-summation orders cannot drift apart.

Scale notes: the edge list (with out-degrees pre-joined) is computed
once, hash-partitioned on ``src`` and cached — each iteration then
shuffles only the rank vector (|V| rows, tiny next to |E|) to the edge
partitioning, aggregates partially map-side on ``dst``, and
re-materializes the rank vector.  On a real cluster one would
checkpoint ranks every ~10 iterations to truncate lineage; with a
fixed 5 iterations the lineage is shallow enough to skip that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table

_D = 0.85
_ITERS = 5
_SCALE = 12  # per-iteration rounding, keeps engines bit-identical


def _pagerank_oracle() -> str:
    parts = [
        f"""
    WITH pairs AS (
      SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS p,
                      's' || CAST(l_suppkey AS VARCHAR) AS s
      FROM lineitem
    ),
    edges AS (
      SELECT p AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, p AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    cedges AS (
      SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d ON e.src = d.src
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    ncount AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM nodes),
    r0 AS (
      SELECT node, CAST(1 AS DOUBLE) / (SELECT nn FROM ncount) AS pr FROM nodes
    )"""
    ]
    prev = "r0"
    for i in range(1, _ITERS + 1):
        parts.append(
            f""",
    c{i} AS (
      SELECT e.dst AS node, SUM(r.pr / e.outdeg) AS contrib
      FROM cedges e JOIN {prev} r ON e.src = r.node
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT n.node,
             ROUND((CAST(1 AS DOUBLE) - CAST({_D} AS DOUBLE))
                     / (SELECT nn FROM ncount)
                   + CAST({_D} AS DOUBLE) * COALESCE(c.contrib, CAST(0 AS DOUBLE)),
                   {_SCALE}) AS pr
      FROM nodes n LEFT JOIN c{i} c ON n.node = c.node
    )"""
        )
        prev = f"r{i}"
    parts.append(f"\n    SELECT node, pr FROM {prev}")
    return "".join(parts)


@register(
    "q93_pagerank",
    _pagerank_oracle(),
    doc="Fixed-iteration damped PageRank over the bipartite part<->supplier "
    "graph: driver loop re-declaring join+agg per iteration, edges cached "
    "and partitioned once. Oracle is the identical recursion unrolled as "
    "chained CTEs.",
)
def q93_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("p"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
    ).distinct()
    edges = pairs.select(F.col("p").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("p").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # Edge list with out-degree, partitioned on the join key once and
    # reused by every iteration (5 self-references -> cache is load-bearing).
    cedges = edges.join(deg, "src").repartition("src").cache()
    nodes = cedges.select(F.col("src").alias("node")).distinct().cache()
    n_nodes = nodes.count()

    teleport = (1 - _D) / n_nodes
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("pr"))
    for _ in range(_ITERS):
        contrib = (
            cedges.join(ranks, cedges["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("contrib"))
        )
        ranks = nodes.join(contrib, nodes["node"] == contrib["dst"], "left").select(
            "node",
            F.round(
                F.lit(teleport) + F.lit(_D) * F.coalesce(F.col("contrib"), F.lit(0.0)),
                _SCALE,
            ).alias("pr"),
        )
    return ranks
