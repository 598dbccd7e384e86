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


# ---------------------------------------------------------------------------
# q148 — triangle counting over a co-occurrence graph
# ---------------------------------------------------------------------------


@register(
    "q148_triangle_count",
    """
    WITH cooc AS (
      SELECT DISTINCT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr,
             user_id
      FROM events
    ),
    edges AS (
      SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM cooc a JOIN cooc b
        ON a.event_type = b.event_type AND a.hr = b.hr
       AND a.user_id < b.user_id
    ),
    wedges AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM edges e1 JOIN edges e2 ON e2.u = e1.v
    ),
    tris AS (
      SELECT w.a, w.b, w.c
      FROM wedges w JOIN edges e3 ON e3.u = w.a AND e3.v = w.c
    ),
    per_user AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM (
        SELECT a AS user_id FROM tris
        UNION ALL SELECT b FROM tris
        UNION ALL SELECT c FROM tris
      ) GROUP BY user_id
    )
    SELECT user_id, n_triangles,
           (SELECT CAST(SUM(n_triangles) // 3 AS BIGINT) FROM per_user)
             AS total_triangles
    FROM per_user
    ORDER BY user_id
    """,
    doc="Distributed triangle counting (the clustering-coefficient / "
    "community-density primitive): users who share an (event_type, "
    "hour) cell form edges; triangles are counted with the oriented "
    "wedge-join — every edge is stored once as u<v, wedges join "
    "edge(a,b)+edge(b,c) on the shared middle vertex, and a second "
    "equi-join closes wedge(a,c) against the edge set, so each "
    "triangle is found exactly once (a<b<c by construction) and the "
    "join never materializes unordered pairs twice. This is the "
    "MapReduce triangle algorithm of Suri & Vassilvitskii (here "
    "oriented by id; the production refinement orients from the "
    "lower-degree endpoint to bound wedge fan-out on skewed "
    "graphs), and every stage is a keyed "
    "equi-join — no all-pairs anywhere. Per-user triangle "
    "participation plus the global count are both pinned.",
)
def q148_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.fragments import fragment

    def _edges() -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        cooc = ev.select(
            "event_type",
            (F.floor(F.unix_timestamp("ts") / F.lit(3600))).cast("long").alias("hr"),
            "user_id",
        ).distinct()
        a, b = cooc.alias("a"), cooc.alias("b")
        return (
            a.join(
                b,
                (F.col("a.event_type") == F.col("b.event_type"))
                & (F.col("a.hr") == F.col("b.hr"))
                & (F.col("a.user_id") < F.col("b.user_id")),
            )
            .select(F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v"))
            .distinct()
        )

    # the oriented edge list is read three times (both wedge sides +
    # the closing probe) — pin it once
    edges = fragment(spark, sf_dir, "cooc_edges", _edges)
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    wedges = e1.join(e2, F.col("e2.u") == F.col("e1.v")).select(
        F.col("e1.u").alias("wa"), F.col("e1.v").alias("wb"), F.col("e2.v").alias("wc")
    )
    tris = wedges.join(
        e3, (F.col("e3.u") == F.col("wa")) & (F.col("e3.v") == F.col("wc"))
    ).select("wa", "wb", "wc")
    # one read of the triangle set: explode the 3 corners, count per
    # user; the global count is sum/3 (every triangle contributes 3
    # corner rows) — no second pass
    per_user = (
        tris.select(
            F.explode(F.array(F.col("wa"), F.col("wb"), F.col("wc"))).alias(
                "user_id"
            )
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    total = per_user.agg(
        (F.sum("n_triangles") / 3).cast("long").alias("total_triangles")
    )
    return (
        per_user.crossJoin(F.broadcast(total))
        .select("user_id", "n_triangles", "total_triangles")
        .orderBy("user_id")
    )
