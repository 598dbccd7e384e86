"""Delta-style MERGE (upsert + delete) compiled to a full-outer join.

The reference applies incoming device state changes to the stored
state table with per-row upsert/delete semantics (set-value inserts
or overwrites, unset deletes — ``impl.ex:1100-1180``).  Lakehouse
engines compile ``MERGE INTO`` to exactly the plan declared here: a
full-outer join of target and source on the merge key, followed by a
per-row CASE that routes each row to update / insert / delete /
keep.  Expressing it declaratively keeps Catalyst in charge of the
join strategy.

Scale notes: the merge key is the join key, so the shuffle is a single
hash partition on ``user_id`` for each side.  On a real 100 TB target
the base table would be bucketed (or Z-ordered) by the merge key so
only the much smaller change-set shuffles; AQE handles skewed keys.
The two window scans push their disjoint ``ts`` predicates into the
parquet scan, so each side reads only its half of the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import dmoney, snap
from ..plans.registry import register
from ..sources.tables import load_table

_SPLIT = "2024-01-16 00:00:00"


@register(
    "q92_merge_upsert",
    f"""
    WITH base AS (
      SELECT user_id, value, ts FROM (
        SELECT user_id, value, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{_SPLIT}'
      ) WHERE rn = 1
    ), chg AS (
      SELECT user_id, value, ts, event_type FROM (
        SELECT user_id, value, ts, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '{_SPLIT}'
      ) WHERE rn = 1
    )
    SELECT
      COALESCE(b.user_id, c.user_id) AS user_id,
      CASE WHEN c.user_id IS NULL THEN b.value ELSE c.value END AS value,
      CASE WHEN c.user_id IS NULL THEN b.ts ELSE c.ts END AS ts,
      CASE WHEN b.user_id IS NULL THEN 'insert'
           WHEN c.user_id IS NULL THEN 'keep'
           ELSE 'update' END AS op
    FROM base b FULL JOIN chg c ON b.user_id = c.user_id
    WHERE c.user_id IS NULL OR c.event_type <> 'error'
    """,
    doc="MERGE INTO base USING changes ON user_id: matched+error deletes, "
    "matched updates, unmatched non-error inserts (reference state upsert, "
    "impl.ex:1100-1180). Compiled as full-outer join + row routing, the "
    "same physical shape Delta/Iceberg produce for MERGE.",
)
def q92_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_SPLIT).cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))

    def latest(df: DataFrame) -> DataFrame:
        return df.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")

    # Explicit presence flags per side: the ts < / >= split filters
    # already exclude NULL-ts rows, so b_ts/c_ts nullness routing would
    # be equivalent here — the flags just make join-side presence
    # explicit rather than inferred from a data column.
    base = latest(ev.filter(F.col("ts") < split)).select(
        "user_id",
        F.col("value").alias("b_value"),
        F.col("ts").alias("b_ts"),
        F.lit(True).alias("in_base"),
    )
    chg = latest(ev.filter(F.col("ts") >= split)).select(
        "user_id",
        F.col("value").alias("c_value"),
        F.col("ts").alias("c_ts"),
        "event_type",
        F.lit(True).alias("in_chg"),
    )
    matched_change = F.col("in_chg").isNotNull()
    return (
        base.join(chg, "user_id", "full_outer")
        # WHEN MATCHED AND source is an error event THEN DELETE; an
        # unmatched error change is likewise not inserted.
        .filter(F.col("event_type").isNull() | (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.when(matched_change, F.col("c_value")).otherwise(F.col("b_value")).alias("value"),
            F.when(matched_change, F.col("c_ts")).otherwise(F.col("b_ts")).alias("ts"),
            F.when(F.col("in_base").isNull(), F.lit("insert"))
            .when(F.col("in_chg").isNull(), F.lit("keep"))
            .otherwise(F.lit("update"))
            .alias("op"),
        )
    )


@register(
    "q96_incremental_agg",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DECIMAL(38,6)) AS DOUBLE)
             AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DECIMAL(38,6)) AS DOUBLE)
             / COUNT(*) AS avg_value
    FROM events GROUP BY user_id
    """,
    doc="Incremental materialized-view maintenance: per-user aggregate state "
    "kept as mergeable partials (count/sum/min/max), with the delta window's "
    "partials merged into the history partials instead of rescanning "
    "history — the reference's running device counters (impl.ex:623-674) "
    "maintained the lakehouse way. The oracle is the full recompute, proving "
    "merge(partial(history), partial(delta)) == aggregate(all). At 100 TB "
    "only the delta is scanned per refresh; decimal partial sums make the "
    "merge order-insensitive and bit-reproducible.",
)
def q96_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_SPLIT).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(dmoney("value")).alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )

    history = partial(ev.filter(F.col("ts") < split))
    delta = partial(ev.filter(F.col("ts") >= split))
    merged = (
        history.unionByName(delta)
        .groupBy("user_id")
        .agg(
            F.sum("cnt").alias("n_events"),
            snap(F.sum("s")).alias("sum_value"),
            F.min("mn").alias("min_value"),
            F.max("mx").alias("max_value"),
        )
    )
    return merged.select(
        "user_id",
        "n_events",
        "sum_value",
        "min_value",
        "max_value",
        (F.col("sum_value") / F.col("n_events")).alias("avg_value"),
    )


# ---------------------------------------------------------------------------
# q152 — incremental join-view maintenance (delta propagation)
# ---------------------------------------------------------------------------


@register(
    "q152_incremental_join_view",
    """
    SELECT o.o_orderpriority,
           CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4)))
                AS DECIMAL(38,6)) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Incremental view maintenance for a JOIN view, verified "
    "against full recomputation: the orders/lineitem revenue view is "
    "maintained as V_new = V_old + delta(V), where the join delta "
    "expands by the product rule d(O JOIN L) = dO JOIN L_old + "
    "O_old JOIN dL + dO JOIN dL (deltas: late-arriving orders are "
    "o_orderkey % 5 = 0, late-arriving lineitems are "
    "l_linenumber >= 4 — deliberately OVERLAPPING deltas so all "
    "three product-rule terms are non-empty and a missing term "
    "breaks the hash). Partial aggregates merge by re-aggregation — "
    "sound because the measures are associative sums over EXACT "
    "decimals; the distinct-order count is carried as a keyed set "
    "union, not a count, because COUNT DISTINCT is not "
    "delta-mergeable. The oracle recomputes the view from scratch; "
    "the hash match IS the proof the maintenance algebra loses "
    "nothing. At 100 TB this is the difference between touching "
    "yesterday's partitions and re-joining the world.",
)
def q152_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    o_old = orders.filter(F.col("o_orderkey") % 5 != 0)
    o_new = orders.filter(F.col("o_orderkey") % 5 == 0)
    l_old = li.filter(F.col("l_linenumber") < 4)
    l_new = li.filter(F.col("l_linenumber") >= 4)

    def joined(o, l):
        return o.join(l, o.o_orderkey == l.l_orderkey).select(
            "o_orderpriority", "o_orderkey", dmoney("l_extendedprice").alias("rev")
        )

    # product rule: three delta terms + the old view, all the same
    # (priority, orderkey)-grained partial aggregate, merged by
    # re-aggregation over the union
    parts = (
        joined(o_old, l_old)
        .unionByName(joined(o_new, l_old))
        .unionByName(joined(o_old, l_new))
        .unionByName(joined(o_new, l_new))
    )
    per_order = parts.groupBy("o_orderpriority", "o_orderkey").agg(
        F.sum("rev").alias("rev")
    )
    return (
        per_order.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            snap(F.sum("rev")).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q155 — right-to-erasure propagation (GDPR delete cascade)
# ---------------------------------------------------------------------------

#: deterministic erasure request set: every 97th customer
ERASE_MOD = 97


@register(
    "q155_erasure_propagation",
    f"""
    WITH erased AS (
      SELECT c_custkey FROM customer WHERE c_custkey % {ERASE_MOD} = 0
    ),
    o_gone AS (
      SELECT o_orderkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM erased)
    ),
    counts AS (
      SELECT 'customer' AS tbl,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS rows_before,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM erased) AS rows_erased
      UNION ALL
      SELECT 'orders',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM o_gone)
      UNION ALL
      SELECT 'lineitem',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
              WHERE l_orderkey IN (SELECT o_orderkey FROM o_gone))
    )
    SELECT tbl, rows_before, rows_erased,
           rows_before - rows_erased AS rows_after,
           CAST(0 AS BIGINT) + (
             SELECT COUNT(*) FROM orders o
             WHERE o.o_custkey IN (SELECT c_custkey FROM erased)
               AND o.o_orderkey NOT IN (SELECT o_orderkey FROM o_gone)
           ) AS residual_refs
    FROM counts
    ORDER BY tbl
    """,
    doc="Right-to-erasure cascade (the GDPR/CCPA deletion shape): a "
    "deterministic erasure-request set of customers propagates "
    "through the foreign-key graph — their orders, then those "
    "orders' lineitems — and the report pins per-table "
    "before/erased/after counts plus a residual-reference audit that "
    "must be ZERO (a row surviving with a deleted parent is the "
    "compliance failure this op exists to catch). Every propagation "
    "step is a keyed semi/anti join on the foreign key — the erase "
    "set rides as a broadcast when small and degrades gracefully to "
    "a shuffle join when a bulk request arrives; the erase set and "
    "its order cascade are pinned fragments, so each base table is "
    "scanned at most twice (count + propagation). In a lakehouse deployment the same "
    "plan drives the DELETE MERGE; here it drives the audit "
    "arithmetic the deletion job must satisfy.",
)
def q155_erasure_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")

    from ..plans.fragments import fragment

    # the erase set and its order cascade feed counts, the lineitem
    # propagation AND the residual audit — pin both so each base
    # table really is scanned once
    erased = fragment(
        spark,
        sf_dir,
        "erase_set",
        lambda: cust.filter(F.col("c_custkey") % ERASE_MOD == 0),
    )
    o_gone = fragment(
        spark,
        sf_dir,
        "erase_orders",
        lambda: orders.join(
            erased, orders.o_custkey == erased.c_custkey, "leftsemi"
        ).select("o_orderkey"),
    )
    li_gone = li.join(o_gone, li.l_orderkey == o_gone.o_orderkey, "leftsemi")

    def counts(tbl, full_df, gone_df):
        n = full_df.agg(F.count(F.lit(1)).cast("long").alias("rows_before"))
        g = gone_df.agg(F.count(F.lit(1)).cast("long").alias("rows_erased"))
        return n.crossJoin(F.broadcast(g)).select(
            F.lit(tbl).alias("tbl"), "rows_before", "rows_erased"
        )

    # the audit: orders referencing an erased customer that are NOT in
    # the deletion set — must be empty by construction of o_gone
    residual = (
        orders.join(erased, orders.o_custkey == erased.c_custkey, "leftsemi")
        .join(o_gone, "o_orderkey", "leftanti")
        .agg(F.count(F.lit(1)).cast("long").alias("residual_refs"))
    )
    rows = (
        counts("customer", cust, erased)
        .unionByName(counts("orders", orders, o_gone))
        .unionByName(counts("lineitem", li, li_gone))
    )
    return (
        rows.crossJoin(F.broadcast(residual))
        .select(
            "tbl", "rows_before", "rows_erased",
            (F.col("rows_before") - F.col("rows_erased")).alias("rows_after"),
            "residual_refs",
        )
        .orderBy("tbl")
    )
