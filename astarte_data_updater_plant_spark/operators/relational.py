"""Relational query surface over the star schema (SURVEY §2B).

The reference's relational repertoire is lookup joins, filters and
running aggregations hard-wired in Elixir
(``data_updater/impl.ex``, ``data_updater/queries.ex``); here the same
operator classes — scan, filter+project, hash/broadcast join,
semi/anti join, partial+final aggregation, sort, top-k — are declared
through the DataFrame API so Catalyst chooses the physical strategy.

Scale notes (100 TB design):
- ``region``/``nation`` joins are explicitly broadcast (bounded dims).
- Fact x fact joins (lineitem x orders) stay shuffle joins on the join
  key; AQE handles skew splitting at runtime.
- All aggregates are algebraic (sum/count/min/max) so map-side partial
  aggregation halves the shuffle volume automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dmoney, drate, dsum, dsum_expr, exact_div
from ..plans.registry import register
from ..storage.scratch import scratch_dir
from ..sources.tables import load_table

# Shared decimal-cast fragments for the DuckDB oracle side. Keep in
# sync with functions/exact.py.
_M = "DECIMAL(12,4)"
_R = "DECIMAL(8,4)"


@register(
    "q01_pricing_summary",
    f"""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS {_R})) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS {_M})) AS DOUBLE) AS sum_base_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS {_M}) * (CAST(1 AS {_R}) - CAST(l_discount AS {_R}))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS {_M}) * (CAST(1 AS {_R}) - CAST(l_discount AS {_R})) * (CAST(1 AS {_R}) + CAST(l_tax AS {_R}))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS {_R})) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS {_M})) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS {_R})) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan -> filter -> 8-way algebraic aggregate -> sort. "
    "Mirrors the reference's running counters (impl.ex:623-674) generalized "
    "to grouped partial+final aggregation.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dmoney("l_extendedprice") * (F.lit(1).cast("decimal(8,4)") - drate("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(8,4)") + drate("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(drate("l_quantity")).cast("double").alias("sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum_expr(disc_price, "sum_disc_price"),
            dsum_expr(charge, "sum_charge"),
            exact_div(F.sum(drate("l_quantity")), n, "avg_qty"),
            exact_div(F.sum(dmoney("l_extendedprice")), n, "avg_price"),
            exact_div(F.sum(drate("l_discount")), n, "avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q03_shipping_priority",
    f"""
    SELECT
      l.l_orderkey,
      CAST(CAST(SUM(CAST(l.l_extendedprice AS {_M}) * (CAST(1 AS {_R}) - CAST(l.l_discount AS {_R}))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
      o.o_orderdate,
      o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-03-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective dim filter -> 3-way join -> grouped "
    "aggregate -> global top-10. The customer side is filtered before the "
    "join so Catalyst can broadcast it.",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-01 00:00:00").cast("timestamp")
    )
    revenue = dmoney("l_extendedprice") * (F.lit(1).cast("decimal(8,4)") - drate("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_expr(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q04_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: left-semi join (EXISTS) -> aggregate. Same operator "
    "class as the reference's trigger-target existence checks.",
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate)
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q05_local_supplier_volume",
    f"""
    SELECT
      n.n_name,
      CAST(CAST(SUM(CAST(l.l_extendedprice AS {_M}) * (CAST(1 AS {_R}) - CAST(l.l_discount AS {_R}))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey AND s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 shape: 6-way star join; nation/region/supplier broadcast, "
    "fact x fact shuffle join on orderkey.",
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = dmoney("l_extendedprice") * (F.lit(1).cast("decimal(8,4)") - drate("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(n),
            (c.c_nationkey == n.n_nationkey) & (s.s_nationkey == n.n_nationkey),
        )
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum_expr(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@register(
    "q06_forecast_revenue",
    f"""
    SELECT
      CAST(CAST(SUM(CAST(l_extendedprice AS {_M}) * CAST(l_discount AS {_R})) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure filter + scalar aggregate; every predicate "
    "pushes down to the parquet scan.",
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07) & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum_expr(dmoney("l_extendedprice") * drate("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q07_customers_without_orders",
    """
    SELECT c.c_custkey, c.c_name, c.c_acctbal
    FROM customer c
    ANTI JOIN orders o ON o.o_custkey = c.c_custkey
    ORDER BY c.c_custkey
    """,
    doc="Left anti join — the exact operator class of the reference's "
    "property-prune (impl.ex:1334-1411): stored paths NOT IN the alive set.",
)
def q07_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


@register(
    "q02_part_supplier_stats",
    f"""
    SELECT
      p.p_brand,
      p.p_type,
      COUNT(DISTINCT l.l_suppkey) AS supplier_cnt,
      CAST(SUM(CAST(l.l_quantity AS {_R})) AS DOUBLE) AS total_qty
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 20
    GROUP BY p.p_brand, p.p_type
    ORDER BY supplier_cnt DESC, p_brand, p_type
    """,
    doc="TPC-H Q16 shape: broadcast dim join + COUNT(DISTINCT) (expand + "
    "two-phase aggregate under Catalyst).",
)
def q02_part_supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 20)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.sum(drate("l_quantity")).cast("double").alias("total_qty"),
        )
        .orderBy(F.col("supplier_cnt").desc(), F.col("p_brand"), F.col("p_type"))
    )


@register(
    "q08_rollup_revenue",
    f"""
    SELECT
      COALESCE(r.r_name, 'ALL') AS region_name,
      COALESCE(n.n_name, 'ALL') AS nation_name,
      CAST(SUM(CAST(o.o_totalprice AS {_M})) AS DOUBLE) AS total_revenue,
      COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    ORDER BY region_name, nation_name
    """,
    doc="ROLLUP hierarchy aggregate (region -> nation -> grand total): the "
    "multi-level counter rollups of the reference generalized.",
)
def q08_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(dsum("o_totalprice", "total_revenue"), F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation_name"),
            "total_revenue",
            "n_orders",
        )
        .orderBy("region_name", "nation_name")
    )


@register(
    "q67_grouping_sets",
    f"""
    SELECT
      COALESCE(o_orderpriority, 'ALL') AS order_priority,
      COALESCE(o_orderstatus, 'ALL') AS order_status,
      CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
      CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      CAST(SUM(CAST(o_totalprice AS {_M})) AS DOUBLE) AS total_revenue,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    ORDER BY g_priority, g_status, order_priority, order_status
    """,
    doc="Explicit GROUPING SETS (two independent dimension rollups + "
    "grand total in ONE pass over the fact table — one shuffle instead "
    "of three separate aggregates union-ed), with GROUPING() flags "
    "disambiguating the ALL rows. Completes the grouping-analytics "
    "family next to ROLLUP (q08) and CUBE (q09).",
)
def q67_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            dsum("o_totalprice", "total_revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("order_priority"),
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("order_status"),
            "g_priority",
            "g_status",
            "total_revenue",
            "n_orders",
        )
        .orderBy("g_priority", "g_status", "order_priority", "order_status")
    )


@register(
    "q69_above_customer_average",
    f"""
    SELECT o.o_custkey AS custkey, o.o_orderkey AS orderkey,
           o.o_totalprice AS totalprice,
           cavg.avg_price AS cust_avg
    FROM orders o
    JOIN (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS {_M})) AS DOUBLE) / COUNT(*) AS avg_price
      FROM orders GROUP BY o_custkey
    ) cavg ON cavg.o_custkey = o.o_custkey
    WHERE o.o_totalprice > cavg.avg_price
    ORDER BY custkey, orderkey
    """,
    doc="Correlated scalar subquery (each order vs ITS customer's "
    "average) decorrelated into a window aggregate: one shuffle on "
    "the correlation key computes the per-customer average and the "
    "comparison in the same pass — no second scan of the fact table, "
    "no join, which is the plan a naive correlated rewrite (self-join "
    "on the aggregate, as the oracle states it) would cost. Averages "
    "compare in exact DECIMAL so the predicate cuts identically on "
    "both engines.",
)
def q69_above_customer_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    # exact DECIMAL sum, divided ONCE in double (same as the oracle's
    # CAST(SUM(...) AS DOUBLE) / COUNT(*)) so the predicate cut and
    # the surfaced average are both bit-identical
    avg_price = F.sum(dmoney("o_totalprice")).over(w).cast("double") / F.count(
        F.lit(1)
    ).over(w)
    return (
        o.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            avg_price.alias("cust_avg"),
        )
        .filter(F.col("totalprice") > F.col("cust_avg"))
        .orderBy("custkey", "orderkey")
    )


@register(
    "q70_unpivot_measures",
    f"""
    WITH agg AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS {_R})) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS {_M})) AS DOUBLE) AS sum_price,
             CAST(COUNT(*) AS DOUBLE) AS n_items
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM agg
    UNION ALL
    SELECT l_returnflag, 'n_items', n_items FROM agg
    ORDER BY l_returnflag, measure
    """,
    doc="UNPIVOT (melt): the wide per-flag aggregate flips into long "
    "(key, measure, value) rows — the inverse of q19's pivot, "
    "completing the reshape pair. Spark's native unpivot expands "
    "columns to rows inside the projection (zero extra shuffles "
    "beyond the aggregate); the oracle states the portable UNION ALL "
    "formulation, which would re-scan the aggregate per measure.",
)
def q70_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        dsum_expr(drate("l_quantity"), "sum_qty"),
        dsum("l_extendedprice", "sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_items"),
    )
    return (
        agg.unpivot(
            ids=["l_returnflag"],
            values=["sum_qty", "sum_price", "n_items"],
            variableColumnName="measure",
            valueColumnName="value",
        )
        .orderBy("l_returnflag", "measure")
    )


_HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")
_HI_SQL = ", ".join(f"'{p}'" for p in _HIGH_PRIORITIES)


@register(
    "q71_priority_line_classes",
    f"""
    SELECT l.l_returnflag,
           COUNT(CASE WHEN o.o_orderpriority IN ({_HI_SQL}) THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o.o_orderpriority NOT IN ({_HI_SQL}) THEN 1 END) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    doc="TPC-H Q12 shape: fact x fact equi-join (lineitem x orders "
    "shuffle on orderkey, AQE-managed) feeding CONDITIONAL "
    "aggregation — both priority classes counted in the single "
    "post-join pass instead of two filtered scans. Partial "
    "aggregation runs map-side on the join output before the "
    "group-by shuffle on returnflag.",
)
def q71_priority_line_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    is_high = F.col("o_orderpriority").isin(*_HIGH_PRIORITIES)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(is_high, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~is_high, F.lit(1))).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


#: Orders whose total line quantity exceeds this are "large" (99th
#: percentile is ~262 at sf0.01; the cut stays selective at any SF
#: because per-order line count is scale-invariant).
LARGE_ORDER_MIN_QTY = 250


@register(
    "q72_large_order_customers",
    f"""
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS {_R})) AS DOUBLE) AS total_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING CAST(SUM(CAST(l_quantity AS {_R})) AS DOUBLE) > {LARGE_ORDER_MIN_QTY}
    )
    SELECT c.c_custkey AS custkey, o.o_orderkey AS orderkey,
           o.o_orderdate AS orderdate, o.o_totalprice AS totalprice,
           b.total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY orderkey
    """,
    doc="TPC-H Q18 shape: aggregate-then-filter (HAVING) produces a "
    "tiny survivor set (~1% of orders), which then drives the joins "
    "BUILD-side: broadcast the survivors against orders, then join "
    "customer. The group-by shuffle is the only full-fact shuffle; "
    "everything after it moves rows proportional to the survivors, "
    "which is the property that matters when lineitem is 100 TB.",
)
def q72_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum_expr(drate("l_quantity"), "total_qty"))
        .filter(F.col("total_qty") > LARGE_ORDER_MIN_QTY)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            "total_qty",
        )
        .orderBy("orderkey")
    )


@register(
    "q86_date_functions",
    """
    SELECT o_orderkey AS orderkey,
           o_orderdate AS orderdate,
           year(o_orderdate) AS y,
           quarter(o_orderdate) AS q,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           weekofyear(o_orderdate) AS iso_week,
           isodow(o_orderdate) - 1 AS weekday0,
           dayname(o_orderdate) AS day_name,
           last_day(o_orderdate) AS month_end,
           date_diff('day', DATE '1970-01-01', o_orderdate) AS epoch_days,
           o_orderdate + INTERVAL 7 DAY AS next_week
    FROM orders
    ORDER BY orderkey
    """,
    doc="The calendar/date scalar surface in one declared query: "
    "year/quarter/month/day extraction, ISO week, Monday-zero "
    "weekday, day name, month end, epoch-day arithmetic, interval "
    "addition — all whole-stage-codegen'd projections. Weekday "
    "conventions differ across engines (Spark dayofweek is "
    "Sunday=1, DuckDB dayofweek is Sunday=0), so both sides state "
    "the unambiguous Monday-zero form explicitly.",
)
def q86_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        o.select(
            F.col("o_orderkey").alias("orderkey"),
            d.alias("orderdate"),
            F.year(d).cast("long").alias("y"),
            F.quarter(d).cast("long").alias("q"),
            F.month(d).cast("long").alias("m"),
            F.dayofmonth(d).cast("long").alias("d"),
            F.weekofyear(d).cast("long").alias("iso_week"),
            F.expr("weekday(o_orderdate)").cast("long").alias("weekday0"),
            F.date_format(d, "EEEE").alias("day_name"),
            F.last_day(d).alias("month_end"),
            F.datediff(d, F.lit("1970-01-01")).cast("long").alias("epoch_days"),
            (d + F.expr("INTERVAL 7 DAYS")).alias("next_week"),
        )
        .orderBy("orderkey")
    )


N_BUCKETS = 8


@register(
    "q88_bucketed_join",
    f"""
    SELECT o.o_orderpriority AS order_priority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS {_M})) AS DOUBLE) AS sum_price
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY order_priority
    """,
    doc="Co-located fact x fact join via BUCKETING: both tables are "
    "written bucketed by the join key (hash into {N_BUCKETS} "
    "buckets, sorted within), so the join plan has NO Exchange on "
    "either side — bucket i of lineitem joins bucket i of orders "
    "where each already sits. At 100 TB this turns the biggest "
    "shuffle in the workload (re-partitioning both fact tables by "
    "orderkey per query) into a one-time layout cost amortized over "
    "every subsequent join on that key — the lakehouse equivalent "
    "of the reference's Cassandra clustering by device key. The "
    "oracle states the same join declaratively; results are "
    "layout-independent by definition.",
)
def q88_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    root = scratch_dir(prefix="q88_bucketed_")
    for name, df, key in (
        ("q88_lineitem", li, "l_orderkey"),
        ("q88_orders", o, "o_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .option("path", os.path.join(root, name))
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    lb = spark.table("q88_lineitem")
    # the merge hint pins the sort-merge strategy (at test scale the
    # optimizer would broadcast the small side and never exercise the
    # bucket layout; at 100 TB sort-merge IS the choice) — with both
    # inputs bucketed+sorted on the key, the join needs no Exchange
    # and no Sort on either side
    ob = spark.table("q88_orders").hint("merge")
    return (
        lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("order_priority"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_extendedprice", "sum_price"),
        )
        .orderBy("order_priority")
    )


_BLOOM_CONFS = {
    # Force the shuffle-join path (runtime filters are not injected for
    # broadcast joins) and make the injection thresholds reachable at
    # test scale; at 100 TB the defaults trigger on their own.
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


@register(
    "q97_bloom_semi_join",
    """
    SELECT l_returnflag,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(8,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_orderkey = lineitem.l_orderkey
        AND o.o_orderpriority = '1-URGENT'
        AND o.o_totalprice > 150000
    )
    GROUP BY l_returnflag
    """,
    doc="Semi-join pruned by an optimizer-injected runtime bloom filter: the "
    "selective orders side builds a bloom_filter_agg, broadcast as a scalar "
    "subquery, and might_contain() prunes lineitem rows BEFORE the shuffle "
    "— Spark's runtime-filter answer to the reference's per-device cache "
    "membership test (cache.ex:24-40). At 100 TB this cuts the shuffled "
    "fact rows to ~the matching fraction; result is bloom-independent "
    "(false positives removed by the exact join), so the oracle is the "
    "plain EXISTS.",
)
def q97_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000)
    )
    saved = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        out = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_semi")
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(drate("l_quantity")).cast("double").alias("sum_qty"),
            )
        )
        # Materialize the physical plan while the scoped confs are set;
        # QueryExecution caches it, so the caller's later collect() keeps
        # the bloom-pruned plan even after the confs are restored.
        out._jdf.queryExecution().executedPlan()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return out


@register(
    "q124_promo_revenue",
    f"""
    WITH m AS (
      SELECT CAST(date_trunc('month', l.l_shipdate) AS DATE) AS month,
             CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                  THEN CAST(l.l_extendedprice AS {_M})
                       * (CAST(1 AS {_R}) - CAST(l.l_discount AS {_R}))
                  ELSE CAST(0 AS DECIMAL(20,8)) END) AS DECIMAL(38,6)) AS DOUBLE)
               AS promo_revenue,
             CAST(CAST(SUM(CAST(l.l_extendedprice AS {_M})
                  * (CAST(1 AS {_R}) - CAST(l.l_discount AS {_R})))
                  AS DECIMAL(38,6)) AS DOUBLE) AS total_revenue
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1
    )
    SELECT month, promo_revenue, total_revenue,
           100.0 * promo_revenue / total_revenue AS promo_pct
    FROM m
    ORDER BY month
    """,
    doc="TPC-H Q14 shape: monthly promo-revenue share — a conditional "
    "exact-decimal aggregate over the fact x broadcast-dimension join, "
    "with the percentage computed ONCE from the two snapped doubles so "
    "it is engine-identical. The plan is one shuffle (the month "
    "groupBy) over a broadcast hash join; the CASE rides the same "
    "partial/final aggregation as the unconditional sum.",
)
def q124_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = dmoney("l_extendedprice") * (
        F.lit(1).cast("decimal(8,4)") - drate("l_discount")
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(20,8)")
    )
    m = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").cast("date").alias("month"))
        .agg(
            dsum_expr(promo, "promo_revenue"),
            dsum_expr(rev, "total_revenue"),
        )
    )
    return m.select(
        "month",
        "promo_revenue",
        "total_revenue",
        (100.0 * F.col("promo_revenue") / F.col("total_revenue")).alias("promo_pct"),
    ).orderBy("month")


#: the Q19-style OR-of-ANDs branches: (brand, size range, qty range)
_Q125_BRANCHES = (
    ("Brand#12", 1, 10, 1, 20),
    ("Brand#23", 11, 25, 10, 30),
    ("Brand#34", 26, 50, 20, 40),
)


@register(
    "q125_or_predicate_revenue",
    f"""
    SELECT CASE {" ".join(
        f"WHEN p.p_brand = '{b}' AND p.p_size BETWEEN {s0} AND {s1} "
        f"AND l.l_quantity BETWEEN {q0} AND {q1} THEN '{b}'"
        for b, s0, s1, q0, q1 in _Q125_BRANCHES)} END AS branch,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS {_M})
                * (CAST(1 AS {_R}) - CAST(l.l_discount AS {_R})))
                AS DECIMAL(38,6)) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE {" OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN {s0} AND {s1} "
        f"AND l.l_quantity BETWEEN {q0} AND {q1})"
        for b, s0, s1, q0, q1 in _Q125_BRANCHES)}
    GROUP BY 1
    ORDER BY branch
    """,
    doc="TPC-H Q19 shape: disjunction of multi-column conjunctions "
    "(brand x size range x quantity range) over the fact x dimension "
    "join, revenue per matching branch. The interesting part is what "
    "Catalyst does with the OR: brand/size conjuncts are "
    "dimension-only and quantity conjuncts fact-only, so the "
    "simplified residuals push to BOTH scans as range filters while "
    "the joint disjunction evaluates post-join — predicate pushdown "
    "through a disjunction, the classic Q19 optimizer test.",
)
def q125_or_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")

    def arm(b, s0, s1, q0, q1):
        return (
            (F.col("p_brand") == b)
            & F.col("p_size").between(s0, s1)
            & F.col("l_quantity").between(q0, q1)
        )

    arms = [arm(*br) for br in _Q125_BRANCHES]
    cond = arms[0] | arms[1] | arms[2]
    branch = (
        F.when(arms[0], F.lit(_Q125_BRANCHES[0][0]))
        .when(arms[1], F.lit(_Q125_BRANCHES[1][0]))
        .when(arms[2], F.lit(_Q125_BRANCHES[2][0]))
    )
    rev = dmoney("l_extendedprice") * (
        F.lit(1).cast("decimal(8,4)") - drate("l_discount")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .groupBy(branch.alias("branch"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            dsum_expr(rev, "revenue"),
        )
        .orderBy("branch")
    )


@register(
    "q137_lonely_late_supplier",
    """
    SELECT s.s_name, n.n_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name, n.n_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): for "
    "finished orders, find lineitems shipped >60 days after the order "
    "date where ANOTHER supplier participated in the order (EXISTS -> "
    "left-semi join) but NO other supplier was also late (NOT EXISTS "
    "-> left-anti join). The reference relational surface has nothing "
    "multi-correlated like this; in Spark both correlations compile "
    "to keyed semi/anti hash joins on l_orderkey — no per-row "
    "subquery execution — and the supplier/nation dims broadcast. "
    "The late set is computed once and reused as both the probe and "
    "the anti side, so the fact table is scanned twice, joined "
    "three times, all on the same l_orderkey key.",
)
def q137_lonely_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = li.join(
        orders_f, li.l_orderkey == orders_f.o_orderkey
    ).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).select("l_orderkey", "l_suppkey")

    l2 = li.select(
        F.col("l_orderkey").alias("r_orderkey"), F.col("l_suppkey").alias("r_suppkey")
    )
    with_other = late.join(
        l2,
        (late.l_orderkey == l2.r_orderkey) & (late.l_suppkey != l2.r_suppkey),
        "leftsemi",
    )
    other_late = late.select(
        F.col("l_orderkey").alias("a_orderkey"), F.col("l_suppkey").alias("a_suppkey")
    )
    lonely = with_other.join(
        other_late,
        (with_other.l_orderkey == other_late.a_orderkey)
        & (with_other.l_suppkey != other_late.a_suppkey),
        "leftanti",
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        lonely.join(F.broadcast(supp), lonely.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "q138_important_parts",
    f"""
    SELECT p.p_partkey, p.p_name,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS {_M}) *
                (CAST(1 AS {_R}) - CAST(l.l_discount AS {_R})))
                AS DECIMAL(38,6)) AS DOUBLE) AS part_value
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_partkey, p.p_name
    HAVING CAST(SUM(CAST(l.l_extendedprice AS {_M}) *
               (CAST(1 AS {_R}) - CAST(l.l_discount AS {_R})))
               AS DECIMAL(38,6)) * 200 >
           (SELECT CAST(SUM(CAST(l2.l_extendedprice AS {_M}) *
                   (CAST(1 AS {_R}) - CAST(l2.l_discount AS {_R})))
                   AS DECIMAL(38,6))
            FROM lineitem l2)
    ORDER BY part_value DESC, p_partkey
    """,
    doc="TPC-H Q11 shape (important stock): per-part revenue compared "
    "against a FRACTION of the global total — the HAVING-over-scalar-"
    "subquery pattern. Both sides aggregate through exact DECIMAL and "
    "the threshold test multiplies by the integer 200 (i.e. keeps "
    "parts above 1/200 of total revenue) instead of dividing, so the "
    "comparison is exact — no float threshold wobble can flip a "
    "borderline part between engines. In Spark the global total is a "
    "1-row aggregate cross-joined (broadcast) into the per-part "
    "aggregate: one fact scan per aggregate, one shuffle each, no "
    "repeated per-group subquery.",
)
def q138_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    rev = dmoney("l_extendedprice") * (F.lit(1).cast("decimal(8,4)") - drate("l_discount"))
    per_part = li.groupBy("l_partkey").agg(
        F.sum(rev).cast("decimal(38,6)").alias("val")
    )
    total = li.agg(F.sum(rev).cast("decimal(38,6)").alias("total"))
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("val") * 200 > F.col("total"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select(
            "p_partkey",
            "p_name",
            F.col("val").cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


@register(
    "q150_order_count_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape (customer order-count distribution): the "
    "LEFT outer join keeps zero-order customers — COUNT(o_orderkey) "
    "counts only matched rows, so the 0 bucket exists and an inner "
    "join would silently drop it (the classic histogram-of-activity "
    "bug). Two aggregations: per-customer count (shuffle on custkey, "
    "which the join already established — Spark reuses the "
    "partitioning, no second exchange for the groupBy), then the "
    "tiny count-of-counts. All integers, hash-exact.",
)
def q150_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q151_idle_rich_customers",
    f"""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(CAST(SUM(CAST(c.c_acctbal AS {_M})) AS DECIMAL(38,6)) AS DOUBLE)
             AS totacctbal
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (
        SELECT CAST(CAST(SUM(CAST(c2.c_acctbal AS {_M})) AS DECIMAL(38,6))
                    AS DOUBLE) / COUNT(*)
        FROM customer c2 WHERE c2.c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY n.n_name
    ORDER BY n_name
    """,
    doc="TPC-H Q22 shape (rich customers who never ordered): the "
    "threshold is a decorrelated scalar subquery — the positive-"
    "balance average computed ONCE as an exact DECIMAL sum divided "
    "a single time in DOUBLE (identical on both engines; a float "
    "AVG would be partial-order dependent and could flip borderline "
    "customers) — broadcast into the per-row filter; the NOT EXISTS "
    "compiles to a left-anti hash join on custkey. One customer "
    "scan per aggregate, nation broadcast, anti join keyed — the "
    "find-the-disengaged-cohort query every CRM-scale dataset runs.",
)
def q151_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(12,4)"))
                .cast("decimal(38,6)")
                .cast("double")
                / F.count(F.lit(1))
            ).alias("threshold")
        )
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rich = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(orders, cust.c_custkey == orders.o_custkey, "leftanti")
    )
    return (
        rich.join(F.broadcast(nation), rich.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(12,4)"))
            .cast("decimal(38,6)")
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("n_name")
    )


@register(
    "q171_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(CAST(SUM(CAST(l_extendedprice AS {_M}) *
                  (CAST(1 AS {_R}) - CAST(l_discount AS {_R})))
                  AS DECIMAL(38,6)) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape (top supplier by quarterly revenue view): "
    "aggregate a revenue view, take its scalar MAX, and join back "
    "for ALL suppliers achieving it — the classic view + scalar-"
    "subquery decorrelation, which Spark compiles to one aggregate, "
    "a 1-row broadcast, and an equality filter (never a re-aggregate "
    "per row). Ties are semantically possible and both engines must "
    "return every tying supplier; revenue goes through exact DECIMAL "
    "so no 1-ulp wobble can break the equality against the max.",
)
def q171_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum_expr(
            dmoney("l_extendedprice")
            * (F.lit(1).cast("decimal(8,4)") - drate("l_discount")),
            "total_revenue",
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q172 — min-cost supplier per part (TPC-H Q2 shape, lineitem as supply)
# ---------------------------------------------------------------------------

#: Q2 adaptation: the schema has no partsupp table, so the supply
#: relation is the observed (supplier, part) offers in lineitem, with
#: unit cost in exact cents: (extendedprice * 100) DIV quantity —
#: integer division is truncation on both engines for positive values.
_Q172_COST = f"CAST(CAST(l_extendedprice AS {_M}) * 100 AS BIGINT) // CAST(l_quantity AS BIGINT)"


@register(
    "q172_min_cost_supplier",
    f"""
    WITH eur AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    offers AS (
      SELECT l.l_partkey, l.l_suppkey,
             MIN({_Q172_COST}) AS cost_c2
      FROM lineitem l JOIN eur ON eur.s_suppkey = l.l_suppkey
      GROUP BY l.l_partkey, l.l_suppkey
    ),
    best AS (
      SELECT l_partkey, l_suppkey, cost_c2,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY cost_c2, l_suppkey) AS rn
      FROM offers
    )
    SELECT p.p_partkey, p.p_type, b.cost_c2,
           e.s_suppkey AS suppkey, e.s_name AS supp_name,
           e.n_name AS nation, e.s_acctbal AS acctbal
    FROM best b
    JOIN part p ON p.p_partkey = b.l_partkey
    JOIN eur e ON e.s_suppkey = b.l_suppkey
    WHERE b.rn = 1 AND p.p_size >= 30 AND p.p_type = 'STANDARD'
    ORDER BY acctbal DESC, p_partkey
    """,
    doc="TPC-H Q2 shape (min-cost supplier per part), re-expressed for "
    "a schema without partsupp: the supply relation is the observed "
    "(supplier, part) offers in lineitem, the EUROPE supplier dim "
    "broadcasts, per-pair min unit cost is one keyed aggregate, and "
    "the classic correlated MIN subquery becomes a per-part keyed "
    "window (rank 1 on cost, suppkey tie-break). Unit cost is exact "
    "integer cents (DECIMAL*100 then integer division — truncation "
    "identical on both engines), so the argmin is bit-deterministic. "
    "Plan: one fact shuffle on (part, supp), one keyed window on "
    "part, broadcast dims everywhere else.",
)
def q172_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") >= 30) & (F.col("p_type") == "STANDARD")
    )
    eur = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        li.join(F.broadcast(eur.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.expr(
                    f"CAST(CAST(l_extendedprice AS {_M}) * 100 AS BIGINT)"
                    " DIV CAST(l_quantity AS BIGINT)"
                )
            ).alias("cost_c2")
        )
    )
    w = Window.partitionBy("l_partkey").orderBy("cost_c2", "l_suppkey")
    best = offers.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .join(F.broadcast(eur), best.l_suppkey == eur.s_suppkey)
        .select(
            "p_partkey", "p_type", "cost_c2",
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("nation"),
            F.col("s_acctbal").alias("acctbal"),
        )
        .orderBy(F.col("acctbal").desc(), "p_partkey")
    )


# ---------------------------------------------------------------------------
# q173 — national market share within a region (TPC-H Q8 shape)
# ---------------------------------------------------------------------------

_Q8_REGION = "ASIA"
_Q8_NATION = "NATION_7"
_Q8_TYPE = "ECONOMY"


@register(
    "q173_market_share",
    f"""
    WITH rev AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             sn.n_name AS supp_nation,
             CAST(l.l_extendedprice AS {_M})
               * (CAST(1 AS {_R}) - CAST(l.l_discount AS {_R})) AS volume
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = cn.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = '{_Q8_REGION}' AND p.p_type = '{_Q8_TYPE}'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = '{_Q8_NATION}' THEN volume
                         ELSE CAST(0 AS DECIMAL(20,8)) END) AS DECIMAL(38,6))
                AS DOUBLE) AS nation_volume,
           CAST(CAST(SUM(volume) AS DECIMAL(38,6)) AS DOUBLE) AS total_volume,
           CAST(CAST(SUM(CASE WHEN supp_nation = '{_Q8_NATION}' THEN volume
                         ELSE CAST(0 AS DECIMAL(20,8)) END) AS DECIMAL(38,6))
                AS DOUBLE)
             / CAST(CAST(SUM(volume) AS DECIMAL(38,6)) AS DOUBLE) AS mkt_share
    FROM rev GROUP BY o_year ORDER BY o_year
    """,
    doc="TPC-H Q8 shape (national market share): the 8-way star join — "
    "fact x orders shuffle join, every dimension broadcast, nation "
    "joined TWICE under different roles (customer market vs supplier "
    "origin) — then a per-year conditional exact-decimal aggregate; "
    "the share divides the two snapped doubles once, so it is "
    "engine-identical. The market filter (region + product type) "
    "prunes before the fact join; Catalyst pushes both predicates "
    "into the broadcast dims.",
)
def q173_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == _Q8_TYPE)
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == _Q8_REGION)
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    volume = dmoney("l_extendedprice") * (
        F.lit(1).cast("decimal(8,4)") - drate("l_discount")
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(reg), F.col("cn_region") == reg.r_regionkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(sn), sup.s_nationkey == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            "supp_nation",
            volume.alias("volume"),
        )
    )
    nation_vol = F.when(
        F.col("supp_nation") == _Q8_NATION, F.col("volume")
    ).otherwise(F.lit(0).cast("decimal(20,8)"))
    out = rev.groupBy("o_year").agg(
        dsum_expr(nation_vol, "nation_volume"),
        dsum_expr(F.col("volume"), "total_volume"),
    )
    return out.select(
        "o_year",
        "nation_volume",
        "total_volume",
        (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
    ).orderBy("o_year")


# ---------------------------------------------------------------------------
# q174 — product profit by nation and year (TPC-H Q9 shape)
# ---------------------------------------------------------------------------

#: no partsupp table -> supply cost is modeled as a fixed fraction of
#: the part's retail price (5%), keeping Q9's mixed-factor arithmetic
#: and join topology intact
_Q9_COST_FRAC = "0.05"


@register(
    "q174_product_profit",
    f"""
    SELECT sn.n_name AS nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS o_year,
           CAST(CAST(SUM(
             CAST(l.l_extendedprice AS {_M})
               * (CAST(1 AS {_R}) - CAST(l.l_discount AS {_R}))
             - CAST(l.l_quantity AS {_R})
               * CAST(p.p_retailprice AS {_M})
               * CAST({_Q9_COST_FRAC} AS {_R})
           ) AS DECIMAL(38,6)) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape (product profit by supplier nation and year), "
    "adapted to a schema without partsupp: supply cost is a fixed "
    "fraction of p_retailprice, preserving the revenue-minus-cost "
    "mixed-decimal expression (money*rate minus rate*money*rate — the "
    "documented exact-decimal widths, snapped once at the end). Plan: "
    "the p_name LIKE filter prunes the broadcast part dim before the "
    "fact join, supplier/nation broadcast, one groupBy shuffle with "
    "map-side partial aggregation.",
)
def q174_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    amount = dmoney("l_extendedprice") * (
        F.lit(1).cast("decimal(8,4)") - drate("l_discount")
    ) - drate("l_quantity") * dmoney("p_retailprice") * F.lit(0.05).cast(
        "decimal(8,4)"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(dsum_expr(amount, "profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# q175 — small-quantity order revenue (TPC-H Q17 shape)
# ---------------------------------------------------------------------------


@register(
    "q175_small_qty_revenue",
    f"""
    WITH pavg AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
             CAST(COUNT(*) AS BIGINT) AS qty_cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_small,
      CAST(CAST(SUM(CAST(l.l_extendedprice AS {_M})) AS DECIMAL(38,6))
           AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pavg  ON pavg.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11' AND p.p_type = 'SMALL'
      AND 5 * CAST(l.l_quantity AS BIGINT) * pavg.qty_cnt < pavg.qty_sum
    """,
    doc="TPC-H Q17 shape (revenue from small-quantity orders): the "
    "correlated 0.2*AVG(quantity) subquery becomes a per-part "
    "aggregate joined back to the fact, and the fractional threshold "
    "is CROSS-MULTIPLIED into pure integer arithmetic "
    "(5*qty*cnt < sum <=> qty < 0.2*sum/cnt) so the cut is "
    "bit-deterministic on both engines — no float division anywhere "
    "near the predicate. Plan: two passes over lineitem sharing the "
    "l_partkey partitioning (aggregate, then join), brand/type "
    "filters pruning the broadcast part dim.",
)
def q175_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#11") & (F.col("p_type") == "SMALL")
    )
    pavg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty_sum"),
        F.count(F.lit(1)).alias("qty_cnt"),
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pavg, li.l_partkey == F.col("pk"))
        .filter(
            5 * F.col("l_quantity").cast("bigint") * F.col("qty_cnt")
            < F.col("qty_sum")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_small"),
            (dsum("l_extendedprice", "rev") / F.lit(7.0)).alias("avg_yearly"),
        )
        .select("n_small", "avg_yearly")
    )


# ---------------------------------------------------------------------------
# q176 — suppliers with excess share of a forecast part (TPC-H Q20 shape)
# ---------------------------------------------------------------------------


@register(
    "q176_excess_stock_suppliers",
    """
    WITH fparts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'large%'
    ),
    shipped AS (
      SELECT l.l_partkey, l.l_suppkey,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS pair_qty
      FROM lineitem l
      JOIN fparts fp ON fp.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l.l_partkey, l.l_suppkey
    ),
    totals AS (
      SELECT l_partkey, CAST(SUM(pair_qty) AS BIGINT) AS part_qty
      FROM shipped GROUP BY l_partkey
    ),
    dominant AS (
      SELECT DISTINCT s.l_suppkey
      FROM shipped s JOIN totals t ON t.l_partkey = s.l_partkey
      WHERE 2 * s.pair_qty > t.part_qty
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS supp_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'AMERICA'
      AND s.s_suppkey IN (SELECT l_suppkey FROM dominant)
    ORDER BY suppkey
    """,
    doc="TPC-H Q20 shape (suppliers holding excess stock of forecast "
    "parts), adapted without partsupp: 'stock share' is the supplier's "
    "shipped share of each forecast part in the window, and the 50% "
    "threshold is cross-multiplied to integers (2*pair_qty > part_qty) "
    "so the cut is exact. The nested-subquery chain becomes two "
    "stacked aggregates REUSING one (part, supp) partitioning, then a "
    "left-semi join into the region-filtered supplier dim — the "
    "classic EXISTS-to-semi-join rewrite Catalyst would emit for the "
    "original nested form.",
)
def q176_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    fparts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("large%")
    ).select("p_partkey")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    shipped = (
        li.join(F.broadcast(fparts), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("pair_qty"))
    )
    totals = shipped.groupBy(F.col("l_partkey").alias("tk")).agg(
        F.sum("pair_qty").alias("part_qty")
    )
    dominant = (
        shipped.join(totals, shipped.l_partkey == F.col("tk"))
        .filter(2 * F.col("pair_qty") > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .join(dominant, sup.s_suppkey == dominant.l_suppkey, "left_semi")
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("nation"),
        )
        .orderBy("suppkey")
    )


# ---------------------------------------------------------------------------
# q177 — top customers by returned-item revenue (TPC-H Q10 shape)
# ---------------------------------------------------------------------------


@register(
    "q177_returned_item_customers",
    f"""
    SELECT c.c_custkey AS custkey, c.c_name AS cust_name,
           n.n_name AS nation, c.c_acctbal AS acctbal,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS {_M})
                * (CAST(1 AS {_R}) - CAST(l.l_discount AS {_R})))
                AS DECIMAL(38,6)) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY custkey, cust_name, nation, acctbal
    ORDER BY revenue DESC, custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (top customers by revenue lost to returns): "
    "the returnflag filter pushes into the lineitem scan and the "
    "order-date window into the orders scan BEFORE the fact-fact "
    "shuffle join; customer and nation broadcast; revenue is the "
    "exact-decimal discounted sum so the top-20 cut (revenue desc, "
    "custkey tie-break — a total order) is bit-deterministic. The "
    "LIMIT compiles to TakeOrdered, never a global sort.",
)
def q177_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    rev = dmoney("l_extendedprice") * (
        F.lit(1).cast("decimal(8,4)") - drate("l_discount")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("cust_name"),
            F.col("n_name").alias("nation"),
            F.col("c_acctbal").alias("acctbal"),
        )
        .agg(dsum_expr(rev, "revenue"))
        .orderBy(F.col("revenue").desc(), "custkey")
        .limit(20)
    )
