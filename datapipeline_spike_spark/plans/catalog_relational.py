"""Relational query surface (SURVEY.md §2.3 joins, §2.4 aggregations,
§2.5 window functions, §2.6 sorts/top-k, §2.7 set ops, §2.8 scalar
functions) over the driver's TPC-H-ish tables.

The reference itself has no relational joins (§2.3: its only multi-stream
combination is a schema union), but the engine ships the full surface the
harness exercises. Every query aliases columns identically to its oracle
and rounds float aggregates: 6 decimals for small-group statistics,
0-2 decimals for whole-table sums of large doubles (naive-summation
error across different reduction orders can reach ~1e-5 on 1e9-scale
sums — integer-ish rounding keeps both engines on the same hash).

Determinism rules: every window/top-k orders by a unique tiebreak key;
rank comparisons happen on ROUNDED values on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipeline_spike_spark.operators.joins import band_join
from datapipeline_spike_spark.plans.registry import load, register

R = 6


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 0)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 0)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 0)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shape pricing summary: the canonical partial+final hash "
    "aggregation (Catalyst splits map-side/final automatically).",
    tags=("aggregate",),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 0).alias("sum_base_price"),
        F.round(F.sum(disc_price), 0).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 0).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "revenue_by_segment",
    oracle="""
    SELECT c.c_mktsegment                                            AS segment,
           count(DISTINCT o.o_orderkey)                              AS n_orders,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 0)     AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
    doc="Three-way equi join (fact-to-fact sort-merge + dimension "
    "broadcast under AQE) with distinct aggregation.",
    tags=("join", "aggregate"),
)
def q_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        # no broadcast hint on customer: it scales with SF (sf100 ~ 15M
        # rows) — a forced hint bypasses Spark's size check and OOMs
        # executors at the 100x target. AQE still broadcasts it while
        # its runtime size is under the threshold and falls back to
        # shuffled join when it is not.
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0).alias(
                "revenue"
            ),
        )
    )


@register(
    "customers_per_region",
    oracle="""
    SELECT r.r_name AS region, count(*) AS n_customers,
           round(avg(c.c_acctbal), 6) AS avg_acctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY 1
    """,
    doc="Snowflake dimension chain with explicit broadcast of both dims "
    "(SURVEY §2.3 broadcast row): zero shuffle on the dims.",
    tags=("join", "broadcast"),
)
def q_customers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_acctbal"),
        )
    )


@register(
    "customers_with_orders",
    oracle="""
    SELECT c_mktsegment AS segment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
    doc="Left-semi join (EXISTS).",
    tags=("join", "semi"),
)
def q_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "customers_without_orders",
    oracle="""
    SELECT n.n_name AS nation, count(*) AS n_customers
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY 1
    """,
    doc="Left-anti join (NOT EXISTS with a pushed-down predicate on the "
    "right side) + broadcast dim: customers with no urgent orders.",
    tags=("join", "anti"),
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "order_size_histogram",
    oracle="""
    SELECT n_items, count(*) AS n_orders
    FROM (
      SELECT o.o_orderkey, count(l.l_orderkey) AS n_items
      FROM orders o
      LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey
    )
    GROUP BY n_items
    """,
    doc="Left-outer join preserving empty orders, two-level aggregation "
    "(TPC-H Q13 shape).",
    tags=("join", "outer", "aggregate"),
)
def q_order_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    per_order = (
        o.join(l, o.o_orderkey == l.l_orderkey, "left")
        .groupBy(o.o_orderkey)
        .agg(F.count(l.l_orderkey).alias("n_items"))
    )
    return per_order.groupBy("n_items").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "part_size_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('tiny', 0, 10), ('small', 11, 20), ('medium', 21, 30),
             ('large', 31, 40), ('huge', 41, 100)
    )
    SELECT b.band, count(*) AS n_parts, round(avg(p.p_retailprice), 6) AS avg_price
    FROM part p JOIN bands b ON p.p_size >= b.lo AND p.p_size <= b.hi
    GROUP BY 1
    """,
    doc="Range/band join via broadcast nested-loop (SURVEY §2.3 theta "
    "row); the band table is tiny by construction — the only join shape "
    "where BNLJ is the right plan.",
    tags=("join", "range"),
)
def q_part_size_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    bands = p.sparkSession.createDataFrame(
        [("tiny", 0, 10), ("small", 11, 20), ("medium", 21, 30), ("large", 31, 40), ("huge", 41, 100)],
        "band string, lo int, hi int",
    )
    joined = band_join(p, bands, "p_size").filter(F.col("band").isNotNull())
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
    )


@register(
    "top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    doc="Top-k per group: row_number window with a unique tiebreak "
    "(SURVEY §2.6). AQE prunes the shuffle to |groups| partitions.",
    tags=("window", "topk"),
)
def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "customer_order_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend,
           CAST(date_diff('day',
                lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
    """,
    doc="Running aggregate + lag over an ordered per-key frame (SURVEY "
    "§2.5): quality trending / per-machine history shape.",
    tags=("window",),
)
def q_customer_order_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(run), 4).alias("running_spend"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("bigint")
        .alias("days_since_prev"),
    )


@register(
    "lineitem_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="Hierarchical subtotals (SURVEY §2.4 grouping sets surface).",
    tags=("aggregate", "rollup"),
)
def q_lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@register(
    "orders_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, round(sum(o_totalprice), 0) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="Full cube over two dimensions.",
    tags=("aggregate", "cube"),
)
def q_orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 0).alias("total")
    )


@register(
    "top_lineitems_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
    doc="Global top-k: Spark plans TakeOrderedAndProject (no full sort "
    "— per-partition heaps + driver merge; the plan that survives 100 TB).",
    tags=("sort", "topk"),
)
def q_top_lineitems_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(10)
    )


@register(
    "segment_symmetric_difference",
    oracle="""
    SELECT c_custkey FROM (
      (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
       UNION SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      EXCEPT
      (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
       INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    )
    """,
    doc="Set operations (SURVEY §2.7): union/intersect/except composed "
    "into a symmetric difference.",
    tags=("setop",),
)
def q_segment_symmetric_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.union(b).distinct().exceptAll(a.intersect(b))


@register(
    "supplier_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_suppliers,
           count(DISTINCT l_partkey) AS n_parts,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY 1
    """,
    doc="Multi-distinct aggregation (expand + two-phase agg in Spark). "
    "approx_count_distinct ships too but is checked rows-only "
    "(HLL sketches differ across engines by design).",
    tags=("aggregate", "distinct"),
)
def q_supplier_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "quantity_quantiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 6) AS q25,
           round(quantile_cont(l_quantity, 0.50), 6) AS q50,
           round(quantile_cont(l_quantity, 0.75), 6) AS q75,
           round(quantile_cont(l_extendedprice, 0.9), 6) AS price_p90
    FROM lineitem
    GROUP BY 1
    """,
    doc="Exact interpolated percentiles: Spark percentile() matches "
    "DuckDB quantile_cont (both linear interpolation). "
    "percentile_approx is the 100 TB path; checked rows-only.",
    tags=("aggregate", "percentile"),
)
def q_quantity_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("q25"),
        F.round(F.expr("percentile(l_quantity, 0.50)"), 6).alias("q50"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 6).alias("q75"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("price_p90"),
    )


@register(
    "order_scalar_lab",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderpriority)                              AS pri_upper,
           substr(o_orderpriority, 1, 1)                       AS pri_code,
           concat(o_orderstatus, '-', o_orderpriority)         AS status_tag,
           length(o_orderpriority)                             AS pri_len,
           CAST(year(o_orderdate) AS INT)                      AS order_year,
           CAST(month(o_orderdate) AS INT)                     AS order_month,
           o_orderdate + INTERVAL 30 DAY                       AS due_date,
           round(abs(o_totalprice - 100000.0), 2)              AS price_dev,
           round(sqrt(o_totalprice), 6)                        AS price_sqrt,
           round(ln(o_totalprice), 6)                          AS price_ln,
           CAST(floor(o_totalprice / 10000) AS BIGINT)         AS price_bucket
    FROM orders WHERE o_orderkey < 500
    """,
    doc="Scalar function surface (SURVEY §2.8): string/date/math on a "
    "bounded deterministic subset; all whole-stage-codegen built-ins.",
    tags=("scalar",),
)
def q_order_scalar_lab(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("pri_upper"),
        F.substring("o_orderpriority", 1, 1).alias("pri_code"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_tag"),
        F.length("o_orderpriority").alias("pri_len"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.round(F.abs(F.col("o_totalprice") - 100000.0), 2).alias("price_dev"),
        F.round(F.sqrt("o_totalprice"), 6).alias("price_sqrt"),
        F.round(F.log("o_totalprice"), 6).alias("price_ln"),
        F.floor(F.col("o_totalprice") / 10000).cast("bigint").alias("price_bucket"),
    )


_GROUPING_SETS_SQL = """
SELECT o_orderpriority,
       o_orderstatus,
       count(*)                          AS n,
       round(sum(o_totalprice), 2)       AS total_price,
       CAST(grouping(o_orderpriority) AS INT) AS g_pri,
       CAST(grouping(o_orderstatus) AS INT)   AS g_status
FROM {table}
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), (o_orderpriority, o_orderstatus), ())
"""


@register(
    "orders_grouping_sets",
    oracle=_GROUPING_SETS_SQL.format(table="orders"),
    doc="""Explicit GROUPING SETS (SURVEY §2.4 general aggregation
    surface, completing rollup/cube) exercised through the spark.sql
    entry point — the engine's SQL API is first-class, not just the
    DataFrame DSL. grouping() markers disambiguate NULL group values
    from NULL data. One shuffle; Catalyst expands the sets into a
    single Expand+Aggregate.""",
    tags=("aggregate", "sql-api", "grouping-sets"),
)
def q_orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs_v")
    return spark.sql(_GROUPING_SETS_SQL.format(table="orders_gs_v"))


@register(
    "shipping_priority",
    oracle="""
    SELECT l.l_orderkey                                            AS orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)   AS revenue,
           o.o_orderdate                                           AS orderdate,
           o.o_orderpriority                                       AS orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
    doc="""TPC-H Q3 shape (shipping priority): selective filters on all
    three tables pushed to the parquet scans, customer joined with no
    forced hint (AQE broadcasts the filtered segment while small),
    revenue aggregation, global top-10 (TakeOrderedAndProject — no full
    sort). Deterministic tie-break on orderkey. The canonical
    'filter-join-agg-topk' plan the optimizer must get right at scale.""",
    tags=("join", "aggregate", "topk", "tpch"),
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = "1995-03-15"
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        # customer is SF-scaling: no forced broadcast (see
        # revenue_by_segment) — the segment filter keeps it small enough
        # for AQE to broadcast at runtime when that is actually safe
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("orderkey", "revenue", "orderdate", "orderpriority")
        .orderBy(F.col("revenue").desc(), "orderkey")
        .limit(10)
    )


_LATE_SHIPMENT_SQL = """
    SELECT o.o_orderpriority AS orderpriority,
           count(*)          AS order_count
    FROM {orders} o
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1995-07-01'
      AND EXISTS (
            SELECT 1 FROM {lineitem} l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
    GROUP BY 1
"""


@register(
    "late_shipment_priority",
    oracle=_LATE_SHIPMENT_SQL.format(orders="orders", lineitem="lineitem"),
    doc="""TPC-H Q4 shape (order priority checking) through the SQL
    entry point: a correlated EXISTS subquery with a non-equi
    correlated predicate (shipment later than orderdate + 60 days).
    Catalyst must DECORRELATE this into a left-semi join — never a
    per-row subquery execution — with the date filter pushed to the
    orders scan; tests/test_plans.py asserts the semi-join shape. The
    driver's lineitem lacks commit/receipt dates, so lateness is
    defined against o_orderdate (documented deviation, same plan
    shape).""",
    tags=("join", "subquery", "sql-api", "tpch"),
)
def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_q4_v")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q4_v")
    return spark.sql(
        _LATE_SHIPMENT_SQL.format(orders="orders_q4_v", lineitem="lineitem_q4_v")
    )


_SMALL_QTY_SQL = """
    SELECT count(*)                               AS n_small,
           round(sum(l.l_extendedprice) / 7.0, 0) AS avg_yearly
    FROM {lineitem} l
    WHERE l.l_quantity < 0.5 * (
            SELECT avg(l2.l_quantity) FROM {lineitem} l2
            WHERE l2.l_partkey = l.l_partkey
          )
"""


@register(
    "small_quantity_revenue",
    oracle=_SMALL_QTY_SQL.format(lineitem="lineitem"),
    doc="""TPC-H Q17 shape (small-quantity-order revenue): a correlated
    SCALAR subquery — each lineitem compares its quantity against the
    per-part average. Catalyst decorrelates to one per-part aggregate
    joined back to the fact table (two scans + one shuffle each), not a
    per-row lookup. Hash-safe across engines because quantities are
    integer-valued doubles: their sums are exact in fp regardless of
    reduction order, so 0.5*avg is bit-identical on both sides; the
    price sum rounds to integer dollars.""",
    tags=("join", "subquery", "aggregate", "sql-api", "tpch"),
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q17_v")
    return spark.sql(_SMALL_QTY_SQL.format(lineitem="lineitem_q17_v"))


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "table_profile",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS col_name,
           count(*) AS n_rows,
           CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           round(min({c}), 6) AS min_val,
           round(max({c}), 6) AS max_val,
           round(avg({c}), 6) AS avg_val
    FROM lineitem"""
        for c in _PROFILE_COLS
    ),
    doc="""Per-column table profiling (the data-quality monitoring op a
    pipeline runs before/after every load): null counts, exact distinct
    cardinality, min/max/mean for each measure column of lineitem — ONE
    scan producing one 1-row aggregate, unpivoted to a row per column
    with stack(). Multiple count-distincts plan as a single expand +
    aggregate (no per-column re-scans; the oracle's UNION ALL form
    scans 4x, the engine does not). At 100 TB this is the shape that
    matters: profile cost == one pass over the table.""",
    tags=("aggregate", "profiling"),
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"),
            F.countDistinct(c).alias(f"{c}_distinct"),
            F.round(F.min(c), 6).alias(f"{c}_min"),
            F.round(F.max(c), 6).alias(f"{c}_max"),
            F.round(F.avg(c), 6).alias(f"{c}_avg"),
        ]
    row = li.agg(*aggs)
    stack = (
        f"stack({len(_PROFILE_COLS)}, "
        + ", ".join(
            f"'{c}', {c}_nulls, {c}_distinct, {c}_min, {c}_max, {c}_avg"
            for c in _PROFILE_COLS
        )
        + ") as (col_name, n_nulls, n_distinct, min_val, max_val, avg_val)"
    )
    return row.select(F.expr(stack), "n_rows").select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val", "avg_val"
    )


@register(
    "customer_value_ranks",
    oracle="""
    WITH spend AS (
      SELECT c.c_mktsegment, c.c_custkey,
             round(sum(o.o_totalprice), 2) AS total_spend
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT c_mktsegment, c_custkey, total_spend,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6)    AS cume,
           CAST(ntile(10) OVER w AS INT)   AS decile,
           first_value(c_custkey) OVER (
             PARTITION BY c_mktsegment
             ORDER BY total_spend DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS segment_top_custkey
    FROM spend
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY total_spend, c_custkey)
    """,
    doc="""Analytic-function coverage rounding out SURVEY §2.5:
    percent_rank / cume_dist / ntile / first_value in one pass — per
    market segment, each customer's spend percentile, cumulative
    distribution, decile, and the segment's top customer. Deterministic
    tie-breaks (spend, custkey) on every window so both engines rank
    identically; the aggregate and all four analytics share ONE
    partition key, so the whole query is one join + one shuffle + one
    sort per partition. Scale note: exact per-segment percent_rank is
    an inherent per-group global sort (|segments| reducers carry every
    customer); the 100 TB path is approximate quantile BANDING —
    operators/ranks.py::approx_percentile_bands (mergeable GK sketch +
    broadcast threshold join, map-only banding, tested against exact
    ntile) — kept as a separate operator so this query stays the exact
    small-data twin.""",
    tags=("window", "analytic"),
)
def q_customer_value_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    spend = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("total_spend", "c_custkey")
    w_top = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("total_spend").desc(), "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return spend.select(
        "c_mktsegment",
        "c_custkey",
        "total_spend",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(10).over(w).cast("int").alias("decile"),
        F.first("c_custkey").over(w_top).alias("segment_top_custkey"),
    )


@register(
    "approx_percentile_bands",
    oracle=f"""
    WITH thr AS (
      SELECT c_mktsegment,
             quantile_disc(c_acctbal,
               [{", ".join(f"{i}/10.0" for i in range(1, 10))}]) AS t
      FROM customer GROUP BY 1
    )
    SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal,
           CAST(1 + len(list_filter(thr.t, x -> x <= c.c_acctbal)) AS INT)
             AS band
    FROM customer c JOIN thr USING (c_mktsegment)
    """,
    doc="""operators/ranks.approx_percentile_bands registered (the
    100 TB scale path for customer_value_ranks' exact per-segment
    percent_rank, previously test-only — VERDICT r8 item 4): decile
    banding of customer account balance per market segment via a
    mergeable Greenwald-Khanna approx_percentile sketch + broadcast
    threshold join + map-only band count. No per-group global sort
    anywhere — the sketch partial-aggregates map-side like any sum and
    the data itself never shuffles beyond it. Oracle parity: exact
    only while every segment stays under the sketch accuracy, where
    Spark's percentile_approx exact path and DuckDB's quantile_disc
    select the identical order statistic (the perplexity_bucket_profile
    precedent); ties at a threshold fall to the higher band on both
    sides (x <= v). Accuracy is pinned at 100_000 (ADVICE r9 item 5):
    per-segment cardinality is ~150k*SF/5 = 30k*SF rows, so the exact
    path — and therefore the driver hash — holds up to sf~3.3, 33x the
    largest scale the driver ever runs (bench sf0.1); beyond that the
    GK sketch goes approximate BY DESIGN (that is the 100 TB posture)
    and only the DuckDB comparison, not the operator, would need the
    exact twin dropped.""",
    tags=("window", "analytic", "scale-path"),
)
def q_approx_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datapipeline_spike_spark.operators.ranks import (
        approx_percentile_bands,
    )

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    return approx_percentile_bands(
        c, ["c_mktsegment"], "c_acctbal", n_bands=10, accuracy=100_000
    )


@register(
    "lineitem_scalar_lab",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(datediff('day', DATE '1992-01-01', l_shipdate) AS INT) AS ship_day_no,
           last_day(CAST(l_shipdate AS DATE))                   AS ship_month_end,
           CAST(date_trunc('week', l_shipdate) AS TIMESTAMP)    AS ship_week,
           CAST(weekofyear(l_shipdate) AS INT)                  AS ship_iso_week,
           lpad(CAST(l_linenumber AS VARCHAR), 3, '0')          AS line_code,
           translate(l_returnflag, 'ARN', 'arn')                AS flag_lower,
           repeat(l_linestatus, 2)                              AS status_twice,
           reverse(concat(l_returnflag, l_linestatus))          AS tag_rev,
           regexp_extract(concat('L-', CAST(l_linenumber AS VARCHAR)),
                          '([0-9]+)', 1)                        AS line_digits,
           nullif(l_returnflag, 'N')                            AS flag_or_null,
           greatest(l_quantity, l_discount * 100)               AS qty_vs_disc,
           round(pow(l_quantity, 2), 2)                         AS qty_sq,
           round(exp(l_discount), 6)                            AS disc_exp,
           round(atan2(l_quantity, l_extendedprice), 6)         AS price_angle
    FROM lineitem WHERE l_orderkey < 300
    """,
    doc="""Scalar surface, part 2 (SURVEY §2.8 families order_scalar_lab
    leaves out): day-difference / month-end / week-truncation / ISO week
    on dates; lpad, translate, repeat, reverse, regexp_extract on
    strings; nullif / greatest conditionals; pow, exp, atan2 math. All
    whole-stage-codegen built-ins on a bounded deterministic subset;
    every expression chosen to have IDENTICAL semantics in DuckDB
    (e.g. weekofyear is ISO in both; dayofweek is deliberately absent —
    Spark counts from Sunday=1, DuckDB from Sunday=0).""",
    tags=("scalar",),
)
def q_lineitem_scalar_lab(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.col("l_shipdate"), F.lit("1992-01-01").cast("date"))
        .cast("int")
        .alias("ship_day_no"),
        F.last_day("l_shipdate").alias("ship_month_end"),
        F.date_trunc("week", "l_shipdate").alias("ship_week"),
        F.weekofyear("l_shipdate").cast("int").alias("ship_iso_week"),
        F.lpad(F.col("l_linenumber").cast("string"), 3, "0").alias("line_code"),
        F.translate("l_returnflag", "ARN", "arn").alias("flag_lower"),
        F.repeat("l_linestatus", 2).alias("status_twice"),
        F.reverse(F.concat("l_returnflag", "l_linestatus")).alias("tag_rev"),
        F.regexp_extract(
            F.concat(F.lit("L-"), F.col("l_linenumber").cast("string")),
            r"([0-9]+)",
            1,
        ).alias("line_digits"),
        F.nullif("l_returnflag", F.lit("N")).alias("flag_or_null"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("qty_vs_disc"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.atan2("l_quantity", "l_extendedprice"), 6).alias("price_angle"),
    )


@register(
    "referential_integrity_audit",
    oracle="""
    SELECT 'orders->customer' AS relation,
           (SELECT count(*) FROM orders) AS n_rows,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS n_orphans
    UNION ALL
    SELECT 'lineitem->orders',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'customer->nation',
           (SELECT count(*) FROM customer),
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'supplier->nation',
           (SELECT count(*) FROM supplier),
           (SELECT count(*) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = s.s_nationkey))
    ORDER BY relation
    """,
    doc="""Referential-integrity audit across the star schema (the
    relational-level data-quality check next to the record-level P/A
    family): orphan counts for every FK relation via LEFT ANTI joins —
    one linear scan of the child side per relation. Only the
    fixed-25-row nation key set carries a broadcast hint; SF-scaling
    parents (customer, orders) join hint-free and AQE upgrades to
    broadcast at runtime when the key set actually fits. The report
    every warehouse load gate runs before publishing a snapshot.""",
    tags=("quality", "join", "relational"),
)
def q_referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def audit(
        child: DataFrame, parent: DataFrame, ck: str, pk: str, name: str,
        broadcast_parent: bool = False,
    ) -> DataFrame:
        # only FIXED-cardinality parents (nation, 25 rows) broadcast; an
        # SF-scaling parent key set (customer 150k x SF, orders 1.5M x SF)
        # must NOT — the anti join shuffles on the key and AQE upgrades
        # to broadcast at runtime when the built side actually fits
        # (forcing it would ship an unbounded key set to every executor
        # at 100x scale)
        pkeys = parent.select(pk)
        if broadcast_parent:
            pkeys = F.broadcast(pkeys)
        orphans = child.join(pkeys, child[ck] == F.col(pk), "left_anti")
        return (
            child.agg(F.count(F.lit(1)).alias("n_rows"))
            .crossJoin(orphans.agg(F.count(F.lit(1)).alias("n_orphans")))
            .select(F.lit(name).alias("relation"), "n_rows", "n_orphans")
        )

    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    out = (
        audit(o, c, "o_custkey", "c_custkey", "orders->customer")
        .unionByName(
            audit(li, o, "l_orderkey", "o_orderkey", "lineitem->orders")
        )
        .unionByName(audit(c, n, "c_nationkey", "n_nationkey", "customer->nation",
                           broadcast_parent=True))
        .unionByName(audit(s, n, "s_nationkey", "n_nationkey", "supplier->nation",
                           broadcast_parent=True))
    )
    return out.orderBy("relation")


@register(
    "props_variant_stats",
    oracle="""
    SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS BIGINT)
             AS k_band,
           count(*) AS n,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6)
             AS avg_k
    FROM events
    WHERE props IS NOT NULL
    GROUP BY 1
    """,
    doc="""Semi-structured S9 via Spark 4's VARIANT type (the current
    engine path for JSON columns, SPARK-45891): parse_json once into a
    binary variant, then typed try_variant_get path extraction feeds the
    aggregation — at scale this beats per-expression get_json_object
    re-parsing (one parse per row, shredded binary access per path; the
    classic from_json/get_json_object form remains as
    json_props_profile). Values are engine-verified: the oracle replays
    the same per-band stats through DuckDB's JSON extraction, so the
    variant path's NUMBERS are checked, not just its plan shape.""",
    tags=("scalar", "json", "variant"),
)
def q_props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    base = ev.select(k.alias("k"))
    return (
        base.groupBy(F.floor(F.col("k") / 10).cast("bigint").alias("k_band"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )


@register(
    "monthly_revenue_growth",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           round(lag(revenue) OVER (ORDER BY month), 2) AS prev_revenue,
           round(CASE WHEN lag(revenue) OVER (ORDER BY month) > 0
                 THEN (revenue - lag(revenue) OVER (ORDER BY month))
                      / lag(revenue) OVER (ORDER BY month) END, 6) AS mom_growth
    FROM m
    """,
    doc="""Window-over-aggregate (the BI month-over-month pattern):
    monthly revenue totals, previous month via lag, growth ratio —
    note the window runs on the AGGREGATED frame (|months| rows), so
    the single-partition ORDER BY is a dozen rows, never the fact
    table; the heavy lifting is the one month-grain aggregation with
    map-side partials. Growth computed from the 2dp-rounded totals so
    both engines divide identical numbers.""",
    tags=("window", "aggregate", "bi"),
)
def q_monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    # bounded unpartitioned window: input is the month-grain AGGREGATE
    # (|months| rows, not the orders corpus) — plan_audit WINDOW_OK entry
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        F.round(prev, 2).alias("prev_revenue"),
        F.round(
            F.when(prev > 0, (F.col("revenue") - prev) / prev), 6
        ).alias("mom_growth"),
    )


@register(
    "value_histogram",
    oracle="""
    SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin,
           CAST(floor(value / 25.0) * 25.0 AS DOUBLE) AS bin_lo,
           count(*) AS n,
           round(avg(value), 6) AS bin_mean
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="""Equi-width histogram by explicit floor-division binning (the
    distribution view quantiles can't give: bin POPULATIONS, not cut
    points): one map-side-combined aggregation keyed by bin id —
    |bins| output rows regardless of corpus size, the cheapest possible
    full-distribution summary at 100 TB. Bin width 25 over the events
    value range; floor(v/w) is bit-identical across engines (IEEE
    division + floor), unlike any rounding-based binning.""",
    tags=("aggregate", "histogram"),
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    b = F.floor(F.col("value") / 25.0)
    return ev.groupBy(
        b.cast("bigint").alias("bin"),
        (b * 25.0).cast("double").alias("bin_lo"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("bin_mean"),
    )


@register(
    "local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 0) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey  = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
      AND o.o_orderdate >= DATE '1994-01-01'
      AND o.o_orderdate <  DATE '1996-01-01'
    GROUP BY 1
    """,
    doc="""TPC-H Q5 shape (local supplier volume): the 6-way star join
    — customer x orders x lineitem x supplier x nation x region — where
    the supplier must sit in the CUSTOMER's nation (the join condition
    that makes Q5 interesting: an equi condition on two different
    dimension paths into the fact). Plan shape: the two facts sort-merge
    on orderkey under AQE; nation/region broadcast (fixed 25/5 rows);
    customer and supplier join hint-free — both scale with SF, so AQE
    picks broadcast only when the runtime size allows it. The
    region/date filters push into the scans before any join. Revenue
    rounded at the dollar so cross-engine float association order
    cannot flip a hash.""",
    tags=("join", "tpch", "star"),
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-01-01"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        # customer AND supplier are SF-scaling (150k x SF / 10k x SF
        # rows): no forced broadcast on either — AQE decides from
        # runtime sizes; hints stay on the fixed-cardinality dims only
        # (nation 25, region 5)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0
            ).alias("revenue"),
        )
    )


@register(
    "returned_item_losses",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name, n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 0) AS lost_revenue,
           CAST(count(*) AS BIGINT) AS n_returned
    FROM customer c
    JOIN orders o   ON o.o_custkey  = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY lost_revenue DESC, custkey
    LIMIT 20
    """,
    doc="""TPC-H Q10 shape (returned-item reporting): revenue lost to
    returns per customer, global top-20. The returnflag filter pushes
    into the lineitem scan; facts sort-merge on orderkey; customer joins
    hint-free (SF-scaling — AQE decides) while the fixed 25-row nation
    broadcasts; the top-20 is TakeOrderedAndProject (per-partition
    partial top-k + driver merge — never a full sort or an
    unpartitioned rank window). Dollar-rounded revenue for
    hash-stability, custkey tiebreak for a total order.""",
    tags=("join", "tpch", "topk"),
)
def q_returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        # customer is SF-scaling: no forced broadcast (see
        # revenue_by_segment); nation keeps its hint (25 rows, fixed)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0
            ).alias("lost_revenue"),
            F.count(F.lit(1)).alias("n_returned"),
        )
        .orderBy(F.col("lost_revenue").desc(), "custkey")
        .limit(20)
    )


@register(
    "priority_shipping_lag",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           CAST(sum(CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) > 90
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(sum(CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) <= 30
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_fast,
           CAST(max(datediff('day', o.o_orderdate, l.l_shipdate)) AS BIGINT) AS max_lag_days
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
    doc="""TPC-H Q12 shape adapted to this schema (no shipmode column):
    per order priority, how many lineitems shipped late (> 90 days
    after the order date), fast (<= 30 days), and the worst lag — the
    CASE-bucketed conditional aggregation Q12 exercises, on pure
    integer date arithmetic (datediff both engines, no float anywhere).
    One fact-fact sort-merge on orderkey, map-side-combined counts,
    |priorities| output rows.""",
    tags=("join", "tpch", "aggregate"),
)
def q_priority_shipping_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum((lag > 90).cast("int")).cast("bigint").alias("n_late"),
            F.sum((lag <= 30).cast("int")).cast("bigint").alias("n_fast"),
            F.max(lag).cast("bigint").alias("max_lag_days"),
        )
    )


@register(
    "promo_revenue_share",
    oracle="""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
           round(sum(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
             AS promo_revenue,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue,
           round(100.0 * round(sum(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
                 / round(sum(l_extendedprice * (1 - l_discount)), 2), 6)
             AS promo_ratio
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
    doc="""TPC-H Q14 shape (promo revenue share): lineitem x part with a
    conditional aggregate — the share of monthly revenue from PROMO-type
    parts. part scales with SF exactly like customer, so the join takes
    NO broadcast hint (AQE decides; at sf100 both sides shuffle on
    partkey). The ratio derives from the two already-2dp-ROUNDED sums
    (never the raw float sums) so cross-engine association order cannot
    flip the 6dp hash.""",
    tags=("join", "tpch", "aggregate"),
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_trunc("month", "l_shipdate").alias("month"))
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)), 2
            ).alias("promo_revenue"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
        )
    )
    return agg.select(
        "month",
        "promo_revenue",
        "total_revenue",
        F.round(
            F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), R
        ).alias("promo_ratio"),
    )


_Q18_MIN_QTY = 250.0


@register(
    "large_volume_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > {_Q18_MIN_QTY}
    )
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           o.o_orderkey AS orderkey,
           o.o_orderdate AS orderdate,
           round(o.o_totalprice, 2) AS totalprice,
           big.sum_qty AS sum_qty
    FROM big
    JOIN orders o   ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    ORDER BY totalprice DESC, orderkey
    LIMIT 100
    """,
    doc=f"""TPC-H Q18 shape (large-volume customers): orders whose total
    lineitem quantity exceeds {_Q18_MIN_QTY}. The HAVING subquery is a
    pre-aggregation of lineitem on its OWN join key — the aggregate
    (tiny output: qualifying orders only) then drives the joins, so the
    expensive fact-fact work happens once, map-side combined, before
    any row touches orders/customer. customer joins hint-free (the
    SF-scaling rule); global top-100 is TakeOrderedAndProject. The
    canonical 'aggregate-then-join' plan a naive engine gets backwards
    (joining first and aggregating the blown-up result).""",
    tags=("join", "tpch", "aggregate", "topk"),
)
def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > _Q18_MIN_QTY)
    )
    return (
        big.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("totalprice").desc(), "orderkey")
        .limit(100)
    )


@register(
    "branded_quantity_bands",
    oracle="""
    SELECT p_brand AS brand,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 20 AND 50)
    GROUP BY 1
    """,
    doc="""TPC-H Q19 shape (disjunctive predicate join): three OR-ed
    brand/size/quantity conjunctions across the join. The optimizer
    test here is predicate DECOMPOSITION: the brand/size conjuncts
    involve only part and the quantity conjuncts only lineitem, so
    Catalyst derives the per-table OR-of-conjuncts
    (brand IN (1,2,3) side conditions) and pushes them into BOTH
    parquet scans before the join — the join then sees only candidate
    rows and the residual mixed-table disjunction filters after. part
    joins hint-free (SF-scaling, same rule as customer).""",
    tags=("join", "tpch", "filter"),
)
def q_branded_quantity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


# --- round 10: the six TPC-H shapes promised (and not delivered) by the
# r9 rotation head (VERDICT r9 item 2). The driver's tables are reduced
# TPC-H (no l_receiptdate/l_commitdate, no c_phone, no o_comment), so
# Q13/Q21/Q22 keep the canonical PLAN SHAPE with adapted predicates on
# the available columns; Q6/Q7/Q8 are the canonical queries.


@register(
    "forecast_revenue_change",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue_delta
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount > 0.045 AND l_discount < 0.075
      AND l_quantity < 24
    """,
    doc="""TPC-H Q6 shape: selective scan-only aggregate. Every
    predicate is parquet-pushable (shipdate range + discount band +
    quantity), so the scan itself is the whole query — no shuffle at
    all beyond the 1-row final aggregate. Discount band uses mid-gap
    thresholds (0.045/0.075 between the 0.01-step stored values) so
    the double-vs-decimal literal comparison can never straddle a
    representation boundary between engines.""",
    tags=("aggregate", "pushdown"),
)
def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") > 0.045)
        & (F.col("l_discount") < 0.075)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue_delta"
        )
    )


@register(
    "volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INT) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
          OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <= TIMESTAMP '1997-12-31 00:00:00'
    )
    GROUP BY 1, 2, 3
    """,
    doc="""TPC-H Q7 (volume shipping): revenue flow between two nations
    by supplier-nation x customer-nation x ship-year. Scale plan: the
    fixed 25-row nation dim is restricted to the two nations FIRST and
    explicitly broadcast into supplier and customer, shrinking both
    sides to 2/25 of their rows before any shuffle; the lineitem
    date-range predicate is parquet-pushed. No broadcast hint on
    supplier/customer themselves (they scale with SF) — AQE decides.
    The disjunctive nation-pair cross-filter runs after both nation
    names are attached, on the already-reduced stream.""",
    tags=("join", "aggregate"),
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    two = ("NATION_12", "NATION_10")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name").isin(*two))
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey")
    )
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") <= "1997-12-31")
    )
    o = load(spark, sf_dir, "orders")
    return (
        l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (
                (F.col("supp_nation") == two[0]) & (F.col("cust_nation") == two[1])
            )
            | ((F.col("supp_nation") == two[1]) & (F.col("cust_nation") == two[0]))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA'
        AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <= TIMESTAMP '1997-12-31 00:00:00'
    )
    GROUP BY o_year
    """,
    doc="""TPC-H Q8 (national market share): NATION_3's share of ASIA
    ECONOMY-part revenue by order-year. The deepest join tree in the
    registry (8 relations). Scale plan: region x nation pre-joined and
    filtered driver-free (both fixed-cardinality, 5 x 25 rows) and
    broadcast into customer; the supplier-side nation name is a second
    broadcast of the same 25-row dim; part is filtered to one of six
    types before its join (AQE broadcasts it while small — no forced
    hint, part scales with SF); the orderdate range is parquet-pushed
    into the orders scan. The share ratio rounds at 6dp on both
    engines (numerator/denominator are same-magnitude sums — relative
    reduction-order error ~1e-12).""",
    tags=("join", "aggregate"),
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nat = load(spark, sf_dir, "nation")
    n1 = nat.join(
        F.broadcast(r), nat.n_regionkey == r.r_regionkey
    ).select(F.col("n_nationkey").alias("c_nkey"))
    n2 = nat.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation")
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") <= "1997-12-31")
    )
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"), "left_semi"
    )
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey")
    )
    l = load(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    doc="""TPC-H Q13 (customer distribution): histogram of per-customer
    order counts INCLUDING zero-order customers, with the Q13 signature
    predicate inside the LEFT JOIN's ON clause (customers keep their
    row when every order is filtered away — a WHERE would drop them).
    Spark expresses the ON-clause filter by pre-filtering the orders
    side before the left join (identical semantics, and the predicate
    is parquet-pushed). Differs from order_size_histogram (orders x
    lineitem grain, unfiltered): this is the customer-grain canonical
    Q13 with the join-condition filter surface.""",
    tags=("join", "outer", "aggregate"),
)
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "waiting_suppliers",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND n.n_name = 'NATION_13'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    """,
    doc="""TPC-H Q21 shape (waiting suppliers): suppliers from one
    nation who were the SOLE at-fault supplier on a multi-supplier
    finished order. The driver's lineitem has no receipt/commit dates,
    so "at fault" adapts to l_returnflag = 'R' (returned) — the plan
    shape is exactly Q21's: fact self-correlation twice, once EXISTS
    (another supplier on the order: left-semi join on orderkey with a
    suppkey-inequality residual) and once NOT EXISTS (another supplier
    ALSO at fault: left-anti, same condition plus the fault flag).
    Both self-joins are equi on l_orderkey (sort-merge/shuffled-hash
    with the inequality as residual condition — never a nested loop),
    and the right sides project only (orderkey, suppkey). Nation dim
    broadcast; no hint on supplier (scales with SF).""",
    tags=("join", "semi", "anti", "correlated"),
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1 = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_13")
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    l = load(spark, sf_dir, "lineitem")
    lr = l.filter(F.col("l_returnflag") == "R")
    of = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l2 = l.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2"))
    l3 = lr.select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("sk3"))
    return (
        lr.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(of, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(
            l2,
            (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "global_sales_opportunity",
    oracle="""
    SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM (
      SELECT substr(c.c_name, 18, 1) AS cntrycode, c.c_acctbal
      FROM customer c
      WHERE substr(c.c_name, 18, 1) IN ('1', '3', '5', '7', '9')
        AND c.c_acctbal > (
          SELECT avg(c2.c_acctbal) FROM customer c2
          WHERE c2.c_acctbal > 0.0
            AND substr(c2.c_name, 18, 1) IN ('1', '3', '5', '7', '9')
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        )
    )
    GROUP BY cntrycode
    """,
    doc="""TPC-H Q22 shape (global sales opportunity): above-average-
    balance customers in selected country codes with no RECENT order,
    grouped by code. The driver's customer has no c_phone, so the
    country code adapts to the last digit of c_name (substr 18,1 —
    c_name is 'Customer#' + 9 digits, verified length 18), and "never
    ordered" adapts to "no order since 2000-01-01" (every customer has
    *some* order at driver scale: ~10 orders/customer). Shape is
    exactly Q22's: substring-IN filter, scalar AVG subquery kept
    IN-PLAN as a broadcast 1-row cross join (no plan-build collect),
    and a NOT EXISTS anti join against the date-filtered orders
    (predicate parquet-pushed). The float boundary c_acctbal > avg is
    engine-safe: balances are 2dp values, both engines average the
    same doubles, and reduction-order error (~1e-12) cannot straddle a
    2dp value.""",
    tags=("join", "anti", "scalar-subquery"),
)
def q_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = ("1", "3", "5", "7", "9")
    c = (
        load(spark, sf_dir, "customer")
        .withColumn("cntrycode", F.substring("c_name", 18, 1))
        .filter(F.col("cntrycode").isin(*codes))
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))  # 1 row (allowlisted totals pattern)
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "product_type_profit",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.6 * p.p_retailprice * l.l_quantity AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%red%'
    )
    GROUP BY 1, 2
    """,
    doc="""TPC-H Q9 (product type profit): profit on 'red' parts by
    supplier nation and order year. The driver's schema has no
    partsupp, so supply cost adapts to 0.6 x retail price (same
    expression surface: arithmetic over three joined relations inside
    the aggregate). Scale plan: the p_name LIKE predicate prunes part
    before its join (parquet scans can't push LIKE '%..%' but the
    filter still runs scan-side, ahead of the join); nation broadcast;
    no hints on part/supplier (SF-scaling, AQE decides); the profit
    expression is computed pre-aggregation so the shuffle carries one
    double per row.""",
    tags=("join", "aggregate"),
)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
    )


@register(
    "top_supplier_revenue",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc="""TPC-H Q15 (top supplier): quarterly revenue per supplier,
    returning the supplier(s) achieving the MAXIMUM — the canonical
    aggregate-of-aggregate scalar subquery (Q15's CREATE VIEW +
    max-over-view, expressed inline). Spark keeps the max IN-PLAN: the
    revenue frame aggregates once, its 1-row max crosses back in as a
    broadcast (no plan-build collect), and the equality filter runs on
    the 2dp-ROUNDED revenue on both engines so the float max/compare
    is hash-stable. Scale: the revenue aggregate is one shuffle at
    supplier grain (|suppliers| rows), everything after is bounded.""",
    tags=("aggregate", "scalar-subquery"),
)
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(max_rev))  # 1 row (allowlisted totals pattern)
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "supplier_part_types",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#3'
      AND p.p_type <> 'ECONOMY'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
    doc="""TPC-H Q16 (parts/supplier relationship): how many distinct
    suppliers ship each (brand, type, size) combination, excluding one
    brand, one type family, off-list sizes, and suppliers on an
    exclusion list (NOT IN subquery — negative account balance stands
    in for Q16's complaints LIKE, and lineitem stands in for the
    absent partsupp as the part-supplier relation). Plan: the three
    part predicates filter scan-side ahead of the join (size IN list
    is parquet-pushable); the exclusion list is a left-anti join
    against the filtered supplier projection (no hint — supplier
    scales with SF; the filtered side is tiny and AQE broadcasts it);
    distinct supplier count shuffles once on the group key.""",
    tags=("join", "anti", "aggregate"),
)
def q_supplier_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "ECONOMY")
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    excluded = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    l = load(spark, sf_dir, "lineitem").join(
        excluded, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )
