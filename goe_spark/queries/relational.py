"""Core relational battery: scans, joins, aggregations, windows, set ops.

The reference generates these shapes as SQL text around its offload
pipeline (SURVEY.md §2.3/§2.5-2.8); here they are declarative Spark
plans. Scale notes per query explain the physical strategy we expect
Catalyst/AQE to pick and why it survives 100 TB:

- dimension joins (region/nation/customer/supplier/part) are broadcast
  — explicitly hinted, so the lineitem/orders fact side never shuffles
  for them;
- fact-fact joins (orders⋈lineitem) are sort-merge on the join key,
  the unavoidable shuffle, and AQE handles skew;
- aggregates are partial (map-side combine) before the shuffle because
  we use built-in aggregate functions on ungrouped-or-grouped columns;
- all money arithmetic rounds at the end (round(x, 2)) so double
  summation order cannot flip the comparison hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.catalog import load_table
from goe_spark.functions.money import cents, cents_exact_sum, money_sum, money_sum_sql, money_sum_window
from goe_spark.queries import QuerySpec


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single fact scan, grouped aggregate.

    Scan-side: only 7 of 11 lineitem columns are read (column pruning
    reaches the parquet footer) and the shipdate filter is pushed down.
    Aggregation is hash-based with map-side partial aggregation; the
    shuffle carries at most |flag|x|status| rows per task.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # money_sum / exact-cents averages: order-free integer
            # sums (functions/money.py) — double sums drift across
            # the rounding grid at 10x SF (sf1 probe evidence)
            money_sum(F.col("l_quantity")).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sum_disc_price"),
            money_sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            # averages on the 1e6 grid: DECIMAL(38,0) sums (round-8
            # ADVICE — a long sum of 1e11-magnitude quantized prices
            # would wrap int64 after ~9e7 rows/group; decimal is
            # exact to ~1e27 rows at that magnitude), converted to
            # double ONCE before the divide so both engines round the
            # same value
            F.round(
                (cents_exact_sum(F.col("l_quantity"), 1_000_000)
                 .cast("double") / F.count(F.lit(1)) / 1e6), 4
            ).alias("avg_qty"),
            F.round(
                (cents_exact_sum(F.col("l_extendedprice"), 1_000_000)
                 .cast("double") / F.count(F.lit(1)) / 1e6), 4
            ).alias("avg_price"),
            F.round(
                (cents_exact_sum(F.col("l_discount"), 1_000_000)
                 .cast("double") / F.count(F.lit(1)) / 1e6), 6
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(cast(floor(l_quantity * 100 + 0.5) AS bigint)) / 100.0, 2)      AS sum_qty,
       round(sum(cast(floor(l_extendedprice * 100 + 0.5) AS bigint)) / 100.0, 2) AS sum_base_price,
       round(sum(cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS bigint)) / 100.0, 2) AS sum_disc_price,
       round(sum(cast(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) AS bigint)) / 100.0, 2) AS sum_charge,
       round(sum(cast(floor(l_quantity * 1000000 + 0.5) AS bigint)) / count(*) / 1000000.0, 4) AS avg_qty,
       round(sum(cast(floor(l_extendedprice * 1000000 + 0.5) AS bigint)) / count(*) / 1000000.0, 4) AS avg_price,
       round(sum(cast(floor(l_discount * 1000000 + 0.5) AS bigint)) / count(*) / 1000000.0, 6) AS avg_disc,
       count(*)                                                          AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact join -> top-k.

    customer (filtered to one segment) is broadcast into orders; the
    orders⋈lineitem join is the one shuffle. Top-k runs as
    TakeOrderedAndProject — no global sort materialization.
    Tie-break on o_orderkey keeps top-k deterministic across engines.
    """
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS bigint)) / 100.0, 2) AS revenue
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join through 4 dimensions.

    region→nation→customer and supplier are all broadcast; lineitem
    only shuffles once for the orders join. The n_name group-by output
    is 25 rows — negligible shuffle.
    """
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(dims),
            (orders.o_custkey == dims.c_custkey)
            & (supp.s_nationkey == dims.n_nationkey),
        )
        .groupBy("n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


Q5_SQL = """
SELECT n_name, round(sum(cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS bigint)) / 100.0, 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-lineitem revenue per customer, top 20."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS bigint)) / 100.0, 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions (SURVEY §2.6): row_number + sum-over-partition.

    Single shuffle on o_custkey serves both window functions (same
    partitioning spec); rank filter is applied post-window.
    """
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    wsum = Window.partitionBy("o_custkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice_r"),
            F.row_number().over(w).alias("rn"),
            money_sum_window(F.col("o_totalprice"), wsum).alias("cust_total"),
        )
        .where(F.col("rn") <= 2)
    )


WINDOW_SQL = """
SELECT * FROM (
  SELECT o_custkey, o_orderkey,
         round(o_totalprice, 2) AS o_totalprice_r,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
         round(sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint))
                 OVER (PARTITION BY o_custkey) / 100.0, 2) AS cust_total
  FROM orders
) WHERE rn <= 2
"""


def union_mod_split_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOD split-scan semantics (SURVEY §2.1 S4, §2.8 UNION ALL).

    The reference fans a table into N UNION ALL branches keyed by
    MOD(hash, N) for parallel transport. In Spark the same split is a
    derived batch column; we materialize the per-batch row counts the
    way GOE's Scala listener accounted rows per task. UNION ALL of the
    per-branch scans collapses to one scan + one aggregate here —
    Catalyst does what GOE hand-orchestrated.
    """
    orders = load_table(spark, sf_dir, "orders")
    branches = [
        orders.where(F.pmod(F.col("o_orderkey"), F.lit(4)) == F.lit(i))
        for i in range(4)
    ]
    unioned = branches[0]
    for b in branches[1:]:
        unioned = unioned.unionAll(b)
    return (
        unioned.groupBy(F.pmod(F.col("o_orderkey"), F.lit(4)).alias("batch"))
        .agg(
            F.count(F.lit(1)).alias("batch_rows"),
            money_sum(F.col("o_totalprice")).alias("batch_value"),
        )
    )


UNION_MOD_SQL = """
SELECT batch, count(*) AS batch_rows,
       round(sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint)) / 100.0, 2) AS batch_value
FROM (
  SELECT o_orderkey % 4 AS batch, o_totalprice FROM orders WHERE o_orderkey % 4 = 0
  UNION ALL
  SELECT o_orderkey % 4, o_totalprice FROM orders WHERE o_orderkey % 4 = 1
  UNION ALL
  SELECT o_orderkey % 4, o_totalprice FROM orders WHERE o_orderkey % 4 = 2
  UNION ALL
  SELECT o_orderkey % 4, o_totalprice FROM orders WHERE o_orderkey % 4 = 3
)
GROUP BY batch
"""


def semi_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti joins (SURVEY §2.3): customers with vs without orders.

    left_semi/left_anti avoid materializing the probe side; both reuse
    one shuffle of orders' o_custkey projection (a 1-column exchange).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    with_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("with_orders"))
    )
    without_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("without_orders"))
    )
    return (
        with_orders.join(without_orders, "c_mktsegment", "full_outer")
        .select(
            "c_mktsegment",
            F.coalesce("with_orders", F.lit(0)).alias("with_orders"),
            F.coalesce("without_orders", F.lit(0)).alias("without_orders"),
        )
    )


SEMI_ANTI_SQL = """
WITH w AS (
  SELECT c_mktsegment, count(*) AS with_orders
  FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
  GROUP BY c_mktsegment
), wo AS (
  SELECT c_mktsegment, count(*) AS without_orders
  FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
  GROUP BY c_mktsegment
)
SELECT coalesce(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
       coalesce(with_orders, 0)    AS with_orders,
       coalesce(without_orders, 0) AS without_orders
FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment
"""


QUERIES = [
    QuerySpec("q1_pricing_summary", q1_pricing_summary, Q1_SQL, "TPC-H Q1 shape"),
    QuerySpec("q3_shipping_priority", q3_shipping_priority, Q3_SQL, "TPC-H Q3 shape"),
    QuerySpec("q5_regional_revenue", q5_regional_revenue, Q5_SQL, "TPC-H Q5 shape"),
    QuerySpec("q10_returned_items", q10_returned_items, Q10_SQL, "TPC-H Q10 shape"),
    QuerySpec(
        "window_top_orders_per_customer",
        window_top_orders_per_customer,
        WINDOW_SQL,
        "window functions",
    ),
    QuerySpec(
        "union_mod_split_scan", union_mod_split_scan, UNION_MOD_SQL, "MOD split scan"
    ),
    QuerySpec(
        "semi_anti_join_customers",
        semi_anti_join_customers,
        SEMI_ANTI_SQL,
        "semi/anti joins",
    ),
]
