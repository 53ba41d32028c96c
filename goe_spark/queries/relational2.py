"""Extended relational battery: TPC-H shapes q4-q22 adapted to the
driver's slimmed schemas (no partsupp/commitdate/shipmode/phone — each
query notes its adaptation).

Same physical-plan discipline as relational.py: broadcast every
dimension explicitly, one sort-merge shuffle per fact-fact join,
map-side partial aggregation everywhere, money summed as exact
integer cents (functions/money.py) so double summation order can't
flip the comparison hash at ANY scale — the sf1 probe showed
end-rounding alone stops working once group totals reach ~1e8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.catalog import load_table
from goe_spark.functions.money import cents, money_sum
from goe_spark.queries import QuerySpec


def _ts(s: str):
    return F.lit(s).cast("timestamp")


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: EXISTS uses l_shipdate > o_orderdate —
    no commit/receipt dates in this schema).

    The EXISTS is a left-semi join: lineitem never materializes on the
    probe side, and the orders date filter prunes the scan first.
    """
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    joined = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — the pushdown showcase.

    All three predicates reach the parquet row-group filter; only 3
    columns are read; the aggregate is a single scalar (no shuffle at
    all beyond the final partial-merge).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            )
        )
    )


Q6_SQL = """
SELECT round(sum(cast(floor(l_extendedprice * l_discount * 100 + 0.5) AS bigint)) / 100.0, 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue between two nations by ship year.

    Both nation lookups broadcast; supplier and customer broadcast into
    the fact; the only big shuffle is orders⋈lineitem.
    """
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == n1.s_nkey)
        .join(F.broadcast(n2), cust.c_nationkey == n2.c_nkey)
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       round(sum(cast(floor(volume * 100 + 0.5) AS bigint)) / 100.0, 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         cast(year(l_shipdate) AS int) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (adapted: p_type = 'ECONOMY', nation share of
    AMERICA-region customer revenue by order year).

    Conditional aggregation (share = sum(case)/sum) happens in one
    grouped pass; every dimension broadcasts.
    """
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    nation_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation_c), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cr_key") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation_s), supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            # ratio of two exact cent-sums: order-free on both engines
            F.round(
                (
                    F.sum(
                        F.when(
                            F.col("supp_nation") == "NATION_3", cents(vol)
                        ).otherwise(F.lit(0).cast("long"))
                    )
                    / F.sum(cents(vol))
                ).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


Q8_SQL = """
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_3'
                      THEN cast(floor(volume * 100 + 0.5) AS bigint)
                      ELSE 0 END)
             / cast(sum(cast(floor(volume * 100 + 0.5) AS bigint)) AS double), 6) AS mkt_share
FROM (
  SELECT cast(year(o_orderdate) AS int) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA'
    AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp, so profit = revenue minus
    a retail-price cost proxy p_retailprice * l_quantity / 10).

    Money discipline: per-row profit is quantized to EXACT CENTS
    (floor(x*100+0.5) as BIGINT — identical half-up arithmetic on
    both engines) and summed as integers. A double sum rounded at
    the end holds only while |sum| stays small: the sf1 scale probe
    caught the two engines' different addition orders drifting a
    ~2e8 group total across the 0.01 grid. Integer cents are
    order-free at any scale."""
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").contains("red")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") / 10.0
    profit_cents = F.floor(profit * 100 + 0.5).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            F.round((F.sum(profit_cents) / 100.0).cast("double"), 2).alias(
                "sum_profit"
            )
        )
    )


Q9_SQL = """
SELECT n_name AS nation, cast(year(o_orderdate) AS int) AS o_year,
       round(sum(cast(floor((l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity / 10.0) * 100 + 0.5) AS bigint)) / 100.0, 2) AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count distribution over all customers.

    Left outer join keeps order-less customers (count 0); two grouped
    aggregations, the second one tiny.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — conditional agg over one join."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-09-01"))
        & (F.col("l_shipdate") < _ts("1996-10-01"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            # ratio of exact cent-sums (see q8): order-free both engines
            F.round(
                (
                    F.sum(
                        F.when(
                            F.col("p_type") == "PROMO", cents(vol)
                        ).otherwise(F.lit(0).cast("long"))
                    )
                    * 100.0
                    / F.sum(cents(vol))
                ).cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


Q14_SQL = """
SELECT round(sum(CASE WHEN p_type = 'PROMO'
                     THEN cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS bigint)
                     ELSE 0 END) * 100.0
             / sum(cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS bigint)), 6) AS promo_revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose lineitems sum past a quantity threshold.

    The HAVING subquery is a grouped aggregate on lineitem reused as a
    semi-join filter; top-100 via TakeOrdered.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice_r"),
            F.round("sum_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice_r"), F.asc("o_orderkey"))
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS o_totalprice_r,
       round(sum_qty, 2) AS total_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice_r DESC, o_orderkey ASC
LIMIT 100
"""


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (adapted: brand/size/quantity disjunction — no
    container/shipmode columns). Disjunctive predicates stay in one
    broadcast-join filter; Catalyst extracts the common p_partkey
    equi-condition so it is NOT a nested-loop join."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size").between(1, 25))
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & (F.col("p_size").between(1, 35))
            & (F.col("l_quantity") >= 20)
            & (F.col("l_quantity") <= 30)
        )
    )
    return joined.where(clause).agg(
        money_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("revenue")
    )


Q19_SQL = """
SELECT round(sum(cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS bigint)) / 100.0, 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: nationkey buckets stand in for phone
    prefixes, and "idle" means no URGENT orders — every customer in
    this dataset has at least one order). Scalar subquery broadcast +
    anti join."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(
            (F.col("c_acctbal") > F.col("avg_bal"))
            & (F.col("c_nationkey") < 10)
        )
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


Q22_SQL = """
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       round(sum(cast(floor(c_acctbal * 100 + 0.5) AS bigint)) / 100.0, 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND c_nationkey < 10
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of order value per priority class — the
    distributional reporting surface (quantiles) the TPC-H battery
    never exercises. F.percentile is the EXACT aggregate (sorted
    within each group, linear interpolation — the same continuous
    quantile DuckDB's quantile_cont computes), not percentile_approx,
    so the oracle matches bit-for-bit after rounding. Scale: exact
    group quantiles sort per group; groups here are priority classes
    (5-ary), so each reduce-side group is corpus/5 — at 100 TB swap
    in approx_percentile (t-digest sketch, mergeable map-side) and
    accept the documented error bound; this query pins the exact
    semantics the sketch approximates."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 2).alias("p99"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


PERCENTILES_SQL = """
SELECT o_orderpriority,
       count(*)                                   AS n_orders,
       round(quantile_cont(o_totalprice, 0.5), 2)  AS p50,
       round(quantile_cont(o_totalprice, 0.9), 2)  AS p90,
       round(quantile_cont(o_totalprice, 0.99), 2) AS p99,
       round(max(o_totalprice), 2)                AS max_price
FROM orders
GROUP BY o_orderpriority
"""


# Disjoint, boundary-inclusive price tiers (prices have 2 decimals,
# so .99 / .00 edges cannot double-match).
PRICE_TIERS = [
    ("T1_small", 0.0, 49999.99),
    ("T2_mid", 50000.0, 149999.99),
    ("T3_large", 150000.0, 299999.99),
    ("T4_jumbo", 300000.0, 10_000_000.0),
]
TIER_BUCKET = 50_000


def order_price_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join showcase: orders matched to price tiers
    through operators/range_join.interval_join in BUCKETED mode — the
    grid-bucket plan that replaces BroadcastNestedLoopJoin when the
    interval side is too big to broadcast (here it is tiny; the query
    exists to keep the scale path under the correctness gate). The
    plan is an equi-join on the bucket id + exact containment filter;
    shuffle volume is linear in points + interval-bucket spans."""
    from goe_spark.operators.range_join import interval_join

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    tiers = spark.createDataFrame(
        PRICE_TIERS, "tier string, lo double, hi double"
    )
    joined = interval_join(
        o,
        tiers,
        "o_totalprice",
        "lo",
        "hi",
        strategy="bucketed",
        bucket=TIER_BUCKET,
    )
    # integer-cents sum (see q9_product_profit): double sums of 2e11
    # magnitudes drift across the 0.01 grid between engines at 10x SF
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round((F.sum(cents) / 100.0).cast("double"), 2).alias(
            "tier_revenue"
        ),
    )


def _tiers_values_sql() -> str:
    return ", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in PRICE_TIERS)


PRICE_TIERS_SQL = f"""
SELECT t.tier,
       count(*)                     AS n_orders,
       round(sum(cast(floor(o.o_totalprice * 100 + 0.5) AS bigint)) / 100.0, 2)
         AS tier_revenue
FROM orders o
JOIN (VALUES {_tiers_values_sql()}) AS t(tier, lo, hi)
  ON o.o_totalprice >= t.lo AND o.o_totalprice <= t.hi
GROUP BY t.tier
"""


QUERIES = [
    QuerySpec("q4_order_priority", q4_order_priority, Q4_SQL, "TPC-H Q4 shape"),
    QuerySpec("q6_forecast_revenue", q6_forecast_revenue, Q6_SQL, "TPC-H Q6"),
    QuerySpec("q7_volume_shipping", q7_volume_shipping, Q7_SQL, "TPC-H Q7 shape"),
    QuerySpec("q8_market_share", q8_market_share, Q8_SQL, "TPC-H Q8 shape"),
    QuerySpec("q9_product_profit", q9_product_profit, Q9_SQL, "TPC-H Q9 shape"),
    QuerySpec(
        "q13_customer_distribution", q13_customer_distribution, Q13_SQL, "TPC-H Q13"
    ),
    QuerySpec("q14_promo_revenue", q14_promo_revenue, Q14_SQL, "TPC-H Q14"),
    QuerySpec("q18_large_orders", q18_large_orders, Q18_SQL, "TPC-H Q18"),
    QuerySpec(
        "q19_discounted_revenue", q19_discounted_revenue, Q19_SQL, "TPC-H Q19 shape"
    ),
    QuerySpec("q22_idle_customers", q22_idle_customers, Q22_SQL, "TPC-H Q22 shape"),
    QuerySpec(
        "order_value_percentiles",
        order_value_percentiles,
        PERCENTILES_SQL,
        "exact group quantiles",
    ),
    QuerySpec(
        "order_price_tiers",
        order_price_tiers,
        PRICE_TIERS_SQL,
        "bucketed interval join",
    ),
]
