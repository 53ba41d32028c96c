"""Relational battery part 3: the remaining TPC-H shapes (q2, q11,
q12, q15, q16, q17, q20, q21) adapted to the driver's slimmed schemas.

There is no partsupp table, so the part-supplier relationship is
derived from lineitem (the observed (l_partkey, l_suppkey) pairs and
their prices/quantities stand in for ps_supplycost / ps_availqty);
shipmode/commitdate/receiptdate/container/phone columns are likewise
replaced by columns that exist (noted per query).

Determinism discipline, stricter than relational.py/relational2.py:
any value that feeds a FILTER or JOIN (minimum cost, top revenue,
0.2*avg quantity, value-share threshold) is computed in DECIMAL so
both engines get bit-identical results — double summation order
differs between Spark and DuckDB, and rounding only at output is not
enough when the value decides row membership. Output money still
rounds to 2dp as double for the hash.

Physical-plan discipline (100 TB view): dimensions broadcast;
derived per-part / per-supplier / per-order aggregates are map-side
partial then one shuffle keyed on the same column the subsequent join
uses, so Catalyst reuses the exchange instead of adding a second
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.catalog import load_table
from goe_spark.functions.money import money_sum
from goe_spark.queries import QuerySpec


def _ts(s: str):
    return F.lit(s).cast("timestamp")


def _dec_price(col: str = "l_extendedprice"):
    return F.col(col).cast("decimal(18,2)")


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: offers come from lineitem — the
    minimum observed l_extendedprice per (part, supplier) is the
    supply cost; p_type equality replaces the '%BRASS' suffix match).

    Correlated-min structure preserved: min cost per part computed
    once, equality-joined back. Cost is DECIMAL so the equality join
    is exact. Suppliers are region-filtered BEFORE the offer
    aggregation (as in Q2) which also shrinks the shuffle.
    """
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    )
    li = load_table(spark, sf_dir, "lineitem")
    offers = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(_dec_price()).alias("supply_cost"))
    )
    min_cost = offers.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    return (
        offers.join(
            min_cost,
            (offers.l_partkey == min_cost.mc_partkey)
            & (offers.supply_cost == min_cost.min_cost),
        )
        .join(F.broadcast(part), offers.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), offers.l_suppkey == supp.s_suppkey)
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal_r"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round(F.col("supply_cost").cast("double"), 2).alias("supply_cost_r"),
        )
    )


Q2_SQL = """
WITH eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), offers AS (
  SELECT l_partkey, l_suppkey,
         min(cast(l_extendedprice AS DECIMAL(18,2))) AS supply_cost
  FROM lineitem JOIN eu_supp ON l_suppkey = s_suppkey
  GROUP BY l_partkey, l_suppkey
), min_cost AS (
  SELECT l_partkey AS mc_partkey, min(supply_cost) AS min_cost
  FROM offers GROUP BY l_partkey
)
SELECT round(s_acctbal, 2) AS s_acctbal_r, s_name, n_name, p_partkey, p_name,
       round(cast(supply_cost AS DOUBLE), 2) AS supply_cost_r
FROM offers
JOIN min_cost ON offers.l_partkey = mc_partkey AND supply_cost = min_cost
JOIN part ON offers.l_partkey = p_partkey
JOIN eu_supp ON offers.l_suppkey = s_suppkey
WHERE p_size = 15 AND p_type = 'SMALL'
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: stock value per part is
    sum(l_extendedprice * l_quantity) over NATION_1 suppliers'
    lineitems — the partsupp supplycost*availqty proxy).

    The HAVING threshold is a broadcast scalar (one row) cross-joined
    into the per-part aggregate; both sides of the comparison derive
    from the same exact DECIMAL sums.
    """
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    value = _dec_price() * F.col("l_quantity").cast("decimal(18,2)")
    scoped = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
    per_part = scoped.groupBy("l_partkey").agg(F.sum(value).alias("value"))
    total = scoped.agg(F.sum(value).alias("total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("value").cast("double") > F.col("total").cast("double") * 1e-4
        )
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.round(F.col("value").cast("double"), 2).alias("part_value"),
        )
    )


Q11_SQL = """
WITH scoped AS (
  SELECT l_partkey,
         cast(l_extendedprice AS DECIMAL(18,2))
           * cast(l_quantity AS DECIMAL(18,2)) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
)
SELECT l_partkey AS ps_partkey,
       round(cast(sum(value) AS DOUBLE), 2) AS part_value
FROM scoped
GROUP BY l_partkey
HAVING cast(sum(value) AS DOUBLE)
     > (SELECT cast(sum(value) AS DOUBLE) * 1e-4 FROM scoped)
"""


def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: l_returnflag stands in for
    l_shipmode; the late-commit filter becomes a ship-year filter).

    One orders⋈lineitem shuffle join, conditional counts in a single
    grouped pass — counts are exact so no rounding needed.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
         AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue.

    The revenue view aggregates once per supplier; the max is a
    one-row broadcast; the equality that picks the winner(s) compares
    exact DECIMAL sums (double sums could differ between engines in
    the last bit and drop/add a winner).
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    rev = _dec_price() * (
        F.lit(1).cast("decimal(8,6)") - F.col("l_discount").cast("decimal(8,6)")
    )
    revenue = li.groupBy("l_suppkey").agg(F.sum(rev).alias("total_rev"))
    top = revenue.agg(F.max("total_rev").alias("max_rev"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(top))
        .where(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev").cast("double"), 2).alias("total_revenue"),
        )
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         sum(cast(l_extendedprice AS DECIMAL(18,2))
             * (cast(1 AS DECIMAL(8,6)) - cast(l_discount AS DECIMAL(8,6))))
           AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       round(cast(total_rev AS DOUBLE), 2) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: the part-supplier catalog is the
    distinct (l_partkey, l_suppkey) pairs in lineitem; "complaint"
    suppliers are those with negative account balance).

    Anti join removes excluded suppliers before the distinct, and the
    count(distinct) groups on broadcast part attributes.
    """
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#12")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 14, 19, 23, 36, 45, 49)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(
            F.broadcast(bad_supp.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return pairs.groupBy("p_brand", "p_type", "p_size").agg(
        F.count(F.lit(1)).alias("supplier_cnt")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#12'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (adapted: brand filter only — no p_container).

    The correlated avg is algebraically cleared of division:
    qty < 0.2 * sum/cnt  ⟺  5 * qty * cnt < sum, all in DECIMAL /
    BIGINT, so row membership is exact in both engines. The per-part
    aggregate and the probe side share the l_partkey key.
    """
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    li = load_table(spark, sf_dir, "lineitem")
    scoped = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part = scoped.groupBy(F.col("l_partkey").alias("pp_partkey")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        scoped.join(per_part, scoped.l_partkey == F.col("pp_partkey"))
        .where(
            F.col("l_quantity").cast("decimal(18,2)") * 5 * F.col("cnt")
            < F.col("sum_qty")
        )
        .agg(
            # exact cents / 7 at the end: order-free (functions/money)
            F.round(
                (
                    F.sum(
                        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast(
                            "long"
                        )
                    )
                    / 100.0
                    / 7.0
                ).cast("double"),
                2,
            ).alias("avg_yearly")
        )
    )


Q17_SQL = """
WITH scoped AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3'
), per_part AS (
  SELECT l_partkey AS pp_partkey,
         sum(cast(l_quantity AS DECIMAL(18,2))) AS sum_qty,
         count(*) AS cnt
  FROM scoped GROUP BY l_partkey
)
SELECT round(sum(cast(floor(l_extendedprice * 100 + 0.5) AS bigint)) / 100.0 / 7.0, 2) AS avg_yearly
FROM scoped JOIN per_part ON l_partkey = pp_partkey
WHERE cast(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty
"""


def q20_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: a supplier qualifies when it shipped
    more than 50 units of some 'small%' part during 1996 — the
    availqty-halving test with lineitem as the stock proxy; nation
    filter NATION_11).

    Semi-join chain: the qualifying (part, supplier) aggregate never
    widens the supplier row, it only filters it.
    """
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    shipped = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        .where(F.col("qty") > 50)
    )
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_11"
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        supp.join(shipped, supp.s_suppkey == shipped.l_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal_r"))
    )


Q20_SQL = """
SELECT s_name, round(s_acctbal, 2) AS s_acctbal_r
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_11'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_partkey, l_suppkey
    HAVING sum(cast(l_quantity AS DECIMAL(18,2))) > 50
  )
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: "late" is shipping more than 45 days
    after the order date — no commit/receipt dates; no nation filter
    so the result stays populated at small SF).

    The exists/not-exists pair collapses into per-order aggregates:
    a supplier waited when the order has >1 distinct supplier and
    exactly one of them (this one) was late. Distinct counting runs as
    TWO-LEVEL aggregation — groupBy (l_orderkey, l_suppkey) first,
    then per-order counts over the collapsed rows — because a double
    countDistinct compiles to Spark's Expand strategy, which triples
    every lineitem row before the first exchange (measured ~20%
    slower at sf0.1, and the 3x shuffle volume scales with the fact
    table). The order-key join stays unhinted: AQE broadcasts the
    filtered orders side at small SF and sort-merges at 100 TB.
    """
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")
    per_supp = (
        li.join(
            orders.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late.cast("int")).alias("supp_late"))
    )
    per_order = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum("supp_late").alias("n_late"),
            F.max(
                F.when(F.col("supp_late") == 1, F.col("l_suppkey"))
            ).alias("waiting_suppkey"),
        )
        .where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        per_order.join(
            F.broadcast(supp), F.col("waiting_suppkey") == supp.s_suppkey
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


Q21_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 45 DAY
                             THEN l_suppkey END) AS n_late,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 45 DAY
                  THEN l_suppkey END) AS waiting_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey
)
SELECT s_name, count(*) AS numwait
FROM per_order JOIN supplier ON waiting_suppkey = s_suppkey
WHERE n_supp > 1 AND n_late = 1
GROUP BY s_name
"""


QUERIES = [
    QuerySpec("q2_min_cost_supplier", q2_min_cost_supplier, Q2_SQL, "TPC-H Q2 shape"),
    QuerySpec("q11_important_stock", q11_important_stock, Q11_SQL, "TPC-H Q11 shape"),
    QuerySpec("q12_priority_lines", q12_priority_lines, Q12_SQL, "TPC-H Q12 shape"),
    QuerySpec("q15_top_supplier", q15_top_supplier, Q15_SQL, "TPC-H Q15 shape"),
    QuerySpec(
        "q16_supplier_part_counts", q16_supplier_part_counts, Q16_SQL, "TPC-H Q16 shape"
    ),
    QuerySpec(
        "q17_small_qty_revenue", q17_small_qty_revenue, Q17_SQL, "TPC-H Q17 shape"
    ),
    QuerySpec(
        "q20_promotable_suppliers", q20_promotable_suppliers, Q20_SQL, "TPC-H Q20 shape"
    ),
    QuerySpec(
        "q21_waiting_suppliers", q21_waiting_suppliers, Q21_SQL, "TPC-H Q21 shape"
    ),
]


def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority through the skew-salted join
    (operators/salting): the fact side salts on (orderkey, linenumber)
    and orders replicates 8x, so one hot orderkey spreads over 8
    reducers. The oracle is the PLAIN join — salting must change
    where rows meet, never which rows meet.
    """
    from goe_spark.operators.salting import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(
        li,
        orders,
        "l_orderkey",
        "o_orderkey",
        salt_source=F.xxhash64("l_orderkey", "l_linenumber"),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        money_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("revenue"),
    )


SALTED_JOIN_SQL = """
SELECT o_orderpriority, count(*) AS n_lines,
       round(sum(cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS bigint)) / 100.0, 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""

QUERIES.append(
    QuerySpec(
        "salted_join_revenue", salted_join_revenue, SALTED_JOIN_SQL, "skew salting"
    )
)


def quantity_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles on a bounded value domain — the scale-safe
    alternative to a global sort: l_quantity takes 50 integer values,
    so p50/p90/p99 per return flag come from value-grain counts + a
    50-row-per-group cumulative, never a corpus-wide rank window.
    (Unbounded domains use the KLL sketch — value_quantiles_kll; this
    operator is the exact path warehouses use for enum-like columns.)

    Percentile convention: smallest value v with cum_count >=
    ceil(p * n) (the lower/inverted-CDF percentile) — integer
    arithmetic only, so cross-engine exact.

    Plan: one (flag, quantity) hash aggregate (map-side partial), a
    window over <= 50 rows per flag, then conditional mins. The
    shuffle carries 150 rows regardless of corpus size."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("int").alias("q")
    )
    counts = li.groupBy("l_returnflag", "q").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("l_returnflag"))
    )

    def pct(p_num: int, p_den: int, name: str):
        thr = F.ceil(F.col("n") * p_num / p_den)
        return F.min(
            F.when(F.col("cum") >= thr, F.col("q"))
        ).alias(name)

    return cum.groupBy("l_returnflag").agg(
        F.max("n").alias("n_lines"),
        pct(1, 2, "q_p50"),
        pct(9, 10, "q_p90"),
        pct(99, 100, "q_p99"),
        F.min("q").alias("q_min"),
        F.max("q").alias("q_max"),
    )


QUANTITY_PCT_SQL = """
WITH counts AS (
  SELECT l_returnflag, cast(l_quantity AS int) AS q, count(*) AS c
  FROM lineitem GROUP BY 1, 2
), cum AS (
  SELECT *,
         sum(c) OVER (PARTITION BY l_returnflag ORDER BY q
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY l_returnflag) AS n
  FROM counts
)
SELECT l_returnflag,
       cast(max(n) AS bigint) AS n_lines,
       min(CASE WHEN cum >= ceil(n * 1 / 2) THEN q END) AS q_p50,
       min(CASE WHEN cum >= ceil(n * 9 / 10) THEN q END) AS q_p90,
       min(CASE WHEN cum >= ceil(n * 99 / 100) THEN q END) AS q_p99,
       min(q) AS q_min,
       max(q) AS q_max
FROM cum GROUP BY l_returnflag
"""

QUERIES.append(
    QuerySpec(
        "quantity_exact_percentiles",
        quantity_exact_percentiles,
        QUANTITY_PCT_SQL,
        "exact p50/p90/p99 via bounded-domain value counts",
    )
)


def reorder_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer reorder cadence: the distribution of day gaps between
    a customer's consecutive orders, log2-bucketed — the lifecycle
    signal behind churn models and replenishment forecasts (a mass at
    small gaps = habitual buyers; a fat tail = one-shot customers).
    Buckets are binary magnitudes (length(bin(days)) - 1), the same
    float-free edge discipline as interarrival_log2_histogram.

    Plan: ONE customer-partitioned window (a customer's order history
    never leaves a task), then a ~12-key rollup; same-day repeat
    orders land in the -1 bucket rather than vanishing."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(
            "o_orderdate", F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    ).where(F.col("gap_days").isNotNull())
    bucket = F.when(F.col("gap_days") <= 0, F.lit(-1)).otherwise(
        F.length(F.bin(F.col("gap_days"))) - 1
    )
    return (
        gaps.select(bucket.cast("int").alias("log2_bucket"), "gap_days", "o_custkey")
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.min("gap_days").alias("min_days"),
            F.max("gap_days").alias("max_days"),
            F.sum("gap_days").cast("bigint").alias("total_days"),
        )
    )


REORDER_GAP_SQL = """
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day',
                   lag(o_orderdate) OVER
                     (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap_days
  FROM orders
), nz AS (
  SELECT o_custkey, gap_days,
         CASE WHEN gap_days <= 0 THEN -1
              ELSE length(bin(gap_days)) - 1 END AS log2_bucket
  FROM gaps WHERE gap_days IS NOT NULL
)
SELECT cast(log2_bucket AS int) AS log2_bucket,
       count(*) AS n_gaps,
       count(DISTINCT o_custkey) AS n_customers,
       min(gap_days) AS min_days,
       max(gap_days) AS max_days,
       cast(sum(gap_days) AS bigint) AS total_days
FROM nz GROUP BY 1
"""

QUERIES.append(
    QuerySpec(
        "reorder_gap_histogram",
        reorder_gap_histogram,
        REORDER_GAP_SQL,
        "customer reorder-cadence log2 histogram",
    )
)
