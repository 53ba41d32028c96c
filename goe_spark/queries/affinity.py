"""Market-basket affinity: which part brands are bought together more
(or less) often than independence predicts — the classic retail
co-occurrence/lift analysis, and the relational twin of the corpus
bigram-PMI operator (lift is exp(PMI)).

Scale design: pair emission is ORDER-LOCAL — each order's distinct
brand set (bounded by lines-per-order, ~4-7) expands to its own pairs
inside the groupBy output via the same sorted-collect_set + transform
pattern the LSH bucket pair emitter uses, so there is no self-join of
the lineitem fact with itself: the only fact-sized shuffle is the
groupBy on l_orderkey. Everything downstream is brand-pair
cardinality (<= 300 rows for 25 brands) with the marginals broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.catalog import load_table, spread
from goe_spark.queries import QuerySpec

# Keep the output to co-occurrences with enough support to be stable.
MIN_PAIR_ORDERS = 5


def brand_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(brand_a, brand_b, n_both, lift): orders containing both brands
    and the lift n_both * N / (n_a * n_b), for pairs co-occurring in
    at least {MIN_PAIR_ORDERS} orders."""
    # spread: the single-file lineitem scan yields 3 splits, so the
    # join + basket collect_set map ran on 3 cores (0.76 s measured);
    # a no-op on any many-file table.
    li = spread(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        ),
        "l_orderkey",
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    )
    # Lazy checkpoint: three branches (totals, pairs, singles) read
    # the baskets; with only exchange-level reuse the collect_set
    # aggregate re-ran per branch once spread()'s exchange became the
    # shared node. The checkpoint holds ~|orders| brand arrays and
    # keeps the 32-way partitioning, so the pair explode below also
    # escapes AQE's byte-based coalescing (measured: 5 tasks).
    baskets = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_brand")).alias("brands"))
        .localCheckpoint(eager=False)
    )
    # Basket total folded in as a 1-row broadcast aggregate, NOT an
    # eager count() — building the DataFrame must not run a fact-sized
    # job, and the single-job plan lets AQE reuse the basket exchange.
    totals = baskets.agg(F.count(F.lit(1)).alias("n_orders_total"))
    n = F.size("brands")
    pair_structs = F.flatten(
        F.transform(
            F.col("brands"),
            lambda x, i: F.transform(
                F.slice(F.col("brands"), i + 2, n - i - 1),
                lambda y: F.struct(x.alias("brand_a"), y.alias("brand_b")),
            ),
        )
    )
    pairs = (
        baskets.where(n >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .groupBy("p.brand_a", "p.brand_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= MIN_PAIR_ORDERS)
    )
    singles = baskets.select(
        F.explode("brands").alias("brand")
    ).groupBy("brand").agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        pairs.join(
            F.broadcast(
                singles.select(
                    F.col("brand").alias("brand_a"),
                    F.col("n_orders").alias("na"),
                )
            ),
            "brand_a",
        )
        .join(
            F.broadcast(
                singles.select(
                    F.col("brand").alias("brand_b"),
                    F.col("n_orders").alias("nb"),
                )
            ),
            "brand_b",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "brand_a",
            "brand_b",
            "n_both",
            # double arithmetic throughout: long products of basket
            # counts overflow 64-bit at corpus scale (non-ANSI mode
            # would wrap silently); the SQL twin mirrors the exact
            # operation order so rounding agrees.
            F.round(
                F.col("n_both")
                * F.col("n_orders_total").cast("double")
                / (F.col("na").cast("double") * F.col("nb")),
                4,
            ).alias("lift"),
        )
    )


AFFINITY_SQL = f"""
WITH baskets AS (
  SELECT l_orderkey, list_sort(list(DISTINCT p_brand)) AS brands
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY l_orderkey
), n AS (
  SELECT count(*) AS n_orders FROM baskets
), pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS n_both
  FROM (SELECT l_orderkey, unnest(brands) AS brand FROM baskets) a
  JOIN (SELECT l_orderkey, unnest(brands) AS brand FROM baskets) b
    ON a.l_orderkey = b.l_orderkey AND a.brand < b.brand
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_PAIR_ORDERS}
), singles AS (
  SELECT brand, count(*) AS n_orders
  FROM (SELECT l_orderkey, unnest(brands) AS brand FROM baskets)
  GROUP BY 1
)
SELECT p.brand_a, p.brand_b, p.n_both,
       round(p.n_both * cast(n.n_orders AS double)
             / (cast(sa.n_orders AS double) * sb.n_orders), 4) AS lift
FROM pairs p
CROSS JOIN n
JOIN singles sa ON sa.brand = p.brand_a
JOIN singles sb ON sb.brand = p.brand_b
"""


QUERIES = [
    QuerySpec("brand_affinity_lift", brand_affinity_lift, AFFINITY_SQL),
]
