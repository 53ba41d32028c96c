"""As-of join query: each event annotated with the customer's latest
order at event time, rolled up per event type. The DuckDB oracle uses
its NATIVE ASOF JOIN — two independent formulations of the same
semantics must agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.catalog import load_table
from goe_spark.operators.asof import asof_join
from goe_spark.queries import QuerySpec


def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: for every event, the most recent
    order of that user at or before the event timestamp, aggregated
    per event type. The right side is reduced to one row per
    (custkey, orderdate) with max_by so tie-breaks are deterministic
    in both engines."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
            F.max("o_orderkey").alias("o_orderkey"),
        )
    )
    joined = asof_join(
        events,
        orders,
        on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"],
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("o_orderkey").alias("n_matched"),
        F.round(F.sum("o_totalprice"), 2).alias("total_attached"),
    )


ASOF_SQL = """
WITH ords AS (
  SELECT o_custkey, o_orderdate,
         max_by(o_totalprice, o_orderkey) AS o_totalprice,
         max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT event_type,
       count(*)                 AS n_events,
       count(o_orderkey)        AS n_matched,
       round(sum(o_totalprice), 2) AS total_attached
FROM events ASOF LEFT JOIN ords
  ON events.user_id = ords.o_custkey AND events.ts >= ords.o_orderdate
GROUP BY event_type
"""


ASOF_TOLERANCE_DAYS = 30


def asof_recent_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tolerance-bounded as-of join (pandas merge_asof surface):
    same point-in-time enrichment as asof_latest_order, but a match
    only counts when the order is within {ASOF_TOLERANCE_DAYS} days
    of the event — the 'latest known value, unless stale' shape used
    for feature freshness windows. Zero extra shuffles vs the
    unbounded join: the matched right time rides the payload struct
    and the bound is one filter expression."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
            F.max("o_orderkey").alias("o_orderkey"),
        )
    )
    joined = asof_join(
        events,
        orders,
        on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"],
        tolerance=F.expr(f"INTERVAL {ASOF_TOLERANCE_DAYS} DAYS"),
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("o_orderkey").alias("n_matched"),
        F.round(F.sum("o_totalprice"), 2).alias("total_attached"),
    )


# The oracle reuses DuckDB's native ASOF JOIN and nullifies stale
# matches after the fact — valid because the as-of match is the
# LATEST qualifying row: if it is outside the tolerance window, every
# older candidate is too.
ASOF_TOLERANCE_SQL = f"""
WITH ords AS (
  SELECT o_custkey, o_orderdate,
         max_by(o_totalprice, o_orderkey) AS o_totalprice,
         max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
), matched AS (
  SELECT events.event_type,
         CASE WHEN ords.o_orderdate >= events.ts
                   - INTERVAL {ASOF_TOLERANCE_DAYS} DAY
              THEN ords.o_orderkey END AS o_orderkey,
         CASE WHEN ords.o_orderdate >= events.ts
                   - INTERVAL {ASOF_TOLERANCE_DAYS} DAY
              THEN ords.o_totalprice END AS o_totalprice
  FROM events ASOF LEFT JOIN ords
    ON events.user_id = ords.o_custkey AND events.ts >= ords.o_orderdate
)
SELECT event_type,
       count(*)                    AS n_events,
       count(o_orderkey)           AS n_matched,
       round(sum(o_totalprice), 2) AS total_attached
FROM matched GROUP BY event_type
"""


def asof_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (merge_asof direction='forward'): for every
    event, the customer's EARLIEST order at or after the event — the
    time-to-conversion shape. Rolled up per event type: match rate
    and the average days from event to next order (exact integer
    day arithmetic, rounded once).

    Same single-shuffle union-and-fill plan as the backward join with
    the scan order reversed; the oracle is DuckDB's native ASOF JOIN
    with the inequality flipped."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.min("o_orderkey").alias("o_orderkey"))
    )
    joined = asof_join(
        events,
        orders,
        on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"],
        direction="forward",
    )
    lag_days = F.datediff(F.col("o_orderdate"), F.col("ts").cast("date"))
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("o_orderkey").alias("n_converted"),
        F.round(F.avg(lag_days), 4).alias("avg_days_to_order"),
    )


ASOF_FORWARD_SQL = """
WITH ords AS (
  SELECT o_custkey, o_orderdate, min(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT event_type,
       count(*)          AS n_events,
       count(o_orderkey) AS n_converted,
       round(avg(date_diff('day', cast(ts AS date), o_orderdate)), 4)
         AS avg_days_to_order
FROM events ASOF LEFT JOIN ords
  ON events.user_id = ords.o_custkey AND events.ts <= ords.o_orderdate
GROUP BY event_type
"""


QUERIES = [
    QuerySpec("asof_latest_order", asof_latest_order, ASOF_SQL, "as-of join"),
    QuerySpec(
        "asof_next_order",
        asof_next_order,
        ASOF_FORWARD_SQL,
        "forward as-of join (time to conversion)",
    ),
    QuerySpec(
        "asof_recent_order",
        asof_recent_order,
        ASOF_TOLERANCE_SQL,
        "tolerance-bounded as-of join",
    ),
]
