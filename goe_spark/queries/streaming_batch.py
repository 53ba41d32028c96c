"""Streaming operators exposed as registry queries.

streaming_window_counts actually runs a Structured Streaming job
(availableNow drain into a memory sink); its oracle is the batch
group-by DuckDB computes — finite input makes them equal.

sessionization_stats is the batch twin (lag/cumsum windows) of the
applyInPandasWithState sessionizer in streaming/events.py; the
streaming-vs-batch equivalence is asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.catalog import load_table
from goe_spark.queries import QuerySpec
from goe_spark.streaming.events import (
    SESSION_GAP_MIN,
    dedup_event_counts,
    windowed_event_counts,
)


def streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windowed_event_counts(spark, sf_dir)


def streaming_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once under double delivery: the oracle is the PLAIN
    batch group-by — it matches only if the streaming dedup dropped
    every one of the injected duplicates."""
    return dedup_event_counts(spark, sf_dir)


STREAMING_DEDUP_SQL = """
SELECT event_type,
       count(*)             AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY event_type
"""


STREAMING_WINDOW_SQL = """
SELECT date_trunc('hour', ts)   AS window_start,
       event_type,
       count(*)                 AS n_events,
       round(sum(value), 2)     AS sum_value
FROM events
GROUP BY 1, 2
"""


def sessionization_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30 min) via lag + cumulative sum — the
    batch formulation of the streaming sessionizer. Two window
    functions over one (user_id, ts) sort; one shuffle."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    marked = e.withColumn(
        "is_start",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > gap_us
            ),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


SESSIONIZATION_SQL = f"""
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                  > {SESSION_GAP_MIN * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS is_start
  FROM events
), sess AS (
  SELECT user_id, ts, value,
         cast(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS bigint) AS session_id
  FROM marked
)
SELECT user_id, session_id,
       min(ts)              AS session_start,
       max(ts)              AS session_end,
       count(*)             AS n_events,
       round(sum(value), 2) AS total_value
FROM sess
GROUP BY user_id, session_id
"""


def event_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS rollup over (event_type, day) — the reporting
    shape of the reference's status report (O8) on event data."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
            "value",
        )
        .rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


EVENT_ROLLUP_SQL = """
SELECT event_type, day, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM (SELECT event_type, cast(date_trunc('day', ts) AS date) AS day, value FROM events)
GROUP BY ROLLUP (event_type, day)
"""


QUERIES = [
    QuerySpec(
        "streaming_window_counts", streaming_window_counts, STREAMING_WINDOW_SQL
    ),
    QuerySpec(
        "streaming_dedup_counts", streaming_dedup_counts, STREAMING_DEDUP_SQL
    ),
    QuerySpec("sessionization_stats", sessionization_stats, SESSIONIZATION_SQL),
    QuerySpec("event_type_rollup", event_type_rollup, EVENT_ROLLUP_SQL),
]
