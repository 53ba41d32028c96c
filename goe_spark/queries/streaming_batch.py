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
    ATTRIBUTION_WINDOW_MIN,
    EVENT_CATEGORY,
    SESSION_GAP_MIN,
    dedup_event_counts,
    enriched_window_counts,
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


def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions via Spark's NATIVE session_window — the
    declarative formulation of the sessionizer (the same groupBy runs
    unbounded under Structured Streaming with a watermark; pinned
    batch-side here so the oracle is exact).

    Two deliberate semantic differences from sessionization_stats
    (both are the built-in operator's definition, mirrored in the
    oracle): a session's end is last_event + gap (the window close,
    not the last event), and an event exactly AT the gap boundary
    starts a NEW session (close on >= gap, where the lag/cumsum twin
    closes on > gap)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    return (
        e.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


SESSION_WINDOW_SQL = f"""
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                  >= {SESSION_GAP_MIN * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS is_start
  FROM events
), sess AS (
  SELECT user_id, ts, value,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       min(ts)                                        AS session_start,
       max(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE    AS session_end,
       count(*)                                       AS n_events,
       round(sum(value), 2)                           AS total_value
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


def stream_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment (category dim) + windowed
    rollup, drained availableNow; the oracle is the CASE-mapped batch
    group-by."""
    return enriched_window_counts(spark, sf_dir)


def _category_case_sql(col: str) -> str:
    arms = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in sorted(EVENT_CATEGORY.items())
    )
    return f"CASE {col} {arms} END"


STREAM_ENRICHED_SQL = f"""
SELECT cast(date_trunc('day', ts) AS date) AS day,
       {_category_case_sql('event_type')}  AS category,
       count(*)                            AS n_events,
       round(sum(value), 2)                AS sum_value
FROM events
GROUP BY 1, 2
"""


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream attribution join: purchases
    matched to the same user's views within the preceding
    {ATTRIBUTION_WINDOW_MIN} minutes, rolled up per purchase day.
    One shuffle on user_id co-partitions both sides; the interval
    condition evaluates inside the sort-merge join. The streaming
    formulation (watermark-bounded join state) is
    streaming/events.py::attribution_pairs_stream; equivalence is
    asserted in tests/test_streaming.py."""
    e = load_table(spark, sf_dir, "events")
    v = e.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
    )
    b = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"),
    )
    pairs = v.join(
        b,
        (F.col("v_user") == F.col("b_user"))
        & (F.col("view_ts") <= F.col("buy_ts"))
        & (
            F.col("view_ts")
            >= F.col("buy_ts")
            - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_MIN} MINUTES")
        ),
    )
    return pairs.groupBy(
        F.col("buy_ts").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("buy_id").alias("n_purchases"),
        F.round(
            F.count(F.lit(1)) / F.countDistinct("buy_id"), 4
        ).alias("views_per_purchase"),
    )


PURCHASE_ATTRIBUTION_SQL = f"""
WITH v AS (
  SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view'
), b AS (
  SELECT user_id, ts AS buy_ts, event_id AS buy_id
  FROM events WHERE event_type = 'purchase'
), pairs AS (
  SELECT b.buy_id, b.buy_ts
  FROM b JOIN v ON v.user_id = b.user_id
   AND v.view_ts <= b.buy_ts
   AND v.view_ts >= b.buy_ts - INTERVAL {ATTRIBUTION_WINDOW_MIN} MINUTE
)
SELECT cast(buy_ts AS date)                                  AS day,
       count(*)                                              AS n_pairs,
       count(DISTINCT buy_id)                                AS n_purchases,
       round(count(*) / cast(count(DISTINCT buy_id) AS double), 4)
                                                             AS views_per_purchase
FROM pairs GROUP BY 1
"""


def unattributed_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the LEFT OUTER stream-stream interval join:
    every purchase, attributed or not, with the per-day attribution
    rate — the funnel-health metric the inner join can't report
    (unmatched purchases vanish from it).

    Plan: same single user_id co-partitioning shuffle as
    purchase_attribution; the outer side survives the interval
    predicate inside the join. Streaming formulation (state expires
    at the watermark, unmatched purchases emit with a null view):
    streaming/events.py::unattributed_purchases_stream; equivalence
    on watermark-closed purchases is asserted in
    tests/test_streaming.py."""
    e = load_table(spark, sf_dir, "events")
    v = e.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
    )
    b = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"),
    )
    pairs = b.join(
        v,
        (F.col("v_user") == F.col("b_user"))
        & (F.col("view_ts") <= F.col("buy_ts"))
        & (
            F.col("view_ts")
            >= F.col("buy_ts")
            - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_MIN} MINUTES")
        ),
        "left",
    )
    per_buy = pairs.groupBy("buy_id", "buy_ts").agg(
        F.count("view_ts").alias("n_views")
    )
    return per_buy.groupBy(
        F.col("buy_ts").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum((F.col("n_views") == 0).cast("long")).alias("n_unattributed"),
        F.round(
            F.avg((F.col("n_views") > 0).cast("double")), 4
        ).alias("attribution_rate"),
    )


UNATTRIBUTED_SQL = f"""
WITH v AS (
  SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view'
), b AS (
  SELECT user_id, ts AS buy_ts, event_id AS buy_id
  FROM events WHERE event_type = 'purchase'
), per_buy AS (
  SELECT b.buy_id, b.buy_ts, count(v.view_ts) AS n_views
  FROM b LEFT JOIN v ON v.user_id = b.user_id
   AND v.view_ts <= b.buy_ts
   AND v.view_ts >= b.buy_ts - INTERVAL {ATTRIBUTION_WINDOW_MIN} MINUTE
  GROUP BY b.buy_id, b.buy_ts
)
SELECT cast(buy_ts AS date)                                   AS day,
       count(*)                                               AS n_purchases,
       cast(sum(CASE WHEN n_views = 0 THEN 1 ELSE 0 END) AS bigint)
                                                              AS n_unattributed,
       round(avg(CASE WHEN n_views > 0 THEN 1.0 ELSE 0.0 END), 4)
                                                              AS attribution_rate
FROM per_buy GROUP BY 1
"""


def continuous_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous aggregate (streaming/rollup.py) drained over the
    finite events stream: micro-batch partials merged at read must
    equal the direct batch aggregate — the oracle IS that direct
    aggregate. Fresh temp dirs per call so re-runs re-drain."""
    import atexit
    import shutil
    import tempfile

    from goe_spark.streaming.rollup import stream_rollup_events

    work = tempfile.mkdtemp(prefix="goe_rollup_")
    # The returned DataFrame reads the partial roots lazily, so the
    # work dir must outlive this call; reclaim it at process exit.
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    return stream_rollup_events(
        spark,
        sf_dir,
        rollup_dir=f"{work}/rollup",
        checkpoint_dir=f"{work}/ck",
        metadata_dir=f"{work}/md",
    )


CONTINUOUS_ROLLUP_SQL = """
SELECT cast(ts AS date)     AS day,
       event_type,
       count(*)             AS n_events,
       cast(round(sum(cast(value AS decimal(20,2))), 2)
            AS double) AS sum_value
FROM events
GROUP BY 1, 2
"""


def streaming_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming CUSUM drift detector (applyInPandasWithState,
    O(1) int64 state per event type — streaming/drift.py). On a
    finite availableNow drain the summary equals the batch twin
    cusum_event_drift, whose window closed form the DuckDB oracle
    replays — so a CUSTOM STATEFUL STREAMING OPERATOR gets a full
    hash-compared oracle, not a rows-only waiver."""
    from goe_spark.streaming.drift import drift_summary_stream

    return drift_summary_stream(spark, sf_dir)


def _cusum_drift_oracle() -> str:
    from goe_spark.queries.timeseries import CUSUM_DRIFT_SQL

    return CUSUM_DRIFT_SQL


def streaming_classifier_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Model inference on ingest: the fixed-point quality classifier
    scoring the DOCUMENT stream (streaming/docs.py) — the oracle is
    the plain batch group-by, so it matches only if the stream scored
    every doc exactly once with bit-identical arithmetic."""
    from goe_spark.streaming.docs import classifier_scored_counts

    return classifier_scored_counts(spark, sf_dir)


def _streaming_classifier_sql() -> str:
    from goe_spark.functions.classifier import classifier_logit_milli_sql

    return f"""
WITH per AS (
  SELECT lang, {classifier_logit_milli_sql('text')} AS logit
  FROM documents
)
SELECT lang,
       count(*) AS n_docs,
       cast(sum(CASE WHEN logit > 0 THEN 1 ELSE 0 END) AS bigint)
         AS n_keep,
       cast(sum(CASE WHEN logit > 500 THEN 1 ELSE 0 END) AS bigint)
         AS n_strong,
       cast(sum(logit) AS bigint) AS sum_logit_milli
FROM per GROUP BY lang
"""


def streaming_pii_quarantine(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PII quarantine routing on the document stream
    (streaming/docs.py): per source, clean vs quarantined docs and
    per-kind entity counts. Oracle = the plain batch scan, so it
    matches only if the stream scanned every doc exactly once with
    identical regex counters."""
    from goe_spark.streaming.docs import pii_quarantine_counts

    return pii_quarantine_counts(spark, sf_dir)


def _streaming_pii_sql() -> str:
    from goe_spark.queries.pii import (
        AUGMENTED_TEXT_SQL,
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
        pii_count_sql,
    )

    e = pii_count_sql("aug", EMAIL_RE)
    p = pii_count_sql("aug", PHONE_RE)
    i = pii_count_sql("aug", IPV4_RE)
    return f"""
WITH aug AS (
  SELECT source, {AUGMENTED_TEXT_SQL} AS aug FROM documents
)
SELECT source,
       count(*) AS n_docs,
       cast(sum(CASE WHEN {e} + {p} + {i} > 0 THEN 1 ELSE 0 END)
            AS bigint) AS n_quarantined,
       cast(sum(CASE WHEN {e} + {p} + {i} > 0 THEN 0 ELSE 1 END)
            AS bigint) AS n_clean,
       cast(sum({e}) AS bigint) AS n_emails,
       cast(sum({p}) AS bigint) AS n_phones,
       cast(sum({i}) AS bigint) AS n_ips
FROM aug GROUP BY source
"""


QUERIES = [
    QuerySpec(
        "streaming_window_counts", streaming_window_counts, STREAMING_WINDOW_SQL
    ),
    QuerySpec(
        "streaming_pii_quarantine",
        streaming_pii_quarantine,
        _streaming_pii_sql(),
        "PII quarantine routing on the document stream; oracle = "
        "batch scan",
    ),
    QuerySpec(
        "streaming_cusum_drift",
        streaming_cusum_drift,
        _cusum_drift_oracle(),
        "stateful online CUSUM per event type; oracle = closed form",
    ),
    QuerySpec(
        "continuous_rollup_daily", continuous_rollup_daily, CONTINUOUS_ROLLUP_SQL
    ),
    QuerySpec(
        "streaming_dedup_counts", streaming_dedup_counts, STREAMING_DEDUP_SQL
    ),
    QuerySpec("sessionization_stats", sessionization_stats, SESSIONIZATION_SQL),
    QuerySpec(
        "session_window_stats", session_window_stats, SESSION_WINDOW_SQL
    ),
    QuerySpec("event_type_rollup", event_type_rollup, EVENT_ROLLUP_SQL),
    QuerySpec(
        "stream_enriched_counts", stream_enriched_counts, STREAM_ENRICHED_SQL
    ),
    QuerySpec(
        "purchase_attribution", purchase_attribution, PURCHASE_ATTRIBUTION_SQL
    ),
    QuerySpec(
        "unattributed_purchases", unattributed_purchases, UNATTRIBUTED_SQL
    ),
    QuerySpec(
        "streaming_classifier_counts",
        streaming_classifier_counts,
        _streaming_classifier_sql(),
        "classifier inference on the document stream; oracle = batch",
    ),
]
