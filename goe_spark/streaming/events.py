"""Structured Streaming over the events table.

Additive scope (SURVEY §2.9: the reference is batch-only). Two
operators:

- windowed_event_counts: tumbling-window aggregate via readStream ->
  groupBy(window(...)) -> memory sink. Run with the availableNow
  trigger it drains the backlog and stops — the batch-equivalent
  result, which is exactly what the DuckDB oracle recomputes. On a
  live cluster the same plan runs unbounded with a watermark bounding
  state.

- sessionize (applyInPandasWithState): custom stateful operator
  assigning gap-based sessions per user. The streaming path keeps one
  small state row per user; the batch twin (sessionization_stats in
  queries/streaming_batch.py) is the lag/cumsum window formulation
  the oracle verifies.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from goe_spark.streaming.tuning import stream_state_partitions

SESSION_GAP_MIN = 30

def _events_raw_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the same ts
    normalization as catalog.load_table.

    The fixture's ts encoding has shipped both as parquet
    TIMESTAMP(NANOS) (reads as long with nanosAsLong) and as
    TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ), so sniff the batch
    schema first (cached per sf_dir in catalog.events_ts_type) and use
    the sniffed type verbatim in the stream schema — a hard-coded one
    silently yields 1970-era timestamps when the encoding flips.
    Both encodings are then normalized to TimestampType by the same
    helper the batch path uses, so stream-vs-batch comparisons never
    mix TIMESTAMP with TIMESTAMP_NTZ.
    """
    import os

    from goe_spark.catalog import events_ts_type, normalize_events_ts

    batch_ts = events_ts_type(spark, sf_dir)
    reader = spark.readStream.schema(_events_raw_schema(batch_ts))
    table_path = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(table_path):
        # Directory-style table (the normal production layout — e.g.
        # a Spark-written table or the .scale probe fixtures): stream
        # the directory itself.
        raw = reader.parquet(table_path)
    else:
        # Single-file fixture: the streaming file source needs a
        # directory, so point basePath at sf_dir and glob-filter to
        # the events file only (the other tables have different
        # schemas). NOTE pathGlobFilter matches FILES — it silently
        # reads zero rows against a directory-style table, which is
        # why the isdir branch exists.
        raw = reader.option("pathGlobFilter", "events.parquet").parquet(
            sf_dir
        )
    return normalize_events_ts(raw)


def windowed_event_counts(
    spark: SparkSession,
    sf_dir: str,
    window_duration: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling-window counts per event_type, drained with
    availableNow into a memory sink; returns the sink as a DataFrame.

    Complete output mode emits every window on the final drain, so the
    finite-input result equals the batch group-by (the oracle).
    """
    stream = events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    sink = f"win_counts_{uuid.uuid4().hex[:8]}"
    # state-store partition count is captured at start(); see streaming/tuning.py
    with stream_state_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink)


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType()),
        StructField("start_ts", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _sessionize_fn(key, pdf_iter, state, use_timeout: bool = False):
    """applyInPandasWithState update function: gap-based sessions.

    State carries (last_ts, start_ts, n, total). Events arrive sorted
    per key within the batch (we sort); a gap > SESSION_GAP_MIN closes
    the current session and emits it.

    ``use_timeout`` governs idle-session flushing on a live stream
    (ProcessingTimeTimeout). It must stay False for finite availableNow
    drains: pending processing-time timeouts keep the trigger loop
    alive ("no new data but cleaning up state") and the drain never
    terminates — open sessions correctly stay in state instead.
    """
    import pandas as pd

    gap = SESSION_GAP_MIN * 60 * 1_000_000
    (user_id,) = key
    if state.exists:
        last_ts, start_ts, n, total = state.get
    else:
        last_ts = start_ts = None
        n, total = 0, 0.0

    out = []
    # CONCATENATE the per-key chunks before sorting: a multi-file
    # source delivers several pandas chunks per key per batch in
    # arbitrary, range-interleaved order — sorting each chunk
    # independently breaks gap detection (same defect caught by sf1
    # hash parity on the CUSUM twin, streaming/drift.py).
    pdfs = list(pdf_iter)
    for pdf in ([pd.concat(pdfs).sort_values("ts")] if pdfs else []):
        for ts, value in zip(pdf["ts"], pdf["value"]):
            t = round(ts.timestamp() * 1_000_000)  # integer micros
            if last_ts is not None and t - last_ts > gap:
                out.append((user_id, start_ts, last_ts, n, total))
                start_ts, n, total = t, 0, 0.0
            if start_ts is None:
                start_ts = t
            last_ts = t
            n += 1
            total += float(value)

    if use_timeout and state.hasTimedOut:
        if n:
            out.append((user_id, start_ts, last_ts, n, total))
        state.remove()
    else:
        state.update((last_ts, start_ts, n, total))
        if use_timeout:
            state.setTimeoutDuration(60 * 1000)

    if out:
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in out],
                "session_start": [
                    pd.Timestamp(r[1], unit="us", tz="UTC") for r in out
                ],
                "session_end": [
                    pd.Timestamp(r[2], unit="us", tz="UTC") for r in out
                ],
                "n_events": [r[3] for r in out],
                "total_value": [round(r[4], 2) for r in out],
            }
        )


def sessionize_stream(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    use_timeout: bool = False,
) -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming
    operator. Returns the memory-sink table of CLOSED sessions (open
    sessions remain in state — correct streaming semantics).

    ``use_timeout=True`` adds idle-session flushing for a live
    unbounded deployment; it must stay off for availableNow drains
    (see _sessionize_fn)."""
    import functools

    stream = events_stream(spark, sf_dir)
    sessions = (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            functools.partial(_sessionize_fn, use_timeout=use_timeout),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                "ProcessingTimeTimeout" if use_timeout else "NoTimeout"
            ),
        )
    )
    sink = f"sessions_{uuid.uuid4().hex[:8]}"
    # state-store partition count is captured at start(); see streaming/tuning.py
    with stream_state_partitions(spark):
        q = (
            sessions.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink)


# Static enrichment dimension: event_type -> reporting category. In a
# real deployment this is a warehouse dim table; keyed tiny, so it
# broadcasts into the stream (no stream-side shuffle, no state).
EVENT_CATEGORY = {
    "click": "engagement",
    "view": "engagement",
    "signup": "conversion",
    "purchase": "conversion",
    "error": "ops",
}

ATTRIBUTION_WINDOW_MIN = 30


def category_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        sorted(EVENT_CATEGORY.items()), "event_type string, category string"
    )


def enriched_window_counts(
    spark: SparkSession,
    sf_dir: str,
    window_duration: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-static enrichment join: the event stream picks up its
    reporting category from a broadcast dim, then rolls up per
    (day, category). The static side needs no watermark and adds no
    state — the standard dimension-enrichment topology. Drained with
    availableNow, the result equals the batch CASE-mapped group-by
    (the oracle)."""
    stream = events_stream(spark, sf_dir).withWatermark("ts", watermark)
    dim = F.broadcast(category_dim(spark))
    agg = (
        stream.join(dim, "event_type")
        .groupBy(F.window("ts", window_duration), F.col("category"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").cast("date").alias("day"),
            "category",
            "n_events",
            "sum_value",
        )
    )
    sink = f"enriched_{uuid.uuid4().hex[:8]}"
    # state-store partition count is captured at start(); see streaming/tuning.py
    with stream_state_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink)


def attribution_pairs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: each purchase joins the same
    user's view events from the preceding {ATTRIBUTION_WINDOW_MIN}
    minutes — last-touch attribution. Both sides carry watermarks and
    the join condition carries event-time bounds, so Spark can expire
    join state: a view older than buy_ts - window can never match a
    future purchase once the watermark passes. State is bounded by
    arrival rate x (watermark + window), not history — the property
    that keeps an unbounded 100 TB/day click-stream joinable."""
    v = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
        )
        .withWatermark("view_ts", "1 hour")
    )
    b = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("buy_ts"),
            F.col("event_id").alias("buy_id"),
        )
        .withWatermark("buy_ts", "1 hour")
    )
    joined = v.join(
        b,
        F.expr(
            "v_user = b_user AND view_ts <= buy_ts AND "
            f"view_ts >= buy_ts - INTERVAL {ATTRIBUTION_WINDOW_MIN} MINUTES"
        ),
    )
    sink = f"attrib_{uuid.uuid4().hex[:8]}"
    # state-store partition count is captured at start(); see streaming/tuning.py
    with stream_state_partitions(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink)


def unattributed_purchases_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every purchase emits —
    matched purchases as soon as both sides arrive, UNMATCHED
    purchases with a null view_ts once the watermark passes
    buy_ts + window and the engine can prove no matching view will
    ever arrive. That proof is the whole point of the outer variant:
    the funnel-health metric (attribution rate) needs the purchases
    the inner join silently drops.

    State bounds are identical to the inner join (arrival rate x
    (watermark + window)); the outer row is produced by state EXPIRY,
    so on a finite availableNow drain purchases whose
    buy_ts + window has not been passed by the final watermark stay
    open in state — tests compare only watermark-closed purchases
    against the batch twin (queries/streaming_batch.py::
    unattributed_purchases), the same open-tail discipline as the
    sessionizer."""
    v = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
        )
        .withWatermark("view_ts", "1 hour")
    )
    b = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("buy_ts"),
            F.col("event_id").alias("buy_id"),
        )
        .withWatermark("buy_ts", "1 hour")
    )
    joined = b.join(
        v,
        F.expr(
            "v_user = b_user AND view_ts <= buy_ts AND "
            f"view_ts >= buy_ts - INTERVAL {ATTRIBUTION_WINDOW_MIN} MINUTES"
        ),
        "leftOuter",
    )
    sink = f"unattrib_{uuid.uuid4().hex[:8]}"
    # state-store partition count is captured at start(); see streaming/tuning.py
    with stream_state_partitions(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink)


def dedup_event_counts(
    spark: SparkSession,
    sf_dir: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exactly-once dedup: the input stream is unioned with
    itself (every event delivered twice — the at-least-once redelivery
    case), then dropDuplicatesWithinWatermark on event_id collapses it
    back. State holds one key per event inside the watermark horizon,
    so memory is bounded by arrival rate x watermark, not by history —
    the property that matters on an unbounded 100 TB/day stream.

    Returns per-type counts over the drained sink; equal to the plain
    batch group-by iff dedup removed every redelivery.
    """
    stream = events_stream(spark, sf_dir)
    doubled = stream.union(events_stream(spark, sf_dir))
    deduped = doubled.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    sink = f"dedup_events_{uuid.uuid4().hex[:8]}"
    # state-store partition count is captured at start(); see streaming/tuning.py
    with stream_state_partitions(spark):
        q = (
            deduped.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(sink)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
