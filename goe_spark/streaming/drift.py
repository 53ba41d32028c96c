"""Stateful streaming CUSUM drift detector — the online half of
queries/timeseries.cusum_event_drift.

A 100 TB ingest pipeline does not get to re-window the corpus to ask
"did the upstream value distribution shift?" — it has to notice ON
THE STREAM. This operator keeps O(1) CUSUM state per event type in
applyInPandasWithState and emits a running summary per micro-batch;
the batch twin (same constants, same recurrence via the cumsum -
running-min closed form) is the hash-compared oracle surface, and
tests/test_streaming_drift.py pins the two row-identical over a
finite drain.

State per key (all int64): the running cumulative sums, their
running min/max (which turn the max(0, .) recurrence into plain
prefix arithmetic), previous statistic values (for onset edges),
event count, onset counters, and statistic maxima.

Ordering: within each batch, rows are sorted by (ts, event_id); the
fixture drain is a single availableNow batch so the order is total
and equals the batch twin's window order. On a live multi-batch
stream the detector is exactly as order-correct as its input
arrival — the standard contract for online detectors.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

from goe_spark.queries.timeseries import (
    CUSUM_H_CENTS,
    CUSUM_K_CENTS,
    CUSUM_TARGET_CENTS,
)
from goe_spark.streaming.events import events_stream

from goe_spark.streaming.tuning import stream_state_partitions

DRIFT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
        StructField("n_onsets_up", LongType()),
        StructField("n_onsets_down", LongType()),
        StructField("max_s_up", LongType()),
        StructField("max_s_down", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("cum_up", LongType()),
        StructField("min_cum_up", LongType()),
        StructField("cum_dn", LongType()),
        StructField("max_cum_dn", LongType()),
        StructField("n", LongType()),
        StructField("onsets_up", LongType()),
        StructField("onsets_dn", LongType()),
        StructField("max_s_up", LongType()),
        StructField("max_s_dn", LongType()),
        StructField("prev_s_up", LongType()),
        StructField("prev_s_dn", LongType()),
    ]
)


def _drift_fn(key, pdf_iter, state):
    import math

    import pandas as pd

    (event_type,) = key
    if state.exists:
        (cum_up, min_cum_up, cum_dn, max_cum_dn, n,
         onsets_up, onsets_dn, max_s_up, max_s_dn,
         prev_s_up, prev_s_dn) = state.get
    else:
        cum_up = cum_dn = 0
        min_cum_up = max_cum_dn = 0
        n = onsets_up = onsets_dn = max_s_up = max_s_dn = 0
        prev_s_up = prev_s_dn = 0

    # CONCATENATE the per-key chunks before sorting: a multi-file
    # source delivers several pandas chunks per key per batch, in
    # arbitrary, range-interleaved order — sorting each chunk
    # independently silently breaks the sequential statistic (caught
    # by sf1 hash parity: 8-file events table, onset counts diverged
    # from the batch twin).
    pdfs = list(pdf_iter)
    if pdfs:
        batch = pd.concat(pdfs).sort_values(["ts", "event_id"])
        for v in batch["value"]:
            cents = int(math.floor(v * 100 + 0.5))
            cum_up += cents - CUSUM_TARGET_CENTS - CUSUM_K_CENTS
            cum_dn += cents - CUSUM_TARGET_CENTS + CUSUM_K_CENTS
            min_cum_up = min(min_cum_up, cum_up)
            max_cum_dn = max(max_cum_dn, cum_dn)
            s_up = cum_up - min(min_cum_up, 0)
            s_dn = max(max_cum_dn, 0) - cum_dn
            if s_up > CUSUM_H_CENTS and prev_s_up <= CUSUM_H_CENTS:
                onsets_up += 1
            if s_dn > CUSUM_H_CENTS and prev_s_dn <= CUSUM_H_CENTS:
                onsets_dn += 1
            max_s_up = max(max_s_up, s_up)
            max_s_dn = max(max_s_dn, s_dn)
            prev_s_up, prev_s_dn = s_up, s_dn
            n += 1

    state.update(
        (cum_up, min_cum_up, cum_dn, max_cum_dn, n,
         onsets_up, onsets_dn, max_s_up, max_s_dn,
         prev_s_up, prev_s_dn)
    )
    yield pd.DataFrame(
        {
            "event_type": [event_type],
            "n_events": [n],
            "n_onsets_up": [onsets_up],
            "n_onsets_down": [onsets_dn],
            "max_s_up": [max_s_up],
            "max_s_down": [max_s_dn],
        }
    )


def drift_summary_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the events stream through the stateful detector
    (availableNow -> memory sink) and return the LATEST summary row
    per event type (one per key on a single-batch drain; max-n per
    key if the source delivered multiple batches)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    stream = events_stream(spark, sf_dir)
    summaries = (
        stream.select("event_type", "ts", "event_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _drift_fn,
            outputStructType=DRIFT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
    sink = f"drift_{uuid.uuid4().hex[:8]}"
    # state-store partition count is captured at start(); see streaming/tuning.py
    with stream_state_partitions(spark):
        q = (
            summaries.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    t = spark.table(sink)
    w = Window.partitionBy("event_type").orderBy(F.col("n_events").desc())
    return (
        t.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
