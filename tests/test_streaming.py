"""Streaming operators: the applyInPandasWithState sessionizer must
agree with its batch twin on every CLOSED session (open sessions stay
in state at drain time — correct streaming semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from goe_spark.catalog import load_table
from goe_spark.queries.streaming_batch import sessionization_stats
from goe_spark.streaming.events import sessionize_stream, windowed_event_counts
from tests.conftest import SF_SMALL


def test_windowed_counts_equal_batch(spark):
    got = windowed_event_counts(spark, SF_SMALL)
    # Build the batch oracle from catalog.load_table so it follows the
    # fixture's ts encoding (nanos-long vs TIMESTAMP_NTZ) instead of
    # hard-coding one conversion.
    batch = (
        load_table(spark, SF_SMALL, "events")
        .groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    assert got.count() == batch.count()
    assert (
        got.exceptAll(batch.select(*got.columns)).count() == 0
    ), "streaming result differs from batch"


def test_sessionizer_matches_batch_closed_sessions(spark, tmp_path):
    streamed = sessionize_stream(spark, SF_SMALL, str(tmp_path / "ckpt"))
    batch = sessionization_stats(spark, SF_SMALL)

    # The stream can't close each user's final session (no more data
    # arrives before the drain stops) — drop the last session per user
    # from the batch result before comparing.
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id")
    batch_closed = (
        batch.withColumn("max_sid", F.max("session_id").over(w))
        .where(F.col("session_id") != F.col("max_sid"))
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
    )
    streamed_cmp = streamed.select(
        "user_id", "session_start", "session_end", "n_events", "total_value"
    )
    assert streamed_cmp.count() == batch_closed.count()
    assert streamed_cmp.exceptAll(batch_closed).count() == 0
    assert batch_closed.exceptAll(streamed_cmp).count() == 0
