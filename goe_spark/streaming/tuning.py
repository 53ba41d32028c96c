"""Streaming state-store sizing.

A stateful Structured Streaming query creates ONE state-store
partition per ``spark.sql.shuffle.partitions`` captured at query
start — AQE never re-plans a streaming query, so unlike the batch
path there is no runtime coalescing, and every micro-batch pays a
fixed open/commit cost PER PARTITION (version files, delta files,
maintenance) regardless of how little state it holds. The right
number is a function of STATE SIZE (keep partitions in the
tens-of-MB range each), not of core count: the fixture streams carry
between ~5 rows (lang/source-grain aggregates) and ~100k tiny rows
(event-id dedup) of state, where 8 partitions is already generous —
32 partitions spent 2-4 s/micro-batch on state machinery for 5-row
state (measured on the bench box; 8 partitions halves the drain).

``GOE_STREAM_STATE_PARTITIONS`` overrides for real deployments: a
100 TB/day ingest with billions of dedup keys sizes this to
state_bytes / ~64 MB, exactly how ``spark.sql.shuffle.partitions``
is sized for batch shuffles. The default stays fixed across core
counts, so the driver's scaling runs compare like for like.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

STREAM_STATE_PARTITIONS = int(
    os.environ.get("GOE_STREAM_STATE_PARTITIONS", "8")
)


@contextmanager
def stream_state_partitions(spark):
    """Scope ``spark.sql.shuffle.partitions`` down to the streaming
    state-partition count while a streaming query is DEFINED AND
    STARTED (the count is captured at start and persisted in the
    checkpoint); restores the session value afterwards so batch plans
    are untouched."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(STREAM_STATE_PARTITIONS)
    )
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
