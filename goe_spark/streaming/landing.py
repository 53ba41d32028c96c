"""Continuous raw-file landing with corrupt-record quarantine — the
streaming twin of sources/ingest_files.

A crawl/vendor drop directory fills with JSONL (or CSV) files over
time; this runs the SAME explicit-schema PERMISSIVE parse as the
batch landing (sources/ingest_files.parse_lines — one definition of
"corrupt") as a Structured Streaming file source, splitting each
micro-batch into good parquet and quarantined raw lines.

Exactly-once contract, composed from existing pieces:
- the file source's checkpoint guarantees each input file enters
  exactly one micro-batch;
- each batch writes to per-batch directories with overwrite + the
  BatchLedger (streaming/ingest.py) committing afterwards, so a crash
  between data write and ledger commit re-delivers into the SAME
  directories — idempotent without sink transactions, the identical
  contract the continuous offload sink proves.

At 100 TB/day this is the landing topology: the parse is codegen'd
expressions riding the file scan, no shuffle at all; good/quarantine
splits are two filtered writes off one persisted batch.

Run with trigger(availableNow=True) to drain a backlog and stop (the
test/batch-parity mode) or leave unbounded on a live drop directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from goe_spark.sources.ingest_files import CORRUPT_COL, parse_lines
from goe_spark.streaming.ingest import BatchLedger, _batch_dir, _sorted_batches


def make_landing_sink(
    good_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    metadata_dir: str,
    owner: str = "default",
    table: str = "landing",
    transform=None,
):
    """foreachBatch sink, exposed so the re-delivery contract is
    directly testable: calling it twice with one batch_id — with or
    without the ledger commit surviving — leaves exactly one copy.

    ``transform`` (DataFrame -> DataFrame) runs on the GOOD rows of
    each batch before they land — the hook where a deployment composes
    the curation expressions (queries/pii.redact_pii, gopher_keep)
    into the landing stream itself, so PII never reaches the landed
    table. It must be deterministic: a re-delivered batch re-runs it
    and overwrites the same directory."""
    ledger = BatchLedger(metadata_dir, owner, table, checkpoint_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if int(batch_id) in ledger.committed():
            return
        batch_df.persist()
        try:
            good = batch_df.where(F.col(CORRUPT_COL).isNull()).drop(
                CORRUPT_COL, "_source_file"
            )
            if transform is not None:
                good = transform(good)
            bad = batch_df.where(F.col(CORRUPT_COL).isNotNull()).select(
                F.col(CORRUPT_COL).alias("raw_record"), "_source_file"
            )
            good.write.mode("overwrite").parquet(
                _batch_dir(good_dir, batch_id)
            )
            if bad.limit(1).count():
                bad.write.mode("overwrite").json(
                    _batch_dir(quarantine_dir, batch_id)
                )
            ledger.commit(batch_id)
        finally:
            batch_df.unpersist()

    return sink


def ingest_stream_with_quarantine(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    good_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    metadata_dir: str,
    fmt: str = "json",
    available_now: bool = True,
    transform=None,
    **options: str,
):
    """Start (and with ``available_now`` drain) the landing stream.
    Returns the StreamingQuery (terminated when available_now)."""
    raw = spark.readStream.text(input_dir)
    parsed = parse_lines(raw, schema, fmt=fmt, **options)
    sink = make_landing_sink(
        good_dir, quarantine_dir, checkpoint_dir, metadata_dir,
        transform=transform,
    )
    writer = (
        parsed.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        from goe_spark.streaming.progress import record_stream_progress

        record_stream_progress(q, metadata_dir, "default", "landing")
    else:  # pragma: no cover - live deployment mode
        q = writer.start()
    return q


def read_landed(spark: SparkSession, good_dir: str) -> DataFrame | None:
    """All landed good rows across batches (None before any batch)."""
    batches = _sorted_batches(good_dir) if os.path.isdir(good_dir) else []
    if not batches:
        return None
    dfs = [
        spark.read.parquet(os.path.join(good_dir, d)) for _, d in batches
    ]
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def read_quarantined(
    spark: SparkSession, quarantine_dir: str
) -> DataFrame | None:
    batches = (
        _sorted_batches(quarantine_dir)
        if os.path.isdir(quarantine_dir)
        else []
    )
    if not batches:
        return None
    dfs = [
        spark.read.json(os.path.join(quarantine_dir, d)) for _, d in batches
    ]
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out
