"""Continuous dedup-index maintenance — Structured Streaming keeps
the materialized MinHash signature index current as document batches
arrive, so the incremental near-dup probe (minhash_probe_new_docs)
always runs against an up-to-date corpus side without ever paying a
full rebuild.

Shape: readStream over a landing directory -> foreachBatch ->
``upsert_signatures`` (operators/index_maintenance). Upsert is the
right primitive for a stream, not plain append, for two reasons:

- a re-delivered micro-batch is IDEMPOTENT by construction even when
  the ledger commit was lost: the second run tombstones the same keys
  (tombstones are a set at read time) and rewrites the same rows into
  the overrides store — the index state converges to exactly one copy;
- a stream may legitimately re-ship a changed document (the CDC /
  re-crawl case); append-only maintenance would serve BOTH versions.

The BatchLedger fast-path (streaming/ingest.py) skips batches whose
commit survived, so steady-state cost is O(batch) signature
computation + one small overrides rewrite — the same cost profile as
the batch upsert, now driven by a stream.

At 100 TB: per-batch work is bounded by the micro-batch size; the
standing index is never rewritten; tombstone/override growth is
O(total changed) and is cleared by the next scheduled full rebuild
(ensure_signature_index on a changed source fingerprint), the same
compaction split Faiss/Milvus-style deployments run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from goe_spark.operators.index_maintenance import upsert_signatures
from goe_spark.streaming.ingest import BatchLedger


def make_index_maintenance_sink(
    index_dir: str,
    checkpoint_dir: str,
    metadata_dir: str,
    owner: str = "default",
    table: str = "minhash_index",
):
    """foreachBatch sink, exposed so the re-delivery contract is
    directly testable (the landing-sink pattern)."""
    ledger = BatchLedger(metadata_dir, owner, table, checkpoint_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if int(batch_id) in ledger.committed():
            return
        upsert_signatures(
            batch_df.sparkSession, index_dir, batch_df
        )
        ledger.commit(batch_id)

    return sink


def maintain_signature_index_stream(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    index_dir: str,
    checkpoint_dir: str,
    metadata_dir: str,
    available_now: bool = True,
):
    """Start the maintenance stream over a JSONL landing directory of
    document batches (doc_id, lang, source, text). available_now
    drains what exists and stops — the test/cron mode; a deployment
    drops it for a continuous trigger."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .json(input_dir)
    )
    writer = stream.writeStream.foreachBatch(
        make_index_maintenance_sink(
            index_dir, checkpoint_dir, metadata_dir
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def make_vector_index_sink(
    index_dir: str,
    checkpoint_dir: str,
    metadata_dir: str,
    owner: str = "default",
    table: str = "ivf_index",
):
    """The IVF twin: streamed embedding batches (vec_id, embedding)
    upsert into the materialized ANN index — assignment against the
    BUILD's persisted centroids, PQ codes against its codebooks, so a
    streamed vector probes identically to one present at build time.
    Same idempotence contract as the signature sink."""
    from goe_spark.operators.index_maintenance import upsert_vectors

    ledger = BatchLedger(metadata_dir, owner, table, checkpoint_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if int(batch_id) in ledger.committed():
            return
        upsert_vectors(batch_df.sparkSession, index_dir, batch_df)
        ledger.commit(batch_id)

    return sink
