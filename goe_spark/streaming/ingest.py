"""Streaming incremental offload — continuous ingest of the events
stream into a partitioned final table with the repo's own HWM
bookkeeping.

Additive scope over the reference (its offload is batch-only): the
same FINAL_LOAD semantics the batch pipeline applies (synthetic
partition column, partitioned append), driven by Structured Streaming
micro-batches via foreachBatch.

Exactly-once into a non-transactional sink: Structured Streaming's
checkpoint guarantees each micro-batch is DELIVERED at least once with
a stable batch_id (after a crash the last batch may be re-delivered).
The sink therefore records committed batch_ids in a JSON ledger next
to the metadata and skips re-deliveries — the standard idempotent-
foreachBatch pattern — making append-to-parquet effectively
exactly-once. The HWM (max partition key seen) is folded into the
offload metadata store after each batch, so the status report and a
later batch offload see the streamed table exactly like a batch-
offloaded one.

At 100 TB/day the plan per micro-batch is map-side only (projection +
partitioned write, no shuffle unless the sink repartitions); state is
one ledger write per batch on the driver.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from goe_spark.functions.synthetic import synthetic_date_expr
from goe_spark.plans.metadata import MetadataStore, OffloadMetadata
from goe_spark.plans.offload import SYNTHETIC_COL
from goe_spark.streaming.events import events_stream


class BatchLedger:
    """Committed micro-batch ids for one streaming sink, persisted
    atomically. Keyed by checkpoint dir so a NEW checkpoint (batch ids
    restart at 0) gets a fresh ledger instead of wrongly skipping."""

    def __init__(self, metadata_dir: str, owner: str, table: str, checkpoint_dir: str):
        import hashlib

        key = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]
        self.path = os.path.join(
            metadata_dir, f"{owner}.{table}.stream_batches.{key}.json".lower()
        )
        os.makedirs(metadata_dir, exist_ok=True)

    def committed(self) -> set[int]:
        if not os.path.exists(self.path):
            return set()
        with open(self.path) as fh:
            return set(json.load(fh))

    def commit(self, batch_id: int) -> None:
        ids = self.committed() | {int(batch_id)}
        d = os.path.dirname(self.path)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as fh:
                json.dump(sorted(ids), fh)
            os.replace(tmp, self.path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise


def stream_offload_events(
    spark: SparkSession,
    sf_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    metadata_dir: str,
    owner: str = "default",
    granularity: str = "M",
) -> int:
    """Drain the events stream into a day/month-partitioned final
    table (availableNow trigger; on a live cluster the same code runs
    unbounded). Returns rows written this run. Re-running with the
    same checkpoint writes nothing (source-side progress) and a
    re-delivered batch is skipped by the ledger (sink-side guard)."""
    table = "events"
    ledger = BatchLedger(metadata_dir, owner, table, checkpoint_dir)
    store = MetadataStore(metadata_dir)

    def sink(batch_df, batch_id: int) -> None:
        if int(batch_id) in ledger.committed():
            return  # crash re-delivery — already appended
        out = batch_df.withColumn(
            SYNTHETIC_COL, synthetic_date_expr("ts", granularity)
        )
        out.write.mode("append").partitionBy(SYNTHETIC_COL).parquet(target_dir)
        hwm = out.agg(F.max(SYNTHETIC_COL)).first()[0]
        md = store.get(owner, table) or OffloadMetadata(
            owner=owner, table_name=table
        )
        md.offload_type = "RANGE"
        md.incremental_key = "ts"
        if hwm is not None and (
            md.incremental_high_value is None
            or str(hwm) > str(md.incremental_high_value)
        ):
            md.incremental_high_value = hwm
        md.synthetic_partition = {
            "source_column": "ts",
            "kind": "date",
            "granularity": granularity,
            "digits": None,
        }
        store.save(md)
        ledger.commit(batch_id)

    stream = events_stream(spark, sf_dir)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.exists(target_dir):
        return 0
    return spark.read.parquet(target_dir).count()
