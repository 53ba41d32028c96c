"""Streaming-run observability: persist per-drain micro-batch progress
(the engine's own StreamingQuery progress JSON — rows in, batch
duration) into the metadata store, and expose it as a report frame.

The reference learns row throughput by scraping per-task
recordsWritten JSON a Scala listener logs (GOETaskListener.scala:
24-44); Structured Streaming hands the same accounting to the driver
natively via query.recentProgress — no listener jar, no log regex.
Each drain APPENDS one run record, so the report shows throughput
history across runs of the same stream.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Row, SparkSession

from goe_spark.plans.metadata import atomic_write_json


def _stats_path(metadata_dir: str, owner: str, table: str) -> str:
    return os.path.join(
        metadata_dir, f"{owner}.{table}.stream_runs.json".lower()
    )


def record_stream_progress(
    query, metadata_dir: str, owner: str, table: str
) -> dict:
    """Append one run record built from a (terminated or running)
    StreamingQuery's recentProgress. Returns the record."""
    batches = []
    for p in query.recentProgress:
        prog = p if isinstance(p, dict) else json.loads(p.json)
        batches.append(
            {
                "batch_id": prog.get("batchId"),
                "num_input_rows": prog.get("numInputRows", 0),
                "duration_ms": (prog.get("durationMs") or {}).get(
                    "triggerExecution"
                ),
            }
        )
    rec = {
        "run_id": query.runId.__str__(),
        "n_batches": len(batches),
        "total_input_rows": sum(b["num_input_rows"] for b in batches),
        "batches": batches,
    }
    path = _stats_path(metadata_dir, owner, table)
    os.makedirs(metadata_dir, exist_ok=True)
    runs = []
    if os.path.exists(path):
        with open(path) as fh:
            runs = json.load(fh)
    runs.append(rec)
    atomic_write_json(path, runs, indent=None)
    return rec


def stream_runs_report(
    spark: SparkSession, metadata_dir: str, owner: str, table: str
) -> DataFrame:
    """One row per recorded run: batches, rows, total duration."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("run_id", StringType()),
            StructField("n_batches", LongType()),
            StructField("total_input_rows", LongType()),
            StructField("total_duration_ms", LongType()),
        ]
    )
    path = _stats_path(metadata_dir, owner, table)
    rows = []
    if os.path.exists(path):
        with open(path) as fh:
            for rec in json.load(fh):
                rows.append(
                    Row(
                        run_id=rec["run_id"],
                        n_batches=int(rec["n_batches"]),
                        total_input_rows=int(rec["total_input_rows"]),
                        total_duration_ms=sum(
                            int(b["duration_ms"] or 0)
                            for b in rec["batches"]
                        ),
                    )
                )
    return spark.createDataFrame(rows, schema)
