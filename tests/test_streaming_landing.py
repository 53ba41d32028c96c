"""Continuous raw-file landing (streaming/landing.py): batch parity,
incremental file pickup, and re-delivery idempotence."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from goe_spark.sources.ingest_files import CORRUPT_COL, read_with_quarantine
from goe_spark.streaming.landing import (
    ingest_stream_with_quarantine,
    make_landing_sink,
    read_landed,
    read_quarantined,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def _write_file(d, name, records, bad_lines=()):
    with open(os.path.join(d, name), "w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
        for line in bad_lines:
            f.write(line + "\n")


def _dirs(tmp_path):
    indir = tmp_path / "in"
    indir.mkdir()
    return (
        str(indir),
        str(tmp_path / "good"),
        str(tmp_path / "quar"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "meta"),
    )


def test_stream_matches_batch_and_picks_up_new_files(spark, tmp_path):
    indir, good, quar, ckpt, meta = _dirs(tmp_path)
    _write_file(
        indir,
        "a.jsonl",
        [{"doc_id": 1, "text": "x", "lang": "en"}],
        bad_lines=["broken {"],
    )
    ingest_stream_with_quarantine(
        spark, indir, SCHEMA, good, quar, ckpt, meta
    )
    assert read_landed(spark, good).count() == 1
    assert read_quarantined(spark, quar).count() == 1

    # batch parity on the same input
    batch = read_with_quarantine(spark, indir, SCHEMA)
    assert batch.where(F.col(CORRUPT_COL).isNull()).count() == 1

    # a new file arrives; the SAME checkpoint processes ONLY it
    _write_file(
        indir,
        "b.jsonl",
        [
            {"doc_id": 2, "text": "y", "lang": "en"},
            {"doc_id": 3, "text": "z", "lang": "fr"},
        ],
    )
    ingest_stream_with_quarantine(
        spark, indir, SCHEMA, good, quar, ckpt, meta
    )
    landed = read_landed(spark, good)
    assert sorted(r.doc_id for r in landed.collect()) == [1, 2, 3]
    assert read_quarantined(spark, quar).count() == 1  # unchanged


def test_sink_redelivery_is_idempotent(spark, tmp_path):
    _, good, quar, ckpt, meta = _dirs(tmp_path)
    sink = make_landing_sink(good, quar, ckpt, meta)
    batch = spark.createDataFrame(
        [(1, "x", "en", None, "f1"), (None, None, None, "raw junk", "f1")],
        f"doc_id long, text string, lang string, {CORRUPT_COL} string, _source_file string",
    )
    sink(batch, 0)
    sink(batch, 0)  # ledgered re-delivery: no-op
    assert read_landed(spark, good).count() == 1
    assert read_quarantined(spark, quar).count() == 1

    # crash BETWEEN data write and ledger commit: wipe the ledger and
    # re-deliver — same directory overwritten, still one copy
    ledger_files = [f for f in os.listdir(meta) if "stream_batches" in f]
    for f in ledger_files:
        os.remove(os.path.join(meta, f))
    sink(batch, 0)
    assert read_landed(spark, good).count() == 1
    assert read_quarantined(spark, quar).count() == 1


def test_transform_hook_redacts_at_landing(spark, tmp_path):
    """Composing redact_pii into the landing stream: PII never
    reaches the landed table."""
    from goe_spark.queries.pii import PII_KINDS, pii_count, redact_pii

    indir, good, quar, ckpt, meta = _dirs(tmp_path)
    _write_file(
        indir,
        "a.jsonl",
        [
            {"doc_id": 1, "text": "mail me x@y.zz now", "lang": "en"},
            {"doc_id": 2, "text": "clean", "lang": "en"},
        ],
    )
    ingest_stream_with_quarantine(
        spark,
        indir,
        SCHEMA,
        good,
        quar,
        ckpt,
        meta,
        transform=lambda df: df.withColumn("text", redact_pii(F.col("text"))),
    )
    landed = read_landed(spark, good)
    resid = landed.agg(
        F.sum(sum(pii_count("text", pat) for _, pat, _ in PII_KINDS))
    ).first()[0]
    assert landed.count() == 2 and resid == 0
    assert "[EMAIL]" in {r.text for r in landed.collect() if r.doc_id == 1}.pop()


def test_stream_progress_recorded_and_reported(spark, tmp_path):
    """Each drain appends a run record with the engine's own input-row
    accounting (no listener-log scraping); the report frame sums it."""
    from goe_spark.streaming.progress import stream_runs_report

    indir, good, quar, ckpt, meta = _dirs(tmp_path)
    _write_file(indir, "a.jsonl", [{"doc_id": 1, "text": "x", "lang": "en"}])
    ingest_stream_with_quarantine(spark, indir, SCHEMA, good, quar, ckpt, meta)
    _write_file(indir, "b.jsonl", [{"doc_id": 2, "text": "y", "lang": "en"}])
    ingest_stream_with_quarantine(spark, indir, SCHEMA, good, quar, ckpt, meta)

    rep = stream_runs_report(spark, meta, "default", "landing")
    rows = rep.collect()
    assert len(rows) == 2
    assert sum(r.total_input_rows for r in rows) == 2
    assert all(r.n_batches >= 1 for r in rows)
