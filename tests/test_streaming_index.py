"""Continuous dedup-index maintenance (streaming/index_stream.py):
streamed batches keep the signature index bit-identical to a full
rebuild over the evolving corpus; re-delivery is idempotent with AND
without the ledger commit surviving."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from goe_spark.catalog import load_table
from tests.conftest import SF_SMALL

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("text", StringType()),
    ]
)


@pytest.fixture()
def corpus(spark, tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    os.makedirs(corpus_dir)
    load_table(spark, SF_SMALL, "documents").write.parquet(
        os.path.join(corpus_dir, "documents.parquet")
    )
    return corpus_dir


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_stream_maintains_index_bit_identical(spark, corpus, tmp_path):
    from goe_spark.operators.minhash_index import (
        build_signature_index,
        ensure_signature_index,
        load_signatures,
    )
    from goe_spark.streaming.index_stream import (
        maintain_signature_index_stream,
    )

    idx = ensure_signature_index(spark, corpus)
    in_dir = str(tmp_path / "incoming")
    os.makedirs(in_dir)
    base = load_table(spark, SF_SMALL, "documents")
    some_id = base.select(F.min("doc_id")).first()[0]
    # batch 1: one CHANGED doc + one new; batch 2: another new doc
    _write_jsonl(
        os.path.join(in_dir, "b1.jsonl"),
        [
            {
                "doc_id": int(some_id),
                "lang": "en",
                "source": "web",
                "text": "completely rewritten body with fresh words "
                "alpha beta gamma delta epsilon zeta",
            },
            {
                "doc_id": 900_001,
                "lang": "en",
                "source": "web",
                "text": "a brand new streamed document about spark "
                "structured streaming index maintenance",
            },
        ],
    )
    _write_jsonl(
        os.path.join(in_dir, "b2.jsonl"),
        [
            {
                "doc_id": 900_002,
                "lang": "de",
                "source": "wiki",
                "text": "noch ein dokument aus dem stream mit "
                "eigenen woertern und genug tokens",
            }
        ],
    )
    q = maintain_signature_index_stream(
        spark,
        in_dir,
        DOC_SCHEMA,
        idx,
        str(tmp_path / "ckpt"),
        str(tmp_path / "md"),
    )
    q.awaitTermination(120)

    # ground truth: a fresh full build over the post-stream corpus
    changed = spark.read.schema(DOC_SCHEMA).json(in_dir)
    merged = (
        base.select("doc_id", "lang", "source", "text")
        .join(changed.select("doc_id"), "doc_id", "left_anti")
        .unionByName(changed)
    )
    rebuilt_dir = idx + "_stream_rebuilt"
    build_signature_index(spark, merged, rebuilt_dir)
    rebuilt = spark.read.parquet(os.path.join(rebuilt_dir, "signatures"))
    sigs = load_signatures(spark, idx)
    assert sigs.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(sigs).count() == 0


def test_sink_redelivery_idempotent(spark, corpus, tmp_path):
    from goe_spark.operators.minhash_index import (
        ensure_signature_index,
        load_signatures,
    )
    from goe_spark.streaming.index_stream import (
        make_index_maintenance_sink,
    )

    idx = ensure_signature_index(spark, corpus)
    sink = make_index_maintenance_sink(
        idx, str(tmp_path / "ck"), str(tmp_path / "md")
    )
    batch = spark.createDataFrame(
        [
            (
                900_100,
                "en",
                "web",
                "idempotence test document with enough distinct tokens",
            )
        ],
        DOC_SCHEMA,
    )
    def one():
        # re-read per assertion: an overrides rewrite replaces files,
        # invalidating previously planned readers (same contract as
        # compaction/delete for any file-based table)
        return load_signatures(spark, idx).where(
            F.col("doc_id") == 900_100
        )

    sink(batch, 0)
    first = one().collect()
    assert len(first) == 1
    # ledger intact: second delivery is a no-op
    sink(batch, 0)
    assert one().count() == 1
    # ledger LOST: upsert converges to the same single copy
    for f in os.listdir(str(tmp_path / "md")):
        os.remove(os.path.join(str(tmp_path / "md"), f))
    sink(batch, 0)
    again = one().collect()
    assert again == first


def test_vector_sink_upserts_and_probes(spark, tmp_path):
    """Streamed embedding batches land in the IVF index and probe
    identically to build-time vectors (assignment against the
    persisted quantizer); re-delivery converges."""
    from goe_spark.operators.ivf import ensure_index, load_assigned
    from goe_spark.streaming.index_stream import make_vector_index_sink

    corpus_dir = str(tmp_path / "vcorpus")
    os.makedirs(corpus_dir)
    load_table(spark, SF_SMALL, "embeddings").write.parquet(
        os.path.join(corpus_dir, "embeddings.parquet")
    )
    idx = ensure_index(spark, corpus_dir)
    sink = make_vector_index_sink(
        idx, str(tmp_path / "ck"), str(tmp_path / "md")
    )
    vec = (
        load_table(spark, SF_SMALL, "embeddings")
        .orderBy("vec_id")
        .limit(1)
        .select(
            (F.col("vec_id") + 800_000).alias("vec_id"),
            F.transform(
                "embedding", lambda x: (x * 1.01).cast("float")
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    sink(vec, 0)
    got = (
        load_assigned(spark, idx)
        .where(F.col("vec_id") >= 800_000)
        .collect()
    )
    assert len(got) == 1 and got[0].cell is not None
    # re-delivery with lost ledger: still exactly one copy
    for f in os.listdir(str(tmp_path / "md")):
        os.remove(os.path.join(str(tmp_path / "md"), f))
    sink(vec, 0)
    assert (
        load_assigned(spark, idx)
        .where(F.col("vec_id") >= 800_000)
        .count()
        == 1
    )
