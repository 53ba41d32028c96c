"""Streaming DOCUMENT ingest — model inference on arrival.

Additive scope over the reference (its transport is batch-only): the
quality-classifier scoring stage (functions/classifier.py) applied as
documents land, the production shape where a crawl's output is scored
continuously and routing decisions (keep / quarantine) happen before
anything is persisted downstream. The scoring fold is STATELESS
map-side work inside the micro-batch — the same plan-literal weight
broadcast as the batch path, so stream and batch scores are
bit-identical (the correctness oracle is the plain batch group-by).

At 100 TB/day each micro-batch is one projection + a lang-grain
aggregate; the only state Structured Streaming keeps is the running
aggregate (lang-cardinality rows).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from goe_spark.streaming.tuning import stream_state_partitions

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the documents parquet — same
    directory-vs-single-file handling as streaming/events.py's
    events_stream (pathGlobFilter matches FILES only)."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    table_path = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(table_path):
        return reader.parquet(table_path)
    return reader.option("pathGlobFilter", "documents.parquet").parquet(
        sf_dir
    )


def classifier_scored_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-language classifier scoring of the document stream,
    drained with availableNow into a memory sink: docs, keeps
    (logit > 0), strong keeps (> 500 milli), exact logit sum.
    Complete output mode on finite input equals the batch group-by —
    the oracle — iff the stream-side fold scores every doc exactly
    once with the identical fixed-point arithmetic."""
    from goe_spark.functions.classifier import classifier_logit_milli

    stream = documents_stream(spark, sf_dir)
    agg = (
        stream.select(
            "lang", classifier_logit_milli(F.col("text")).alias("logit")
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("logit") > 0).cast("long")).alias("n_keep"),
            F.sum((F.col("logit") > 500).cast("long")).alias("n_strong"),
            F.sum("logit").alias("sum_logit_milli"),
        )
    )
    sink = f"cls_stream_{uuid.uuid4().hex[:8]}"
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


def _spread_doc_stream(
    spark: SparkSession, stream: DataFrame, sf_dir: str
) -> DataFrame:
    """Parallelize CPU-heavy map work over a SINGLE-FILE document
    stream: the file-stream source never splits inside a file, so the
    fixture's one-parquet table arrives as ONE input partition and
    every per-row expression (the PII regex counters: measured ~2.5 s
    serial at sf0.1) runs on one core before the tiny state
    aggregate. Repartition by doc_id across the cores in that case
    only — a multi-file directory source (the 100 TB shape, where
    each micro-batch already holds many file splits) passes through
    untouched, so no text bytes are ever shuffled at scale."""
    if os.path.isdir(os.path.join(sf_dir, "documents.parquet")):
        return stream
    return stream.repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )


def pii_quarantine_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII ROUTING at ingest — the quarantine gate a compliant
    pipeline runs before anything lands in the corpus: each arriving
    document is scanned for email/phone/IPv4 (the same codegen'd
    regex counters as queries/pii.py, over the same deterministic
    augmented-text fixture), and the stream reports per source how
    many docs routed CLEAN vs QUARANTINE plus the per-kind entity
    counts the redaction queue will face. Stateless map inside the
    micro-batch + a running source-cardinality aggregate — the only
    state Structured Streaming keeps. Complete mode on finite input
    equals the batch scan (the oracle) iff every doc was scanned
    exactly once."""
    from goe_spark.queries.pii import (
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
        augmented_text,
        pii_count,
    )

    stream = _spread_doc_stream(
        spark, documents_stream(spark, sf_dir), sf_dir
    ).withColumn("aug", augmented_text())
    e = pii_count("aug", EMAIL_RE)
    p = pii_count("aug", PHONE_RE)
    i = pii_count("aug", IPV4_RE)
    any_pii = (e + p + i) > 0
    agg = stream.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(any_pii.cast("long")).alias("n_quarantined"),
        F.sum((~any_pii).cast("long")).alias("n_clean"),
        F.sum(e).alias("n_emails"),
        F.sum(p).alias("n_phones"),
        F.sum(i).alias("n_ips"),
    )
    sink = f"pii_stream_{uuid.uuid4().hex[:8]}"
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
