"""Materialized segment-fingerprint index — the standing-corpus side
of incremental boilerplate detection.

Boilerplate-segment dedup (queries/pipeline_ops.segment_dedup_stats)
fingerprints every SEG_WORDS-word segment of every document. For a
standing corpus those fingerprints are a pure function of the text,
so recomputing them on every ingest batch throws away O(corpus) md5
work. This module persists the (doc_id, source, fp, n_seg) table once
per source fingerprint — the same discipline operators/ivf.py and
operators/minhash_index.py follow:

- segments/: parquet at (doc, fp) grain; probe-side readers prune to
  (doc_id, fp) — 16 bytes a row, no text;
- _INDEX_META.json: source fingerprint + layout version; a changed
  source rebuilds (ensure_segment_index);
- append_segments: a new batch computes only ITS fingerprints and
  appends — O(batch) maintenance, bit-identical to a full rebuild
  because per-doc segment fingerprints are independent.

At 100 TB the incremental cost structure becomes: one-time O(corpus)
build, then per-batch O(batch) fingerprinting + one join whose corpus
side is a column-pruned fp scan with map-side partial counting.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.functions.hashing import hash64
from goe_spark.operators.ivf import _REPO_ROOT, _source_fingerprint

INDEX_ROOT = os.path.join(_REPO_ROOT, "spark-warehouse", "segment_index")
INDEX_VERSION = 1

SEG_WORDS = 8  # segment width for boilerplate detection


def segment_fp_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, source, fp, n_seg) at (doc, fp) grain for any
    documents frame (doc_id, source, text): non-overlapping SEG_WORDS
    word segments, 60-bit cross-engine fingerprints
    (functions/hashing.hash64), duplicate segments within a doc
    collapsed with their count. The ONE canonical segment lineage —
    the all-corpus query, the index build and the probe all read it,
    so indexed values are bit-identical to the DuckDB oracle's."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    with_toks = docs.select("doc_id", "source", toks.alias("w"))
    n_seg = F.ceil(F.size("w") / F.lit(SEG_WORDS)).cast("int")
    segs = with_toks.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_seg - 1),
                lambda i: F.concat_ws(
                    " ", F.slice("w", i * SEG_WORDS + 1, SEG_WORDS)
                ),
            )
        ).alias("seg"),
    ).select("doc_id", "source", hash64(F.col("seg")).alias("fp"))
    return segs.groupBy("doc_id", "source", "fp").agg(
        F.count(F.lit(1)).alias("n_seg")
    )


def build_segment_index(
    spark: SparkSession, docs: DataFrame, index_dir: str
) -> None:
    from goe_spark.operators.index_maintenance import clear_tombstones

    os.makedirs(index_dir, exist_ok=True)
    clear_tombstones(index_dir)  # a fresh build hides nothing
    segment_fp_frame(docs).write.mode("overwrite").parquet(
        os.path.join(index_dir, "segments")
    )


def ensure_segment_index(spark: SparkSession, sf_dir: str) -> str:
    """Build the segment index for sf_dir's documents unless a fresh
    one exists (source fingerprint + layout version match). Returns
    index_dir."""
    src = os.path.join(sf_dir, "documents.parquet")
    slug = re.sub(r"[^A-Za-z0-9._-]+", "_", sf_dir.strip("/"))
    index_dir = os.path.join(INDEX_ROOT, slug)
    meta_path = os.path.join(index_dir, "_INDEX_META.json")
    fp = _source_fingerprint(src)
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                meta = json.load(f)
            if (
                meta.get("fingerprint") == fp
                and meta.get("version") == INDEX_VERSION
            ):
                return index_dir
        except (OSError, ValueError):
            pass
    from goe_spark.catalog import load_table

    build_segment_index(
        spark, load_table(spark, sf_dir, "documents"), index_dir
    )
    with open(meta_path, "w") as f:
        json.dump(
            {"source": src, "fingerprint": fp, "version": INDEX_VERSION}, f
        )
    return index_dir


def load_segments(spark: SparkSession, index_dir: str) -> DataFrame:
    from goe_spark.operators.index_maintenance import cached_index_frame

    return cached_index_frame(spark, index_dir, "segments", "doc_id")


def append_segments(
    spark: SparkSession, index_dir: str, new_docs: DataFrame
) -> int:
    """O(batch) index maintenance: fingerprint only the new batch and
    append. Returns appended row count; meta fingerprint intentionally
    untouched so a later ensure against a grown source rebuilds."""
    segs = segment_fp_frame(new_docs)
    n = segs.count()
    segs.write.mode("append").parquet(os.path.join(index_dir, "segments"))
    return n
