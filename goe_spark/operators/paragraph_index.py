"""Materialized paragraph-grain MinHash index — the standing-corpus
side of sub-document dedup (queries/dedup.py paragraph family).

Paragraph signatures are a pure function of the text (PARA_WORDS-word
chunks -> word-3-gram shingles -> K-permutation MinHash), so for a
standing corpus they are persisted ONCE per source fingerprint — the
exact discipline the doc-grain signature index (operators/
minhash_index.py), the segment index and the IVF index follow:

- paragraphs/: parquet (doc_id, lang, n_paras, idx, signed, mh)
  — one row per paragraph INCLUDING sub-shingle-width ones (mh NULL),
  so doc-level reconstruction accounting (n_paras, full-dup docs)
  rebuilds entirely from the index without touching text.
- _INDEX_META.json: source fingerprint + layout version; a changed
  source or layout rebuilds, mirroring ivf.ensure_index.
- append_paragraphs: new batches compute only THEIR signatures and
  append — O(batch); per-paragraph rows are independent, so the
  appended index is bit-identical to a full rebuild over the grown
  corpus. The meta fingerprint is NOT updated on append: a later
  ensure against a grown source correctly rebuilds.
- upsert/evict ride the shared tombstone/override side stores
  (operators/index_maintenance.py) keyed on doc_id — a doc's
  paragraphs live and die together.

At 100 TB the probe's cost becomes: one-time O(corpus) build, then
per-increment O(batch) signature computation + a band join whose
corpus side reads (doc_id, idx, mh) only — no text ever re-shingles.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

from goe_spark.operators.ivf import _REPO_ROOT, _source_fingerprint

INDEX_ROOT = os.path.join(_REPO_ROOT, "spark-warehouse", "paragraph_index")
# v2 adds the cheap `signed` column (pre-hashing shingle-ability
# flag) so LSH consumers never filter on mh IS NOT NULL — that
# predicate inlines the md5 signature lineage into a Filter
INDEX_VERSION = 2


def paragraph_sig_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, n_paras, idx, mh) for any documents frame —
    the ONE canonical paragraph lineage (queries/dedup.py
    `_paragraph_sigs`), so indexed values are bit-identical to the
    recompute-everything queries and the DuckDB oracle."""
    from goe_spark.queries.dedup import _paragraph_sigs

    return _paragraph_sigs(docs.sparkSession, "", docs=docs)


def build_paragraph_index(
    spark: SparkSession, docs: DataFrame, index_dir: str
) -> None:
    from goe_spark.operators.index_maintenance import clear_tombstones

    os.makedirs(index_dir, exist_ok=True)
    clear_tombstones(index_dir)  # a fresh build hides nothing
    paragraph_sig_frame(docs).write.mode("overwrite").parquet(
        os.path.join(index_dir, "paragraphs")
    )


def ensure_paragraph_index(spark: SparkSession, sf_dir: str) -> str:
    """Build the paragraph index for sf_dir's documents unless a
    fresh one exists (source fingerprint + layout version match).
    Returns index_dir."""
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

    build_paragraph_index(
        spark, load_table(spark, sf_dir, "documents"), index_dir
    )
    with open(meta_path, "w") as f:
        json.dump(
            {"source": src, "fingerprint": fp, "version": INDEX_VERSION}, f
        )
    return index_dir


def load_paragraphs(spark: SparkSession, index_dir: str) -> DataFrame:
    from goe_spark.operators.index_maintenance import cached_index_frame

    return cached_index_frame(spark, index_dir, "paragraphs", "doc_id")


def load_paragraphs_raw(spark: SparkSession, index_dir: str) -> DataFrame:
    """The paragraphs base relation WITHOUT tombstone/override
    maintenance state — what a fresh build wrote from the source
    text. For recompute-from-text audits only; regular consumers
    want load_paragraphs."""
    from goe_spark.operators.index_maintenance import (
        cached_index_frame_raw,
    )

    return cached_index_frame_raw(spark, index_dir, "paragraphs")


def append_paragraphs(
    spark: SparkSession, index_dir: str, new_docs: DataFrame
) -> int:
    """O(batch) index maintenance: signature only the new batch and
    append. Returns appended row count; meta fingerprint intentionally
    untouched so a later ensure against a grown source rebuilds."""
    sigs = paragraph_sig_frame(new_docs)
    n = sigs.count()
    sigs.write.mode("append").parquet(os.path.join(index_dir, "paragraphs"))
    return n
