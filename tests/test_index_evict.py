"""O(deleted) index maintenance under targeted delete
(operators/index_maintenance + plans/targeted_delete
maintain_indexes): evicted keys vanish from every index reader,
probe results are identical to a full rebuild over the shrunken
corpus, the index data files are NOT rewritten, and the bumped meta
fingerprint stops ensure_* from full-rebuilding an index the delete
pass already fixed."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from goe_spark.catalog import load_table
from goe_spark.plans.targeted_delete import delete_rows
from tests.conftest import SF_SMALL


def _file_map(d: str) -> dict[str, float]:
    out = {}
    for root, _, files in os.walk(d):
        for f in files:
            p = os.path.join(root, f)
            out[p] = os.stat(p).st_mtime_ns
    return out


@pytest.fixture()
def doc_corpus(spark, tmp_path):
    """A writable copy of sf0.001's documents, partitioned the way
    delete_rows requires, in a dir shaped like an sf_dir so the
    ensure_* index builders accept it."""
    corpus_dir = str(tmp_path / "corpus")
    os.makedirs(corpus_dir)
    path = os.path.join(corpus_dir, "documents.parquet")
    load_table(spark, SF_SMALL, "documents").withColumn(
        "goe_part_key", (F.col("doc_id") % 4).cast("int")
    ).write.partitionBy("goe_part_key").parquet(path)
    return corpus_dir, path


@pytest.fixture()
def emb_corpus(spark, tmp_path):
    corpus_dir = str(tmp_path / "vcorpus")
    os.makedirs(corpus_dir)
    path = os.path.join(corpus_dir, "embeddings.parquet")
    load_table(spark, SF_SMALL, "embeddings").withColumn(
        "goe_part_key", (F.col("vec_id") % 4).cast("int")
    ).write.partitionBy("goe_part_key").parquet(path)
    return corpus_dir, path


def test_minhash_evict_matches_rebuild_without_rewrite(
    spark, doc_corpus
):
    from goe_spark.operators.minhash_index import (
        build_signature_index,
        ensure_signature_index,
        load_signatures,
    )

    corpus_dir, path = doc_corpus
    idx = ensure_signature_index(spark, corpus_dir)
    sig_files_before = _file_map(os.path.join(idx, "signatures"))
    doomed = [
        r[0]
        for r in spark.read.parquet(path)
        .select("doc_id")
        .orderBy("doc_id")
        .limit(3)
        .collect()
    ]

    rep = delete_rows(
        spark, path, "doc_id", doomed, maintain_indexes=[idx]
    )
    assert rep.rows_deleted == 3

    # no full-index rewrite: the signature files are untouched
    assert _file_map(os.path.join(idx, "signatures")) == sig_files_before
    # the bumped fingerprint makes the next ensure a no-op
    assert ensure_signature_index(spark, corpus_dir) == idx
    assert _file_map(os.path.join(idx, "signatures")) == sig_files_before

    # evicted keys are gone from the reader
    sigs = load_signatures(spark, idx)
    assert sigs.where(F.col("doc_id").isin(doomed)).count() == 0

    # probe results identical to a FULL rebuild over the shrunken
    # corpus (per-doc signatures are independent rows)
    rebuilt_dir = idx + "_rebuilt"
    build_signature_index(
        spark, spark.read.parquet(path).drop("goe_part_key"), rebuilt_dir
    )
    rebuilt = spark.read.parquet(os.path.join(rebuilt_dir, "signatures"))
    assert sigs.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(sigs).count() == 0


def test_segment_evict_and_source_change_still_rebuilds(
    spark, doc_corpus
):
    from goe_spark.operators.segment_index import (
        ensure_segment_index,
        load_segments,
    )

    corpus_dir, path = doc_corpus
    idx = ensure_segment_index(spark, corpus_dir)
    doomed = [
        r[0]
        for r in spark.read.parquet(path)
        .select("doc_id")
        .orderBy("doc_id")
        .limit(2)
        .collect()
    ]
    delete_rows(spark, path, "doc_id", doomed, maintain_indexes=[idx])
    assert (
        load_segments(spark, idx)
        .where(F.col("doc_id").isin(doomed))
        .count()
        == 0
    )
    seg_files = _file_map(os.path.join(idx, "segments"))
    assert ensure_segment_index(spark, corpus_dir) == idx
    assert _file_map(os.path.join(idx, "segments")) == seg_files

    # a LATER non-delete source change must still trigger the full
    # rebuild — and the rebuild clears the tombstones
    extra = spark.createDataFrame(
        [(999_999, "en", "web", "brand new appended document text here")],
        ["doc_id", "lang", "source", "text"],
    ).withColumn("goe_part_key", F.lit(3))
    extra.write.mode("append").partitionBy("goe_part_key").parquet(path)
    ensure_segment_index(spark, corpus_dir)
    assert not os.path.isdir(os.path.join(idx, "tombstones"))
    assert (
        load_segments(spark, idx).where(F.col("doc_id") == 999_999).count()
        > 0
    )


def test_ivf_evict_prunes_every_indexed_consumer(spark, emb_corpus):
    from goe_spark.operators.ivf import (
        ensure_index,
        ivf_topk_indexed,
        load_assigned,
    )

    corpus_dir, path = emb_corpus
    idx = ensure_index(spark, corpus_dir)
    emb = spark.read.parquet(path).drop("goe_part_key")
    baseline = ivf_topk_indexed(spark, emb, idx).collect()
    # evict a vector that actually appears as a neighbor
    victim = next(
        r["vec_id"] for r in baseline if r["vec_id"] >= 5
    )

    assigned_files = _file_map(os.path.join(idx, "assigned"))
    delete_rows(spark, path, "vec_id", [victim], maintain_indexes=[idx])
    assert _file_map(os.path.join(idx, "assigned")) == assigned_files
    assert ensure_index(spark, corpus_dir) == idx
    assert _file_map(os.path.join(idx, "assigned")) == assigned_files

    assert (
        load_assigned(spark, idx).where(F.col("vec_id") == victim).count()
        == 0
    )
    emb_after = spark.read.parquet(path).drop("goe_part_key")
    after = ivf_topk_indexed(spark, emb_after, idx).collect()
    assert all(r["vec_id"] != victim for r in after)
    # evict+probe == probing the shrunken corpus against the SAME
    # persisted quantizer (the append_to_index contract, delete side):
    # every surviving (qid, vec_id) pair keeps its exact cosine, and
    # the victim's slots are refilled by the next-best candidates
    base_pairs = {
        (r["qid"], r["vec_id"]): r["cosine"]
        for r in baseline
        if r["vec_id"] != victim
    }
    after_pairs = {(r["qid"], r["vec_id"]): r["cosine"] for r in after}
    for k, v in base_pairs.items():
        assert after_pairs[k] == v
    assert len(after) == len(baseline)


def test_evict_requires_managed_index(spark, tmp_path):
    from goe_spark.operators.index_maintenance import evict_keys

    with pytest.raises(ValueError, match="managed index"):
        evict_keys(spark, str(tmp_path), [1, 2], "doc_id")


def test_minhash_upsert_matches_rebuild_and_delete_after_upsert(
    spark, doc_corpus
):
    """UPSERT maintenance (evict + overrides): re-indexed docs serve
    their NEW signatures, results are bit-identical to a full rebuild
    over the modified corpus, a second upsert of the same key wins,
    and a delete AFTER an upsert cannot resurrect the row through the
    overrides store."""
    from goe_spark.operators.index_maintenance import upsert_signatures
    from goe_spark.operators.minhash_index import (
        build_signature_index,
        ensure_signature_index,
        load_signatures,
    )

    corpus_dir, path = doc_corpus
    idx = ensure_signature_index(spark, corpus_dir)
    base = spark.read.parquet(path)
    victims = [r[0] for r in base.select("doc_id").orderBy("doc_id").limit(2).collect()]

    changed = (
        base.where(F.col("doc_id").isin(victims))
        .withColumn(
            "text",
            F.concat(
                F.lit("completely new text body for upsert "), F.col("text")
            ),
        )
        # materialize BEFORE the delete rewrites the files it reads
        .localCheckpoint(eager=True)
    )
    # write the modified corpus (delete + append of changed rows)
    delete_rows(spark, path, "doc_id", victims, maintain_indexes=[idx])
    changed.write.mode("append").partitionBy("goe_part_key").parquet(path)
    n = upsert_signatures(spark, idx, changed.drop("goe_part_key"))
    assert n == 2

    sigs = load_signatures(spark, idx)
    rebuilt_dir = idx + "_upsert_rebuilt"
    build_signature_index(
        spark, spark.read.parquet(path).drop("goe_part_key"), rebuilt_dir
    )
    rebuilt = spark.read.parquet(os.path.join(rebuilt_dir, "signatures"))
    assert sigs.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(sigs).count() == 0

    # second upsert of the same key: latest wins, no duplicates
    changed2 = changed.withColumn(
        "text", F.concat(F.lit("third version "), F.col("text"))
    ).drop("goe_part_key")
    upsert_signatures(spark, idx, changed2)
    per_key = (
        load_signatures(spark, idx)
        .where(F.col("doc_id").isin(victims))
        .groupBy("doc_id")
        .count()
        .collect()
    )
    assert {r["count"] for r in per_key} == {1}

    # delete AFTER upsert: the overrides row must die too
    delete_rows(spark, path, "doc_id", [victims[0]], maintain_indexes=[idx])
    assert (
        load_signatures(spark, idx)
        .where(F.col("doc_id") == victims[0])
        .count()
        == 0
    )


def test_ivf_upsert_serves_new_vector(spark, emb_corpus):
    from goe_spark.operators.index_maintenance import upsert_vectors
    from goe_spark.operators.ivf import ensure_index, load_assigned

    corpus_dir, path = emb_corpus
    idx = ensure_index(spark, corpus_dir)
    vid = spark.read.parquet(path).select(F.min("vec_id")).first()[0]
    changed = (
        spark.read.parquet(path)
        .where(F.col("vec_id") == vid)
        .drop("goe_part_key")
        .withColumn(
            "embedding",
            F.transform("embedding", lambda x: (x * 2.0).cast("float")),
        )
    )
    old = load_assigned(spark, idx).where(F.col("vec_id") == vid).first()
    assert upsert_vectors(spark, idx, changed) == 1
    rows = load_assigned(spark, idx).where(F.col("vec_id") == vid).collect()
    assert len(rows) == 1
    got = rows[0]
    assert got.embedding[0] == old.embedding[0] * 2.0
    # PQ codes ride the upsert when the index carries them
    if "codes" in rows[0].__fields__:
        assert got.codes is not None
