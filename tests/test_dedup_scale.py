"""Scale-safety guards for the near-dup operators: frequency caps
bound the in-bucket pair expansion, and the simhash banding is a
lossless candidate generator for its hamming radius."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from goe_spark.operators import minhash as MH
from tests.conftest import SF_SMALL
from goe_spark.queries.dedup import (
    LSH_BUCKET_CAP,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

VIRAL_N = 100  # > the bucket cap (64)


@pytest.fixture(scope="module")
def viral_sf_dir(spark, tmp_path_factory):
    """A documents table where one LSH bucket is shared by VIRAL_N
    docs (above cap) plus one legitimate near-dup pair (below cap)."""
    assert VIRAL_N > LSH_BUCKET_CAP
    rows = [
        # 100 identical docs: identical signatures, so every minhash
        # band bucket holds all 100 (> LSH_BUCKET_CAP).
        (i, "common alpha beta gamma delta", "en", "web", 29)
        for i in range(VIRAL_N)
    ]
    base = "zeta eta theta iota kappa lamda mu nu xi"
    rows += [
        (1000, base + " end1", "en", "web", len(base) + 5),
        (1001, base + " end2", "en", "web", len(base) + 5),
    ]
    d = tmp_path_factory.mktemp("viral")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_jaccard_viral_bucket_capped(spark, viral_sf_dir):
    pairs = ngram_jaccard_pairs(spark, viral_sf_dir).collect()
    ids = {(r.id1, r.id2) for r in pairs}
    # The viral docs share identical signatures, so every band bucket
    # holds all VIRAL_N — the bucket cap drops the would-be
    # VIRAL_N*(VIRAL_N-1)/2 candidate pairs...
    assert not any(r.id1 < 1000 for r in pairs)
    # ...while the legitimate below-cap near-dup pair survives with
    # its exact Jaccard score.
    assert (1000, 1001) in ids
    (pair,) = [r for r in pairs if (r.id1, r.id2) == (1000, 1001)]
    assert pair.jaccard == round(7 / 9, 6)  # 7 common of 8+8 shingles


def test_minhash_viral_bucket_capped(spark, viral_sf_dir):
    pairs = minhash_lsh_pairs(spark, viral_sf_dir).collect()
    # The identical docs share one signature, so every band bucket
    # holds all VIRAL_N of them — the bucket cap must stop the
    # quadratic expansion (exact-dup clusters belong to exact dedup,
    # not the near-dup pair generator).
    assert not any(r.id1 < 1000 for r in pairs)
    # The 8-shingle near-identical pair agrees on most minhash
    # components, so some band still pairs them.
    assert any((r.id1, r.id2) == (1000, 1001) for r in pairs)


def test_embedding_cell_cap_bounds_group_size(spark, tmp_path):
    """A skewed label cell (one label, 5x the cap) must be
    sub-bucketed so no applyInPandas group — hence no Arrow batch and
    no pairwise matmul — exceeds ~cap rows; small cells keep sub=0;
    the operator still runs and only emits within-sub-bucket pairs."""
    import random

    from goe_spark.queries.similarity import (
        EMB_CELL_CAP,
        embedding_near_dup_pairs,
        sub_bucketed_cells,
    )

    rng = random.Random(7)
    n_skew = 5 * EMB_CELL_CAP
    rows = [
        (i, 0, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(n_skew)
    ]
    rows += [
        (10_000 + i, 1, [rng.uniform(-1, 1) for _ in range(8)])
        for i in range(10)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    bucketed = sub_bucketed_cells(emb)
    group_sizes = {
        (r.label, r.sub): r.c
        for r in bucketed.groupBy("label", "sub").agg(
            F.count(F.lit(1)).alias("c")
        ).collect()
    }
    skew_groups = {k: v for k, v in group_sizes.items() if k[0] == 0}
    assert len(skew_groups) == 5  # ceil(640/128)
    # hash spread is not perfectly even; 2x cap is the hard ceiling
    assert max(skew_groups.values()) <= 2 * EMB_CELL_CAP
    assert group_sizes[(1, 0)] == 10  # small cell untouched

    d = str(tmp_path)
    emb.coalesce(1).write.mode("overwrite").parquet(
        f"{d}/embeddings.parquet"
    )
    pairs = embedding_near_dup_pairs(spark, d)
    sub_of = {
        r.vec_id: (r.label, r.sub) for r in bucketed.collect()
    }
    for r in pairs.collect():
        assert sub_of[r.id1] == sub_of[r.id2]  # group-local pairs only


def test_simhash_band_pigeonhole():
    """If hamming(a, b) <= SIMHASH_BANDS - 1, at least one 15-bit band
    is identical — the losslessness the banded plan relies on."""
    rng = random.Random(7)
    mask = (1 << MH.SIMHASH_BAND_BITS) - 1

    def bands(sig):
        return [
            (sig >> (b * MH.SIMHASH_BAND_BITS)) & mask
            for b in range(MH.SIMHASH_BANDS)
        ]

    for _ in range(500):
        a = rng.getrandbits(MH.SIMHASH_BITS)
        flips = rng.sample(range(MH.SIMHASH_BITS), rng.randint(0, MH.SIMHASH_BANDS - 1))
        b = a
        for j in flips:
            b ^= 1 << j
        assert any(x == y for x, y in zip(bands(a), bands(b)))
    # The bands exactly tile the signature width.
    assert MH.SIMHASH_BANDS * MH.SIMHASH_BAND_BITS == MH.SIMHASH_BITS


def test_simhash_bands_reassemble(spark):
    """Spark-side band extraction is consistent with the signature:
    the 4 shifted band values OR back into the original 60-bit sig."""
    from goe_spark.catalog import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    th = d.select("doc_id", MH.token_hashes(toks).alias("th"))
    sigs = th.select("doc_id", MH.simhash_signature(F.col("th")).alias("sig"))
    rebuilt = None
    for b in range(MH.SIMHASH_BANDS):
        part = F.shiftleft(
            F.element_at(MH.simhash_band_structs(F.col("sig")), b + 1)["val"],
            b * MH.SIMHASH_BAND_BITS,
        )
        rebuilt = part if rebuilt is None else rebuilt + part
    bad = sigs.where(
        (rebuilt != F.col("sig"))
        | (F.col("sig") < 0)
        | (F.col("sig") >= 2**MH.SIMHASH_BITS)
    )
    assert bad.count() == 0


def test_simhash_query_nonempty_and_within_radius(spark):
    out = simhash_pairs(spark, "/root/testdata/sf0.01").collect()
    assert len(out) > 0
    assert all(0 <= r.hamming <= MH.SIMHASH_BANDS - 1 for r in out)
    assert all(r.id1 < r.id2 for r in out)


def test_cross_doc_coverage_invariants_and_planted_dups(spark):
    """The fixture plants exact-duplicate docs, so cross-doc coverage
    must find duplicated grams, and a doc's dup count can never exceed
    its gram count. n_high_dup counts docs, so it is bounded by
    n_docs; every fraction lives in [0, 1]."""
    from goe_spark.queries.dedup import cross_doc_ngram_coverage

    rows = cross_doc_ngram_coverage(spark, SF_SMALL).collect()
    assert rows
    assert sum(r.dup_grams for r in rows) > 0  # planted dups surface
    for r in rows:
        assert 0 <= r.dup_grams <= r.total_grams
        assert 0 <= r.n_high_dup <= r.n_docs
        assert 0.0 <= r.avg_dup_frac <= 1.0


def test_top_duplicate_ngrams_ordered_and_bounded(spark):
    """Heavy-hitter grams arrive sorted (n_docs DESC, gram ASC), all
    genuinely duplicated (n_docs >= 2), at most K rows."""
    from goe_spark.queries.dedup import TOP_DUP_NGRAMS_K, top_duplicate_ngrams

    rows = top_duplicate_ngrams(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= TOP_DUP_NGRAMS_K
    keys = [(-r.n_docs, r.gram) for r in rows]
    assert keys == sorted(keys)
    assert all(r.n_docs >= 2 for r in rows)
    assert all(len(r.gram.split(" ")) == 3 for r in rows)
