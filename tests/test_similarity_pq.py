"""PQ ANN: recall against the exact baseline + structural invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from goe_spark.catalog import load_table
from goe_spark.operators.pq import (
    K_CODE,
    M_SUB,
    RERANK,
    encode_codes,
    pq_topk,
    sample_codebooks,
)
from goe_spark.queries.similarity import ann_bruteforce_topk
from tests.conftest import SF_SMALL


def test_pq_recall_vs_bruteforce(spark):
    """4-bit-per-subspace codes + RERANK exact rescoring must recover
    a meaningful share of the exact top-10 — and can never beat
    exact search. The floor is deliberately modest: codebooks are
    un-refined samples (the oracle-exactness trade documented in
    operators/pq.py); refinement raises recall, not the plan."""
    exact = {
        (r.qid, r.vec_id)
        for r in ann_bruteforce_topk(spark, SF_SMALL).collect()
    }
    emb = load_table(spark, SF_SMALL, "embeddings")
    approx = {
        (r.qid, r.vec_id)
        for r in pq_topk(emb, n_queries=5, top_k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert 0.2 <= recall <= 1.0, f"recall@10 = {recall}"


def test_pq_codes_shape_and_range(spark):
    """Every vector encodes to M_SUB codes, each in [0, K_CODE)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    books = sample_codebooks(emb)
    codes = emb.select(
        encode_codes("embedding", books).alias("codes")
    )
    bad = codes.where(
        (F.size("codes") != M_SUB)
        | F.exists(
            "codes", lambda c: (c < 0) | (c >= F.lit(K_CODE))
        )
    ).count()
    assert bad == 0


def test_pq_codebook_deterministic_and_cached(spark):
    """Codebooks derive from the hash-seeded sample only — two calls
    return the identical (cached) object, and the shape is
    M_SUB x K_CODE x SUB."""
    from goe_spark.operators.pq import SUB

    emb = load_table(spark, SF_SMALL, "embeddings")
    b1 = sample_codebooks(emb)
    b2 = sample_codebooks(load_table(spark, SF_SMALL, "embeddings"))
    assert b1 is b2  # per-source cache hit
    assert len(b1) == M_SUB
    assert all(len(bm) == K_CODE for bm in b1)
    assert all(len(cw) == SUB for bm in b1 for cw in bm)


def test_pq_exactly_topk_rows_per_query(spark):
    out = pq_topk(
        load_table(spark, SF_SMALL, "embeddings"), n_queries=5, top_k=10
    )
    counts = {r.qid: r.n for r in out.groupBy("qid").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {0, 1, 2, 3, 4}
    assert all(n == 10 for n in counts.values())
    assert RERANK >= 10  # shortlist can always fill the top-k
