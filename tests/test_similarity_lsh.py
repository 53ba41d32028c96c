"""Sign-LSH ANN: bucket invariants + recall against the exact baseline."""

from __future__ import annotations

from goe_spark.catalog import load_table
from goe_spark.operators.lsh import N_PLANES, hyperplanes, lsh_topk, signatures
from goe_spark.queries.similarity import N_QUERIES, TOP_K, ann_bruteforce_topk
from tests.conftest import SF_SMALL


def test_every_vector_signed_exactly_once(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    signed = signatures(emb, hyperplanes(emb))
    assert signed.count() == emb.count()
    buckets = [r.bucket for r in signed.select("bucket").distinct().collect()]
    assert all(0 <= b < 2**N_PLANES for b in buckets)
    assert len(buckets) > 1  # the planes actually split the space


def test_lsh_ranks_are_dense_and_ordered(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    rows = lsh_topk(emb, n_queries=3, top_k=5).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.qid, []).append(r)
    for q, rs in per_q.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        cosines = [r.cosine for r in sorted(rs, key=lambda r: r.rank)]
        assert cosines == sorted(cosines, reverse=True)


def test_lsh_recall_vs_bruteforce(spark):
    """The multi-probe bucket set (5/16 of the space on average) must
    recover a meaningful share of the exact top-10, never beat it.
    Measured 0.42 on this fixture; 0.3 is the regression floor."""
    exact = {
        (r.qid, r.vec_id)
        for r in ann_bruteforce_topk(spark, SF_SMALL).collect()
    }
    emb = load_table(spark, SF_SMALL, "embeddings")
    approx = {
        (r.qid, r.vec_id)
        for r in lsh_topk(emb, n_queries=N_QUERIES, top_k=TOP_K).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert 0.3 <= recall <= 1.0, f"recall@10 = {recall}"
