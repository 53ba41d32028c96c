"""IVF ANN: structural invariants + recall against the exact baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from goe_spark.catalog import load_table
from goe_spark.operators.ivf import assign_cells, centroids, ivf_topk
from goe_spark.queries.similarity import ann_bruteforce_topk
from tests.conftest import SF_SMALL


def test_every_vector_assigned_exactly_once(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    assigned = assign_cells(emb, centroids(emb))
    assert assigned.count() == emb.count()
    assert assigned.select("vec_id").distinct().count() == emb.count()
    n_cells = assigned.select("cell").distinct().count()
    assert 1 < n_cells <= 8


def test_ivf_results_are_subset_of_probed_cells(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    res = ivf_topk(emb, n_queries=3, top_k=5)
    rows = res.collect()
    assert {r.qid for r in rows} == {0, 1, 2}
    per_q = {}
    for r in rows:
        per_q.setdefault(r.qid, []).append(r)
    for q, rs in per_q.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        cosines = [r.cosine for r in sorted(rs, key=lambda r: r.rank)]
        assert cosines == sorted(cosines, reverse=True)


def test_ivf_recall_vs_bruteforce(spark):
    """nprobe=2/8 cells must still recover a meaningful share of the
    exact top-10 — and can never *beat* exact search."""
    exact = {
        (r.qid, r.vec_id)
        for r in ann_bruteforce_topk(spark, SF_SMALL).collect()
    }
    emb = load_table(spark, SF_SMALL, "embeddings")
    approx = {(r.qid, r.vec_id) for r in ivf_topk(emb).collect()}
    recall = len(exact & approx) / len(exact)
    assert 0.2 <= recall <= 1.0, f"recall@10 = {recall}"
