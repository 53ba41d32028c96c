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


def test_ivf_pq_recall_and_shape(spark):
    """The composed index (coarse cells AND compressed codes) stacks
    two approximations; recall floor matches the IVF floor, and each
    query still returns exactly top-k rows (RERANK and the probed
    cells always hold >= k candidates at this SF)."""
    from goe_spark.operators.pq import ivf_pq_topk

    exact = {
        (r.qid, r.vec_id)
        for r in ann_bruteforce_topk(spark, SF_SMALL).collect()
    }
    emb = load_table(spark, SF_SMALL, "embeddings")
    rows = ivf_pq_topk(emb, n_queries=5, top_k=10).collect()
    approx = {(r.qid, r.vec_id) for r in rows}
    recall = len(exact & approx) / len(exact)
    assert 0.2 <= recall <= 1.0, f"recall@10 = {recall}"
    per_q = {}
    for r in rows:
        per_q[r.qid] = per_q.get(r.qid, 0) + 1
    assert per_q == {q: 10 for q in range(5)}


def test_ivf_pq_results_come_from_probed_cells(spark):
    """Structural containment: every returned neighbour belongs to
    one of its query's probed cells — the IVF pruning is real, not
    decorative."""
    from goe_spark.operators import ivf as IVF
    from goe_spark.operators.pq import ivf_pq_topk

    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = IVF.centroids(emb).cache()
    assigned = {
        r.vec_id: r.cell
        for r in IVF.assign_cells(emb, cents).select("vec_id", "cell").collect()
    }
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.expr(
            "aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)), "
            "cast(0.0 as double), (a, b) -> a + b)"
        ).alias("qnorm2"),
    )
    probed = {}
    for r in IVF.probe_cells(queries, cents).collect():
        probed.setdefault(r.qid, set()).add(r.cell)
    for r in ivf_pq_topk(emb, n_queries=5, top_k=10).collect():
        assert assigned[r.vec_id] in probed[r.qid], (r.qid, r.vec_id)


def test_ivf_pq_indexed_equals_in_session(spark):
    """The materialized-index path must return exactly the in-session
    build's results — same centroids (persisted doubles round-trip
    parquet exactly), same codes, same shortlist."""
    from goe_spark.operators.ivf import ensure_index
    from goe_spark.operators.pq import ivf_pq_topk, ivf_pq_topk_indexed

    emb = load_table(spark, SF_SMALL, "embeddings")
    index_dir = ensure_index(spark, SF_SMALL)
    a = sorted(
        map(tuple, ivf_pq_topk(emb, n_queries=5, top_k=10).collect())
    )
    b = sorted(
        map(
            tuple,
            ivf_pq_topk_indexed(
                spark, emb, index_dir, n_queries=5, top_k=10
            ).collect(),
        )
    )
    assert a == b
