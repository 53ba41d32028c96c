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


def _recall(spark, emb, cents_df, qlo=100, qhi=120, top_k=10):
    """recall@k of an IVF search using the given centroid table,
    against exact cosine ground truth on the same data. Queries are
    ids [qlo, qhi) — deliberately DISJOINT from any centroid seed:
    a query that IS a centroid probes its own identity cell at
    cosine 1 and scores an unearned ~100% recall (this masked the
    round-1 first-k quantizer's order dependence)."""
    from pyspark.sql.window import Window

    from goe_spark.operators.ivf import assign_cells, probe_cells
    from goe_spark.operators.vector import dot, norm2

    qry = emb.where((F.col("vec_id") >= qlo) & (F.col("vec_id") < qhi)).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        norm2(F.col("embedding")).alias("qnorm2"),
    )
    assigned = assign_cells(emb, cents_df)
    cand = probe_cells(qry, cents_df).join(assigned, "cell")
    scored = (
        cand.join(F.broadcast(qry), "qid")
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            (dot(F.col("qvec"), F.col("embedding"))
             / F.sqrt(F.col("qnorm2") * F.col("vnorm2"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    approx = {
        (r.qid, r.vec_id)
        for r in scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_k)
        .collect()
    }
    exact_scored = (
        emb.select("vec_id", "embedding", norm2(F.col("embedding")).alias("vnorm2"))
        .crossJoin(F.broadcast(qry))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            (dot(F.col("qvec"), F.col("embedding"))
             / F.sqrt(F.col("qnorm2") * F.col("vnorm2"))).alias("cosine"),
        )
    )
    exact = {
        (r.qid, r.vec_id)
        for r in exact_scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_k)
        .collect()
    }
    return len(exact & approx) / len(exact)


def test_kmeans_centroids_beat_first_k_on_shuffled_ids(spark, tmp_path):
    """The round-1 quantizer took the first n_cells vectors by id, so
    recall depended on how ids happened to be assigned. The sampled
    k-means quantizer must match-or-beat it on a fixture whose ids
    are randomly relabeled (same vectors, adversarial order)."""
    import random

    from goe_spark.operators.vector import norm2

    emb = load_table(spark, SF_SMALL, "embeddings")
    n = emb.count()
    perm = list(range(n))
    random.Random(13).shuffle(perm)
    mapping = spark.createDataFrame(
        [(i, p) for i, p in enumerate(perm)], "vec_id long, new_id long"
    )
    shuffled = (
        emb.join(mapping, "vec_id")
        .select(F.col("new_id").alias("vec_id"), "label", "embedding")
    )
    d = str(tmp_path / "embeddings.parquet")
    shuffled.write.mode("overwrite").parquet(d)
    shuffled = spark.read.parquet(d)

    def first_k(e):
        return e.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("cell"),
            F.col("embedding").alias("cvec"),
            norm2(F.col("embedding")).alias("cnorm2"),
        )

    old_recall = _recall(spark, shuffled, first_k(shuffled))
    new_recall = _recall(spark, shuffled, centroids(shuffled))
    # Measured on this fixture: kmeans 0.435 vs first-k 0.365. The
    # corpus is nearly isotropic (intra-label cosine ~ 0.001), so
    # ~0.4 is the realistic ceiling for nprobe=2/8.
    assert new_recall >= old_recall, (new_recall, old_recall)
    assert new_recall >= 0.2


def test_decimal_cast_ties_match_oracle(spark):
    """CENT_DEC determinism: a double CAN land exactly on a .5 tie at
    scale 9 (odd m * 2^-k, k <= 10); both engines must resolve it the
    same way (half-away-from-zero) or the Lloyd sums diverge."""
    import duckdb

    ties = [3 / 1024, -3 / 1024, 5 / 1024, -5 / 1024, 2.5e-9, -2.5e-9]
    df = spark.createDataFrame([(v,) for v in ties], "v double")
    spark_dec = [
        str(r.d)
        for r in df.select(F.col("v").cast("decimal(20,9)").alias("d"))
        .orderBy("v")
        .collect()
    ]
    con = duckdb.connect()
    duck_dec = [
        str(con.execute(
            f"SELECT CAST({v!r}::DOUBLE AS DECIMAL(20,9))"
        ).fetchone()[0])
        for v in sorted(ties)
    ]
    assert spark_dec == duck_dec


def test_indexed_probe_matches_inline_build(spark, tmp_path):
    """ivf_topk_indexed over a materialized index must return exactly
    the rows the in-session build returns (same math, different cost
    placement)."""
    from goe_spark.operators.ivf import build_index, ivf_topk_indexed

    emb = load_table(spark, SF_SMALL, "embeddings")
    index_dir = str(tmp_path / "ivf")
    build_index(spark, emb, index_dir)
    inline = {tuple(r) for r in ivf_topk(emb, n_queries=4, top_k=7).collect()}
    indexed = {
        tuple(r)
        for r in ivf_topk_indexed(
            spark, emb, index_dir, n_queries=4, top_k=7
        ).collect()
    }
    assert inline == indexed


def test_ensure_index_builds_once_and_rebuilds_on_change(spark, tmp_path, monkeypatch):
    """ensure_index must no-op while the source fingerprint matches
    and rebuild when it changes."""
    import os

    import goe_spark.operators.ivf as ivf_mod

    monkeypatch.setattr(ivf_mod, "INDEX_ROOT", str(tmp_path / "root"))
    d1 = ivf_mod.ensure_index(spark, SF_SMALL)
    meta = os.path.join(d1, "_INDEX_META.json")
    mtime1 = os.stat(meta).st_mtime_ns
    assert ivf_mod.ensure_index(spark, SF_SMALL) == d1
    assert os.stat(meta).st_mtime_ns == mtime1  # cache hit, no rebuild
    # poison the fingerprint -> next call rebuilds
    with open(meta, "w") as f:
        f.write('{"fingerprint": "stale"}')
    assert ivf_mod.ensure_index(spark, SF_SMALL) == d1
    with open(meta) as f:
        assert "stale" not in f.read()


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


def test_append_to_index_equals_full_assignment(spark, tmp_path):
    """Incremental maintenance: build the index on a prefix of the
    corpus, append the rest; probes must return exactly what an index
    holding ALL vectors assigned against the SAME persisted centroids
    returns (per-vector assignment is independent given fixed
    centroids — append cost O(new), not O(corpus))."""
    from goe_spark.operators.ivf import (
        append_to_index,
        assign_cells,
        build_index,
        ivf_topk_indexed,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    old = emb.where(F.col("vec_id") % 2 == 0)
    new = emb.where(F.col("vec_id") % 2 == 1)
    index_dir = str(tmp_path / "ivf_idx")
    build_index(spark, old, index_dir)
    n = append_to_index(spark, index_dir, new)
    assert n == new.count()

    got = sorted(
        map(
            tuple,
            ivf_topk_indexed(spark, emb, index_dir, n_queries=5, top_k=10)
            .collect(),
        )
    )
    # reference: same centroids, whole corpus assigned in one pass
    import os as _os

    cents = spark.read.parquet(_os.path.join(index_dir, "centroids"))
    ref_dir = str(tmp_path / "ivf_ref")
    assign_cells(emb, cents).write.partitionBy("cell").parquet(
        _os.path.join(ref_dir, "assigned")
    )
    cents.coalesce(1).write.parquet(_os.path.join(ref_dir, "centroids"))
    want = sorted(
        map(
            tuple,
            ivf_topk_indexed(spark, emb, ref_dir, n_queries=5, top_k=10)
            .collect(),
        )
    )
    assert got == want
