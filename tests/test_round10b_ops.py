"""Semantic pins for the late-round-10 operators (oracle hash parity
is covered by test_queries_oracle; these pin the mathematical
contracts on handcrafted corpora where the right answer is known by
construction)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture()
def crafted_docs_dir(spark, tmp_path):
    """A 4-doc corpus with known pair structure:

    - doc 1 (A): 40 tokens
    - doc 2 (D): exact copy of A           -> edit 0, containment 1.0
    - doc 3 (B): A with token 20 replaced  -> small edit distance
    - doc 4 (E): first 15 tokens of A      -> contained in A/D/B
    """
    toks = [f"tok{i:02d}" for i in range(40)]
    a = " ".join(toks)
    b = " ".join(toks[:20] + ["zz"] + toks[21:])
    e = " ".join(toks[:15])
    rows = [
        (1, a, "en", "src0", len(a)),
        (2, a, "en", "src0", len(a)),
        (3, b, "en", "src1", len(b)),
        (4, e, "en", "src1", len(e)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "corpus")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def test_editdist_crafted_pairs(spark, crafted_docs_dir):
    from goe_spark.queries.dedup import editdist_near_dup_pairs

    got = {
        (r.id1, r.id2): r
        for r in editdist_near_dup_pairs(spark, crafted_docs_dir).collect()
    }
    # exact copies: distance 0
    assert (1, 2) in got
    assert got[(1, 2)].edit_dist == 0
    assert got[(1, 2)].rel_edit == 0.0
    # one-token replacement: distance = len('tok20') vs len('zz')
    # within one substitution window -> between 1 and 5 edits
    assert (1, 3) in got
    assert 1 <= got[(1, 3)].edit_dist <= 5
    assert (2, 3) in got
    for r in got.values():
        assert r.id1 < r.id2
        assert 0 <= r.rel_edit <= 0.5
        assert r.edit_dist >= 0


def test_containment_crafted_pairs(spark, crafted_docs_dir):
    from goe_spark.queries.dedup import shingle_containment_pairs

    got = {
        (r.id1, r.id2): r
        for r in shingle_containment_pairs(spark, crafted_docs_dir).collect()
    }
    # exact copies: containment 1.0, same size
    assert got[(1, 2)].containment == 1.0
    assert got[(1, 2)].relation == "same_size"
    # the 15-token prefix is fully contained in A, D and B — and this
    # is exactly the pair family Jaccard scores LOW (13/38 ≈ 0.34),
    # i.e. what minhash-threshold dedup misses
    for other in (1, 2, 3):
        r = got[(other, 4)]
        assert r.containment == 1.0
        assert r.relation == "right_in_left"
        assert r.n_common == r.n_sh2 == 13  # 15 tokens -> 13 trigrams
    for r in got.values():
        assert r.id1 < r.id2
        assert 0 < r.containment <= 1.0
        assert r.n_common <= min(r.n_sh1, r.n_sh2)


def test_editdist_invariants_fixture(spark):
    from goe_spark.queries.dedup import editdist_near_dup_pairs

    rows = editdist_near_dup_pairs(spark, SF_SMALL).collect()
    assert rows, "fixture corpus has LSH candidates (near-dup seeds)"
    seen = set()
    for r in rows:
        assert r.id1 < r.id2
        assert (r.id1, r.id2) not in seen
        seen.add((r.id1, r.id2))
        assert 0 <= r.rel_edit <= 0.5


def test_source_concentration_crafted(spark, crafted_docs_dir):
    """Two sources with two docs each: shares are (1/2, 1/2), so
    HHI = 0.5, Gini = 0 (perfect equality) and top-3 share = 1."""
    from goe_spark.queries.profiling import source_concentration

    rows = source_concentration(spark, crafted_docs_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.lang == "en"
    assert r.n_sources == 2 and r.n_docs == 4
    assert r.hhi == 0.5
    assert r.gini == 0.0
    assert r.top3_share == 1.0


def test_source_concentration_bounds(spark):
    from goe_spark.queries.profiling import source_concentration

    rows = source_concentration(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 1.0 / r.n_sources - 1e-6 <= r.hhi <= 1.0
        assert 0.0 <= r.gini <= 1.0 - 1.0 / r.n_sources + 1e-6
        assert r.top3_share <= 1.0
        # top-3 can't hold less than 3/n of a distribution's mass
        if r.n_sources >= 3:
            assert r.top3_share >= 3.0 / r.n_sources - 1e-6


def test_benford_accounting_and_constants(spark):
    from goe_spark.catalog import load_table
    from goe_spark.queries.profiling import benford_first_digit_audit

    rows = benford_first_digit_audit(spark, SF_SMALL).collect()
    n_orders = load_table(spark, SF_SMALL, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders
    known = {1: 0.30103, 2: 0.176091, 3: 0.124939, 9: 0.045757}
    for r in rows:
        assert 1 <= r.digit <= 9
        assert r.chi2_term >= 0
        assert abs(r.obs_share - r.benford_share - r.deviation) < 2e-6
        if r.digit in known:
            assert abs(r.benford_share - known[r.digit]) < 1e-6


def test_markov_entropy_bounds(spark):
    import math

    from goe_spark.queries.timeseries import (
        event_markov_entropy,
        event_transition_matrix,
    )

    rows = event_markov_entropy(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # entropy of a K-outcome distribution is in [0, log2 K]
        assert -1e-6 <= r.entropy_bits <= math.log2(r.n_next_types) + 1e-6
        assert r.top_next_p >= 1.0 / r.n_next_types - 1e-6
        assert r.top_next_type is not None
    # transition totals agree with the transition-matrix operator
    tm = event_transition_matrix(spark, SF_SMALL).collect()
    per_state = {}
    for t in tm:
        per_state[t.prev_type] = per_state.get(t.prev_type, 0) + t.n_transitions
    for r in rows:
        assert per_state[r.prev_type] == r.n_transitions


def test_ngram_diversity_crafted(spark, crafted_docs_dir):
    """src0 holds two identical 40-token docs: 38 distinct trigrams
    over 76 emitted -> diversity 0.5. src1's two docs overlap on the
    15-token prefix."""
    from goe_spark.queries.text import ngram_diversity_by_source

    rows = {r.source: r for r in ngram_diversity_by_source(
        spark, crafted_docs_dir).collect()}
    assert rows["src0"].n_trigrams == 76
    assert rows["src0"].n_distinct == 38
    assert rows["src0"].diversity == 0.5
    assert rows["src1"].n_distinct <= rows["src1"].n_trigrams


def test_ngram_diversity_bounds(spark):
    from goe_spark.queries.text import ngram_diversity_by_source

    rows = ngram_diversity_by_source(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 < r.diversity <= 1.0
        assert r.n_distinct <= r.n_trigrams


def test_mad_outliers_crafted(spark):
    """Values 1..9 plus a 99 spike. Lower-CDF median over 10 values =
    5th smallest -> 5.00 (500c). Deviations sorted: 0,100,100,200,
    200,300,300,400,400,9400 -> 5th = 200c MAD. Cutoff 3*1.4826*200
    = 889.56c: only the 9400 spike deviation crosses it."""
    import datetime

    from goe_spark.queries import profiling as P

    rows = [
        (i, datetime.datetime(2024, 1, 1, 0, 0, i), 1, "t", float(v), "{}")
        for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 99])
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import goe_spark.catalog as cat

    orig = cat.load_table
    try:
        cat.load_table = lambda s, d, n: df if n == "events" else orig(s, d, n)
        P.load_table = cat.load_table
        got = P.value_mad_outliers(spark, "ignored").collect()
    finally:
        cat.load_table = orig
        P.load_table = orig
    assert len(got) == 1
    r = got[0]
    assert r.median_cents == 500
    assert r.mad_cents == 200
    assert r.n_outliers == 1
    assert r.max_dev_cents == 9400
    assert r.outlier_share == 0.1


def test_mad_outliers_invariants(spark):
    from goe_spark.queries.profiling import value_mad_outliers

    rows = value_mad_outliers(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.mad_cents >= 0
        assert r.n_outliers <= r.n_events
        assert r.max_dev_cents >= r.mad_cents
        assert 0 <= r.outlier_share <= 1


def test_dow_seasonality_accounting(spark):
    from goe_spark.catalog import load_table
    from goe_spark.queries.timeseries import dow_seasonality_index

    rows = dow_seasonality_index(spark, SF_SMALL).collect()
    n_orders = load_table(spark, SF_SMALL, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders
    assert {r.iso_dow for r in rows} <= set(range(1, 8))
    # indexes are shares * 7: they sum to 7 when weighted equally-ish;
    # the hard invariant is the share identity per row
    for r in rows:
        assert abs(r.order_index - r.n_orders * 7 / n_orders) < 2e-6
        assert r.revenue_index > 0


def test_cusum_crafted_shift(spark):
    """Five days at 100.00 then five at 200.00: the n-scaled CUSUM
    |n*cum - t*tot| peaks at t=5 (the last pre-shift day) with value
    |10*50000 - 5*150000| = 250000; share = 250000/(10*150000)."""
    import datetime

    from goe_spark.queries import timeseries as TS

    rows = [
        (i, 1, "O", 100.0 if i <= 5 else 200.0, datetime.date(2024, 1, i),
         "1-URGENT", "c", 0, "x")
        for i in range(1, 11)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string,"
        " o_clerk string, o_shippriority int, o_comment string",
    )
    import goe_spark.catalog as cat

    orig = cat.load_table
    try:
        cat.load_table = lambda s, d, n: df if n == "orders" else orig(s, d, n)
        TS.load_table = cat.load_table
        got = TS.cusum_revenue_shift(spark, "ignored").collect()
    finally:
        cat.load_table = orig
        TS.load_table = orig
    assert len(got) == 1
    r = got[0]
    assert r.n_days == 10
    assert r.shift_day == datetime.date(2024, 1, 5)
    assert r.max_abs_cusum == 250000
    assert abs(r.cusum_share - 250000 / 1500000) < 2e-6


def test_referential_integrity_crafted(spark):
    from goe_spark.queries import validation as V

    orders = spark.createDataFrame(
        [(1, 1), (2, 99)], "o_orderkey long, o_custkey long"
    )
    customer = spark.createDataFrame([(1,)], "c_custkey long")
    lineitem = spark.createDataFrame(
        [(1,), (999,)], "l_orderkey long"
    )
    frames = {"orders": orders, "customer": customer, "lineitem": lineitem}
    import goe_spark.catalog as cat

    orig = cat.load_table
    try:
        cat.load_table = lambda s, d, n: frames.get(n) or orig(s, d, n)
        V.load_table = cat.load_table
        got = {r.check_name: r for r in V.referential_integrity_audit(
            spark, "ignored").collect()}
    finally:
        cat.load_table = orig
        V.load_table = orig
    assert got["lineitem_orphan_orderkey"].n_violations == 1  # 999
    assert got["orders_orphan_custkey"].n_violations == 1     # cust 99
    assert got["orders_without_lineitems"].n_violations == 1  # order 2
    assert got["duplicate_orderkeys"].n_violations == 0
    assert got["null_orderkeys"].n_violations == 0
    assert got["lineitem_orphan_orderkey"].violation_share == 0.5


def test_referential_integrity_fixture(spark):
    """FK orphans / dup / null PKs are clean on the fixture;
    childless orders genuinely exist (the generator emits orders with
    no lineitems) — pin that count against an independent distinct-key
    subtraction rather than assuming TPC-H's 1-7 lineitem guarantee."""
    from pyspark.sql import functions as F  # noqa: F811

    from goe_spark.catalog import load_table
    from goe_spark.queries.validation import referential_integrity_audit

    got = {r.check_name: r for r in referential_integrity_audit(
        spark, SF_SMALL).collect()}
    assert len(got) == 5
    for name in ("lineitem_orphan_orderkey", "orders_orphan_custkey",
                 "duplicate_orderkeys", "null_orderkeys"):
        assert got[name].n_violations == 0, f"{name} dirty on fixture"
        assert got[name].n_total > 0
    o = load_table(spark, SF_SMALL, "orders")
    li = load_table(spark, SF_SMALL, "lineitem")
    expected_childless = o.count() - li.select("l_orderkey").distinct().count()
    assert got["orders_without_lineitems"].n_violations == expected_childless


def test_pagerank_matches_python_reference(spark):
    """Third independent implementation: replay the integer PageRank
    recurrence in pure Python over the same edge list and require the
    full top-20 (ids AND q12 ranks) to match exactly."""
    from collections import defaultdict

    from goe_spark.queries.dedup import minhash_lsh_pairs
    from goe_spark.queries.training import (
        PR_ITERS,
        PR_SCALE,
        PR_TOP_K,
        pagerank_dedup_graph,
    )

    edges = minhash_lsh_pairs(spark, SF_SMALL).select("id1", "id2").collect()
    assert edges
    deg: dict[int, int] = defaultdict(int)
    inc: dict[int, list[int]] = defaultdict(list)
    for r in edges:
        deg[r.id1] += 1
        deg[r.id2] += 1
        inc[r.id1].append(r.id2)
        inc[r.id2].append(r.id1)
    n = len(deg)
    base = 15 * PR_SCALE // (100 * n)
    pr = {v: PR_SCALE // n for v in deg}
    for _ in range(PR_ITERS):
        pr = {
            v: base + 85 * sum(pr[s] // deg[s] for s in inc[v]) // 100
            for v in deg
        }
    expected = sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))[:PR_TOP_K]
    got = pagerank_dedup_graph(spark, SF_SMALL).collect()
    assert [(r.doc_id, r.pr_q12) for r in got] == expected
    for r in got:
        assert r.degree == deg[r.doc_id]


def test_pagerank_star_graph(spark):
    """Star graph: the hub must out-rank every leaf."""
    from goe_spark.queries import training as T

    star = spark.createDataFrame(
        [(1, k) for k in range(2, 7)], "id1 long, id2 long"
    )
    orig = T.minhash_lsh_pairs
    try:
        T.minhash_lsh_pairs = lambda s, d, docs=None: star
        rows = T.pagerank_dedup_graph(spark, "ignored").collect()
    finally:
        T.minhash_lsh_pairs = orig
    by_id = {r.doc_id: r for r in rows}
    hub, leaves = by_id[1], [by_id[k] for k in range(2, 7)]
    assert hub.degree == 5
    assert all(hub.pr_q12 > leaf.pr_q12 for leaf in leaves)
    # leaves are symmetric: identical rank
    assert len({leaf.pr_q12 for leaf in leaves}) == 1


def test_triangles_clique_and_star(spark):
    """4-clique: every node has degree 3 and sits in C(3,2)=3
    triangles -> coef 1.0, node-summed triangles 12. Star: zero
    triangles, coef 0."""
    from itertools import combinations

    from goe_spark.queries import training as T

    def run(edges):
        df = spark.createDataFrame(edges, "id1 long, id2 long")
        orig = T.minhash_lsh_pairs
        try:
            T.minhash_lsh_pairs = lambda s, d, docs=None: df
            return T.dedup_graph_triangles(spark, "ignored").collect()
        finally:
            T.minhash_lsh_pairs = orig

    clique = run(list(combinations(range(1, 5), 2)))
    assert len(clique) == 1
    r = clique[0]
    assert r.deg_log2 == 1  # degree 3 -> log2 bucket 1
    assert r.n_nodes == 4
    assert r.n_triangles == 12  # 4 triangles x 3 member nodes
    assert r.mean_coef == 1.0

    star = run([(1, k) for k in range(2, 7)])
    assert sum(r.n_triangles for r in star) == 0
    for r in star:
        assert r.mean_coef == 0.0


def test_embedding_norm_outliers_crafted(spark):
    """20 healthy vectors (all 0.5^16 -> bucket 400), one zeroed and
    one 6x-scaled: both corrupt rows must be flagged, healthy none."""
    from goe_spark.queries import similarity as S

    healthy = [0.5] * 16
    rows = [(i, healthy, "a") for i in range(20)]
    rows.append((100, [0.0] * 16, "a"))
    rows.append((101, [3.0] * 16, "a"))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    import goe_spark.catalog as cat

    orig = cat.load_table
    try:
        cat.load_table = (
            lambda s, d, n: df if n == "embeddings" else orig(s, d, n)
        )
        S.load_table = cat.load_table
        got = S.embedding_norm_outliers(spark, "ignored").collect()
    finally:
        cat.load_table = orig
        S.load_table = orig
    assert len(got) == 1
    r = got[0]
    assert r.n_vecs == 22
    assert r.med_bucket == 400  # (0.5e6)^2 * 16 / 1e10
    assert r.mad_bucket == 0
    assert r.n_outliers == 2
    assert r.max_dev_bucket == 14000  # the 3.0-scaled vector


def test_embedding_norm_outliers_fixture_invariants(spark):
    from goe_spark.queries.similarity import embedding_norm_outliers

    rows = embedding_norm_outliers(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_outliers <= r.n_vecs
        assert r.mad_bucket >= 0
        assert r.max_dev_bucket >= r.mad_bucket
        assert 0 <= r.outlier_share <= 1


def test_containment_blocking_respects_df_cap(spark):
    """Every emitted pair must share at least one rare shingle — a
    pair whose ONLY common shingles are boilerplate (df > cap) is
    unreachable by construction. Verified indirectly: candidates all
    have n_common >= 1."""
    from goe_spark.queries.dedup import shingle_containment_pairs

    rows = shingle_containment_pairs(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_common >= 1
        assert r.containment >= 0.5
        assert r.relation in ("left_in_right", "right_in_left", "same_size")
