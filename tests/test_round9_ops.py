"""Edge-case pins for the round-9 operators — semantic invariants the
sf0.01 oracle hash can't distinguish from luck (planted duplicates,
version boundaries, graph parity, entropy bounds, monotone growth)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


# --- line_dedup_stats -------------------------------------------------------


def test_line_dedup_planted_duplicates(spark, tmp_path):
    """Two docs sharing one exact 10-word line (and nothing else)
    must each report exactly one duplicated line; a unique doc none."""
    from goe_spark.queries.dedup import line_dedup_stats

    shared = " ".join(f"w{i}" for i in range(10))
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(10))
    uniq_c = " ".join(f"c{i}" for i in range(10))
    rows = [
        (0, shared + " " + uniq_a, "en", "s1", 0),
        (1, shared + " " + uniq_b, "en", "s2", 0),
        (2, uniq_c, "en", "s3", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(d + "/documents.parquet")
    got = {
        r.source: r
        for r in line_dedup_stats(spark, d).collect()
    }
    assert got["s1"].n_lines == 2 and got["s1"].n_dup_lines == 1
    assert got["s2"].n_lines == 2 and got["s2"].n_dup_lines == 1
    assert got["s3"].n_lines == 1 and got["s3"].n_dup_lines == 0
    assert got["s3"].dup_lines_per_10k == 0
    assert got["s1"].dup_lines_per_10k == 5000


# --- scd2_event_type_history ------------------------------------------------


def test_scd2_versions_collapse_runs(spark, tmp_path):
    """A user's stream a,a,b,a must yield versions a,b,a (3 versions,
    1 open) — consecutive runs collapse, revisits reopen."""
    import datetime as dt

    from goe_spark.queries.events_analytics import scd2_event_type_history

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "a", 0.0, "{}"),
        (2, t0 + dt.timedelta(seconds=10), 7, "a", 0.0, "{}"),
        (3, t0 + dt.timedelta(seconds=20), 7, "b", 0.0, "{}"),
        (4, t0 + dt.timedelta(seconds=50), 7, "a", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "ev")
    df.coalesce(1).write.parquet(d + "/events.parquet")
    got = {r.event_type: r for r in scd2_event_type_history(spark, d).collect()}
    assert got["a"].n_versions == 2  # [t0, t0+20) and [t0+50, open)
    assert got["a"].n_open == 1
    assert got["a"].closed_dwell_us == 20_000_000
    assert got["b"].n_versions == 1 and got["b"].n_open == 0
    assert got["b"].closed_dwell_us == 30_000_000


# --- event_trigram_topk -----------------------------------------------------


def test_event_trigrams_counts(spark, tmp_path):
    """Stream v,c,p,v over one user -> trigrams (v,c,p) and (c,p,v)."""
    import datetime as dt

    from goe_spark.queries.events_analytics import event_trigram_topk

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(seconds=i), 1, t, 0.0, "{}")
        for i, t in enumerate(["v", "c", "p", "v"])
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "ev3")
    df.coalesce(1).write.parquet(d + "/events.parquet")
    got = {(r.e1, r.e2, r.e3): r.n for r in event_trigram_topk(spark, d).collect()}
    assert got == {("v", "c", "p"): 1, ("c", "p", "v"): 1}


# --- knn_graph_stats --------------------------------------------------------


def test_knn_graph_invariants(spark):
    """Mutual edges come in (a->b, b->a) pairs, so n_mutual is even;
    every vertex has at most K out-edges; reciprocity in [0, 1e4]."""
    from goe_spark.queries.similarity import KNN_GRAPH_K, knn_graph_stats

    rows = knn_graph_stats(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_mutual % 2 == 0
        assert r.n_edges <= r.n_vertices * KNN_GRAPH_K
        assert 0 <= r.reciprocity_q4 <= 10_000
        assert -1_000_000 <= r.mean_cosine_q6 <= 1_000_000


# --- token_entropy_by_source ------------------------------------------------


def test_entropy_bounds(spark):
    """0 <= H <= ln(n_terms) (uniform bound), scaled to q4."""
    import math

    from goe_spark.queries.text import token_entropy_by_source

    for r in token_entropy_by_source(spark, SF).collect():
        assert 0 <= r.entropy_q4 <= math.log(r.n_terms) * 1e4 + 1


def test_entropy_single_repeated_token(spark, tmp_path):
    """A source that is one token repeated has entropy exactly 0."""
    from goe_spark.queries.text import token_entropy_by_source

    df = spark.createDataFrame(
        [(0, "x x x x x", "en", "mono", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "docs1")
    df.coalesce(1).write.parquet(d + "/documents.parquet")
    (r,) = token_entropy_by_source(spark, d).collect()
    assert (r.n_tokens, r.n_terms, r.entropy_q4) == (5, 1, 0)


# --- vocab_overlap_sources --------------------------------------------------


def test_vocab_overlap_identical_and_disjoint(spark, tmp_path):
    """Identical vocabularies -> Jaccard 1e6; disjoint absent from the
    pair list (no common token joins them)."""
    from goe_spark.queries.text import vocab_overlap_sources

    rows = [
        (0, "p q r", "en", "sa", 5),
        (1, "p q r", "en", "sb", 5),
        (2, "x y z", "en", "sc", 5),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "docs2")
    df.coalesce(1).write.parquet(d + "/documents.parquet")
    got = {(r.source_a, r.source_b): r for r in vocab_overlap_sources(spark, d).collect()}
    assert set(got) == {("sa", "sb")}
    assert got[("sa", "sb")].jaccard_q6 == 1_000_000
    assert got[("sa", "sb")].n_common == 3


# --- vocab_growth_curve -----------------------------------------------------


def test_vocab_growth_monotone_and_complete(spark):
    """cum_vocab is non-decreasing and ends at the corpus vocabulary
    size; shard 0's new types equal its distinct types."""
    from goe_spark.catalog import load_table
    from goe_spark.functions import text as T
    from goe_spark.queries.training import vocab_growth_curve

    rows = sorted(vocab_growth_curve(spark, SF).collect(), key=lambda r: r.shard)
    cums = [r.cum_vocab for r in rows]
    assert cums == sorted(cums)
    total_vocab = (
        load_table(spark, SF, "documents")
        .select(F.explode(T.tokens("text")).alias("t"))
        .agg(F.count_distinct("t"))
        .collect()[0][0]
    )
    assert cums[-1] == total_vocab
    assert sum(r.n_new_types for r in rows) == total_vocab


# --- embedding_dimension_stats ---------------------------------------------


def test_embedding_dimension_stats_shape(spark):
    """One row per dimension, equal n everywhere, variance >= 0."""
    from goe_spark.queries.similarity import embedding_dimension_stats

    rows = embedding_dimension_stats(spark, SF).collect()
    assert len(rows) == 64
    assert {r.dim for r in rows} == set(range(1, 65))
    assert len({r.n for r in rows}) == 1
    assert all(r.var_q6 >= 0 for r in rows)


# --- cross_lang_shingle_leakage ---------------------------------------------


def test_cross_lang_planted_leak(spark, tmp_path):
    """The same 3-word shingle planted under two langs is counted as
    shared by both; a lang with unique text reports zero shared."""
    from goe_spark.queries.dedup import cross_lang_shingle_leakage

    rows = [
        (0, "alpha beta gamma", "en", "s", 16),
        (1, "alpha beta gamma", "fr", "s", 16),
        (2, "uno dos tres", "es", "s", 12),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "docs3")
    df.coalesce(1).write.parquet(d + "/documents.parquet")
    got = {r.lang: r for r in cross_lang_shingle_leakage(spark, d).collect()}
    assert got["en"].n_shared == 1 and got["fr"].n_shared == 1
    assert got["es"].n_shared == 0
    assert got["en"].shared_per_10k == 10_000


def test_knn_graph_ivf_cells_invariants(spark):
    """IVF-cell variant: cells are the quantizer's 0..N_CELLS-1, the
    mutual-edge parity and degree bounds hold, and every embedding
    lands in exactly one cell (vertex total == corpus size when every
    sub-bucket has >= 2 members, else <=)."""
    from goe_spark.catalog import load_table
    from goe_spark.operators.ivf import N_CELLS
    from goe_spark.queries.similarity import (
        KNN_GRAPH_K,
        knn_graph_ivf_stats,
    )

    rows = knn_graph_ivf_stats(spark, SF).collect()
    assert rows
    n_emb = load_table(spark, SF, "embeddings").count()
    assert {r.cell for r in rows} <= set(range(N_CELLS))
    assert sum(r.n_vertices for r in rows) <= n_emb
    for r in rows:
        assert r.n_mutual % 2 == 0
        assert r.n_edges <= r.n_vertices * KNN_GRAPH_K
        assert 0 <= r.reciprocity_q4 <= 10_000


# --- embedding_gram_summary -------------------------------------------------


def test_gram_matches_numpy_and_feeds_pca(spark):
    """The distributed exact-integer Gram equals numpy's dense
    V_q^T V_q bit-for-bit (diag + offdiag mass), and its collected
    64x64 feeds eigh for the PCA variance-explained consumer —
    eigenvalues non-negative, top-8 share in (0, 1]."""
    import numpy as np

    from goe_spark.catalog import load_table
    from goe_spark.queries.similarity import GRAM_Q, embedding_gram_summary

    rows = {
        r.dim: r for r in embedding_gram_summary(spark, SF).collect()
    }
    emb = load_table(spark, SF, "embeddings").select("embedding").collect()
    V = np.asarray([np.asarray(r.embedding, dtype=np.float64) for r in emb])
    Vq = np.floor(V * GRAM_Q + 0.5).astype(np.int64)
    G = Vq.T @ Vq
    assert len(rows) == 64
    for d in range(64):
        assert rows[d + 1].gram_diag == float(G[d, d])
        off = int(np.abs(G[d]).sum() - abs(G[d, d]))
        assert rows[d + 1].offdiag_abs_mass == float(off)
    # PCA consumer: symmetric PSD up to quantization, top-8 share
    evals = np.linalg.eigvalsh(G.astype(np.float64))
    assert evals.min() >= -1e-6 * evals.max()
    share = evals[-8:].sum() / evals.sum()
    assert 0 < share <= 1


# --- BPE round-trip ---------------------------------------------------------


def test_bpe_encode_decode_roundtrip(spark):
    """Tokenizer losslessness: after applying every learned merge,
    concatenating a word's symbols reproduces the word exactly, for
    the ENTIRE corpus vocabulary — encode is a partition of the
    character sequence, never a rewrite."""
    from goe_spark.catalog import load_table
    from goe_spark.functions import text as T
    from goe_spark.queries.training import _fold_merge, bpe_train_merges

    merges = [
        (r.left, r.right)
        for r in sorted(
            bpe_train_merges(spark, SF).collect(), key=lambda r: r.step
        )
    ]
    assert merges  # training produced a merge table
    d = load_table(spark, SF, "documents")
    words = (
        d.select(F.explode(T.tokens(F.col("text"))).alias("w"))
        .where(F.length("w") > 0)
        .distinct()
    )
    syms = F.split("w", "")
    for left, right in merges:
        syms = _fold_merge(syms, left, right)
    bad = words.where(
        F.array_join(syms, "") != F.col("w")
    ).count()
    assert bad == 0
    # and the merges genuinely fired: some word has fewer symbols
    # than characters
    compressed = words.where(F.size(syms) < F.length("w")).count()
    assert compressed > 0


# --- zipf_slope_fit / quality_calibration_bins ------------------------------


def test_zipf_fit_matches_numpy_polyfit(spark):
    """The exact-sum closed form agrees with numpy's least squares on
    the same (ln rank, ln count) points to the q6 grid, slope is
    negative (frequencies decay), and R^2 is in (0, 1]."""
    import numpy as np

    from goe_spark.catalog import load_table
    from goe_spark.functions import text as T
    from goe_spark.queries.text import ZIPF_Q, ZIPF_TOP_N, zipf_slope_fit

    (row,) = zipf_slope_fit(spark, SF).collect()
    assert row.slope_q6 < 0
    assert 0 < row.r2_q4 <= 10_000
    assert row.top_mass <= row.total_mass
    counts = (
        load_table(spark, SF, "documents")
        .select(F.explode(T.tokens("text")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("t"))
        .limit(ZIPF_TOP_N)
        .collect()
    )
    x = np.floor(np.log(np.arange(1, len(counts) + 1)) * ZIPF_Q) / ZIPF_Q
    y = np.floor(np.log([r.c for r in counts]) * ZIPF_Q) / ZIPF_Q
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(row.slope_q6 / 1e6 - slope) < 1e-4
    assert abs(row.intercept_q6 / 1e6 - intercept) < 1e-4


def test_quality_calibration_partitions_corpus(spark):
    """Bins partition the corpus: doc counts sum to the table size,
    dup docs never exceed bin size, bins lie in 0..9."""
    from goe_spark.catalog import load_table
    from goe_spark.queries.text import quality_calibration_bins

    rows = quality_calibration_bins(spark, SF).collect()
    n = load_table(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == n
    assert all(0 <= r.q_bin <= 9 for r in rows)
    assert all(0 <= r.n_dup_docs <= r.n_docs for r in rows)
    assert all(0 <= r.dup_per_10k <= 10_000 for r in rows)


# --- dedup_cluster_source_mix -----------------------------------------------


def test_cluster_source_mix_consistency(spark):
    """Single + cross source cluster counts partition the cluster
    set; clustered docs and cluster count agree with dedup_clusters;
    max source spread is at least 1 and bounded by the source count."""
    from goe_spark.queries.training import (
        dedup_cluster_source_mix,
        dedup_clusters,
    )

    (row,) = dedup_cluster_source_mix(spark, SF).collect()
    clusters = dedup_clusters(spark, SF).collect()
    assert row.n_clusters == len(clusters)
    assert row.n_clustered_docs == sum(c.n_docs for c in clusters)
    assert row.n_single_source + row.n_cross_source == row.n_clusters
    assert 1 <= row.max_sources <= 20
    assert 0 <= row.cross_per_10k <= 10_000
