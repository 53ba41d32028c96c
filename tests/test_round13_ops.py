"""Invariant pins for the round-13 operators.

The oracle rows prove Spark==DuckDB; these tests pin the SEMANTICS —
accounting identities and monotonicities that both engines could get
identically wrong — on the sf0.001 fixture.
"""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_dedup_stage_overlap_invariants(spark):
    """Unique reclaim never exceeds standalone reclaim; the FIRST
    stage's unique reclaim equals its standalone reclaim (nothing
    runs before it); total unique reclaim is bounded by the corpus
    token mass."""
    from pyspark.sql import functions as F

    from goe_spark.catalog import load_table
    from goe_spark.queries.dedup import dedup_stage_overlap

    rows = {
        r.stage_ord: r
        for r in dedup_stage_overlap(spark, SF_SMALL).collect()
    }
    assert set(rows) == set(range(1, 8))
    for r in rows.values():
        assert 0 <= r.tokens_unique <= r.tokens_standalone, r
        assert r.tokens_overlap == r.tokens_standalone - r.tokens_unique
    assert rows[1].tokens_unique == rows[1].tokens_standalone
    corpus_tokens = (
        load_table(spark, SF_SMALL, "documents")
        .select(F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
        .agg(F.sum("n"))
        .first()[0]
    )
    assert sum(r.tokens_unique for r in rows.values()) <= corpus_tokens


def test_packing_waste_curve_invariants(spark):
    """Concat packing never needs more sequences than pad packing;
    waste and fragmentation rates stay inside their ranges; pad
    accounting closes (seqs * L = tokens + waste)."""
    from goe_spark.queries.training import packing_waste_curve

    rows = packing_waste_curve(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.concat_seqs <= r.pad_seqs, r
        assert r.pad_waste >= 0 and r.concat_tail_waste >= 0
        assert 0 <= r.split_per_10k <= 10000
        assert 0 <= r.pad_waste_per_10k <= 10000
        assert r.pad_seqs * r.seq_len == r.total_tokens + r.pad_waste


def test_mixture_temperature_sweep_invariants(spark):
    """Per alpha the weights sum to ~1; at alpha=100 (proportional
    sampling) every source gets the SAME effective epochs — the
    defining property of proportional mixing."""
    from collections import defaultdict

    from goe_spark.queries.training import mixture_temperature_sweep

    rows = mixture_temperature_sweep(spark, SF_SMALL).collect()
    by_alpha = defaultdict(list)
    for r in rows:
        by_alpha[r.alpha_pct].append(r)
    assert set(by_alpha) == {25, 50, 75, 100}
    for a, rs in by_alpha.items():
        total_w = sum(r.weight for r in rs)
        assert abs(total_w - 1.0) < 1e-3, (a, total_w)
    eps = [r.effective_epochs_q6 for r in by_alpha[100]]
    assert max(eps) - min(eps) < 1e-3, eps
    # flattening: lower alpha gives the SMALLEST source a larger share
    smallest = min(by_alpha[100], key=lambda r: r.total_tokens).source
    w = {
        a: next(r.weight for r in rs if r.source == smallest)
        for a, rs in by_alpha.items()
    }
    assert w[25] >= w[50] >= w[75] >= w[100]


def test_classifier_eval_holdout_confusion_closes(spark):
    """The confusion matrix partitions the holdout at every
    threshold, and recall is monotone non-increasing in the
    threshold."""
    from goe_spark.queries.training import classifier_eval_holdout

    rows = sorted(
        classifier_eval_holdout(spark, SF_SMALL).collect(),
        key=lambda r: r.thr,
    )
    assert len(rows) == 5
    n0 = rows[0].n_holdout
    for r in rows:
        assert r.n_holdout == n0
        assert r.tp + r.fp + r.fn + r.tn == r.n_holdout
        assert r.tp + r.fn == r.n_pos
    recalls = [
        r.recall_per_10k for r in rows if r.recall_per_10k is not None
    ]
    assert recalls == sorted(recalls, reverse=True)


def test_embedding_dispersion_identity(spark):
    """mean squared distance is non-negative (== 2*(self - pair)),
    and the self-dot of unit-ish embeddings sits near 1."""
    from goe_spark.queries.similarity import embedding_dispersion_by_label

    rows = embedding_dispersion_by_label(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        if r.mean_sq_dist_q6 is not None:
            assert r.mean_sq_dist_q6 >= -1e-6, r
            got = 2 * (r.mean_self_dot_q6 - r.mean_pair_dot_q6)
            assert abs(got - r.mean_sq_dist_q6) < 5e-6, r


def test_lsh_param_sweep_truth_consistent(spark):
    """Every layout reports the same union-truth count; precision
    and recall stay in range; deeper bands never surface MORE
    candidates than 1-row bands at the same cap."""
    from goe_spark.queries.dedup import lsh_param_sweep

    rows = {
        (r.bands, r.rows_per_band): r
        for r in lsh_param_sweep(spark, SF_SMALL).collect()
    }
    truths = {r.n_truth_pairs for r in rows.values()}
    assert len(truths) == 1
    for r in rows.values():
        assert r.n_good_pairs <= r.n_candidate_pairs
        if r.precision_per_10k is not None:
            assert 0 <= r.precision_per_10k <= 10000
        if r.recall_per_10k is not None:
            assert 0 <= r.recall_per_10k <= 10000


def test_dedup_threshold_sensitivity_monotone(spark):
    """Raising the cutoff can only shrink pairs, losers and token
    mass at risk."""
    from goe_spark.queries.dedup import dedup_threshold_sensitivity

    rows = sorted(
        dedup_threshold_sensitivity(spark, SF_SMALL).collect(),
        key=lambda r: r.threshold_q3,
    )
    for a, b in zip(rows, rows[1:]):
        assert b.n_pairs <= a.n_pairs
        assert b.n_loser_docs <= a.n_loser_docs
        assert b.tokens_at_risk <= a.tokens_at_risk
        assert b.n_docs_involved <= a.n_docs_involved


def test_perplexity_bands_partition_docs(spark):
    """head/middle/tail partition each language's documents, and the
    band logprob ranges are ordered head >= middle >= tail."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from goe_spark.catalog import load_table
    from goe_spark.queries.text import perplexity_band_stats

    rows = perplexity_band_stats(spark, SF_SMALL).collect()
    by_lang = defaultdict(dict)
    for r in rows:
        by_lang[r.lang][r.band] = r
    docs_per_lang = {
        r.lang: r.n
        for r in load_table(spark, SF_SMALL, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for lang, bands in by_lang.items():
        assert sum(r.n_docs for r in bands.values()) == docs_per_lang[lang]
        if {"head", "middle", "tail"} <= set(bands):
            assert bands["head"].min_logprob >= bands["middle"].min_logprob
            assert bands["middle"].min_logprob >= bands["tail"].min_logprob


def test_bpe_fertility_accounting(spark):
    """Fertility >= 1 token per word; byte-fallback repricing never
    shrinks the token count; OOV mass is bounded by the symbol
    mass."""
    from goe_spark.queries.training import bpe_fertility_by_language

    rows = bpe_fertility_by_language(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.symbols_total >= r.n_word_occurrences  # >= 1 tok/word
        assert r.fallback_tokens_total >= r.symbols_total - r.oov_symbols_total
        assert 0 <= r.oov_symbols_total <= r.symbols_total
        assert r.tokens_per_word_q6 >= 1.0
