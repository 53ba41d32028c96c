"""Training-pipeline operators (queries/training.py): cluster
resolution transitivity, deterministic sampling, and packing
invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from goe_spark.queries.training import (
    PACK_BUDGET_TOKENS,
    dedup_clusters,
    token_pack_bins,
)
from tests.conftest import SF_SMALL


def test_clusters_are_transitive(spark, tmp_path):
    """A-B and B-C near-dup pairs must resolve to ONE cluster of 3 —
    the property pairwise dedup alone cannot give you."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base + " one", "en", "web", 1),
        (2, base + " two", "en", "web", 1),  # pairs with 1 and 3
        (3, base + " three", "en", "web", 1),
        (100, "completely different text with other words entirely", "en", "web", 1),
    ]
    d = tmp_path / "t"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    got = {r.cluster_id: r.n_docs for r in dedup_clusters(spark, str(d)).collect()}
    assert got == {1: 3}  # one cluster, labeled by min doc_id


def test_driver_and_distributed_cc_agree(spark, monkeypatch):
    """The size-gated driver union-find and the distributed min-label
    loop must produce identical (node, label) sets — forcing the cap
    to 0 exercises the 100 TB loop path on the same input."""
    from goe_spark.queries import training

    fast = sorted(map(tuple, training._cc_labels(spark, SF_SMALL).collect()))
    monkeypatch.setattr(training, "CC_DRIVER_EDGE_CAP", -1)
    slow = sorted(map(tuple, training._cc_labels(spark, SF_SMALL).collect()))
    assert fast == slow and fast


def test_every_doc_in_exactly_one_bin(spark):
    """Packing partitions the corpus: bin doc counts sum to the doc
    count, and every doc with a text lands somewhere."""
    from goe_spark.catalog import load_table

    total_docs = load_table(spark, SF_SMALL, "documents").count()
    got = token_pack_bins(spark, SF_SMALL)
    assert got.agg(F.sum("n_docs")).first()[0] == total_docs
    # A bin can exceed the budget only via its last (straddling) doc;
    # average fill must be within budget + the max single doc.
    row = got.first()
    assert row.n_bins > 0 and row.avg_bin_tokens > 0


def test_sampling_is_deterministic(spark):
    from goe_spark.queries.training import stratified_sample_docs

    a = stratified_sample_docs(spark, SF_SMALL).collect()
    b = stratified_sample_docs(spark, SF_SMALL).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    for r in a:
        assert 0 <= r.n_sampled <= r.n_total


def test_keep_best_picks_cluster_quality_argmax(spark, tmp_path):
    """The survivor of each cluster is the quality argmax among that
    cluster's ACTUAL members (ties to lowest doc_id), and everyone
    else is counted dropped."""
    from goe_spark.functions.text import quality_score
    from goe_spark.queries.training import _cc_labels, dedup_keep_best

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base + " end1", "en", "web", 1),
        (2, base + " end2.", "en", "web", 1),  # punctuation tweaks quality
        (3, base + " end3", "en", "web", 1),
        (100, "completely different text with other words entirely", "en", "web", 1),
    ]
    d = tmp_path / "t"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))

    q = {
        r.doc_id: round(r.q, 6)
        for r in spark.read.parquet(str(d / "documents.parquet"))
        .select("doc_id", quality_score("text").alias("q"))
        .collect()
    }
    members: dict[int, list[int]] = {}
    for r in _cc_labels(spark, str(d)).collect():
        members.setdefault(r.label, []).append(r.node)
    assert members, "fixture produced no near-dup cluster"

    out = {r.cluster_id: r for r in dedup_keep_best(spark, str(d)).collect()}
    assert set(out) == set(members)
    for cid, nodes in members.items():
        best = max(nodes, key=lambda k: (q[k], -k))
        assert out[cid].keep_doc_id == best
        assert out[cid].n_dropped == len(nodes) - 1
        assert out[cid].keep_quality == q[best]


def test_contamination_detects_planted_leak(spark, tmp_path):
    """A training doc that copies an eval doc's text must surface,
    clean training docs must not, and the eval side must be the
    broadcast build side (the 100 TB property)."""
    from goe_spark.queries.training import EVAL_SOURCE, contamination_check

    eval_text = (
        "the quick brown fox jumps over the lazy dog near the river bank"
    )
    rows = [
        (1, eval_text, "en", EVAL_SOURCE, 1),
        (2, eval_text + " copied with a tiny suffix", "en", "src5", 1),
        (3, "a totally unrelated training document about other topics "
            "entirely different words", "en", "src5", 1),
    ]
    d = tmp_path / "t"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))

    df = contamination_check(spark, str(d))
    got = {r.doc_id: r for r in df.collect()}
    assert 2 in got and got[2].n_eval_docs == 1
    assert got[2].max_shared_shingles >= 5
    assert 3 not in got

    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_repetition_flags_degenerate_doc(spark, tmp_path):
    """A doc that is one word repeated must be flagged (top-word
    fraction 1.0, distinct ratio ~0); a diverse doc must not be."""
    from goe_spark.queries.text import repetition_doc_stats

    rows = [
        (1, "spam " * 40 + "spam", "en", "bad", 1),
        (2, "one two three four five six seven eight nine ten", "en", "good", 1),
    ]
    d = tmp_path / "t"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    got = {r.source: r for r in repetition_doc_stats(spark, str(d)).collect()}
    assert got["bad"].n_flagged == 1
    assert got["bad"].avg_top_word_frac == 1.0
    assert got["good"].n_flagged == 0
    assert got["good"].avg_distinct_ratio == 1.0


def test_pmi_finds_planted_collocation(spark, tmp_path):
    """A word pair that ONLY occurs adjacent scores the corpus-max
    PMI; a pair of independently shuffled words scores near zero."""
    from goe_spark.queries.text import term_bigram_pmi

    filler = "a b c d e f g h i j"
    rows = [
        (i, f"{filler} hong kong {filler}", "en", "web", 1) for i in range(30)
    ]
    d = tmp_path / "t"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    got = term_bigram_pmi(spark, str(d)).collect()
    by_pmi = sorted(got, key=lambda r: -r.pmi)
    assert by_pmi[0].bigram == "hong kong"


def test_sliding_chunks_closed_form(spark, tmp_path):
    """Chunk counts match ceil((n - W) / S) + 1 and every token is
    covered by at least one window."""
    import math

    from goe_spark.queries.training import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        sliding_window_chunks,
    )

    sizes = {"en": 10, "de": 32, "fr": 33, "es": 100}
    rows = [
        (i, " ".join(f"w{j}" for j in range(n)), lang, "s", 1)
        for i, (lang, n) in enumerate(sizes.items())
    ]
    d = tmp_path / "t"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    got = {r.lang: r for r in sliding_window_chunks(spark, str(d)).collect()}
    for lang, n in sizes.items():
        expect = (
            1
            if n <= CHUNK_TOKENS
            else math.ceil((n - CHUNK_TOKENS) / CHUNK_STRIDE) + 1
        )
        assert got[lang].n_chunks == expect, lang
        # Last window reaches the end of the doc: effective tokens of
        # the final chunk cover through token n.
        assert got[lang].effective_tokens >= n


def test_mixture_weights_sum_to_one(spark):
    from goe_spark.queries.training import (
        EPOCH_SAMPLE_DOCS,
        mixture_weights,
    )

    got = mixture_weights(spark, SF_SMALL).collect()
    assert abs(sum(r.weight for r in got) - 1.0) < 1e-4
    assert sum(r.epoch_docs for r in got) <= EPOCH_SAMPLE_DOCS
    # Temperature flattening: every source's weight is positive.
    assert all(r.weight > 0 for r in got)


def test_mixture_sample_exact_spends_budget(spark):
    """The exact (window) sampler: every source's selected tokens
    reach its budget (the first doc past the boundary is included by
    the exclusive-cumsum rule, so spend >= budget) without overshooting
    by more than one document."""
    from goe_spark.queries.training import mixture_sample_docs

    got = mixture_sample_docs(spark, SF_SMALL).collect()
    assert got
    for r in got:
        assert r.tokens_selected >= min(r.budget_tokens, 1)
        # overshoot bounded by one doc: selected minus last doc < budget
        per_doc_max = r.tokens_selected / max(r.n_docs_selected, 1)
        assert r.tokens_selected - r.budget_tokens <= max(
            4 * per_doc_max, 600
        )


def test_mixture_threshold_tracks_exact_budget(spark):
    """The map-side threshold sampler lands within sampling error of
    the SAME budgets the exact sampler spends — the scale form is
    pinned against its semantic spec."""
    from goe_spark.queries.training import (
        mixture_sample_docs,
        mixture_sample_threshold,
    )

    exact = {r.source: r for r in mixture_sample_docs(spark, SF_SMALL).collect()}
    approx = {
        r.source: r
        for r in mixture_sample_threshold(spark, SF_SMALL).collect()
    }
    assert set(approx) == set(exact)
    for s, a in approx.items():
        e = exact[s]
        assert a.budget_tokens == e.budget_tokens  # same budget calc
        # When the budget exceeds the source's whole supply both forms
        # select everything (spend == supply, exactly equal); when the
        # budget binds, the threshold spend is binomial around the
        # exact spend — allow sampling error.
        assert abs(a.tokens_selected - e.tokens_selected) <= max(
            0.5 * e.tokens_selected, 800
        )


def test_weighted_sample_deterministic_and_biased(spark):
    """A-ES weighted sampling: exactly N rows, bit-identical on
    re-run (no RNG state anywhere), keys positive and sorted, and the
    weights actually bias the draw — the sampled mean doc length
    exceeds the corpus mean (chars are the weight)."""
    from pyspark.sql import functions as F

    from goe_spark.catalog import load_table
    from goe_spark.queries.training import (
        WEIGHTED_SAMPLE_N,
        weighted_sample_docs,
    )

    a = weighted_sample_docs(spark, SF_SMALL).collect()
    b = weighted_sample_docs(spark, SF_SMALL).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == WEIGHTED_SAMPLE_N
    keys = [r.k for r in a]
    assert keys == sorted(keys) and all(k > 0 for k in keys)
    corpus_mean = (
        load_table(spark, SF_SMALL, "documents")
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    sample_mean = sum(r.n_chars for r in a) / len(a)
    assert sample_mean > corpus_mean


def test_classifier_training_learns_and_feeds_inference(spark):
    """The fixed-point trainer's absolute error must fall across
    epochs, and the learned weights must plug straight into the SAME
    scoring fold classifier_scores uses (classifier_logit_from_tokens)
    and beat the majority-class baseline on the training labels."""
    from goe_spark.catalog import load_table
    from goe_spark.functions.classifier import (
        CLS_LABEL_Q,
        classifier_logit_from_tokens,
        train_classifier_epochs,
    )
    from goe_spark.functions.text import quality_score, tokens

    d = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    w, rows = train_classifier_epochs(d)
    assert len(w) == 1024 and all(isinstance(x, int) for x in w)
    assert len(rows) == 3
    # squared-error mass must not increase over full-batch epochs on
    # the training set (monotone for this step size on this fixture)
    saes = [r[4] for r in rows]
    assert saes[-1] < saes[0]
    # learned weights through the INFERENCE path: accuracy >= majority
    scored = (
        d.select(
            tokens(F.col("text")).alias("toks"),
            (quality_score("text") >= F.lit(CLS_LABEL_Q))
            .cast("int")
            .alias("y"),
        )
        .where(F.size("toks") > 0)
        .select(
            "y",
            classifier_logit_from_tokens(F.col("toks"), w).alias("z"),
        )
    )
    m = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("npos"),
        F.sum(
            ((F.col("z") >= 0).cast("int") == F.col("y")).cast("long")
        ).alias("ncorrect"),
    ).first()
    majority = max(int(m["npos"]), int(m["n"]) - int(m["npos"]))
    assert int(m["ncorrect"]) >= majority
    # and the post-epoch-3 forward pass equals what the trainer would
    # see: epoch metrics used PRE-update weights, so accuracy with the
    # final weights must be >= the last recorded forward pass
    assert int(m["ncorrect"]) >= rows[-1][3]
