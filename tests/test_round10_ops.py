"""Semantic pins for the round-10 operators (oracle hash parity is
covered by test_queries_oracle; these pin the mathematical contracts:
estimator-error bounds, KL non-negativity, percentile ordering,
correlation range, gap accounting)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_minhash_calibration_contract(spark):
    from goe_spark.queries.dedup import minhash_calibration_bins

    rows = minhash_calibration_bins(spark, SF_SMALL).collect()
    assert rows, "LSH candidates must exist in the fixture corpus"
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0 <= r.mean_est_q6 <= 1_000_000
        assert 0 <= r.mean_exact_q6 <= 1_000_000
        # a 16-permutation estimator's mean |error| stays well under
        # 0.5 on any candidate population
        assert r.mean_abs_err_q6 < 500_000
        # bands agree between 1 (candidates share >= 1 band by
        # construction... per-pair; the MEAN can exceed 1e4) and 4
        assert 10_000 <= r.mean_bands_q4 <= 40_000
    # the banding S-curve rises with exact Jaccard — compared only
    # between POPULATED bins (a 1-pair bin is a single estimator
    # sample and can sit above its neighbor, as bin 8 does at sf0.01)
    solid = {r.bin: r for r in rows if r.n_pairs >= 5}
    if len(solid) >= 2:
        lo, hi = min(solid), max(solid)
        assert solid[hi].mean_bands_q4 >= solid[lo].mean_bands_q4
        assert solid[hi].mean_est_q6 > solid[lo].mean_est_q6


def test_unigram_kl_nonnegative_and_complete(spark):
    from goe_spark.queries.text import KL_VOCAB_TOP_K, unigram_kl_matrix

    rows = unigram_kl_matrix(spark, SF_SMALL).collect()
    n_sources = 20
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        assert r.source_a < r.source_b
        # KL >= 0 up to the per-token floor quantization (each of the
        # <= K tokens can lose < 1 q12 unit)
        assert r.kl_ab_q12 >= -KL_VOCAB_TOP_K
        assert r.kl_ba_q12 >= -KL_VOCAB_TOP_K


def test_audio_duration_bins_accounting(spark):
    from goe_spark.catalog import load_table
    from goe_spark.queries.multimodal import media_audio_duration_bins

    rows = media_audio_duration_bins(spark, SF_SMALL).collect()
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert sum(r.n_clips for r in rows) == n_docs
    assert len(rows) > 3, "frame spread must populate several bins"
    for r in rows:
        assert r.bin >= 0
        assert 100 * r.bin <= r.min_ms <= r.max_ms < 100 * (r.bin + 1)
        assert 0 <= r.n_stereo <= r.n_clips
        assert 0 <= r.n_16bit <= r.n_clips


def test_quantity_percentiles_ordered_and_exact(spark):
    from goe_spark.catalog import load_table
    from goe_spark.queries.relational3 import quantity_exact_percentiles

    rows = quantity_exact_percentiles(spark, SF_SMALL).collect()
    li = (
        load_table(spark, SF_SMALL, "lineitem")
        .select("l_returnflag", F.col("l_quantity").cast("int").alias("q"))
        .collect()
    )
    for r in rows:
        qs = sorted(x.q for x in li if x.l_returnflag == r.l_returnflag)
        assert r.n_lines == len(qs)
        # the inverted-CDF definition, checked against a plain sort
        import math

        assert r.q_p50 == qs[math.ceil(len(qs) * 0.5) - 1]
        assert r.q_p90 == qs[math.ceil(len(qs) * 0.9) - 1]
        assert r.q_p99 == qs[math.ceil(len(qs) * 0.99) - 1]
        assert r.q_min <= r.q_p50 <= r.q_p90 <= r.q_p99 <= r.q_max


def test_quality_length_corr_range(spark):
    from goe_spark.queries.text import doc_quality_length_corr

    rows = doc_quality_length_corr(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert -1_000_000 <= r.corr_q6 <= 1_000_000
    # the composite score is 50% length-driven: correlation with
    # length must be strongly positive on the fixture
    assert max(r.corr_q6 for r in rows) > 300_000


def test_interarrival_gap_accounting(spark):
    from goe_spark.catalog import load_table
    from goe_spark.queries.events_analytics import (
        interarrival_log2_histogram,
    )

    rows = interarrival_log2_histogram(spark, SF_SMALL).collect()
    e = load_table(spark, SF_SMALL, "events")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    # every event except each user's first contributes exactly one gap
    assert sum(r.n_gaps for r in rows) == n_events - n_users
    for r in rows:
        assert r.log2_bucket >= -1
        if r.log2_bucket >= 0:
            # bucket b holds gaps in [2^b, 2^(b+1))
            assert 2**r.log2_bucket <= r.min_us
            assert r.max_us < 2 ** (r.log2_bucket + 1)


def test_quality_ks_exact_vs_scipy_style(spark):
    """The cross-multiplied-integer KS equals the classic max
    |ECDF_a - ECDF_b| computed driver-side on the same bucketed
    scores, and is bounded in [0, 1e6]."""
    from goe_spark.catalog import load_table
    from goe_spark.functions.text import quality_score
    from goe_spark.queries.text import quality_ks_drift

    rows = quality_ks_drift(spark, SF_SMALL).collect()
    n_sources = 20
    assert len(rows) == n_sources * (n_sources - 1) // 2
    scored = (
        load_table(spark, SF_SMALL, "documents")
        .select(
            "source",
            F.floor(quality_score("text") * 1000).cast("int").alias("b"),
        )
        .collect()
    )
    from collections import defaultdict

    per = defaultdict(list)
    for r in scored:
        per[r.source].append(r.b)
    import bisect

    checked = 0
    for r in rows[:12]:
        xa = sorted(per[r.source_a])
        xb = sorted(per[r.source_b])
        grid = sorted(set(xa) | set(xb))
        ks = max(
            abs(
                bisect.bisect_right(xa, g) / len(xa)
                - bisect.bisect_right(xb, g) / len(xb)
            )
            for g in grid
        )
        assert 0 <= r.ks_q6 <= 1_000_000
        assert r.ks_q6 == int(ks * 1_000_000) or abs(
            r.ks_q6 - ks * 1_000_000
        ) < 1.0
        checked += 1
    assert checked == 12


def test_positional_entropy_bounds(spark):
    from goe_spark.catalog import load_table
    from goe_spark.queries.text import (
        POSITIONAL_P,
        positional_entropy_profile,
    )

    rows = positional_entropy_profile(spark, SF_SMALL).collect()
    assert {r.pos for r in rows} == set(range(POSITIONAL_P))
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    import math

    for r in rows:
        assert 1 <= r.n_terms <= r.n_docs <= n_docs
        # 0 <= H <= ln(n_terms)
        assert 0 <= r.entropy_q4 <= int(math.log(max(r.n_terms, 2)) * 1e4) + 1


def test_dedup_chain_density_contract(spark):
    from goe_spark.queries.training import dedup_chain_audit

    rows = dedup_chain_audit(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 < r.mean_density_q4 <= 10_000
        assert 0 < r.min_density_q4 <= 10_000
        assert 0 <= r.n_chained <= r.n_clusters
        if r.log2_size == 1:
            # size-2 clusters are cliques by definition
            assert r.min_density_q4 == 10_000 and r.n_chained == 0


def test_centroid_shift_matches_numpy(spark):
    """Centroid pairwise cosine/norm-ratio equals a numpy computation
    over the same vectors (float64), within the q6 grid."""
    import numpy as np

    from goe_spark.catalog import load_table
    from goe_spark.queries.similarity import embedding_centroid_shift

    rows = embedding_centroid_shift(spark, SF_SMALL).collect()
    assert rows
    emb = load_table(spark, SF_SMALL, "embeddings").collect()
    by_label = {}
    for r in emb:
        by_label.setdefault(r.label, []).append(np.array(r.embedding, dtype=np.float64))
    cents = {k: np.mean(np.stack(v), axis=0) for k, v in by_label.items()}
    n_labels = len(cents)
    assert len(rows) == n_labels * (n_labels - 1) // 2
    for r in rows[:10]:
        ca, cb = cents[r.label_a], cents[r.label_b]
        cos = float(ca @ cb / (np.linalg.norm(ca) * np.linalg.norm(cb)))
        ratio = float(
            min(np.linalg.norm(ca), np.linalg.norm(cb))
            / max(np.linalg.norm(ca), np.linalg.norm(cb))
        )
        assert abs(r.cos_q6 - cos * 1e6) <= 2
        assert abs(r.norm_ratio_q6 - ratio * 1e6) <= 2
        assert r.n_a == len(by_label[r.label_a])
