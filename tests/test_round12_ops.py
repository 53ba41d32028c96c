"""Round-12 operators: fixed-point power iteration, span scrub
accounting identities, URL canonicalization."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_power_iteration_properties(spark):
    """Power-iteration invariants on the real fixture: the Rayleigh
    quotient is nondecreasing across iterations, never exceeds the
    true top eigenvalue (numpy cross-check on the same quantized
    matrix), and the energy share stays in (0, 1]."""
    import numpy as np

    from goe_spark.catalog import load_table
    from goe_spark.queries.similarity import (
        PI_Q,
        embedding_power_iteration,
    )

    rows = sorted(
        embedding_power_iteration(spark, SF_SMALL).collect(),
        key=lambda r: r["iter"],
    )
    assert [r["iter"] for r in rows] == [1, 2, 3, 4]
    ray = [r.rayleigh_r3 for r in rows]
    assert all(b >= a for a, b in zip(ray, ray[1:]))
    assert all(0 < r.energy_share_r6 <= 1 for r in rows)
    # numpy ground truth on the SAME quantization
    emb = np.array(
        load_table(spark, SF_SMALL, "embeddings")
        .select("embedding")
        .toPandas()["embedding"]
        .tolist(),
        dtype=np.float64,
    )
    q = np.floor(emb * PI_Q + 0.5)
    m = q.T @ q
    lam_max = float(np.linalg.eigvalsh(m).max())
    assert ray[-1] <= lam_max * (1 + 1e-9)
    # 4 rounds from the all-ones start must capture a decent fraction
    # of the true top eigenvalue on this fixture
    assert ray[-1] >= 0.5 * lam_max


def test_span_scrub_accounting_identity(spark):
    """tokens_kept + tokens_cut == tokens_in per source, docs_emptied
    <= docs_touched <= n_docs — the reconstruction ledger closes."""
    from goe_spark.queries.dedup import span_scrub_stats

    for r in span_scrub_stats(spark, SF_SMALL).collect():
        assert r.tokens_kept + r.tokens_cut == r.tokens_in
        assert r.docs_emptied <= r.docs_touched <= r.n_docs


def test_url_canonicalization_collapses_variants(spark):
    """Tracking params, host case, trailing slash and fragments must
    all collapse: canonical URLs < raw variants <= fetches, and the
    dup ledger closes per host."""
    from goe_spark.queries.profiling import url_dedup_stats

    rows = url_dedup_stats(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_urls <= r.n_raw_urls <= r.n_fetches
        assert r.dup_fetches == r.n_fetches - r.n_urls
        assert r.bytes_kept <= r.bytes_fetched
    assert sum(r.n_raw_urls for r in rows) > sum(r.n_urls for r in rows)


def test_span_run_ledger_matches_scrub_ledger(spark):
    """The run-length view and the scrub accounting view must agree on
    the cut token mass per source (same cut sets, two rollups)."""
    from goe_spark.queries.dedup import span_run_stats, span_scrub_stats

    runs = {r.source: r for r in span_run_stats(spark, SF_SMALL).collect()}
    scrub = {
        r.source: r for r in span_scrub_stats(spark, SF_SMALL).collect()
    }
    touched = {s for s, r in scrub.items() if r.docs_touched > 0}
    assert set(runs) == touched
    for s, r in runs.items():
        assert r.tokens_cut == scrub[s].tokens_cut
        assert r.n_docs_touched == scrub[s].docs_touched
        assert r.max_run_len <= r.tokens_cut


def test_url_canonicalization_pinned_cases(spark):
    """Planted messy URLs through the canonicalization expressions:
    host case, tracking params, fragments, trailing slash — and
    idempotence (canonicalizing a canonical URL is a no-op)."""
    import pandas as pd

    from goe_spark.queries.profiling import _synth_url_exprs

    # doc_id values chosen to hit every noise branch:
    # 0: %7=0 upper host, %2=0 slash, %3=0 utm, %5=0 fragment
    # 1: %3=1 session param        2: %3=2 no query, %2=0 slash
    # 7: %7=0 upper host only      9: fragment w/o slash? 9%2=1,%5!=0
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 7, 9],
                "source": ["alpha"] * 5,
                "lang": ["en"] * 5,
                "n_chars": [10] * 5,
            }
        )
    )
    raw, canon, host = _synth_url_exprs()
    rows = {
        r.doc_id: r
        for r in docs.select(
            "doc_id", raw.alias("raw"), canon.alias("url"), host.alias("h")
        ).collect()
    }
    assert rows[0].raw.startswith("https://ALPHA.example.com/")
    assert "?utm_source" in rows[0].raw and "#section-2" in rows[0].raw
    assert rows[0].url == "https://alpha.example.com/en/page-0"
    assert "?session=1" in rows[1].raw
    assert rows[1].url == "https://alpha.example.com/en/page-1"
    assert rows[2].raw.endswith("/")
    assert not rows[2].url.endswith("/")
    assert rows[7].h == "alpha.example.com"
    assert all(r.url.startswith("https://alpha.example.com/") for r in rows.values())
    # idempotence: re-canonicalizing the canonical form is a no-op
    cdf = docs.select("doc_id", canon.alias("text"))
    recanon = F.concat(
        F.lit("https://"),
        F.lower(F.regexp_extract("text", r"^https://([^/]+)", 1)),
        F.regexp_replace(
            F.regexp_extract("text", r"^https://[^/]+([^?#]*)", 1),
            r"/$",
            "",
        ),
    )
    again = {r.doc_id: r for r in cdf.select("doc_id", "text", recanon.alias("c2")).collect()}
    for r in again.values():
        assert r.c2 == r.text
