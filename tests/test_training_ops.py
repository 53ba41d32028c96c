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
