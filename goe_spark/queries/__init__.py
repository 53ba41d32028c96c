"""Query registry: every operator exposed through the driver contract.

Each QuerySpec pairs a Spark DataFrame builder with the ANSI-SQL
oracle string DuckDB runs on the same parquet tables. The driver
(and tools/check_oracle.py locally) compares row counts, schemas and
order-insensitive value hashes — so every computed column is aliased
identically on both sides, and floating-point aggregates are rounded
to a fixed scale to make the comparison deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


# The correctness driver evaluates queries() in registry order and
# records CORRECTNESS rows for the FIRST ~50 per round — the tail of
# the registry gets no driver row. Order therefore encodes priority,
# and HEAD is ROTATED each round (round-5 verdict: 11 entries sat just
# outside the window for 5 straight rounds). Round-8 window, in order:
#   1. queries NEW this round — never driver-checked;
#   2. all 35 entries whose last driver check was ROUND 5 (VERDICT r7
#      task 1: they predate the full dtype discipline and include the
#      heaviest mixed-decimal reports);
#   3. the stalest round-6 rows filling the window to 50.
# After this rotation no registry entry's latest driver row is older
# than round 6. Everything else keeps module order behind the window;
# pytest's test_queries_oracle.py re-verifies the FULL registry against
# DuckDB (same pandas fetch path as the driver) every run regardless of
# position.
HEAD = (
    # -- new this round (multimodal header parsing, data-selection and
    #    embedding-compression audits) --
    "media_dimensions",
    "dsir_importance_weights",
    "embedding_int8_audit",
    "matryoshka_recall_audit",
    "k_anonymity_audit",
    "dedup_cluster_size_histogram",
    # -- last driver-checked in round 5 (VERDICT r7 task 1 list) --
    "ann_pq_topk",
    "ann_ivf_pq_topk",
    "bpe_merge_pair_counts",
    "brand_affinity_lift",
    "cms_user_counts",
    "cohort_retention",
    "dedup_method_agreement",
    "embedding_cluster_audit",
    "event_funnel_conversion",
    "event_transition_matrix",
    "gopher_quality_filter",
    "hopping_window_counts",
    "lapsed_customers_except",
    "minhash_probe_new_docs",
    "mixture_sample_docs",
    "mixture_sample_threshold",
    "pii_redaction_audit",
    "pii_scan_by_source",
    "repetition_doc_stats",
    "retained_customers_intersect",
    "revenue_anomaly_days",
    "rolling_revenue_7d",
    "semantic_dedup_keep_first",
    "sentiment_by_source",
    "session_window_stats",
    "sessionization_stats",
    "span_corruption_stats",
    "table_profile",
    "term_bigram_pmi",
    "tfidf_top_terms",
    "timeseries_gapfill",
    "token_dropout_stats",
    "top_duplicate_ngrams",
    "unattributed_purchases",
    "weighted_sample_docs",
    # -- stalest round-6 rows filling the window --
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_regional_revenue",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q13_customer_distribution",
)
TAIL = ()


def all_queries() -> list[QuerySpec]:
    from goe_spark.queries import (
        affinity,
        asof,
        dedup,
        events_analytics,
        multimodal,
        offload,
        pipeline_ops,
        relational,
        relational2,
        pii,
        relational3,
        profiling,
        similarity,
        sketches,
        streaming_batch,
        text,
        timeseries,
        training,
        validation,
    )

    specs: list[QuerySpec] = []
    for mod in (
        asof,
        relational,
        relational2,
        relational3,
        validation,
        offload,
        dedup,
        text,
        pii,
        timeseries,
        sketches,
        profiling,
        affinity,
        training,
        similarity,
        streaming_batch,
        events_analytics,
        multimodal,
        pipeline_ops,
    ):
        specs.extend(mod.QUERIES)
    names = [s.name for s in specs]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(f"duplicate query names: {dupes}")

    def rank(s: QuerySpec) -> int:
        if s.name in HEAD:
            return HEAD.index(s.name)
        if s.name in TAIL:
            return len(HEAD) + len(specs) + TAIL.index(s.name)
        return len(HEAD) + specs.index(s)

    return sorted(specs, key=rank)


def queries_dict() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.fn for s in all_queries()}


def oracle_dict() -> dict[str, str]:
    return {s.name: s.oracle for s in all_queries() if s.oracle is not None}
