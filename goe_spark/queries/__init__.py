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
# and HEAD is ROTATED each round. HEAD is kept at EXACTLY 50 entries
# (round 8 listed 51 and the driver silently dropped the 51st).
# Round-12 window, in order (round-11 verdict item 3):
#   1. the FORTY-ONE queries whose latest driver row is ROUND 8
#      (the block named verbatim in VERDICT r11 item 3, including
#      dedup_survivor_bias_audit whose r11 row was the ANSI
#      DIVIDE_BY_ZERO red — re-recorded green after the try_divide
#      fix). After this rotation max registry staleness drops to r9.
#   2. queries NEW in round 12 (never driver-checked) — inserted
#      as they land; each displaces one r9 filler below.
#   3. r9-stale fillers (registry order) to pad the window to 50.
HEAD = (
    # -- last driver-checked in round 8: the 41-query stale block --
    "ann_pq_topk",
    "ann_ivf_pq_topk",
    "bpe_merge_pair_counts",
    "brand_affinity_lift",
    "cms_user_counts",
    "cohort_retention",
    "dedup_cluster_size_histogram",
    "dedup_method_agreement",
    "dsir_importance_weights",
    "embedding_cluster_audit",
    "embedding_int8_audit",
    "event_funnel_conversion",
    "event_transition_matrix",
    "gopher_quality_filter",
    "hopping_window_counts",
    "k_anonymity_audit",
    "lapsed_customers_except",
    "matryoshka_recall_audit",
    "minhash_probe_new_docs",
    "mixture_sample_docs",
    "mixture_sample_threshold",
    "pii_redaction_audit",
    "pii_scan_by_source",
    "q9_product_profit",
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
    "dedup_survivor_bias_audit",
    # -- new in round 12: never driver-checked --
    "classifier_train_epochs",
    "span_scrub_stats",
    "url_dedup_stats",
    "media_flac_stats",
    "media_tiff_stats",
    "embedding_power_iteration",
    "corpus_novelty_curve",
    "knn_label_agreement",
    "streaming_classifier_counts",
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
