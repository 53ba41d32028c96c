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
# Round-13 window, in order (round-12 verdict item 1):
#   1. the FOUR round-12 queries that landed after the r12 driver
#      window filled and have NEVER been driver-checked.
#   2. weighted_sample_docs — the one remaining r8-stale row.
#   3. queries NEW in round 13 — inserted as they land; each
#      displaces the LAST r9 filler below.
#   4. r9-stale fillers to pad the window to 50 (the r9-stale
#      queries that no longer fit rotate next round).
HEAD = (
    # -- landed after the r12 driver run: never driver-checked --
    "classifier_threshold_by_source",
    "embedding_anisotropy_by_label",
    "html_extract_stats",
    "span_run_stats",
    # -- last driver-checked in round 8 --
    "weighted_sample_docs",
    # -- new in round 13: never driver-checked --
    "span_scrub_thresholded_stats",
    "classifier_eval_holdout",
    "dedup_stage_overlap",
    "bpe_fertility_by_language",
    "mixture_temperature_sweep",
    "embedding_dispersion_by_label",
    "packing_waste_curve",
    "hard_negative_mining_stats",
    "streaming_pii_quarantine",
    "lsh_param_sweep",
    "dedup_threshold_sensitivity",
    "perplexity_band_stats",
    # -- r9-stale fillers (registry order) --
    "asof_latest_order",
    "asof_next_order",
    "asof_recent_order",
    "window_top_orders_per_customer",
    "union_mod_split_scan",
    "semi_anti_join_customers",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "order_value_percentiles",
    "order_price_tiers",
    "count_validate_orders",
    "cast_probe_orders",
    "synthetic_partition_month",
    "synthetic_partition_number_range",
    "synthetic_partition_string_prefix",
    "transform_projection",
    "split_leakage_audit",
    "line_dedup_stats",
    "cross_lang_shingle_leakage",
    "unigram_logprob_scores",
    "bigram_logprob_scores",
    "token_entropy_by_source",
    "vocab_overlap_sources",
    "order_status_islands",
    "daily_distinct_users_hll",
    "rolling_distinct_users_hll",
    "value_quantiles_kll",
    "audience_overlap_theta",
    "order_price_histogram",
    "dedup_clusters",
    "vocab_growth_curve",
    "dedup_keep_best",
    "stratified_sample_docs",
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
