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
# outside the window for 5 straight rounds). Round-6 window, in order:
#   1. queries whose output changed this round (pandas-dtype alignment
#      fixes + the four sketch exact-control surfaces) — they need a
#      fresh green driver row;
#   2. the 9 entries never driver-checked in any round;
#   3. the stalest previously-green entries (last checked r1/r3),
#      refreshing cumulative coverage.
# Everything else keeps module order behind the window; pytest's
# test_queries_oracle.py re-verifies the FULL registry against DuckDB (same
# pandas fetch path as the driver) every run regardless of position.
HEAD = (
    # -- new this round --
    "bpe_train_merges",
    "bpe_encode_stats",
    "split_leakage_audit",
    "bigram_logprob_scores",
    "media_payload_stats",
    "asof_recent_order",
    "asof_next_order",
    # -- changed this round: decimal/hugeint pandas-dtype alignment --
    "customer_value_deciles",
    "order_status_islands",
    "event_type_pivot",
    "revenue_cube",
    "continuous_rollup_daily",
    "unigram_logprob_scores",
    "stratified_sample_docs",
    "token_pack_bins",
    "order_price_histogram",
    # -- changed this round: sketch exact-control hashable surfaces --
    "daily_distinct_users_hll",
    "rolling_distinct_users_hll",
    "value_quantiles_kll",
    "audience_overlap_theta",
    # -- never driver-checked in rounds 1-5 --
    "sliding_window_chunks",
    "mixture_weights",
    "order_value_percentiles",
    "order_price_tiers",
    "stream_enriched_counts",
    "purchase_attribution",
    "dedup_clusters",
    "dedup_keep_best",
    "contamination_check",
    # -- stalest green rows (r1) --
    "synthetic_partition_month",
    "synthetic_partition_number_range",
    "synthetic_partition_string_prefix",
    "transform_projection",
    "cast_probe_orders",
    "union_mod_split_scan",
    "semi_anti_join_customers",
    "count_validate_orders",
    # -- stalest green rows (r3) --
    "asof_latest_order",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "q10_returned_items",
    "window_top_orders_per_customer",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q13_customer_distribution",
    "q14_promo_revenue",
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
