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
# Round-11 window, in order (round-10 verdict item 1):
#   1. the THIRTY-FOUR queries whose latest driver row is ROUND 7 —
#      the q-suite block deferred through rounds 9-10 (q2, q11, q12,
#      q15-q22), the minhash/simhash/segment fuzzy-dedup family, the
#      text battery (token stats, lang-ID confusion, quality scores),
#      streaming counters, the declared-fake media transforms,
#      hybrid RRF retrieval, RFM/skew/salting analytics and the
#      curation shard/cap/curriculum trio. After this rotation the
#      registry's max driver-row staleness drops from r7 to r8.
#   2. queries NEW in round 11 (never driver-checked) — inserted
#      here as they land; each displaces one r8 filler below.
#   3. r8-stale fillers (module order) to pad the window to 50.
HEAD = (
    # -- last driver-checked in round 7: the full 34-query stale block --
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q12_priority_lines",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_discounted_revenue",
    "q20_promotable_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_pairs",
    "segment_dedup_stats",
    "segment_probe_new_docs",
    "streaming_window_counts",
    "streaming_dedup_counts",
    "hybrid_search_rrf",
    "rfm_segments",
    "salted_join_revenue",
    "staged_validation_scan",
    "predicate_offload_slice",
    "token_stats_by_lang",
    "lang_id_confusion",
    "quality_scores_by_source",
    "join_skew_report",
    "length_curriculum_bins",
    "per_source_topk_cap",
    "shard_manifest",
    "media_decode_features",
    "media_resize_images",
    "media_frame_sample",
    "media_exact_dedup",
    # -- new in round 11: never driver-checked --
    "media_mp4_stats",
    "classifier_scores",
    "paragraph_dedup_stats",
    "text_hygiene_audit",
    "embedding_dead_dims",
    "classifier_calibration_bins",
    "paragraph_probe_new_docs",
    "dedup_survivor_bias_audit",
    # -- r8-stale fillers to pad the window to 50 --
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "q10_returned_items",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
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
