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
# outside the window for 5 straight rounds). Round-7 window, in order:
#   1. queries NEW this round (pipeline_ops) — never driver-checked;
#   2. queries whose plan changed this round (distributed two-pass
#      rank replacing global ntile windows; distributed top-k skew
#      report) — they need a fresh green driver row;
#   3. all 36 entries whose last driver check was ROUND 3 — before
#      the round-6 dtype discipline existed (VERDICT r6 task 1: the
#      TPC-H money columns are exactly the DECIMAL shape that broke
#      round 4);
#   4. the stalest round-5 rows filling the window to 50.
# Everything else keeps module order behind the window; pytest's
# test_queries_oracle.py re-verifies the FULL registry against DuckDB (same
# pandas fetch path as the driver) every run regardless of position.
HEAD = (
    # -- new this round (pipeline_ops, multimodal) --
    "segment_dedup_stats",
    "shard_manifest",
    "filter_funnel_report",
    "per_source_topk_cap",
    "length_curriculum_bins",
    "media_exact_dedup",
    "event_type_unpivot",
    "segment_probe_new_docs",
    "hybrid_search_rrf",
    # -- plan changed this round --
    "customer_value_deciles",
    "rfm_segments",
    "join_skew_report",
    # -- last driver-checked in round 3 (pre-dtype-discipline) --
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
    "salted_join_revenue",
    "agg_validate_lineitem",
    "staged_validation_scan",
    "data_type_sampling",
    "predicate_offload_slice",
    "dedup_exact_keep_first",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "token_stats_by_lang",
    "bpe_token_stats",
    "quality_scores_by_source",
    "lang_id_confusion",
    "doc_fingerprints",
    "events_json_extract",
    "ann_bruteforce_topk",
    "embedding_near_dup_pairs",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "streaming_window_counts",
    "streaming_dedup_counts",
    "event_type_rollup",
    "media_decode_features",
    "media_resize_images",
    "media_frame_sample",
    # -- stalest round-5 rows --
    "dq_orders_expectations",
    "cross_doc_ngram_coverage",
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
