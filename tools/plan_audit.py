"""Physical-plan hazard sweep over the FULL query registry.

Builds every registry query's plan at sf0.001 (plan shape, not data,
is what's audited) and reports the scale hazards this repo has
actually been bitten by or watches for:

  md5_in_filter    expensive hashing inlined into a Filter node —
                   round 9 found InferFiltersFromGenerate pushing the
                   whole md5 shingle expression below the spread
                   repartition onto a single scan split (41 s -> 1 s
                   after the explode_outer fix). Benign form: the
                   filter sits ABOVE the parallelizing exchange
                   (per-token isnotnull in dsir/cms) — reported so a
                   new hit gets eyeballed, with the benign pair
                   whitelisted.
  global_window    windowspecdefinition with NO partition keys — a
                   single-task sort at 100 TB unless the relation is
                   provably bounded (day-grain series, n_cells seed
                   tables, shard curves); bounded cases whitelisted.
  nested_loop      CartesianProduct / BroadcastNestedLoopJoin — only
                   acceptable for 1-row/bounded broadcast scalars
                   (sketch bounds, stage totals); whitelisted per
                   query after manual audit.

Usage:
    python tools/plan_audit.py            # human summary + JSON line
    python tools/plan_audit.py --strict   # exit 1 on NON-whitelisted hits

The whitelists are the audit trail: every entry is a query the plan
has been read and reasoned about (SCALE.md rows). A new query landing
in any category fails --strict until it is either fixed or audited
into the whitelist.

RATCHET RULE (round-9 verdict item 8, binding): a whitelist entry may
ONLY land in the same commit as a SCALE.md rationale row explaining
why the hazard is bounded (1-row scalar, seed-table grain, bounded
series, ...). An entry without a written rationale is silencing, not
auditing — reviewers should reject it.

PREFER FIXING OVER WHITELISTING (round-11 verdict item 7): when a hit
can be removed at the source, do that instead of auditing it in — the
round-11 paragraph family pre-hashed a cheap `signed` flag so the
filter sat below the hashing projections, and round 12's
span_scrub_stats switched to posexplode_outer to stop the implicit
size>0 predicate from inlining the md5 expression. A whitelist entry
is the LAST resort for hazards that are structurally bounded, not a
shortcut past a fixable plan.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("PLAN_AUDIT_SF_DIR", "/root/testdata/sf0.001")

# Filters containing md5 that sit ABOVE the spread exchange (parallel,
# a benign double-compute of a per-row hash) — audited round 9.
# quality_calibration: ONE md5 per document inlined into the join's
# inferred isnotnull(fp) at scan parallelism — per-doc (not per-token)
# hashing, measured 0.9 s at sf0.1; the cross_lang stall class was
# per-SHINGLE hashing forced under a repartition.
MD5_FILTER_OK = {
    "dsir_importance_weights",
    "cms_user_counts",
    "quality_calibration_bins",
    # r11: identical shape to quality_calibration_bins — the fp
    # (hash64 of normalized text) join's inferred isnotnull lands ONE
    # per-doc md5 in a Filter at scan parallelism; rationale row in
    # SCALE.md
    "classifier_calibration_bins",
    # r13: the train/holdout hash split IS the operator — ONE md5 of
    # the stringified doc_id (8-16 bytes, not text) per row in each
    # side's Filter at scan parallelism; no cheap pre-hash flag can
    # exist because the hash is the predicate. Rationale row in
    # SCALE.md round-13 additions.
    "classifier_eval_holdout",
}

# Unpartitioned windows over provably bounded relations — audited
# rounds 7-9: day-grain series, the <= N_CELLS IVF seed relation,
# the 10-row shard curve, boundary-rank relations in the two-pass
# rank (partition-count-bounded).
GLOBAL_WINDOW_OK = {
    "rolling_revenue_7d",
    "timeseries_gapfill",
    "revenue_anomaly_days",
    "vocab_growth_curve",
    "customer_value_deciles",
    "rfm_segments",
    "length_curriculum_bins",
    "order_status_islands",
    "event_transition_matrix",
    "ann_ivf_topk",
    "ann_ivf_pq_topk",
    "ann_pq_topk",
    "knn_graph_ivf_stats",  # rides ann_ivf's audited quantizer chain
    "embedding_cluster_audit",
    "semantic_dedup_keep_first",
    "dedup_method_agreement",
    "embedding_near_dup_pairs",
    "hybrid_search_rrf",
    "cohort_retention",
    "table_profile",
    "join_skew_report",
    "top_duplicate_ngrams",
    "order_value_percentiles",
    "value_quantiles_kll",
    "bpe_train_merges",
    "bpe_encode_stats",
    "bpe_merge_pair_counts",
    "mixture_weights",
    "mixture_sample_docs",
    "mixture_sample_threshold",
    "weighted_sample_docs",
    "stratified_sample_docs",
    "filter_funnel_report",
    "zipf_slope_fit",  # rank window on the TakeOrdered top-500 relation
    # revenue-share total over the 7-row POST-AGGREGATE weekday
    # frame: the window input is domain-bounded (7 rows at any corpus
    # size) — SCALE.md round-10 session-2 row
    "dow_seasonality_index",
}

# Nested-loop joins that are 1-row/bounded broadcast scalars —
# audited round 6 (sketch bounds/type pairs), round 5 (stage totals)
# and round 9 (this sweep): the ANN family cross-joins its N_QUERIES
# (5-row) broadcast query set, q11/q22/mixture/tfidf/brand/matryoshka
# cross-join 1-row totals or thresholds. The range join's grid
# strategy never appears here.
NESTED_LOOP_OK = {
    "rolling_distinct_users_hll",
    "audience_overlap_theta",
    "daily_distinct_users_hll",
    "value_quantiles_kll",
    "event_funnel_conversion",
    "timeseries_gapfill",
    "cms_user_counts",
    "split_leakage_audit",
    "contamination_check",
    "cross_doc_ngram_coverage",
    "mixture_sample_docs",
    "table_profile",
    "revenue_anomaly_days",
    "order_price_histogram",
    "dsir_importance_weights",
    "vocab_growth_curve",
    # broadcast query-set cross joins (<= N_QUERIES rows build side)
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_ivf_pq_topk",
    "ann_lsh_topk",
    "ann_pq_topk",
    "hybrid_search_rrf",
    "matryoshka_recall_audit",
    "knn_graph_ivf_stats",  # quantizer's broadcast centroid cross joins
    # 1-row scalar totals / thresholds cross-joined back
    "brand_affinity_lift",
    "mixture_weights",
    # r13: same shape as mixture_weights — the 1-row 4-normalizer
    # totals aggregate cross-joins back onto the source-cardinality
    # relation; SCALE.md round-13 rationale row
    "mixture_temperature_sweep",
    # r13: 1-row union-truth count cross-joined onto the 4-row
    # per-layout metric relation; SCALE.md round-13 rationale row
    "lsh_param_sweep",
    "mixture_sample_threshold",
    "q11_important_stock",
    "q22_idle_customers",
    "tfidf_top_terms",
    "zipf_slope_fit",  # 1-row regression sums x 1-row totals
    # label-cardinality centroid table self-joined on label_a <
    # label_b: |labels| x |labels| rows (tens), corpus touched once
    # upstream — SCALE.md round-10 row
    "embedding_centroid_shift",
    # five 1-row x 1-row crossJoins (violation count x total count
    # per integrity check) — SCALE.md round-10 session-2 row
    "referential_integrity_audit",
}

WINDOW_RE = re.compile(r"windowspecdefinition\(([^)]*)\)")


def audit() -> dict:
    from goe_spark.queries import all_queries
    from goe_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString

    out = {"md5_in_filter": {}, "global_window": {}, "nested_loop": {}, "errors": {}}
    for spec in all_queries():
        try:
            df = spec.fn(spark, SF)
            qe = df._jdf.queryExecution()
            simple = qe.explainString(mode("simple"))
            formatted = qe.explainString(mode("formatted"))
        except Exception as exc:  # noqa: BLE001 — audit must cover the rest
            out["errors"][spec.name] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        md5_hits = [
            line.strip()[:120]
            for line in simple.splitlines()
            if "Filter" in line and "md5" in line
        ]
        if md5_hits:
            out["md5_in_filter"][spec.name] = len(md5_hits)
        # partition keys come first and are bare column refs; sort
        # keys render as "col ASC/DESC NULLS ..." — so a spec whose
        # FIRST argument is already a sort order (or the frame) has
        # NO partitioning and is a single-task sort.
        def _is_global(args: str) -> bool:
            first = args.split(",")[0].strip()
            return (
                " ASC" in first
                or " DESC" in first
                or first.startswith("specifiedwindowframe")
            )

        globals_ = [
            m.group(1)[:80]
            for m in WINDOW_RE.finditer(formatted)
            if _is_global(m.group(1))
        ]
        if globals_:
            out["global_window"][spec.name] = len(globals_)
        nl = simple.count("CartesianProduct") + simple.count(
            "BroadcastNestedLoopJoin"
        )
        if nl:
            out["nested_loop"][spec.name] = nl
    return out


def main() -> None:
    out = audit()
    bad = {
        "md5_in_filter": sorted(set(out["md5_in_filter"]) - MD5_FILTER_OK),
        "global_window": sorted(set(out["global_window"]) - GLOBAL_WINDOW_OK),
        "nested_loop": sorted(set(out["nested_loop"]) - NESTED_LOOP_OK),
        "errors": sorted(out["errors"]),
    }
    for cat, names in out.items():
        if cat == "errors":
            continue
        print(f"{cat}: {len(names)} hit(s), "
              f"{len(bad[cat])} NOT whitelisted: {bad[cat]}",
              file=sys.stderr)
    if out["errors"]:
        print(f"errors: {out['errors']}", file=sys.stderr)
    print(json.dumps({"hits": out, "not_whitelisted": bad}))
    if "--strict" in sys.argv and any(bad.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
