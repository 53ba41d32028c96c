"""Benchmark harness: runs the FULL query registry at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric", "value", "unit", "queries", "sf", ...}.

Measurement discipline: every HEADLINE query gets ONE untimed
warm-up pass (JVM/codegen/Python-worker spin-up, IVF index build,
file-listing caches) followed by BENCH_RUNS (default 3) timed
passes; non-headline queries skip the explicit warm-up and take
BENCH_RUNS timed passes directly — the MEDIAN of 3 discards the
cold first pass, so the reported number is still a warm-run median
at 3/4 the wall-clock (round-12 VERDICT task 2: warmup+3 for all
204 queries overran the pacing budget and demoted 21 tail queries
to single cold runs — a worse trade than a robust median). The
headline "value" is the sum of per-query MEDIANS over the HEADLINE
list ONLY, and its warmup+3 methodology is unchanged across rounds.
HEADLINE's composition is FROZEN as of round 8 (85 queries) and
stamped into the output as "headline_rev": rounds sharing a rev are
apples-to-apples; a rev bump means the sum is NOT comparable to the
previous round (round-8 ADVICE — the r7->r8 growth from 75 to 85
queries silently shifted the headline). New operators ride in
"value_full" only. The rest of the registry runs after HEADLINE
(round-7 VERDICT task 6) and lands in the same per-query dict, with
"value_full"/"n_queries" summarizing the whole sweep.
"queries_min"/"queries_max" carry the spread, so machine-load noise
(measured 33-50 s swing at n=1 in round 2) is distinguishable from
real regression.

CLI overrides (all optional; env vars still work):
    --runs N       timed passes per query (BENCH_RUNS)
    --only a,b,c   bench just these queries, e.g. to re-measure a
                   drifting query at high N (round-7 VERDICT task 4)
    --sf-dir PATH  data directory (SPARK_GRAFT_SF_DIR)
    --budget-s S   wall-clock budget (BENCH_BUDGET_S)

Each query is materialized with the noop sink so we time full plan
execution (scan → shuffle → aggregate) without collect() overhead on
the driver, the same way a cluster job would be bounded by the final
stage rather than result transfer.

A fixed-work CPU calibration probe (chained sha256 in Python + an
xxhash64 codegen fold in the JVM) runs before and after the sweep and
lands in the JSON as "calibration"/"throttle_factor"/
"value_normalized", so environment slowdown is measured rather than
attributed (round-10 VERDICT task 2).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = max(1, int(os.environ.get("BENCH_RUNS", "3")))
# Wall-clock budget: a bench that overruns whatever patience the
# caller has produces ZERO timings (round 3's lesson, in time rather
# than errors). The budget is now an EMERGENCY valve only: past 90%
# of budget remaining queries drop to a single cold run. The
# steady-state plan (headline warmup+3, tail bare 3) fits ~1080 s
# with ~40% headroom, so n_degraded should be 0 on a healthy box;
# degraded queries are listed in the JSON so a reader can discount
# them.
# 1500 s: the full 216-query registry costs ~230 s of warm medians
# (x3 passes + headline warmups + calibration ~= 800 s idle); the
# round-12 budget of 1080 s left no headroom for a 1.3x-throttled
# box and demoted the tail — the 90% valve now sits comfortably
# above the worst measured case instead of inside it.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))

# Representative slice of the registry: scan-agg, broadcast star join,
# fact-fact join + top-k, window, validation algebra, dedup, text,
# similarity. Names must exist in goe_spark.queries.
# FROZEN at rev 8 — do not append; new queries are covered by the
# full-registry sweep and value_full. Bump HEADLINE_REV if the
# composition ever has to change, so cross-round comparisons know.
HEADLINE_REV = 8
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q10_returned_items",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q18_large_orders",
    "q21_waiting_suppliers",
    "window_top_orders_per_customer",
    "agg_validate_lineitem",
    "staged_validation_scan",
    "dedup_exact_keep_first",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "asof_latest_order",
    "token_stats_by_lang",
    "bpe_token_stats",
    "quality_scores_by_source",
    "doc_fingerprints",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "embedding_near_dup_pairs",
    "media_decode_features",
    "sessionization_stats",
    "dedup_clusters",
    "stratified_sample_docs",
    "token_pack_bins",
    "repetition_doc_stats",
    "term_bigram_pmi",
    "sliding_window_chunks",
    # round-4 additions
    "session_window_stats",
    "mixture_sample_docs",
    "mixture_sample_threshold",
    "unigram_logprob_scores",
    "ann_lsh_topk",
    "event_funnel_conversion",
    "cohort_retention",
    "embedding_cluster_audit",
    "timeseries_gapfill",
    "event_transition_matrix",
    "customer_value_deciles",
    "tfidf_top_terms",
    "daily_distinct_users_hll",
    "table_profile",
    "brand_affinity_lift",
    "rfm_segments",
    "cross_doc_ngram_coverage",
    "ann_pq_topk",
    "ann_ivf_pq_topk",
    "value_quantiles_kll",
    "audience_overlap_theta",
    "pii_redaction_audit",
    "gopher_quality_filter",
    "minhash_probe_new_docs",
    "bpe_merge_pair_counts",
    "join_skew_report",
    "semantic_dedup_keep_first",
    "cms_user_counts",
    "sentiment_by_source",
    "token_dropout_stats",
    "span_corruption_stats",
    # round-6 additions: the iterative BPE training loop and its
    # apply/compression side — the loop's ~12 s is per-iteration
    # scheduling overhead (6 vocabulary-grain jobs + argmax collects),
    # constant in corpus size beyond the single wordcount pass.
    "bpe_train_merges",
    "bpe_encode_stats",
    # round-6 heavy-tail additions (VERDICT r6 task 7): regressions in
    # the newest operators must be caught the same way BPE's were
    "split_leakage_audit",
    "asof_recent_order",
    "asof_next_order",
    "media_payload_stats",
    "bigram_logprob_scores",
    # round-7 additions
    "segment_dedup_stats",
    "per_source_topk_cap",
    "length_curriculum_bins",
    "media_exact_dedup",
    "segment_probe_new_docs",
    "hybrid_search_rrf",
    # round-8 additions (the full registry runs after HEADLINE anyway;
    # these join the comparable core)
    "media_dimensions",
    "dsir_importance_weights",
    "embedding_int8_audit",
    "matryoshka_recall_audit",
    "contamination_check",
    "top_duplicate_ngrams",
    "simhash_pairs",
    "k_anonymity_audit",
    "dedup_cluster_size_histogram",
]


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def clear_persisted(spark) -> None:
    """Drop every cached/persisted RDD block between queries. Without
    this, localCheckpoint blocks from earlier queries accumulate in
    the block manager for the whole sweep and late-positioned queries
    run under GC/eviction pressure the early ones never see — the
    round-11 rotation moved the embedding family from HEAD to the
    tail and its medians silently grew 2-4x from POSITION alone
    (verified: isolated re-runs matched the old numbers). Every
    checkpoint in goe_spark is per-invocation (no module-level
    DataFrame caches — audited), so dropping blocks between queries
    is safe; the warm-up run re-creates whatever the next query
    needs."""
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = jmap.values().iterator()
    while it.hasNext():
        it.next().unpersist(False)


# --- CPU calibration probe (round-10 VERDICT task 2) -----------------
# Round 10's headline drifted 1.26x vs round 9 with a uniform
# multiplier on CPU-bound work and flat streaming floors — consistent
# with VM throttle, but only ATTRIBUTABLE, not measurable, because no
# fixed-work probe existed. These two probes run before and after the
# sweep: a chained-sha256 loop (Python-worker speed, fully
# deterministic) and a whole-stage-codegen xxhash64 fold over
# spark.range (JVM speed, no shuffle, no data dependence). Reference
# values are pinned from an idle round-11 measurement on the driver
# VM; throttle_factor = geomean(measured/ref), and value_normalized
# divides the headline by it so a real plan regression can no longer
# hide behind "the VM was slow".
CALIB_PY_ITERS = 2_000_000
CALIB_SPARK_ROWS = 2_000_000_000
CALIB_REF = {"python_s": 0.96, "spark_s": 0.40}  # pinned r11, idle VM


def _calib_python(iters: int = CALIB_PY_ITERS) -> float:
    h = hashlib.sha256(b"\x5a" * 64)
    t0 = time.perf_counter()
    for _ in range(iters):
        h = hashlib.sha256(h.digest())
    return time.perf_counter() - t0


def _calib_spark(spark, rows: int = CALIB_SPARK_ROWS) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    # shiftright before the sum: raw xxhash64 values wrap int64 in
    # SUM, which the bench's ANSI-on session raises on (non-ANSI
    # silently wrapped — the probe only burns CPU, the value is
    # discarded, and the hashing work is unchanged)
    spark.range(0, rows, 1, 32).select(
        F.sum(F.shiftright(F.xxhash64("id"), 32)).alias("s")
    ).collect()
    return time.perf_counter() - t0


def run_calibration(spark) -> dict[str, float]:
    """One warm-up then median-of-3 for each probe kind."""
    _calib_python(CALIB_PY_ITERS // 10)
    py = statistics.median(_calib_python() for _ in range(3))
    _calib_spark(spark, CALIB_SPARK_ROWS // 20)
    sp = statistics.median(_calib_spark(spark) for _ in range(3))
    return {"python_s": round(py, 4), "spark_s": round(sp, 4)}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--runs", type=int, default=N_RUNS)
    ap.add_argument("--only", help="CSV of query names to bench")
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--budget-s", type=float, default=BUDGET_S)
    args = ap.parse_args()
    sf_dir, n_runs_req, budget_s = args.sf_dir, args.runs, args.budget_s

    from goe_spark.catalog import load_table
    from goe_spark.queries import queries_dict
    from goe_spark.session import get_spark

    # Driver parity: bench under the same ANSI-on semantics the
    # driver's correctness session uses, so a query that only works
    # ANSI-off can never be bench-green.
    spark = get_spark(
        "goe-spark-bench",
        extra_conf={"spark.sql.ansi.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup outside the timed region.
    materialize(load_table(spark, sf_dir, "lineitem").limit(1000))

    calib_pre = run_calibration(spark)

    qs = queries_dict()
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
        unknown = [n for n in names if n not in qs]
        if unknown:
            print(f"bench: unknown queries {unknown}", file=sys.stderr)
            sys.exit(2)
    else:
        # HEADLINE first (its sum is the cross-round comparable), then
        # EVERY remaining registry query in registry order — full
        # coverage, with the budget guard degrading the tail first.
        names = HEADLINE + [n for n in qs if n not in HEADLINE]
    med: dict[str, float] = {}
    mins: dict[str, float] = {}
    maxs: dict[str, float] = {}
    errs: dict[str, str] = {}
    # Failure isolation: one query's analysis exception must not
    # discard every other query's timings (round 3 lost its entire
    # bench to a single broken query).
    bench_t0 = time.perf_counter()
    degraded: list[str] = []
    for name in names:
        elapsed = time.perf_counter() - bench_t0
        # Headline queries keep the frozen warmup+N methodology (the
        # cross-round comparable); the tail runs N bare passes and
        # relies on median-of-N to discard its cold first pass. That
        # trick needs N >= 3 — at BENCH_RUNS 1 or 2 (or --only spot
        # checks) the median WOULD be cold-contaminated, so everyone
        # keeps the warm-up there.
        warmups = 1 if (name in HEADLINE or n_runs_req < 3) else 0
        n_runs = n_runs_req
        if elapsed > 0.90 * budget_s:
            warmups, n_runs = 0, 1
            degraded.append(name)
        try:
            fn = qs[name]
            for _ in range(warmups):
                materialize(fn(spark, sf_dir))  # warm-up, untimed
            runs = []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                materialize(fn(spark, sf_dir))
                runs.append(time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001 — record and continue
            errs[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"bench: {name} FAILED: {errs[name]}", file=sys.stderr)
            continue
        finally:
            clear_persisted(spark)  # untimed; see docstring
        med[name] = round(statistics.median(runs), 3)
        mins[name] = round(min(runs), 3)
        maxs[name] = round(max(runs), 3)

    calib_post = run_calibration(spark)
    # Throttle factor: geometric mean of (mean of pre/post) over ref,
    # per probe kind. 1.0 = this VM runs at the pinned reference
    # speed; 1.3 = CPU work takes 1.3x longer than at the pin.
    _factors = [
        ((calib_pre[k] + calib_post[k]) / 2) / CALIB_REF[k] for k in CALIB_REF
    ]
    throttle = round((_factors[0] * _factors[1]) ** 0.5, 4)

    # With --only the headline intersection is partial, so a summed
    # "value" would be misleadingly small (round-8 ADVICE): emit null.
    total = None if args.only else round(sum(med.get(n, 0.0) for n in HEADLINE), 3)
    total_norm = None if total is None else round(total / throttle, 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    full = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "headline_rev": HEADLINE_REV,
        "queries": med,
        "queries_min": mins,
        "queries_max": maxs,
        "value_full": round(sum(med.values()), 3),
        "n_queries": len(med),
        "n_headline": sum(1 for n in HEADLINE if n in med),
        "runs_per_query": n_runs_req,
        "warmup_runs": 1,
        "degraded": degraded,
        "budget_s": budget_s,
        "errors": errs,
        "n_failed": len(errs),
        "calibration": {"pre": calib_pre, "post": calib_post},
        "calibration_ref": CALIB_REF,
        "throttle_factor": throttle,
        "value_normalized": total_norm,
        "value_full_normalized": round(sum(med.values()) / throttle, 3),
        "sf": sf_val,
    }
    # Full per-query detail goes to a FILE; stdout gets ONE COMPACT
    # JSON line. The correctness/bench driver keeps only the last
    # ~2000 chars of stdout, and rounds 3-8 proved a 140-query dict
    # blows that window: the driver's "parsed" field has been null
    # since round 3 because the line could not be reassembled. The
    # compact line carries the headline metric, the failure/degrade
    # accounting and the slowest-query tail (the part a reader acts
    # on); BENCH_FULL.json (committed) carries every median/min/max.
    # --only runs must not clobber the committed full-sweep artifact
    detail_name = "BENCH_PARTIAL.json" if args.only else "BENCH_FULL.json"
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), detail_name
    )
    with open(full_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
        fh.write("\n")
    slowest = dict(sorted(med.items(), key=lambda kv: -kv[1])[:15])
    compact = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "headline_rev": HEADLINE_REV,
        "value_full": full["value_full"],
        "n_queries": len(med),
        "n_headline": full["n_headline"],
        "n_failed": len(errs),
        "n_degraded": len(degraded),
        "throttle_factor": throttle,
        "value_normalized": total_norm,
        "runs_per_query": n_runs_req,
        "queries": slowest,
        "errors": {k: v[:80] for k, v in list(errs.items())[:5]},
        "detail": detail_name,
        "sf": sf_val,
    }
    line = json.dumps(compact)
    if len(line) > 1900:  # stay inside the driver's tail window
        compact["queries"] = dict(list(slowest.items())[:8])
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
