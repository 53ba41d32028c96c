"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is materialized with the noop sink so we time full plan
execution (scan → shuffle → aggregate) without collect() overhead on
the driver, the same way a cluster job would be bounded by the final
stage rather than result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative slice of the registry: scan-agg, broadcast star join,
# fact-fact join + top-k, window, validation algebra, dedup, text,
# similarity. Names must exist in goe_spark.queries.
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
]


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    from goe_spark.catalog import load_table
    from goe_spark.queries import queries_dict
    from goe_spark.session import get_spark

    spark = get_spark("goe-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup outside the timed region.
    materialize(load_table(spark, SF_DIR, "lineitem").limit(1000))

    qs = queries_dict()
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        materialize(fn(spark, SF_DIR))
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
