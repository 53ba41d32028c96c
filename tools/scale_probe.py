"""sf1 scale probe (round-7 VERDICT task 5): direct evidence the
LSH/cell caps hold superlinear growth down at 10x the bench data.

Generates a synthetic sf1 (10x sf0.1) documents + embeddings set under
.scale/sf1/ — ten copies of the sf0.1 corpus, copy k > 0 perturbing
every 3rd word with a copy-specific suffix so copies are NOT near-dups
of each other or of the original (3-gram shingles all contain a
modified word), while each copy retains the original corpus's internal
duplicate structure. True near-dup pairs therefore scale ~10x
(linearly); a superlinear pair count or runtime would mean a cap is
not engaging. Embeddings get a deterministic per-copy affine
perturbation (distinct vectors, same dimensionality/cluster shape).
The other 8 tables are symlinked from sf0.1 (only needed so
check_oracle's view registration succeeds).

Usage:
    python tools/scale_probe.py            # generate if absent + time
    python tools/scale_probe.py --gen-only
    python tools/scale_probe.py --sf10     # 100x bench (.scale/sf10)

The --sf10 fixture reuses this construction with 100 copies. The
embedding perturbation is INJECTIVE per copy (the multiplier uses k
itself, round-9 verdict item 6), so no cross-copy vector duplicates
exist at any copy count and the ANN family is hash-checkable at sf10
too. Fixtures carry a _FIXTURE_META.json construction version; a
changed construction regenerates them automatically.

Timing: per query, 1 warm-up + 3 timed runs at sf0.1 then sf1;
reports medians and the sf1/sf0.1 growth factor. Hash parity at sf1
is run separately:
    CHECK_SF_DIR=$PWD/.scale/sf1 python tools/check_oracle.py \
        minhash_lsh_pairs ngram_jaccard_pairs cross_doc_ngram_coverage
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scale", "sf1")
SF10 = os.path.join(REPO, ".scale", "sf10")
N_COPIES = 10
N_COPIES_SF10 = 100

PROBE_QUERIES = [
    "minhash_lsh_pairs",
    "cross_doc_ngram_coverage",
    "ngram_jaccard_pairs",
    "ann_pq_topk",
    "semantic_dedup_keep_first",
    # round-10 session-2 pair generators (LSH_BUCKET_CAP /
    # CONTAINMENT_DF_CAP must hold the quadratic term down)
    "editdist_near_dup_pairs",
    "shingle_containment_pairs",
    # round-11 pair generator (paragraph-grain LSH: bucket cap must
    # hold with ~3x the signature count of doc-grain minhash)
    "paragraph_dedup_stats",
    # relational family (10x facts, consistent key remap)
    "q1_pricing_summary",
    "q9_product_profit",
    "q18_large_orders",
    # events family (10x users, per-user history cloned)
    "sessionization_stats",
    "event_funnel_conversion",
    "cms_user_counts",
    # round-12: the new gram-grain joins (occ-vs-owner / first-seen)
    # and the iterative fixed-point loops must stay ~linear
    "span_scrub_stats",
    "corpus_novelty_curve",
    "classifier_train_epochs",
    "embedding_power_iteration",
]


def ensure_sf1(spark) -> None:
    _ensure_scaled(spark, SF1, N_COPIES)


def ensure_sf10(spark) -> None:
    """100x bench data (round-9): same construction as sf1 with 100
    copies — ~60M lineitem / 500k docs / 50k embeddings."""
    _ensure_scaled(spark, SF10, N_COPIES_SF10)


# Bump when the synthetic construction changes: stale cached fixtures
# regenerate instead of silently serving the old perturbation.
# v2: injective per-copy embedding perturbation (no cross-copy dups).
FIXTURE_VERSION = 2


def _ensure_scaled(spark, dst: str, n_copies: int) -> None:
    import shutil

    from pyspark.sql import functions as F

    meta_path = os.path.join(dst, "_FIXTURE_META.json")
    if os.path.exists(os.path.join(dst, "documents.parquet")):
        try:
            with open(meta_path) as f:
                if json.load(f).get("version") == FIXTURE_VERSION:
                    return
        except (OSError, ValueError):
            pass
        print(f"regenerating {dst} (stale construction)", file=sys.stderr)
        shutil.rmtree(dst)
    os.makedirs(dst, exist_ok=True)
    with open(meta_path, "w") as f:
        json.dump({"version": FIXTURE_VERSION, "copies": n_copies}, f)
    copies = spark.range(n_copies).withColumnRenamed("id", "k")

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    k = F.col("k")
    words = F.split(F.col("text"), " ")
    # copy 0 keeps the original text; copy k>0 rewrites every 3rd word
    # (offset k%3) with a k-suffix — every 3-gram shingle differs from
    # every other copy's, so cross-copy near-dup pairs are zero and
    # the true pair count scales linearly with the copy count.
    perturbed = F.array_join(
        F.transform(
            words,
            lambda w, i: F.when(
                (i % 3 == k % 3) & (k > 0),
                F.concat(w, F.lit("~"), k.cast("string")),
            ).otherwise(w),
        ),
        " ",
    )
    big_docs = (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") * n_copies + k).alias("doc_id"),
            F.when(k == 0, F.col("text")).otherwise(perturbed).alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text").cast("bigint"))
    )
    big_docs.repartition(8).write.mode("overwrite").parquet(
        os.path.join(dst, "documents.parquet")
    )

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    # Per-copy INJECTIVE perturbation (round-9 verdict item 6): the
    # multiplicative term uses k itself (not k mod a small grid), so
    # no two copies apply the same transform and cross-copy exact
    # duplicates cannot arise even at 100 copies — which makes the
    # ANN/embedding family hash-checkable at sf10 (knife-edge cosine
    # ties between duplicate vectors were the old caveat).
    shifted = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x * (1.0 + k.cast("float") * F.lit(0.0013))
            + ((k * 11 + i) % 101).cast("float") * F.lit(0.00021)
        ).cast("float"),
    )
    big_emb = emb.crossJoin(copies).select(
        (F.col("vec_id") * n_copies + k).alias("vec_id"),
        F.when(k == 0, F.col("embedding")).otherwise(shifted).alias(
            "embedding"
        ),
        "label",
    )
    big_emb.repartition(8).write.mode("overwrite").parquet(
        os.path.join(dst, "embeddings.parquet")
    )

    # TPC-H facts + events scale 10x with a CONSISTENT entity remap:
    # every entity key k' = k * n_copies + copy, applied identically
    # to the primary key and every foreign key, so joins stay valid
    # and per-entity history (a customer's orders, a user's events)
    # clones into N independent entities — fact cardinality, join
    # fan-out and group counts all grow exactly linearly, which is
    # the growth law the probe checks runtimes against. Dimension
    # tables region/nation stay fixed (copies share nations, as a
    # real 10x business would).
    def remap(col_name):
        return (F.col(col_name) * n_copies + k).alias(col_name)

    cust = spark.read.parquet(f"{SF01}/customer.parquet")
    cust.crossJoin(copies).select(
        remap("c_custkey"),
        *[c for c in cust.columns if c != "c_custkey"],
    ).repartition(8).write.mode("overwrite").parquet(
        os.path.join(dst, "customer.parquet")
    )
    supp = spark.read.parquet(f"{SF01}/supplier.parquet")
    supp.crossJoin(copies).select(
        remap("s_suppkey"),
        *[c for c in supp.columns if c != "s_suppkey"],
    ).repartition(8).write.mode("overwrite").parquet(
        os.path.join(dst, "supplier.parquet")
    )
    part = spark.read.parquet(f"{SF01}/part.parquet")
    part.crossJoin(copies).select(
        remap("p_partkey"),
        *[c for c in part.columns if c != "p_partkey"],
    ).repartition(8).write.mode("overwrite").parquet(
        os.path.join(dst, "part.parquet")
    )
    orders = spark.read.parquet(f"{SF01}/orders.parquet")
    orders.crossJoin(copies).select(
        remap("o_orderkey"),
        remap("o_custkey"),
        *[c for c in orders.columns if c not in ("o_orderkey", "o_custkey")],
    ).repartition(8).write.mode("overwrite").parquet(
        os.path.join(dst, "orders.parquet")
    )
    li = spark.read.parquet(f"{SF01}/lineitem.parquet")
    li.crossJoin(copies).select(
        remap("l_orderkey"),
        remap("l_partkey"),
        remap("l_suppkey"),
        *[
            c
            for c in li.columns
            if c not in ("l_orderkey", "l_partkey", "l_suppkey")
        ],
    ).repartition(16).write.mode("overwrite").parquet(
        os.path.join(dst, "lineitem.parquet")
    )
    ev = spark.read.parquet(f"{SF01}/events.parquet")
    ev.crossJoin(copies).select(
        remap("event_id"),
        remap("user_id"),
        *[c for c in ev.columns if c not in ("event_id", "user_id")],
    ).repartition(8).write.mode("overwrite").parquet(
        os.path.join(dst, "events.parquet")
    )
    for t in "region nation".split():
        link = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(f"{SF01}/{t}.parquet", link)
    print(f"generated {dst} ({n_copies} copies)", file=sys.stderr)


def _time(fn, spark, sf_dir, runs=3):
    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    mat(fn(spark, sf_dir))  # warm-up (includes any index build)
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        mat(fn(spark, sf_dir))
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3)


# 100x probe set: the superlinear-risk operators plus the round-9
# additions whose plan shape the explode_outer fix protects.
PROBE_QUERIES_SF10 = [
    "minhash_lsh_pairs",
    "editdist_near_dup_pairs",
    "shingle_containment_pairs",
    "paragraph_dedup_stats",
    "ngram_jaccard_pairs",
    "cross_doc_ngram_coverage",
    "semantic_dedup_keep_first",
    "line_dedup_stats",
    "cross_lang_shingle_leakage",
    "token_entropy_by_source",
    "knn_graph_stats",
    "q1_pricing_summary",
    "q9_product_profit",
    "sessionization_stats",
    "cms_user_counts",
    # ANN at 100x (round-10): hash-checkable now that the embedding
    # perturbation is injective per copy
    "ann_ivf_topk",
]


def main() -> None:
    from goe_spark.queries import queries_dict
    from goe_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sf10 = "--sf10" in sys.argv
    if sf10:
        ensure_sf10(spark)
        big_dir, ratio, probes = SF10, N_COPIES_SF10, PROBE_QUERIES_SF10
    else:
        ensure_sf1(spark)
        big_dir, ratio, probes = SF1, N_COPIES, PROBE_QUERIES
    if "--gen-only" in sys.argv:
        return

    qs = queries_dict()
    out = {}
    # sf10 materializations are ~100x the work; one timed run after
    # the warm-up bounds the probe's wall clock (medians matter less
    # when the signal is a 100x growth factor, not a 10% regression).
    runs = 1 if sf10 else 3
    for name in probes:
        t_small = _time(qs[name], spark, SF01, runs=runs)
        t_big = _time(qs[name], spark, big_dir, runs=runs)
        out[name] = {
            "sf0.1_s": t_small,
            f"x{ratio}_s": t_big,
            "growth": round(t_big / t_small, 2) if t_small else None,
        }
        print(f"{name}: {t_small}s -> {t_big}s ({out[name]['growth']}x)",
              file=sys.stderr)
    print(json.dumps({"data_ratio": ratio, "queries": out}))


if __name__ == "__main__":
    main()
