"""Physical-plan structure guards.

Correctness tests prove the numbers; these prove the PLAN — that
filters reach the parquet scan, dimensions broadcast, and scan-agg
queries don't grow extra shuffles. A regression here is invisible at
sf0.01 but fatal at 100 TB, which is exactly why it's pinned.
AQE is left on (as in production): assertions target the pre-AQE
physical plan markers that survive replanning.
"""

from __future__ import annotations

import re

from tests.conftest import SF_SMALL


def _plan(df, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            mode
        )
    )


def test_q6_filters_pushed_and_columns_pruned(spark):
    from goe_spark.queries.relational2 import q6_forecast_revenue

    plan = _plan(q6_forecast_revenue(spark, SF_SMALL))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or re.search(
        r"PushedFilters: \[.*l_shipdate", plan
    )
    # only the 3 needed columns reach the scan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_q6_single_aggregate_no_join_shuffle(spark):
    from goe_spark.queries.relational2 import q6_forecast_revenue

    # simple mode: each operator appears once, so Exchange is countable
    plan = _plan(q6_forecast_revenue(spark, SF_SMALL), "simple")
    # scalar agg: partial+final HashAggregate, no join operators at all
    assert "Join" not in plan
    assert plan.count("Exchange") == 1  # the single partial->final merge


def test_q3_broadcasts_customer_dimension(spark):
    from goe_spark.queries.relational import q3_shipping_priority

    plan = _plan(q3_shipping_priority(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-10 without a global sort


def test_q5_all_dimensions_broadcast(spark):
    from goe_spark.queries.relational import q5_regional_revenue

    plan = _plan(q5_regional_revenue(spark, SF_SMALL))
    # region/nation/customer/supplier all build broadcast sides;
    # no SortMergeJoin should survive at any SF for the dim joins
    assert plan.count("BroadcastExchange") >= 3


def test_q1_partial_aggregation_before_exchange(spark):
    from goe_spark.queries.relational import q1_pricing_summary

    plan = _plan(q1_pricing_summary(spark, SF_SMALL))
    # map-side combine: a partial HashAggregate must appear below the
    # exchange (formatted mode lists partial_sum functions)
    assert "partial_sum" in plan or "partial_" in plan


def test_dedup_exact_sorts_are_partition_local(spark):
    from goe_spark.queries.dedup import dedup_exact_keep_first

    plan = _plan(dedup_exact_keep_first(spark, SF_SMALL), "simple")
    # keep-first runs a window keyed on the content fingerprint: the
    # sort under it must be partition-local ("false" global flag), and
    # the window partition spec must be fp (never an empty spec, which
    # would serialize the whole table through one task)
    for m in re.finditer(r"Sort \[[^\]]*\], (\w+),", plan):
        assert m.group(1) == "false", plan
    assert "windowspecdefinition(fp" in plan


def test_simhash_pairs_no_quadratic_join(spark):
    """Round 1 blocked the simhash self-join on (lang, source) —
    unbounded at corpus scale. The banded plan must contain NO join
    operator at all: candidates come from a groupBy on the
    (band, value) bucket key with group-local pair expansion."""
    from goe_spark.queries.dedup import simhash_pairs

    plan = _plan(simhash_pairs(spark, SF_SMALL), "simple")
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_jaccard_and_minhash_no_self_join(spark):
    """Pair emission is group-local for both near-dup operators —
    an exploded self-join would shuffle the shingle table twice and
    go quadratic inside hot buckets. minhash_lsh_pairs has no joins at
    all; ngram_jaccard_pairs is allowed exactly its two verify joins
    (candidates back to the shingle arrays), nothing quadratic."""
    from goe_spark.queries.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    plan = _plan(minhash_lsh_pairs(spark, SF_SMALL), "simple")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan

    plan = _plan(ngram_jaccard_pairs(spark, SF_SMALL), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    n_joins = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    assert n_joins <= 2, f"expected only the 2 verify joins, got:\n{plan}"


def test_ivf_centroids_broadcast_and_cached(spark):
    """The in-session ivf_topk operator must broadcast the 8-row
    centroid table over a cached materialization — without the cache
    every consumer re-runs the full-corpus Lloyd pass."""
    from goe_spark.catalog import load_table
    from goe_spark.operators.ivf import ivf_topk

    emb = load_table(spark, SF_SMALL, "embeddings")
    plan = _plan(ivf_topk(emb, n_queries=3, top_k=5), "simple")
    assert "BroadcastExchange" in plan
    assert "InMemoryTableScan" in plan


def test_ivf_query_probes_materialized_index(spark):
    """The registry ann_ivf_topk must NOT pay the Lloyd pass: its
    plan reads the persisted ivf_index parquet (centroid + assigned
    cells, partition-pruned to the probed cells) instead of
    recomputing k-means; the query set is the only broadcast."""
    from goe_spark.queries.similarity import ann_ivf_topk

    df = ann_ivf_topk(spark, SF_SMALL)
    plan = _plan(df, "simple")
    assert "ivf_index" in plan          # scans the persisted index
    assert "BroadcastExchange" in plan  # tiny query/probe side
    # the Lloyd pass's signature decimal(20,9) accumulators must be
    # absent — the build is not in the query plan
    assert "decimal(20,9)" not in plan
    # partition pruning: the assigned/ scan carries a cell IN-list
    formatted = _plan(df, "formatted")
    assert "PartitionFilters" in formatted


def test_asof_join_single_shuffle_no_range_join(spark):
    """The as-of join is union + one keyed window — a range-condition
    join would fall back to BroadcastNestedLoopJoin and explode."""
    from goe_spark.queries.asof import asof_latest_order

    plan = _plan(asof_latest_order(spark, SF_SMALL), "simple")
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_token_pack_single_window_shuffle(spark):
    """Packing is one window shuffle on (lang, shard) + aggregate
    exchanges — no joins, and only the 3 needed columns reach the
    scan (text is consumed by the token count, never shuffled)."""
    from goe_spark.queries.training import token_pack_bins

    plan = _plan(token_pack_bins(spark, SF_SMALL), "simple")
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    full = _plan(token_pack_bins(spark, SF_SMALL))
    m = re.search(r"ReadSchema: struct<([^>]*)>", full)
    assert m, full
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"doc_id", "lang", "text"}


def test_stratified_sample_no_join_pruned_scan(spark):
    """Sampling is map-side hash + one aggregate; doc text never read."""
    from goe_spark.queries.training import stratified_sample_docs

    plan = _plan(stratified_sample_docs(spark, SF_SMALL), "simple")
    assert "Join" not in plan
    full = _plan(stratified_sample_docs(spark, SF_SMALL))
    m = re.search(r"ReadSchema: struct<([^>]*)>", full)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert "text" not in cols, cols


def test_dynamic_partition_pruning_on_offloaded_layout(spark, tmp_path):
    """A dim-filtered join against a partitioned fact triggers DPP:
    the fact scan carries a dynamicpruning subquery on the partition
    column, so at 100 TB only the partitions the dim filter selects
    are read — Catalyst's runtime analogue of the static HWM pruning
    the offload pipeline does."""
    from pyspark.sql import functions as F

    fact_dir = str(tmp_path / "fact")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    (
        orders.withColumn("part_month", F.date_format("o_orderdate", "yyyy-MM"))
        .write.partitionBy("part_month")
        .parquet(fact_dir)
    )
    fact = spark.read.parquet(fact_dir)
    # The dim must be independent of the fact's lineage: a
    # distinct+limit carved from the same scan suppresses DPP
    # insertion (no guaranteed filtering subquery to reuse).
    months = [
        r.part_month
        for r in fact.select("part_month").distinct().limit(2).collect()
    ]
    dim = spark.createDataFrame(
        [(m, 1) for m in months], "part_month string, flag int"
    )
    joined = fact.join(dim.where(F.col("flag") == 1), "part_month")
    plan = _plan(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the pruned join actually returns only those months' rows
    expect = fact.where(F.col("part_month").isin(months)).count()
    assert joined.count() == expect


def test_approx_percentile_tracks_exact(spark):
    """The 100 TB swap SCALE.md names for exact group quantiles:
    approx_percentile (mergeable sketch, map-side partials) stays
    within its accuracy parameter of the exact sort-based answer."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    exact = {
        r.l_returnflag: r.p50
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("p50"))
        .collect()
    }
    approx = {
        r.l_returnflag: r.p50
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "approx_percentile(l_extendedprice, 0.5, 1000)"
            ).alias("p50")
        )
        .collect()
    }
    for k, ev in exact.items():
        # 1/accuracy = 0.1% rank error; price spread per group ~ 1e5,
        # so value error stays well under 2% of the exact median.
        assert abs(approx[k] - ev) / ev < 0.02, (k, ev, approx[k])


def test_approx_count_distinct_tracks_exact_ndv(spark):
    """The stats module's 100 TB NDV path: approx_count_distinct
    (HyperLogLog++, mergeable map-side) stays within its rsd of the
    exact distinct counts it replaces at scale."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        exact, approx = li.agg(
            F.countDistinct(col),
            F.approx_count_distinct(col, rsd=0.02),
        ).first()
        assert abs(approx - exact) / exact < 0.08, (col, exact, approx)


def test_funnel_and_cohort_no_cartesian_user_grain_joins(spark):
    """The round-4 analytics queries must aggregate to user grain
    before joining — no cartesian products, no nested-loop fallbacks
    (the single-row stage totals cross-join as broadcast scalars,
    which plans as BroadcastNestedLoopJoin over ONE row, not data)."""
    from goe_spark.queries.events_analytics import (
        cohort_retention,
        event_funnel_conversion,
    )

    plan = _plan(cohort_retention(spark, SF_SMALL), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan

    plan = _plan(event_funnel_conversion(spark, SF_SMALL), "simple")
    assert "CartesianProduct" not in plan


def test_unigram_lm_vocab_broadcasts(spark):
    """The top-K vocab must broadcast into the score join — a shuffle
    join there would move the corpus-sized token explode."""
    from goe_spark.queries.text import unigram_logprob_scores

    plan = _plan(unigram_logprob_scores(spark, SF_SMALL), "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_session_window_single_exchange(spark):
    """The native sessionizer plans like a plain aggregate: one
    exchange, no window operator, no join."""
    from goe_spark.queries.streaming_batch import session_window_stats

    plan = _plan(session_window_stats(spark, SF_SMALL), "simple")
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_transition_matrix_events_shuffle_once(spark):
    """Raw events reach one user_id exchange feeding the lag window;
    everything after is matrix-cardinality (25 rows)."""
    from goe_spark.queries.timeseries import event_transition_matrix

    plan = _plan(event_transition_matrix(spark, SF_SMALL), "simple")
    assert plan.count("Window") == 2  # lag per user + per-state totals
    # user_id shuffle + (prev,next) agg + prev_type totals — no more
    assert plan.count("Exchange") == 3
    assert "Join" not in plan


def test_gapfill_aggregates_before_spine_join(spark):
    """The spine joins the DAY-GRAIN rollup (broadcast), and only the
    three needed event columns reach either scan — the raw corpus
    never meets the calendar spine."""
    from goe_spark.queries.timeseries import timeseries_gapfill

    plan = _plan(timeseries_gapfill(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    for cols in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        names = {c.split(":")[0] for c in cols.split(",") if c}
        assert names <= {"ts", "event_type", "value"}


def test_anomaly_stats_side_broadcasts(spark):
    """The 1-row mean/stddev aggregate crosses into the daily rollup
    as a broadcast nested-loop join — never a shuffle."""
    from goe_spark.queries.timeseries import revenue_anomaly_days

    plan = _plan(revenue_anomaly_days(spark, SF_SMALL), "simple")
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "SortMergeJoin" not in plan


def test_tfidf_vocabulary_broadcasts(spark):
    """Document frequencies join the term-frequency relation as a
    broadcast hash join (vocabulary-cardinality build side); only
    (doc_id, text) is read from the corpus."""
    from goe_spark.queries.text import tfidf_top_terms

    plan = _plan(tfidf_top_terms(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # doc_id+text for the term lineages; the 1-row N aggregate scans
    # no columns at all.
    for cols in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        names = {c.split(":")[0] for c in cols.split(",") if c}
        assert names <= {"doc_id", "text"}


def test_hll_sketches_aggregate_partially(spark):
    """Sketch aggregation must run map-side (ObjectHashAggregate
    partial pairs) so exchanges carry register blobs, not user ids."""
    from goe_spark.queries.sketches import daily_distinct_users_hll

    plan = _plan(daily_distinct_users_hll(spark, SF_SMALL), "simple")
    # partial+final pairs for fine grain, union rollup, direct sketch
    assert plan.count("ObjectHashAggregate") >= 6


def test_table_profile_single_scan(spark):
    """All five columns' profiles (incl. exact multi-column distinct
    via Expand) come from ONE scan of the table."""
    from goe_spark.queries.profiling import table_profile

    plan = _plan(table_profile(spark, SF_SMALL), "simple")
    assert plan.count("Scan parquet") == 1
    assert "Expand" in plan  # the multi-distinct rewrite
    assert "Join" not in plan


def test_histogram_no_prescan(spark):
    """Fixed-width bucketing is one aggregate — no min/max pre-pass,
    no join, one exchange of bucket ids."""
    from goe_spark.queries.profiling import order_price_histogram

    plan = _plan(order_price_histogram(spark, SF_SMALL), "simple")
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_brand_affinity_no_fact_self_join(spark):
    """Pair emission is order-local: the lineitem fact joins only the
    broadcast part dim — never itself. One fact shuffle (the basket
    groupBy); marginals attach as broadcasts. The basket frame is
    locally checkpointed (r13: its three consumers re-ran the
    collect_set aggregate), which truncates the visible lineage to a
    Scan ExistingRDD — the part-dim broadcast join happens inside the
    checkpointed subtree (pinned by the checkpoint scan), so the
    visible plan carries the 2 marginal broadcasts and no other
    join."""
    from goe_spark.queries.affinity import brand_affinity_lift

    plan = _plan(brand_affinity_lift(spark, SF_SMALL), "simple")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Scan ExistingRDD" in plan  # checkpointed basket base
    assert plan.count("BroadcastHashJoin") >= 2  # the 2 marginals


def test_rfm_customer_grain_windows_no_joins(spark):
    """Raw orders reduce to customer grain before quartile scoring;
    quartiles are boundary-tuple comparisons, so the final plan
    carries NO window and no shuffle join (the previous form ran
    three unpartitioned ntile windows — a one-task funnel at
    billion-customer scale). The customer-grain frame is locally
    checkpointed (released by ContextCleaner, unlike persist), which
    truncates the visible lineage to a Scan ExistingRDD — the 1-row
    anchor broadcast happens inside the checkpointed subtree, so the
    guard pins the checkpoint scan plus the absence of any join or
    window downstream of it."""
    from goe_spark.queries.timeseries import rfm_segments

    plan = _plan(rfm_segments(spark, SF_SMALL), "simple")
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the checkpointed customer-grain relation is the plan's base
    assert "Scan ExistingRDD" in plan


def test_rolling_distinct_no_range_join(spark):
    """The trailing window builds from contribution explode + groupBy,
    not a day-range theta join; the only BNLJ is the 1-row max-day
    bound broadcast."""
    from goe_spark.queries.sketches import rolling_distinct_users_hll

    plan = _plan(rolling_distinct_users_hll(spark, SF_SMALL), "simple")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1  # 1-row bound


def test_cross_doc_coverage_no_string_shuffle_no_window(spark):
    """The cross-doc duplicated-span metric shuffles 8-byte gram
    hashes, never gram strings, and uses the join formulation (not a
    per-gram window, whose WindowExec would buffer a stop-gram
    partition in one task). The gram-hash frame is checkpointed
    (r13): ONE tokenize+md5 pass feeds both the frequency aggregate
    and the coverage probe as ExistingRDD scans — no explicit
    repartition survives and no documents scan appears twice."""
    from goe_spark.queries.dedup import cross_doc_ngram_coverage

    plan = _plan(cross_doc_ngram_coverage(spark, SF_SMALL), "simple")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "concat_ws" not in plan  # grams stay arithmetic hashes
    # both consumers read the checkpointed gram frame, not re-planned
    # shingle scans (the pre-r13 shape tokenized the corpus twice)
    assert plan.count("ExistingRDD") >= 2
    assert plan.count("REPARTITION_BY_COL") == 0


def test_top_duplicate_ngrams_takeordered_single_exchange(spark):
    """Heavy-hitter boilerplate grams: per-doc distinct trigrams
    partial-aggregate map-side, ONE gram exchange, and the top-k is
    TakeOrdered — no global sort of the gram table. On under-split
    local scans catalog.spread adds one repartition exchange so the
    trigram explode parallelizes (absent on a many-file corpus)."""
    from goe_spark.queries.dedup import top_duplicate_ngrams

    plan = _plan(top_duplicate_ngrams(spark, SF_SMALL), "simple")
    assert "TakeOrderedAndProject" in plan
    assert 1 <= plan.count("Exchange") <= 2


def test_pq_encode_below_join_scores_codes_not_vectors(spark):
    """PQ plan: encoding happens ONCE per vector below the broadcast
    query join (never per (vector, query) pair), the ADC scan carries
    no raw embedding payload into the shortlist window, and the only
    join operators are broadcasts — the compressed-scan shape that
    gives the 32x read reduction at 100 TB."""
    from goe_spark.catalog import load_table
    from goe_spark.operators.pq import pq_topk

    df = pq_topk(load_table(spark, SF_SMALL, "embeddings"), 5, 10)
    plan = _plan(df, "simple")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # encode appears exactly once per subspace (8 array_min over the
    # codeword transforms, all in ONE projection); a collapsed plan
    # that re-encoded per (vector, query) pair or per consumer would
    # duplicate them
    assert plan.count("array_min(transform(") == 8
    # the shortlist window sorts (qid, ad, vec_id) triples only
    import re

    m = re.search(r"Sort \[qid#\d+L ASC NULLS FIRST, ad#\d+", plan)
    assert m, "shortlist window sort on (qid, ad) not found"


def test_kll_and_theta_sketches_aggregate_mapside(spark):
    """KLL and theta sketch aggregations must partial-aggregate
    map-side (ObjectHashAggregate pairs) so exchanges carry KB sketch
    states, never raw values; weighted sampling must plan as
    TakeOrdered with zero pre-gather exchanges."""
    from goe_spark.queries.sketches import (
        audience_overlap_theta,
        value_quantiles_kll,
    )
    from goe_spark.queries.training import weighted_sample_docs

    p = _plan(value_quantiles_kll(spark, SF_SMALL), "simple")
    assert p.count("ObjectHashAggregate") >= 4  # partial+final pairs
    assert p.count("Join") == 1  # the exact control only

    p = _plan(audience_overlap_theta(spark, SF_SMALL), "simple")
    assert p.count("ObjectHashAggregate") >= 2

    p = _plan(weighted_sample_docs(spark, SF_SMALL), "simple")
    assert "TakeOrderedAndProject" in p
    assert p.count("Exchange") == 0


def test_pii_and_gopher_are_single_scan_single_exchange(spark):
    """Filter passes must stay scan-bound: all regex/array work rides
    the scan inside codegen; the only exchange is the final
    small-cardinality aggregate merge."""
    from goe_spark.queries.pii import (
        gopher_quality_filter,
        pii_redaction_audit,
        pii_scan_by_source,
    )

    for fn in (pii_scan_by_source, pii_redaction_audit, gopher_quality_filter):
        plan = _plan(fn(spark, SF_SMALL), "simple")
        assert "Join" not in plan, fn.__name__
        assert plan.count("Exchange") == 1, fn.__name__
        assert plan.count("Scan parquet") == 1, fn.__name__


def test_bpe_merge_pair_explode_at_vocabulary_grain(spark):
    """The pair explode must sit ABOVE the wordcount aggregate (i.e.
    operate on the distinct-word table), never on the raw corpus —
    the property that keeps BPE statistics affordable at 100 TB."""
    from goe_spark.queries.training import bpe_merge_pair_counts

    plan = _plan(bpe_merge_pair_counts(spark, SF_SMALL), "simple")
    # top-k is TakeOrdered (no global sort exchange)
    assert "TakeOrderedAndProject" in plan
    # two Generates: pair explode (top) and token explode (bottom);
    # the wordcount aggregate keyed on w must sit BETWEEN them —
    # i.e. the pair explode consumes the aggregated vocabulary.
    i_pair_gen = plan.index("Generate")
    i_word_agg = plan.index("HashAggregate(keys=[w#")
    i_tok_gen = plan.rindex("Generate")
    assert i_pair_gen < i_word_agg < i_tok_gen, plan


def test_span_corruption_start_hash_computed_once(spark):
    """The O(n*SPAN_LEN) shape of span_corruption_stats depends on the
    optimizer KEEPING the staged `starts` array as its own projection:
    if a future Spark's CollapseProject inlines the multi-referenced
    alias back into the consuming lambdas, every per-position exists()
    re-evaluates the md5 transform and the query regresses to O(n^2)
    per document (round 5 measured 18x). Guard: the md5-bearing
    transform must appear exactly once in the optimized plan."""
    from goe_spark.queries.training import span_corruption_stats

    plan = _plan(
        span_corruption_stats(spark, SF_SMALL), "extended"
    )
    optimized = plan.split("== Optimized Logical Plan ==")[1].split(
        "== Physical Plan =="
    )[0]
    assert optimized.count("md5(") == 1, (
        "span-start hash inlined into consumers — O(n^2) regression:\n"
        + optimized
    )


def test_join_skew_report_distributed_topk_no_global_window(spark):
    """join_skew_report ranks per-key counts; at 100 TB the user_id key
    has billions of distinct values, so an unpartitioned row_number()
    window would funnel the whole count table through one task (the
    round-6 plan audit caught exactly that). The top-k must compile to
    TakeOrderedAndProject — per-partition heap, driver merges K rows
    per partition — with NO WindowExec anywhere in the plan."""
    from goe_spark.queries.profiling import join_skew_report

    plan = _plan(join_skew_report(spark, SF_SMALL), "simple")
    assert "Window" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_customer_value_deciles_no_global_window(spark):
    """The decile/percent_rank/cume report used a global ntile window
    — one task holding the whole customer table (billions of rows at
    100 TB). The two-pass rank must show NO WindowExec at all: a
    range-partitioned exchange distributes the sort, positions come
    from partition-offset arithmetic, distribution values from plain
    column math."""
    from goe_spark.queries.timeseries import customer_value_deciles

    plan = _plan(customer_value_deciles(spark, SF_SMALL), "simple")
    assert "Window" not in plan, plan
    # the range shuffle lives inside the locally-checkpointed subtree
    # (truncated to Scan ExistingRDD here); test_ranks pins it on the
    # pre-checkpoint frame via ranked_prelude
    assert "Scan ExistingRDD" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_segment_dedup_single_scan_no_join(spark):
    """Boilerplate-segment accounting: ONE corpus scan, no join. The
    fp doc-frequency rides a sort-free count over an fp-partitioned
    window (the dedup_exact_keep_first shape); everything that
    shuffles is fingerprints + ids."""
    from goe_spark.queries.pipeline_ops import segment_dedup_stats

    plan = _plan(segment_dedup_stats(spark, SF_SMALL), "simple")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    assert "windowspecdefinition(fp" in plan, plan


def test_shard_manifest_single_scan_single_exchange(spark):
    """Shard assignment is a map-side key: exactly one file scan and
    one aggregation exchange (shard grain)."""
    from goe_spark.queries.pipeline_ops import shard_manifest

    plan = _plan(shard_manifest(spark, SF_SMALL), "simple")
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange") == 1, plan


def test_filter_funnel_single_scan(spark):
    """The whole funnel is ONE conditional-aggregation pass."""
    from goe_spark.queries.pipeline_ops import filter_funnel_report

    plan = _plan(filter_funnel_report(spark, SF_SMALL), "simple")
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange") == 1, plan


def test_per_source_cap_window_is_partitioned(spark):
    """The top-k window partitions BY SOURCE (executor-local sorts) —
    never an unpartitioned global ranking.

    ALSO pins WindowGroupLimit (Spark >= 3.5's InferWindowGroupLimit
    rule): `row_number() <= K` must compile to a per-group top-K
    prefilter BEFORE the shuffle (Partial mode) plus the final limit
    after it. Without the map-side node, one dominant source — the
    realistic corpus shape — funnels its entire partition through a
    single task's sort at 100 TB; with it each map task forwards at
    most K rows per source. This query's skew-safety DEPENDS on the
    rule, so the guard asserts the node rather than trusting the
    optimizer silently (round-7 VERDICT watch-item 1)."""
    from goe_spark.queries.pipeline_ops import per_source_topk_cap

    plan = _plan(per_source_topk_cap(spark, SF_SMALL), "formatted")
    assert "windowspecdefinition(source" in plan, plan
    assert plan.count("WindowGroupLimit") >= 2, (
        "expected map-side (Partial) + final WindowGroupLimit nodes "
        "(Spark >= 3.5 InferWindowGroupLimit)\n" + plan
    )


def test_length_curriculum_no_global_window(spark):
    """Doc-grain global deciles must ride the distributed two-pass
    rank — no WindowExec, range-partitioned exchange present."""
    from goe_spark.queries.pipeline_ops import length_curriculum_bins

    plan = _plan(length_curriculum_bins(spark, SF_SMALL), "simple")
    assert "Window" not in plan, plan
    # range shuffle sits inside the checkpointed two-pass-rank subtree
    # (test_ranks pins it via ranked_prelude)
    assert "Scan ExistingRDD" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_media_dedup_shuffles_hashes_not_payloads(spark):
    """The dedup aggregate's exchange partitions on (kind, fp) — the
    payload bytes reduce map-side to a length and never shuffle."""
    from goe_spark.queries.multimodal import media_exact_dedup

    plan = _plan(media_exact_dedup(spark, SF_SMALL), "formatted")
    assert "hashpartitioning(kind" in plan, plan
    assert "Window" not in plan


def test_hybrid_search_windows_partitioned_pools_before_fusion(spark):
    """Hybrid RRF: every window partitions by qid (executor-local),
    the only cartesian is the broadcast 5-row query set, and fusion
    joins the two POOL-bounded lists — no corpus-sized join."""
    from goe_spark.queries.similarity import hybrid_search_rrf

    plan = _plan(hybrid_search_rrf(spark, SF_SMALL), "simple")
    assert "CartesianProduct" not in plan
    import re as _re

    for m in _re.finditer(r"windowspecdefinition\((\w+)#", plan):
        assert m.group(1) == "qid", plan


def test_media_dimensions_single_scan_no_python(spark):
    """Header-dimension parsing is pure codegen byte arithmetic: ONE
    corpus scan, ONE aggregation exchange (format grain, parsed ints
    only — payload bytes never shuffle), and NO Python worker in the
    plan."""
    from goe_spark.queries.multimodal import media_dimensions

    plan = _plan(media_dimensions(spark, SF_SMALL), "simple")
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange") == 1, plan
    assert "Python" not in plan, plan


def test_dsir_broadcast_lr_table_no_smj(spark):
    """DSIR scoring joins the token stream to the 512-row log-ratio
    table via BROADCAST (and the 1-row totals likewise) — a shuffle
    join keyed on bucket would move the whole token stream twice."""
    from goe_spark.queries.training import dsir_importance_weights

    plan = _plan(dsir_importance_weights(spark, SF_SMALL), "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_int8_audit_broadcast_scales_no_vector_shuffle(spark):
    """Quantization audit: the 64-row per-dim scale table broadcasts
    back to the dim-exploded stream; the only shuffles are the
    dim-grain scale aggregate and the exact-integer per-vector /
    per-label aggregates — embedding arrays never shuffle."""
    from goe_spark.queries.similarity import embedding_int8_audit

    plan = _plan(embedding_int8_audit(spark, SF_SMALL), "formatted")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # no exchange carries the embedding array column
    import re as _re

    for m in _re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "embedding" not in m.group(1), plan


def test_matryoshka_windows_share_qid_partition(spark):
    """Both rank windows partition by qid (executor-local sorts over
    the same exchange); the only join is the broadcast 5-row query
    set."""
    from goe_spark.queries.similarity import matryoshka_recall_audit

    plan = _plan(matryoshka_recall_audit(spark, SF_SMALL), "formatted")
    assert "windowspecdefinition(qid" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_k_anonymity_single_scan_two_aggregates(spark):
    """QI audit: one corpus scan, group-grain then lang-grain
    aggregates, no joins — the group table is bounded by
    |langs|x|sources|x|len buckets| at any corpus size."""
    from goe_spark.queries.pii import k_anonymity_audit

    plan = _plan(k_anonymity_audit(spark, SF_SMALL), "simple")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 2, plan


def test_cluster_histogram_rides_label_table(spark):
    """The size histogram aggregates the pair-bounded label relation —
    the corpus (documents scan) appears only inside the LSH pair
    lineage, never re-joined."""
    from goe_spark.queries.training import dedup_cluster_size_histogram

    plan = _plan(dedup_cluster_size_histogram(spark, SF_SMALL), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan


def test_media_wav_single_scan_no_python(spark):
    """WAV header parsing is pure codegen byte arithmetic like the
    image-dimension parse: ONE scan, ONE aggregate exchange, no
    Python worker, payload bytes never shuffle."""
    from goe_spark.queries.multimodal import media_wav_stats

    plan = _plan(media_wav_stats(spark, SF_SMALL), "simple")
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange") == 1, plan
    assert "Python" not in plan, plan


def test_line_dedup_shuffles_hashes_not_text(spark):
    """Line dedup joins on 64-bit line fingerprints: no exchange may
    carry the text (or token-array) column, and the fp join is a
    plain equi-join (no nested loop)."""
    import re as _re

    from goe_spark.queries.dedup import line_dedup_stats

    plan = _plan(line_dedup_stats(spark, SF_SMALL), "formatted")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    for m in _re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), plan
        assert "toks" not in m.group(1), plan


def test_knn_graph_no_cartesian_no_python(spark):
    """The kNN candidate join is an equi-join on (label, sub) — never
    a cartesian/BNLJ — and the whole graph build is codegen (array
    folds), no Python worker."""
    from goe_spark.queries.similarity import knn_graph_stats

    plan = _plan(knn_graph_stats(spark, SF_SMALL), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    assert "Python" not in plan, plan


def test_knn_graph_ivf_rides_materialized_index(spark):
    """knn_graph_ivf_stats must consume the MATERIALIZED IVF index —
    both sides of the rollup's self-join are parquet scans of the
    index's assigned/ files, and the quantizer chain (seed sample +
    Lloyd step + broadcast argmax) appears ZERO times in the plan
    (round-9 verdict item 3: the in-session rebuild cost 4.2 s/run at
    sf0.1 for work ensure_index already persisted)."""
    from goe_spark.queries.similarity import knn_graph_ivf_stats

    plan = _plan(knn_graph_ivf_stats(spark, SF_SMALL), "formatted")
    assert "ivf_index" in plan, plan
    # the quantizer's signature operators must be absent: the argmax
    # assignment is a broadcast nested-loop-free crossJoin + max_by
    assert "max_by" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    assert "Python" not in plan, plan


def test_vocab_overlap_inverted_index_join(spark):
    """Source-vocabulary overlap joins on the token (posting list
    bounded by |sources|) and BROADCASTS the vocab-size tables; no
    nested-loop pair enumeration anywhere."""
    from goe_spark.queries.text import vocab_overlap_sources

    plan = _plan(vocab_overlap_sources(spark, SF_SMALL), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_scd2_windows_user_partitioned(spark):
    """Every SCD2 window partitions by user_id — no global window may
    appear (a single-task sort of the event stream at 100 TB)."""
    import re as _re

    from goe_spark.queries.events_analytics import scd2_event_type_history

    plan = _plan(scd2_event_type_history(spark, SF_SMALL), "formatted")
    specs = _re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for s in specs:
        assert "user_id" in s, plan


def test_trigram_topk_takeordered(spark):
    """Trigram top-k ends in TakeOrderedAndProject (no global sort);
    leads are user-partitioned windows."""
    from goe_spark.queries.events_analytics import event_trigram_topk

    plan = _plan(event_trigram_topk(spark, SF_SMALL), "formatted")
    assert "TakeOrderedAndProject" in plan, plan
    assert "windowspecdefinition(user_id" in plan, plan


def test_entropy_two_hash_aggregates_no_join(spark):
    """Entropy is two chained hash aggregates over one scan — no join
    and no window anywhere in the plan."""
    from goe_spark.queries.text import token_entropy_by_source

    plan = _plan(token_entropy_by_source(spark, SF_SMALL), "simple")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan


def test_emb_dim_stats_single_scan_bounded_groups(spark):
    """Per-dimension moments: one scan, one aggregation exchange on
    the 64-group dim key, no Python, no join."""
    from goe_spark.queries.similarity import embedding_dimension_stats

    plan = _plan(embedding_dimension_stats(spark, SF_SMALL), "simple")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan


def test_cross_lang_no_hashing_below_the_spread_exchange(spark):
    """Round-9 regression pin: a plain explode over the shingle array
    made Catalyst infer `size(sh) > 0` and push it below the
    parallelizing repartition, inlining the md5 shingle hashing into a
    single-split filter (41 s single-core at sf0.1). No Filter node
    may contain the md5 hashing — the expensive projection must stay
    above the spread exchange."""
    from goe_spark.queries.dedup import cross_lang_shingle_leakage

    from goe_spark.queries.dedup import line_dedup_stats

    for q in (cross_lang_shingle_leakage, line_dedup_stats):
        plan = _plan(q(spark, SF_SMALL), "simple")
        for line in plan.splitlines():
            if "Filter" in line:
                assert "md5" not in line, (q.__name__, line)


def test_paragraph_pairs_no_quadratic_join_no_text_shuffle(spark):
    """Paragraph pair generation is the banded-LSH shape: no
    cartesian/BNLJ, no exchange carrying text or token arrays, and no
    md5 hashing pushed into a Filter below the spread exchange (the
    cross_lang/line_dedup plan discipline at paragraph grain)."""
    import re as _re

    from goe_spark.queries.dedup import _paragraph_sigs, paragraph_dup_pairs

    sigs = _paragraph_sigs(spark, SF_SMALL)
    plan = _plan(paragraph_dup_pairs(sigs), "formatted")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    for m in _re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), plan
        assert "ptoks" not in m.group(1), plan
    for line in plan.splitlines():
        if "Filter" in line:
            assert "md5" not in line, line


def test_paragraph_stats_reads_materialized_index(spark):
    """Full-catalog paragraph_dedup_stats consumes the persisted
    paragraph index: the plan scans the index parquet and contains
    ZERO md5 shingle hashing (signatures are never recomputed)."""
    from goe_spark.operators.paragraph_index import ensure_paragraph_index
    from goe_spark.queries.dedup import paragraph_dedup_stats

    ensure_paragraph_index(spark, SF_SMALL)
    plan = _plan(paragraph_dedup_stats(spark, SF_SMALL), "simple")
    assert "paragraph_index" in plan, plan
    assert "md5" not in plan, plan
