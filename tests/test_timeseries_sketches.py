"""Structural invariants for the time-series / sketch operators that
the hash-vs-oracle gate cannot express: spine density and LOCF
semantics for gap-fill, probability-simplex closure for the
transition matrix, balanced ntile buckets, non-overlapping validity
intervals for gaps-and-islands, and the HLL error/merge envelopes
(which have no DuckDB twin at all)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from tests.conftest import SF_MEDIUM, SF_SMALL

SF = SF_MEDIUM


def test_gapfill_spine_is_dense_and_locf_carries(spark):
    from goe_spark.queries.timeseries import timeseries_gapfill

    rows = sorted(timeseries_gapfill(spark, SF).collect(), key=lambda r: r.day)
    days = [r.day for r in rows]
    span = (days[-1] - days[0]).days + 1
    assert len(days) == span, "spine must cover every calendar day"
    assert all(
        (b - a).days == 1 for a, b in zip(days, days[1:])
    ), "spine days must be consecutive"
    # The fixture guarantees gap days (value > threshold is sparse).
    gaps = [r for r in rows if r.n_sales == 0]
    assert gaps, "fixture must exercise the gap-fill path"
    # LOCF: a gap day carries the previous day's filled value.
    by_day = {r.day: r for r in rows}
    for r in gaps:
        prev = by_day.get(r.day - datetime.timedelta(days=1))
        if prev is not None:
            assert r.locf_revenue == prev.locf_revenue
    # Days before the first sale are zero-filled.
    first_sale = min(r.day for r in rows if r.n_sales > 0)
    for r in rows:
        if r.day < first_sale:
            assert r.locf_revenue == 0.0


def test_anomaly_days_flag_only_tail(spark):
    from goe_spark.queries.timeseries import (
        ANOMALY_Z,
        revenue_anomaly_days,
    )

    rows = revenue_anomaly_days(spark, SF).collect()
    assert rows, "series must contain at least one anomalous day"
    # The filter runs on the UNROUNDED z; the emitted z_score is
    # rounded to 3 decimals, so a borderline day can round down to
    # exactly the threshold.
    assert all(abs(r.z_score) >= ANOMALY_Z for r in rows)


def test_deciles_are_balanced_and_monotone(spark):
    from goe_spark.queries.timeseries import customer_value_deciles

    rows = customer_value_deciles(spark, SF).collect()
    sizes: dict[int, int] = {}
    for r in rows:
        sizes[r.decile] = sizes.get(r.decile, 0) + 1
    assert set(sizes) == set(range(1, 11))
    assert max(sizes.values()) - min(sizes.values()) <= 1, "ntile balance"
    # Spend is monotone non-increasing across deciles.
    lo_of = {
        d: min(r.total_spend for r in rows if r.decile == d)
        for d in sizes
    }
    hi_of = {
        d: max(r.total_spend for r in rows if r.decile == d)
        for d in sizes
    }
    for d in range(1, 10):
        assert lo_of[d] >= hi_of[d + 1]


def test_islands_partition_each_customer_history(spark):
    from goe_spark.queries.timeseries import order_status_islands

    rows = order_status_islands(spark, SF).collect()
    assert rows
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r.custkey, []).append(r)
    for cust, islands in by_cust.items():
        islands.sort(key=lambda r: r.island)
        # Island ids are 1..n dense per customer.
        assert [r.island for r in islands] == list(
            range(1, len(islands) + 1)
        )
        for a, b in zip(islands, islands[1:]):
            assert a.status != b.status, "adjacent islands must differ"
            assert a.valid_to <= b.valid_from, "intervals must not overlap"
        assert all(r.valid_from <= r.valid_to for r in islands)
    # Total orders across islands equals the filtered order count.
    from goe_spark.catalog import load_table
    from goe_spark.queries.timeseries import ISLAND_CUST_MOD

    n_orders = (
        load_table(spark, SF, "orders")
        .where(F.pmod(F.col("o_custkey"), F.lit(ISLAND_CUST_MOD)) == 0)
        .count()
    )
    assert sum(r.n_orders for r in rows) == n_orders


def test_transition_matrix_rows_sum_to_one(spark):
    from goe_spark.queries.timeseries import event_transition_matrix

    rows = event_transition_matrix(spark, SF).collect()
    assert rows
    by_prev: dict[str, float] = {}
    n_by_prev: dict[str, int] = {}
    for r in rows:
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.probability
        n_by_prev[r.prev_type] = n_by_prev.get(r.prev_type, 0) + 1
    for prev, total in by_prev.items():
        # Rounded 4-decimal probabilities: sum within rounding slack.
        assert abs(total - 1.0) <= 0.0001 * n_by_prev[prev] + 1e-9, prev


def test_tfidf_topk_per_doc(spark):
    from goe_spark.queries.text import TFIDF_TOP_N, tfidf_top_terms

    rows = tfidf_top_terms(spark, SF).collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, terms in by_doc.items():
        assert len(terms) <= TFIDF_TOP_N
        terms.sort(key=lambda r: r.rn)
        # Ranked by rounded score desc, term asc.
        for a, b in zip(terms, terms[1:]):
            assert a.tfidf >= b.tfidf
            if a.tfidf == b.tfidf:
                assert a.term < b.term
    # idf semantics: a term present in EVERY document scores exactly
    # ln(1) = 0; any rarer term scores strictly positive.
    from goe_spark.catalog import load_table

    n_docs = load_table(spark, SF, "documents").count()
    for r in rows:
        if r.df == n_docs:
            assert r.tfidf == 0.0
        else:
            assert r.df < n_docs and r.tfidf > 0.0


def test_hll_estimates_within_envelope_and_merge_consistent(spark):
    from goe_spark.queries.sketches import daily_distinct_users_hll

    rows = daily_distinct_users_hll(spark, SF).collect()
    assert rows
    for r in rows:
        rel = abs(r.hll_direct - r.exact_users) / r.exact_users
        # lgK=12 -> RSE ~1.6%; 3-sigma envelope.
        assert rel < 0.05, (r.day, r.hll_direct, r.exact_users)
        assert r.merge_rel_diff < 0.05
    # At sf0.01 per-day cardinalities sit in exact coupon mode: the
    # union must reproduce the direct sketch exactly.
    assert all(r.merge_rel_diff == 0.0 for r in rows)


def test_rolling_distinct_tracks_exact_window(spark):
    """Merged daily sketches must track the exact trailing-7-day
    distinct count within the HLL envelope, and the window day counts
    must reflect the calendar (ramping 1..7 from the first day)."""
    import datetime

    from pyspark.sql import functions as F

    from goe_spark.catalog import load_table
    from goe_spark.queries.sketches import (
        ROLLING_DAYS,
        rolling_distinct_users_hll,
    )

    rows = {r.window_end: r for r in rolling_distinct_users_hll(spark, SF).collect()}
    assert rows
    e = load_table(spark, SF, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    pairs = {(r.day, r.user_id) for r in e.distinct().collect()}
    days = sorted({d for d, _ in pairs})
    for end, r in rows.items():
        lo = end - datetime.timedelta(days=ROLLING_DAYS - 1)
        exact = len({u for d, u in pairs if lo <= d <= end})
        assert abs(r.rolling_users - exact) / exact < 0.05, (end, r, exact)
        assert r.days_in_window == sum(1 for d in days if lo <= d <= end)
    # Every calendar day reachable by a contribution (within the
    # window length after an observed day, bounded by the last
    # observed day) yields exactly one row — including interior
    # zero-event days, whose windows draw on the preceding days.
    reachable = {
        d + datetime.timedelta(days=k)
        for d in days
        for k in range(ROLLING_DAYS)
        if d + datetime.timedelta(days=k) <= days[-1]
    }
    assert set(rows) == reachable


def test_kll_quantiles_within_rank_error(spark):
    """KLL guarantees RANK error (~1.65% at the default k), not value
    error: each estimated quantile's rank among the exact values must
    sit within a +/-5% rank window of the target quantile. Merged
    (from daily sub-sketches) and direct sketches both qualify — the
    merge is the point. n flows through the merge exactly."""
    from pyspark.sql import functions as F

    from goe_spark.catalog import load_table
    from goe_spark.queries.sketches import value_quantiles_kll

    rows = value_quantiles_kll(spark, SF_SMALL).collect()
    assert rows
    e = load_table(spark, SF_SMALL, "events")
    for r in rows:
        vals = sorted(
            x.value
            for x in e.where(F.col("event_type") == r.event_type)
            .select("value")
            .collect()
        )
        n = len(vals)
        assert r.n_values == n  # count survives the merge exactly

        def rank_of(v):
            return sum(1 for x in vals if x <= v) / n

        for est, q in (
            (r.kll_p50_direct, 0.5),
            (r.kll_p50_merged, 0.5),
            (r.kll_p99_merged, 0.99),
        ):
            assert abs(rank_of(est) - q) <= 0.05, (r.event_type, q, est)


def test_theta_overlap_exact_below_k(spark):
    """At fixture cardinality every theta sketch is in exact mode
    (below k=4096 retained hashes), so intersection/difference/union
    estimates must EQUAL the exact set algebra — and the identities
    |A u B| = |A| + |B| - |A n B|, |A \\ B| = |A| - |A n B| hold
    row for row."""
    from pyspark.sql import functions as F

    from goe_spark.catalog import load_table
    from goe_spark.queries.sketches import audience_overlap_theta

    rows = audience_overlap_theta(spark, SF_SMALL).collect()
    assert len(rows) == 10  # C(5,2) ordered pairs
    e = load_table(spark, SF_SMALL, "events")
    counts = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.theta_overlap == r.exact_overlap, r
        assert r.theta_only_a == counts[r.type_a] - r.exact_overlap, r
        assert (
            r.theta_union
            == counts[r.type_a] + counts[r.type_b] - r.exact_overlap
        ), r


def test_cms_table_overestimates_only_and_merges_by_sum(spark):
    """Table-form CMS invariants: (1) estimates never undershoot the
    exact count; (2) merging daily counter tables by SUM equals
    building one sketch over the whole span (pure additivity)."""
    from pyspark.sql import functions as F

    from goe_spark.catalog import load_table
    from goe_spark.queries.sketches import (
        CMS_DEPTH,
        _cms_bucket,
        cms_user_counts,
    )
    from tests.conftest import SF_SMALL

    out = cms_user_counts(spark, SF_SMALL).collect()
    assert out and all(r.never_underestimates for r in out)
    assert all(r.cms_est >= r.exact_n for r in out)

    ev = load_table(spark, SF_SMALL, "events").select(
        F.col("ts").cast("date").alias("day"),
        F.col("user_id").cast("string").alias("key"),
    )
    depth = F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)])).alias(
        "depth"
    )
    base = ev.select("day", "key", depth).withColumn(
        "bucket", _cms_bucket(F.col("depth"), F.col("key"))
    )
    via_daily = (
        base.groupBy("day", "depth", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("depth", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    direct = base.groupBy("depth", "bucket").agg(F.count(F.lit(1)).alias("n"))
    a = {(r.depth, r.bucket): r.n for r in via_daily.collect()}
    b = {(r.depth, r.bucket): r.n for r in direct.collect()}
    assert a == b
