"""Mergeable-sketch operators: HyperLogLog distinct counting with
re-aggregation — the sketch pattern every 100 TB metrics pipeline
relies on, because exact COUNT(DISTINCT) over billions of users
forces a full shuffle of the key column while a sketch reduces each
partition to a fixed-size register array that merges associatively.

Spark ships Apache DataSketches HLL natively (`hll_sketch_agg` /
`hll_union_agg` / `hll_sketch_estimate`), so the whole plan is
JVM-side with map-side partial aggregation: each executor sketches
its partitions locally and the shuffle carries lgK-sized binary
registers, not user ids.

The estimates are deterministic (DataSketches hashes are seeded
constants) but NOT reproducible in DuckDB — its approx_count_distinct
uses a different HLL implementation — so `daily_distinct_users_hll`
registers a rows-only oracle (the driver's weaker check) and the
strong guarantees live in pytest:

- merge consistency: unioning fine-grain sub-sketches re-estimates
  the coarse grain within the sketch's own error envelope (in exact
  coupon mode the estimates are identical; once promoted to HLL
  registers, DataSketches' HLL_4 -> HLL_8 union target shifts the
  estimator by well under the published error), and
- accuracy: every estimate within the published HLL error envelope
  of the exact distinct count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.catalog import load_table, pin_cpu_stage
from goe_spark.queries import QuerySpec

# lgConfigK = 12 -> 4 KiB registers, ~1.6% relative standard error —
# the size/accuracy point most metrics stores ship as the default.
HLL_LGK = 12


def daily_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct users three ways — exact, single-pass HLL, and
    HLL re-aggregated from per-event-type sub-sketches — plus the two
    estimates' relative difference. The re-aggregated column is the
    point: it proves the sketch column can be stored at a fine grain
    (day x event_type) and rolled up to any coarser grain without
    rescanning the facts, which is what makes sketches the 100 TB
    answer to distinct counting.

    Plan: one shuffle keyed on (day, event_type) carrying 4 KiB
    register blobs after map-side partial sketching, one
    day-cardinality merge, one broadcast-size join with the exact
    control. At scale the exact control column is dropped and the
    whole query is sketch-only."""
    e = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "event_type", "user_id"
    )
    fine = e.groupBy("day", "event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sk")
    )
    rolled = fine.groupBy("day").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("hll_merged")
    )
    direct = e.groupBy("day").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(HLL_LGK))
        ).alias("hll_direct"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return (
        direct.join(rolled, "day")
        .select(
            "day",
            "exact_users",
            "hll_direct",
            "hll_merged",
            F.round(
                F.abs(F.col("hll_merged") - F.col("hll_direct"))
                / F.col("hll_direct"),
                6,
            ).alias("merge_rel_diff"),
        )
    )


ROLLING_DAYS = 7


def rolling_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing {ROLLING_DAYS}-day distinct users from merged DAILY
    sketches — the query that makes sketches non-negotiable at scale:
    exact rolling distinct must rescan {ROLLING_DAYS} days of raw
    events per output day (users repeat across days, so daily exact
    counts cannot be added), while sketch registers merge.

    Plan: one shuffle builds the day-grain sketch relation; each day's
    sketch then EXPLODES to the {ROLLING_DAYS} window-end days it
    contributes to and a second day-cardinality groupBy unions the
    registers — no range join, no BroadcastNestedLoopJoin, and the
    raw events are scanned exactly once. Windows ending past the last
    observed day are dropped; interior days without events keep their
    row (their window draws on the preceding days)."""
    e = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    daily = e.groupBy("day").agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sk")
    )
    contrib = daily.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add("day", ROLLING_DAYS - 1))
        ).alias("window_end"),
        "sk",
    )
    rolled = contrib.groupBy("window_end").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("rolling_users"),
        F.count(F.lit(1)).alias("days_in_window"),
    )
    # Bound the series to the observed calendar span: contributions
    # past max(day) describe windows ending after the data. Interior
    # zero-event days still get their row (their window draws on the
    # preceding days), which a semi join on observed days would
    # silently drop.
    bounds = daily.agg(F.max("day").alias("max_day"))
    return (
        rolled.crossJoin(F.broadcast(bounds))
        .where(F.col("window_end") <= F.col("max_day"))
        .select("window_end", "days_in_window", "rolling_users")
    )


def value_quantiles_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value quantiles three ways — exact, a direct
    KLL sketch, and KLL MERGED from daily sub-sketches — the quantile
    twin of daily_distinct_users_hll. Exact percentiles over 100 TB
    need a full sort (or a giant percentile_approx state) per group;
    a KLL sketch is a few KB per (day, type) cell, stored at fine
    grain and merged to any coarser grain without rescanning facts,
    with published deterministic error bounds (DataSketches KLL,
    Karnin-Lang-Liberty FOCS'16).

    Plan: one shuffle keyed (day, type) carrying KLL blobs after
    map-side partial sketching; one type-cardinality merge; broadcast
    join with the exact control (dropped at scale)."""
    e = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "event_type", "value"
    )
    fine = e.groupBy("day", "event_type").agg(
        F.kll_sketch_agg_double("value").alias("sk")
    )
    merged = fine.groupBy("event_type").agg(
        F.kll_merge_agg_double("sk").alias("mk")
    )
    exact = e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("exact_p50"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("exact_p99"),
        F.kll_sketch_agg_double("value").alias("dk"),
    )
    return (
        exact.join(merged, "event_type")
        .select(
            "event_type",
            "exact_p50",
            "exact_p99",
            F.round(
                F.kll_sketch_get_quantile_double(F.col("dk"), F.lit(0.5)), 6
            ).alias("kll_p50_direct"),
            F.round(
                F.kll_sketch_get_quantile_double(F.col("mk"), F.lit(0.5)), 6
            ).alias("kll_p50_merged"),
            F.round(
                F.kll_sketch_get_quantile_double(F.col("mk"), F.lit(0.99)), 6
            ).alias("kll_p99_merged"),
            F.kll_sketch_get_n_double("mk").alias("n_values"),
        )
    )


def audience_overlap_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set algebra from THETA sketches: distinct users per
    event type sketched once, then union / intersection / difference
    ESTIMATED from the sketches — the 100 TB answer to
    INTERSECT/EXCEPT audience questions (exact set ops shuffle every
    user id; theta sketches are KB-sized and compose associatively,
    and unlike HLL they support intersection/difference).

    Output: one row per ordered event-type pair (a, b) with exact
    controls and sketch estimates for |A ∩ B| and |A \\ B|."""
    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    sk = e.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("sk")
    )
    pairs = (
        sk.select(
            F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a")
        )
        .join(
            sk.select(
                F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b")
            ),
            F.col("type_a") < F.col("type_b"),
        )
    )
    # Exact control on DISTINCT (event_type, user_id) pairs (r13):
    # the raw-event self-join fans out events-per-user² per user
    # (~67² at sf0.1 ⇒ ~3.3M joined rows) only for countDistinct to
    # collapse them again; deduping first bounds the fanout at
    # types-per-user² (≤ T² = 25) while producing the identical
    # (type_a, type_b, user) set, so exact_overlap is unchanged.
    tu = e.distinct()
    exact = (
        tu.alias("x")
        .join(tu.alias("y"), F.expr("x.user_id = y.user_id"))
        .where(F.expr("x.event_type < y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.countDistinct("x.user_id").alias("exact_overlap"))
    )
    return (
        pairs.join(exact, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            F.coalesce("exact_overlap", F.lit(0)).alias("exact_overlap"),
            F.theta_sketch_estimate(
                F.theta_intersection("sk_a", "sk_b")
            ).alias("theta_overlap"),
            F.theta_sketch_estimate(
                F.theta_difference("sk_a", "sk_b")
            ).alias("theta_only_a"),
            F.theta_sketch_estimate(F.theta_union("sk_a", "sk_b")).alias(
                "theta_union"
            ),
        )
    )


# Count-min sketch as a RELATIONAL table: depth x width counters,
# (grain, depth, bucket, n) rows. Unlike binary sketch blobs this is
# mergeable by plain SUM at any grain and replayable exactly by any
# SQL engine — which is why it gets a full hash-compared oracle where
# the DataSketches queries above are rows-only.
CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_PROBE_USERS = (1, 7, 42, 99, 140)


def _cms_bucket(depth_col, key_col):
    from goe_spark.functions.hashing import hash64

    return F.pmod(
        hash64(F.concat(depth_col.cast("string"), F.lit(":"), key_col)),
        F.lit(CMS_WIDTH),
    )


def cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency estimation via a table-form count-min sketch, with
    the exact control riding along.

    Build: per (day, depth, bucket) counts of events keyed by user —
    the day grain is the point: daily sketch tables MERGE to any
    coarser window by SUM over the tiny (depth x width) counter
    relation, never rescanning events (the same fine-grain-rollup
    property the HLL/KLL queries prove for their sketch types).
    Estimate: each probe user hashes to one bucket per depth; its
    estimate is the MIN across depths of the merged counters —
    overestimation-only by construction (counters only ever include
    extra collisions), asserted per row in the output.

    Plan: the build is one map-side-combined aggregate over a
    {CMS_DEPTH}-way explode (the explode multiplies rows BEFORE
    partial aggregation, so the shuffle carries at most
    days x depth x width counter rows, not events); the probe side is
    a {len(CMS_PROBE_USERS)}-row broadcast; the exact control is one
    group-by on the probed users only. At 100 TB the counter relation
    is the only thing that moves.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"),
        F.col("user_id").cast("string").alias("key"),
    )
    depth = F.explode(
        F.array(*[F.lit(i) for i in range(CMS_DEPTH)])
    ).alias("depth")
    # Aggregate to (day, key) grain BEFORE the depth explode: the
    # fact-sized shuffle carries key-grain partial counts once, and
    # the x{CMS_DEPTH} row multiplication happens on the tiny
    # (day, key) relation — measured ~25% faster than exploding the
    # raw events, and the gap widens with depth.
    per_key = ev.groupBy("day", "key").agg(F.count(F.lit(1)).alias("kn"))
    # The (day, key) relation is a few hundred KB, so AQE coalesces
    # the post-groupBy stage to ONE task — which then pays the
    # x{CMS_DEPTH} explode plus one md5 bucket hash per exploded row
    # serially (measured: a 0.8 s single-task stage). Pin the CPU
    # stage on "key" alone: pinning on (day, key) is byte-identical
    # to the groupBy's own hash partitioning and the planner removes
    # it as redundant, handing the stage back to AQE's coalescer.
    per_key = pin_cpu_stage(per_key, "key")
    daily = (
        per_key.select("day", "key", "kn", depth)
        .withColumn("bucket", _cms_bucket(F.col("depth"), F.col("key")))
        .groupBy("day", "depth", "bucket")
        .agg(F.sum("kn").alias("n"))
    )
    merged = daily.groupBy("depth", "bucket").agg(F.sum("n").alias("n"))
    probes = spark.createDataFrame(
        [(str(u),) for u in CMS_PROBE_USERS], "key string"
    ).select("key", depth).withColumn(
        "bucket", _cms_bucket(F.col("depth"), F.col("key"))
    )
    est = (
        probes.join(merged, ["depth", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cms_est"))
    )
    exact = (
        ev.where(F.col("key").isin([str(u) for u in CMS_PROBE_USERS]))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    return (
        est.join(exact, "key", "left")
        .select(
            F.col("key").cast("long").alias("user_id"),
            F.coalesce("exact_n", F.lit(0)).alias("exact_n"),
            "cms_est",
            (F.col("cms_est") >= F.coalesce("exact_n", F.lit(0))).alias(
                "never_underestimates"
            ),
        )
    )


def _cms_sql() -> str:
    from goe_spark.functions.hashing import hash64_sql

    bucket = hash64_sql("cast(depth AS varchar) || ':' || key")
    probe_list = ", ".join(f"('{u}')" for u in CMS_PROBE_USERS)
    probe_in = ", ".join(f"'{u}'" for u in CMS_PROBE_USERS)
    return f"""
WITH ev AS (
  SELECT cast(ts AS date) AS day, cast(user_id AS varchar) AS key
  FROM events
), depths AS (
  SELECT unnest(range(0, {CMS_DEPTH})) AS depth
), per_key AS (
  SELECT day, key, count(*) AS kn FROM ev GROUP BY 1, 2
), daily AS (
  SELECT day, depth, ({bucket}) % {CMS_WIDTH} AS bucket,
         sum(kn) AS n
  FROM per_key CROSS JOIN depths
  GROUP BY 1, 2, 3
), merged AS (
  SELECT depth, bucket, sum(n) AS n FROM daily GROUP BY 1, 2
), probes AS (
  SELECT key, depth, ({bucket}) % {CMS_WIDTH} AS bucket
  FROM (VALUES {probe_list}) p(key) CROSS JOIN depths
), est AS (
  SELECT key, min(coalesce(m.n, 0)) AS cms_est
  FROM probes LEFT JOIN merged m USING (depth, bucket)
  GROUP BY key
), exact AS (
  SELECT key, count(*) AS exact_n FROM ev
  WHERE key IN ({probe_in}) GROUP BY key
)
SELECT cast(e.key AS bigint) AS user_id,
       cast(coalesce(x.exact_n, 0) AS bigint) AS exact_n,
       cast(e.cms_est AS bigint) AS cms_est,
       (e.cms_est >= coalesce(x.exact_n, 0)) AS never_underestimates
FROM est e LEFT JOIN exact x USING (key)
"""


# ---------------------------------------------------------------------------
# Exact-control hashable surfaces.
#
# DataSketches HLL/KLL/theta estimates have no DuckDB twin, so the raw
# estimate columns can never survive a cross-engine value hash. But the
# driver's full hash check is far stronger evidence than rows-only, so
# the REGISTRY entries project each sketch query onto a surface both
# engines can agree on exactly:
#   - the exact control columns (SQL-replayable aggregations), and
#   - one boolean per sketch estimate asserting it landed inside its
#     published error envelope (the oracle asserts TRUE literally).
# A broken sketch plan flips a boolean and fails the hash; the raw
# estimate values remain available from the detail functions above and
# stay covered by tests/test_timeseries_sketches.py (accuracy + merge
# consistency at tighter bounds).
# ---------------------------------------------------------------------------

# Envelopes are deliberately WIDE (~6 sigma, double the 3-sigma bound
# the accuracy pytest checks at): these booleans gate the driver's
# hash compare, so they must only flip on a broken PLAN, never on an
# unlucky-but-legitimate estimate after the driver regenerates fixture
# data (ADVICE r6: a 3-sigma gate turns estimator luck into a
# confusing hash mismatch). The tight 3-sigma accuracy assertions live
# in tests/test_timeseries_sketches.py where a failure reads as what
# it is.
# lgK=12 -> RSE ~1.625%.
HLL_REL_ERR = 0.10
# KLL default k -> ~1.65% normalized rank error.
KLL_RANK_EPS = 0.10
# theta default k=4096 -> ~1.6% sampling error on the union; set-op
# estimates inherit it scaled by the union, with an absolute floor
# for near-empty intersections.
THETA_REL_ERR = 0.10


def daily_distinct_users_hll_checked(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Driver surface for daily_distinct_users_hll: exact distinct
    users per day plus within-envelope booleans for the direct and
    merged HLL estimates."""
    d = daily_distinct_users_hll(spark, sf_dir)
    rel = F.abs(F.col("hll_direct") - F.col("exact_users")) / F.col(
        "exact_users"
    )
    return d.select(
        "day",
        "exact_users",
        (rel <= HLL_REL_ERR).alias("hll_within_err"),
        (F.col("merge_rel_diff") <= HLL_REL_ERR).alias("merge_consistent"),
    )


DAILY_HLL_CHECKED_SQL = """
SELECT cast(ts AS date) AS day,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS hll_within_err,
       TRUE AS merge_consistent
FROM events
GROUP BY 1
"""


def rolling_distinct_users_hll_checked(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Driver surface for rolling_distinct_users_hll: the exact
    trailing-window distinct-user count per window end (computed by
    the same explode-to-window-end pattern the sketch uses, over the
    distinct (day,user) relation — dropped at scale, where the sketch
    IS the answer) plus the estimate's envelope boolean."""
    est = rolling_distinct_users_hll(spark, sf_dir)
    e = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    pairs = e.distinct()
    exact = (
        pairs.select(
            F.explode(
                F.sequence(F.col("day"), F.date_add("day", ROLLING_DAYS - 1))
            ).alias("window_end"),
            "user_id",
        )
        .groupBy("window_end")
        .agg(F.countDistinct("user_id").alias("exact_rolling_users"))
    )
    rel = F.abs(
        F.col("rolling_users") - F.col("exact_rolling_users")
    ) / F.col("exact_rolling_users")
    return est.join(exact, "window_end").select(
        "window_end",
        "days_in_window",
        "exact_rolling_users",
        (rel <= HLL_REL_ERR).alias("rolling_within_err"),
    )


ROLLING_HLL_CHECKED_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT cast(ts AS date) AS day, user_id FROM events
), bounds AS (
  SELECT max(day) AS hi FROM pairs
), ends AS (
  SELECT DISTINCT day + cast(k AS integer) AS window_end
  FROM pairs CROSS JOIN (SELECT unnest(range(0, {ROLLING_DAYS})) AS k),
       bounds
  WHERE day + cast(k AS integer) <= bounds.hi
), days AS (
  SELECT DISTINCT day FROM pairs
)
SELECT e.window_end,
       (SELECT count(*) FROM days d
        WHERE d.day BETWEEN e.window_end - {ROLLING_DAYS - 1}
                        AND e.window_end) AS days_in_window,
       (SELECT count(DISTINCT p.user_id) FROM pairs p
        WHERE p.day BETWEEN e.window_end - {ROLLING_DAYS - 1}
                        AND e.window_end) AS exact_rolling_users,
       TRUE AS rolling_within_err
FROM ends e
"""


def value_quantiles_kll_checked(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Driver surface for value_quantiles_kll: exact n / p50 / p99 per
    event type plus rank-window booleans — each KLL estimate must land
    between the exact quantiles at (q - eps) and (q + eps), the value
    form of DataSketches' rank-error guarantee."""
    d = value_quantiles_kll(spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    lo50, hi50 = 0.5 - KLL_RANK_EPS, 0.5 + KLL_RANK_EPS
    lo99 = 0.99 - KLL_RANK_EPS
    bounds = e.groupBy("event_type").agg(
        F.expr(f"percentile(value, {lo50})").alias("b_lo50"),
        F.expr(f"percentile(value, {hi50})").alias("b_hi50"),
        F.expr(f"percentile(value, {lo99})").alias("b_lo99"),
        F.max("value").alias("b_max"),
    )
    return d.join(bounds, "event_type").select(
        "event_type",
        "n_values",
        "exact_p50",
        "exact_p99",
        F.col("kll_p50_direct")
        .between(F.col("b_lo50"), F.col("b_hi50"))
        .alias("p50_direct_in_window"),
        F.col("kll_p50_merged")
        .between(F.col("b_lo50"), F.col("b_hi50"))
        .alias("p50_merged_in_window"),
        F.col("kll_p99_merged")
        .between(F.col("b_lo99"), F.col("b_max"))
        .alias("p99_merged_in_window"),
    )


KLL_CHECKED_SQL = """
SELECT event_type,
       count(value) AS n_values,
       round(quantile_cont(value, 0.5), 6) AS exact_p50,
       round(quantile_cont(value, 0.99), 6) AS exact_p99,
       TRUE AS p50_direct_in_window,
       TRUE AS p50_merged_in_window,
       TRUE AS p99_merged_in_window
FROM events
GROUP BY event_type
"""


def audience_overlap_theta_checked(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Driver surface for audience_overlap_theta: exact overlap /
    only-a / union per ordered event-type pair plus envelope booleans
    for the three theta estimates (tolerance relative to the exact
    union, with an absolute floor of 2 for near-empty set results)."""
    d = audience_overlap_theta(spark, sf_dir)
    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    counts = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    d = (
        d.join(
            F.broadcast(
                counts.select(
                    F.col("event_type").alias("type_a"),
                    F.col("n_users").alias("n_a"),
                )
            ),
            "type_a",
        )
        .join(
            F.broadcast(
                counts.select(
                    F.col("event_type").alias("type_b"),
                    F.col("n_users").alias("n_b"),
                )
            ),
            "type_b",
        )
        .withColumn(
            "exact_only_a", F.col("n_a") - F.col("exact_overlap")
        )
        .withColumn(
            "exact_union",
            F.col("n_a") + F.col("n_b") - F.col("exact_overlap"),
        )
    )
    tol = F.greatest(F.lit(2.0), F.lit(THETA_REL_ERR) * F.col("exact_union"))
    return d.select(
        "type_a",
        "type_b",
        "exact_overlap",
        "exact_only_a",
        "exact_union",
        (F.abs(F.col("theta_overlap") - F.col("exact_overlap")) <= tol).alias(
            "overlap_within_err"
        ),
        (F.abs(F.col("theta_only_a") - F.col("exact_only_a")) <= tol).alias(
            "only_a_within_err"
        ),
        (F.abs(F.col("theta_union") - F.col("exact_union")) <= tol).alias(
            "union_within_err"
        ),
    )


THETA_CHECKED_SQL = """
WITH tu AS (
  SELECT DISTINCT event_type, user_id FROM events
), counts AS (
  SELECT event_type, count(*) AS n_users FROM tu GROUP BY 1
), overlap AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS exact_overlap
  FROM tu a JOIN tu b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
), pairs AS (
  SELECT ca.event_type AS type_a, cb.event_type AS type_b,
         ca.n_users AS n_a, cb.n_users AS n_b
  FROM counts ca JOIN counts cb ON ca.event_type < cb.event_type
)
SELECT p.type_a, p.type_b,
       coalesce(o.exact_overlap, 0) AS exact_overlap,
       p.n_a - coalesce(o.exact_overlap, 0) AS exact_only_a,
       p.n_a + p.n_b - coalesce(o.exact_overlap, 0) AS exact_union,
       TRUE AS overlap_within_err,
       TRUE AS only_a_within_err,
       TRUE AS union_within_err
FROM pairs p LEFT JOIN overlap o USING (type_a, type_b)
"""


QUERIES = [
    QuerySpec("cms_user_counts", cms_user_counts, _cms_sql()),
    # Exact-control hashable surfaces (see block comment above): the
    # registry entries hash exact controls + envelope booleans; raw
    # estimates live in the detail functions and pytest.
    QuerySpec(
        "daily_distinct_users_hll",
        daily_distinct_users_hll_checked,
        DAILY_HLL_CHECKED_SQL,
    ),
    QuerySpec(
        "rolling_distinct_users_hll",
        rolling_distinct_users_hll_checked,
        ROLLING_HLL_CHECKED_SQL,
    ),
    QuerySpec(
        "value_quantiles_kll", value_quantiles_kll_checked, KLL_CHECKED_SQL
    ),
    QuerySpec(
        "audience_overlap_theta",
        audience_overlap_theta_checked,
        THETA_CHECKED_SQL,
    ),
]
