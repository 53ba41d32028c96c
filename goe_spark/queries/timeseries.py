"""Time-series and warehouse-pattern operators over the events and
orders tables: gap-filled daily rollups with last-observation-carried-
forward, z-score anomaly days, windowed value distribution functions
(ntile / percent_rank / cume_dist), gaps-and-islands interval
reconstruction (the SCD-2 / validity-interval building block), and a
first-order Markov transition matrix over per-user event sequences.

These are the operators a time-series warehouse (hypertable rollup /
"continuous aggregate" family) serves daily; none exist in the
reference (it is an offload orchestrator, SURVEY §2.9), so they are
additive scope expressed entirely with built-in DataFrame operations.

Scale notes (100 TB): every query aggregates the raw events table to
day- or user-grain FIRST, so the single-partition windows below run
over calendar-day-cardinality relations (thousands of rows regardless
of corpus size), never over raw events. The customer-cardinality
distribution queries (customer_value_deciles, rfm_segments) use the
distributed two-pass rank from `operators/ranks.py` — range-shuffle
positions plus broadcast boundary tuples — instead of any global
window, so they survive billion-customer tables too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from goe_spark.catalog import load_table
from goe_spark.operators.ranks import (
    POS,
    ntile_boundary_positions,
    ntile_expr,
    with_global_positions,
)
from goe_spark.queries import QuerySpec

# Restricting the gap-filled series to high-value sales (value above
# this fraction of the series max) guarantees the spine has BOTH
# populated and gap days at every shipped scale factor (populated
# days: 1/30 at sf0.001, 5/30 at sf0.01, 4/30 at sf0.1) — a gap-fill
# operator exercised on a dense (or empty) series proves nothing. A
# fixed absolute threshold cannot do this: the value distribution
# widens with SF, so any constant is all-gaps at one SF and no-gaps
# at another.
GAPFILL_MAX_FRACTION = 0.85

ANOMALY_Z = 1.0  # |z| threshold for flagging a day


def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily sales series: a dense calendar-day spine
    (sequence + explode over the events table's date bounds) left-
    joined with the sparse high-value daily rollup; missing days get
    n_sales = 0 and carry the last observed revenue forward (LOCF via
    last(ignorenulls) over an unbounded preceding frame).

    Plan: events aggregate to day grain before anything else; the
    spine is generated from a 1-row bounds aggregate, so the join and
    the LOCF window both run over calendar-day cardinality (30 rows
    here, ~36.5k rows for a century) — the single-partition window is
    free at any corpus scale."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase")
    mx = purchases.agg(F.max("value").alias("mx"))
    daily = (
        purchases.crossJoin(F.broadcast(mx))
        .where(F.col("value") > GAPFILL_MAX_FRACTION * F.col("mx"))
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_sales"),
            F.round(F.sum("value"), 2).alias("day_revenue"),
        )
    )
    spine = (
        e.agg(
            F.min(F.col("ts").cast("date")).alias("lo"),
            F.max(F.col("ts").cast("date")).alias("hi"),
        )
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return spine.join(daily, "day", "left").select(
        "day",
        F.coalesce("n_sales", F.lit(0)).alias("n_sales"),
        F.coalesce(
            F.last("day_revenue", ignorenulls=True).over(w), F.lit(0.0)
        ).alias("locf_revenue"),
    )


GAPFILL_SQL = f"""
WITH b AS (
  SELECT min(cast(ts AS date)) AS lo, max(cast(ts AS date)) AS hi FROM events
), spine AS (
  SELECT cast(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS date) AS day
  FROM b
), m AS (
  SELECT max(value) AS mx FROM events WHERE event_type = 'purchase'
), daily AS (
  SELECT cast(ts AS date) AS day,
         count(*) AS n_sales,
         round(sum(value), 2) AS day_revenue
  FROM events, m
  WHERE event_type = 'purchase' AND value > {GAPFILL_MAX_FRACTION} * mx
  GROUP BY 1
)
SELECT s.day,
       coalesce(d.n_sales, 0) AS n_sales,
       coalesce(last_value(d.day_revenue IGNORE NULLS)
                  OVER (ORDER BY s.day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                0.0) AS locf_revenue
FROM spine s LEFT JOIN daily d ON d.day = s.day
"""


def revenue_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly detection on the daily purchase-revenue series:
    days whose revenue deviates from the series mean by more than
    {ANOMALY_Z} population standard deviations, with the signed
    z-score. The basic monitoring query every metrics warehouse runs.

    Plan: one day-grain aggregate, one 1-row stats aggregate
    (broadcast cross join), a filter — the stats pass runs over the
    day-cardinality rollup, not raw events, so two passes over 30
    rows, not two corpus scans."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.round(F.sum("value"), 2).alias("day_revenue")
    )
    stats = daily.agg(
        F.avg("day_revenue").alias("mu"),
        F.stddev_pop("day_revenue").alias("sigma"),
    )
    z = (F.col("day_revenue") - F.col("mu")) / F.col("sigma")
    return (
        daily.crossJoin(F.broadcast(stats))
        .where(F.abs(z) > ANOMALY_Z)
        .select("day", "day_revenue", F.round(z, 3).alias("z_score"))
    )


ANOMALY_SQL = f"""
WITH daily AS (
  SELECT cast(ts AS date) AS day, round(sum(value), 2) AS day_revenue
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), s AS (
  SELECT avg(day_revenue) AS mu, stddev_pop(day_revenue) AS sigma FROM daily
)
SELECT day, day_revenue,
       round((day_revenue - mu) / sigma, 3) AS z_score
FROM daily, s
WHERE abs((day_revenue - mu) / sigma) > {ANOMALY_Z}
"""


def customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed distribution functions over customer lifetime value:
    ntile(10) decile, percent_rank and cume_dist per customer, ordered
    by total spend (custkey tie-break makes every position — and hence
    every distribution value — deterministic).

    Plan: orders aggregate to customer grain first, then the
    DISTRIBUTED two-pass rank (`operators/ranks.py`): range-shuffle +
    executor-local sort gives every customer its exact global
    position via partition-offset math, and ntile/percent_rank/
    cume_dist become pure column arithmetic over (position, n). The
    previous unpartitioned ntile window funneled the whole customer
    table — billions of rows at 100 TB — through ONE task (round-6
    plan audit); this form has no WindowExec at all, only one range
    shuffle of the customer-grain relation. Tie-break by custkey
    keeps every position, hence every output value, deterministic
    and bit-identical to the window form the oracle runs."""
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            # round-then-cast-to-DOUBLE: DuckDB's pandas fetch turns
            # DECIMAL into float64, Spark's keeps Decimal objects —
            # identical values would render '123.40' vs '123.4' in
            # the driver's hash. Both engines cast the same rounded
            # decimal to its nearest double, which is bit-identical.
            F.round(F.sum(F.col("o_totalprice").cast("decimal(20,2)")), 2)
            .cast("double")
            .alias("total_spend")
        )
    )
    positioned, n = with_global_positions(
        spend, [F.col("total_spend").desc(), F.col("o_custkey").asc()]
    )
    pos = F.col(POS)
    # Unique ordering (custkey tie-break) makes rank == row_number ==
    # pos, so percent_rank = (pos-1)/(n-1) and cume_dist = pos/n.
    return positioned.select(
        F.col("o_custkey").alias("custkey"),
        "total_spend",
        ntile_expr(pos, n, 10).alias("decile"),
        F.round((pos - 1) / F.lit(max(n - 1, 1)), 6).alias("pct_rank"),
        F.round(pos / F.lit(max(n, 1)), 6).alias("cume"),
    )


DECILES_SQL = """
WITH spend AS (
  SELECT o_custkey,
         cast(round(sum(cast(o_totalprice AS decimal(20,2))), 2)
              AS double) AS total_spend
  FROM orders GROUP BY 1
)
SELECT o_custkey AS custkey, total_spend,
       ntile(10)    OVER w AS decile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cume
FROM spend
WINDOW w AS (ORDER BY total_spend DESC, o_custkey)
"""

# Bounding the islands output: one in ISLAND_CUST_MOD customers. The
# pattern is per-customer-local, so the sample loses no generality.
ISLAND_CUST_MOD = 50


def order_status_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval reconstruction — the SCD-Type-2 /
    validity-interval building block: per customer, collapse the
    order-status sequence (ordered by order date, orderkey tie-break)
    into maximal runs of one status, each with its validity window
    [first_date, last_date] and order count.

    Plan: two stacked windows partitioned BY CUSTOMER (change flag via
    lag, island id via running sum) then a grain-reducing groupBy —
    one shuffle on custkey, per-partition sorts, no global window.
    This is exactly how change-data validity intervals are rebuilt at
    warehouse scale; partitioning by the entity key keeps every window
    executor-local."""
    o = load_table(spark, sf_dir, "orders").where(
        F.pmod(F.col("o_custkey"), F.lit(ISLAND_CUST_MOD)) == 0
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_orderstatus",
        F.when(
            F.lag("o_orderstatus").over(w).isNull()
            | (F.lag("o_orderstatus").over(w) != F.col("o_orderstatus")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    )
    islands = flagged.select(
        "o_custkey",
        "o_orderdate",
        "o_orderstatus",
        F.sum("chg")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    return (
        islands.groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("island"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(
            F.min(F.col("o_orderdate").cast("date")).alias("valid_from"),
            F.max(F.col("o_orderdate").cast("date")).alias("valid_to"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "custkey", "island", "status", "valid_from", "valid_to", "n_orders"
        )
    )


ISLANDS_SQL = f"""
WITH o AS (
  SELECT * FROM orders WHERE o_custkey % {ISLAND_CUST_MOD} = 0
), flagged AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
         CASE WHEN lag(o_orderstatus) OVER w IS NULL
                OR lag(o_orderstatus) OVER w <> o_orderstatus
              THEN 1 ELSE 0 END AS chg
  FROM o
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), islands AS (
  SELECT o_custkey, o_orderdate, o_orderstatus,
         sum(chg) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM flagged
)
SELECT o_custkey AS custkey,
       -- DuckDB window SUM of integers is HUGEINT, which its pandas
       -- fetch degrades to float64 ('1.0' vs Spark's int64 '1')
       cast(island AS bigint) AS island,
       o_orderstatus AS status,
       min(cast(o_orderdate AS date)) AS valid_from,
       max(cast(o_orderdate AS date)) AS valid_to,
       count(*) AS n_orders
FROM islands
GROUP BY 1, 2, 3
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every (previous event type -> event type) pair, the
    transition count and its probability given the previous state —
    the behavioral-analytics twin of the funnel query, over ALL paths
    rather than one fixed path.

    Plan: one window partitioned by user (lag over ts, event_id) — a
    single shuffle on user_id with executor-local sorts — then a
    grain-reducing groupBy to the event-type-squared matrix (25 rows),
    with the per-state totals attached via a second tiny window. Raw
    events are shuffled exactly once."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    tot = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(tot), 4
        ).alias("probability"),
    )


TRANSITION_SQL = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type AS next_type
  FROM events
), counted AS (
  SELECT prev_type, next_type, count(*) AS n_transitions
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n_transitions,
       round(n_transitions
             / cast(sum(n_transitions)
                      OVER (PARTITION BY prev_type) AS double), 4)
         AS probability
FROM counted
"""


def event_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state entropy of the first-order Markov chain — which
    event types are behavioral dead-ends (entropy ~0: the next event
    is predictable) versus branch points (entropy ~log2(K)). The
    session-analytics counterpart of per-source token entropy: same
    H = -sum(p log2 p), over the NEXT-EVENT distribution.

    Plan: identical single user-partitioned lag window as
    event_transition_matrix (one shuffle of raw events), then all
    entropy math happens on the K^2-row transition grain — 25 rows
    here, bounded by event-type-cardinality squared at any corpus
    size, never corpus-scale.

    Output per previous state: transition count, distinct next
    states, entropy (bits, q6), the most likely next state and its
    probability (q6; ties broken by type name for determinism)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    counted = (
        e.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = Window.partitionBy("prev_type")
    rank = Window.partitionBy("prev_type").orderBy(
        F.col("c").desc(), F.col("next_type").asc()
    )
    p = F.col("c") / F.sum("c").over(tot)
    scored = counted.select(
        "prev_type",
        "next_type",
        "c",
        p.alias("p"),
        F.row_number().over(rank).alias("rn"),
    )
    return scored.groupBy("prev_type").agg(
        F.sum("c").alias("n_transitions"),
        F.count(F.lit(1)).alias("n_next_types"),
        F.round(-F.sum(F.col("p") * F.log2("p")), 6).alias("entropy_bits"),
        F.max(F.when(F.col("rn") == 1, F.col("next_type"))).alias(
            "top_next_type"
        ),
        F.round(F.max(F.when(F.col("rn") == 1, F.col("p"))), 6).alias(
            "top_next_p"
        ),
    )


MARKOV_ENTROPY_SQL = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type AS next_type
  FROM events
), counted AS (
  SELECT prev_type, next_type, count(*) AS c
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
), scored AS (
  SELECT prev_type, next_type, c,
         c / cast(sum(c) OVER (PARTITION BY prev_type) AS double) AS p,
         row_number() OVER (PARTITION BY prev_type
                            ORDER BY c DESC, next_type ASC) AS rn
  FROM counted
)
SELECT prev_type,
       cast(sum(c) AS bigint)                          AS n_transitions,
       count(*)                                        AS n_next_types,
       round(-sum(p * log2(p)), 6)                     AS entropy_bits,
       max(CASE WHEN rn = 1 THEN next_type END)        AS top_next_type,
       round(max(CASE WHEN rn = 1 THEN p END), 6)      AS top_next_p
FROM scored GROUP BY prev_type
"""


def dow_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile of order flow — the first
    chart every ops dashboard draws, and the denominator any anomaly
    detector needs before it can call a quiet Sunday an incident.
    Index = (share of orders on that weekday) * 7, so 1.0 = flat.

    Weekday convention pinned cross-engine: ISO (Mon=1..Sun=7) —
    Spark's weekday() (Mon=0) + 1 versus DuckDB's isodow(); the
    engines' default dayofweek disagree (Sun=1 vs Sun=0), a classic
    silent off-by-one this operator's oracle hash would catch.

    Plan: map-side weekday extraction + cents-fixed-point revenue,
    one 7-group hash aggregate; integer until the final divisions."""
    o = load_table(spark, sf_dir, "orders")
    n_total = o.count()  # scalar; driver-bounded by definition
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    per = (
        o.select(
            (F.weekday("o_orderdate") + 1).alias("iso_dow"),
            cents.alias("cents"),
        )
        .groupBy("iso_dow")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("revenue_cents"),
        )
    )
    total_cents = F.sum("revenue_cents").over(Window.partitionBy())
    # 7-row global window: bounded by the weekday domain, never data
    return per.select(
        "iso_dow",
        "n_orders",
        "revenue_cents",
        F.round(F.col("n_orders") * 7 / F.lit(float(n_total)), 6).alias(
            "order_index"
        ),
        F.round(F.col("revenue_cents") * 7 / total_cents, 6).alias(
            "revenue_index"
        ),
    )


DOW_SEASONALITY_SQL = """
WITH per AS (
  SELECT isodow(o_orderdate) AS iso_dow,
         count(*) AS n_orders,
         cast(sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint))
              AS bigint) AS revenue_cents
  FROM orders GROUP BY 1
)
SELECT iso_dow, n_orders, revenue_cents,
       round(n_orders * 7 / (SELECT cast(count(*) AS double) FROM orders),
             6) AS order_index,
       round(revenue_cents * 7
             / cast(sum(revenue_cents) OVER () AS double), 6)
         AS revenue_index
FROM per
"""


def cusum_revenue_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on daily revenue, per year — the
    classic mean-shift detector: the day where the cumulative
    deviation from the year's mean peaks is the most likely structural
    break (demand regime change, pipeline backfill seam, currency
    glitch). Rolling z-scores (revenue_anomaly_days) find SPIKES;
    CUSUM finds sustained LEVEL SHIFTS those miss.

    Exact integer form: with daily cents r_i, mean-centered cumsum
    scaled by n — cusum'_t = n * sum_{i<=t} r_i - t * sum(r) — avoids
    the mean division entirely; |cusum'| peaks at the same t, and the
    reported magnitude is normalized to cusum_share = max|cusum'| /
    (n * total). int64 headroom: 366 * (366-day year at ~1e13
    cents/day) ~ 1e18, inside int64 at bench scales; the DECIMAL(38,0)
    upgrade is one cast if a 100 TB tenant's daily revenue exceeds it.

    Plan: one corpus aggregate to (year, day) grain, then windows
    partitioned BY YEAR (<= 366 rows per partition — never a global
    window), then a year-grain argmax. Ties on |cusum'| break to the
    earliest day, pinned on both engines."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    daily = (
        o.select(
            F.year("o_orderdate").alias("yr"),
            F.col("o_orderdate").alias("day"),
            cents.alias("cents"),
        )
        .groupBy("yr", "day")
        .agg(F.sum("cents").alias("r"))
    )
    wcum = (
        Window.partitionBy("yr")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wyr = Window.partitionBy("yr")
    scored = (
        daily.withColumn("cum", F.sum("r").over(wcum))
        .withColumn("t", F.row_number().over(
            Window.partitionBy("yr").orderBy("day")))
        .withColumn("n", F.count(F.lit(1)).over(wyr))
        .withColumn("tot", F.sum("r").over(wyr))
        .withColumn(
            "cusum",
            F.abs(F.col("n") * F.col("cum") - F.col("t") * F.col("tot")),
        )
    )
    pick = Window.partitionBy("yr").orderBy(
        F.col("cusum").desc(), F.col("day").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            "yr",
            F.col("n").alias("n_days"),
            F.col("day").alias("shift_day"),
            F.col("cusum").alias("max_abs_cusum"),
            F.round(
                F.col("cusum") / (F.col("n") * F.col("tot")), 6
            ).alias("cusum_share"),
        )
    )


CUSUM_SQL = """
WITH daily AS (
  SELECT year(o_orderdate) AS yr, o_orderdate AS day,
         cast(sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint))
              AS bigint) AS r
  FROM orders GROUP BY 1, 2
), scored AS (
  SELECT yr, day,
         cast(count(*) OVER (PARTITION BY yr) AS bigint) AS n,
         row_number() OVER (PARTITION BY yr ORDER BY day) AS t,
         cast(sum(r) OVER (PARTITION BY yr ORDER BY day
                           ROWS UNBOUNDED PRECEDING) AS bigint) AS cum,
         cast(sum(r) OVER (PARTITION BY yr) AS bigint) AS tot
  FROM daily
), ranked AS (
  SELECT yr, n, day, tot, abs(n * cum - t * tot) AS cusum,
         row_number() OVER (PARTITION BY yr
                            ORDER BY abs(n * cum - t * tot) DESC,
                                     day ASC) AS rn
  FROM scored
)
SELECT yr, n AS n_days, day AS shift_day,
       cusum AS max_abs_cusum,
       round(cusum / (1.0 * n * tot), 6) AS cusum_share
FROM ranked WHERE rn = 1
"""


# Online CUSUM parameters (cents): reference level, allowance k, and
# decision threshold h — shared by the batch twin below and the
# stateful streaming detector (streaming/drift.py), so the two are
# comparable row-for-row.
CUSUM_TARGET_CENTS = 5000
CUSUM_K_CENTS = 100
CUSUM_H_CENTS = 10000


def cusum_event_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online CUSUM drift detector over per-type event values — the
    batch twin of the stateful streaming detector
    (streaming/drift.py): same recurrence, same constants, pinned
    row-identical in tests/test_streaming_drift.py.

    Uses the reset-free CUSUM's closed form: S+_t = max(0, S+_{t-1}
    + x_t - target - k) equals cum_t - min_{i<=t} cum_i (cumsum minus
    running minimum), and symmetrically S-_t = running max - cum'_t —
    so the sequential recurrence becomes two prefix windows and the
    DuckDB oracle can replay it exactly. An ONSET is a row where the
    statistic first exceeds h (previous row at or below), counted via
    lag. All arithmetic is integer cents.

    Scale note: the corpus window partitions by event_type — a LOW
    cardinality key, so at 100 TB a whole type funnels through one
    task. That is inherent to a sequential statistic over a per-type
    stream, and the 100 TB path is exactly the STREAMING twin: O(1)
    state per type, one pass, no window — this batch form exists as
    the verifiable oracle surface."""
    e = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    base = e.select(
        "event_type",
        "ts",
        "event_id",
        (cents - CUSUM_TARGET_CENTS - CUSUM_K_CENTS).alias("d_up"),
        (cents - CUSUM_TARGET_CENTS + CUSUM_K_CENTS).alias("d_dn"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = Window.partitionBy("event_type").orderBy("ts", "event_id")
    scored = (
        base.withColumn("cum_up", F.sum("d_up").over(w))
        .withColumn("cum_dn", F.sum("d_dn").over(w))
        .withColumn(
            "s_up", F.col("cum_up") - F.least(
                F.min("cum_up").over(w), F.lit(0)
            )
        )
        .withColumn(
            "s_dn", F.greatest(F.max("cum_dn").over(w), F.lit(0))
            - F.col("cum_dn")
        )
    )
    h = CUSUM_H_CENTS
    flagged = scored.select(
        "event_type",
        "s_up",
        "s_dn",
        (
            (F.col("s_up") > h)
            & (F.coalesce(F.lag("s_up").over(wl), F.lit(0)) <= h)
        ).cast("int").alias("onset_up"),
        (
            (F.col("s_dn") > h)
            & (F.coalesce(F.lag("s_dn").over(wl), F.lit(0)) <= h)
        ).cast("int").alias("onset_dn"),
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("onset_up").alias("n_onsets_up"),
        F.sum("onset_dn").alias("n_onsets_down"),
        F.max("s_up").alias("max_s_up"),
        F.max("s_dn").alias("max_s_down"),
    )


CUSUM_DRIFT_SQL = f"""
WITH base AS (
  SELECT event_type, ts, event_id,
         cast(floor(value * 100 + 0.5) AS bigint)
           - {CUSUM_TARGET_CENTS} - {CUSUM_K_CENTS} AS d_up,
         cast(floor(value * 100 + 0.5) AS bigint)
           - {CUSUM_TARGET_CENTS} + {CUSUM_K_CENTS} AS d_dn
  FROM events
), cums AS (
  SELECT event_type, ts, event_id,
         sum(d_up) OVER w AS cum_up,
         sum(d_dn) OVER w AS cum_dn
  FROM base
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)
), scored AS (
  SELECT event_type, ts, event_id,
         cum_up - least(min(cum_up) OVER w2, 0) AS s_up,
         greatest(max(cum_dn) OVER w2, 0) - cum_dn AS s_dn
  FROM cums
  WINDOW w2 AS (PARTITION BY event_type ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING)
), flagged AS (
  SELECT event_type, s_up, s_dn,
         CASE WHEN s_up > {CUSUM_H_CENTS}
               AND coalesce(lag(s_up) OVER wl, 0) <= {CUSUM_H_CENTS}
              THEN 1 ELSE 0 END AS onset_up,
         CASE WHEN s_dn > {CUSUM_H_CENTS}
               AND coalesce(lag(s_dn) OVER wl, 0) <= {CUSUM_H_CENTS}
              THEN 1 ELSE 0 END AS onset_dn
  FROM scored
  WINDOW wl AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_type,
       count(*) AS n_events,
       cast(sum(onset_up) AS bigint)   AS n_onsets_up,
       cast(sum(onset_dn) AS bigint)   AS n_onsets_down,
       cast(max(s_up) AS bigint)       AS max_s_up,
       cast(max(s_dn) AS bigint)       AS max_s_down
FROM flagged GROUP BY event_type
"""


def _halfup_2dp(doubled_hundredths: str):
    """Half-up mean to 2 decimals in pure integer arithmetic:
    ``doubled_hundredths`` must evaluate to 2 * (sum in hundredths);
    (x + n) div (2n) is round-half-up(x / 2n) for non-negative x in
    both engines' integer division."""
    return (
        F.expr(f"({doubled_hundredths} + n_customers) div (2 * n_customers)")
        / 100.0
    )


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic marketing rollup:
    score every customer 1-4 on Recency (days since last order,
    relative to the dataset's max date), Frequency (order count) and
    Monetary (total spend) via ntile quartiles, then report each
    R/F/M segment's size and average metrics.

    Plan: one customer-grain aggregate over orders (checkpointed — it
    feeds four jobs), then per metric the two-pass boundary form the
    round-6 audit asked for: `with_global_positions` finds the exact
    quartile-cut TUPLES (metric value, custkey) via a distributed
    range shuffle, a driver-bounded collect brings back ≤3 boundary
    tuples per metric, and quartile membership is assigned MAP-SIDE
    by lexicographic tuple comparison against those broadcast
    literals — bit-identical to ntile(4) with the custkey tie-break
    because position ↔ tuple order is a strict bijection. No global
    window anywhere: the previous form ran three unpartitioned ntile
    windows, each funneling the whole customer table through one
    task. Final segment-grain aggregate is 64 rows max. DESC metrics
    (frequency, monetary) are ordered by their negation so plain
    ascending tuple comparison applies."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(20,2)")), 2
        ).alias("monetary"),
    )
    anchor = per_cust.agg(F.max("last_order").alias("max_date"))
    scored = (
        per_cust.crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("max_date", "last_order").alias("recency_days"),
            "frequency",
            "monetary",
        )
        # localCheckpoint: ContextCleaner releases it when the driver
        # reference is GC'd — persist() entries would leak across
        # repeated registry/bench runs (round-7 ADVICE).
        .localCheckpoint(eager=False)
    )
    n = scored.count()  # materializes the checkpoint; n = customer count

    # Each metric's ascending sort key as one exact LONG (DESC metrics
    # negate; money compares in integer cents), so all three metrics
    # stack into ONE relation and a SINGLE range shuffle finds all 9
    # quartile-boundary tuples: metric m's local position e lives at
    # stacked position (m-1)*n + e.
    asc_keys = {
        1: F.col("recency_days").cast("long"),
        2: (-F.col("frequency")).cast("long"),
        3: -(F.col("monetary") * 100).cast("long"),
    }
    stacked = None
    for mid, key in asc_keys.items():
        part = scored.select(
            F.lit(mid).alias("__m"),
            key.alias("__k"),
            F.col("o_custkey").alias("__c"),
        )
        stacked = part if stacked is None else stacked.unionByName(part)
    positioned, _ = with_global_positions(
        stacked, [F.col("__m").asc(), F.col("__k").asc(), F.col("__c").asc()]
    )
    ends = ntile_boundary_positions(n, 4)
    targets = [(mid - 1) * n + e for mid in asc_keys for e in ends]
    # Driver-bounded: at most 9 boundary rows.
    bounds_by_metric: dict[int, list] = {mid: [] for mid in asc_keys}
    for r in positioned.where(F.col(POS).isin(targets)).collect():
        bounds_by_metric[r["__m"]].append((r["__k"], r["__c"]))

    def quartile_score(mid: int) -> F.Column:
        """ntile(4) over (metric ASC, custkey ASC) as a map-side
        expression: 1 + number of broadcast quartile-boundary tuples
        strictly below this row's (metric, custkey) tuple."""
        a, cust = asc_keys[mid], F.col("o_custkey")
        score = F.lit(1)
        for bk, bc in sorted(bounds_by_metric[mid]):
            above = (a > F.lit(bk)) | ((a == F.lit(bk)) & (cust > F.lit(bc)))
            score = score + above.cast("int")
        return score

    seg = scored.select(
        "recency_days",
        "frequency",
        "monetary",
        quartile_score(1).alias("r_score"),
        quartile_score(2).alias("f_score"),
        quartile_score(3).alias("m_score"),
    )
    # Money average in EXACT integer cents with explicit half-up
    # division: Spark's avg/round on decimals averages exactly while
    # DuckDB averages in double, and Spark's round(double) rounds the
    # shortest decimal repr while DuckDB rounds the binary value — a
    # mean on a half-cent boundary (hit at sf0.001) diverges under
    # every float formulation. (2*sum + n) div (2*n) is half-up for
    # non-negative cents in both engines' integer division.
    return (
        seg.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("recency_days").alias("sum_rec"),
            F.sum("frequency").alias("sum_freq"),
            F.sum((F.col("monetary") * 100).cast("long")).alias("sum_cents"),
        )
        .select(
            "r_score",
            "f_score",
            "m_score",
            "n_customers",
            _halfup_2dp("200 * sum_rec").alias("avg_recency_days"),
            _halfup_2dp("200 * sum_freq").alias("avg_frequency"),
            _halfup_2dp("2 * sum_cents").alias("avg_monetary"),
        )
    )


RFM_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         max(cast(o_orderdate AS date)) AS last_order,
         count(*) AS frequency,
         round(sum(cast(o_totalprice AS decimal(20,2))), 2) AS monetary
  FROM orders GROUP BY 1
), anchor AS (
  SELECT max(last_order) AS max_date FROM per_cust
), scored AS (
  SELECT o_custkey,
         date_diff('day', last_order, max_date) AS recency_days,
         frequency, monetary
  FROM per_cust, anchor
), seg AS (
  SELECT recency_days, frequency, monetary,
         ntile(4) OVER (ORDER BY recency_days, o_custkey)    AS r_score,
         ntile(4) OVER (ORDER BY frequency DESC, o_custkey)  AS f_score,
         ntile(4) OVER (ORDER BY monetary DESC, o_custkey)   AS m_score
  FROM scored
)
SELECT r_score, f_score, m_score,
       count(*) AS n_customers,
       ((200 * sum(recency_days) + count(*)) // (2 * count(*))) / 100.0
         AS avg_recency_days,
       ((200 * sum(frequency) + count(*)) // (2 * count(*))) / 100.0
         AS avg_frequency,
       ((2 * sum(cast(monetary * 100 AS bigint)) + count(*))
        // (2 * count(*))) / 100.0 AS avg_monetary
FROM seg GROUP BY 1, 2, 3
"""


QUERIES = [
    QuerySpec("timeseries_gapfill", timeseries_gapfill, GAPFILL_SQL),
    QuerySpec("rfm_segments", rfm_segments, RFM_SQL),
    QuerySpec("revenue_anomaly_days", revenue_anomaly_days, ANOMALY_SQL),
    QuerySpec("customer_value_deciles", customer_value_deciles, DECILES_SQL),
    QuerySpec("order_status_islands", order_status_islands, ISLANDS_SQL),
    QuerySpec(
        "event_transition_matrix", event_transition_matrix, TRANSITION_SQL
    ),
    QuerySpec(
        "event_markov_entropy",
        event_markov_entropy,
        MARKOV_ENTROPY_SQL,
        "per-state next-event entropy (behavioral predictability)",
    ),
    QuerySpec(
        "dow_seasonality_index",
        dow_seasonality_index,
        DOW_SEASONALITY_SQL,
        "ISO-weekday order/revenue seasonality profile",
    ),
    QuerySpec(
        "cusum_revenue_shift",
        cusum_revenue_shift,
        CUSUM_SQL,
        "per-year CUSUM mean-shift changepoint on daily revenue",
    ),
    QuerySpec(
        "cusum_event_drift",
        cusum_event_drift,
        CUSUM_DRIFT_SQL,
        "reset-free online CUSUM per event type (batch twin of the "
        "stateful streaming detector)",
    ),
]
