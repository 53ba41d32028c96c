"""Sequential event analytics over the events table: funnel
conversion and cohort retention — the two canonical product-analytics
queries a warehouse serving event streams must answer.

Both are pure DataFrame plans whose shuffles are user-bounded:
the corpus-sized events table aggregates down to one row per user (or
per user-week) before any join, so the joins move user-cardinality
relations, never raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.catalog import load_table
from goe_spark.queries import QuerySpec


def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: a user converts a
    stage only with an event at-or-after their previous stage's first
    event (min-timestamp semantics, so re-orderings of equal events
    cannot flip membership). Output: one row of stage counts and
    rounded conversion rates.

    Plan: three user-grain aggregates chained by broadcast-able joins
    — events shuffle once per stage on user_id, the stage tables are
    one row per user. At 100 TB the same plan holds because every join
    input after the first aggregate is user-cardinality."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    row = (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase")))
    )
    return row.select(
        "n_view",
        "n_click",
        "n_purchase",
        F.round(F.col("n_click") / F.col("n_view"), 4).alias("view_to_click"),
        F.round(F.col("n_purchase") / F.col("n_click"), 4).alias(
            "click_to_purchase"
        ),
    )


FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.t_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_click,
       (SELECT count(*) FROM p) AS n_purchase,
       round((SELECT count(*) FROM c) / cast((SELECT count(*) FROM v) AS double), 4)
         AS view_to_click,
       round((SELECT count(*) FROM p) / cast((SELECT count(*) FROM c) AS double), 4)
         AS click_to_purchase
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by the ISO week
    of their FIRST event; for each later week, how many of them were
    active. Output: (cohort_week, week_offset, n_active, retention)
    with retention relative to the cohort's size at offset 0.

    Plan: one user-grain aggregate for first-seen, one distinct over
    (user, week) activity, one user-cardinality join, then the matrix
    aggregate — the events table shuffles twice, everything after is
    user-bounded."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = e.select(
        "user_id",
        F.date_trunc("week", "ts").cast("date").alias("active_week"),
    ).distinct()
    joined = active.join(first, "user_id").select(
        "cohort_week",
        (
            F.datediff("active_week", "cohort_week") / 7
        ).cast("long").alias("week_offset"),
        "user_id",
    )
    matrix = joined.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    base = matrix.where(F.col("week_offset") == 0).select(
        F.col("cohort_week").alias("cw"), F.col("n_active").alias("cohort_size")
    )
    return (
        matrix.join(base, matrix.cohort_week == base.cw)
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            F.round(F.col("n_active") / F.col("cohort_size"), 4).alias(
                "retention"
            ),
        )
    )


COHORT_SQL = """
WITH first AS (
  SELECT user_id, cast(date_trunc('week', min(ts)) AS date) AS cohort_week
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, cast(date_trunc('week', ts) AS date) AS active_week
  FROM events
), joined AS (
  SELECT f.cohort_week,
         cast(floor(date_diff('day', f.cohort_week, a.active_week) / 7.0) AS bigint)
           AS week_offset,
         a.user_id
  FROM active a JOIN first f ON f.user_id = a.user_id
), matrix AS (
  SELECT cohort_week, week_offset, count(DISTINCT user_id) AS n_active
  FROM joined GROUP BY 1, 2
)
SELECT m.cohort_week, m.week_offset, m.n_active,
       round(m.n_active / cast(b.n_active AS double), 4) AS retention
FROM matrix m JOIN matrix b
  ON b.cohort_week = m.cohort_week AND b.week_offset = 0
"""


def rolling_revenue_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day revenue: daily purchase totals plus a RANGE-frame
    window over epoch days (-6..0), so gap days genuinely widen the
    frame — the physical-time semantics a rows-frame fakes wrong.
    Plan: events aggregate to day grain first; the window runs over
    the day-cardinality relation (hundreds of rows at any corpus
    size), so the range sort is free."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(
        F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("day_revenue"))
    epoch = F.datediff("day", F.lit("1970-01-01"))
    w = (
        Window.orderBy(epoch)
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "day",
        "day_revenue",
        F.round(F.sum("day_revenue").over(w), 2).alias("rev_7d"),
        F.count(F.lit(1)).over(w).alias("days_in_window"),
    )


ROLLING_SQL = """
WITH daily AS (
  SELECT cast(ts AS date) AS day, round(sum(value), 2) AS day_revenue
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT day, day_revenue,
       round(sum(day_revenue) OVER w, 2) AS rev_7d,
       count(*) OVER w                   AS days_in_window
FROM daily
WINDOW w AS (ORDER BY date_diff('day', DATE '1970-01-01', day)
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


EVENT_TYPES = ("click", "view", "signup", "purchase", "error")


def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily wide-format event counts via the pivot operator with an
    EXPLICIT value list — at scale an unlisted pivot forces an extra
    distinct-values job and an unbounded column fan-out; pinning the
    list keeps it one pass. The oracle is the equivalent conditional
    aggregation."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(F.col("ts").cast("date").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0, list(EVENT_TYPES))
        .select(
            "day",
            *[F.col(t).alias(f"n_{t}") for t in EVENT_TYPES],
        )
    )


# cast AS bigint: DuckDB SUM of integers is HUGEINT -> float64 in its
# pandas fetch; Spark's pivot-count is int64.
PIVOT_SQL = f"""
SELECT cast(ts AS date) AS day,
       {", ".join(
           f"cast(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
           f" AS bigint) AS n_{t}"
           for t in EVENT_TYPES
       )}
FROM events GROUP BY 1
"""


def event_type_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT — the melt half of the pivot pair (§2.8): take the
    wide daily event-count matrix back to long (day, event_type, n)
    form and roll it up per type with active-day accounting. Spark's
    ``stack()`` is a pure map-side generator (one output row per
    listed column, no shuffle, no distinct-values job); the round
    trip pivot→unpivot reproducing the base aggregate is pinned in
    the oracle by construction.

    Plan: the pivot's single day-grain aggregate, a stack() generate,
    one type-grain rollup (5 rows)."""
    wide = event_type_pivot(spark, sf_dir)
    n = len(EVENT_TYPES)
    stack_args = ", ".join(f"'{t}', n_{t}" for t in EVENT_TYPES)
    long = wide.select(
        "day",
        F.expr(f"stack({n}, {stack_args}) AS (event_type, n)"),
    )
    return (
        long.where(F.col("n") > 0)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.count(F.lit(1)).alias("n_active_days"),
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
        )
    )


UNPIVOT_SQL = f"""
WITH wide AS ({PIVOT_SQL}),
longf AS (
  SELECT day, event_type, n
  FROM wide
  UNPIVOT (n FOR event_type IN ({", ".join(f"n_{t} AS '{t}'" for t in EVENT_TYPES)}))
)
SELECT event_type,
       cast(sum(n) AS bigint) AS n_events,
       count(*)               AS n_active_days,
       min(day)               AS first_day,
       max(day)               AS last_day
FROM longf
WHERE n > 0
GROUP BY event_type
"""


def lapsed_customers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lapsed customers via set difference (EXCEPT — the §2.8 set-op
    family beyond UNION ALL): customers who ordered in the FIRST
    calendar month of the order range but not in the LAST, rolled up
    per nation. The months derive from the data so the query is
    self-contained.

    Plan: two customer-grain distinct sets, Spark compiles EXCEPT to
    a left-anti join over them; nation attaches through broadcast
    dims. Every join input after the distincts is customer-
    cardinality."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("om")
    )
    lo, hi = o.agg(F.min("om"), F.max("om")).first()
    first = o.where(F.col("om") == F.lit(lo)).select("o_custkey").distinct()
    last = o.where(F.col("om") == F.lit(hi)).select("o_custkey").distinct()
    lapsed = first.exceptAll(last)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    return (
        lapsed.join(cust, lapsed.o_custkey == cust.c_custkey)
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_lapsed"))
    )


LAPSED_SQL = """
WITH b AS (
  SELECT date_trunc('month', min(o_orderdate)) AS lo,
         date_trunc('month', max(o_orderdate)) AS hi
  FROM orders
), first_m AS (
  SELECT DISTINCT o_custkey FROM orders, b
  WHERE date_trunc('month', o_orderdate) = lo
), last_m AS (
  SELECT DISTINCT o_custkey FROM orders, b
  WHERE date_trunc('month', o_orderdate) = hi
), lapsed AS (
  SELECT o_custkey FROM first_m EXCEPT SELECT o_custkey FROM last_m
)
SELECT n.n_name AS nation, count(*) AS n_lapsed
FROM lapsed l
JOIN customer c ON c.c_custkey = l.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY 1
"""


def retained_customers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT completes the set-op family (UNION ALL, EXCEPT,
    INTERSECT): customers who ordered in BOTH the first and second
    calendar months of the range (consecutive dense months — the
    final month of the fixture is nearly empty), per nation. Spark
    compiles intersect to a left-semi join over the distinct sets —
    customer-cardinality inputs at any scale."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("om")
    )
    lo = o.agg(F.min("om")).first()[0]
    m2 = o.where(F.col("om") > F.lit(lo)).agg(F.min("om")).first()[0]
    first = o.where(F.col("om") == F.lit(lo)).select("o_custkey").distinct()
    second = o.where(F.col("om") == F.lit(m2)).select("o_custkey").distinct()
    retained = first.intersect(second)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    return (
        retained.join(cust, retained.o_custkey == cust.c_custkey)
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_retained"))
    )


RETAINED_SQL = """
WITH b AS (
  SELECT date_trunc('month', min(o_orderdate)) AS lo FROM orders
), b2 AS (
  SELECT min(date_trunc('month', o_orderdate)) AS m2
  FROM orders, b WHERE date_trunc('month', o_orderdate) > lo
), first_m AS (
  SELECT DISTINCT o_custkey FROM orders, b
  WHERE date_trunc('month', o_orderdate) = lo
), second_m AS (
  SELECT DISTINCT o_custkey FROM orders, b2
  WHERE date_trunc('month', o_orderdate) = m2
), retained AS (
  SELECT o_custkey FROM first_m INTERSECT SELECT o_custkey FROM second_m
)
SELECT n.n_name AS nation, count(*) AS n_retained
FROM retained r
JOIN customer c ON c.c_custkey = r.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY 1
"""


def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows via the native window() operator with
    a slide: 2-hour windows every hour, so each event lands in two
    overlapping windows. The same groupBy runs unbounded under
    Structured Streaming with a watermark; the oracle reproduces the
    overlap by unioning the two phase-shifted tumbling truncations —
    demonstrating the declarative operator equals the manual form."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


HOPPING_SQL = """
WITH phases AS (
  SELECT ts, event_type, value,
         date_trunc('hour', ts) - INTERVAL (p) HOUR AS window_start
  FROM events, (SELECT unnest([0, 1]) AS p)
)
SELECT window_start, event_type,
       count(*)             AS n_events,
       round(sum(value), 2) AS sum_value
FROM phases
GROUP BY 1, 2
"""


def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (nation, order-year): every grouping-set combination
    including both margins and the grand total — the §2.5 grouping
    family's third member beside plain GROUP BY and ROLLUP
    (event_type_rollup). Spark's Expand strategy evaluates all four
    grouping sets in one pass over the joined fact."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").alias("order_year"),
        "o_totalprice",
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    joined = (
        o.join(cust, o.o_custkey == cust.c_custkey)
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"), "order_year", "o_totalprice")
    )
    return joined.cube("nation", "order_year").agg(
        F.count(F.lit(1)).alias("n_orders"),
        # round-then-cast-to-DOUBLE on both engines: decimal outputs
        # diverge in the driver's pandas fetch (Decimal vs float64)
        F.round(F.sum(F.col("o_totalprice").cast("decimal(20,2)")), 2)
        .cast("double")
        .alias("revenue"),
    )


REVENUE_CUBE_SQL = """
SELECT n.n_name AS nation,
       year(o.o_orderdate) AS order_year,
       count(*) AS n_orders,
       cast(round(sum(cast(o.o_totalprice AS decimal(20,2))), 2)
            AS double) AS revenue
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY CUBE (n.n_name, year(o.o_orderdate))
"""


def scd2_event_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build over the event stream:
    collapse each user's consecutive runs of the same event_type into
    versioned rows with [valid_from, valid_to) — the dimension-history
    pattern every warehouse ETL (and the reference's incremental-
    update machinery) maintains, expressed as lag-change-flag +
    cumulative version id + lead(valid_to). The registry row reports
    the per-type version accounting (versions opened, still-open
    versions, exact closed-version dwell seconds) so the whole history
    hashes deterministically.

    Plan: two windows and one aggregate, ALL partitioned by user_id —
    a user's history never leaves one task, and at 100 TB the window
    state is one user's events, not the stream. Ordering ties on ts
    are broken by event_id on both engines, so version boundaries are
    engine-stable."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # eqNullSafe mirrors the oracle's IS DISTINCT FROM exactly: it
    # never yields NULL, consecutive NULL event_types are ONE run, and
    # a first row (lag = NULL) opens a version iff event_type is
    # non-NULL — the coalesce-to-1 form diverged on NULL event_types
    # (round-9 ADVICE).
    runs = e.withColumn(
        "chg",
        (
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type"))
        ).cast("int"),
    ).withColumn("ver", F.sum("chg").over(w))
    versions = runs.groupBy("user_id", "ver").agg(
        F.min("event_type").alias("event_type"),  # constant within a run
        F.min("ts").alias("valid_from"),
    )
    wv = Window.partitionBy("user_id").orderBy("ver")
    hist = versions.withColumn(
        "valid_to", F.lead("valid_from").over(wv)
    )
    return hist.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(F.col("valid_to").isNull().cast("long")).alias("n_open"),
        # exact integer microseconds — unix_timestamp() truncates
        # sub-second parts per row while DuckDB's epoch() keeps them,
        # so second-grain sums drift; _us grain is exact on both
        F.sum(
            F.when(
                F.col("valid_to").isNotNull(),
                F.unix_micros("valid_to") - F.unix_micros("valid_from"),
            ).otherwise(F.lit(0))
        ).alias("closed_dwell_us"),
    )


SCD2_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(event_type) OVER
                (PARTITION BY user_id ORDER BY ts, event_id)
              IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
  FROM events
), runs AS (
  SELECT *, sum(chg) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS ver
  FROM ordered
), versions AS (
  SELECT user_id, ver, min(event_type) AS event_type,
         min(ts) AS valid_from
  FROM runs GROUP BY user_id, ver
), hist AS (
  SELECT *, lead(valid_from) OVER
              (PARTITION BY user_id ORDER BY ver) AS valid_to
  FROM versions
)
SELECT event_type,
       count(*) AS n_versions,
       cast(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS bigint)
         AS n_open,
       cast(sum(CASE WHEN valid_to IS NOT NULL
                THEN epoch_us(valid_to) - epoch_us(valid_from)
                ELSE 0 END) AS bigint) AS closed_dwell_us
FROM hist GROUP BY event_type
"""


EVENT_TRIGRAM_K = 20


def event_trigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} behavioural trigrams: the most common length-3 event-
    type sequences across user histories — the sequential-pattern
    summary feeding next-event models and funnel design. Each user's
    stream (ts, event_id order) yields one trigram per position via
    two leads; global counts; deterministic top-K.

    Plan: leads are user-partitioned windows (one user per task, no
    global sort); the count is a map-side-combined hash aggregate on a
    bounded key space (|types|^3); top-K is orderBy().limit() =
    TakeOrderedAndProject, never a full sort. Scale-stable at 100 TB:
    nothing in the plan grows beyond |types|^3 groups after the
    partial aggregate."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        e.withColumn("t2", F.lead("event_type", 1).over(w))
        .withColumn("t3", F.lead("event_type", 2).over(w))
        .where(F.col("t3").isNotNull())
    )
    return (
        tri.groupBy(
            F.col("event_type").alias("e1"),
            F.col("t2").alias("e2"),
            F.col("t3").alias("e3"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "e1", "e2", "e3")
        .limit(EVENT_TRIGRAM_K)
    )


EVENT_TRIGRAM_SQL = f"""
WITH tri AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS e3
  FROM events
)
SELECT e1, e2, e3, count(*) AS n
FROM tri WHERE e3 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY n DESC, e1, e2, e3
LIMIT {EVENT_TRIGRAM_K}
"""


def interarrival_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap distribution as a log2 histogram —
    the burstiness profile capacity planners and bot-detection
    filters read (human traffic is multi-modal across decades of
    gap; a spike in one narrow bucket is a replay/bot signature).
    Exact integer microsecond gaps; the bucket is the gap's binary
    magnitude (length(bin(gap)) - 1 == floor(log2(gap))) — pure
    integer/string arithmetic, no floating log, so bucket edges can
    never flip between engines on exact powers of two.

    Plan: ONE user-partitioned window (a user's history never leaves
    one task; at 100 TB the window state is one user's events), then
    a ~40-key hash rollup. Ordering ties on ts break by event_id on
    both engines."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    bucket = F.when(F.col("gap_us") <= 0, F.lit(-1)).otherwise(
        F.length(F.bin(F.col("gap_us"))) - 1
    )
    return (
        gaps.select(bucket.cast("int").alias("log2_bucket"), "gap_us", "user_id")
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("gap_us").alias("min_us"),
            F.max("gap_us").alias("max_us"),
            F.sum("gap_us").alias("total_us"),
        )
    )


INTERARRIVAL_SQL = """
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
), nz AS (
  SELECT user_id, gap_us,
         CASE WHEN gap_us <= 0 THEN -1
              ELSE length(bin(gap_us)) - 1 END AS log2_bucket
  FROM gaps WHERE gap_us IS NOT NULL
)
SELECT cast(log2_bucket AS int) AS log2_bucket,
       count(*) AS n_gaps,
       count(DISTINCT user_id) AS n_users,
       min(gap_us) AS min_us,
       max(gap_us) AS max_us,
       cast(sum(gap_us) AS bigint) AS total_us
FROM nz GROUP BY 1
"""


QUERIES = [
    QuerySpec(
        "event_funnel_conversion", event_funnel_conversion, FUNNEL_SQL
    ),
    QuerySpec(
        "event_type_unpivot",
        event_type_unpivot,
        UNPIVOT_SQL,
        "stack()-based unpivot of the daily pivot matrix",
    ),
    QuerySpec("lapsed_customers_except", lapsed_customers_except, LAPSED_SQL),
    QuerySpec(
        "retained_customers_intersect",
        retained_customers_intersect,
        RETAINED_SQL,
    ),
    QuerySpec(
        "hopping_window_counts", hopping_window_counts, HOPPING_SQL
    ),
    QuerySpec("revenue_cube", revenue_cube, REVENUE_CUBE_SQL),
    QuerySpec("cohort_retention", cohort_retention, COHORT_SQL),
    QuerySpec("rolling_revenue_7d", rolling_revenue_7d, ROLLING_SQL),
    QuerySpec("event_type_pivot", event_type_pivot, PIVOT_SQL),
    QuerySpec(
        "scd2_event_type_history",
        scd2_event_type_history,
        SCD2_SQL,
        "SCD type-2 version build over user event streams",
    ),
    QuerySpec(
        "event_trigram_topk",
        event_trigram_topk,
        EVENT_TRIGRAM_SQL,
        "top-20 behavioural event-type trigrams",
    ),
    QuerySpec(
        "interarrival_log2_histogram",
        interarrival_log2_histogram,
        INTERARRIVAL_SQL,
        "per-user inter-event gap log2 histogram (burstiness/bots)",
    ),
]
