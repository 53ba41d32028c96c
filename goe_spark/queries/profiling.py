"""Column profiling and histogram operators — the generalized form of
the reference's data-type sampling aggregate (SURVEY §2.5 A7 /
`offload_source_table.py:668-927`): where the reference samples a
table to tighten numeric type choices, a warehouse also wants the
full per-column profile (null rate, exact NDV, numeric envelope) and
value-distribution histograms as first-class queries.

Both operators are single-pass wide aggregates:

- `table_profile` computes every column's statistics in ONE scan
  (Spark expands the multi-distinct aggregate internally; at 100 TB
  the exact NDV columns switch to approx_count_distinct / the HLL
  sketch column in queries/sketches.py — the exact form here is the
  semantics pin), then unpivots the 1-row result to one row per
  column with `inline()` — the long/narrow shape profile stores want.
- `order_price_histogram` is fixed-width bucketing by pure arithmetic
  (floor(x/width)) — one partial-aggregated shuffle of bucket ids,
  no two-pass min/max, deterministic bounds both engines share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.catalog import load_table
from goe_spark.queries import QuerySpec

# One spec drives BOTH engines' profile queries: (column, is_numeric).
PROFILE_TABLE = "orders"
PROFILE_COLUMNS: list[tuple[str, bool]] = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderpriority", False),
]

HIST_BUCKET_WIDTH = 50_000.0


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of the orders table: row/null/exact-distinct
    counts for every column, numeric min/max/avg (rounded, NULL for
    non-numerics) — one scan, unpivoted to a row per column."""
    t = load_table(spark, sf_dir, PROFILE_TABLE)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, is_num in PROFILE_COLUMNS:
        aggs.append(F.count(col).alias(f"{col}__nn"))
        aggs.append(F.countDistinct(col).alias(f"{col}__nd"))
        if is_num:
            aggs.append(
                F.round(F.min(F.col(col).cast("double")), 4).alias(
                    f"{col}__min"
                )
            )
            aggs.append(
                F.round(F.max(F.col(col).cast("double")), 4).alias(
                    f"{col}__max"
                )
            )
            aggs.append(
                F.round(F.avg(F.col(col).cast("double")), 4).alias(
                    f"{col}__avg"
                )
            )
    one = t.agg(*aggs)
    null_d = F.lit(None).cast("double")
    structs = [
        F.struct(
            F.lit(col).alias("column_name"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"{col}__nn")).alias("n_nulls"),
            F.col(f"{col}__nd").alias("n_distinct"),
            (F.col(f"{col}__min") if is_num else null_d).alias("min_value"),
            (F.col(f"{col}__max") if is_num else null_d).alias("max_value"),
            (F.col(f"{col}__avg") if is_num else null_d).alias("avg_value"),
        )
        for col, is_num in PROFILE_COLUMNS
    ]
    return one.select(F.inline(F.array(*structs)))


def _profile_sql() -> str:
    parts = []
    for col, is_num in PROFILE_COLUMNS:
        num = (
            f"round(min(cast({col} AS double)), 4) AS min_value, "
            f"round(max(cast({col} AS double)), 4) AS max_value, "
            f"round(avg(cast({col} AS double)), 4) AS avg_value"
            if is_num
            else "cast(NULL AS double) AS min_value, "
            "cast(NULL AS double) AS max_value, "
            "cast(NULL AS double) AS avg_value"
        )
        parts.append(
            f"SELECT '{col}' AS column_name, count(*) AS n_rows, "
            f"count(*) - count({col}) AS n_nulls, "
            f"count(DISTINCT {col}) AS n_distinct, {num}"
            f" FROM {PROFILE_TABLE}"
        )
    return "\nUNION ALL\n".join(parts)


def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals: fixed {HIST_BUCKET_WIDTH}
    buckets by pure arithmetic — single partial-aggregated pass, no
    min/max pre-scan, bucket bounds identical in both engines."""
    o = load_table(spark, sf_dir, PROFILE_TABLE)
    bucket = F.floor(F.col("o_totalprice") / F.lit(HIST_BUCKET_WIDTH)).cast(
        "long"
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # round-then-cast-to-DOUBLE: aligns the pandas dtype with
            # DuckDB's DECIMAL->float64 fetch (round-5 verdict found
            # this green only because no value's cents ended in 0)
            F.round(F.sum(F.col("o_totalprice").cast("decimal(20,2)")), 2)
            .cast("double")
            .alias("bucket_revenue"),
        )
        .select(
            "bucket",
            (F.col("bucket") * HIST_BUCKET_WIDTH).alias("bucket_lo"),
            ((F.col("bucket") + 1) * HIST_BUCKET_WIDTH).alias("bucket_hi"),
            "n_orders",
            "bucket_revenue",
        )
    )


HISTOGRAM_SQL = f"""
SELECT cast(floor(o_totalprice / {HIST_BUCKET_WIDTH}) AS bigint) AS bucket,
       cast(floor(o_totalprice / {HIST_BUCKET_WIDTH}) AS bigint)
         * {HIST_BUCKET_WIDTH} AS bucket_lo,
       (cast(floor(o_totalprice / {HIST_BUCKET_WIDTH}) AS bigint) + 1)
         * {HIST_BUCKET_WIDTH} AS bucket_hi,
       count(*) AS n_orders,
       cast(round(sum(cast(o_totalprice AS decimal(20,2))), 2)
            AS double) AS bucket_revenue
FROM {PROFILE_TABLE}
GROUP BY 1
"""


# Shuffle-partition count the skew analysis assumes (the session
# default in session.py). A deployment passes its real parallelism.
SKEW_PARTITIONS = 32
SKEW_TOP_K = 3
SKEW_KEYS = (("event_type", "string"), ("user_id", "bigint"))


def join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/aggregation skew advisor over candidate shuffle keys of
    the events table: per key column, the top heavy-hitter values with
    their row share, the reducer imbalance a hash shuffle on that key
    would suffer (rows_for_value / (N / partitions)), and the salt
    fan-out that flattens it (operators/salting.py consumes this
    number as n_salt).

    This is the measurement half of the skew story: salted_join fixes
    a hot key, this report finds it BEFORE the 4-hour straggler does.
    imbalance <= 1 means the key spreads fine (salt 1 = no salting).

    Plan: one scan per candidate key (column-pruned to the key alone),
    map-side partial counts, a key-cardinality shuffle, then a
    DISTRIBUTED top-k via orderBy().limit() — Spark compiles that to
    TakeOrderedAndProject (per-partition heap + driver merge of K rows
    per partition), so even a billions-of-distinct-values key like
    user_id at 100 TB never funnels through one task. (The previous
    unpartitioned row_number() window did exactly that — the round-6
    plan audit flagged it, and tests/test_plan_structure.py now pins
    the window-free shape.) The total-count scalar broadcasts back.
    Exact counts, no sampling error on the heavy tail."""
    ev = load_table(spark, sf_dir, "events")
    n_total = ev.count()  # scalar; driver-bounded by definition
    per_part = n_total / float(SKEW_PARTITIONS)
    outs = []
    for key, _typ in SKEW_KEYS:
        counts = (
            ev.select(F.col(key).cast("string").alias("key_value"))
            .groupBy("key_value")
            .agg(F.count(F.lit(1)).alias("n_rows"))
        )
        top = counts.orderBy(
            F.col("n_rows").desc(), F.col("key_value").asc()
        ).limit(SKEW_TOP_K)
        imb = F.col("n_rows") / F.lit(per_part)
        outs.append(
            top.select(
                F.lit(key).alias("key_column"),
                "key_value",
                "n_rows",
                F.round(F.col("n_rows") / F.lit(float(n_total)), 6).alias(
                    "share"
                ),
                F.round(imb, 4).alias("imbalance"),
                F.least(
                    F.lit(SKEW_PARTITIONS),
                    F.greatest(F.lit(1), F.ceil(imb)),
                )
                .cast("long")
                .alias("recommended_salt"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def _skew_sql() -> str:
    parts = []
    for key, _typ in SKEW_KEYS:
        parts.append(f"""
SELECT key_column, key_value, n_rows, share, imbalance,
       least({SKEW_PARTITIONS}, greatest(1, cast(ceil(imb) AS bigint)))
         AS recommended_salt
FROM (
  SELECT '{key}' AS key_column,
         cast({key} AS varchar) AS key_value,
         count(*) AS n_rows,
         round(count(*) / (SELECT cast(count(*) AS double) FROM events), 6)
           AS share,
         round(count(*) / ((SELECT count(*) FROM events)
                           / {float(SKEW_PARTITIONS)}), 4) AS imbalance,
         count(*) / ((SELECT count(*) FROM events)
                     / {float(SKEW_PARTITIONS)}) AS imb,
         row_number() OVER (ORDER BY count(*) DESC,
                            cast({key} AS varchar) ASC) AS rn
  FROM events GROUP BY {key}
) t WHERE rn <= {SKEW_TOP_K}""")
    return " UNION ALL ".join(parts)


def source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus concentration audit — how dominated each language slice
    is by a few sources. A training mixture whose 'en' slice is 90%
    one crawl inherits that crawl's biases; this operator quantifies
    it with the three standard concentration measures: HHI
    (sum of squared source shares), the Gini coefficient over source
    doc-counts, and the share held by the top-3 sources.

    Gini uses the exact rank formula over counts sorted ascending
    (ties broken by source name for cross-engine determinism):
    G = (2 * sum(i * c_i) - (n+1) * sum(c)) / (n * sum(c)).

    Plan: one (lang, source) hash aggregate — the only corpus-scale
    shuffle — then windows partitioned BY LANG over source-count
    rows (sources per lang is catalog-bounded, ~20 here, maybe 1e4
    at 100 TB; never corpus-scale). Integer arithmetic until the
    final divisions, so the q6 rounding is cross-engine exact."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_asc = Window.partitionBy("lang").orderBy(
        F.col("c").asc(), F.col("source").asc()
    )
    w_desc = Window.partitionBy("lang").orderBy(
        F.col("c").desc(), F.col("source").asc()
    )
    w_all = Window.partitionBy("lang")
    ranked = counts.select(
        "lang",
        "c",
        F.row_number().over(w_asc).alias("i"),
        F.row_number().over(w_desc).alias("rd"),
        F.sum("c").over(w_all).alias("n_docs"),
        F.count(F.lit(1)).over(w_all).alias("n_sources"),
    )
    # c*c and i*c are summed as decimal(38,0): a (lang,source) count
    # past ~3e9 would silently wrap an int64 square under non-ANSI
    # mode while DuckDB promotes to HUGEINT (round-10 ADVICE). The
    # exact decimal sum is cast to double ONLY at the division, which
    # is exactly when DuckDB's hugeint hits `1.0 *` — both engines
    # round the same double. max*max in the denominators stays int64:
    # n_docs is corpus docs per lang (~1e11 at 100 TB), squared as
    # double after the cast below.
    cc = F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)"))
    ic = F.sum((F.col("i") * F.col("c")).cast("decimal(38,0)"))
    return ranked.groupBy("lang").agg(
        F.max("n_sources").alias("n_sources"),
        F.max("n_docs").alias("n_docs"),
        F.round(
            cc.cast("double")
            / (F.max("n_docs").cast("double") * F.max("n_docs")),
            6,
        ).alias("hhi"),
        F.round(
            (
                2 * ic.cast("double")
                - (F.max("n_sources") + 1) * F.max("n_docs")
            )
            / (F.max("n_sources").cast("double") * F.max("n_docs")),
            6,
        ).alias("gini"),
        F.round(
            F.sum(F.when(F.col("rd") <= 3, F.col("c")).otherwise(0))
            / F.max("n_docs"),
            6,
        ).alias("top3_share"),
    )


CONCENTRATION_SQL = """
WITH counts AS (
  SELECT lang, source, count(*) AS c
  FROM documents GROUP BY 1, 2
), ranked AS (
  SELECT lang, c,
         row_number() OVER (PARTITION BY lang
                            ORDER BY c ASC, source ASC)  AS i,
         row_number() OVER (PARTITION BY lang
                            ORDER BY c DESC, source ASC) AS rd,
         sum(c)   OVER (PARTITION BY lang) AS n_docs,
         count(*) OVER (PARTITION BY lang) AS n_sources
  FROM counts
)
SELECT lang,
       max(n_sources)                                   AS n_sources,
       cast(max(n_docs) AS bigint)                      AS n_docs,
       round(cast(sum(c * c) AS double)
             / (1.0 * max(n_docs) * max(n_docs)), 6) AS hhi,
       round((2 * cast(sum(i * c) AS double)
              - (max(n_sources) + 1) * max(n_docs))
             / (1.0 * max(n_sources) * max(n_docs)), 6) AS gini,
       round(sum(CASE WHEN rd <= 3 THEN c ELSE 0 END)
             / (1.0 * max(n_docs)), 6)                  AS top3_share
FROM ranked GROUP BY lang
"""


def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit on order totals — the classic synthetic /
    fabricated-data detector a warehouse DQ suite runs on money
    columns: the observed first-significant-digit distribution versus
    Benford's log10(1 + 1/d), with the per-digit deviation. (TPC-H
    prices are uniform-ish, so they FAIL Benford loudly — which is
    the point: the operator's output is the evidence, not a pass.)

    First digit via integer/string arithmetic (floor -> bigint ->
    first char), never log10 of the value itself — log-based digit
    extraction can mis-bin values like 999.9999 on float boundaries;
    the expected shares are the only float math, and a 6-decimal
    round is ulp-safe for all nine log10 constants.

    Plan: map-side digit extraction, one 9-group hash aggregate; the
    corpus never shuffles anything but (digit, partial count)."""
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("int")
    # values < 1 have first digit 0 under integer extraction (the
    # mantissa digit needs log scaling); Benford applies to
    # magnitudes >= 1 — excluded identically in the oracle, and the
    # share denominator counts VALID rows only
    valid = o.select(digit.alias("digit")).where(
        F.col("digit").between(1, 9)
    )
    n_total = valid.count()  # scalar; driver-bounded by definition
    counts = valid.groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    obs = F.col("n_orders") / F.lit(float(n_total))
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return counts.select(
        "digit",
        "n_orders",
        F.round(obs, 6).alias("obs_share"),
        F.round(exp, 6).alias("benford_share"),
        F.round(obs - exp, 6).alias("deviation"),
        F.round((obs - exp) * (obs - exp) / exp, 6).alias("chi2_term"),
    )


BENFORD_SQL = """
WITH digits AS (
  -- try_cast, not cast: a negative total's first char is '-', which
  -- Spark's .cast('int') nulls out and the BETWEEN filter drops —
  -- strict cast would make DuckDB ERROR where Spark silently excludes
  SELECT try_cast(substr(cast(cast(floor(o_totalprice) AS bigint) AS varchar),
                         1, 1) AS int) AS digit
  FROM orders
), valid AS (SELECT digit FROM digits WHERE digit BETWEEN 1 AND 9),
counts AS (
  SELECT digit, count(*) AS n_orders FROM valid GROUP BY 1
), tot AS (SELECT count(*) AS n FROM valid)
SELECT digit,
       n_orders,
       round(n_orders / (1.0 * tot.n), 6)            AS obs_share,
       round(log10(1 + 1.0 / digit), 6)              AS benford_share,
       round(n_orders / (1.0 * tot.n)
             - log10(1 + 1.0 / digit), 6)            AS deviation,
       round(pow(n_orders / (1.0 * tot.n)
                 - log10(1 + 1.0 / digit), 2)
             / log10(1 + 1.0 / digit), 6)            AS chi2_term
FROM counts, tot
"""


def value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection with median / MAD — the screen that
    survives what breaks mean/stddev z-scores: a single 1e9 corrupt
    value inflates sigma until nothing is an outlier, while the
    median absolute deviation doesn't move. Flags event values with
    |x - median| > 3 * 1.4826 * MAD (the normal-consistent cutoff).

    Both medians are EXACT, via the bounded-domain trick
    (quantity_exact_percentiles): event values are cents-grain, so
    (type, cents) counts + a cumulative window over the value grain
    give the inverted-CDF median in pure integer arithmetic — and the
    DEVIATION grain is at most twice the value grain, so the second
    median (the MAD) rides the same machinery. The outlier test
    compares dev * 10000 > 44478 * mad — integers end to end, no
    cross-engine float boundary anywhere.

    Plan: ONE corpus-scale hash aggregate to the (type, cents) grain;
    every window and join after it runs on grain tables bounded by
    the value domain, not the corpus. At 100 TB with a genuinely
    unbounded domain the KLL sketch (value_quantiles_kll) replaces
    the exact grain — stated trade, same output contract."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    v = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    counts = (
        e.select(F.col("event_type").alias("et"), v.alias("v"))
        .groupBy("et", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = (
        Window.partitionBy("et")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("et")
    cum = counts.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "n", F.sum("c").over(wall)
    )
    med = cum.groupBy("et").agg(
        F.max("n").alias("n_events"),
        F.min(
            F.when(F.col("cum") >= F.ceil(F.col("n") / 2), F.col("v"))
        ).alias("med"),
    )
    dev = (
        counts.join(med, "et")
        .select("et", "n_events", "med",
                F.abs(F.col("v") - F.col("med")).alias("d"), "c")
        .groupBy("et", "n_events", "med", "d")
        .agg(F.sum("c").alias("c"))
    )
    wdev = (
        Window.partitionBy("et")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dcum = dev.withColumn("cum", F.sum("c").over(wdev))
    stats = dcum.groupBy("et", "n_events", "med").agg(
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.col("n_events") / 2), F.col("d")
            )
        ).alias("mad"),
        F.max("d").alias("max_dev"),
    )
    # outlier pass on the deviation GRAIN (not raw rows): dev counts
    # already hold per-value multiplicities
    out = (
        dev.join(stats.select("et", "mad"), "et")
        .where(F.col("d") * 10000 > F.lit(44478) * F.col("mad"))
        .groupBy("et")
        .agg(F.sum("c").alias("n_outliers"))
    )
    return (
        stats.join(out, "et", "left")
        .select(
            F.col("et").alias("event_type"),
            "n_events",
            F.col("med").alias("median_cents"),
            F.col("mad").alias("mad_cents"),
            F.coalesce("n_outliers", F.lit(0)).alias("n_outliers"),
            F.round(
                F.coalesce("n_outliers", F.lit(0)) / F.col("n_events"), 6
            ).alias("outlier_share"),
            F.col("max_dev").alias("max_dev_cents"),
        )
    )


MAD_OUTLIERS_SQL = """
WITH counts AS (
  SELECT event_type AS et,
         cast(floor(value * 100 + 0.5) AS bigint) AS v,
         count(*) AS c
  FROM events GROUP BY 1, 2
), cum AS (
  SELECT *,
         sum(c) OVER (PARTITION BY et ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY et) AS n
  FROM counts
), med AS (
  SELECT et, cast(max(n) AS bigint) AS n_events,
         min(CASE WHEN cum >= ceil(n / 2.0) THEN v END) AS med
  FROM cum GROUP BY et
), dev AS (
  SELECT counts.et, n_events, med, abs(v - med) AS d,
         cast(sum(c) AS bigint) AS c
  FROM counts JOIN med ON counts.et = med.et
  GROUP BY 1, 2, 3, 4
), dcum AS (
  SELECT *,
         sum(c) OVER (PARTITION BY et ORDER BY d
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM dev
), stats AS (
  SELECT et, n_events, med,
         min(CASE WHEN cum >= ceil(n_events / 2.0) THEN d END) AS mad,
         max(d) AS max_dev
  FROM dcum GROUP BY 1, 2, 3
), outs AS (
  SELECT dev.et, cast(sum(c) AS bigint) AS n_outliers
  FROM dev JOIN stats ON dev.et = stats.et
  WHERE d * 10000 > 44478 * mad
  GROUP BY 1
)
SELECT stats.et AS event_type,
       n_events,
       med AS median_cents,
       mad AS mad_cents,
       coalesce(n_outliers, 0) AS n_outliers,
       round(coalesce(n_outliers, 0) / (1.0 * n_events), 6)
         AS outlier_share,
       max_dev AS max_dev_cents
FROM stats LEFT JOIN outs ON stats.et = outs.et
"""


def _synth_url_exprs() -> tuple:
    """(raw_url, canonical_url, host) column triple over the
    documents columns — the synthesis is a deterministic fixture (the
    corpus ships no URL column), the CANONICALIZATION is the
    operator: lowercase the host, strip query string, fragment and
    trailing slash. Raw-URL noise models crawler reality: case
    variance on the host (doc_id % 7), per-fetch tracking params
    (utm/ref or session ids embedding doc_id), trailing-slash and
    fragment variants."""
    did = F.col("doc_id")
    host_raw = F.concat(
        F.when((did % 7) == 0, F.upper("source")).otherwise(
            F.col("source")
        ),
        F.lit(".example.com"),
    )
    q = (
        F.when((did % 3) == 0, F.concat(F.lit("?utm_source=feed&ref="), did))
        .when((did % 3) == 1, F.concat(F.lit("?session="), did))
        .otherwise(F.lit(""))
    )
    raw = F.concat(
        F.lit("https://"),
        host_raw,
        F.lit("/"),
        F.col("lang"),
        F.lit("/page-"),
        (did % 50).cast("string"),
        F.when((did % 2) == 0, F.lit("/")).otherwise(F.lit("")),
        q,
        F.when((did % 5) == 0, F.lit("#section-2")).otherwise(F.lit("")),
    )
    host = F.lower(F.regexp_extract(raw, r"^https://([^/]+)", 1))
    path = F.regexp_replace(
        F.regexp_extract(raw, r"^https://[^/]+([^?#]*)", 1), r"/$", ""
    )
    canon = F.concat(F.lit("https://"), host, path)
    return raw, canon, host


def url_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-grain corpus provenance dedup — the crawl-dedup stage that
    runs BEFORE any content dedup in production pipelines (re-fetches
    of the same page are the cheapest duplicates to kill: no text ever
    needs hashing). Canonicalizes each document's URL (lowercase host,
    strip tracking query/fragment/trailing slash), keeps the
    min-doc_id fetch per canonical URL, and reports per host: fetches,
    raw URL variants, canonical URLs, duplicate fetches (and their
    rate per 10k), byte mass fetched vs kept — the per-host
    concentration view that complements source_concentration.

    Plan: pure string expressions in one projection (no UDF, no md5),
    then a (host, url) hash aggregate — URL grain, the corpus's
    natural key — and a host-grain rollup (catalog-bounded rows). At
    100 TB this is exactly one corpus-scale shuffle on the canonical
    URL; keep-first uses min/min_by inside the same aggregate, never
    a window over the corpus."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    raw, canon, host = _synth_url_exprs()
    fetches = d.select(
        host.alias("host"),
        raw.alias("raw_url"),
        canon.alias("url"),
        "doc_id",
        "n_chars",
    )
    per_url = fetches.groupBy("host", "url").agg(
        F.count(F.lit(1)).alias("nf"),
        F.count_distinct("raw_url").alias("nraw"),
        F.sum("n_chars").alias("bytes_fetched"),
        F.min_by("n_chars", "doc_id").alias("bytes_kept"),
    )
    return per_url.groupBy("host").agg(
        F.sum("nf").alias("n_fetches"),
        F.sum("nraw").alias("n_raw_urls"),
        F.count(F.lit(1)).alias("n_urls"),
        F.sum(F.col("nf") - 1).alias("dup_fetches"),
        F.floor(
            F.sum(F.col("nf") - 1) * 10000 / F.sum("nf")
        ).cast("long").alias("dup_per_10k"),
        F.sum("bytes_fetched").alias("bytes_fetched"),
        F.sum("bytes_kept").alias("bytes_kept"),
    )


def _synth_url_sql() -> str:
    """DuckDB twin of _synth_url_exprs as a relation text:
    (doc_id, n_chars, host, raw_url, url) over documents. ONE copy —
    URL_DEDUP_SQL and queries/dedup.py::_stage_overlap_sql both
    compose it, so a canonicalization edge-case fix can never leave
    one oracle on the old rules (round-13 review finding)."""
    return """
  SELECT doc_id, n_chars,
         lower(regexp_extract(raw, '^https://([^/]+)', 1)) AS host,
         raw AS raw_url,
         'https://' || lower(regexp_extract(raw, '^https://([^/]+)', 1))
           || regexp_replace(
                regexp_extract(raw, '^https://[^/]+([^?#]*)', 1),
                '/$', '') AS url
  FROM (
    SELECT doc_id, n_chars,
           'https://'
             || CASE WHEN doc_id % 7 = 0 THEN upper(source)
                     ELSE source END || '.example.com'
             || '/' || lang || '/page-' || (doc_id % 50)
             || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
             || CASE WHEN doc_id % 3 = 0
                     THEN '?utm_source=feed&ref=' || doc_id
                     WHEN doc_id % 3 = 1 THEN '?session=' || doc_id
                     ELSE '' END
             || CASE WHEN doc_id % 5 = 0 THEN '#section-2'
                     ELSE '' END AS raw
    FROM documents
  )
"""


URL_DEDUP_SQL = f"""
WITH fetches AS ({_synth_url_sql()}), per_url AS (
  SELECT host, url,
         count(*) AS nf,
         count(DISTINCT raw_url) AS nraw,
         sum(n_chars) AS bytes_fetched,
         min_by(n_chars, doc_id) AS bytes_kept
  FROM fetches GROUP BY host, url
)
SELECT host,
       cast(sum(nf) AS bigint) AS n_fetches,
       cast(sum(nraw) AS bigint) AS n_raw_urls,
       count(*) AS n_urls,
       cast(sum(nf - 1) AS bigint) AS dup_fetches,
       cast(floor(sum(nf - 1) * 10000 / (1.0 * sum(nf))) AS bigint)
         AS dup_per_10k,
       cast(sum(bytes_fetched) AS bigint) AS bytes_fetched,
       cast(sum(bytes_kept) AS bigint) AS bytes_kept
FROM per_url GROUP BY host
"""


QUERIES = [
    QuerySpec("table_profile", table_profile, _profile_sql()),
    QuerySpec("order_price_histogram", order_price_histogram, HISTOGRAM_SQL),
    QuerySpec("join_skew_report", join_skew_report, _skew_sql()),
    QuerySpec(
        "source_concentration",
        source_concentration,
        CONCENTRATION_SQL,
        "HHI / Gini / top-3 share of sources per language slice",
    ),
    QuerySpec(
        "benford_first_digit_audit",
        benford_first_digit_audit,
        BENFORD_SQL,
        "first-digit distribution vs Benford's law on order totals",
    ),
    QuerySpec(
        "value_mad_outliers",
        value_mad_outliers,
        MAD_OUTLIERS_SQL,
        "exact median/MAD robust outlier screen, integer end-to-end",
    ),
    QuerySpec(
        "url_dedup_stats",
        url_dedup_stats,
        URL_DEDUP_SQL,
        "URL-canonicalization crawl dedup + per-host concentration",
    ),
]
