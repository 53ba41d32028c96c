"""GOE validation algebra + synthetic-partition expressions as queries.

Reference semantics (SURVEY.md §2.4/§2.5):
- CrossDbValidator aggregate: min/max/count over selected columns,
  GROUP BY partition columns (offload_validation.py:257+,438-524).
- COUNT(*) "minus" validation (offload_validation.py:879+).
- Staged-data single-pass rule scan (backend_table.py:1430-1502).
- Cast-corruption probe with SAFE_CAST/try_cast (backend_table.py:1120-1207).
- Synthetic partition expressions C3-C6 (backend_table.py:828-986).
- Data-type sampling aggregate (offload_source_table.py:668-927).
- Column transformations (offload_xform_functions.py:29-100).

Each is ONE declarative Spark plan: single scan, map-side partial
aggregation, tiny shuffle. At 100 TB these run as full-table scans
with no wide rows crossing the network — only aggregate states.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.catalog import load_table
from goe_spark.queries import QuerySpec


def agg_validate_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CrossDbValidator shape: min/max/count on 5 columns grouped by the
    (synthetic) partition column — here month(l_shipdate).

    cf. offload_validation.py:438-524 (SQL builder) — the reference
    picks first/middle/last columns; we pin an explicit set so the
    oracle matches. min/max need no rounding (they are data values,
    bit-exact in both engines).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("part_month"))
        .agg(
            F.min("l_orderkey").alias("min_l_orderkey"),
            F.max("l_orderkey").alias("max_l_orderkey"),
            F.count("l_orderkey").alias("count_l_orderkey"),
            F.min("l_quantity").alias("min_l_quantity"),
            F.max("l_quantity").alias("max_l_quantity"),
            F.min("l_extendedprice").alias("min_l_extendedprice"),
            F.max("l_extendedprice").alias("max_l_extendedprice"),
            F.min("l_shipdate").alias("min_l_shipdate"),
            F.max("l_shipdate").alias("max_l_shipdate"),
            F.count(F.lit(1)).alias("row_count"),
        )
    )


AGG_VALIDATE_SQL = """
SELECT strftime(l_shipdate, '%Y-%m') AS part_month,
       min(l_orderkey)       AS min_l_orderkey,
       max(l_orderkey)       AS max_l_orderkey,
       count(l_orderkey)     AS count_l_orderkey,
       min(l_quantity)       AS min_l_quantity,
       max(l_quantity)       AS max_l_quantity,
       min(l_extendedprice)  AS min_l_extendedprice,
       max(l_extendedprice)  AS max_l_extendedprice,
       min(l_shipdate)       AS min_l_shipdate,
       max(l_shipdate)       AS max_l_shipdate,
       count(*)              AS row_count
FROM lineitem
GROUP BY 1
"""


def count_validate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'minus' verification: bare COUNT(*) equality (goe.py:540-592)."""
    return (
        load_table(spark, sf_dir, "orders")
        .agg(F.count(F.lit(1)).alias("row_count"))
    )


COUNT_VALIDATE_SQL = "SELECT count(*) AS row_count FROM orders"


def staged_validation_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass staged-data rule scan (backend_table.py:1430-1502):
    row count, NOT NULL violations, NaN presence, decimal-scale
    overflow, partition-range bounds — one aggregate, one scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("nn_violations"),
        F.sum(F.when(F.isnan("l_quantity") | F.isnan("l_extendedprice"), 1).otherwise(0))
        .cast("long")
        .alias("nan_rows"),
        F.sum(
            F.when(F.col("l_quantity") != F.round(F.col("l_quantity"), 2), 1).otherwise(0)
        )
        .cast("long")
        .alias("scale_overflow_rows"),
        F.sum(
            F.when(
                (F.col("l_shipdate") < F.lit("1992-01-01").cast("timestamp"))
                | (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("part_range_violations"),
    )


STAGED_VALIDATION_SQL = """
SELECT count(*) AS row_count,
       cast(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS bigint) AS nn_violations,
       cast(sum(CASE WHEN isnan(l_quantity) OR isnan(l_extendedprice) THEN 1 ELSE 0 END) AS bigint) AS nan_rows,
       cast(sum(CASE WHEN l_quantity != round(l_quantity, 2) THEN 1 ELSE 0 END) AS bigint) AS scale_overflow_rows,
       cast(sum(CASE WHEN l_shipdate <  TIMESTAMP '1992-01-01 00:00:00'
                       OR l_shipdate >= TIMESTAMP '1999-01-01 00:00:00' THEN 1 ELSE 0 END) AS bigint) AS part_range_violations
FROM lineitem
"""


def cast_probe_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast-corruption probe (backend_table.py:1120-1207): for each
    staged (stringified) column, COUNT rows where staging IS NOT NULL
    AND try_cast(staging) IS NULL — per-column corruption counts.

    o_orderstatus is alphabetic so its int cast corrupts 100% — the
    probe must report that, mirroring the reference's fatal check.

    The stringify + 3x try_cast per row is CPU-bound expression work;
    on a single-file orders scan it ran as ONE task (guide §2.2) —
    spread parallelizes it (shuffling the 3 narrow native columns,
    pre-stringify), a no-op on a many-file table.
    """
    from goe_spark.catalog import spread

    o = spread(load_table(spark, sf_dir, "orders"), "o_orderkey")
    staged = o.select(
        F.col("o_totalprice").cast("string").alias("s_totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("s_orderdate"),
        F.col("o_orderstatus").alias("s_orderstatus"),
    )
    return staged.agg(
        F.sum(
            F.when(
                F.col("s_totalprice").isNotNull()
                & F.expr("try_cast(s_totalprice AS decimal(12,2))").isNull(),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("corrupt_totalprice"),
        F.sum(
            F.when(
                F.col("s_orderdate").isNotNull()
                & F.expr("try_cast(s_orderdate AS date)").isNull(),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("corrupt_orderdate"),
        F.sum(
            F.when(
                F.col("s_orderstatus").isNotNull()
                & F.expr("try_cast(s_orderstatus AS int)").isNull(),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("corrupt_orderstatus"),
    )


CAST_PROBE_SQL = """
SELECT
  cast(sum(CASE WHEN s_totalprice IS NOT NULL AND try_cast(s_totalprice AS decimal(12,2)) IS NULL THEN 1 ELSE 0 END) AS bigint) AS corrupt_totalprice,
  cast(sum(CASE WHEN s_orderdate IS NOT NULL AND try_cast(s_orderdate AS date) IS NULL THEN 1 ELSE 0 END) AS bigint) AS corrupt_orderdate,
  cast(sum(CASE WHEN s_orderstatus IS NOT NULL AND try_cast(s_orderstatus AS int) IS NULL THEN 1 ELSE 0 END) AS bigint) AS corrupt_orderstatus
FROM (
  SELECT cast(o_totalprice AS varchar)       AS s_totalprice,
         strftime(o_orderdate, '%Y-%m-%d')   AS s_orderdate,
         o_orderstatus                       AS s_orderstatus
  FROM orders
)
"""


def synthetic_partition_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic partition C3 (date_trunc) + C4 (YYYY-MM string):
    both forms of the month partition key with per-partition counts
    (backend_table.py:856-889, bigquery_backend_table.py:209-217).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.date_trunc("month", "l_shipdate").cast("date").alias("goe_part_m_date"),
            F.date_format("l_shipdate", "yyyy-MM").alias("goe_part_m_str"),
        )
        .agg(F.count(F.lit(1)).alias("part_rows"))
    )


SYNTH_MONTH_SQL = """
SELECT date_trunc('month', l_shipdate)  AS goe_part_m_date,
       strftime(l_shipdate, '%Y-%m')    AS goe_part_m_str,
       count(*)                         AS part_rows
FROM lineitem
GROUP BY 1, 2
"""


def synthetic_partition_number_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic partition C5: FLOOR(col/g)*g numeric range buckets,
    plus the zero-padded string form with digits=12
    (backend_table.py:891-906, synthetic_partition_literal.py:61-75).
    """
    o = load_table(spark, sf_dir, "orders")
    bucket = (F.floor(F.col("o_totalprice") / 50000) * 50000).cast("long")
    return (
        o.groupBy(
            bucket.alias("goe_part_num"),
            F.lpad(bucket.cast("string"), 12, "0").alias("goe_part_num_str"),
        )
        .agg(
            F.count(F.lit(1)).alias("part_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("part_value"),
        )
    )


SYNTH_NUM_SQL = """
SELECT cast(floor(o_totalprice / 50000) * 50000 AS bigint)                  AS goe_part_num,
       lpad(cast(cast(floor(o_totalprice / 50000) * 50000 AS bigint) AS varchar), 12, '0') AS goe_part_num_str,
       count(*)                                                             AS part_rows,
       round(sum(o_totalprice), 2)                                          AS part_value
FROM orders
GROUP BY 1, 2
"""


def synthetic_partition_string_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic partition C6: SUBSTR(col,1,g) prefix buckets
    (backend_table.py:908-915)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy(F.substring("p_name", 1, 4).alias("goe_part_str"))
        .agg(
            F.count(F.lit(1)).alias("part_rows"),
            F.min("p_partkey").alias("min_partkey"),
            F.max("p_partkey").alias("max_partkey"),
        )
    )


SYNTH_STR_SQL = """
SELECT substr(p_name, 1, 4) AS goe_part_str,
       count(*)             AS part_rows,
       min(p_partkey)       AS min_partkey,
       max(p_partkey)       AS max_partkey
FROM part
GROUP BY 1
"""


def data_type_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-tightening sampling aggregate (offload_source_table.py:668-927):
    per numeric column, max integral magnitude and whether any value
    carries fractional scale; min/max per date column. The reference
    does this over a SAMPLE clause — at 100 TB we would too
    (df.sample); for the deterministic oracle we scan all rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.max(F.floor(F.abs(F.col("l_extendedprice")))).cast("long").alias("max_mag_price"),
        F.max(F.floor(F.abs(F.col("l_quantity")))).cast("long").alias("max_mag_qty"),
        F.sum(
            F.when(F.col("l_discount") != F.round(F.col("l_discount")), 1).otherwise(0)
        )
        .cast("long")
        .alias("frac_scale_rows_discount"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
    )


SAMPLING_SQL = """
SELECT cast(max(floor(abs(l_extendedprice))) AS bigint) AS max_mag_price,
       cast(max(floor(abs(l_quantity))) AS bigint)      AS max_mag_qty,
       cast(sum(CASE WHEN l_discount != round(l_discount) THEN 1 ELSE 0 END) AS bigint)
                                                        AS frac_scale_rows_discount,
       min(l_shipdate)                                  AS min_shipdate,
       max(l_shipdate)                                  AS max_shipdate
FROM lineitem
"""


def transform_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column transformations P3 (offload_xform_functions.py:29-100):
    null / translate / regexp_replace applied as a projection, with a
    distinct-count witness that the transform behaved identically.
    """
    p = load_table(spark, sf_dir, "part")
    xf = p.select(
        F.col("p_partkey"),
        F.lit(None).cast("string").alias("p_name_null"),
        F.translate("p_brand", "#", "_").alias("p_brand_xlate"),
        F.regexp_replace("p_type", "[aeiou]", "*").alias("p_type_masked"),
    )
    return xf.groupBy("p_brand_xlate").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("p_type_masked").alias("distinct_masked_types"),
        F.max("p_name_null").alias("always_null"),
    )


TRANSFORM_SQL = """
SELECT translate(p_brand, '#', '_') AS p_brand_xlate,
       count(*)                     AS n,
       count(DISTINCT regexp_replace(p_type, '[aeiou]', '*', 'g')) AS distinct_masked_types,
       max(cast(NULL AS varchar))   AS always_null
FROM part
GROUP BY 1
"""


def dq_orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over orders (plans/expectations):
    not-null and domain checks share ONE aggregate scan, uniqueness is
    one groupBy, and the customer FK is one broadcast anti-join — the
    dbt-tests surface a load step gates the final swap on. All checks
    pass on the fixture, so the oracle's value is the exact violation
    COUNTS (a broken rule evaluator shows a nonzero count or a
    missing row, not a silent pass)."""
    from goe_spark.plans.expectations import (
        accepted_values,
        check_expectations,
        expression,
        foreign_key,
        not_null,
        unique,
    )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rules = [
        not_null("o_orderkey"),
        not_null("o_custkey"),
        accepted_values("o_orderstatus", ["F", "O", "P"]),
        expression("price_positive", "o_totalprice > 0"),
        unique("o_orderkey"),
        foreign_key("o_custkey", c, "c_custkey"),
    ]
    return check_expectations(spark, o, rules)


DQ_ORDERS_SQL = """
SELECT 'not_null_o_orderkey' AS rule, 'not_null' AS kind,
       'o_orderkey' AS column_name,
       cast(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_violations
FROM orders
UNION ALL
SELECT 'not_null_o_custkey', 'not_null', 'o_custkey',
       cast(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS bigint)
FROM orders
UNION ALL
SELECT 'accepted_values_o_orderstatus', 'accepted_values', 'o_orderstatus',
       cast(sum(CASE WHEN o_orderstatus IS NULL
                       OR o_orderstatus NOT IN ('F', 'O', 'P')
                     THEN 1 ELSE 0 END) AS bigint)
FROM orders
UNION ALL
SELECT 'price_positive', 'expression', '',
       cast(sum(CASE WHEN NOT coalesce(o_totalprice > 0, false)
                     THEN 1 ELSE 0 END) AS bigint)
FROM orders
UNION ALL
SELECT 'unique_o_orderkey', 'unique', 'o_orderkey',
       cast(coalesce(sum(c), 0) AS bigint)
FROM (SELECT o_orderkey, count(*) AS c FROM orders
      WHERE o_orderkey IS NOT NULL GROUP BY 1 HAVING count(*) > 1)
UNION ALL
SELECT 'fk_o_custkey', 'foreign_key', 'o_custkey',
       cast(count(*) AS bigint)
FROM orders o
WHERE o.o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
"""

DQ_ORDERS_SQL = (
    "SELECT rule, kind, column_name, n_violations, n_violations = 0 AS passed "
    "FROM (" + DQ_ORDERS_SQL + ")"
)


def referential_integrity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-table referential-integrity battery — the checks a
    warehouse runs after every load before opening the tables to
    queries: FK orphans in both directions, childless parents, and
    PK uniqueness. A clean corpus returns zero violations (which is
    itself the assertion; the reference's validation suite runs the
    same always-on shape, `agg_validate` per table pair).

    Plan: each FK check is a LEFT ANTI join aggregated to one row —
    Spark broadcasts the smaller distinct-key side where it fits and
    the whole check is a null-produce-count; the PK check is a
    keys-only groupBy. Nothing wider than a key column ever
    shuffles; all checks run in one union of independent one-row
    aggregates (shared scans via exchange reuse where AQE finds
    them)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def one(name: str, viol: DataFrame, total: DataFrame) -> DataFrame:
        v = viol.agg(F.count(F.lit(1)).alias("n_violations"))
        t = total.agg(F.count(F.lit(1)).alias("n_total"))
        return v.crossJoin(t).select(
            F.lit(name).alias("check_name"),
            "n_violations",
            "n_total",
            F.round(F.col("n_violations") / F.col("n_total"), 6).alias(
                "violation_share"
            ),
        )

    lk = li.select("l_orderkey")
    ok = o.select("o_orderkey")
    checks = [
        one(
            "lineitem_orphan_orderkey",
            lk.join(ok, lk.l_orderkey == ok.o_orderkey, "left_anti"),
            lk,
        ),
        one(
            "orders_orphan_custkey",
            o.select("o_custkey").join(
                c.select("c_custkey"),
                F.col("o_custkey") == F.col("c_custkey"),
                "left_anti",
            ),
            o.select("o_custkey"),
        ),
        one(
            "orders_without_lineitems",
            ok.join(lk, ok.o_orderkey == lk.l_orderkey, "left_anti"),
            ok,
        ),
        one(
            "duplicate_orderkeys",
            ok.groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1),
            ok,
        ),
        one("null_orderkeys", ok.where(F.col("o_orderkey").isNull()), ok),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionAll(ch)
    return out


REF_INTEGRITY_SQL = """
SELECT 'lineitem_orphan_orderkey' AS check_name,
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
         AS n_violations,
       (SELECT count(*) FROM lineitem) AS n_total,
       round((SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
             / (1.0 * (SELECT count(*) FROM lineitem)), 6)
         AS violation_share
UNION ALL
SELECT 'orders_orphan_custkey',
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)),
       (SELECT count(*) FROM orders),
       round((SELECT count(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey))
             / (1.0 * (SELECT count(*) FROM orders)), 6)
UNION ALL
SELECT 'orders_without_lineitems',
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey)),
       (SELECT count(*) FROM orders),
       round((SELECT count(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                WHERE l.l_orderkey = o.o_orderkey))
             / (1.0 * (SELECT count(*) FROM orders)), 6)
UNION ALL
SELECT 'duplicate_orderkeys',
       (SELECT count(*) FROM (SELECT o_orderkey FROM orders
                              GROUP BY o_orderkey HAVING count(*) > 1)),
       (SELECT count(*) FROM orders),
       round((SELECT count(*) FROM (SELECT o_orderkey FROM orders
                                    GROUP BY o_orderkey
                                    HAVING count(*) > 1))
             / (1.0 * (SELECT count(*) FROM orders)), 6)
UNION ALL
SELECT 'null_orderkeys',
       (SELECT count(*) FROM orders WHERE o_orderkey IS NULL),
       (SELECT count(*) FROM orders),
       round((SELECT count(*) FROM orders WHERE o_orderkey IS NULL)
             / (1.0 * (SELECT count(*) FROM orders)), 6)
"""


QUERIES = [
    QuerySpec("agg_validate_lineitem", agg_validate_lineitem, AGG_VALIDATE_SQL),
    QuerySpec(
        "referential_integrity_audit",
        referential_integrity_audit,
        REF_INTEGRITY_SQL,
        "FK-orphan / childless-parent / PK-uniqueness battery",
    ),
    QuerySpec("dq_orders_expectations", dq_orders_expectations, DQ_ORDERS_SQL),
    QuerySpec("count_validate_orders", count_validate_orders, COUNT_VALIDATE_SQL),
    QuerySpec("staged_validation_scan", staged_validation_scan, STAGED_VALIDATION_SQL),
    QuerySpec("cast_probe_orders", cast_probe_orders, CAST_PROBE_SQL),
    QuerySpec("synthetic_partition_month", synthetic_partition_month, SYNTH_MONTH_SQL),
    QuerySpec(
        "synthetic_partition_number_range",
        synthetic_partition_number_range,
        SYNTH_NUM_SQL,
    ),
    QuerySpec(
        "synthetic_partition_string_prefix",
        synthetic_partition_string_prefix,
        SYNTH_STR_SQL,
    ),
    QuerySpec("data_type_sampling", data_type_sampling, SAMPLING_SQL),
    QuerySpec("transform_projection", transform_projection, TRANSFORM_SQL),
]
