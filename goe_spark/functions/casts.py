"""Staging -> final cast layer (C1/C2) and RDBMS-side read casts (P2).

Reference semantics: decimals, dates, timestamps and intervals are
staged as STRING (§1.5, avro/parquet staging types) and parsed on
final insert with SAFE_CAST / PARSE_* (bigquery_backend_table.py:
290-400). Spark equivalent: try_cast / try_to_timestamp — failures
become NULL, and the cast-corruption probe (A6) counts them before
the final load commits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from goe_spark.types import canonical as C
from goe_spark.types.canonical import CanonicalColumn
from goe_spark.types.spark_map import canonical_to_spark

# Canonical types staged as STRING in Avro/Parquet staging files
# (everything the 7-type staging systems can't carry natively).
STAGED_AS_STRING = (
    C.INTEGER_38,
    C.DECIMAL,
    C.DATE,
    C.TIME,
    C.TIMESTAMP,
    C.TIMESTAMP_TZ,
    C.INTERVAL_DS,
    C.INTERVAL_YM,
)


def staging_type_for(col: CanonicalColumn) -> str:
    """The staging-file type for a canonical column (SURVEY §1.5)."""
    if col.data_type in STAGED_AS_STRING:
        return "string"
    return canonical_to_spark(col).simpleString()


def staging_expr(col: CanonicalColumn, source: Column | str | None = None) -> Column:
    """Projection expression applied when writing the staging file."""
    c = F.col(col.name) if source is None else (
        F.col(source) if isinstance(source, str) else source
    )
    if col.data_type in (C.DATE,):
        return F.date_format(c, "yyyy-MM-dd").alias(col.name)
    if col.data_type in (C.TIMESTAMP, C.TIMESTAMP_TZ):
        return F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(col.name)
    if col.data_type in STAGED_AS_STRING:
        return c.cast("string").alias(col.name)
    return c.cast(canonical_to_spark(col)).alias(col.name)


def final_cast_expr(col: CanonicalColumn, safe: bool = True) -> Column:
    """Staging column -> final typed column (the reference's cast map
    entry, backend_table.py:704-751). safe=True uses try_* semantics
    (SAFE_CAST); safe=False is the verify_cast twin that would raise
    under ANSI."""
    name = col.name
    spark_t = canonical_to_spark(col)
    t = col.data_type
    fn = "try_cast" if safe else "cast"
    if t == C.DATE:
        return F.expr(f"{fn}({name} AS date)").alias(name)
    if t in (C.TIMESTAMP, C.TIMESTAMP_TZ):
        target = "timestamp_ntz" if t == C.TIMESTAMP else "timestamp"
        return F.expr(f"{fn}({name} AS {target})").alias(name)
    if t in STAGED_AS_STRING and t not in (
        C.TIME,
        C.INTERVAL_DS,
        C.INTERVAL_YM,
    ):
        return F.expr(f"{fn}({name} AS {spark_t.simpleString()})").alias(name)
    if t in (C.TIME, C.INTERVAL_DS, C.INTERVAL_YM):
        # Kept as string end-to-end (matches the reference's unsafe
        # STRING mappings for these on BigQuery).
        return F.col(name).cast("string").alias(name)
    return F.col(name).cast(spark_t).alias(name)


def build_cast_map(columns: list[CanonicalColumn]) -> dict[str, dict]:
    """Per-column cast metadata, mirroring _gen_final_table_casts:
    {'cast': Column, 'verify_cast': Column, 'staging_type': str}."""
    return {
        col.name: {
            "cast": final_cast_expr(col, safe=True),
            "verify_cast": final_cast_expr(col, safe=False),
            "staging_type": staging_type_for(col),
        }
        for col in columns
    }


def corruption_probe_aggs(columns: list[CanonicalColumn]) -> list[Column]:
    """A6: per-column COUNT of rows where staging IS NOT NULL and the
    safe cast comes back NULL — one aggregate pass."""
    aggs = []
    for col in columns:
        if col.data_type not in STAGED_AS_STRING or col.data_type in (
            C.TIME,
            C.INTERVAL_DS,
            C.INTERVAL_YM,
        ):
            continue
        casted = final_cast_expr(col, safe=True)
        aggs.append(
            F.sum(
                F.when(F.col(col.name).isNotNull() & casted.isNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"corrupt_{col.name}")
        )
    return aggs
