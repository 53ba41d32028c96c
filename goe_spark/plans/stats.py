"""Stats copy / compute (SURVEY §2.5 A10/A11).

A10 ports the reference's copy-stats decision algebra
(src/goe/offload/operation/stats_controls.py:37-260): whether to copy
RDBMS table/column stats onto the backend, the NDV cap (:202-227) and
the incremental num_nulls pro-rating factor (:244-249). The decisions
are pure functions so the reference's unit-test style applies.

A11 computes stats natively: either one Spark aggregate over the
DataFrame (count / approx NDV / null count per column — the
scan-once shape that works at 100 TB) or `ANALYZE TABLE` for
catalog-backed tables.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ColumnStats:
    ndv: int
    num_nulls: int
    low_value: object = None
    high_value: object = None


@dataclass(frozen=True)
class CopyStatsDecision:
    copy_table_stats: bool
    copy_column_stats: bool
    ndv_cap: int
    num_null_factor: float
    reason: str


def copy_stats_decision(
    rdbms_num_rows: int,
    backend_num_rows: int,
    additive: bool = False,
    pro_rate_num_rows: int | None = None,
) -> CopyStatsDecision:
    """Port of stats_controls.py:189-250.

    - Non-additive copy only happens when the RDBMS has MORE rows than
      the backend already believes it has (otherwise backend stats are
      fresher); the NDV cap is then the RDBMS row count.
    - Additive (incremental) copy always proceeds; NDV cap is the sum
      of both row counts, and num_nulls is factored down by the share
      of rows this increment contributes.
    """
    rdbms = max(rdbms_num_rows, 0)
    backend = max(backend_num_rows, 0)
    if not additive and rdbms_num_rows <= backend:
        return CopyStatsDecision(
            copy_table_stats=False,
            copy_column_stats=False,
            ndv_cap=backend,
            num_null_factor=1.0,
            reason=f"not copied due to row count (RDBMS:{rdbms_num_rows} <= backend:{backend})",
        )
    if additive:
        ndv_cap = backend + rdbms
        if pro_rate_num_rows and rdbms_num_rows:
            factor = float(pro_rate_num_rows + backend) / float(rdbms_num_rows)
        else:
            factor = 1.0
        return CopyStatsDecision(
            copy_table_stats=True,
            copy_column_stats=True,
            ndv_cap=ndv_cap,
            num_null_factor=factor,
            reason=f"additive copy (backend:{backend} + RDBMS:{rdbms})",
        )
    return CopyStatsDecision(
        copy_table_stats=True,
        copy_column_stats=True,
        ndv_cap=rdbms_num_rows,
        num_null_factor=1.0,
        reason=f"copy (RDBMS:{rdbms_num_rows} -> backend:{backend})",
    )


def cap_column_stats(
    col_stats: dict[str, ColumnStats], decision: CopyStatsDecision
) -> dict[str, ColumnStats]:
    """Apply the NDV cap and null factor to every column
    (stats_controls.py ndv cap at set_column_stats call sites)."""
    out = {}
    for name, cs in col_stats.items():
        out[name] = ColumnStats(
            ndv=min(cs.ndv, decision.ndv_cap),
            num_nulls=int(cs.num_nulls * decision.num_null_factor),
            low_value=cs.low_value,
            high_value=cs.high_value,
        )
    return out


def gather_stats(
    df: DataFrame, columns: list[str] | None = None
) -> tuple[int, dict[str, ColumnStats]]:
    """A11 as one aggregate: (num_rows, per-column ndv/nulls/min/max).

    Single scan, map-side partial everything; NDV via HyperLogLog++
    (approx_count_distinct) — exact NDV at 100 TB is a shuffle of
    every distinct value and never worth it for optimizer stats.
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(F.approx_count_distinct(c).alias(f"ndv_{c}"))
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"))
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    row = df.agg(*aggs).first()
    stats = {
        c: ColumnStats(
            ndv=int(row[f"ndv_{c}"]),
            num_nulls=int(row[f"nulls_{c}"] or 0),
            low_value=row[f"min_{c}"],
            high_value=row[f"max_{c}"],
        )
        for c in cols
    }
    return int(row["__rows"]), stats


def analyze_table(spark: SparkSession, table: str, columns: bool = True) -> None:
    """Native catalog stats (A11): ANALYZE TABLE, optionally per-column."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR ALL COLUMNS")


def table_stats(spark: SparkSession, table: str) -> dict[str, str]:
    """Read back catalog stats written by analyze_table."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    out = {}
    for r in rows:
        if r.col_name == "Statistics":
            out["statistics"] = r.data_type
    return out
