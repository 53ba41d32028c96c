"""Sampling-driven type tightening (§1.6 — sample_rdbms_data_types,
src/goe/offload/offload_source_table.py:668-927 in the reference).

When the frontend declares a number with no precision/scale (Oracle
bare NUMBER) or a date of unknown range, the reference samples the
data and *tightens* the canonical type from what it saw:

- integral everywhere (max fractional scale 0) → narrowest INTEGER_n
  that holds the observed magnitude, marked UNSAFE (the sample can
  miss the true max, so the 17-18-digit edge rounds up to INTEGER_38);
- fractional → DECIMAL(magnitude+scale, scale), unsafe;
- scientific-notation presence → DOUBLE (decimal text round-trip
  would lose the exponent);
- dates before the backend's supported minimum → VARIABLE_STRING
  fallback (BigQuery DATE starts at year 1).

The Spark side of the contract is one aggregate over df.sample(...)
(build_sampling_aggs); the decisions are pure functions so the
reference's golden-matrix test style applies directly.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from goe_spark.types.canonical import (
    DECIMAL,
    DOUBLE,
    VARIABLE_STRING,
    CanonicalColumn,
    frontend_decimal_to_integral_type,
)

MAX_SUPPORTED_PRECISION = 38
MIN_SUPPORTED_DATE = _dt.date(1, 1, 1)


@dataclass(frozen=True)
class NumericSample:
    max_integral_magnitude: int  # digits left of the point, observed
    max_scale: int  # digits right of the point, observed
    has_e_notation: bool = False


class SamplingTightenError(ValueError):
    """The sampled magnitude/scale cannot fit the backend's decimal."""


def tighten_numeric(
    name: str, sample: NumericSample, allow_scale_rounding: bool = False
) -> CanonicalColumn:
    """Sampled stats → canonical column, always unsafe (sampled).

    When observed magnitude + scale exceed the 38-digit decimal, the
    offload is REJECTED rather than silently shrinking the integral
    capacity below what the sample itself saw (which would try_cast
    real values to NULL at final load). With
    ``allow_scale_rounding=True`` — the reference's
    --allow-decimal-scale-rounding flag
    (offload_source_table.py check_backend_max_decimal_integral_
    magnitude) — only the SCALE is reduced to make room; magnitude
    beyond 38 digits is unconditionally rejected.
    """
    if sample.has_e_notation:
        return CanonicalColumn(name, DOUBLE, safe_mapping=False)
    mag = max(1, sample.max_integral_magnitude)
    if sample.max_scale == 0:
        integral = frontend_decimal_to_integral_type(mag, 0, safe_mapping=False)
        if integral is not None:
            return CanonicalColumn(name, integral, safe_mapping=False)
    if mag > MAX_SUPPORTED_PRECISION:
        raise SamplingTightenError(
            f"{name}: sampled integral magnitude {mag} exceeds the "
            f"backend maximum of {MAX_SUPPORTED_PRECISION} digits"
        )
    scale = sample.max_scale
    if mag + scale > MAX_SUPPORTED_PRECISION:
        if not allow_scale_rounding:
            raise SamplingTightenError(
                f"{name}: sampled magnitude {mag} + scale {scale} "
                f"exceeds DECIMAL({MAX_SUPPORTED_PRECISION}); re-run "
                "with scale rounding explicitly allowed to truncate "
                "fractional digits"
            )
        scale = MAX_SUPPORTED_PRECISION - mag
    precision = mag + scale
    return CanonicalColumn(
        name,
        DECIMAL,
        data_precision=precision,
        data_scale=scale,
        safe_mapping=False,
    )


def tighten_date(name: str, min_value: _dt.date | None) -> CanonicalColumn:
    """Date columns whose minimum predates the backend-supported range
    fall back to string staging (reference: string fallback for
    out-of-range dates)."""
    from goe_spark.types.canonical import DATE

    if min_value is not None and min_value < MIN_SUPPORTED_DATE:
        return CanonicalColumn(name, VARIABLE_STRING, safe_mapping=False)
    return CanonicalColumn(name, DATE, safe_mapping=False)


def _digits(col: Column) -> Column:
    """Integral-magnitude digit count of a numeric column."""
    mag = F.floor(F.abs(col)).cast("decimal(38,0)")
    return F.when(mag == 0, F.lit(1)).otherwise(
        F.length(mag.cast("string"))
    )


def _scale_digits(col: Column, max_check: int = 10) -> Column:
    """Smallest s in [0, max_check] such that round(x, s) == x — the
    observed fractional scale without string parsing."""
    out = F.lit(max_check)
    for s in range(max_check - 1, -1, -1):
        out = F.when(F.round(col, s) == col, F.lit(s)).otherwise(out)
    return out


def build_sampling_aggs(
    df: DataFrame,
    numeric_cols: list[str],
    date_cols: list[str],
) -> list[Column]:
    """The one-pass sampling aggregate: per numeric column max
    integral digits + max fractional scale, per date column min value.
    Run it as df.sample(fraction).agg(*build_sampling_aggs(...)) — at
    100 TB the sample bounds the scan the way the reference's
    SAMPLE BLOCK clause does."""
    aggs: list[Column] = []
    for c in numeric_cols:
        aggs.append(F.max(_digits(F.col(c))).cast("int").alias(f"mag_{c}"))
        aggs.append(
            F.max(_scale_digits(F.col(c))).cast("int").alias(f"scale_{c}")
        )
    for c in date_cols:
        aggs.append(F.min(F.col(c)).alias(f"min_{c}"))
    return aggs


def sample_rdbms_data_types(
    spark,
    url: str,
    table: str,
    numeric_cols: list[str],
    date_cols: list[str],
    dialect: str = "ansi",
    percent: float = 1.0,
    properties: dict[str, str] | None = None,
) -> list[CanonicalColumn]:
    """End-to-end sampling-driven tightening against a LIVE frontend,
    with the sample pushed into the source database's own sampler
    when the dialect has one (the reference's SAMPLE BLOCK path —
    offload_source_table.py:668-927, oracle_offload_source_table.py:784).

    Pushdown matters at scale: ``SAMPLE BLOCK (1)`` makes the RDBMS
    read ~1% of the blocks; the fallback (``df.sample`` after a full
    JDBC read) is semantically identical but ships 100% of the rows
    over the wire first. Column pruning applies either way — only the
    columns being tightened enter the subquery."""
    from goe_spark.sources.jdbc import dbtable_subquery, sample_clause

    cols = list(numeric_cols) + list(date_cols)
    clause = sample_clause(dialect, percent)
    src = dbtable_subquery(table, columns=cols, sample=clause)
    df = spark.read.jdbc(url=url, table=src, properties=properties or {})
    if clause is None and percent < 100:
        df = df.sample(fraction=percent / 100.0, seed=7)
    row = (
        df.agg(*build_sampling_aggs(df, numeric_cols, date_cols))
        .first()
        .asDict()
    )
    return tighten_from_sample_row(row, numeric_cols, date_cols)


def tighten_from_sample_row(
    row: dict,
    numeric_cols: list[str],
    date_cols: list[str],
) -> list[CanonicalColumn]:
    """Bind the aggregate row back into canonical columns."""
    out = []
    for c in numeric_cols:
        out.append(
            tighten_numeric(
                c,
                NumericSample(
                    max_integral_magnitude=int(row[f"mag_{c}"] or 0),
                    max_scale=int(row[f"scale_{c}"] or 0),
                ),
            )
        )
    for c in date_cols:
        mv = row[f"min_{c}"]
        if isinstance(mv, _dt.datetime):
            mv = mv.date()
        out.append(tighten_date(c, mv))
    return out
