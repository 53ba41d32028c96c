"""Canonical -> Spark DataType mapping (SURVEY.md §1.2 table).

This is the mapping the engine itself runs on: staging DataFrames and
final tables are typed through it. BigQuery naming (types/bigquery.py)
is kept for DDL parity with the reference target.
"""

from __future__ import annotations

from pyspark.sql import types as T

from goe_spark.types import canonical as C
from goe_spark.types.canonical import CanonicalColumn


def canonical_to_spark(col: CanonicalColumn) -> T.DataType:
    t = col.data_type
    if t in (C.FIXED_STRING, C.VARIABLE_STRING, C.LARGE_STRING):
        return T.StringType()
    if t in (C.BINARY, C.LARGE_BINARY):
        return T.BinaryType()
    if t == C.INTEGER_1:
        return T.ByteType()
    if t == C.INTEGER_2:
        return T.ShortType()
    if t == C.INTEGER_4:
        return T.IntegerType()
    if t == C.INTEGER_8:
        return T.LongType()
    if t == C.INTEGER_38:
        return T.DecimalType(38, 0)
    if t == C.DECIMAL:
        p = col.data_precision or C.MAX_SUPPORTED_PRECISION
        s = col.data_scale if col.data_scale is not None else 0
        p = min(p, C.MAX_SUPPORTED_PRECISION)
        # Spark requires scale <= precision.
        s = min(s, p)
        return T.DecimalType(p, s)
    if t == C.FLOAT:
        return T.FloatType()
    if t == C.DOUBLE:
        return T.DoubleType()
    if t == C.DATE:
        return T.DateType()
    if t == C.TIME:
        # No native TIME in Spark — string, same unsafe call the
        # reference makes for BigQuery TIME round-trips.
        return T.StringType()
    if t == C.TIMESTAMP:
        # Wall-clock timestamp without zone.
        return T.TimestampNTZType()
    if t == C.TIMESTAMP_TZ:
        # Instant semantics, UTC-normalized.
        return T.TimestampType()
    if t == C.INTERVAL_DS:
        return T.DayTimeIntervalType()
    if t == C.INTERVAL_YM:
        return T.YearMonthIntervalType()
    if t == C.BOOLEAN:
        return T.BooleanType()
    raise NotImplementedError(f"unsupported canonical type: {t}")


def spark_to_canonical(name: str, dt: T.DataType, nullable: bool = True) -> CanonicalColumn:
    """Reverse mapping for file-backed sources: Spark schema ->
    canonical columns (so parquet fixtures flow through the same
    pipeline as an RDBMS catalog would)."""
    k = dict(name=name, nullable=nullable)
    if isinstance(dt, T.StringType):
        return CanonicalColumn(data_type=C.VARIABLE_STRING, **k)
    if isinstance(dt, T.BinaryType):
        return CanonicalColumn(data_type=C.BINARY, **k)
    if isinstance(dt, T.ByteType):
        return CanonicalColumn(data_type=C.INTEGER_1, **k)
    if isinstance(dt, T.ShortType):
        return CanonicalColumn(data_type=C.INTEGER_2, **k)
    if isinstance(dt, T.IntegerType):
        return CanonicalColumn(data_type=C.INTEGER_4, **k)
    if isinstance(dt, T.LongType):
        return CanonicalColumn(data_type=C.INTEGER_8, **k)
    if isinstance(dt, T.DecimalType):
        if dt.scale == 0 and dt.precision > 18:
            return CanonicalColumn(data_type=C.INTEGER_38, **k)
        integral = C.frontend_decimal_to_integral_type(dt.precision, dt.scale)
        if integral:
            return CanonicalColumn(
                data_type=integral, data_precision=dt.precision, data_scale=0, **k
            )
        return CanonicalColumn(
            data_type=C.DECIMAL,
            data_precision=dt.precision,
            data_scale=dt.scale,
            **k,
        )
    if isinstance(dt, T.FloatType):
        return CanonicalColumn(data_type=C.FLOAT, **k)
    if isinstance(dt, T.DoubleType):
        return CanonicalColumn(data_type=C.DOUBLE, **k)
    if isinstance(dt, T.DateType):
        return CanonicalColumn(data_type=C.DATE, **k)
    if isinstance(dt, T.TimestampNTZType):
        return CanonicalColumn(data_type=C.TIMESTAMP, **k)
    if isinstance(dt, T.TimestampType):
        # Parquet fixture timestamps are wall-clock; treat as TIMESTAMP
        # (the reference maps Oracle DATE/TIMESTAMP the same way).
        return CanonicalColumn(data_type=C.TIMESTAMP, **k)
    if isinstance(dt, T.DayTimeIntervalType):
        return CanonicalColumn(data_type=C.INTERVAL_DS, **k)
    if isinstance(dt, T.YearMonthIntervalType):
        return CanonicalColumn(data_type=C.INTERVAL_YM, **k)
    if isinstance(dt, T.BooleanType):
        return CanonicalColumn(data_type=C.BOOLEAN, **k)
    raise NotImplementedError(f"unsupported Spark type for canonical model: {dt}")
