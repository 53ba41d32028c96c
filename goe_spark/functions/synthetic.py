"""Synthetic partition expressions (C3-C6) and their Python literal
twin (C8).

The reference generates backend SQL for the partition column AND
re-implements the same conversion in Python so the driver can match
partition values to high-water marks without a SQL round-trip
(backend_table.py:828-986, synthetic_partition_literal.py:61-118).
Keeping the two in lock-step is the invariant; test_synthetic.py
asserts Spark-expression == Python-literal on the same inputs.

Granularities:
- dates: 'Y' / 'M' / 'D' (string form 'YYYY' / 'YYYY-MM' / 'YYYY-MM-DD')
- numbers: integer g -> FLOOR(col/g)*g, optionally LPAD to digits
- strings: integer g -> SUBSTR(col, 1, g)
"""

from __future__ import annotations

import datetime as _dt
import decimal

from pyspark.sql import Column
from pyspark.sql import functions as F

GRANULARITY_YEAR = "Y"
GRANULARITY_MONTH = "M"
GRANULARITY_DAY = "D"

_DATE_FORMATS = {
    GRANULARITY_YEAR: "yyyy",
    GRANULARITY_MONTH: "yyyy-MM",
    GRANULARITY_DAY: "yyyy-MM-dd",
}
_TRUNC_UNITS = {
    GRANULARITY_YEAR: "year",
    GRANULARITY_MONTH: "month",
    GRANULARITY_DAY: "day",
}


def synthetic_date_expr(col: Column | str, granularity: str, as_string: bool = True) -> Column:
    """C3/C4: truncated-date partition key (native date or the GOE
    string form)."""
    c = F.col(col) if isinstance(col, str) else col
    if granularity not in _DATE_FORMATS:
        raise ValueError(f"bad date granularity: {granularity!r}")
    if as_string:
        return F.date_format(c, _DATE_FORMATS[granularity])
    return F.date_trunc(_TRUNC_UNITS[granularity], c).cast("date")


def synthetic_number_expr(
    col: Column | str, granularity: int, digits: int | None = None
) -> Column:
    """C5: FLOOR(col/g)*g numeric range bucket; zero-padded string
    when digits is set."""
    c = F.col(col) if isinstance(col, str) else col
    if granularity <= 0:
        raise ValueError("numeric granularity must be positive")
    bucket = (F.floor(c / granularity) * granularity).cast("long")
    if digits is not None:
        return F.lpad(bucket.cast("string"), digits, "0")
    return bucket


def synthetic_string_expr(col: Column | str, granularity: int) -> Column:
    """C6: SUBSTR(col, 1, g) prefix bucket."""
    c = F.col(col) if isinstance(col, str) else col
    if granularity <= 0:
        raise ValueError("string granularity must be positive")
    return F.substring(c, 1, granularity)


# --- Python literal twin (C8) ---------------------------------------------


def synthetic_date_literal(
    value: _dt.date | _dt.datetime, granularity: str, as_string: bool = True
):
    if granularity == GRANULARITY_YEAR:
        truncated = _dt.date(value.year, 1, 1)
        s = f"{value.year:04d}"
    elif granularity == GRANULARITY_MONTH:
        truncated = _dt.date(value.year, value.month, 1)
        s = f"{value.year:04d}-{value.month:02d}"
    elif granularity == GRANULARITY_DAY:
        truncated = _dt.date(value.year, value.month, value.day)
        s = f"{value.year:04d}-{value.month:02d}-{value.day:02d}"
    else:
        raise ValueError(f"bad date granularity: {granularity!r}")
    return s if as_string else truncated


def synthetic_number_literal(
    value, granularity: int, digits: int | None = None
):
    if granularity <= 0:
        raise ValueError("numeric granularity must be positive")
    d = decimal.Decimal(str(value))
    bucket = int((d / granularity).to_integral_value(rounding=decimal.ROUND_FLOOR)) * granularity
    if digits is not None:
        # LPAD semantics (pad straight over a leading minus sign),
        # matching the SQL expression — the reference's literal twin
        # does the same (synthetic_partition_literal.py:148-157).
        return "{:0>{width}}".format(str(bucket), width=digits)
    return bucket


def synthetic_string_literal(value: str, granularity: int) -> str:
    if granularity <= 0:
        raise ValueError("string granularity must be positive")
    return value[:granularity]
