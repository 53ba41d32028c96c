"""Canonical -> BigQuery backend type mapping.

Rebuilt from the reference's behavior
(bigquery_backend_api.py:2344-2503, bigquery_column.py:30-44):
strings -> STRING, binaries -> BYTES, INTEGER_1..8 -> INT64,
INTEGER_38 -> NUMERIC (p<=29) else BIGNUMERIC, DECIMAL -> NUMERIC when
integral magnitude <= 29 and scale <= 9 else BIGNUMERIC (unsafe
mappings get their precision/scale decorators stripped),
FLOAT/DOUBLE -> FLOAT64, DATE -> DATE, TIME -> TIME,
TIMESTAMP -> DATETIME, TIMESTAMP_TZ -> TIMESTAMP (unsafe),
INTERVALs -> STRING (unsafe).
"""

from __future__ import annotations

from dataclasses import dataclass

from goe_spark.types import canonical as C
from goe_spark.types.canonical import CanonicalColumn

BIGQUERY_TYPE_STRING = "STRING"
BIGQUERY_TYPE_BYTES = "BYTES"
BIGQUERY_TYPE_INT64 = "INT64"
BIGQUERY_TYPE_NUMERIC = "NUMERIC"
BIGQUERY_TYPE_BIGNUMERIC = "BIGNUMERIC"
BIGQUERY_TYPE_FLOAT64 = "FLOAT64"
BIGQUERY_TYPE_DATE = "DATE"
BIGQUERY_TYPE_TIME = "TIME"
BIGQUERY_TYPE_DATETIME = "DATETIME"
BIGQUERY_TYPE_TIMESTAMP = "TIMESTAMP"
BIGQUERY_TYPE_BOOLEAN = "BOOLEAN"

MAX_DATETIME_SCALE = 6  # BigQuery DATETIME/TIME carry microseconds.


@dataclass(frozen=True)
class BackendColumn:
    name: str
    backend_type: str
    data_precision: int | None = None
    data_scale: int | None = None
    safe_mapping: bool | None = True


def canonical_to_bigquery(col: CanonicalColumn) -> BackendColumn:
    t = col.data_type
    n = col.name
    if t in (C.FIXED_STRING, C.VARIABLE_STRING, C.LARGE_STRING):
        return BackendColumn(n, BIGQUERY_TYPE_STRING)
    if t in (C.BINARY, C.LARGE_BINARY):
        return BackendColumn(n, BIGQUERY_TYPE_BYTES)
    if t in (C.INTEGER_1, C.INTEGER_2, C.INTEGER_4, C.INTEGER_8):
        return BackendColumn(n, BIGQUERY_TYPE_INT64, safe_mapping=True)
    if t == C.INTEGER_38:
        if col.data_precision and col.data_precision <= 29:
            return BackendColumn(
                n, BIGQUERY_TYPE_NUMERIC, col.data_precision, 0, True
            )
        return BackendColumn(n, BIGQUERY_TYPE_BIGNUMERIC, 38, 0, True)
    if t == C.DECIMAL:
        if col.data_precision is not None:
            integral_magnitude = col.data_precision - (col.data_scale or 0)
        else:
            integral_magnitude = None
        if (
            integral_magnitude
            and integral_magnitude <= 29
            and (col.data_scale or 0) <= 9
        ):
            if not col.safe_mapping:
                # Round an unsafe NUMERIC mapping up to BIGNUMERIC by
                # stripping the decorators.
                return BackendColumn(n, BIGQUERY_TYPE_BIGNUMERIC, None, None, True)
            return BackendColumn(
                n, BIGQUERY_TYPE_NUMERIC, col.data_precision, col.data_scale, True
            )
        if not col.safe_mapping:
            return BackendColumn(n, BIGQUERY_TYPE_BIGNUMERIC, None, None, False)
        return BackendColumn(
            n, BIGQUERY_TYPE_BIGNUMERIC, col.data_precision, col.data_scale, False
        )
    if t in (C.FLOAT, C.DOUBLE):
        return BackendColumn(n, BIGQUERY_TYPE_FLOAT64, safe_mapping=True)
    if t == C.DATE:
        return BackendColumn(n, BIGQUERY_TYPE_DATE)
    if t == C.TIME:
        safe = bool(col.data_scale is None or col.data_scale <= MAX_DATETIME_SCALE)
        return BackendColumn(n, BIGQUERY_TYPE_TIME, safe_mapping=safe)
    if t == C.TIMESTAMP:
        safe = bool(col.data_scale is None or col.data_scale <= MAX_DATETIME_SCALE)
        return BackendColumn(n, BIGQUERY_TYPE_DATETIME, safe_mapping=safe)
    if t == C.TIMESTAMP_TZ:
        return BackendColumn(n, BIGQUERY_TYPE_TIMESTAMP, safe_mapping=False)
    if t in (C.INTERVAL_DS, C.INTERVAL_YM):
        return BackendColumn(n, BIGQUERY_TYPE_STRING, safe_mapping=False)
    if t == C.BOOLEAN:
        return BackendColumn(n, BIGQUERY_TYPE_BOOLEAN)
    raise NotImplementedError(f"unsupported canonical type: {t}")
