"""Canonical -> Snowflake backend type mapping.

Rebuilt from the reference's behavior
(snowflake_backend_api.py:2119-2243, snowflake_column.py; caps:
max_decimal_precision 38 / max_decimal_scale 37 / max_datetime_scale 9
at snowflake_backend_api.py:1738-1748):

- every string family -> TEXT (char_length carried),
- binaries -> BINARY,
- all INTEGER_n -> NUMBER(p,0) with the canonical magnitude (3, 5,
  10, 19, 38),
- DECIMAL -> NUMBER(p or 38, s); undecorated DECIMAL gets the default
  NUMBER(38,18) "best-fit" column,
- FLOAT/DOUBLE -> FLOAT (Snowflake floats are 8-byte),
- TIMESTAMP -> TIMESTAMP_NTZ, TIMESTAMP_TZ -> TIMESTAMP_TZ (scale
  preserved; Snowflake holds nanoseconds so nothing is clamped),
- INTERVALs -> TEXT, unsafe.
"""

from __future__ import annotations

from dataclasses import dataclass

from goe_spark.types import canonical as C
from goe_spark.types.canonical import CanonicalColumn

SNOWFLAKE_TYPE_BOOLEAN = "BOOLEAN"
SNOWFLAKE_TYPE_TEXT = "TEXT"
SNOWFLAKE_TYPE_BINARY = "BINARY"
SNOWFLAKE_TYPE_DATE = "DATE"
SNOWFLAKE_TYPE_FLOAT = "FLOAT"
SNOWFLAKE_TYPE_NUMBER = "NUMBER"
SNOWFLAKE_TYPE_TIME = "TIME"
SNOWFLAKE_TYPE_TIMESTAMP_NTZ = "TIMESTAMP_NTZ"
SNOWFLAKE_TYPE_TIMESTAMP_TZ = "TIMESTAMP_TZ"

MAX_DECIMAL_PRECISION = 38
MAX_DECIMAL_SCALE = 37
MAX_DATETIME_SCALE = 9
DEFAULT_NUMERIC_SCALE = 18

_INTEGER_MAGNITUDE = {
    C.INTEGER_1: 3,
    C.INTEGER_2: 5,
    C.INTEGER_4: 10,
    C.INTEGER_8: 19,
    C.INTEGER_38: 38,
}


@dataclass(frozen=True)
class BackendColumn:
    name: str
    backend_type: str
    data_length: int | None = None
    char_length: int | None = None
    data_precision: int | None = None
    data_scale: int | None = None
    safe_mapping: bool | None = True


def canonical_to_snowflake(col: CanonicalColumn) -> BackendColumn:
    t = col.data_type
    n = col.name
    if t == C.BOOLEAN:
        return BackendColumn(n, SNOWFLAKE_TYPE_BOOLEAN, safe_mapping=True)
    if t in (C.FIXED_STRING, C.LARGE_STRING, C.VARIABLE_STRING):
        return BackendColumn(
            n,
            SNOWFLAKE_TYPE_TEXT,
            char_length=col.char_length or col.data_length,
            safe_mapping=True,
        )
    if t in (C.BINARY, C.LARGE_BINARY):
        return BackendColumn(
            n, SNOWFLAKE_TYPE_BINARY, data_length=col.data_length
        )
    if t == C.DATE:
        return BackendColumn(n, SNOWFLAKE_TYPE_DATE, safe_mapping=True)
    if t in (C.FLOAT, C.DOUBLE):
        return BackendColumn(n, SNOWFLAKE_TYPE_FLOAT, safe_mapping=True)
    if t in _INTEGER_MAGNITUDE:
        return BackendColumn(
            n,
            SNOWFLAKE_TYPE_NUMBER,
            data_precision=_INTEGER_MAGNITUDE[t],
            data_scale=0,
            safe_mapping=True,
        )
    if t == C.DECIMAL:
        if col.data_precision is None and col.data_scale is None:
            # Best-fit default for undecorated decimals.
            return BackendColumn(
                n,
                SNOWFLAKE_TYPE_NUMBER,
                data_precision=MAX_DECIMAL_PRECISION,
                data_scale=DEFAULT_NUMERIC_SCALE,
                safe_mapping=col.safe_mapping,
            )
        return BackendColumn(
            n,
            SNOWFLAKE_TYPE_NUMBER,
            data_precision=col.data_precision or MAX_DECIMAL_PRECISION,
            data_scale=col.data_scale,
            safe_mapping=True,
        )
    if t == C.TIME:
        return BackendColumn(
            n, SNOWFLAKE_TYPE_TIME, data_scale=col.data_scale, safe_mapping=True
        )
    if t == C.TIMESTAMP:
        return BackendColumn(
            n, SNOWFLAKE_TYPE_TIMESTAMP_NTZ, data_scale=col.data_scale
        )
    if t == C.TIMESTAMP_TZ:
        return BackendColumn(
            n, SNOWFLAKE_TYPE_TIMESTAMP_TZ, data_scale=col.data_scale
        )
    if t in (C.INTERVAL_DS, C.INTERVAL_YM):
        return BackendColumn(n, SNOWFLAKE_TYPE_TEXT, safe_mapping=False)
    raise NotImplementedError(f"unsupported canonical type: {t}")
