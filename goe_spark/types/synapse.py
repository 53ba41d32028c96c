"""Canonical -> Azure Synapse backend type mapping.

Rebuilt from the reference's behavior
(synapse_backend_api.py:2606-2780, synapse_constants.py; caps:
max_decimal_precision 38 / max_datetime_scale 7 at
synapse_backend_api.py:2090-2103):

- FIXED_STRING -> CHAR/NCHAR and LARGE/VARIABLE_STRING ->
  VARCHAR/NVARCHAR, the N-variant when the canonical column carries
  UNICODE char semantics,
- BINARY and LARGE_BINARY -> VARBINARY (large drops the length ->
  max),
- INTEGER_1 AND INTEGER_2 -> SMALLINT (Synapse TINYINT is unsigned,
  so the signed canonical INTEGER_1 is promoted), INTEGER_4 -> INT,
  INTEGER_8 -> BIGINT, INTEGER_38 -> NUMERIC(38,0),
- DECIMAL -> NUMERIC(p or 38, s); undecorated -> NUMERIC(38,18),
- FLOAT -> REAL, DOUBLE -> FLOAT (T-SQL naming inversion),
- datetime scales clamp to 7 (100 ns); a canonical scale above 7 is
  an unsafe mapping,
- TIMESTAMP -> DATETIME2, TIMESTAMP_TZ -> DATETIMEOFFSET,
- INTERVALs -> VARCHAR(100), BOOLEAN -> BIT.
"""

from __future__ import annotations

from goe_spark.types import canonical as C
from goe_spark.types.canonical import CanonicalColumn
from goe_spark.types.snowflake import BackendColumn

SYNAPSE_TYPE_BIGINT = "BIGINT"
SYNAPSE_TYPE_BIT = "BIT"
SYNAPSE_TYPE_CHAR = "CHAR"
SYNAPSE_TYPE_DATE = "DATE"
SYNAPSE_TYPE_DATETIME2 = "DATETIME2"
SYNAPSE_TYPE_DATETIMEOFFSET = "DATETIMEOFFSET"
SYNAPSE_TYPE_FLOAT = "FLOAT"
SYNAPSE_TYPE_INT = "INT"
SYNAPSE_TYPE_NCHAR = "NCHAR"
SYNAPSE_TYPE_NUMERIC = "NUMERIC"
SYNAPSE_TYPE_NVARCHAR = "NVARCHAR"
SYNAPSE_TYPE_REAL = "REAL"
SYNAPSE_TYPE_SMALLINT = "SMALLINT"
SYNAPSE_TYPE_TIME = "TIME"
SYNAPSE_TYPE_VARBINARY = "VARBINARY"
SYNAPSE_TYPE_VARCHAR = "VARCHAR"

MAX_DECIMAL_PRECISION = 38
MAX_DATETIME_SCALE = 7
DEFAULT_NUMERIC_SCALE = 18
INTERVAL_LENGTH = 100


def _nchar_or_char(base: str, col: CanonicalColumn) -> str:
    if col.char_semantics == C.CHAR_SEMANTICS_UNICODE:
        return {SYNAPSE_TYPE_CHAR: SYNAPSE_TYPE_NCHAR,
                SYNAPSE_TYPE_VARCHAR: SYNAPSE_TYPE_NVARCHAR}[base]
    return base


def _clamped_scale(col: CanonicalColumn) -> tuple[int | None, bool]:
    safe = bool(col.data_scale is None or col.data_scale <= MAX_DATETIME_SCALE)
    scale = (
        col.data_scale
        if (col.data_scale or 0) < MAX_DATETIME_SCALE
        else MAX_DATETIME_SCALE
    )
    return scale, safe


def canonical_to_synapse(col: CanonicalColumn) -> BackendColumn:
    t = col.data_type
    n = col.name
    if t == C.FIXED_STRING:
        return BackendColumn(
            n,
            _nchar_or_char(SYNAPSE_TYPE_CHAR, col),
            char_length=col.char_length or col.data_length,
            safe_mapping=True,
        )
    if t in (C.LARGE_STRING, C.VARIABLE_STRING):
        return BackendColumn(
            n,
            _nchar_or_char(SYNAPSE_TYPE_VARCHAR, col),
            char_length=col.char_length or col.data_length,
            safe_mapping=True,
        )
    if t == C.BINARY:
        return BackendColumn(
            n, SYNAPSE_TYPE_VARBINARY, data_length=col.data_length
        )
    if t == C.LARGE_BINARY:
        return BackendColumn(n, SYNAPSE_TYPE_VARBINARY, data_length=None)
    if t in (C.INTEGER_1, C.INTEGER_2):
        return BackendColumn(n, SYNAPSE_TYPE_SMALLINT, safe_mapping=True)
    if t == C.INTEGER_4:
        return BackendColumn(n, SYNAPSE_TYPE_INT, safe_mapping=True)
    if t == C.INTEGER_8:
        return BackendColumn(n, SYNAPSE_TYPE_BIGINT, safe_mapping=True)
    if t == C.INTEGER_38:
        return BackendColumn(
            n,
            SYNAPSE_TYPE_NUMERIC,
            data_precision=MAX_DECIMAL_PRECISION,
            data_scale=0,
            safe_mapping=True,
        )
    if t == C.DECIMAL:
        if col.data_precision is None and col.data_scale is None:
            return BackendColumn(
                n,
                SYNAPSE_TYPE_NUMERIC,
                data_precision=MAX_DECIMAL_PRECISION,
                data_scale=DEFAULT_NUMERIC_SCALE,
                safe_mapping=col.safe_mapping,
            )
        return BackendColumn(
            n,
            SYNAPSE_TYPE_NUMERIC,
            data_precision=col.data_precision or MAX_DECIMAL_PRECISION,
            data_scale=col.data_scale,
            safe_mapping=True,
        )
    if t == C.DATE:
        return BackendColumn(n, SYNAPSE_TYPE_DATE, safe_mapping=True)
    if t == C.FLOAT:
        return BackendColumn(n, SYNAPSE_TYPE_REAL)
    if t == C.DOUBLE:
        return BackendColumn(n, SYNAPSE_TYPE_FLOAT)
    if t == C.TIME:
        scale, safe = _clamped_scale(col)
        return BackendColumn(
            n, SYNAPSE_TYPE_TIME, data_scale=scale, safe_mapping=safe
        )
    if t == C.TIMESTAMP:
        scale, safe = _clamped_scale(col)
        return BackendColumn(
            n, SYNAPSE_TYPE_DATETIME2, data_scale=scale, safe_mapping=safe
        )
    if t == C.TIMESTAMP_TZ:
        scale, safe = _clamped_scale(col)
        return BackendColumn(
            n, SYNAPSE_TYPE_DATETIMEOFFSET, data_scale=scale, safe_mapping=safe
        )
    if t in (C.INTERVAL_DS, C.INTERVAL_YM):
        return BackendColumn(
            n, SYNAPSE_TYPE_VARCHAR, data_length=INTERVAL_LENGTH
        )
    if t == C.BOOLEAN:
        return BackendColumn(n, SYNAPSE_TYPE_BIT)
    raise NotImplementedError(f"unsupported canonical type: {t}")
