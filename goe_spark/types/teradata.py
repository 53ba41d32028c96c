"""Teradata frontend type -> canonical mapping.

Rebuilt from the reference's behavior
(teradata_offload_source_table.py:960-1083, teradata_column.py:30-66;
the reference keys on Teradata's internal 2-char type codes — we key
on the SQL names from its TERADATA_TYPE_TO_SQL_NAME_MAP).

Notable Teradata-specific semantics vs Oracle:
- DATE has NO time component -> canonical DATE (Oracle DATE does and
  maps to TIMESTAMP).
- FLOAT/REAL/DOUBLE PRECISION are all the same 8-byte float -> DOUBLE.
- BLOB/CLOB report a 2 GB catalog length; the reference clamps them
  (8 MiB binary / 16 Mi chars) to fit backend staging types.
- Every INTERVAL x TO y variant collapses to INTERVAL_DS or
  INTERVAL_YM by its leading unit.
"""

from __future__ import annotations

import re

from goe_spark.types import canonical as C

TERADATA_TYPE_BIGINT = "BIGINT"
TERADATA_TYPE_BLOB = "BLOB"
TERADATA_TYPE_BYTE = "BYTE"
TERADATA_TYPE_BYTEINT = "BYTEINT"
TERADATA_TYPE_CHAR = "CHAR"
TERADATA_TYPE_CLOB = "CLOB"
TERADATA_TYPE_DATE = "DATE"
TERADATA_TYPE_DECIMAL = "DECIMAL"
TERADATA_TYPE_DOUBLE = "DOUBLE PRECISION"
TERADATA_TYPE_FLOAT = "FLOAT"
TERADATA_TYPE_INTEGER = "INTEGER"
TERADATA_TYPE_NUMBER = "NUMBER"
TERADATA_TYPE_NUMERIC = "NUMERIC"
TERADATA_TYPE_REAL = "REAL"
TERADATA_TYPE_SMALLINT = "SMALLINT"
TERADATA_TYPE_TIME = "TIME"
TERADATA_TYPE_TIMESTAMP = "TIMESTAMP"
TERADATA_TYPE_TIMESTAMP_TZ = "TIMESTAMP WITH TIME ZONE"
TERADATA_TYPE_VARBYTE = "VARBYTE"
TERADATA_TYPE_VARCHAR = "VARCHAR"

# Catalog lengths the reference clamps for LOBs
# (teradata_offload_source_table.py:1004-1023).
BLOB_STAGED_LENGTH = 8_388_608
CLOB_STAGED_CHAR_LENGTH = 16_777_216

# INTERVAL DAY/HOUR/MINUTE/SECOND [...] -> day-to-second family;
# INTERVAL YEAR/MONTH [...] -> year-to-month family
# (teradata_column.py:43-55 code points YR..SC).
_INTERVAL_DS_RE = re.compile(
    r"^INTERVAL (DAY|HOUR|MINUTE|SECOND)(\(\d+\))?"
    r"( TO (HOUR|MINUTE|SECOND)(\(\d+\))?)?$"
)
_INTERVAL_YM_RE = re.compile(
    r"^INTERVAL (YEAR|MONTH)(\(\d+\))?( TO MONTH)?$"
)
_TS_RE = re.compile(r"^TIMESTAMP(\((\d+)\))?$")
_TSTZ_RE = re.compile(r"^TIMESTAMP(\((\d+)\))? WITH TIME ZONE$")


def teradata_to_canonical(
    name: str,
    teradata_type: str,
    data_length: int | None = None,
    data_precision: int | None = None,
    data_scale: int | None = None,
    nullable: bool = True,
    char_length: int | None = None,
) -> C.CanonicalColumn:
    t = (teradata_type or "").strip().upper()
    kw = dict(name=name, nullable=nullable)

    if t == TERADATA_TYPE_BIGINT:
        return C.CanonicalColumn(data_type=C.INTEGER_8, safe_mapping=True, **kw)
    if t == TERADATA_TYPE_BLOB:
        return C.CanonicalColumn(
            data_type=C.LARGE_BINARY, data_length=BLOB_STAGED_LENGTH, **kw
        )
    if t in (TERADATA_TYPE_BYTE, TERADATA_TYPE_VARBYTE):
        return C.CanonicalColumn(data_type=C.BINARY, data_length=data_length, **kw)
    if t == TERADATA_TYPE_BYTEINT:
        return C.CanonicalColumn(data_type=C.INTEGER_1, safe_mapping=True, **kw)
    if t == TERADATA_TYPE_CHAR:
        return C.CanonicalColumn(
            data_type=C.FIXED_STRING,
            data_length=data_length,
            char_length=char_length,
            safe_mapping=True,
            **kw,
        )
    if t == TERADATA_TYPE_CLOB:
        return C.CanonicalColumn(
            data_type=C.LARGE_STRING,
            data_length=data_length,
            char_length=CLOB_STAGED_CHAR_LENGTH,
            **kw,
        )
    if t == TERADATA_TYPE_DATE:
        # Teradata DATE is date-only — unlike Oracle's.
        return C.CanonicalColumn(data_type=C.DATE, **kw)
    if t in (TERADATA_TYPE_DECIMAL, TERADATA_TYPE_NUMBER, TERADATA_TYPE_NUMERIC):
        integral = C.frontend_decimal_to_integral_type(data_precision, data_scale)
        if integral:
            return C.CanonicalColumn(
                data_type=integral,
                data_precision=data_precision,
                data_scale=0,
                **kw,
            )
        safe = False if (data_precision is None and data_scale is None) else True
        return C.CanonicalColumn(
            data_type=C.DECIMAL,
            data_precision=data_precision,
            data_scale=data_scale,
            safe_mapping=safe,
            **kw,
        )
    if t in (TERADATA_TYPE_DOUBLE, TERADATA_TYPE_FLOAT, TERADATA_TYPE_REAL):
        return C.CanonicalColumn(data_type=C.DOUBLE, safe_mapping=True, **kw)
    if t in (TERADATA_TYPE_INTEGER, "INT"):
        return C.CanonicalColumn(data_type=C.INTEGER_4, safe_mapping=True, **kw)
    if t == TERADATA_TYPE_SMALLINT:
        return C.CanonicalColumn(data_type=C.INTEGER_2, safe_mapping=True, **kw)
    if t.startswith(TERADATA_TYPE_TIME) and not t.startswith("TIMESTAMP"):
        if "WITH TIME ZONE" in t:
            raise NotImplementedError(
                f"unsupported Teradata type: {teradata_type}"
            )  # TIME WITH TIME ZONE is unsupported in the reference too
        return C.CanonicalColumn(
            data_type=C.TIME, data_scale=data_scale, safe_mapping=True, **kw
        )
    if _TS_RE.match(t):
        return C.CanonicalColumn(data_type=C.TIMESTAMP, data_scale=data_scale, **kw)
    if _TSTZ_RE.match(t):
        return C.CanonicalColumn(
            data_type=C.TIMESTAMP_TZ, data_scale=data_scale, **kw
        )
    if _INTERVAL_DS_RE.match(t):
        return C.CanonicalColumn(
            data_type=C.INTERVAL_DS,
            data_precision=data_precision,
            data_scale=data_scale,
            **kw,
        )
    if _INTERVAL_YM_RE.match(t):
        return C.CanonicalColumn(
            data_type=C.INTERVAL_YM,
            data_precision=data_precision,
            data_scale=data_scale,
            **kw,
        )
    if t == TERADATA_TYPE_VARCHAR:
        return C.CanonicalColumn(
            data_type=C.VARIABLE_STRING,
            data_length=data_length,
            char_length=char_length,
            **kw,
        )
    raise NotImplementedError(f"unsupported Teradata type: {teradata_type}")
