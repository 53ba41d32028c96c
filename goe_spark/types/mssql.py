"""Microsoft SQL Server frontend type -> canonical mapping.

Rebuilt from the reference's behavior
(mssql_offload_source_table.py:542-661, mssql_column.py:28-54).

MSSQL-specific semantics:
- BIT -> BOOLEAN (the only frontend with a native boolean).
- TINYINT maps UP to INTEGER_2: it is unsigned (0..255), so
  INTEGER_1's signed range cannot hold it.
- FLOAT is 8-byte -> DOUBLE; REAL is 4-byte -> FLOAT.
- UNIQUEIDENTIFIER travels as VARIABLE_STRING.
- IMAGE (legacy LOB) maps to BINARY like VARBINARY.
- MONEY/SMALLMONEY are fixed-scale decimals (19,4)/(10,4) and share
  the DECIMAL path.
"""

from __future__ import annotations

from goe_spark.types import canonical as C

MSSQL_TYPE_BIGINT = "BIGINT"
MSSQL_TYPE_BIT = "BIT"
MSSQL_TYPE_DECIMAL = "DECIMAL"
MSSQL_TYPE_INT = "INT"
MSSQL_TYPE_MONEY = "MONEY"
MSSQL_TYPE_NUMERIC = "NUMERIC"
MSSQL_TYPE_SMALLINT = "SMALLINT"
MSSQL_TYPE_SMALLMONEY = "SMALLMONEY"
MSSQL_TYPE_TINYINT = "TINYINT"
MSSQL_TYPE_FLOAT = "FLOAT"
MSSQL_TYPE_REAL = "REAL"
MSSQL_TYPE_DATE = "DATE"
MSSQL_TYPE_DATETIME2 = "DATETIME2"
MSSQL_TYPE_DATETIME = "DATETIME"
MSSQL_TYPE_DATETIMEOFFSET = "DATETIMEOFFSET"
MSSQL_TYPE_SMALLDATETIME = "SMALLDATETIME"
MSSQL_TYPE_TIME = "TIME"
MSSQL_TYPE_CHAR = "CHAR"
MSSQL_TYPE_VARCHAR = "VARCHAR"
MSSQL_TYPE_NCHAR = "NCHAR"
MSSQL_TYPE_NVARCHAR = "NVARCHAR"
MSSQL_TYPE_UNIQUEIDENTIFIER = "UNIQUEIDENTIFIER"
MSSQL_TYPE_TEXT = "TEXT"
MSSQL_TYPE_NTEXT = "NTEXT"
MSSQL_TYPE_BINARY = "BINARY"
MSSQL_TYPE_VARBINARY = "VARBINARY"
MSSQL_TYPE_IMAGE = "IMAGE"


def mssql_to_canonical(
    name: str,
    mssql_type: str,
    data_length: int | None = None,
    data_precision: int | None = None,
    data_scale: int | None = None,
    nullable: bool = True,
    char_length: int | None = None,
) -> C.CanonicalColumn:
    t = (mssql_type or "").strip().upper()
    kw = dict(name=name, nullable=nullable)

    if t == MSSQL_TYPE_BIT:
        return C.CanonicalColumn(data_type=C.BOOLEAN, **kw)
    if t in (MSSQL_TYPE_CHAR, MSSQL_TYPE_NCHAR):
        sem = (
            C.CHAR_SEMANTICS_UNICODE if t == MSSQL_TYPE_NCHAR else None
        )
        return C.CanonicalColumn(
            data_type=C.FIXED_STRING,
            data_length=data_length,
            char_length=char_length,
            char_semantics=sem or C.CHAR_SEMANTICS_BYTE,
            safe_mapping=True,
            **kw,
        )
    if t in (MSSQL_TYPE_TEXT, MSSQL_TYPE_NTEXT):
        return C.CanonicalColumn(data_type=C.LARGE_STRING, **kw)
    if t in (MSSQL_TYPE_VARCHAR, MSSQL_TYPE_NVARCHAR, MSSQL_TYPE_UNIQUEIDENTIFIER):
        return C.CanonicalColumn(
            data_type=C.VARIABLE_STRING,
            data_length=data_length,
            char_length=char_length,
            **kw,
        )
    if t in (MSSQL_TYPE_BINARY, MSSQL_TYPE_VARBINARY, MSSQL_TYPE_IMAGE):
        return C.CanonicalColumn(data_type=C.BINARY, data_length=data_length, **kw)
    if t in (MSSQL_TYPE_TINYINT, MSSQL_TYPE_SMALLINT):
        return C.CanonicalColumn(data_type=C.INTEGER_2, **kw)
    if t == MSSQL_TYPE_INT:
        return C.CanonicalColumn(data_type=C.INTEGER_4, **kw)
    if t == MSSQL_TYPE_BIGINT:
        return C.CanonicalColumn(data_type=C.INTEGER_8, **kw)
    if t == MSSQL_TYPE_FLOAT:
        return C.CanonicalColumn(data_type=C.DOUBLE, **kw)
    if t == MSSQL_TYPE_REAL:
        return C.CanonicalColumn(data_type=C.FLOAT, **kw)
    if t in (
        MSSQL_TYPE_DECIMAL,
        MSSQL_TYPE_NUMERIC,
        MSSQL_TYPE_MONEY,
        MSSQL_TYPE_SMALLMONEY,
    ):
        return _decimal_to_canonical(kw, data_precision, data_scale)
    if t == MSSQL_TYPE_DATE:
        return C.CanonicalColumn(data_type=C.DATE, **kw)
    if t == MSSQL_TYPE_TIME:
        return C.CanonicalColumn(data_type=C.TIME, data_scale=data_scale, **kw)
    if t in (MSSQL_TYPE_SMALLDATETIME, MSSQL_TYPE_DATETIME, MSSQL_TYPE_DATETIME2):
        return C.CanonicalColumn(data_type=C.TIMESTAMP, data_scale=data_scale, **kw)
    if t == MSSQL_TYPE_DATETIMEOFFSET:
        return C.CanonicalColumn(
            data_type=C.TIMESTAMP_TZ, data_scale=data_scale, **kw
        )
    raise NotImplementedError(f"unsupported MSSQL type: {mssql_type}")


def _decimal_to_canonical(
    kw: dict, data_precision: int | None, data_scale: int | None
) -> C.CanonicalColumn:
    p, s = data_precision, data_scale
    if p is not None and s is not None:
        if s > p:
            p = s
        elif s < 0:
            s = 0
    # Precision overflowing the integral ladder (p > 38 at scale 0)
    # returns None here and falls through to the DECIMAL path.
    integral = C.frontend_decimal_to_integral_type(p, s)
    if integral:
        return C.CanonicalColumn(
            data_type=integral, data_precision=p, data_scale=0, **kw
        )
    safe = False if (p is None and s is None) else True
    return C.CanonicalColumn(
        data_type=C.DECIMAL,
        data_precision=p,
        data_scale=s,
        safe_mapping=safe,
        **kw,
    )
