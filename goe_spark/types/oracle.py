"""Oracle frontend type -> canonical mapping.

Rebuilt from the reference's behavior
(oracle_offload_source_table.py:1335-1473, oracle_column.py:34-55):

- CHAR/NCHAR -> FIXED_STRING (N-types force UNICODE char semantics)
- CLOB/NCLOB/LONG/XMLTYPE -> LARGE_STRING
- VARCHAR2/NVARCHAR2 -> VARIABLE_STRING
- RAW -> BINARY; BLOB/LONG RAW -> LARGE_BINARY
- FLOAT -> DECIMAL with precision wiped, UNSAFE (Oracle FLOAT
  precision is in binary digits, not decimal)
- NUMBER(p,s) edge cases: scale > precision => precision = scale;
  negative scale => scale 0; integral NUMBERs narrowed to INTEGER_n;
  bare NUMBER (no p, no s) => DECIMAL, UNSAFE
- BINARY_FLOAT -> FLOAT; BINARY_DOUBLE -> DOUBLE
- DATE -> TIMESTAMP (Oracle DATE carries a time component)
- TIMESTAMP -> TIMESTAMP; TIMESTAMP WITH (LOCAL) TIME ZONE -> TIMESTAMP_TZ
- INTERVAL DAY TO SECOND / YEAR TO MONTH -> INTERVAL_DS / INTERVAL_YM
"""

from __future__ import annotations

import re

from goe_spark.types import canonical as C

# Oracle type names (normalized upper-case).
ORACLE_TYPE_CHAR = "CHAR"
ORACLE_TYPE_NCHAR = "NCHAR"
ORACLE_TYPE_CLOB = "CLOB"
ORACLE_TYPE_NCLOB = "NCLOB"
ORACLE_TYPE_LONG = "LONG"
ORACLE_TYPE_VARCHAR = "VARCHAR"
ORACLE_TYPE_VARCHAR2 = "VARCHAR2"
ORACLE_TYPE_NVARCHAR2 = "NVARCHAR2"
ORACLE_TYPE_RAW = "RAW"
ORACLE_TYPE_BLOB = "BLOB"
ORACLE_TYPE_LONG_RAW = "LONG RAW"
ORACLE_TYPE_NUMBER = "NUMBER"
ORACLE_TYPE_FLOAT = "FLOAT"
ORACLE_TYPE_BINARY_FLOAT = "BINARY_FLOAT"
ORACLE_TYPE_BINARY_DOUBLE = "BINARY_DOUBLE"
ORACLE_TYPE_DATE = "DATE"
ORACLE_TYPE_TIMESTAMP = "TIMESTAMP"
ORACLE_TYPE_TIMESTAMP_TZ = "TIMESTAMP WITH TIME ZONE"
ORACLE_TYPE_TIMESTAMP_LOCAL_TZ = "TIMESTAMP WITH LOCAL TIME ZONE"
ORACLE_TYPE_INTERVAL_DS = "INTERVAL DAY TO SECOND"
ORACLE_TYPE_INTERVAL_YM = "INTERVAL YEAR TO MONTH"
ORACLE_TYPE_XMLTYPE = "XMLTYPE"

_TS_RE = re.compile(r"^TIMESTAMP(\((\d+)\))?$")
_TSTZ_RE = re.compile(r"^TIMESTAMP(\((\d+)\))? WITH TIME ZONE$")
_TSLTZ_RE = re.compile(r"^TIMESTAMP(\((\d+)\))? WITH LOCAL TIME ZONE$")
_INTERVAL_DS_RE = re.compile(r"^INTERVAL DAY(\(\d+\))? TO SECOND(\(\d+\))?$")
_INTERVAL_YM_RE = re.compile(r"^INTERVAL YEAR(\(\d+\))? TO MONTH$")


def oracle_to_canonical(
    name: str,
    oracle_type: str,
    data_length: int | None = None,
    data_precision: int | None = None,
    data_scale: int | None = None,
    nullable: bool = True,
    char_length: int | None = None,
    char_used: str | None = None,  # 'B' or 'C' from the Oracle catalog
) -> C.CanonicalColumn:
    t = (oracle_type or "").strip().upper()
    kw = dict(
        name=name,
        data_length=data_length,
        nullable=nullable,
        char_length=char_length,
    )
    char_semantics = (
        C.CHAR_SEMANTICS_CHAR if char_used == "C" else C.CHAR_SEMANTICS_BYTE
    )

    if t in (ORACLE_TYPE_CHAR,):
        return C.CanonicalColumn(
            data_type=C.FIXED_STRING, char_semantics=char_semantics, **kw
        )
    if t in (ORACLE_TYPE_NCHAR,):
        return C.CanonicalColumn(
            data_type=C.FIXED_STRING, char_semantics=C.CHAR_SEMANTICS_UNICODE, **kw
        )
    if t in (ORACLE_TYPE_CLOB, ORACLE_TYPE_NCLOB, ORACLE_TYPE_LONG, ORACLE_TYPE_XMLTYPE):
        return C.CanonicalColumn(data_type=C.LARGE_STRING, **kw)
    if t in (ORACLE_TYPE_VARCHAR, ORACLE_TYPE_VARCHAR2):
        return C.CanonicalColumn(
            data_type=C.VARIABLE_STRING, char_semantics=char_semantics, **kw
        )
    if t == ORACLE_TYPE_NVARCHAR2:
        return C.CanonicalColumn(
            data_type=C.VARIABLE_STRING, char_semantics=C.CHAR_SEMANTICS_UNICODE, **kw
        )
    if t == ORACLE_TYPE_RAW:
        return C.CanonicalColumn(data_type=C.BINARY, **kw)
    if t in (ORACLE_TYPE_BLOB, ORACLE_TYPE_LONG_RAW):
        return C.CanonicalColumn(data_type=C.LARGE_BINARY, **kw)
    if t == ORACLE_TYPE_FLOAT:
        # Oracle FLOAT precision counts binary digits — unusable as a
        # decimal precision. Wipe it and mark unsafe.
        return C.CanonicalColumn(
            data_type=C.DECIMAL,
            data_precision=None,
            data_scale=data_scale,
            safe_mapping=False,
            **kw,
        )
    if t == ORACLE_TYPE_NUMBER:
        return _number_to_canonical(kw, data_precision, data_scale)
    if t == ORACLE_TYPE_BINARY_FLOAT:
        return C.CanonicalColumn(data_type=C.FLOAT, **kw)
    if t == ORACLE_TYPE_BINARY_DOUBLE:
        return C.CanonicalColumn(data_type=C.DOUBLE, **kw)
    if t == ORACLE_TYPE_DATE:
        # Oracle DATE has a time element -> canonical TIMESTAMP.
        return C.CanonicalColumn(data_type=C.TIMESTAMP, **kw)
    if _TS_RE.match(t):
        return C.CanonicalColumn(data_type=C.TIMESTAMP, **kw)
    if _TSTZ_RE.match(t) or _TSLTZ_RE.match(t):
        return C.CanonicalColumn(data_type=C.TIMESTAMP_TZ, **kw)
    if _INTERVAL_DS_RE.match(t):
        return C.CanonicalColumn(data_type=C.INTERVAL_DS, **kw)
    if _INTERVAL_YM_RE.match(t):
        return C.CanonicalColumn(data_type=C.INTERVAL_YM, **kw)
    raise NotImplementedError(f"unsupported Oracle type: {oracle_type}")


def _number_to_canonical(
    kw: dict, data_precision: int | None, data_scale: int | None
) -> C.CanonicalColumn:
    p, s = data_precision, data_scale
    if p is not None and s is not None:
        if s > p:
            # e.g. NUMBER(3,5): values like 0.00123 — treat precision
            # as scale.
            p = s
        elif s < 0:
            # e.g. NUMBER(10,-5): rounds to powers of ten — scale 0.
            s = 0
    integral = C.frontend_decimal_to_integral_type(p, s)
    if integral:
        return C.CanonicalColumn(
            data_type=integral, data_precision=p, data_scale=0, **kw
        )
    # Bare NUMBER (no precision, no scale) is unbounded — unsafe.
    safe = False if (p is None and s is None) else True
    return C.CanonicalColumn(
        data_type=C.DECIMAL,
        data_precision=p,
        data_scale=s,
        safe_mapping=safe,
        **kw,
    )
