"""Canonical -> Hive / Impala backend type mappings.

Rebuilt from the reference's behavior
(hadoop_backend_api.py:1639-1770 with the Impala overrides at
impala_backend_api.py:460-493,225-228; UDF decimal alignment at
hadoop_backend_api.py:259-302):

- every string family -> STRING (Hadoop strings are unbounded),
- BINARY/LARGE_BINARY -> BINARY on Hive but STRING on Impala (Impala
  has no usable binary type),
- the four native integer widths all map to BIGINT unless the
  canonical column came from a user override / staging file
  (``honor_integer_width``), in which case TINYINT/SMALLINT/INT/
  BIGINT are honored,
- INTEGER_38 -> DECIMAL(38,0),
- DECIMAL is aligned to the Hadoop validation UDF family: scale
  rounded up to an even number (precision bumped to keep headroom)
  and precision landed on exactly 18 or 38; the adjusted mapping is
  marked unsafe because values are re-cast at load,
- TIME -> STRING (no Hadoop time-of-day type),
- TIMESTAMP/TIMESTAMP_TZ -> TIMESTAMP, unsafe (tz is dropped),
- DATE -> DATE where supported (Hive; Impala >= 3.3), else TIMESTAMP,
- INTERVALs -> STRING, unsafe.
"""

from __future__ import annotations

from goe_spark.types import canonical as C
from goe_spark.types.canonical import CanonicalColumn
from goe_spark.types.snowflake import BackendColumn

HADOOP_TYPE_STRING = "STRING"
HADOOP_TYPE_BINARY = "BINARY"
HADOOP_TYPE_TINYINT = "TINYINT"
HADOOP_TYPE_SMALLINT = "SMALLINT"
HADOOP_TYPE_INT = "INT"
HADOOP_TYPE_BIGINT = "BIGINT"
HADOOP_TYPE_DECIMAL = "DECIMAL"
HADOOP_TYPE_FLOAT = "FLOAT"
HADOOP_TYPE_DOUBLE = "DOUBLE"
HADOOP_TYPE_DATE = "DATE"
HADOOP_TYPE_TIMESTAMP = "TIMESTAMP"
HADOOP_TYPE_BOOLEAN = "BOOLEAN"

MAX_DECIMAL_PRECISION = 38
DEFAULT_NUMERIC_SCALE = 18

_NARROW_INTEGER = {
    C.INTEGER_1: HADOOP_TYPE_TINYINT,
    C.INTEGER_2: HADOOP_TYPE_SMALLINT,
    C.INTEGER_4: HADOOP_TYPE_INT,
    C.INTEGER_8: HADOOP_TYPE_BIGINT,
}


def align_decimal_to_udfs(
    precision: int | None, scale: int | None
) -> tuple[int, int]:
    """The reference's two-step UDF alignment
    (hadoop_backend_api.py:259-302): even scale, then precision
    landed on 18 or 38."""
    if not precision and not scale:
        return MAX_DECIMAL_PRECISION, DEFAULT_NUMERIC_SCALE
    p, s = precision, scale or 0
    if (p or MAX_DECIMAL_PRECISION) < MAX_DECIMAL_PRECISION:
        if p:
            p += s % 2
        s += s % 2
    p = p or MAX_DECIMAL_PRECISION
    p = max(p, 18) if p < 19 else max(p, MAX_DECIMAL_PRECISION)
    if s > p or p > MAX_DECIMAL_PRECISION:
        raise NotImplementedError(
            f"unsupported precision/scale after UDF alignment: {p}/{s}"
        )
    return p, s


def canonical_to_hive(
    col: CanonicalColumn, honor_integer_width: bool = False
) -> BackendColumn:
    return _to_hadoop(col, binary_type=HADOOP_TYPE_BINARY,
                      date_supported=True,
                      honor_integer_width=honor_integer_width)


def canonical_to_impala(
    col: CanonicalColumn,
    honor_integer_width: bool = False,
    date_supported: bool = False,
) -> BackendColumn:
    # Impala: no binary type; DATE only from 3.3
    # (impala_backend_api.py:225-228,486-489).
    return _to_hadoop(col, binary_type=HADOOP_TYPE_STRING,
                      date_supported=date_supported,
                      honor_integer_width=honor_integer_width)


def _to_hadoop(
    col: CanonicalColumn,
    binary_type: str,
    date_supported: bool,
    honor_integer_width: bool,
) -> BackendColumn:
    t = col.data_type
    n = col.name
    if t in (C.FIXED_STRING, C.LARGE_STRING, C.VARIABLE_STRING):
        return BackendColumn(n, HADOOP_TYPE_STRING, safe_mapping=True)
    if t in (C.BINARY, C.LARGE_BINARY):
        return BackendColumn(n, binary_type, safe_mapping=True)
    if t in _NARROW_INTEGER:
        if honor_integer_width:
            return BackendColumn(n, _NARROW_INTEGER[t], safe_mapping=True)
        # All four native widths widen to BIGINT on Hadoop.
        return BackendColumn(n, HADOOP_TYPE_BIGINT, safe_mapping=True)
    if t == C.INTEGER_38:
        return BackendColumn(
            n,
            HADOOP_TYPE_DECIMAL,
            data_precision=MAX_DECIMAL_PRECISION,
            data_scale=0,
            safe_mapping=True,
        )
    if t == C.DECIMAL:
        p, s = align_decimal_to_udfs(col.data_precision, col.data_scale)
        return BackendColumn(
            n, HADOOP_TYPE_DECIMAL, data_precision=p, data_scale=s,
            safe_mapping=False,
        )
    if t == C.FLOAT:
        return BackendColumn(n, HADOOP_TYPE_FLOAT, safe_mapping=True)
    if t == C.DOUBLE:
        return BackendColumn(n, HADOOP_TYPE_DOUBLE, safe_mapping=True)
    if t == C.DATE:
        if date_supported:
            return BackendColumn(n, HADOOP_TYPE_DATE)
        return BackendColumn(n, HADOOP_TYPE_TIMESTAMP)
    if t == C.TIME:
        return BackendColumn(n, HADOOP_TYPE_STRING, safe_mapping=True)
    if t in (C.TIMESTAMP, C.TIMESTAMP_TZ):
        return BackendColumn(n, HADOOP_TYPE_TIMESTAMP, safe_mapping=False)
    if t in (C.INTERVAL_DS, C.INTERVAL_YM):
        return BackendColumn(n, HADOOP_TYPE_STRING, safe_mapping=False)
    if t == C.BOOLEAN:
        return BackendColumn(n, HADOOP_TYPE_BOOLEAN, safe_mapping=True)
    raise NotImplementedError(f"unsupported canonical type: {t}")
