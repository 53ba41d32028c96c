"""Canonical type system — the engine-neutral column model.

Rebuilt from the reference semantics (not code):
- 20 canonical types: /root/reference/src/goe/offload/column_metadata.py:38-80
- safe_mapping monotonicity (an unsafe mapping can never be overridden
  back to safe): column_metadata.py:194-205
- integral classification of decimals by precision:
  offload_source_table.py:268-290
- partition info attached to a column: column_metadata.py:311-386
"""

from __future__ import annotations

from dataclasses import dataclass, field

# --- canonical type names -------------------------------------------------

FIXED_STRING = "FIXED_STRING"
LARGE_STRING = "LARGE_STRING"
VARIABLE_STRING = "VARIABLE_STRING"
BINARY = "BINARY"
LARGE_BINARY = "LARGE_BINARY"
INTEGER_1 = "INTEGER_1"
INTEGER_2 = "INTEGER_2"
INTEGER_4 = "INTEGER_4"
INTEGER_8 = "INTEGER_8"
INTEGER_38 = "INTEGER_38"
DECIMAL = "DECIMAL"
FLOAT = "FLOAT"
DOUBLE = "DOUBLE"
DATE = "DATE"
TIME = "TIME"
TIMESTAMP = "TIMESTAMP"
TIMESTAMP_TZ = "TIMESTAMP_TZ"
INTERVAL_DS = "INTERVAL_DS"
INTERVAL_YM = "INTERVAL_YM"
BOOLEAN = "BOOLEAN"

CANONICAL_TYPES = (
    FIXED_STRING,
    LARGE_STRING,
    VARIABLE_STRING,
    BINARY,
    LARGE_BINARY,
    INTEGER_1,
    INTEGER_2,
    INTEGER_4,
    INTEGER_8,
    INTEGER_38,
    DECIMAL,
    FLOAT,
    DOUBLE,
    DATE,
    TIME,
    TIMESTAMP,
    TIMESTAMP_TZ,
    INTERVAL_DS,
    INTERVAL_YM,
    BOOLEAN,
)

NUMERIC_TYPES = (
    INTEGER_1,
    INTEGER_2,
    INTEGER_4,
    INTEGER_8,
    INTEGER_38,
    DECIMAL,
    FLOAT,
    DOUBLE,
)
STRING_TYPES = (FIXED_STRING, LARGE_STRING, VARIABLE_STRING)
DATE_TYPES = (DATE, TIME, TIMESTAMP, TIMESTAMP_TZ)

MAX_SUPPORTED_PRECISION = 38
MAX_SUPPORTED_SCALE = 38

# char_semantics values (column_metadata.py:126-128)
CHAR_SEMANTICS_BYTE = "BYTE"
CHAR_SEMANTICS_CHAR = "CHAR"
CHAR_SEMANTICS_UNICODE = "UNICODE"


@dataclass
class ColumnPartitionInfo:
    """Partition metadata attached to a column
    (column_metadata.py:311-386): position in the partition key,
    the source column a synthetic column derives from, granularity
    (e.g. 'M'/'D'/'Y' for dates, an int for numeric ranges, a prefix
    length for strings), digits for zero-padded numeric strings, an
    optional explicit range, and an optional partition function."""

    position: int = 0
    source_column_name: str | None = None
    granularity: str | int | None = None
    digits: int | None = None
    range_start: object | None = None
    range_end: object | None = None
    function: str | None = None


@dataclass
class CanonicalColumn:
    """Engine-neutral column descriptor (column_metadata.py:598-672)."""

    name: str
    data_type: str
    data_length: int | None = None
    data_precision: int | None = None
    data_scale: int | None = None
    nullable: bool = True
    data_default: object | None = None
    safe_mapping: bool | None = True
    char_length: int | None = None
    char_semantics: str | None = None
    partition_info: ColumnPartitionInfo | None = None
    # Name used in staging files when the real name has characters the
    # staging format can't carry (column_metadata.py:138-140,588-595).
    staging_name: str | None = None
    # True when the type came from a user --<type>-columns control
    # (column_metadata.py:612, from_override).
    from_override: bool = False

    def __post_init__(self) -> None:
        if self.data_type not in CANONICAL_TYPES:
            raise ValueError(f"unknown canonical type: {self.data_type}")

    def is_numeric(self) -> bool:
        return self.data_type in NUMERIC_TYPES

    def is_string(self) -> bool:
        return self.data_type in STRING_TYPES

    def is_date_based(self) -> bool:
        return self.data_type in DATE_TYPES


def is_safe_mapping(prior: bool | None, new: bool | None) -> bool | None:
    """safe_mapping monotonicity (column_metadata.py:194-205):
    - None proposal: keep prior state
    - unsafe proposal: overrides everything
    - safe proposal: only accepted if there was no prior state
    """
    if new is None:
        return prior
    if not new:
        return new
    if new and prior is None:
        return new
    return prior


def frontend_decimal_to_integral_type(
    data_precision: int | None,
    data_scale: int | None,
    safe_mapping: bool = True,
) -> str | None:
    """Classify an integral decimal into the narrowest INTEGER_n
    (offload_source_table.py:268-290). Returns None when the input is
    not integral (scale != 0) or the precision is out of range.

    The 17-18 edge: a sampled (unsafe) precision right at the top of
    INTEGER_8's range is rounded up to INTEGER_38 because the true
    magnitude may exceed what the sample saw.
    """
    if data_scale != 0:
        return None
    p = data_precision or 0
    if 1 <= p <= 2:
        return INTEGER_1
    if 3 <= p <= 4:
        return INTEGER_2
    if 5 <= p <= 9:
        return INTEGER_4
    if 17 <= p <= 18 and not safe_mapping:
        return INTEGER_38
    if 10 <= p <= 18:
        return INTEGER_8
    if 19 <= p <= 38:
        return INTEGER_38
    return None
