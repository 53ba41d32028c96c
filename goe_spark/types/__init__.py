"""Canonical (engine-neutral) type system and frontend/backend mappings.

The heart of the reference product (SURVEY.md §1.2-1.5): every column
passes frontend type -> canonical type -> staging type -> backend
type, with a safe_mapping flag that can only ever degrade.
"""

from goe_spark.types.canonical import (  # noqa: F401
    CANONICAL_TYPES,
    CanonicalColumn,
    ColumnPartitionInfo,
    frontend_decimal_to_integral_type,
    is_safe_mapping,
)
