"""Schema evolution: frontend column adds → backend ALTER TABLE (O7).

Reference behavior (schema_sync_analyzer.py:276-361): diff the
frontend catalog against the backend table, support ONLY additive
evolution (new columns; drops/renames/retypes are refused), generate
``ALTER TABLE ... ADD COLUMNS`` plus a metadata refresh.

Spark-rebuild: the diff runs on StructTypes through the canonical
layer (new frontend columns map frontend→canonical→Spark before the
DDL is rendered), and the ALTER is plain Spark SQL — works on
catalog parquet tables and on Delta (which also honors
mergeSchema-style evolution on write).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql.types import StructField, StructType


class SchemaSyncError(ValueError):
    pass


@dataclass(frozen=True)
class SchemaDelta:
    new_columns: tuple[StructField, ...]
    dropped_columns: tuple[str, ...]
    retyped_columns: tuple[str, ...]

    @property
    def is_additive(self) -> bool:
        return not self.dropped_columns and not self.retyped_columns


def diff_schemas(frontend: StructType, backend: StructType) -> SchemaDelta:
    """What changed frontend-side relative to the backend table.

    Name matching is case-insensitive (both systems fold identifiers);
    type comparison is on the Spark type the canonical mapping
    produced, so a benign precision widening upstream shows up as a
    retype and is refused rather than silently corrupting.
    """
    back = {f.name.lower(): f for f in backend.fields}
    front = {f.name.lower(): f for f in frontend.fields}
    new = tuple(f for n, f in front.items() if n not in back)
    dropped = tuple(n for n in back if n not in front)
    retyped = tuple(
        n
        for n, f in front.items()
        if n in back and back[n].dataType != f.dataType
    )
    return SchemaDelta(new, dropped, retyped)


def schema_sync_ddl(table: str, delta: SchemaDelta) -> list[str]:
    """Render the ALTER statements for an additive delta.

    New column names go through the Spark identifier rules
    (types/identifiers.py): case-folded to the metastore's lower
    case, length/charset-validated, and backtick-enclosed in the
    rendered DDL so a frontend name that needs quoting cannot produce
    a broken ALTER."""
    from goe_spark.types.identifiers import (
        backend_safe_identifier,
        enclose_identifier,
        rules_for,
    )

    if not delta.is_additive:
        raise SchemaSyncError(
            "only additive evolution is supported: "
            f"dropped={list(delta.dropped_columns)} "
            f"retyped={list(delta.retyped_columns)}"
        )
    if not delta.new_columns:
        return []
    rules = rules_for("spark")
    cols = ", ".join(
        f"{enclose_identifier(backend_safe_identifier(f.name, 'spark', 'column'), rules)}"
        f" {f.dataType.simpleString()}"
        for f in delta.new_columns
    )
    return [f"ALTER TABLE {table} ADD COLUMNS ({cols})"]


def sync_table_schema(
    spark: SparkSession,
    table: str,
    frontend: StructType,
) -> SchemaDelta:
    """Diff the live backend table against the frontend schema and
    apply additive DDL. Returns the delta (empty delta = no-op)."""
    backend = spark.table(table).schema
    delta = diff_schemas(frontend, backend)
    for ddl in schema_sync_ddl(table, delta):
        spark.sql(ddl)
    return delta
