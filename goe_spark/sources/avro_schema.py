"""Avro staging schema generation — the S10 positive path.

The reference's default staging format is Avro: it maps every
canonical column onto Avro's 7 primitive staging types, renames
columns whose names Avro can't carry, and emits a record schema JSON
the load table is defined over (semantics rebuilt from
src/goe/offload/staging/avro/avro_staging_file.py:118-291 and
column_metadata.py:138-140,588-595 — mapping rules only, independent
implementation).

The sandbox has no spark-avro jar, so the WRITE stays behind the
capability gate in `sources/files.py`; everything up to the write —
the type map, the name simplification, the schema JSON, and the
Spark-side staging projection that produces exactly the shape the
schema declares — is pure Python / DataFrame code and fully
exercised. When the jar IS present, `write_avro_staging` passes the
generated JSON via the `avroSchema` writer option, so the on-disk
schema is the declared one, not an inferred one.

Mapping rules (canonical → Avro):
- all strings → string (safe)
- BINARY/LARGE_BINARY → string when staging base64, else bytes (safe)
- INTEGER_1/2/4 → int IF the source mapping was safe, else string
- INTEGER_8 → long IF safe, else string
- INTEGER_38, DECIMAL → string (always; Avro has no 38-digit type)
- FLOAT → float IF safe, else string; DOUBLE → double IF safe else string
- DATE/TIME/TIMESTAMP/TIMESTAMP_TZ/INTERVAL_* → string (parsed by the
  final-load cast map, functions/casts.py)
- BOOLEAN → boolean (safe)

Name rule: staging formats reject ' ', '-', '#' in field names; such
columns stage as GOE_SPECIAL_CHAR_COLUMN_<position>.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from goe_spark.types import canonical as C
from goe_spark.types.canonical import CanonicalColumn, is_safe_mapping

AVRO_STRING = "string"
AVRO_BYTES = "bytes"
AVRO_INT = "int"
AVRO_LONG = "long"
AVRO_FLOAT = "float"
AVRO_DOUBLE = "double"
AVRO_BOOLEAN = "boolean"

AVRO_TYPES = (
    AVRO_STRING,
    AVRO_BYTES,
    AVRO_INT,
    AVRO_LONG,
    AVRO_FLOAT,
    AVRO_DOUBLE,
    AVRO_BOOLEAN,
)

# Characters Avro/staging field names cannot carry, and the rename
# token used instead (reference column_metadata.py:138-140).
UNSUPPORTED_NAME_CHARS = (" ", "-", "#")
SIMPLIFIED_NAME_TOKEN = "GOE_SPECIAL_CHAR_COLUMN"


@dataclass(frozen=True)
class StagingAvroColumn:
    """One field of the Avro staging record."""

    name: str  # original (frontend) column name
    staging_name: str  # field name in the staging file
    avro_type: str
    nullable: bool
    safe_mapping: bool | None


def staging_column_name(name: str, position: int) -> str:
    """Simplified staging field name when the real name contains
    characters staging formats reject."""
    if any(ch in name for ch in UNSUPPORTED_NAME_CHARS):
        return f"{SIMPLIFIED_NAME_TOKEN}_{position}"
    return name


def from_canonical(
    col: CanonicalColumn, position: int, binary_as_base64: bool = True
) -> StagingAvroColumn:
    """Canonical column → Avro staging column (the 7-type map)."""
    t = col.data_type
    safe = col.safe_mapping

    def mk(avro_type: str, safe_mapping: bool) -> StagingAvroColumn:
        return StagingAvroColumn(
            name=col.name,
            staging_name=staging_column_name(col.name, position),
            avro_type=avro_type,
            nullable=col.nullable,
            safe_mapping=is_safe_mapping(safe, safe_mapping),
        )

    if t in (C.FIXED_STRING, C.LARGE_STRING, C.VARIABLE_STRING):
        return mk(AVRO_STRING, True)
    if t in (C.BINARY, C.LARGE_BINARY):
        return mk(AVRO_STRING if binary_as_base64 else AVRO_BYTES, True)
    if t in (C.INTEGER_1, C.INTEGER_2, C.INTEGER_4):
        return mk(AVRO_INT, True) if safe else mk(AVRO_STRING, False)
    if t == C.INTEGER_8:
        return mk(AVRO_LONG, True) if safe else mk(AVRO_STRING, False)
    if t in (C.INTEGER_38, C.DECIMAL):
        return mk(AVRO_STRING, False)
    if t == C.FLOAT:
        return mk(AVRO_FLOAT, True) if safe else mk(AVRO_STRING, False)
    if t == C.DOUBLE:
        return mk(AVRO_DOUBLE, True) if safe else mk(AVRO_STRING, False)
    if t in (C.DATE, C.TIME, C.TIMESTAMP, C.TIMESTAMP_TZ, C.INTERVAL_DS, C.INTERVAL_YM):
        return mk(AVRO_STRING, False)
    if t == C.BOOLEAN:
        return mk(AVRO_BOOLEAN, True)
    raise NotImplementedError(f"unsupported canonical type: {t}")


def to_canonical(
    col: StagingAvroColumn, binary_as_base64: bool = True
) -> CanonicalColumn:
    """Avro staging column → the canonical shape the staged DATA has
    (many columns widen to VARIABLE_STRING — they re-narrow at final
    load via the cast map)."""
    reverse = {
        AVRO_BOOLEAN: C.BOOLEAN,
        AVRO_BYTES: C.VARIABLE_STRING if binary_as_base64 else C.BINARY,
        AVRO_DOUBLE: C.DOUBLE,
        AVRO_FLOAT: C.FLOAT,
        AVRO_INT: C.INTEGER_4,
        AVRO_LONG: C.INTEGER_8,
        AVRO_STRING: C.VARIABLE_STRING,
    }
    if col.avro_type not in reverse:
        raise NotImplementedError(f"unsupported Avro type: {col.avro_type}")
    return CanonicalColumn(
        name=col.staging_name,
        data_type=reverse[col.avro_type],
        nullable=col.nullable,
        safe_mapping=col.safe_mapping,
    )


def staging_columns(
    columns: list[CanonicalColumn], binary_as_base64: bool = True
) -> list[StagingAvroColumn]:
    return [
        from_canonical(col, pos, binary_as_base64)
        for pos, col in enumerate(columns)
    ]


def avro_schema(
    load_db: str,
    table: str,
    columns: list[CanonicalColumn],
    binary_as_base64: bool = True,
) -> dict:
    """The staging record schema as a dict — nullable fields are the
    union [type, "null"], the record is named after the load table."""
    fields = []
    for sc in staging_columns(columns, binary_as_base64):
        ftype = [sc.avro_type, "null"] if sc.nullable else sc.avro_type
        fields.append({"name": sc.staging_name, "type": ftype})
    return {
        "type": "record",
        "name": table,
        "namespace": load_db,
        "fields": fields,
        "tableName": f"{load_db}.{table}",
    }


def avro_schema_json(
    load_db: str,
    table: str,
    columns: list[CanonicalColumn],
    binary_as_base64: bool = True,
) -> str:
    return json.dumps(
        avro_schema(load_db, table, columns, binary_as_base64), indent=2
    )


def avro_staging_expr(
    col: CanonicalColumn, sc: StagingAvroColumn, binary_as_base64: bool = True
) -> Column:
    """Spark projection for one column into its Avro staging shape —
    renames to the staging field name and casts to the exact Spark
    type the Avro field carries. Binary columns honor the base64 rule
    (functions/casts.py stages base64 text the final load decodes)."""
    c = F.col(col.name)
    if col.data_type in (C.BINARY, C.LARGE_BINARY) and binary_as_base64:
        return F.base64(c).alias(sc.staging_name)
    if col.data_type == C.DATE:
        return F.date_format(c, "yyyy-MM-dd").alias(sc.staging_name)
    if col.data_type in (C.TIMESTAMP, C.TIMESTAMP_TZ):
        return F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            sc.staging_name
        )
    spark_type = {
        AVRO_STRING: "string",
        AVRO_BYTES: "binary",
        AVRO_INT: "int",
        AVRO_LONG: "bigint",
        AVRO_FLOAT: "float",
        AVRO_DOUBLE: "double",
        AVRO_BOOLEAN: "boolean",
    }[sc.avro_type]
    return c.cast(spark_type).alias(sc.staging_name)


def avro_staging_projection(
    df: DataFrame,
    columns: list[CanonicalColumn],
    binary_as_base64: bool = True,
) -> DataFrame:
    """Project a DataFrame into exactly the shape `avro_schema`
    declares (field names and Spark-type equivalents) — the map-side
    step before the staging write. Pure column expressions: stays in
    whole-stage codegen, no shuffle."""
    scs = staging_columns(columns, binary_as_base64)
    return df.select(
        *[
            avro_staging_expr(col, sc, binary_as_base64)
            for col, sc in zip(columns, scs)
        ]
    )


def write_avro_staging(
    df: DataFrame,
    path: str,
    load_db: str,
    table: str,
    columns: list[CanonicalColumn],
    binary_as_base64: bool = True,
    mode: str = "overwrite",
) -> str:
    """Stage to Avro with the DECLARED schema (not an inferred one).
    Returns the schema JSON. Requires the spark-avro jar — callers
    behind the capability gate (`sources/files.avro_available`) reach
    here only when the datasource exists."""
    from goe_spark.sources.files import avro_available

    schema_json = avro_schema_json(load_db, table, columns, binary_as_base64)
    if not avro_available(df.sparkSession):
        from goe_spark.plans.offload import OffloadValidationError

        raise OffloadValidationError(
            "avro staging requires the spark-avro datasource "
            "(package org.apache.spark:spark-avro); schema was "
            "generated but the write cannot proceed"
        )
    projected = avro_staging_projection(df, columns, binary_as_base64)
    (
        projected.write.mode(mode)
        .format("avro")
        .option("avroSchema", schema_json)
        .save(path)
    )  # pragma: no cover - needs the external jar
    return schema_json
