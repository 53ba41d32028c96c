"""Offload status report (O8 — offload_status_report.py, 4038 LoC of
catalog SQL + HTML in the reference, reduced to its data core).

One DataFrame: per offloaded table, what the metadata store says
(offload type, HWM, version) joined with what the backend actually
holds (row count, bytes, partition count read from the final-table
files). The reference computed "offloaded vs retained" from two
catalogs; here the retained side is whatever source DataFrame the
caller passes, so the report works for file-backed tests and JDBC
frontends alike.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Row, SparkSession

from goe_spark.plans.metadata import MetadataStore


def _dir_stats(path: str) -> tuple[int, int]:
    """(bytes, file_count) under a final-table path, data files only."""
    total, files = 0, 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            if not n.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, n))
                files += 1
    return total, files


def status_report(
    spark: SparkSession,
    store: MetadataStore,
    table_paths: dict[tuple[str, str], str] | None = None,
) -> DataFrame:
    """Build the report DataFrame from the metadata store.

    ``table_paths`` maps (owner, table) to the backend table location;
    when present the report adds physical row/byte/partition counts
    (one cheap count(*) per table — metadata-only on parquet).
    """
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("owner", StringType()),
            StructField("table_name", StringType()),
            StructField("offload_type", StringType()),
            StructField("incremental_key", StringType()),
            StructField("incremental_high_value", StringType()),
            StructField("n_offloaded_predicates", IntegerType()),
            StructField("offload_version", IntegerType()),
            StructField("updated_utc", StringType()),
            StructField("backend_rows", LongType()),
            StructField("backend_bytes", LongType()),
            StructField("backend_files", LongType()),
        ]
    )
    rows = []
    for owner, table_name in store.list_tables():
        md = store.get(owner, table_name)
        path = (table_paths or {}).get((owner, table_name))
        n_rows = n_bytes = n_files = None
        if path and os.path.exists(path):
            n_rows = spark.read.parquet(path).count()
            n_bytes, n_files = _dir_stats(path)
        rows.append(
            Row(
                owner=owner,
                table_name=table_name,
                offload_type=md.offload_type,
                incremental_key=md.incremental_key,
                incremental_high_value=str(md.incremental_high_value)
                if md.incremental_high_value is not None
                else None,
                n_offloaded_predicates=len(md.offloaded_predicates),
                offload_version=md.offload_version,
                updated_utc=md.updated_utc,
                backend_rows=n_rows,
                backend_bytes=n_bytes,
                backend_files=n_files,
            )
        )
    # Explicit schema always: inference cannot type all-NULL physical
    # stats (no table_paths mapped) or an empty store.
    return spark.createDataFrame(rows, schema)
