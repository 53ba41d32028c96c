"""Keyed merge (upsert) into an offloaded parquet target — the
reference product line's "Incremental Update" capability (changed-row
sync from the frontend after the bulk offload), rebuilt as a
partition-bounded rewrite.

Semantics: for each key in ``updates``, the row replaces the existing
row with that key (wherever it lives — a changed partition-source
value MOVES the row); keys with no existing row insert. Everything
else is untouched.

Spark-first shape, same as targeted_delete: the affected-partition
set is (partitions the updates land in) ∪ (partitions currently
holding an updated key) — both driver-bounded, one row per partition.
Only those partition directories rewrite (anti-join out the old
versions, union in the new), behind compaction's marker-driven
crash-safe swap. Merge cost is O(affected partitions), never a table
rewrite, and untouched partitions stay byte-identical.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.plans.compaction import (
    _complete_swap,
    _data_files,
    _marker_path,
    _tmp_dir,
    heal_interrupted_swaps,
)
from goe_spark.plans.metadata import atomic_write_json
from goe_spark.plans.offload import SYNTHETIC_COL, PartitionSpec


@dataclass
class MergeReport:
    partitions_affected: int = 0
    partitions_healed: int = 0
    rows_updated: int = 0
    rows_inserted: int = 0
    details: list = field(default_factory=list)  # (partition, -old, +new)


def merge_rows(
    spark: SparkSession,
    path: str,
    key_column: str,
    updates: DataFrame,
    partition: PartitionSpec,
    partition_col: str = SYNTHETIC_COL,
) -> MergeReport:
    """Upsert ``updates`` (frontend-shaped rows, no synthetic column)
    into the partitioned parquet table at ``path``."""
    report = MergeReport()
    report.partitions_healed = len(heal_interrupted_swaps(path))

    table = spark.read.option("basePath", path).parquet(path)
    if partition_col not in table.columns:
        raise ValueError(
            f"{path} is not partitioned by {partition_col!r}; merge "
            "needs the partition layout to bound the rewrite"
        )
    data_cols = [c for c in table.columns if c != partition_col]
    missing = [c for c in data_cols if c not in updates.columns]
    if missing:
        raise ValueError(f"updates are missing table columns: {missing}")

    upd = updates.select(*data_cols).withColumn(
        partition_col, partition.expr()
    )
    # The updates set is change-data-capture sized (small next to the
    # table); land it once so the two phase-1 scans and every
    # per-partition join reuse it instead of recomputing lineage.
    upd = upd.localCheckpoint(eager=True)
    keys = upd.select(key_column).distinct()

    # Affected partitions: where updates land + where updated keys
    # currently live (a moved row must leave its old partition).
    landing = {r[0] for r in upd.select(partition_col).distinct().collect()}
    holding = {
        r[0]
        for r in table.join(keys, key_column, "left_semi")
        .select(partition_col)
        .distinct()
        .collect()
        if r[0] is not None
    }

    # Global accounting up front (a row moving partitions is ONE
    # update, not a delete in one partition plus an insert in another).
    n_upd_keys = keys.count()
    report.rows_updated = (
        table.join(keys, key_column, "left_semi")
        .select(key_column)
        .distinct()
        .count()
    )
    report.rows_inserted = n_upd_keys - report.rows_updated

    for pval in sorted(landing | holding, key=str):
        d = f"{partition_col}={pval}"
        full = os.path.join(path, d)
        exists = os.path.isdir(full)
        old_files = _data_files(full) if exists else []
        if exists:
            part_df = spark.read.parquet(full)
            n_before = part_df.count()
            kept = part_df.join(keys, key_column, "left_anti")
        else:
            # A brand-new partition created by inserts.
            n_before = 0
            kept = None
        incoming = upd.where(F.col(partition_col) == F.lit(pval)).drop(
            partition_col
        )
        n_in = incoming.count()
        new_part = (
            kept.unionByName(incoming.select(*kept.columns))
            if kept is not None
            else incoming.select(*data_cols)
        )
        tmp = _tmp_dir(path, d)
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        new_part.write.mode("overwrite").parquet(tmp)
        n_after = spark.read.parquet(tmp).count()
        removed = n_before + n_in - n_after
        if not exists:
            os.makedirs(full, exist_ok=True)
        atomic_write_json(
            _marker_path(path, d), {"partition": d, "old_files": old_files}
        )
        _complete_swap(path, d, old_files)
        report.partitions_affected += 1
        report.details.append((d, removed, n_in))
    return report
