"""Targeted row deletion over an offloaded parquet target — the
right-to-be-forgotten / takedown operation every training-data store
eventually needs (and the lakehouse DELETE the reference delegates to
its warehouse backend).

Spark-first shape: deletion is two phases. Phase 1 finds the
partitions that contain any doomed key — one scan with the key set
broadcast into the filter, returning only distinct partition values
(driver-bounded: one row per affected partition). Phase 2 rewrites
ONLY those partition directories with the key anti-filter, reusing
compaction's marker-driven crash-safe swap, so untouched partitions
stay byte-identical. At 100 TB a delete of k keys costs O(affected
partitions), not a table rewrite — and affected-partition count is
bounded by k.

Crash safety is compaction's: temp dir -> marker -> swap -> unmark,
healed on the next run. A crash between phase 2 partitions resumes by
re-running the delete (already-rewritten partitions simply match no
keys on the second pass).
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


@dataclass
class DeleteReport:
    partitions_affected: int = 0
    partitions_healed: int = 0
    rows_deleted: int = 0
    details: list = field(default_factory=list)  # (partition, deleted)


def delete_rows(
    spark: SparkSession,
    path: str,
    key_column: str,
    keys: list | DataFrame,
    partition_col: str = "goe_part_key",
) -> DeleteReport:
    """Delete every row whose ``key_column`` is in ``keys`` from the
    partitioned parquet table at ``path``.

    ``keys`` is a Python list (small takedown lists) or a DataFrame
    with a single ``key_column`` column (large removal sets — joined
    with broadcast if small enough, shuffled otherwise; Spark's AQE
    decides)."""
    report = DeleteReport()
    report.partitions_healed = len(heal_interrupted_swaps(path))

    table = spark.read.option("basePath", path).parquet(path)
    if partition_col not in table.columns:
        raise ValueError(
            f"{path} is not partitioned by {partition_col!r}; targeted "
            "delete needs the partition layout to bound the rewrite"
        )

    if isinstance(keys, DataFrame):
        matches = table.join(
            keys.select(F.col(key_column)).distinct(), key_column, "left_semi"
        )
    else:
        matches = table.where(F.col(key_column).isin(list(keys)))

    affected = [
        r[0]
        for r in matches.select(partition_col).distinct().collect()
        if r[0] is not None
    ]

    for pval in sorted(affected, key=str):
        d = f"{partition_col}={pval}"
        full = os.path.join(path, d)
        if not os.path.isdir(full):  # pragma: no cover - defensive
            continue
        old_files = _data_files(full)
        part_df = spark.read.parquet(full)
        n_before = part_df.count()
        if isinstance(keys, DataFrame):
            kept = part_df.join(
                keys.select(F.col(key_column)).distinct(),
                key_column,
                "left_anti",
            )
        else:
            kept = part_df.where(~F.col(key_column).isin(list(keys)))
        tmp = _tmp_dir(path, d)
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        kept.write.mode("overwrite").parquet(tmp)
        n_after = spark.read.parquet(tmp).count()
        if n_after >= n_before:
            # The phase-1 match said this partition holds doomed rows;
            # a no-op rewrite means the two scans disagreed — abort
            # rather than swap files for nothing.
            shutil.rmtree(tmp)
            if n_after == n_before:
                continue
            raise RuntimeError(  # pragma: no cover - defensive
                f"delete grew partition {d}: {n_before} -> {n_after}"
            )
        atomic_write_json(
            _marker_path(path, d), {"partition": d, "old_files": old_files}
        )
        _complete_swap(path, d, old_files)
        report.partitions_affected += 1
        report.rows_deleted += n_before - n_after
        report.details.append((d, n_before - n_after))
    return report
