"""Small-file compaction for offloaded targets.

Incremental offloads append; every chunk writes its own files into
each partition, so a long-running migration fragments the target
(the classic small-file problem: file-listing latency, tiny row
groups, scan task overhead). The reference leans on the warehouse to
manage storage; a parquet-on-DFS backend has to do it itself.

Spark-first design: selection is metadata-only (file listing, no data
read); only partitions whose file count exceeds the threshold are
rewritten, each with a one-shot coalesced write into a temp location
followed by an atomic-as-possible swap (write temp -> remove old ->
move in). Rewrites are per-partition so restart scope is one
partition, and untouched partitions keep their files byte-identical.
`maxRecordsPerFile` bounds the other direction (files too large).

At 100 TB you run this as a background janitor over partitions the
chunker has finished with (HWM-closed partitions never receive new
appends, so compaction and ingest don't race).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class CompactionReport:
    partitions_scanned: int = 0
    partitions_compacted: int = 0
    files_before: int = 0
    files_after: int = 0
    details: list = field(default_factory=list)  # (partition, before, after)


def _data_files(d: str) -> list[str]:
    return [
        f
        for f in os.listdir(d)
        if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(d, f))
    ]


def compact_partitioned_table(
    spark: SparkSession,
    path: str,
    partition_col: str = "goe_part_key",
    max_files_per_partition: int = 4,
    target_files: int = 1,
) -> CompactionReport:
    """Rewrite every partition directory holding more than
    ``max_files_per_partition`` data files down to ``target_files``.
    Data is bit-stable: the rewrite is a plain read+coalesce+write of
    the same rows (verified by row count before the swap)."""
    report = CompactionReport()
    part_dirs = [
        d
        for d in sorted(os.listdir(path))
        if d.startswith(f"{partition_col}=")
        and os.path.isdir(os.path.join(path, d))
    ]
    for d in part_dirs:
        full = os.path.join(path, d)
        files = _data_files(full)
        report.partitions_scanned += 1
        report.files_before += len(files)
        if len(files) <= max_files_per_partition:
            report.files_after += len(files)
            continue
        df = spark.read.parquet(full)
        n_before = df.count()
        tmp = full + "._compact_tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
        n_after = spark.read.parquet(tmp).count()
        if n_after != n_before:  # pragma: no cover - defensive
            shutil.rmtree(tmp)
            raise RuntimeError(
                f"compaction row mismatch in {d}: {n_before} -> {n_after}"
            )
        # Swap: drop old data files, move compacted ones in. A crash
        # mid-swap loses no data (tmp still holds everything); re-run
        # heals the partition.
        for f in files:
            os.remove(os.path.join(full, f))
        moved = 0
        for f in _data_files(tmp):
            shutil.move(os.path.join(tmp, f), os.path.join(full, f))
            moved += 1
        shutil.rmtree(tmp)
        report.partitions_compacted += 1
        report.files_after += moved
        report.details.append((d, len(files), moved))
    return report
