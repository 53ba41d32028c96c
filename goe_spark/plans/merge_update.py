"""Keyed merge (upsert) into an offloaded parquet target — the
reference product line's "Incremental Update" capability (changed-row
sync from the frontend after the bulk offload), rebuilt as
delete-then-append.

Semantics: each update row REPLACES the existing row with its key
(wherever it lives — a changed partition-source value moves the row);
keys with no existing row insert. ``updates`` must be unique per key
(a CDC batch with several events per key must be collapsed to the
latest first — enforced, because silently writing every version would
corrupt the keyed table).

Spark-first shape:
- Phase A deletes the existing versions of the updated keys via
  plans/targeted_delete — partition-bounded rewrites behind the
  marker-driven crash-safe swap, affected directories taken from
  input_file_name (exact; no partition-name reconstruction).
- Phase B appends all update rows with
  ``write.partitionBy(partition_col)`` — Spark itself lays out the
  directories (padding, Hive escaping, __HIVE_DEFAULT_PARTITION__ for
  a NULL partition value), so a moved row lands correctly and a brand
  new partition needs no special case.

Crash contract: phase A heals/resumes like any delete. A crash inside
phase B leaves some update rows unwritten (their old versions are
gone) — RE-RUNNING THE SAME MERGE heals: phase A deletes whatever
partial versions landed, phase B re-appends everything. Merge cost is
O(affected partitions) + one partitioned append — never a table
rewrite — and untouched partitions stay byte-identical.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.plans.offload import SYNTHETIC_COL, PartitionSpec
from goe_spark.plans.targeted_delete import delete_rows


@dataclass
class MergeReport:
    partitions_affected: int = 0  # rewritten by the delete phase
    partitions_healed: int = 0
    rows_updated: int = 0
    rows_inserted: int = 0
    details: list = field(default_factory=list)  # (partition, old versions)


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

    # The update set is CDC-sized (small next to the table); land it
    # once so the delete phase and the append see the same rows.
    upd = updates.select(*data_cols).localCheckpoint(eager=True)
    n_rows = upd.count()
    n_keys = upd.select(key_column).distinct().count()
    if n_rows != n_keys:
        raise ValueError(
            f"updates must be unique per {key_column}: {n_rows} rows "
            f"but {n_keys} distinct keys — collapse the CDC batch to "
            "the latest version per key first"
        )

    del_rep = delete_rows(
        spark,
        path,
        key_column,
        upd.select(key_column),
        partition_col=partition_col,
    )

    upd.withColumn(partition_col, partition.expr()).write.mode(
        "append"
    ).partitionBy(partition_col).parquet(path)

    return MergeReport(
        partitions_affected=del_rep.partitions_affected,
        partitions_healed=del_rep.partitions_healed,
        rows_updated=del_rep.rows_deleted,
        rows_inserted=n_rows - del_rep.rows_deleted,
        details=del_rep.details,
    )
