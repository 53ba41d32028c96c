"""O(deleted) maintenance of materialized indexes under targeted
delete — the RTBF path a standing-corpus operator actually runs.

The minhash / segment / IVF indexes are fingerprint-keyed: any change
to the source triggers a FULL rebuild on the next ensure. For appends
that is already solved (append_* computes only the batch); this module
solves the delete side the same way log-structured stores do —
TOMBSTONES:

- ``evict_keys`` appends the doomed keys to ``index_dir/tombstones``
  (one small parquet write, O(deleted)) and re-fingerprints the index
  meta against its post-delete source, so the next ensure_* does NOT
  full-rebuild an index the eviction already fixed.
- every index reader routes through ``apply_tombstones``: a broadcast
  anti-join against the (tiny) tombstone set. Probe results are
  therefore IDENTICAL to a full rebuild over the shrunken corpus —
  per-doc signatures / per-vector assignments are independent rows,
  so dropping a row from the index equals never having indexed it.
  (For IVF the quantizer stays the BUILD's quantizer, exactly the
  contract append_to_index already documents: evict+probe equals
  probing the shrunken corpus against the same persisted centroids.)
- a full rebuild (build_*) CLEARS the tombstones — a fresh index has
  no deletions to hide.

Caveats, by design:
- Re-ingesting a previously-evicted key via append_* stays hidden
  until the next full rebuild (tombstones are key-level, not
  version-level). The orchestration path that re-adds keys is a
  rebuild anyway (changed source fingerprint on a non-evicting
  write).
- Tombstones accumulate until the next rebuild; they are O(total
  deleted), the standard LSM trade, and the broadcast anti-join keeps
  their read cost one small hash table per scan.

Reference parity: the reference delegates DELETE to its warehouse
backend and rebuilds derived state; this module is the Spark-first
replacement that makes derived state O(deleted) instead.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOMBSTONE_DIR = "tombstones"
# Tombstones are stored under ONE canonical column name so indexes
# with different key columns (doc_id, vec_id) share the store format.
TOMBSTONE_COL = "key"


def _tombstone_path(index_dir: str) -> str:
    return os.path.join(index_dir, TOMBSTONE_DIR)


def evict_keys(
    spark: SparkSession,
    index_dir: str,
    keys: Sequence | DataFrame,
    key_column: str = TOMBSTONE_COL,
) -> int:
    """Append ``keys`` to the index's tombstone set and bump the meta
    fingerprint to the CURRENT state of the index's recorded source.

    The caller's contract: the delete it just performed is the only
    change to the source since the index was built/appended — then the
    re-fingerprint means "this index already reflects that delete" and
    the next ensure_* is a no-op instead of a full rebuild. Returns
    the number of tombstoned keys."""
    meta_path = os.path.join(index_dir, "_INDEX_META.json")
    if not os.path.exists(meta_path):
        raise ValueError(f"{index_dir} is not a managed index (no meta)")
    if isinstance(keys, DataFrame):
        t = keys.select(F.col(key_column).alias(TOMBSTONE_COL)).distinct()
    else:
        t = (
            spark.createDataFrame(
                [(k,) for k in keys], [TOMBSTONE_COL]
            ).distinct()
        )
    n = t.count()
    if n:
        t.coalesce(1).write.mode("append").parquet(
            _tombstone_path(index_dir)
        )
    with open(meta_path) as f:
        meta = json.load(f)
    from goe_spark.operators.ivf import _source_fingerprint

    src = meta.get("source")
    if src and os.path.exists(src):
        meta["fingerprint"] = _source_fingerprint(src)
        from goe_spark.plans.metadata import atomic_write_json

        atomic_write_json(meta_path, meta)
    return n


def apply_tombstones(
    spark: SparkSession, index_dir: str, df: DataFrame, key_column: str
) -> DataFrame:
    """Anti-join ``df`` against the index's tombstones on
    ``key_column``. No tombstones -> the input plan unchanged (zero
    overhead for never-deleted indexes); otherwise one broadcast hash
    anti-join against the O(deleted) key set."""
    tpath = _tombstone_path(index_dir)
    if not os.path.isdir(tpath):
        return df
    t = (
        spark.read.parquet(tpath)
        .select(F.col(TOMBSTONE_COL).alias(key_column))
        .distinct()
    )
    return df.join(F.broadcast(t), key_column, "left_anti")


def clear_tombstones(index_dir: str) -> None:
    """Drop the tombstone set — called by every full build (a fresh
    index has no deletions to hide)."""
    tpath = _tombstone_path(index_dir)
    if os.path.isdir(tpath):
        shutil.rmtree(tpath)
