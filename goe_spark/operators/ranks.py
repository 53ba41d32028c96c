"""Distributed total-order ranks without a global window.

An unpartitioned ``row_number()`` / ``ntile()`` window moves the whole
relation through ONE task — fine for a 64-row report, fatal for a
billion-customer table. This module provides the scale-safe
alternative the reference's rank/segment reports need (reference
computes these in-database where the warehouse parallelizes the sort;
on Spark we must avoid the single-partition WindowExec ourselves):

1. ``with_global_positions`` — exact 1-based global row positions
   under a total order, computed as range-shuffle + per-partition
   ordinals + broadcast partition offsets (the classic zipWithIndex
   pattern, DataFrame-native):

   * ``repartitionByRange`` on the order key spreads the relation so
     partition *i* holds a contiguous rank range;
   * ``sortWithinPartitions`` orders each partition locally — an
     executor-local sort, never a global one;
   * ``monotonically_increasing_id()`` above the local sort encodes
     ``(partition_id << 33) | ordinal`` per row, map-side;
   * one driver-bounded collect of per-partition counts (≤ shuffle
     partitions rows) yields cumulative offsets, broadcast-joined
     back: ``pos = offset[pid] + ordinal + 1``.

   Total cost: ONE distributed range shuffle + a tiny metadata job.
   No WindowExec anywhere.

2. ``ntile_expr`` — the exact SQL-standard NTILE(k) bucket for a row
   position (first ``n % k`` buckets get one extra row), as integer
   column arithmetic. With a unique tie-break in the order key this
   reproduces Spark's and DuckDB's ntile bit-for-bit.

Determinism: the order key MUST be unique (callers append a key
column as tie-break), so every position — and everything derived from
it (ntile bucket, percent_rank = (pos-1)/(n-1), cume_dist = pos/n) —
is reproducible. The intermediate is locally checkpointed so the
counts job and the main job see the identical shuffle output
(RangePartitioner sampling is seeded deterministically, but the
checkpoint removes even that dependence) AND the storage is
auto-released by ContextCleaner when the driver reference is GC'd —
a plain persist() would accumulate CacheManager entries across
registry/bench runs. The checkpointed relation is the *reduced*
grain (customer, not fact); at 100 TB move to a reliable
``checkpoint()`` (localCheckpoint trades executor-loss tolerance for
speed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ORDINAL_BITS = 33
_ORDINAL_MASK = (1 << _ORDINAL_BITS) - 1

POS = "__pos"
_PID = "__pos_pid"
_MID = "__pos_mid"
_OFF = "__pos_off"


def ranked_prelude(df: DataFrame, order_cols: list[Column]) -> DataFrame:
    """The pre-checkpoint stage of ``with_global_positions``: range
    shuffle on the order key, executor-local sort, map-side
    (partition, ordinal) id decode. Exposed so plan guards can assert
    the distributed-sort shape that the checkpoint hides from
    downstream SQL plans."""
    return (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn(_MID, F.monotonically_increasing_id())
        .withColumn(_PID, F.shiftright(F.col(_MID), _ORDINAL_BITS))
    )


def with_global_positions(
    df: DataFrame, order_cols: list[Column], pos_col: str = POS
) -> tuple[DataFrame, int]:
    """Tag ``df`` with its exact 1-based global position under the
    total order ``order_cols`` (which must be unique — append a key
    column as tie-break). Returns ``(tagged_df, n_rows)``.

    The plan is range-shuffle + local sort + map-side id decode +
    broadcast offset join: fully distributed, no global window, no
    single-task stage. ``n_rows`` comes from the same driver-bounded
    counts collect that builds the offsets (≤ shuffle partitions
    rows), so no extra pass.
    """
    spark = df.sparkSession
    # localCheckpoint (not persist): the counts job below materializes
    # it, the main job reuses the identical shuffle output, and —
    # unlike CacheManager entries, which live until an explicit
    # unpersist — the checkpointed RDD is released by Spark's
    # ContextCleaner as soon as the driver-side reference is GC'd, so
    # repeated registry/bench runs don't accumulate storage memory.
    # (The checkpoint truncates downstream SQL plans to a Scan
    # ExistingRDD; tests/test_ranks.py pins the range shuffle on the
    # pre-checkpoint frame via ranked_prelude.)
    ranged = ranked_prelude(df, order_cols).localCheckpoint(eager=False)
    # Driver-bounded: one row per shuffle partition.
    counts = sorted(
        (r[_PID], r["n"])
        for r in ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, running = [], 0
    for pid, n in counts:
        offsets.append((pid, running))
        running += n
    n_rows = running
    if not offsets:  # empty input: keep schema, position column of longs
        return ranged.select(
            "*", F.lit(None).cast("long").alias(pos_col)
        ).drop(_MID, _PID), 0
    off_df = spark.createDataFrame(offsets, schema=f"{_PID} long, {_OFF} long")
    return (
        ranged.join(F.broadcast(off_df), _PID)
        .withColumn(
            pos_col,
            F.col(_OFF) + F.col(_MID).bitwiseAND(F.lit(_ORDINAL_MASK)) + 1,
        )
        .drop(_MID, _PID, _OFF)
    ), n_rows


def ntile_expr(pos: Column, n_rows: int, k: int) -> Column:
    """SQL-standard NTILE(k) bucket for 1-based position ``pos`` in a
    relation of ``n_rows``: bucket sizes differ by at most one, the
    first ``n_rows % k`` buckets take the extra row. Pure integer
    column arithmetic — evaluates map-side, no window."""
    base, rem = divmod(n_rows, k)
    fat = rem * (base + 1)  # rows covered by the (base+1)-sized buckets
    if base == 0:
        # fewer rows than buckets: row i is alone in bucket i
        return pos.cast("int").alias("ntile")
    return (
        F.when(pos <= fat, F.floor((pos - 1) / F.lit(base + 1)))
        .otherwise(rem + F.floor((pos - fat - 1) / F.lit(base)))
        .cast("int")
        + 1
    )


def ntile_boundary_positions(n_rows: int, k: int) -> list[int]:
    """Last 1-based position of each of the first k-1 NTILE(k)
    buckets — the cut points a boundary-broadcast bucket assignment
    compares against. Empty buckets (n_rows < k) are skipped."""
    base, rem = divmod(n_rows, k)
    ends, running = [], 0
    for q in range(1, k):
        running += base + (1 if q <= rem else 0)
        if 0 < running < n_rows:
            ends.append(running)
    return ends
