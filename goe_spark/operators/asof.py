"""As-of (point-in-time) join — a custom operator Spark lacks.

For every left row, attach the right row with the greatest right_time
<= left_time within the same key (the time-series "latest known
value" join; DuckDB/kdb call it ASOF JOIN).

Spark-native formulation — no per-key loops, no range cross join:

1. union both sides into one stream of (key, time, marker, payload)
   rows, right rows carrying the payload and left rows NULLs;
2. one window per key ordered by (time, marker) with an unbounded-
   preceding frame: ``last(payload, ignorenulls=True)`` forwards the
   most recent right payload onto every subsequent row;
3. keep the left rows.

Cost at 100 TB: ONE shuffle of left+right on the key and a
partition-local sort — the same price as a sort-merge join, with no
risk of a range-condition falling back to BroadcastNestedLoopJoin.
Right rows sort BEFORE left rows at equal times (marker 0 < 1), which
makes the match inclusive (right_time == left_time is visible).

The right side must be unique per (key, time) — pre-reduce with
max_by if it is not, otherwise "which tied row wins" is undefined in
any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest ``right``
    payload at or before its time. Payload columns are NULL when no
    right row precedes the left row.

    ``direction="forward"`` flips the match to the EARLIEST right row
    at or after the left time (pandas merge_asof's forward mode — the
    time-to-next-event shape). Same single-shuffle plan: the scan
    order reverses (time descending) so the window's most recent
    right row is the smallest qualifying time.

    ``tolerance`` (pandas merge_asof / kdb wj surface) bounds how far
    back a match may reach: a matched right row with
    ``right_time < left_time - tolerance`` is discarded (payload
    NULL). Pass an expression matching the time type — e.g.
    ``F.expr("INTERVAL 30 DAYS")`` for timestamps, a numeric literal
    for numeric times. Zero extra shuffles: the matched right time
    rides the payload struct and the bound is one filter expression —
    and since the as-of match is the LATEST qualifying row, a match
    outside tolerance implies no older row could be inside it.

    ``payload_cols`` must be disjoint from ``left``'s columns — the
    output carries both sides by name, so a collision would emit
    duplicate column names (breaking later access by name).

    Left rows with a NULL ``left_time`` sort before every timed row
    within their key (Spark windows order NULLs first), so they can
    never see a right payload — they come out with NULL payload
    columns, same as DuckDB's ASOF JOIN for NULL probe times.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown as-of direction: {direction!r}")
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"payload_cols collide with left columns: {sorted(clash)}; "
            "rename or prefix the payload columns"
        )
    # The payload travels as ONE struct, not per-column: independent
    # last(col, ignorenulls) calls would backfill a NULL field of the
    # matched right row from an OLDER right row, stitching values from
    # different rows together. A whole-row struct is NULL on left rows
    # and atomic on right rows, so "latest right row" means one row.
    # __rt (the matched right row's time) rides the struct so a
    # tolerance bound can be evaluated without any re-join.
    payload_struct = F.struct(
        *[F.col(c) for c in payload_cols],
        F.col(right_time).alias("__rt"),
    )
    l_tagged = left.select(
        F.col(on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__marker"),
        *[F.col(c) for c in left.columns],
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}"
                for c in payload_cols
            )
            + f",__rt:{right.schema[right_time].dataType.simpleString()}"
            + ">"
        )
        .alias("__payload"),
    )
    # Right rows with NULL right_time can never be "the latest row at
    # or before t" — DuckDB/pandas ASOF semantics exclude them — but
    # they would sort nulls-first here and hand their (non-NULL
    # struct) payload to left rows with no real match. Drop them.
    r_tagged = right.where(F.col(right_time).isNotNull()).select(
        F.col(right_on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__marker"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        payload_struct.alias("__payload"),
    )
    # NULL left times must sort FIRST in both directions so they can
    # never see a payload (asc defaults to nulls-first; desc must be
    # pinned — its default nulls-last would hand NULL-time rows the
    # smallest right time's payload).
    t_order = (
        F.col("__t").asc_nulls_first()
        if direction == "backward"
        else F.col("__t").desc_nulls_first()
    )
    # marker asc in BOTH directions: right rows (0) sort before left
    # rows (1) at equal times, keeping the match inclusive.
    w = (
        Window.partitionBy("__key")
        .orderBy(t_order, F.col("__marker").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    forwarded = r_tagged.unionByName(l_tagged).select(
        "__marker",
        "__t",
        *[F.col(c) for c in left.columns],
        F.last(F.col("__payload"), ignorenulls=True).over(w).alias("__payload"),
    )
    if tolerance is not None:
        in_window = (
            F.col("__payload.__rt") >= F.col("__t") - tolerance
            if direction == "backward"
            else F.col("__payload.__rt") <= F.col("__t") + tolerance
        )
        forwarded = forwarded.withColumn(
            "__payload", F.when(in_window, F.col("__payload"))
        )
    return (
        forwarded.where(F.col("__marker") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col(f"__payload.{c}").alias(c) for c in payload_cols],
        )
    )
