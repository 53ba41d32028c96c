"""Interval (range) join — point-in-interval matching without an
equi key, the join shape Spark's planner degrades to
BroadcastNestedLoopJoin (broadcastable) or a cartesian product (not).

Two strategies behind one call:

- broadcast: when the interval side is dimension-sized, a plain
  broadcast theta-join is optimal — every probe row streams past the
  in-memory interval list. This is Catalyst's own plan, kept.

- bucketed: when BOTH sides are large, grid-bucket the domain:
  each point maps to floor(p / bucket); each interval EXPLODES to the
  buckets it overlaps (sequence(floor(lo/b), floor(hi/b))); the join
  becomes an equi-join on the bucket id followed by the exact
  containment filter. Shuffle volume is points + intervals x
  avg-buckets-per-interval — linear, never quadratic; pick ``bucket``
  near the median interval width so the explode factor stays ~2.
  This is the standard bin-bucketed range join (the same plan behind
  warehouse RANGE JOIN hints).

Semantics: inner join, row matches interval iff lo <= p <= hi
(inclusive both ends). Numeric or timestamp domains (timestamps
compare as micros)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    strategy: str = "broadcast",
    bucket: int | None = None,
) -> DataFrame:
    """Join each point row to every interval row containing it.

    strategy='broadcast' broadcasts the interval side (dimension-sized
    interval lists). strategy='bucketed' requires ``bucket`` (domain
    units; micros for timestamps) and scales to large interval sides.
    """
    p = F.col(point_col)
    lo, hi = F.col(lo_col), F.col(hi_col)
    if dict(points.dtypes)[point_col].startswith("timestamp"):
        p_num = F.unix_micros(p)
        lo_num, hi_num = F.unix_micros(lo), F.unix_micros(hi)
    else:
        p_num, lo_num, hi_num = p, lo, hi

    if strategy == "broadcast":
        return points.join(
            F.broadcast(intervals), (p >= lo) & (p <= hi)
        )

    if strategy != "bucketed":
        raise ValueError(f"unknown strategy: {strategy!r}")
    if not bucket or bucket <= 0:
        raise ValueError("bucketed strategy requires a positive bucket size")

    b = F.lit(int(bucket))
    pts = points.withColumn("_rj_bucket", F.floor(p_num / b))
    ivs = intervals.withColumn(
        "_rj_bucket",
        F.explode(F.sequence(F.floor(lo_num / b), F.floor(hi_num / b))),
    )
    return (
        pts.join(ivs, "_rj_bucket")
        .where((p >= lo) & (p <= hi))
        .drop("_rj_bucket")
    )
