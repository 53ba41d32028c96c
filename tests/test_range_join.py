"""Interval join operator (operators/range_join.py): strategy
equivalence, inclusivity, multi-bucket spans, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goe_spark.operators.range_join import interval_join


@pytest.fixture
def numeric_data(spark):
    pts = spark.createDataFrame(
        [(i, float(i)) for i in range(0, 100)], "pid long, v double"
    )
    ivs = spark.createDataFrame(
        [
            (1, 0.0, 9.0),       # narrow
            (2, 5.0, 64.0),      # spans many buckets
            (3, 64.0, 64.0),     # degenerate point interval
            (4, 90.0, 200.0),    # extends past the domain
            (5, -50.0, -10.0),   # matches nothing
        ],
        "iid long, lo double, hi double",
    )
    return pts, ivs


def _pairs(df):
    return sorted((r.pid, r.iid) for r in df.collect())


def test_strategies_agree_with_naive(spark, numeric_data):
    pts, ivs = numeric_data
    naive = _pairs(
        pts.crossJoin(ivs).where(
            (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        )
    )
    assert naive  # non-degenerate fixture
    assert _pairs(interval_join(pts, ivs, "v", "lo", "hi")) == naive
    for bucket in (1, 7, 10, 1000):  # incl. bucket >> domain
        got = _pairs(
            interval_join(
                pts, ivs, "v", "lo", "hi", strategy="bucketed", bucket=bucket
            )
        )
        assert got == naive, f"bucket={bucket}"


def test_inclusive_bounds(spark, numeric_data):
    pts, ivs = numeric_data
    got = interval_join(
        pts, ivs, "v", "lo", "hi", strategy="bucketed", bucket=8
    )
    # Point interval [64, 64] matches exactly the point at 64.
    assert _pairs(got.where(F.col("iid") == 3)) == [(64, 3)]


def test_timestamp_domain(spark):
    pts = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00"), (2, "2024-01-01 02:30:00")],
        "pid long, ts string",
    ).select("pid", F.col("ts").cast("timestamp").alias("ts"))
    ivs = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00", "2024-01-01 01:00:00")],
        "iid long, lo string, hi string",
    ).select(
        "iid",
        F.col("lo").cast("timestamp").alias("lo"),
        F.col("hi").cast("timestamp").alias("hi"),
    )
    got = interval_join(
        pts,
        ivs,
        "ts",
        "lo",
        "hi",
        strategy="bucketed",
        bucket=15 * 60 * 1_000_000,  # 15-minute grid in micros
    )
    assert _pairs(got) == [(1, 10)]


def test_bucketed_plan_has_no_nested_loop(spark, numeric_data):
    pts, ivs = numeric_data
    plan = (
        interval_join(
            pts, ivs, "v", "lo", "hi", strategy="bucketed", bucket=10
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bucketed_requires_bucket(spark, numeric_data):
    pts, ivs = numeric_data
    with pytest.raises(ValueError, match="bucket"):
        interval_join(pts, ivs, "v", "lo", "hi", strategy="bucketed")
    with pytest.raises(ValueError, match="strategy"):
        interval_join(pts, ivs, "v", "lo", "hi", strategy="sort")
