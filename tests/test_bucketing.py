"""Bucketed co-located joins (plans/bucketing.py): the join plan has
zero Exchange, per-bucket sort is elided, equality predicates prune to
one bucket, results equal the plain join, and a bucket-count mismatch
is visible as a reintroduced shuffle (the failure mode the shared
BucketSpec exists to prevent)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goe_spark.plans.bucketing import BucketSpec, bucketed_join, write_bucketed
from tests.conftest import SF_SMALL


def _plan(df, mode: str = "simple") -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            mode
        )
    )


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    spec = BucketSpec(key="o_orderkey", n_buckets=8)
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", str(base / "orders"), spec)
    write_bucketed(lineitem, "b_lineitem", str(base / "lineitem"), spec)
    yield spec, orders, lineitem
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_join_has_no_exchange(spark, bucketed_pair):
    """The headline property: co-bucketed join, zero shuffles."""
    spec, _, _ = bucketed_pair
    joined = bucketed_join(spark, "b_orders", "b_lineitem", spec)
    plan = _plan(joined)
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan


def test_sorted_buckets_elide_the_sort(spark, bucketed_pair):
    """sortBy on write means the SMJ needs no per-bucket Sort."""
    spec, _, _ = bucketed_pair
    joined = bucketed_join(spark, "b_orders", "b_lineitem", spec)
    # In simple mode each operator prints once per occurrence; a
    # sort-free SMJ over sorted buckets shows no Sort operator.
    assert "Sort " not in _plan(joined).replace("SortMergeJoin", "SMJ")


def test_join_result_matches_plain_join(spark, bucketed_pair):
    spec, orders, lineitem = bucketed_pair
    got = (
        bucketed_join(spark, "b_orders", "b_lineitem", spec)
        .groupBy()
        .agg(
            F.count("*"),
            F.sum("o_orderkey"),
            F.sum(F.col("l_quantity").cast("decimal(20,2)")),
        )
        .first()
    )
    expect = (
        orders.join(lineitem, "o_orderkey")
        .groupBy()
        .agg(
            F.count("*"),
            F.sum("o_orderkey"),
            F.sum(F.col("l_quantity").cast("decimal(20,2)")),
        )
        .first()
    )
    assert got == expect


def test_bucket_pruning_on_key_equality(spark, bucketed_pair):
    """With auto-bucketed-scan off (the planner otherwise drops the
    bucket layout for scans with no downstream distribution need),
    a key-equality filter reads ONE bucket's files."""
    spec, orders, _ = bucketed_pair
    key = orders.first().o_orderkey
    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "false")
        pruned = spark.table("b_orders").where(F.col("o_orderkey") == key)
        plan = _plan(pruned, "formatted")
        assert "SelectedBucketsCount: 1 out of 8" in plan
        assert pruned.count() == 1
    finally:
        spark.conf.set(conf, old)


def test_mismatched_bucket_counts_reintroduce_exchange(spark, bucketed_pair, tmp_path):
    """The failure mode BucketSpec centralizes away: a 4-bucket copy
    joined to the 8-bucket table shuffles again."""
    spec, orders, _ = bucketed_pair
    other = BucketSpec(key="o_orderkey", n_buckets=4)
    write_bucketed(orders, "b_orders4", str(tmp_path / "o4"), other)
    try:
        joined = spark.table("b_orders4").join(
            spark.table("b_lineitem"), "o_orderkey"
        )
        assert "Exchange" in _plan(joined)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders4")


def test_bad_key_rejected(spark, bucketed_pair, tmp_path):
    _, orders, _ = bucketed_pair
    with pytest.raises(ValueError, match="bucket key"):
        write_bucketed(
            orders, "b_bad", str(tmp_path / "bad"), BucketSpec(key="nope")
        )
