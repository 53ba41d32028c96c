"""Bucketed tables and shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem,
events ⋈ events) is shuffling both sides on the join key EVERY time
the join runs. Hash-bucketing the tables ON WRITE moves that shuffle
to write time, once: two tables bucketed into the same bucket count on
the join key are already co-partitioned, so Catalyst plans a
SortMergeJoin with ZERO Exchange (and with ``sortBy`` the per-bucket
sort is elided too). This is Spark's native rendering of the
reference's hash-distributed backend tables (Synapse DISTRIBUTION =
HASH, Impala clustered inserts) — the layout decision the offload
pipeline makes so that every later query wins.

Mechanics worth pinning (they are test-verified, not folklore):
- bucket pruning: an equality predicate on the bucket key scans ONE
  bucket's files (``SelectedBucketsCount: 1 out of N`` in the scan);
- bucketed reads keep ``spark.sql.sources.bucketing.enabled`` plans
  stable under AQE (the no-shuffle property is a static plan fact);
- both sides must agree on bucket count — a mismatch silently
  reintroduces the shuffle on one side (Spark re-buckets the smaller
  count side only with bucketing v2 / storage-partitioned joins), so
  the writer takes the count from one shared spec.

saveAsTable is required (bucket metadata lives in the catalog, not in
parquet), with an explicit ``path`` so the data sits in the caller's
directory layout like every other sink in this repo.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class BucketSpec:
    """One bucketing decision shared by every table that wants to
    co-locate on ``key`` — a single source of truth for the count, so
    two tables can never disagree and silently re-shuffle."""

    key: str
    n_buckets: int = 32

    def __post_init__(self):
        if self.n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1: {self.n_buckets}")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    spec: BucketSpec,
    sort: bool = True,
) -> None:
    """Write ``df`` as a parquet table hash-bucketed (and per-bucket
    sorted) on ``spec.key``. Replaces an existing catalog entry of the
    same name; the shuffle this write performs is the one every future
    join on the key no longer pays."""
    if spec.key not in df.columns:
        raise ValueError(f"bucket key {spec.key!r} not in {df.columns}")
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    writer = (
        df.repartition(spec.n_buckets, spec.key)
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(spec.n_buckets, spec.key)
    )
    if sort:
        writer = writer.sortBy(spec.key)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    spec: BucketSpec,
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written with ``write_bucketed`` on
    the same BucketSpec. The plan this returns contains no Exchange on
    either side — asserted in tests/test_bucketing.py, because the
    whole point is a static plan property, not a hope.

    The ``merge`` hint pins the sort-merge strategy: at test scale
    Catalyst would otherwise broadcast the smaller side (its
    BroadcastExchange discards the bucket layout), and a table small
    enough to broadcast would never be bucketed in the first place —
    the hint encodes that sizing decision."""
    # Spark 3+ stopped reporting sorted output from bucketed scans by
    # default because a bucket split across many files must be
    # merge-read to honor the order. write_bucketed pre-partitions so
    # every bucket is exactly ONE file — the case where honoring
    # sortBy is a pure win (the SMJ's per-bucket Sort disappears).
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, spec.key, how)
