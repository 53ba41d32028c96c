"""AQE runtime skew-join evidence.

SCALE.md claims skewed shuffle joins are handled by either explicit
salting (operators/salting.py, planner-independent) or AQE's runtime
skew split. The salting half is proven in test_salted_join; this
pins the AQE half: a planted hot key must come out of the final
adaptive plan as a split skew join (``skew=true``), with results
identical to the plain join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture
def skew_conf(spark):
    keys = [
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.5"),
        ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"),
        ("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB"),
        # coalescing merges the small partitions first and can mask
        # the planted skew at test scale; production keeps it on with
        # MB-scale thresholds where both compose
        ("spark.sql.adaptive.coalescePartitions.enabled", "false"),
        ("spark.sql.adaptive.forceOptimizeSkewedJoin", "true"),
        # force a sort-merge join so the skew-split path (not
        # broadcast) is what handles the hot key
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
    ]
    old = {k: spark.conf.get(k, None) for k, _ in keys}
    for k, v in keys:
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_planted_hot_key(skew_conf):
    spark = skew_conf
    # fact: one hot key (0) carrying ~90% of rows, payload to make
    # the partition's bytes cross the threshold
    fact = spark.range(0, 200_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise(F.col("id") % 97)
        .alias("k"),
        # md5: INCOMPRESSIBLE payload — skew detection reads the
        # compressed map-output sizes, so a repetitive payload
        # compresses below any threshold and hides the skew
        F.md5(F.col("id").cast("string")).alias("pay"),
    )
    dim = spark.range(0, 97).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    joined = fact.join(dim, "k").select("k", "v")
    # execute THIS DataFrame so its adaptive plan finalizes, then
    # inspect the same QueryExecution
    got = joined.collect()
    # correctness: every fact row joined (k in [0, 97) by
    # construction), v rides along. Key 0 gets the 90% hot branch
    # PLUS ids divisible by both 10 and 97.
    expect_hot = sum(
        1 for i in range(200_000) if (i % 10 != 0) or (i % 97 == 0)
    )
    assert len(got) == 200_000
    hot = [r for r in got if r.k == 0]
    assert len(hot) == expect_hot
    assert all(r.v == 0 for r in hot)
    # evidence: the FINAL adaptive plan split the skewed partition
    final = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert "skew=true" in final, final[:2000]
