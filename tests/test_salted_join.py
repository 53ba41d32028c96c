"""Salted join: result parity with the plain join + salt fan-out."""

from __future__ import annotations

from pyspark.sql import functions as F

from goe_spark.catalog import load_table
from goe_spark.operators.salting import salted_join
from tests.conftest import SF_SMALL


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    salted = salted_join(
        li, orders, "l_orderkey", "o_orderkey",
        salt_source=F.xxhash64("l_orderkey", "l_linenumber"),
    )
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
    assert salted.count() == plain.count()
    a = {
        tuple(r)
        for r in salted.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    b = {
        tuple(r)
        for r in plain.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert a == b


def test_salt_actually_spreads_hot_key(spark):
    """A single hot key's rows must land in >1 salt bucket — the whole
    point of the operator."""
    li = load_table(spark, SF_SMALL, "lineitem")
    hot = li.groupBy("l_orderkey").count().orderBy(F.desc("count")).first()
    n_salts = (
        li.where(F.col("l_orderkey") == hot["l_orderkey"])
        .select(
            F.pmod(
                F.xxhash64(F.xxhash64("l_orderkey", "l_linenumber")), F.lit(8)
            ).alias("s")
        )
        .distinct()
        .count()
    )
    assert n_salts > 1


def test_left_join_preserves_unmatched_fact_rows(spark):
    li = load_table(spark, SF_SMALL, "lineitem").limit(100)
    empty_dim = (
        load_table(spark, SF_SMALL, "orders")
        .select("o_orderkey", "o_orderpriority")
        .where(F.lit(False))
    )
    out = salted_join(
        li, empty_dim, "l_orderkey", "o_orderkey",
        salt_source="l_linenumber", how="left",
    )
    assert out.count() == 100
    assert out.where(F.col("o_orderpriority").isNull()).count() == 100
