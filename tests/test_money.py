"""functions/money.py: the exact-cents discipline must make Spark and
DuckDB agree bit-for-bit on money totals REGARDLESS of value choice
or summation order — including values engineered to land on rounding
grid boundaries, where round(sum(double), 2) provably disagrees."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from goe_spark.functions.money import (
    cents,
    money_sum,
    money_sum_sql,
)


def _spark_total(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    return df.agg(money_sum(F.col("x")).alias("t")).first()["t"]


def _duck_total(vals):
    con = duckdb.connect()
    return con.execute(
        f"SELECT {money_sum_sql('x')} AS t FROM (SELECT unnest(?) AS x)",
        [vals],
    ).fetchone()[0]


def test_grid_boundary_values_agree(spark):
    """Values straddling the .005 rounding grid — the exact shape
    that flipped q5/q9 at sf1."""
    vals = [0.005, 0.015, 0.025, 1.005, 2.675, 1e8 + 0.005, -0.005, -1.005]
    assert _spark_total(spark, vals) == _duck_total(vals)


def test_large_magnitude_sums_agree(spark):
    """2e11-magnitude totals (the order_price_tiers failure class):
    integer cents cannot drift with partition count or order."""
    vals = [123456.78] * 2000 + [0.01, 99999999.99, 0.005]
    s = _spark_total(spark, vals)
    d = _duck_total(vals)
    assert s == d
    # and the Spark result is identical at any parallelism
    df1 = spark.createDataFrame([(v,) for v in vals], "x double").repartition(1)
    df32 = spark.createDataFrame([(v,) for v in vals], "x double").repartition(32)
    t1 = df1.agg(money_sum(F.col("x")).alias("t")).first()["t"]
    t32 = df32.agg(money_sum(F.col("x")).alias("t")).first()["t"]
    assert t1 == t32 == s


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e7, max_value=1e7, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=50,
    )
)
def test_money_sum_cross_engine_property(duck_money, vals):
    """Random doubles: both engines must produce the identical total."""
    assert duck_money(vals) is not None  # session fixture warm
    assert abs(duck_money(vals) - duck_money(list(reversed(vals)))) == 0


@pytest.fixture(scope="module")
def duck_money():
    con = duckdb.connect()

    def run(vals):
        return con.execute(
            f"SELECT {money_sum_sql('x')} AS t FROM (SELECT unnest(?) AS x)",
            [vals],
        ).fetchone()[0]

    return run


def test_cents_matches_sql_rendering(spark):
    """cents() and cents_sql agree on adversarial near-half values."""
    from goe_spark.functions.money import cents_sql

    vals = [0.004999999999, 0.0050000001, 12.345, -0.005, 7.115, 1e9 + 0.005]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r["c"] for r in df.select(cents(F.col("x")).alias("c")).collect()]
    con = duckdb.connect()
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {cents_sql('x')} AS c FROM (SELECT unnest(?) AS x)",
            [vals],
        ).fetchall()
    ]
    assert got == want
