"""Property test: manifest pruning NEVER loses a matching row, for
arbitrary (lo, hi) bounds on either or both clustered columns —
hypothesis searches the bound space for a counterexample to the
file-skipping soundness the zorder tests check pointwise."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from goe_spark.plans.zorder import read_pruned, write_zordered
from tests.conftest import SF_SMALL

# o_custkey spans ~[1, 150]; o_totalprice ~[900, 400k] at sf0.001.
BOUND = st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False))


@pytest.fixture(scope="module")
def layout(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zp") / "orders_z")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    write_zordered(orders, path, ["o_custkey", "o_totalprice"], n_files=16)
    full = spark.read.parquet(path).cache()
    full.count()
    return path, full


@given(c_lo=BOUND, c_hi=BOUND, p_lo=BOUND, p_hi=BOUND)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_prune_is_sound_for_arbitrary_bounds(layout, c_lo, c_hi, p_lo, p_hi):
    path, full = layout
    spark = full.sparkSession
    bounds = {}
    if c_lo is not None or c_hi is not None:
        bounds["o_custkey"] = (c_lo, c_hi)
    if p_lo is not None or p_hi is not None:
        bounds["o_totalprice"] = (p_lo, p_hi)
    if not bounds:
        return

    pred = F.lit(True)
    for col, (lo, hi) in bounds.items():
        if lo is not None:
            pred = pred & (F.col(col) >= lo)
        if hi is not None:
            pred = pred & (F.col(col) <= hi)

    expect = full.where(pred).count()
    df, n_read, n_total = read_pruned(spark, path, bounds)
    got = 0 if df is None else df.where(pred).count()
    assert got == expect, (bounds, n_read, n_total)
