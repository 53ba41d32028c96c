"""Every registered query must match its DuckDB oracle at sf0.001.

This is the same compare the driver runs at sf0.01 (tools/check_oracle
mirrors it); running at the smallest SF keeps the suite fast while
still exercising both engines end-to-end.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tools.check_oracle import dtype_kind_mismatches, frame_fingerprint


def _specs():
    from goe_spark.queries import all_queries

    return [pytest.param(s, id=s.name) for s in all_queries()]


@pytest.mark.parametrize("spec", _specs())
def test_query_matches_oracle(spec, spark, duck):
    # PANDAS on both sides — the driver's fetch path. It is
    # dtype-destructive (DuckDB HUGEINT/DECIMAL -> float64) in ways
    # collect()/fetchall() are not; round 5 proved the object-level
    # compare green-lit 6 queries the driver failed.
    sdf = spec.fn(spark, SF_SMALL)
    spdf = sdf.toPandas()
    if spec.oracle is None:
        assert spdf is not None  # rows-only check, mirror of the driver
        return
    opdf = duck.execute(spec.oracle).df()
    sn, sc, sh, srows = frame_fingerprint(spdf)
    on, oc, oh, orows = frame_fingerprint(opdf)
    if (sn, sc, sh) != (on, oc, oh):
        diff = next(
            (f"row {i}:\n  S {a}\n  D {b}"
             for i, (a, b) in enumerate(zip(srows, orows)) if a != b),
            "",
        )
        raise AssertionError(
            f"{spec.name}: spark=({sn},{sc},{sh}) duckdb=({on},{oc},{oh})\n"
            f"spark dtypes={dict(spdf.dtypes.astype(str))}\n"
            f"duck  dtypes={dict(opdf.dtypes.astype(str))}\n{diff}"
        )
    # A hash match with a cross-kind pandas dtype split is green by
    # LUCK — one data nudge flips it red in the driver. Hard-fail so
    # new queries can't reintroduce HUGEINT/DECIMAL drift.
    drift = dtype_kind_mismatches(spdf, opdf)
    assert not drift, (
        f"{spec.name}: hash matches but dtype kinds drift "
        f"(align dtypes in-query): {drift}"
    )


def test_dtype_drift_gate_trips_on_planted_case(spark, duck):
    """Prove the gate: a Spark BIGINT sum vs a DuckDB HUGEINT->float64
    sum can hash identically on friendly values, but the cross-kind
    dtype split must fail regardless."""
    spdf = spark.createDataFrame([(1, 10)], "k int, s bigint").toPandas()
    opdf = duck.execute(
        "SELECT 1 AS k, sum(10) AS s"  # DuckDB sum() -> HUGEINT -> object/float
    ).df()
    drift = dtype_kind_mismatches(spdf, opdf)
    assert drift, (
        f"planted HUGEINT drift not detected: spark={dict(spdf.dtypes.astype(str))} "
        f"duck={dict(opdf.dtypes.astype(str))}"
    )
    assert drift[0][0] == "s"


def test_bench_headline_names_resolve():
    """bench.py must never KeyError mid-run (round 3 lost its entire
    benchmark to one broken query; a renamed/removed registry entry
    must fail HERE, not in the driver's bench pass)."""
    import bench
    from goe_spark.queries import queries_dict

    missing = set(bench.HEADLINE) - set(queries_dict())
    assert not missing, f"bench HEADLINE references unknown queries: {missing}"
