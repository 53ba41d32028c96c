"""Every registered query must match its DuckDB oracle at sf0.001.

This is the same compare the driver runs at sf0.01 (tools/check_oracle
mirrors it); running at the smallest SF keeps the suite fast while
still exercising both engines end-to-end.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tools.check_oracle import frame_fingerprint


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


def test_bench_headline_names_resolve():
    """bench.py must never KeyError mid-run (round 3 lost its entire
    benchmark to one broken query; a renamed/removed registry entry
    must fail HERE, not in the driver's bench pass)."""
    import bench
    from goe_spark.queries import queries_dict

    missing = set(bench.HEADLINE) - set(queries_dict())
    assert not missing, f"bench HEADLINE references unknown queries: {missing}"
