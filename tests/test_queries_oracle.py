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
    sdf = spec.fn(spark, SF_SMALL)
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        assert srows is not None  # rows-only check, mirror of the driver
        return
    res = duck.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert frame_fingerprint(sdf.columns, srows) == frame_fingerprint(ocols, orows)


def test_bench_headline_names_resolve():
    """bench.py must never KeyError mid-run (round 3 lost its entire
    benchmark to one broken query; a renamed/removed registry entry
    must fail HERE, not in the driver's bench pass)."""
    import bench
    from goe_spark.queries import queries_dict

    missing = set(bench.HEADLINE) - set(queries_dict())
    assert not missing, f"bench HEADLINE references unknown queries: {missing}"
