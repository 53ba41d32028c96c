"""Frontend-dialect sampling pushdown rendering (SURVEY §1.6 — the
reference bakes SAMPLE BLOCK (pct) into the Oracle scan SQL,
oracle_offload_source_table.py:784; offload_source_table.py:668-927
drives the sampled type-tightening). The clause must land in the
dialect's own position: Oracle/Postgres/MSSQL suffix the table
reference, Teradata suffixes the query."""

from __future__ import annotations

import pytest

from goe_spark.sources.jdbc import dbtable_subquery, sample_clause


def test_oracle_sample_block_table_position():
    cl = sample_clause("oracle", 1.0)
    assert cl == ("table", "SAMPLE BLOCK (1)")
    q = dbtable_subquery("sh.sales", columns=["amount"], sample=cl)
    assert q == "(SELECT amount FROM sh.sales SAMPLE BLOCK (1)) goe_src"


def test_oracle_sample_follows_snapshot_clause():
    # Oracle table_reference order: flashback clause, THEN sample.
    q = dbtable_subquery(
        "sh.sales",
        snapshot_clause="AS OF SCN 42",
        sample=sample_clause("oracle", 0.5),
    )
    assert (
        q
        == "(SELECT * FROM sh.sales AS OF SCN 42 SAMPLE BLOCK (0.5)) goe_src"
    )


def test_postgres_tablesample():
    q = dbtable_subquery(
        "public.sales", sample=sample_clause("postgresql", 2.5)
    )
    assert q == "(SELECT * FROM public.sales TABLESAMPLE SYSTEM (2.5)) goe_src"


def test_mssql_percent_keyword():
    assert sample_clause("mssql", 10) == (
        "table",
        "TABLESAMPLE SYSTEM (10 PERCENT)",
    )


def test_teradata_sample_is_query_positioned():
    cl = sample_clause("teradata", 1.0)
    assert cl == ("query", "SAMPLE 0.01")
    q = dbtable_subquery("db.sales", where="amount > 0", sample=cl)
    assert q == "(SELECT * FROM db.sales WHERE amount > 0 SAMPLE 0.01) goe_src"


def test_unknown_dialect_returns_none():
    assert sample_clause("derby", 1.0) is None
    # and the subquery renders unchanged
    assert dbtable_subquery("t", sample=None) == "(SELECT * FROM t) goe_src"


@pytest.mark.parametrize("pct", [0, -1, 101])
def test_out_of_range_percent_rejected(pct):
    with pytest.raises(ValueError):
        sample_clause("oracle", pct)


def test_percent_100_omits_clause_everywhere():
    """A 100% 'sample' is a full read — no clause. Critical on
    Teradata: SAMPLE with an INTEGER argument means a ROW COUNT, so
    rendering 100/100 as 'SAMPLE 1' would silently sample ONE ROW and
    type-tightening would derive types from it."""
    for dialect in ("oracle", "postgresql", "mssql", "teradata", "derby"):
        assert sample_clause(dialect, 100) is None
        assert sample_clause(dialect, 100.0) is None


def test_tiny_percent_renders_fixed_point_not_exponent():
    """'%g' would render 0.001/100 as 1e-05, which SAMPLE/TABLESAMPLE
    parsers reject; the clause must carry plain decimal notation."""
    pos, clause = sample_clause("teradata", 0.001)
    assert clause == "SAMPLE 0.00001"
    pos, clause = sample_clause("oracle", 0.001)
    assert clause == "SAMPLE BLOCK (0.001)"


def test_teradata_fraction_always_has_decimal_point():
    # integer-looking fractions must render with a '.', never as a
    # bare integer (Teradata row-count form)
    for pct, want in [(50.0, "SAMPLE 0.5"), (1.0, "SAMPLE 0.01")]:
        assert sample_clause("teradata", pct) == ("query", want)
