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
