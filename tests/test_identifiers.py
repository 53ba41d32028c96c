"""Per-backend identifier rules (case folding, quoting, length caps).

Reference spec: scenario tests/integration/scenarios/
test_identifiers.py + convert_backend_identifier_case
(offload_functions.py:104-126) and the per-system enclose/max-length
APIs. The matrix below pins case, quote style, and cap per backend;
integration checks that offload and schema-sync fail fast on bad
names and quote correctly."""

from __future__ import annotations

import pytest

from goe_spark.types.identifiers import (
    IdentifierError,
    backend_safe_identifier,
    convert_identifier_case,
    enclose_identifier,
    rules_for,
    validate_identifier,
)


@pytest.mark.parametrize(
    "backend,case_in,expected,quoted,table_cap",
    [
        ("spark", "MyTable", "mytable", "`mytable`", 128),
        ("hadoop", "MyTable", "mytable", "`mytable`", 128),
        ("bigquery", "MyTable", "MyTable", "`MyTable`", 1024),
        ("snowflake", "MyTable", "MYTABLE", '"MYTABLE"', 255),
        ("synapse", "MyTable", "MyTable", "[MyTable]", 128),
        ("mssql", "MyTable", "MyTable", "[MyTable]", 128),
        ("oracle", "MyTable", "MYTABLE", '"MYTABLE"', 128),
        ("teradata", "MyTable", "MyTable", '"MyTable"', 128),
    ],
)
def test_identifier_matrix(backend, case_in, expected, quoted, table_cap):
    rules = rules_for(backend)
    folded = convert_identifier_case(case_in, rules)
    assert folded == expected
    assert enclose_identifier(folded, rules) == quoted
    assert rules.max_table_name_length == table_cap
    validate_identifier(folded, rules, "table")


def test_case_override_beats_backend_default():
    rules = rules_for("bigquery")  # preserve by default
    assert convert_identifier_case("MyTable", rules, "LOWER") == "mytable"
    assert convert_identifier_case("MyTable", rules, "UPPER") == "MYTABLE"


def test_length_caps_enforced():
    with pytest.raises(IdentifierError, match="exceeds spark maximum"):
        validate_identifier("x" * 129, rules_for("spark"), "table")
    # same name is fine where the cap is higher
    validate_identifier("x" * 129, rules_for("bigquery"), "table")
    with pytest.raises(IdentifierError, match="exceeds bigquery maximum"):
        validate_identifier("x" * 301, rules_for("bigquery"), "column")


def test_charset_enforced():
    for bad in ("has space", "has-dash", "1leading", ""):
        with pytest.raises(IdentifierError):
            validate_identifier(bad, rules_for("spark"), "column")
    validate_identifier("ok_name$2", rules_for("spark"), "column")


def test_unknown_backend_raises():
    with pytest.raises(IdentifierError, match="unknown backend"):
        rules_for("db2")


def test_offload_rejects_oversized_table_name(spark, tmp_path):
    from goe_spark.plans.offload import OffloadConfig, OffloadPipeline
    from tests.conftest import SF_SMALL

    src = spark.read.parquet(f"{SF_SMALL}/region.parquet")
    cfg = OffloadConfig(
        owner="tpch",
        table_name="t" * 200,
        target_dir=str(tmp_path / "final"),
        staging_dir=str(tmp_path / "staging"),
        metadata_dir=str(tmp_path / "meta"),
        partition=None,
    )
    with pytest.raises(IdentifierError, match="exceeds spark maximum"):
        OffloadPipeline(spark, cfg).run(src)


def test_schema_sync_quotes_added_columns():
    from pyspark.sql.types import LongType, StructField, StructType

    from goe_spark.plans.schema_sync import SchemaDelta, schema_sync_ddl

    delta = SchemaDelta(
        new_columns=(StructField("NewCol", LongType()),),
        dropped_columns=(),
        retyped_columns=(),
    )
    [ddl] = schema_sync_ddl("db.t", delta)
    assert "`newcol` bigint" in ddl  # folded AND quoted
