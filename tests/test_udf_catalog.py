"""Persistent SQL-UDF catalog (plans/udf_catalog.py): create / list /
describe / drop against the real Spark catalog, plus the codegen
claim (a cataloged UDF runs with no Python worker). Reference:
bigquery_backend_api.py:1060-1093, 1903-1929, 2170-2211."""

from __future__ import annotations

import pytest

from goe_spark.plans.udf_catalog import (
    UdfParameter,
    create_udf,
    drop_udf,
    format_parameter_tuples,
    list_udfs,
    udf_details,
    udf_exists,
)

DB = "goe_udf_test"


@pytest.fixture(scope="module", autouse=True)
def udf_db(spark):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB}")
    yield
    spark.sql(f"DROP DATABASE IF EXISTS {DB} CASCADE")


def test_create_list_describe_drop_roundtrip(spark):
    sql = create_udf(
        spark,
        DB,
        "add_tax",
        "DOUBLE",
        [("amount", "DECIMAL(10,2)"), ("rate", "DOUBLE")],
        "amount * (1.0 + rate)",
        or_replace=True,
    )
    assert sql == (
        f"CREATE OR REPLACE FUNCTION {DB}.add_tax"
        "(amount DECIMAL(10,2), rate DOUBLE) RETURNS DOUBLE "
        "RETURN amount * (1.0 + rate)"
    )
    assert udf_exists(spark, DB, "add_tax")
    # it computes
    got = spark.sql(f"SELECT {DB}.add_tax(100.00, 0.25) AS v").first()
    assert got.v == pytest.approx(125.0)
    # details: return type + ordered typed parameters, the reference's
    # INFORMATION_SCHEMA.PARAMETERS shape
    det = udf_details(spark, DB, "add_tax")
    assert len(det) == 1
    assert det[0].return_type == "DOUBLE"
    assert det[0].parameters == [
        UdfParameter("amount", "DECIMAL(10,2)"),
        UdfParameter("rate", "DOUBLE"),
    ]
    assert drop_udf(spark, DB, "add_tax").startswith("DROP FUNCTION")
    assert not udf_exists(spark, DB, "add_tax")
    assert udf_details(spark, DB, "add_tax") == []


def test_list_udfs_filter_and_case(spark):
    create_udf(spark, DB, "goe_bucket", "INT",
               [("k", "BIGINT")], "pmod(hash(k), 16)", or_replace=True)
    create_udf(spark, DB, "goe_month", "STRING",
               [("d", "DATE")], "date_format(d, 'yyyy-MM')",
               or_replace=True)
    create_udf(spark, DB, "other_fn", "INT", [("x", "INT")], "x + 1",
               or_replace=True)
    names = [n for n, _ in list_udfs(spark, DB)]
    assert {"goe_bucket", "goe_month", "other_fn"} <= set(names)
    # LIKE-style filter, the reference's routine_name LIKE clause
    goe_only = list_udfs(spark, DB, udf_name_filter="goe_%")
    assert [n for n, _ in goe_only] == ["goe_bucket", "goe_month"]
    assert [t for _, t in goe_only] == ["INT", "STRING"]
    # case-insensitive variant
    up = list_udfs(
        spark, DB, udf_name_filter="GOE_%", case_sensitive=False
    )
    assert [n for n, _ in up] == ["goe_bucket", "goe_month"]
    assert list_udfs(spark, DB, udf_name_filter="GOE_%") == []


def test_cataloged_udf_is_codegen_not_python(spark):
    """The 100 TB claim: a cataloged SQL UDF inlines into the plan —
    no PythonUDF/BatchEvalPython node anywhere."""
    create_udf(spark, DB, "tier", "STRING", [("v", "DOUBLE")],
               "CASE WHEN v > 100 THEN 'hi' ELSE 'lo' END",
               or_replace=True)
    df = spark.range(1000).selectExpr(f"{DB}.tier(id * 1.5) AS t")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "Python" not in plan, plan
    assert df.where("t = 'hi'").count() > 0


def test_validation_and_spec_as_string(spark):
    with pytest.raises(ValueError, match="invalid"):
        create_udf(spark, "bad;db", "f", "INT", [], "1")
    with pytest.raises(ValueError, match="udf_body"):
        create_udf(spark, DB, "f", "INT", [], "")
    # spec_as_string overrides the tuple formatting (reference parity)
    sql = create_udf(
        spark, DB, "raw_spec", "INT", None, "a + b",
        or_replace=True, spec_as_string="a INT, b INT",
    )
    assert "(a INT, b INT)" in sql
    assert spark.sql(f"SELECT {DB}.raw_spec(2, 3) AS v").first().v == 5
    assert format_parameter_tuples([("x", "INT")]) == "x INT"
    assert format_parameter_tuples(None) == ""


def test_cli_udf_roundtrip(spark, capsys):
    """The udf CLI drives create/list/describe/drop end to end."""
    import json

    from goe_spark.cli import main

    db = "goe_udf_cli"
    assert main([
        "udf", "create", "--db", db, "--name", "double_it",
        "--returns", "BIGINT", "--params", "x BIGINT",
        "--body", "x * 2", "--or-replace",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["created"] == f"{db}.double_it"
    assert main(["udf", "list", "--db", db, "--filter", "double%"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["udfs"] == [{"name": "double_it", "returns": "BIGINT"}]
    assert main(["udf", "describe", "--db", db, "--name", "double_it"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["parameters"] == [{"name": "x", "type": "BIGINT"}]
    assert spark.sql(f"SELECT {db}.double_it(21) v").first().v == 42
    assert main(["udf", "drop", "--db", db, "--name", "double_it"]) == 0
    json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
