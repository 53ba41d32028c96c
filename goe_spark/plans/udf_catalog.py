"""Persistent SQL-UDF catalog management (create / list / describe /
drop) — the backend UDF surface the reference manages on BigQuery
(`bigquery_backend_api.py:1060-1093` create_udf,
`:1903-1929` list_udfs via INFORMATION_SCHEMA.ROUTINES,
`:2170-2211` udf_details via INFORMATION_SCHEMA.PARAMETERS).

Spark-first shape: Spark 4 SQL UDFs (`CREATE FUNCTION ... RETURNS ...
RETURN <expr>`) ARE catalog objects — created in a namespace,
enumerable through the catalog, and described with their full
signature — so the reference's three INFORMATION_SCHEMA queries
become one DDL statement, one catalog listing, and one DESCRIBE
parse. With a Hive-backed session the functions persist across
sessions (metastore); with the in-memory catalog they live for the
session, same code path.

UDF bodies are SQL EXPRESSIONS, so a cataloged UDF runs inside
whole-stage codegen like any built-in — the 100 TB story is "no
Python worker": a cataloged GOE bucket/partition function costs the
same as writing the expression inline.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class UdfParameter:
    """Mirrors the reference's UdfParameter (name, data_type)."""

    name: str
    data_type: str


@dataclass(frozen=True)
class UdfDetails:
    """Mirrors the reference's UdfDetails return shape."""

    db_name: str
    udf_name: str
    return_type: str | None
    parameters: list[UdfParameter] = field(default_factory=list)


_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_ident(name: str, what: str) -> str:
    if not _IDENT.match(name or ""):
        raise ValueError(f"invalid {what}: {name!r}")
    return name


def format_parameter_tuples(parameter_tuples) -> str:
    """`[(name, type), ...]` -> "name type, ..." — the same clause
    builder the reference inlines in create_udf."""
    if not parameter_tuples:
        return ""
    return ", ".join(f"{n} {t}" for n, t in parameter_tuples)


def create_udf(
    spark: SparkSession,
    db_name: str,
    udf_name: str,
    return_data_type: str,
    parameter_tuples: list[tuple[str, str]] | None,
    udf_body: str,
    or_replace: bool = False,
    spec_as_string: str | None = None,
) -> str:
    """CREATE [OR REPLACE] FUNCTION db.name(params) RETURNS type
    RETURN body — returns the SQL text issued (reference create_udf
    returns its statement for logging the same way)."""
    _check_ident(db_name, "db name")
    _check_ident(udf_name, "udf name")
    if not udf_body:
        raise ValueError("udf_body is required")
    params = spec_as_string or format_parameter_tuples(parameter_tuples)
    or_replace_clause = " OR REPLACE" if or_replace else ""
    sql = (
        f"CREATE{or_replace_clause} FUNCTION {db_name}.{udf_name}"
        f"({params}) RETURNS {return_data_type} RETURN {udf_body}"
    )
    spark.sql(sql)
    return sql


def udf_exists(spark: SparkSession, db_name: str, udf_name: str) -> bool:
    return spark.catalog.functionExists(f"{db_name}.{udf_name}")


def list_udfs(
    spark: SparkSession,
    db_name: str,
    udf_name_filter: str | None = None,
    case_sensitive: bool = True,
) -> list[tuple[str, str | None]]:
    """(routine_name, return_type) for the namespace's USER functions
    — the reference's INFORMATION_SCHEMA.ROUTINES projection. The
    filter accepts SQL LIKE wildcards (%/_), matching the reference's
    `routine_name LIKE @udf_name` clause."""
    _check_ident(db_name, "db name")
    rx = None
    if udf_name_filter:
        pat = (
            re.escape(udf_name_filter)
            .replace(re.escape("%"), ".*")
            .replace(re.escape("_"), ".")
        )
        rx = re.compile(
            f"^{pat}$", 0 if case_sensitive else re.IGNORECASE
        )
    out = []
    for f in spark.catalog.listFunctions(db_name):
        if f.namespace != [db_name]:
            continue  # exclude builtins the listing also returns
        if rx and not rx.match(f.name):
            continue
        det = udf_details(spark, db_name, f.name)
        out.append((f.name, det[0].return_type if det else None))
    return sorted(out)


def udf_details(
    spark: SparkSession, db_name: str, udf_name: str
) -> list[UdfDetails]:
    """Signature of one cataloged UDF — return type + ordered
    parameters, the reference's INFORMATION_SCHEMA.PARAMETERS walk.
    Returns [] when the UDF does not exist (same contract)."""
    _check_ident(db_name, "db name")
    _check_ident(udf_name, "udf name")
    if not udf_exists(spark, db_name, udf_name):
        return []
    rows = spark.sql(
        f"DESCRIBE FUNCTION EXTENDED {db_name}.{udf_name}"
    ).collect()
    meta = {}
    for r in rows:
        line = r[0]
        if line.startswith("Usage:"):
            try:
                meta = json.loads(line[len("Usage:"):].strip())
            except ValueError:
                meta = {}
    return_type = meta.get("sqlFunction.returnType")
    parameters = []
    input_param = meta.get("sqlFunction.inputParam") or ""
    # "a DECIMAL(10,2), b DOUBLE" — split on top-level commas only
    # (types like DECIMAL(10,2) carry commas inside parens)
    depth, cur, parts = 0, "", []
    for ch in input_param:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append(cur)
            cur = ""
        else:
            cur += ch
    if cur.strip():
        parts.append(cur)
    for p in parts:
        bits = p.strip().split(None, 1)
        if len(bits) == 2:
            parameters.append(UdfParameter(bits[0], bits[1]))
    return [UdfDetails(db_name, udf_name, return_type, parameters)]


def drop_udf(spark: SparkSession, db_name: str, udf_name: str) -> str:
    _check_ident(db_name, "db name")
    _check_ident(udf_name, "udf name")
    sql = f"DROP FUNCTION IF EXISTS {db_name}.{udf_name}"
    spark.sql(sql)
    return sql
