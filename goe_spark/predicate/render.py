"""Predicate AST renderers: pyspark Column and ANSI SQL text.

The Column renderer optionally type-checks against a DataFrame schema
(the reference's GenericPredicateToTyped stage,
predicate_offload.py:358-467): datetime values against non-date
columns and numeric values against non-numeric columns are rejected.

The SQL renderer serves the JDBC pushdown path and the DuckDB
correctness oracle (reference: GenericPredicateToSQL + the
literal/bind template family, predicate_offload.py:469-587 — binds are
unnecessary here because Spark JDBC pushes literal WHERE text).

TRUST BOUNDARY: predicate DSL text is trusted OPERATOR input, exactly
as in the reference (predicates arrive via the goe CLI run by a DBA).
In particular ``literal(...)`` values render through ``F.expr`` —
arbitrary Spark SQL expression evaluation by design, mirroring the
reference passing literal text straight into generated SQL. Do NOT
feed untrusted text into the DSL: the REST listener binds to
127.0.0.1 only and inherits this same operator-trust assumption; any
future remotely-reachable surface must restrict ``literal()`` (or
drop it) before accepting predicates.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from goe_spark.predicate.parser import (
    Comparison,
    Group,
    InList,
    NullTest,
    PredicateParseError,
    Value,
)


class PredicateTypeError(ValueError):
    pass


_NUMERIC_SPARK = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)
_DATE_SPARK = (T.DateType, T.TimestampType, T.TimestampNTZType)


def _check_type(col_name: str, dt: T.DataType, value: Value) -> None:
    if value.kind == "numeric" and not isinstance(dt, _NUMERIC_SPARK):
        raise PredicateTypeError(
            f"numeric() value compared to non-numeric column {col_name} ({dt})"
        )
    if value.kind == "datetime" and not isinstance(dt, _DATE_SPARK):
        raise PredicateTypeError(
            f"datetime() value compared to non-date column {col_name} ({dt})"
        )
    if value.kind == "string" and not isinstance(dt, T.StringType):
        raise PredicateTypeError(
            f"string() value compared to non-string column {col_name} ({dt})"
        )


def _value_to_lit(value: Value) -> Column:
    if value.kind == "literal":
        return F.expr(str(value.value))
    if value.kind == "numeric":
        v = value.value
        return F.lit(float(v) if not isinstance(v, int) else v)
    return F.lit(value.value)


def predicate_to_column(node, df: DataFrame | None = None) -> Column:
    """Render the AST to a pyspark boolean Column. When df is given,
    column existence and value/type compatibility are enforced."""
    schema = {f.name.lower(): f.dataType for f in df.schema.fields} if df is not None else None

    def col_of(ref) -> Column:
        if schema is not None and ref.name.lower() not in schema:
            raise PredicateTypeError(f"unknown column: {ref.name}")
        return F.col(ref.name)

    def check(ref, value: Value) -> None:
        if schema is not None and value.kind != "literal":
            if ref.name.lower() not in schema:
                raise PredicateTypeError(f"unknown column: {ref.name}")
            _check_type(ref.name, schema[ref.name.lower()], value)

    def walk(n) -> Column:
        if isinstance(n, Group):
            out = walk(n.items[0])
            for item in n.items[1:]:
                out = (out & walk(item)) if n.op == "AND" else (out | walk(item))
            return out
        if isinstance(n, Comparison):
            check(n.column, n.value)
            c = col_of(n.column)
            v = _value_to_lit(n.value)
            return {
                "=": c == v,
                "!=": c != v,
                ">": c > v,
                ">=": c >= v,
                "<": c < v,
                "<=": c <= v,
            }[n.op]
        if isinstance(n, InList):
            for v in n.values:
                check(n.column, v)
            c = col_of(n.column)
            lits = [_value_to_lit(v) for v in n.values]
            expr = c.isin(*lits)
            return ~expr if n.negated else expr
        if isinstance(n, NullTest):
            c = col_of(n.column)
            return c.isNotNull() if n.negated else c.isNull()
        raise PredicateParseError(f"unknown AST node: {n!r}")

    return walk(node)


def _sql_literal(value: Value) -> str:
    if value.kind == "literal":
        return str(value.value)
    if value.kind == "numeric":
        return str(value.value)
    if value.kind == "datetime":
        v = value.value
        assert isinstance(v, _dt.datetime)
        if v.microsecond:
            return f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
        return f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S')}'"
    s = str(value.value).replace("'", "''")
    return f"'{s}'"


def predicate_to_sql(node) -> str:
    """Render the AST to ANSI SQL WHERE-clause text."""
    if isinstance(node, Group):
        parts = [predicate_to_sql(i) for i in node.items]
        joined = f" {node.op} ".join(
            f"({p})" if isinstance(i, Group) else p
            for p, i in zip(parts, node.items)
        )
        return joined
    if isinstance(node, Comparison):
        return f"{node.column.name} {node.op} {_sql_literal(node.value)}"
    if isinstance(node, InList):
        vals = ", ".join(_sql_literal(v) for v in node.values)
        op = "NOT IN" if node.negated else "IN"
        return f"{node.column.name} {op} ({vals})"
    if isinstance(node, NullTest):
        return f"{node.column.name} IS {'NOT ' if node.negated else ''}NULL"
    raise PredicateParseError(f"unknown AST node: {node!r}")


def _dsl_value(value: Value) -> str:
    if value.kind == "numeric":
        return f"numeric({value.value})"
    if value.kind == "datetime":
        v = value.value
        assert isinstance(v, _dt.datetime)
        if v.microsecond:
            return f"datetime({v.strftime('%Y-%m-%d %H:%M:%S.%f')})"
        return f"datetime({v.strftime('%Y-%m-%d %H:%M:%S')})"
    body = str(value.value).replace("\\", "\\\\").replace('"', '\\"')
    return f'{value.kind}("{body}")'


def _dsl_column(col) -> str:
    if col.alias:
        return f"column({col.alias}.{col.name})"
    return f"column({col.name})"


def predicate_to_dsl(node) -> str:
    """Render the AST back to DSL text (reference:
    GenericPredicateToDSL, predicate_offload.py:501-531). Inverse of
    parse_predicate_dsl: parse(predicate_to_dsl(ast)) == ast, which is
    property-tested in tests/test_predicate_properties.py."""
    if isinstance(node, Group):
        parts = [
            f"({predicate_to_dsl(i)})" if isinstance(i, Group) else predicate_to_dsl(i)
            for i in node.items
        ]
        return f" {node.op} ".join(parts)
    if isinstance(node, Comparison):
        return f"{_dsl_column(node.column)} {node.op} {_dsl_value(node.value)}"
    if isinstance(node, InList):
        vals = ", ".join(_dsl_value(v) for v in node.values)
        op = "NOT IN" if node.negated else "IN"
        return f"{_dsl_column(node.column)} {op} ({vals})"
    if isinstance(node, NullTest):
        return f"{_dsl_column(node.column)} IS {'NOT ' if node.negated else ''}NULL"
    raise PredicateParseError(f"unknown AST node: {node!r}")
