"""Property-based tests for the predicate DSL (hypothesis).

The reference has no randomized testing (SURVEY §5); this goes beyond
it: for arbitrary ASTs, parse(render_dsl(ast)) == ast, and the SQL
renderer is total. Pure Python — no Spark session, so the suite cost
is milliseconds per example.
"""

from __future__ import annotations

import decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from goe_spark.predicate.parser import (
    ColumnRef,
    Comparison,
    Group,
    InList,
    NullTest,
    Value,
    parse_predicate_dsl,
)
from goe_spark.predicate.render import predicate_to_dsl, predicate_to_sql

_names = st.sampled_from(["col_a", "col_b", "n1", "d_1", "x$y", "amount"])
_alias = st.one_of(st.none(), st.sampled_from(["t", "ab", "sh"]))
_columns = st.builds(ColumnRef, name=_names, alias=_alias)

_numeric = st.one_of(
    st.integers(min_value=-(10**12), max_value=10**12).map(
        lambda i: Value("numeric", i)
    ),
    st.builds(
        lambda i, f: Value("numeric", decimal.Decimal(f"{i}.{f:06d}")),
        st.integers(min_value=-(10**6), max_value=10**6),
        st.integers(min_value=0, max_value=999999),
    ),
)
_datetime = st.datetimes(
    min_value=__import__("datetime").datetime(1900, 1, 1),
    max_value=__import__("datetime").datetime(2100, 1, 1),
).map(lambda d: Value("datetime", d))
# quote/backslash escapes get dedicated cases below; the property
# alphabet stays printable-minus-those to probe structure, not lexing
_text = st.text(
    alphabet=st.characters(
        codec="ascii", min_codepoint=32, max_codepoint=126, exclude_characters='"\\'
    ),
    max_size=20,
)
_string = st.tuples(st.sampled_from(["string", "literal"]), _text).map(
    lambda t: Value(t[0], t[1])
)
_value = st.one_of(_numeric, _datetime, _string)
# literal() renders RAW into SQL by design (the reference's escape
# hatch for e.g. SYSDATE), so SQL-structure properties exclude it
_sql_safe_value = st.one_of(
    _numeric, _datetime, _text.map(lambda s: Value("string", s))
)

_ops = st.sampled_from(["=", "!=", ">", ">=", "<", "<="])


def _preds(value_st):
    return st.one_of(
        st.builds(Comparison, column=_columns, op=_ops, value=value_st),
        st.builds(
            InList,
            column=_columns,
            values=st.lists(value_st, min_size=1, max_size=3).map(tuple),
            negated=st.booleans(),
        ),
        st.builds(NullTest, column=_columns, negated=st.booleans()),
    )


def _trees(value_st):
    return st.recursive(
        _preds(value_st),
        lambda kids: st.builds(
            lambda op, items: Group(op, tuple(items)),
            st.sampled_from(["AND", "OR"]),
            st.lists(kids, min_size=2, max_size=3),
        ),
        max_leaves=8,
    )


_tree = _trees(_value)
_sql_tree = _trees(_sql_safe_value)


@settings(max_examples=300, deadline=None)
@given(_tree)
def test_dsl_roundtrip(ast):
    assert parse_predicate_dsl(predicate_to_dsl(ast)) == ast


@settings(max_examples=200, deadline=None)
@given(_sql_tree)
def test_sql_render_total_and_nonempty(ast):
    sql = predicate_to_sql(ast)
    assert sql.strip()
    # balanced parens outside string literals (structural sanity)
    import re

    structural = re.sub(r"'(?:[^']|'')*'", "''", sql)
    assert structural.count("(") == structural.count(")")


def test_string_escape_roundtrip():
    for body in ['say "hi"', "back\\slash", 'mix\\"ed', "trail\\", '"']:
        ast = Comparison(ColumnRef("c"), "=", Value("string", body))
        assert parse_predicate_dsl(predicate_to_dsl(ast)) == ast
