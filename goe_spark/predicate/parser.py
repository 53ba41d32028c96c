"""Recursive-descent parser for the offload predicate DSL.

Language (reference grammar: predicate_offload.py:666-731):

    expr       := pred (AND pred)* | pred (OR pred)*      -- no mixing
    pred       := column relop value
                | value relop column
                | column IN|NOT IN value_list
                | column IS [NOT] NULL
                | "(" expr ")"
    relop      := = | != | > | >= | < | <=
    value      := numeric(n) | datetime(d) | string("s") | literal("s")
    column     := column([alias.]name)

Mixing AND and OR at one nesting level is rejected (parens required),
matching the reference's explicit-grouping rule.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import re
from dataclasses import dataclass


class PredicateParseError(ValueError):
    pass


# --- AST ------------------------------------------------------------------


@dataclass(frozen=True)
class ColumnRef:
    name: str
    alias: str | None = None


@dataclass(frozen=True)
class Value:
    kind: str  # numeric | datetime | string | literal
    value: object


@dataclass(frozen=True)
class Comparison:
    column: ColumnRef
    op: str  # = != > >= < <=
    value: Value


@dataclass(frozen=True)
class InList:
    column: ColumnRef
    values: tuple[Value, ...]
    negated: bool = False


@dataclass(frozen=True)
class NullTest:
    column: ColumnRef
    negated: bool = False  # True => IS NOT NULL


@dataclass(frozen=True)
class Group:
    op: str  # AND | OR
    items: tuple[object, ...]


_FLIP = {"=": "=", "!=": "!=", ">": "<", ">=": "<=", "<": ">", "<=": ">="}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<kw>(?i:and|or|not\s+in|in|is\s+not\s+null|is\s+null))(?![a-zA-Z0-9_])
  | (?P<func>(?i:column|numeric|datetime|string|literal))\s*\(
  | (?P<op>!=|>=|<=|=|>|<)
  | (?P<lpar>\()
  | (?P<rpar>\))
  | (?P<comma>,)
""",
    re.VERBOSE,
)

_DT_FRac = re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{1,9}$")
_DT_TS = re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$")
_DT_DATE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_COLUMN_RE = re.compile(r"^(?:(?P<alias>[a-zA-Z]+)\.)?(?P<name>[a-zA-Z0-9.$#_]+)$")
_NUM_RE = re.compile(r"^[+-]?(\d+(\.\d+)?|\.\d+)$")


class _Lexer:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.tokens: list[tuple[str, str]] = []
        self._lex()
        self.idx = 0

    def _lex(self) -> None:
        text = self.text
        pos = 0
        while pos < len(text):
            m = _TOKEN_RE.match(text, pos)
            if not m:
                raise PredicateParseError(
                    f"unexpected input at offset {pos}: {text[pos:pos+25]!r}"
                )
            kind = m.lastgroup
            tok = m.group(0)
            pos = m.end()
            if kind == "ws":
                continue
            if kind == "kw":
                self.tokens.append((re.sub(r"\s+", " ", tok.upper()), tok))
            elif kind == "func":
                fname = tok[:-1].strip().lower()
                # Read the argument up to the balanced closing paren,
                # honoring quoted strings.
                arg, pos = self._read_arg(text, pos)
                self.tokens.append(("FUNC", f"{fname}\x00{arg}"))
            else:
                self.tokens.append((kind.upper(), tok))

    @staticmethod
    def _read_arg(text: str, pos: int) -> tuple[str, int]:
        depth = 1
        out = []
        in_str = False
        while pos < len(text):
            ch = text[pos]
            if in_str:
                if ch == "\\":
                    out.append(text[pos : pos + 2])
                    pos += 2
                    continue
                if ch == '"':
                    in_str = False
                out.append(ch)
            else:
                if ch == '"':
                    in_str = True
                    out.append(ch)
                elif ch == "(":
                    depth += 1
                    out.append(ch)
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        return "".join(out), pos + 1
                    out.append(ch)
                else:
                    out.append(ch)
            pos += 1
        raise PredicateParseError("unterminated value/column constructor")

    def peek(self) -> tuple[str, str] | None:
        return self.tokens[self.idx] if self.idx < len(self.tokens) else None

    def next(self) -> tuple[str, str]:
        tok = self.peek()
        if tok is None:
            raise PredicateParseError("unexpected end of predicate")
        self.idx += 1
        return tok


def _parse_value(fname: str, arg: str) -> Value:
    arg = arg.strip()
    if fname == "numeric":
        if not _NUM_RE.match(arg):
            raise PredicateParseError(f"invalid numeric value: {arg!r}")
        if re.match(r"^[+-]?\d+$", arg):
            return Value("numeric", int(arg))
        return Value("numeric", decimal.Decimal(arg))
    if fname == "datetime":
        if _DT_FRac.match(arg):
            base, frac = arg.split(".")
            dt = _dt.datetime.strptime(base, "%Y-%m-%d %H:%M:%S")
            micros = int(frac[:6].ljust(6, "0"))
            return Value("datetime", dt.replace(microsecond=micros))
        if _DT_TS.match(arg):
            return Value(
                "datetime", _dt.datetime.strptime(arg, "%Y-%m-%d %H:%M:%S")
            )
        if _DT_DATE.match(arg):
            return Value("datetime", _dt.datetime.strptime(arg, "%Y-%m-%d"))
        raise PredicateParseError(f"invalid datetime value: {arg!r}")
    if fname in ("string", "literal"):
        if len(arg) < 2 or arg[0] != '"' or arg[-1] != '"':
            raise PredicateParseError(
                f"{fname} value must be a double-quoted string: {arg!r}"
            )
        body = arg[1:-1]
        body = body.replace('\\"', '"').replace("\\\\", "\\")
        return Value(fname, body)
    raise PredicateParseError(f"unknown value constructor: {fname}")


def _parse_column(arg: str) -> ColumnRef:
    m = _COLUMN_RE.match(arg.strip())
    if not m:
        raise PredicateParseError(f"invalid column reference: {arg!r}")
    return ColumnRef(name=m.group("name"), alias=m.group("alias"))


class _Parser:
    def __init__(self, lexer: _Lexer):
        self.lx = lexer

    def parse(self):
        node = self._expr()
        if self.lx.peek() is not None:
            raise PredicateParseError(
                f"trailing input after predicate: {self.lx.peek()[1]!r}"
            )
        return node

    def _expr(self):
        items = [self._pred()]
        group_op: str | None = None
        while True:
            tok = self.lx.peek()
            if tok is None or tok[0] not in ("AND", "OR"):
                break
            op = tok[0]
            if group_op is None:
                group_op = op
            elif op != group_op:
                raise PredicateParseError(
                    "cannot mix AND and OR without parentheses"
                )
            self.lx.next()
            items.append(self._pred())
        if group_op is None:
            return items[0]
        return Group(group_op, tuple(items))

    def _pred(self):
        kind, tok = self.lx.next()
        if kind == "LPAR":
            inner = self._expr()
            k, _ = self.lx.next()
            if k != "RPAR":
                raise PredicateParseError("expected closing parenthesis")
            return inner
        if kind != "FUNC":
            raise PredicateParseError(f"expected column/value, got {tok!r}")
        fname, arg = tok.split("\x00", 1)
        if fname == "column":
            col = _parse_column(arg)
            k, t = self.lx.next()
            if k == "OP":
                v = self._value_operand()
                return Comparison(col, t, v)
            if k == "IN":
                return InList(col, self._value_list(), negated=False)
            if k == "NOT IN":
                return InList(col, self._value_list(), negated=True)
            if k == "IS NULL":
                return NullTest(col, negated=False)
            if k == "IS NOT NULL":
                return NullTest(col, negated=True)
            raise PredicateParseError(f"expected operator after column, got {t!r}")
        # value relop column (flipped comparison)
        v = _parse_value(fname, arg)
        k, t = self.lx.next()
        if k != "OP":
            raise PredicateParseError(f"expected operator after value, got {t!r}")
        k2, t2 = self.lx.next()
        if k2 != "FUNC" or not t2.startswith("column\x00"):
            raise PredicateParseError("expected column after value-first comparison")
        col = _parse_column(t2.split("\x00", 1)[1])
        return Comparison(col, _FLIP[t], v)

    def _value_operand(self) -> Value:
        k, t = self.lx.next()
        if k != "FUNC" or t.startswith("column\x00"):
            raise PredicateParseError("expected typed value")
        fname, arg = t.split("\x00", 1)
        return _parse_value(fname, arg)

    def _value_list(self) -> tuple[Value, ...]:
        k, _ = self.lx.next()
        if k != "LPAR":
            raise PredicateParseError("expected ( to open value list")
        values = [self._value_operand()]
        while True:
            k, t = self.lx.next()
            if k == "RPAR":
                return tuple(values)
            if k != "COMMA":
                raise PredicateParseError(f"expected , or ) in value list, got {t!r}")
            values.append(self._value_operand())


def parse_predicate_dsl(text: str):
    """Parse DSL text into the predicate AST. Raises
    PredicateParseError on invalid input."""
    if not text or not text.strip():
        raise PredicateParseError("empty predicate")
    return _Parser(_Lexer(text)).parse()
