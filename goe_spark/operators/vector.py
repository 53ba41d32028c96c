"""Shared vector arithmetic for the similarity operators.

ONE home for the sequential-fold dot product / squared norm used by
brute-force ANN, IVF, and sign-LSH (and their DuckDB oracle SQL
twins). The convention — double precision, strictly sequential
left-to-right accumulation, rounded to 6 at comparison points — is
what lets DuckDB's list_reduce compute bit-identical values; a
precision change here changes every consumer at once instead of
drifting per copy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    """Sequential double-precision squared L2 norm."""
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


DOT_SQL = (
    "list_reduce(list_transform(range(len({a})), "
    "i -> cast({a}[i+1] AS double) * cast({b}[i+1] AS double)), (x, y) -> x + y)"
)
NORM2_SQL = (
    "list_reduce(list_transform({a}, x -> cast(x AS double) * cast(x AS double)), "
    "(x, y) -> x + y)"
)
