"""Column transformations (P3 — offload_xform_functions.py:29-100):
null, suppress, translate, regexp_replace; encrypt/tokenize are
declared but not implemented, matching the reference's stubs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def xform_null(c: Column, data_type: str = "string") -> Column:
    return F.lit(None).cast(data_type)


def xform_translate(c: Column, from_chars: str, to_chars: str) -> Column:
    return F.translate(c, from_chars, to_chars)


def xform_regexp_replace(c: Column, pattern: str, replacement: str) -> Column:
    return F.regexp_replace(c, pattern, replacement)


def xform_encrypt(c: Column) -> Column:
    raise NotImplementedError("encrypt transformation is not implemented")


def xform_tokenize(c: Column) -> Column:
    raise NotImplementedError("tokenize transformation is not implemented")


TRANSFORMS: dict[str, Callable] = {
    "null": xform_null,
    "translate": xform_translate,
    "regexp_replace": xform_regexp_replace,
    "encrypt": xform_encrypt,
    "tokenize": xform_tokenize,
}


def apply_transformations(
    df: DataFrame, specs: dict[str, tuple[str, tuple]]
) -> DataFrame:
    """Apply {column: (transform_name, args)} to a DataFrame.
    'suppress' drops the column entirely (the reference's suppress
    semantics); unknown names raise."""
    out = df
    for col_name, (name, args) in specs.items():
        if name == "suppress":
            out = out.drop(col_name)
            continue
        if name not in TRANSFORMS:
            raise KeyError(f"unknown transformation: {name}")
        out = out.withColumn(col_name, TRANSFORMS[name](F.col(col_name), *args))
    return out
