"""Golden matrix for frontend -> canonical -> Spark/BigQuery mappings.

Modeled on the reference's test strategy (SURVEY.md §5: the
tests/unit/offload/test_data_type_mappings.py golden matrix is the
spec for type-mapping behavior).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from goe_spark.types import canonical as C
from goe_spark.types.bigquery import canonical_to_bigquery
from goe_spark.types.canonical import (
    CanonicalColumn,
    frontend_decimal_to_integral_type,
    is_safe_mapping,
)
from goe_spark.types.oracle import oracle_to_canonical
from goe_spark.types.spark_map import canonical_to_spark, spark_to_canonical


# --- Oracle -> canonical golden rows -------------------------------------

ORACLE_MATRIX = [
    # (oracle_type, precision, scale, expected_type, expected_safe)
    ("CHAR", None, None, C.FIXED_STRING, True),
    ("NCHAR", None, None, C.FIXED_STRING, True),
    ("CLOB", None, None, C.LARGE_STRING, True),
    ("NCLOB", None, None, C.LARGE_STRING, True),
    ("LONG", None, None, C.LARGE_STRING, True),
    ("XMLTYPE", None, None, C.LARGE_STRING, True),
    ("VARCHAR2", None, None, C.VARIABLE_STRING, True),
    ("NVARCHAR2", None, None, C.VARIABLE_STRING, True),
    ("RAW", None, None, C.BINARY, True),
    ("BLOB", None, None, C.LARGE_BINARY, True),
    ("LONG RAW", None, None, C.LARGE_BINARY, True),
    ("FLOAT", 126, None, C.DECIMAL, False),
    ("NUMBER", 2, 0, C.INTEGER_1, True),
    ("NUMBER", 4, 0, C.INTEGER_2, True),
    ("NUMBER", 9, 0, C.INTEGER_4, True),
    ("NUMBER", 18, 0, C.INTEGER_8, True),
    ("NUMBER", 38, 0, C.INTEGER_38, True),
    ("NUMBER", 10, 2, C.DECIMAL, True),
    ("NUMBER", None, None, C.DECIMAL, False),
    ("BINARY_FLOAT", None, None, C.FLOAT, True),
    ("BINARY_DOUBLE", None, None, C.DOUBLE, True),
    ("DATE", None, None, C.TIMESTAMP, True),
    ("TIMESTAMP", None, None, C.TIMESTAMP, True),
    ("TIMESTAMP(6)", None, None, C.TIMESTAMP, True),
    ("TIMESTAMP(9) WITH TIME ZONE", None, None, C.TIMESTAMP_TZ, True),
    ("TIMESTAMP WITH LOCAL TIME ZONE", None, None, C.TIMESTAMP_TZ, True),
    ("INTERVAL DAY(2) TO SECOND(6)", None, None, C.INTERVAL_DS, True),
    ("INTERVAL YEAR(2) TO MONTH", None, None, C.INTERVAL_YM, True),
]


@pytest.mark.parametrize(
    "otype,p,s,expected,safe",
    ORACLE_MATRIX,
    ids=[f"{r[0]}({r[1]},{r[2]})" for r in ORACLE_MATRIX],
)
def test_oracle_to_canonical(otype, p, s, expected, safe):
    col = oracle_to_canonical("c1", otype, data_precision=p, data_scale=s)
    assert col.data_type == expected
    assert bool(col.safe_mapping) == safe


def test_oracle_number_scale_gt_precision():
    # NUMBER(3,5): scale wins as precision.
    col = oracle_to_canonical("c1", "NUMBER", data_precision=3, data_scale=5)
    assert col.data_type == C.DECIMAL
    assert (col.data_precision, col.data_scale) == (5, 5)


def test_oracle_number_negative_scale():
    # NUMBER(10,-5): scale coerced to 0, becomes integral.
    col = oracle_to_canonical("c1", "NUMBER", data_precision=10, data_scale=-5)
    assert col.data_type == C.INTEGER_8
    assert col.data_scale == 0


def test_nchar_unicode_semantics():
    assert (
        oracle_to_canonical("c1", "NCHAR").char_semantics == C.CHAR_SEMANTICS_UNICODE
    )
    assert (
        oracle_to_canonical("c1", "NVARCHAR2").char_semantics
        == C.CHAR_SEMANTICS_UNICODE
    )


# --- integral classification ---------------------------------------------

@pytest.mark.parametrize(
    "p,expected",
    [
        (1, C.INTEGER_1),
        (2, C.INTEGER_1),
        (3, C.INTEGER_2),
        (4, C.INTEGER_2),
        (5, C.INTEGER_4),
        (9, C.INTEGER_4),
        (10, C.INTEGER_8),
        (18, C.INTEGER_8),
        (19, C.INTEGER_38),
        (38, C.INTEGER_38),
        (0, None),
        (39, None),
    ],
)
def test_integral_classification(p, expected):
    assert frontend_decimal_to_integral_type(p, 0) == expected


def test_integral_classification_unsafe_edge():
    # Sampled precision 17-18 rounds up to INTEGER_38 when unsafe.
    assert frontend_decimal_to_integral_type(18, 0, safe_mapping=False) == C.INTEGER_38
    assert frontend_decimal_to_integral_type(17, 0, safe_mapping=False) == C.INTEGER_38
    assert frontend_decimal_to_integral_type(16, 0, safe_mapping=False) == C.INTEGER_8


def test_non_integral_scale():
    assert frontend_decimal_to_integral_type(10, 2) is None
    assert frontend_decimal_to_integral_type(10, None) is None


# --- safe_mapping monotonicity -------------------------------------------

def test_safe_mapping_rules():
    assert is_safe_mapping(None, True) is True
    assert is_safe_mapping(None, False) is False
    assert is_safe_mapping(True, None) is True
    assert is_safe_mapping(False, None) is False
    # Unsafe can never be made safe again.
    assert is_safe_mapping(False, True) is False
    # Unsafe proposal always wins.
    assert is_safe_mapping(True, False) is False


# --- canonical -> Spark ----------------------------------------------------

SPARK_MATRIX = [
    (C.FIXED_STRING, T.StringType()),
    (C.VARIABLE_STRING, T.StringType()),
    (C.LARGE_STRING, T.StringType()),
    (C.BINARY, T.BinaryType()),
    (C.LARGE_BINARY, T.BinaryType()),
    (C.INTEGER_1, T.ByteType()),
    (C.INTEGER_2, T.ShortType()),
    (C.INTEGER_4, T.IntegerType()),
    (C.INTEGER_8, T.LongType()),
    (C.INTEGER_38, T.DecimalType(38, 0)),
    (C.FLOAT, T.FloatType()),
    (C.DOUBLE, T.DoubleType()),
    (C.DATE, T.DateType()),
    (C.TIME, T.StringType()),
    (C.TIMESTAMP, T.TimestampNTZType()),
    (C.TIMESTAMP_TZ, T.TimestampType()),
    (C.INTERVAL_DS, T.DayTimeIntervalType()),
    (C.INTERVAL_YM, T.YearMonthIntervalType()),
    (C.BOOLEAN, T.BooleanType()),
]


@pytest.mark.parametrize("ctype,expected", SPARK_MATRIX, ids=[r[0] for r in SPARK_MATRIX])
def test_canonical_to_spark(ctype, expected):
    assert canonical_to_spark(CanonicalColumn(name="c", data_type=ctype)) == expected


def test_decimal_to_spark_precision():
    col = CanonicalColumn(name="c", data_type=C.DECIMAL, data_precision=12, data_scale=4)
    assert canonical_to_spark(col) == T.DecimalType(12, 4)
    bare = CanonicalColumn(name="c", data_type=C.DECIMAL)
    assert canonical_to_spark(bare) == T.DecimalType(38, 0)


def test_spark_roundtrip():
    # Spark schema -> canonical -> Spark schema is stable for the file
    # source types used by the parquet fixtures.
    for dt in [
        T.StringType(),
        T.LongType(),
        T.IntegerType(),
        T.DoubleType(),
        T.FloatType(),
        T.DateType(),
        T.BooleanType(),
    ]:
        col = spark_to_canonical("c", dt)
        assert canonical_to_spark(col) == dt


# --- canonical -> BigQuery -------------------------------------------------

BQ_MATRIX = [
    (CanonicalColumn("c", C.VARIABLE_STRING), "STRING", True),
    (CanonicalColumn("c", C.LARGE_BINARY), "BYTES", True),
    (CanonicalColumn("c", C.INTEGER_1), "INT64", True),
    (CanonicalColumn("c", C.INTEGER_8), "INT64", True),
    (CanonicalColumn("c", C.INTEGER_38, data_precision=29), "NUMERIC", True),
    (CanonicalColumn("c", C.INTEGER_38, data_precision=38), "BIGNUMERIC", True),
    (CanonicalColumn("c", C.INTEGER_38), "BIGNUMERIC", True),
    (CanonicalColumn("c", C.DECIMAL, data_precision=18, data_scale=4), "NUMERIC", True),
    # The BIGNUMERIC fallback branch is always flagged unsafe by the
    # reference (bigquery_backend_api.py:2458-2475), even for a safe
    # input — the decorators survive but the mapping is not attested.
    (CanonicalColumn("c", C.DECIMAL, data_precision=38, data_scale=10), "BIGNUMERIC", False),
    (CanonicalColumn("c", C.DECIMAL), "BIGNUMERIC", False),
    (CanonicalColumn("c", C.FLOAT), "FLOAT64", True),
    (CanonicalColumn("c", C.DOUBLE), "FLOAT64", True),
    (CanonicalColumn("c", C.DATE), "DATE", True),
    (CanonicalColumn("c", C.TIME), "TIME", True),
    (CanonicalColumn("c", C.TIMESTAMP), "DATETIME", True),
    (CanonicalColumn("c", C.TIMESTAMP_TZ), "TIMESTAMP", False),
    (CanonicalColumn("c", C.INTERVAL_DS), "STRING", False),
    (CanonicalColumn("c", C.INTERVAL_YM), "STRING", False),
    (CanonicalColumn("c", C.BOOLEAN), "BOOLEAN", True),
]


@pytest.mark.parametrize(
    "col,expected,safe",
    BQ_MATRIX,
    ids=[f"{r[0].data_type}->{r[1]}" for r in BQ_MATRIX],
)
def test_canonical_to_bigquery(col, expected, safe):
    bc = canonical_to_bigquery(col)
    assert bc.backend_type == expected
    assert bool(bc.safe_mapping) == safe


def test_unsafe_numeric_promotes_to_bignumeric():
    # An unsafe DECIMAL that would fit NUMERIC is promoted to
    # BIGNUMERIC with decorators stripped.
    col = CanonicalColumn(
        "c", C.DECIMAL, data_precision=18, data_scale=4, safe_mapping=False
    )
    bc = canonical_to_bigquery(col)
    assert bc.backend_type == "BIGNUMERIC"
    assert bc.data_precision is None and bc.data_scale is None
    assert bc.safe_mapping is True
