"""Golden matrices for the Teradata/MSSQL frontends and the
Snowflake/Synapse backends — mirrors the reference's
tests/unit/offload/test_data_type_mappings.py shapes."""

from __future__ import annotations

import pytest

from goe_spark.types import canonical as C
from goe_spark.types.canonical import CanonicalColumn
from goe_spark.types.mssql import mssql_to_canonical
from goe_spark.types.snowflake import canonical_to_snowflake
from goe_spark.types.synapse import canonical_to_synapse
from goe_spark.types.teradata import teradata_to_canonical

# --- Teradata frontend -----------------------------------------------------

TERADATA_MATRIX = [
    # (td_type, precision, scale, expected canonical, safe)
    ("BIGINT", None, None, C.INTEGER_8, True),
    ("BYTEINT", None, None, C.INTEGER_1, True),
    ("SMALLINT", None, None, C.INTEGER_2, True),
    ("INTEGER", None, None, C.INTEGER_4, True),
    ("DOUBLE PRECISION", None, None, C.DOUBLE, True),
    ("FLOAT", None, None, C.DOUBLE, True),
    ("REAL", None, None, C.DOUBLE, True),
    ("DECIMAL", 5, 0, C.INTEGER_4, True),
    ("DECIMAL", 20, 0, C.INTEGER_38, True),
    ("DECIMAL", 10, 2, C.DECIMAL, True),
    ("NUMBER", None, None, C.DECIMAL, False),
    ("NUMERIC", 38, 10, C.DECIMAL, True),
    ("CHAR", None, None, C.FIXED_STRING, True),
    ("VARCHAR", None, None, C.VARIABLE_STRING, True),
    ("CLOB", None, None, C.LARGE_STRING, True),
    ("BYTE", None, None, C.BINARY, True),
    ("VARBYTE", None, None, C.BINARY, True),
    ("BLOB", None, None, C.LARGE_BINARY, True),
    ("DATE", None, None, C.DATE, True),  # date-only, unlike Oracle
    ("TIME", None, 6, C.TIME, True),
    ("TIMESTAMP", None, 6, C.TIMESTAMP, True),
    ("TIMESTAMP(6) WITH TIME ZONE", None, 6, C.TIMESTAMP_TZ, True),
    ("INTERVAL DAY TO SECOND", None, None, C.INTERVAL_DS, True),
    ("INTERVAL DAY(4) TO SECOND(6)", None, None, C.INTERVAL_DS, True),
    ("INTERVAL HOUR TO MINUTE", None, None, C.INTERVAL_DS, True),
    ("INTERVAL SECOND", None, None, C.INTERVAL_DS, True),
    ("INTERVAL YEAR TO MONTH", None, None, C.INTERVAL_YM, True),
    ("INTERVAL MONTH", None, None, C.INTERVAL_YM, True),
]


@pytest.mark.parametrize("tdt,p,s,expected,safe", TERADATA_MATRIX)
def test_teradata_to_canonical(tdt, p, s, expected, safe):
    col = teradata_to_canonical("c1", tdt, data_precision=p, data_scale=s)
    assert col.data_type == expected
    assert bool(col.safe_mapping) == safe


def test_teradata_lob_lengths_clamped():
    assert teradata_to_canonical("b", "BLOB").data_length == 8_388_608
    assert teradata_to_canonical("c", "CLOB").char_length == 16_777_216


def test_teradata_unsupported_raises():
    with pytest.raises(NotImplementedError):
        teradata_to_canonical("t", "PERIOD(DATE)")
    with pytest.raises(NotImplementedError):
        teradata_to_canonical("t", "TIME WITH TIME ZONE")


# --- MSSQL frontend --------------------------------------------------------

MSSQL_MATRIX = [
    ("bit", None, None, C.BOOLEAN),
    ("tinyint", None, None, C.INTEGER_2),  # unsigned -> promoted
    ("smallint", None, None, C.INTEGER_2),
    ("int", None, None, C.INTEGER_4),
    ("bigint", None, None, C.INTEGER_8),
    ("float", None, None, C.DOUBLE),
    ("real", None, None, C.FLOAT),
    ("decimal", 4, 0, C.INTEGER_2),
    ("decimal", 38, 0, C.INTEGER_38),
    ("numeric", 18, 4, C.DECIMAL),
    ("money", 19, 4, C.DECIMAL),
    ("smallmoney", 10, 4, C.DECIMAL),
    ("char", None, None, C.FIXED_STRING),
    ("nchar", None, None, C.FIXED_STRING),
    ("varchar", None, None, C.VARIABLE_STRING),
    ("nvarchar", None, None, C.VARIABLE_STRING),
    ("uniqueidentifier", None, None, C.VARIABLE_STRING),
    ("text", None, None, C.LARGE_STRING),
    ("ntext", None, None, C.LARGE_STRING),
    ("binary", None, None, C.BINARY),
    ("varbinary", None, None, C.BINARY),
    ("image", None, None, C.BINARY),
    ("date", None, None, C.DATE),
    ("time", None, None, C.TIME),
    ("smalldatetime", None, None, C.TIMESTAMP),
    ("datetime", None, None, C.TIMESTAMP),
    ("datetime2", None, None, C.TIMESTAMP),
    ("datetimeoffset", None, None, C.TIMESTAMP_TZ),
]


@pytest.mark.parametrize("mt,p,s,expected", MSSQL_MATRIX)
def test_mssql_to_canonical(mt, p, s, expected):
    col = mssql_to_canonical("c1", mt, data_precision=p, data_scale=s)
    assert col.data_type == expected


def test_mssql_nchar_unicode_semantics():
    assert (
        mssql_to_canonical("c", "nchar").char_semantics
        == C.CHAR_SEMANTICS_UNICODE
    )
    assert (
        mssql_to_canonical("c", "char").char_semantics == C.CHAR_SEMANTICS_BYTE
    )


def test_mssql_decimal_edges():
    # scale > precision
    assert mssql_to_canonical("c", "decimal", data_precision=3, data_scale=5).data_precision == 5
    # negative scale -> 0 (integral)
    col = mssql_to_canonical("c", "decimal", data_precision=10, data_scale=-5)
    assert col.data_scale == 0 and col.data_type == C.INTEGER_8
    # undecorated -> unsafe DECIMAL
    col = mssql_to_canonical("c", "numeric")
    assert col.data_type == C.DECIMAL and col.safe_mapping is False
    with pytest.raises(NotImplementedError):
        mssql_to_canonical("c", "sql_variant")


# --- Snowflake backend -----------------------------------------------------

SNOWFLAKE_MATRIX = [
    (C.BOOLEAN, "BOOLEAN", None, None),
    (C.FIXED_STRING, "TEXT", None, None),
    (C.LARGE_STRING, "TEXT", None, None),
    (C.VARIABLE_STRING, "TEXT", None, None),
    (C.BINARY, "BINARY", None, None),
    (C.LARGE_BINARY, "BINARY", None, None),
    (C.DATE, "DATE", None, None),
    (C.FLOAT, "FLOAT", None, None),
    (C.DOUBLE, "FLOAT", None, None),
    (C.INTEGER_1, "NUMBER", 3, 0),
    (C.INTEGER_2, "NUMBER", 5, 0),
    (C.INTEGER_4, "NUMBER", 10, 0),
    (C.INTEGER_8, "NUMBER", 19, 0),
    (C.INTEGER_38, "NUMBER", 38, 0),
    (C.TIME, "TIME", None, None),
    (C.TIMESTAMP, "TIMESTAMP_NTZ", None, None),
    (C.TIMESTAMP_TZ, "TIMESTAMP_TZ", None, None),
]


@pytest.mark.parametrize("ctype,expected,p,s", SNOWFLAKE_MATRIX)
def test_canonical_to_snowflake(ctype, expected, p, s):
    b = canonical_to_snowflake(CanonicalColumn("c1", ctype))
    assert b.backend_type == expected
    if p is not None:
        assert (b.data_precision, b.data_scale) == (p, s)


def test_snowflake_decimals_and_intervals():
    b = canonical_to_snowflake(
        CanonicalColumn("c", C.DECIMAL, data_precision=18, data_scale=4)
    )
    assert (b.backend_type, b.data_precision, b.data_scale) == ("NUMBER", 18, 4)
    b = canonical_to_snowflake(CanonicalColumn("c", C.DECIMAL))
    assert (b.data_precision, b.data_scale) == (38, 18)
    b = canonical_to_snowflake(CanonicalColumn("c", C.INTERVAL_DS))
    assert b.backend_type == "TEXT" and b.safe_mapping is False


# --- Synapse backend -------------------------------------------------------

SYNAPSE_MATRIX = [
    (C.BOOLEAN, "BIT"),
    (C.FIXED_STRING, "CHAR"),
    (C.LARGE_STRING, "VARCHAR"),
    (C.VARIABLE_STRING, "VARCHAR"),
    (C.BINARY, "VARBINARY"),
    (C.LARGE_BINARY, "VARBINARY"),
    (C.INTEGER_1, "SMALLINT"),
    (C.INTEGER_2, "SMALLINT"),
    (C.INTEGER_4, "INT"),
    (C.INTEGER_8, "BIGINT"),
    (C.INTEGER_38, "NUMERIC"),
    (C.DATE, "DATE"),
    (C.FLOAT, "REAL"),  # T-SQL naming inversion
    (C.DOUBLE, "FLOAT"),
    (C.TIME, "TIME"),
    (C.TIMESTAMP, "DATETIME2"),
    (C.TIMESTAMP_TZ, "DATETIMEOFFSET"),
    (C.INTERVAL_DS, "VARCHAR"),
    (C.INTERVAL_YM, "VARCHAR"),
]


@pytest.mark.parametrize("ctype,expected", SYNAPSE_MATRIX)
def test_canonical_to_synapse(ctype, expected):
    assert canonical_to_synapse(CanonicalColumn("c1", ctype)).backend_type == expected


def test_synapse_unicode_strings():
    col = CanonicalColumn(
        "c", C.VARIABLE_STRING, char_semantics=C.CHAR_SEMANTICS_UNICODE
    )
    assert canonical_to_synapse(col).backend_type == "NVARCHAR"
    col = CanonicalColumn(
        "c", C.FIXED_STRING, char_semantics=C.CHAR_SEMANTICS_UNICODE
    )
    assert canonical_to_synapse(col).backend_type == "NCHAR"


def test_synapse_datetime_scale_clamp():
    b = canonical_to_synapse(CanonicalColumn("c", C.TIMESTAMP, data_scale=9))
    assert b.data_scale == 7 and b.safe_mapping is False
    b = canonical_to_synapse(CanonicalColumn("c", C.TIMESTAMP, data_scale=3))
    assert b.data_scale == 3 and b.safe_mapping is True


def test_roundtrip_frontend_to_backends():
    """A Teradata DECIMAL(20,0) flows through canonical INTEGER_38 to
    NUMBER(38,0) on Snowflake and NUMERIC(38,0) on Synapse — the
    chain a real offload would execute."""
    col = teradata_to_canonical("amount", "DECIMAL", data_precision=20, data_scale=0)
    assert col.data_type == C.INTEGER_38
    sf = canonical_to_snowflake(col)
    sy = canonical_to_synapse(col)
    assert (sf.backend_type, sf.data_precision, sf.data_scale) == ("NUMBER", 38, 0)
    assert (sy.backend_type, sy.data_precision, sy.data_scale) == ("NUMERIC", 38, 0)


# --- Hive / Impala backend -------------------------------------------------


def test_canonical_to_hive_matrix():
    from goe_spark.types.hadoop import canonical_to_hive as h

    assert h(CanonicalColumn("c", C.FIXED_STRING)).backend_type == "STRING"
    assert h(CanonicalColumn("c", C.LARGE_STRING)).backend_type == "STRING"
    assert h(CanonicalColumn("c", C.BINARY)).backend_type == "BINARY"
    # native integer widths widen to BIGINT by default...
    for it in (C.INTEGER_1, C.INTEGER_2, C.INTEGER_4, C.INTEGER_8):
        assert h(CanonicalColumn("c", it)).backend_type == "BIGINT"
    # ...but a user override honors the narrow width
    assert h(CanonicalColumn("c", C.INTEGER_1), honor_integer_width=True).backend_type == "TINYINT"
    assert h(CanonicalColumn("c", C.INTEGER_4), honor_integer_width=True).backend_type == "INT"
    b = h(CanonicalColumn("c", C.INTEGER_38))
    assert (b.backend_type, b.data_precision, b.data_scale) == ("DECIMAL", 38, 0)
    assert h(CanonicalColumn("c", C.FLOAT)).backend_type == "FLOAT"
    assert h(CanonicalColumn("c", C.DOUBLE)).backend_type == "DOUBLE"
    assert h(CanonicalColumn("c", C.DATE)).backend_type == "DATE"
    assert h(CanonicalColumn("c", C.TIME)).backend_type == "STRING"
    assert h(CanonicalColumn("c", C.TIMESTAMP)).backend_type == "TIMESTAMP"
    ts = h(CanonicalColumn("c", C.TIMESTAMP_TZ))
    assert ts.backend_type == "TIMESTAMP" and ts.safe_mapping is False
    assert h(CanonicalColumn("c", C.INTERVAL_DS)).backend_type == "STRING"
    assert h(CanonicalColumn("c", C.BOOLEAN)).backend_type == "BOOLEAN"


def test_canonical_to_impala_overrides():
    from goe_spark.types.hadoop import canonical_to_impala as i

    # Impala has no binary type and (pre-3.3) no DATE.
    assert i(CanonicalColumn("c", C.BINARY)).backend_type == "STRING"
    assert i(CanonicalColumn("c", C.LARGE_BINARY)).backend_type == "STRING"
    assert i(CanonicalColumn("c", C.DATE)).backend_type == "TIMESTAMP"
    assert i(CanonicalColumn("c", C.DATE), date_supported=True).backend_type == "DATE"


def test_hadoop_decimal_udf_alignment():
    from goe_spark.types.hadoop import align_decimal_to_udfs, canonical_to_hive as h

    # odd scale rounds up to even, precision bumped, landed on 18/38
    assert align_decimal_to_udfs(10, 3) == (18, 4)
    assert align_decimal_to_udfs(18, 4) == (18, 4)
    assert align_decimal_to_udfs(20, 5) == (38, 6)
    assert align_decimal_to_udfs(38, 9) == (38, 9)  # at max precision: no scale bump
    assert align_decimal_to_udfs(None, None) == (38, 18)
    b = h(CanonicalColumn("c", C.DECIMAL, data_precision=10, data_scale=3))
    assert (b.data_precision, b.data_scale, b.safe_mapping) == (18, 4, False)
