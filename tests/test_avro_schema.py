"""Avro staging schema generation (S10 positive path): all 20
canonical types map onto the 7 Avro staging primitives with the
reference's rules (avro_staging_file.py:149-210) — base64 binary,
unsafe ints/floats widening to string, simplified staging names —
and the Spark-side projection produces exactly the declared shape.
"""

from __future__ import annotations

import json

import pytest

from goe_spark.sources.avro_schema import (
    AVRO_BOOLEAN,
    AVRO_BYTES,
    AVRO_DOUBLE,
    AVRO_FLOAT,
    AVRO_INT,
    AVRO_LONG,
    AVRO_STRING,
    avro_schema,
    avro_schema_json,
    avro_staging_projection,
    from_canonical,
    staging_column_name,
    staging_columns,
    to_canonical,
)
from goe_spark.types import canonical as C
from goe_spark.types.canonical import CanonicalColumn


def _col(name, t, **kw):
    return CanonicalColumn(name=name, data_type=t, **kw)


ALL_20 = [
    (_col("c_fixed", C.FIXED_STRING), AVRO_STRING),
    (_col("c_large_s", C.LARGE_STRING), AVRO_STRING),
    (_col("c_var", C.VARIABLE_STRING), AVRO_STRING),
    (_col("c_bin", C.BINARY), AVRO_STRING),  # base64 default
    (_col("c_lbin", C.LARGE_BINARY), AVRO_STRING),
    (_col("c_i1", C.INTEGER_1), AVRO_INT),
    (_col("c_i2", C.INTEGER_2), AVRO_INT),
    (_col("c_i4", C.INTEGER_4), AVRO_INT),
    (_col("c_i8", C.INTEGER_8), AVRO_LONG),
    (_col("c_i38", C.INTEGER_38), AVRO_STRING),
    (_col("c_dec", C.DECIMAL, data_precision=20, data_scale=2), AVRO_STRING),
    (_col("c_f", C.FLOAT), AVRO_FLOAT),
    (_col("c_d", C.DOUBLE), AVRO_DOUBLE),
    (_col("c_date", C.DATE), AVRO_STRING),
    (_col("c_time", C.TIME), AVRO_STRING),
    (_col("c_ts", C.TIMESTAMP), AVRO_STRING),
    (_col("c_tstz", C.TIMESTAMP_TZ), AVRO_STRING),
    (_col("c_ids", C.INTERVAL_DS), AVRO_STRING),
    (_col("c_iym", C.INTERVAL_YM), AVRO_STRING),
    (_col("c_bool", C.BOOLEAN), AVRO_BOOLEAN),
]


def test_all_20_canonical_types_map():
    for i, (col, want) in enumerate(ALL_20):
        got = from_canonical(col, i)
        assert got.avro_type == want, (col.data_type, got.avro_type, want)
        assert got.staging_name == col.name  # no special chars here


def test_unsafe_numeric_mappings_widen_to_string():
    for t in (C.INTEGER_1, C.INTEGER_2, C.INTEGER_4, C.INTEGER_8, C.FLOAT, C.DOUBLE):
        sc = from_canonical(_col("x", t, safe_mapping=False), 0)
        assert sc.avro_type == AVRO_STRING
        assert sc.safe_mapping is False
    # safe stays narrow
    assert from_canonical(_col("x", C.INTEGER_8, safe_mapping=True), 0).avro_type == AVRO_LONG


def test_binary_bytes_when_not_base64():
    for t in (C.BINARY, C.LARGE_BINARY):
        assert from_canonical(_col("b", t), 0, binary_as_base64=False).avro_type == AVRO_BYTES
        assert from_canonical(_col("b", t), 0, binary_as_base64=True).avro_type == AVRO_STRING


def test_staging_name_simplification():
    assert staging_column_name("plain_name", 3) == "plain_name"
    for bad in ("has space", "has-dash", "has#hash"):
        assert staging_column_name(bad, 7) == "GOE_SPECIAL_CHAR_COLUMN_7"


def test_schema_json_layout():
    cols = [
        _col("ok_name", C.INTEGER_8, nullable=False),
        _col("bad name", C.DECIMAL, nullable=True, data_precision=10, data_scale=0),
    ]
    schema = avro_schema("load_db_x", "orders_load", cols)
    assert schema["type"] == "record"
    assert schema["name"] == "orders_load"
    assert schema["namespace"] == "load_db_x"
    assert schema["tableName"] == "load_db_x.orders_load"
    assert schema["fields"] == [
        {"name": "ok_name", "type": "long"},  # NOT NULL: bare type
        # nullable: union with null; special chars: simplified name
        {"name": "GOE_SPECIAL_CHAR_COLUMN_1", "type": ["string", "null"]},
    ]
    # round-trips through json
    assert json.loads(avro_schema_json("load_db_x", "orders_load", cols)) == schema


def test_to_canonical_roundtrip_shapes():
    cols = [c for c, _ in ALL_20]
    for sc in staging_columns(cols):
        back = to_canonical(sc)
        assert back.name == sc.staging_name
        if sc.avro_type == AVRO_BOOLEAN:
            assert back.data_type == C.BOOLEAN
        elif sc.avro_type in (AVRO_INT,):
            assert back.data_type == C.INTEGER_4
        elif sc.avro_type == AVRO_LONG:
            assert back.data_type == C.INTEGER_8
        elif sc.avro_type == AVRO_FLOAT:
            assert back.data_type == C.FLOAT
        elif sc.avro_type == AVRO_DOUBLE:
            assert back.data_type == C.DOUBLE
        else:
            assert back.data_type == C.VARIABLE_STRING
    # bytes mode
    sc = from_canonical(_col("b", C.BINARY), 0, binary_as_base64=False)
    assert to_canonical(sc, binary_as_base64=False).data_type == C.BINARY


def test_unknown_types_rejected():
    from goe_spark.sources.avro_schema import StagingAvroColumn

    with pytest.raises(NotImplementedError):
        to_canonical(
            StagingAvroColumn("x", "x", "enum", True, True)
        )


def test_projection_matches_declared_schema(spark):
    """The Spark-side staging projection produces exactly the field
    names and Spark-equivalent types the generated Avro schema
    declares — including base64 text for binary and formatted text
    for dates/timestamps."""
    import datetime
    from decimal import Decimal

    cols = [
        _col("o id", C.INTEGER_8, nullable=False),  # special char name
        _col("amount", C.DECIMAL, data_precision=12, data_scale=2),
        _col("payload", C.BINARY),
        _col("created", C.TIMESTAMP),
        _col("flag", C.BOOLEAN),
    ]
    df = spark.createDataFrame(
        [
            (
                1,
                Decimal("12.34"),
                b"\x00\x01",
                datetime.datetime(2024, 3, 1, 10, 30, 0),
                True,
            )
        ],
        "`o id` long, amount decimal(12,2), payload binary, "
        "created timestamp_ntz, flag boolean",
    )
    out = avro_staging_projection(df, cols)
    assert out.columns == [
        "GOE_SPECIAL_CHAR_COLUMN_0",
        "amount",
        "payload",
        "created",
        "flag",
    ]
    types = dict(out.dtypes)
    assert types == {
        "GOE_SPECIAL_CHAR_COLUMN_0": "bigint",
        "amount": "string",
        "payload": "string",  # base64
        "created": "string",
        "flag": "boolean",
    }
    row = out.collect()[0]
    assert row["payload"] == "AAE="
    assert row["amount"] == "12.34"
    assert row["created"] == "2024-03-01 10:30:00.000000"


def test_write_gate_raises_without_jar(spark, tmp_path):
    from goe_spark.plans.offload import OffloadValidationError
    from goe_spark.sources.avro_schema import write_avro_staging
    from goe_spark.sources.files import avro_available

    if avro_available(spark):  # pragma: no cover - jar present
        pytest.skip("spark-avro present; gate not reachable")
    df = spark.range(1).select(F_col_id())
    with pytest.raises(OffloadValidationError, match="spark-avro"):
        write_avro_staging(
            df, str(tmp_path / "avro"), "db", "t", [_col("id", C.INTEGER_8)]
        )


def F_col_id():
    from pyspark.sql import functions as F

    return F.col("id").alias("id")
