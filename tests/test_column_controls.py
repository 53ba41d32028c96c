"""User column-control overrides (--<type>-columns family).

The reference's scenario spec is
tests/integration/scenarios/test_column_controls.py: users force a
canonical type per column (CSV, wildcards), conflicting claims raise,
--decimal-columns pairs positionally with --decimal-columns-type,
invalid class conversions raise, and overrides beat the automatic
mapping AND any sampling proposal, with the unsafe-mapping one-way
rule intact."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from goe_spark.types import canonical as C
from goe_spark.types.canonical import CanonicalColumn
from goe_spark.types.controls import (
    ColumnControls,
    ColumnControlsError,
    build_overrides,
    expand_columns_csv,
    parse_decimal_spec,
    source_to_canonical_mappings,
    valid_override,
)

COLS = [
    CanonicalColumn("o_orderkey", C.INTEGER_8),
    CanonicalColumn("o_custkey", C.INTEGER_8),
    CanonicalColumn("o_orderstatus", C.VARIABLE_STRING),
    CanonicalColumn("o_totalprice", C.DECIMAL, data_precision=15, data_scale=2),
    CanonicalColumn("o_orderdate", C.DATE),
    CanonicalColumn("o_orderpriority", C.VARIABLE_STRING),
]
NAMES = [c.name for c in COLS]


def test_expand_csv_wildcards_case_insensitive():
    assert expand_columns_csv("O_CUSTKEY", NAMES) == ["o_custkey"]
    assert expand_columns_csv("o_order*", NAMES) == [
        "o_orderkey",
        "o_orderstatus",
        "o_orderdate",
        "o_orderpriority",
    ]
    assert expand_columns_csv("o_custkey, o_custkey", NAMES) == ["o_custkey"]
    assert expand_columns_csv(None, NAMES) == []


def test_conflicting_options_raise():
    controls = ColumnControls(
        integer_4_columns_csv="o_custkey",
        integer_8_columns_csv="o_cust*",
    )
    with pytest.raises(ColumnControlsError, match="conflict.*integer-8"):
        build_overrides(controls, COLS)


def test_wildcard_matching_nothing_raises():
    with pytest.raises(ColumnControlsError, match="No columns match"):
        build_overrides(ColumnControls(date_columns_csv="zz*"), COLS)


def test_unbalanced_decimal_pairs_raise():
    controls = ColumnControls(
        decimal_columns_csv_list=["o_totalprice", "o_custkey"],
        decimal_columns_type_list=["38,18"],
    )
    with pytest.raises(ColumnControlsError, match="Unbalanced"):
        build_overrides(controls, COLS)


@pytest.mark.parametrize("bad", ["", "39,2", "10,11", "0,0", "10", "a,b"])
def test_bad_decimal_spec_raises(bad):
    with pytest.raises(ColumnControlsError, match="precision,scale"):
        parse_decimal_spec(bad)


def test_decimal_spec_parses():
    assert parse_decimal_spec("38,18") == (38, 18)
    assert parse_decimal_spec("10,0") == (10, 0)


def test_valid_override_matrix():
    num = CanonicalColumn("n", C.INTEGER_8)
    dec = CanonicalColumn("d", C.DECIMAL, data_precision=10, data_scale=2)
    dbl = CanonicalColumn("f", C.DOUBLE)
    dat = CanonicalColumn("t", C.DATE)
    s = CanonicalColumn("s", C.VARIABLE_STRING)
    # numbers move within the numeric class
    assert valid_override(num, C.INTEGER_1)
    assert valid_override(dec, C.INTEGER_38)
    assert not valid_override(num, C.DATE)
    # float/double only widen...
    assert valid_override(dbl, C.DOUBLE)
    assert not valid_override(dbl, C.INTEGER_8)
    # ...unless --allow-floating-point-conversions is given
    assert valid_override(dbl, C.DECIMAL, allow_floating_point_conversions=True)
    assert not valid_override(dbl, C.DATE, allow_floating_point_conversions=True)
    # dates to date class or strings, never numbers
    assert valid_override(dat, C.TIMESTAMP)
    assert valid_override(dat, C.VARIABLE_STRING)
    assert not valid_override(dat, C.INTEGER_8)
    # strings stay strings
    assert valid_override(s, C.LARGE_STRING)
    assert not valid_override(s, C.DATE)


def test_invalid_conversion_raises_in_mapping():
    controls = ColumnControls(integer_8_columns_csv="o_orderdate")
    with pytest.raises(ColumnControlsError, match="Invalid data type conversion"):
        source_to_canonical_mappings(COLS, controls)


def test_double_to_decimal_needs_float_leniency():
    cols = [CanonicalColumn("price", C.DOUBLE)]
    controls = ColumnControls(
        decimal_columns_csv_list=["price"], decimal_columns_type_list=["12,2"]
    )
    with pytest.raises(ColumnControlsError, match="Invalid data type conversion"):
        source_to_canonical_mappings(cols, controls)
    lenient = ColumnControls(
        decimal_columns_csv_list=["price"],
        decimal_columns_type_list=["12,2"],
        allow_floating_point_conversions=True,
    )
    out = source_to_canonical_mappings(cols, lenient)
    assert out[0].data_type == C.DECIMAL
    assert out[0].safe_mapping is False  # lossy conversion is flagged


def test_overrides_beat_default_mapping():
    controls = ColumnControls(
        integer_4_columns_csv="o_custkey",
        decimal_columns_csv_list=["o_totalprice"],
        decimal_columns_type_list=["12,2"],
        unicode_string_columns_csv="o_orderpriority",
    )
    out = {c.name: c for c in source_to_canonical_mappings(COLS, controls)}
    assert out["o_custkey"].data_type == C.INTEGER_4
    assert out["o_custkey"].from_override
    assert (
        out["o_totalprice"].data_type,
        out["o_totalprice"].data_precision,
        out["o_totalprice"].data_scale,
    ) == (C.DECIMAL, 12, 2)
    assert out["o_orderpriority"].char_semantics == C.CHAR_SEMANTICS_UNICODE
    # untouched columns keep the automatic mapping
    assert out["o_orderkey"].data_type == C.INTEGER_8


def test_unicode_on_non_string_raises():
    controls = ColumnControls(unicode_string_columns_csv="o_custkey")
    with pytest.raises(ColumnControlsError, match="not string based"):
        source_to_canonical_mappings(COLS, controls)


def test_override_beats_sampling_narrow_to_wide():
    """Sampling proposed tightening DECIMAL(15,2)->INTEGER_4 (narrow);
    the user override forces DECIMAL(38,18) (wide). Override wins —
    the reference never samples a user-overridden column."""
    sampled = {
        "o_totalprice": CanonicalColumn(
            "o_totalprice", C.INTEGER_4, safe_mapping=False
        )
    }
    controls = ColumnControls(
        decimal_columns_csv_list=["o_totalprice"],
        decimal_columns_type_list=["38,18"],
    )
    out = {
        c.name: c
        for c in source_to_canonical_mappings(COLS, controls, sampled=sampled)
    }
    assert out["o_totalprice"].data_type == C.DECIMAL
    assert out["o_totalprice"].data_precision == 38


def test_sampling_applies_where_no_override():
    sampled = {
        "o_totalprice": CanonicalColumn(
            "o_totalprice", C.INTEGER_4, safe_mapping=False
        )
    }
    out = {
        c.name: c for c in source_to_canonical_mappings(COLS, sampled=sampled)
    }
    assert out["o_totalprice"].data_type == C.INTEGER_4
    assert out["o_totalprice"].safe_mapping is False


def test_unsafe_mapping_is_one_way():
    """column_metadata.py:194-205: once a stage declares a mapping
    unsafe, a later 'safe' proposal cannot launder it back."""
    src = [
        CanonicalColumn(
            "v", C.DECIMAL, data_precision=20, data_scale=0, safe_mapping=False
        )
    ]
    sampled = {"v": CanonicalColumn("v", C.INTEGER_8, safe_mapping=True)}
    out = source_to_canonical_mappings(src, sampled=sampled)
    assert out[0].data_type == C.INTEGER_8
    assert out[0].safe_mapping is False  # one-way: stays unsafe


def test_offload_honors_controls_end_to_end(spark, tmp_path):
    """The controls flow through staging AND the final table: the
    written parquet carries the overridden Spark types."""
    from goe_spark.plans.offload import OffloadConfig, OffloadPipeline
    from tests.conftest import SF_SMALL

    src = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    cfg = OffloadConfig(
        owner="tpch",
        table_name="orders",
        target_dir=str(tmp_path / "final"),
        staging_dir=str(tmp_path / "staging"),
        metadata_dir=str(tmp_path / "meta"),
        partition=None,
        column_controls=ColumnControls(
            integer_4_columns_csv="o_custkey",
            decimal_columns_csv_list=["o_totalprice"],
            decimal_columns_type_list=["12,2"],
            variable_string_columns_csv="o_orderstatus",
            # o_totalprice is DOUBLE in the fixture; forcing it into
            # DECIMAL requires the float-leniency switch
            allow_floating_point_conversions=True,
        ),
    )
    res = OffloadPipeline(spark, cfg).run(src)
    assert res.rows_final == src.count()
    final = spark.read.parquet(cfg.target_dir)
    types = dict(final.dtypes)
    assert types["o_custkey"] == "int"
    assert types["o_totalprice"] == "decimal(12,2)"
    assert types["o_orderstatus"] == "string"
    # values survive the override cast
    assert (
        final.where(final.o_totalprice.isNull()).count()
        == src.where(src.o_totalprice.isNull()).count()
    )


def test_offload_from_spec_carries_controls(spark, tmp_path):
    """CLI/REST spec keys reach the pipeline (offload_from_spec is
    the shared code path behind both surfaces)."""
    from goe_spark.plans.offload import offload_from_spec
    from tests.conftest import SF_SMALL

    spec = {
        "table": "orders",
        "source_dir": SF_SMALL,
        "target_dir": str(tmp_path / "final"),
        "staging_dir": str(tmp_path / "staging"),
        "metadata_dir": str(tmp_path / "meta"),
        "integer_4_columns": "o_custkey",
        "decimal_columns": ["o_totalprice"],
        "decimal_columns_type": ["12,2"],
        "allow_floating_point_conversions": True,
    }
    out = offload_from_spec(spark, spec)
    assert out["rows_final"] > 0
    types = dict(spark.read.parquet(spec["target_dir"]).dtypes)
    assert types["o_custkey"] == "int"
    assert types["o_totalprice"] == "decimal(12,2)"
