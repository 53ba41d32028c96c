"""Sort/cluster columns on write (--sort-columns).

Reference spec: src/goe/offload/operation/sort_columns.py:76-160 and
scenario tests/integration/scenarios/test_offload_sorting.py —
resolution against metadata (NO_CHANGE / NONE sentinels), existence +
type validation, the 4-column cap, and a final table physically
ordered on the sort key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goe_spark.plans.sort_columns import (
    MAX_SORT_COLUMNS,
    SORT_COLUMNS_NO_CHANGE,
    SORT_COLUMNS_NONE,
    SortColumnsError,
    apply_sort_on_write,
    resolve_sort_columns,
)
from goe_spark.types import canonical as C
from goe_spark.types.canonical import CanonicalColumn
from tests.conftest import SF_SMALL

COLS = [
    CanonicalColumn("l_orderkey", C.INTEGER_8),
    CanonicalColumn("l_shipdate", C.DATE),
    CanonicalColumn("l_quantity", C.DECIMAL, data_precision=12, data_scale=2),
    CanonicalColumn("l_comment", C.VARIABLE_STRING),
    CanonicalColumn("l_tax", C.DOUBLE),
]


def test_no_change_keeps_prior_metadata():
    assert resolve_sort_columns(
        SORT_COLUMNS_NO_CHANGE, ["l_shipdate"], COLS
    ) == ["l_shipdate"]
    assert resolve_sort_columns(None, ["l_shipdate"], COLS) == ["l_shipdate"]
    assert resolve_sort_columns(SORT_COLUMNS_NO_CHANGE, None, COLS) is None


def test_none_clears():
    assert resolve_sort_columns(SORT_COLUMNS_NONE, ["l_shipdate"], COLS) is None


def test_csv_resolution_and_wildcards():
    assert resolve_sort_columns("l_shipdate,l_orderkey", None, COLS) == [
        "l_shipdate",
        "l_orderkey",
    ]
    assert resolve_sort_columns("L_SHIPDATE", None, COLS) == ["l_shipdate"]


def test_missing_column_raises():
    with pytest.raises(SortColumnsError, match="does not exist"):
        resolve_sort_columns("nope", None, COLS)


def test_unsortable_type_raises():
    with pytest.raises(SortColumnsError, match="not a sortable type"):
        resolve_sort_columns("l_tax", None, COLS)  # DOUBLE


def test_too_many_sort_columns_raise():
    cols = [CanonicalColumn(f"c{i}", C.INTEGER_4) for i in range(6)]
    csv = ",".join(f"c{i}" for i in range(MAX_SORT_COLUMNS + 1))
    with pytest.raises(SortColumnsError, match="Too many"):
        resolve_sort_columns(csv, None, cols)


def test_sort_is_map_side_in_plan(spark):
    """The write-side sort must be WITHIN partitions (global=false):
    a global orderBy would add a range-exchange shuffle."""
    df = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    plan = apply_sort_on_write(
        df, ["l_shipdate"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Sort [" in plan
    assert "false, 0" in plan  # Sort [...], false, 0 = non-global sort
    assert "Exchange" not in plan  # no shuffle introduced


def test_offload_sorted_final_files(spark, tmp_path):
    """End-to-end: every final parquet file is internally ordered on
    the sort key, and the choice persists in metadata (NO_CHANGE on a
    later offload retains it)."""
    from goe_spark.plans.metadata import MetadataStore
    from goe_spark.plans.offload import OffloadConfig, OffloadPipeline

    src = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    cfg = OffloadConfig(
        owner="tpch",
        table_name="lineitem",
        target_dir=str(tmp_path / "final"),
        staging_dir=str(tmp_path / "staging"),
        metadata_dir=str(tmp_path / "meta"),
        partition=None,
        sort_columns_csv="l_shipdate",
    )
    OffloadPipeline(spark, cfg).run(src)

    final = spark.read.parquet(cfg.target_dir)
    files = [
        r.f
        for r in final.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    ]
    assert files
    for f in files:
        vals = [
            r.l_shipdate
            for r in spark.read.parquet(f).select("l_shipdate").collect()
        ]
        assert vals == sorted(vals), f"file not sorted: {f}"

    md = MetadataStore(str(tmp_path / "meta")).get("tpch", "lineitem")
    assert md.offload_sort_columns == ["l_shipdate"]

    # A second offload with the default sentinel keeps the choice.
    cfg2 = OffloadConfig(
        owner="tpch",
        table_name="lineitem",
        target_dir=str(tmp_path / "final"),
        staging_dir=str(tmp_path / "staging"),
        metadata_dir=str(tmp_path / "meta"),
        partition=None,
        sort_columns_csv=SORT_COLUMNS_NO_CHANGE,
    )
    OffloadPipeline(spark, cfg2).run(src)
    md2 = MetadataStore(str(tmp_path / "meta")).get("tpch", "lineitem")
    assert md2.offload_sort_columns == ["l_shipdate"]
