"""--offload-type resolution (FULL/INCREMENTAL, the reference's
get_offload_type_for_config) and --reset-backend-table semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goe_spark.plans.metadata import MetadataStore, OffloadMetadata
from goe_spark.plans.offload import OffloadConfig, OffloadPipeline, PartitionSpec
from goe_spark.plans.partitions import (
    OFFLOAD_TYPE_FULL,
    OFFLOAD_TYPE_INCREMENTAL,
    PartitionSelectionError,
    resolve_offload_type,
)
from tests.conftest import SF_SMALL


def _cfg(tmp_path, **kw):
    base = dict(
        owner="tpch",
        table_name="lineitem",
        target_dir=str(tmp_path / "final"),
        staging_dir=str(tmp_path / "staging"),
        metadata_dir=str(tmp_path / "meta"),
        partition=PartitionSpec(
            source_column="l_shipdate", kind="date", granularity="M"
        ),
    )
    base.update(kw)
    return OffloadConfig(**base)


# --- the pure rule table (offload_source_data.py:291-349) ------------------


def test_user_request_wins():
    ot, hwm, _ = resolve_offload_type("FULL", True, True, None)
    assert ot == OFFLOAD_TYPE_FULL
    assert hwm  # ida options keep the boundary (100/10)
    ot, hwm, _ = resolve_offload_type("INCREMENTAL", True, False, None)
    assert ot == OFFLOAD_TYPE_INCREMENTAL and hwm


def test_incremental_downgrades_without_capability():
    ot, _, notes = resolve_offload_type("INCREMENTAL", False, False, None)
    assert ot == OFFLOAD_TYPE_FULL
    assert any("FULL" in n for n in notes)


def test_metadata_carries_forward():
    md = OffloadMetadata(
        owner="o", table_name="t", incremental_high_value="2012-02"
    )
    ot, hwm, _ = resolve_offload_type(None, True, False, md)
    assert ot == OFFLOAD_TYPE_INCREMENTAL and hwm
    fresh = OffloadMetadata(owner="o", table_name="t")
    ot, hwm, _ = resolve_offload_type(None, True, False, fresh)
    assert ot == OFFLOAD_TYPE_FULL and not hwm


def test_ida_options_imply_incremental():
    ot, hwm, _ = resolve_offload_type(None, True, True, None)
    assert ot == OFFLOAD_TYPE_INCREMENTAL and hwm
    ot, hwm, _ = resolve_offload_type(None, False, False, None)
    assert ot == OFFLOAD_TYPE_FULL and not hwm


def test_bad_type_rejected():
    with pytest.raises(PartitionSelectionError):
        resolve_offload_type("PARTIAL", True, False, None)


# --- 100/10: FULL with a boundary ------------------------------------------


def test_full_with_hwm_moves_everything_records_boundary(spark, tmp_path):
    """--offload-type FULL with --hwm is the reference's 100/10:
    every row moves (replace semantics), but the requested boundary
    still lands in metadata and the hybrid view splits on it exactly
    once (backend serves at/below, frontend above)."""
    from goe_spark.plans.hybrid_view import hybrid_view_df

    src = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    cfg = _cfg(tmp_path, hwm="1997-12", offload_type="FULL")
    res = OffloadPipeline(spark, cfg).run(src)
    assert res.rows_final == src.count()  # everything moved
    md = MetadataStore(cfg.metadata_dir).get("tpch", "lineitem")
    assert md.offload_type == "RANGE"
    assert md.incremental_high_value == "1997-12"
    assert max(res.partitions_written) > "1997-12"  # beyond the HWM

    hybrid = hybrid_view_df(spark, md, cfg.target_dir, src)
    assert hybrid.count() == src.count()  # exactly once, no dupes


def test_incremental_without_partition_downgrades(spark, tmp_path):
    """INCREMENTAL on an unpartitioned table falls back to FULL (the
    reference warns and continues)."""
    src = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    cfg = _cfg(
        tmp_path,
        table_name="orders",
        partition=None,
        offload_type="INCREMENTAL",
    )
    res = OffloadPipeline(spark, cfg).run(src)
    assert res.rows_final == src.count()
    md = MetadataStore(cfg.metadata_dir).get("tpch", "orders")
    assert md.incremental_high_value is None


# --- reset-backend-table ----------------------------------------------------


def test_reset_drops_table_and_metadata(spark, tmp_path):
    """After an incremental offload, a reset re-offload starts from
    scratch: no metadata carry-over, no leftover rows."""
    src = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    r1 = OffloadPipeline(spark, _cfg(tmp_path, hwm="1997-12")).run(src)
    assert r1.rows_final < src.count()

    cfg2 = _cfg(tmp_path, hwm="1996-12", reset_backend_table=True)
    r2 = OffloadPipeline(spark, cfg2).run(src)
    assert "RESET_BACKEND_TABLE" in r2.steps
    # Without reset, hwm 1996-12 <= stored 1997-12 would select
    # nothing; reset wiped the HWM so the slice is served fresh.
    assert r2.rows_final > 0
    md = MetadataStore(cfg2.metadata_dir).get("tpch", "lineitem")
    assert md.incremental_high_value == "1996-12"
    final = spark.read.parquet(cfg2.target_dir)
    expected = src.where(
        F.date_format("l_shipdate", "yyyy-MM") <= "1996-12"
    ).count()
    assert final.count() == expected


def test_reset_records_drop_on_warehouse_writer(spark, tmp_path):
    from goe_spark.sinks.backend_writer import FakeWarehouseWriter

    src = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    writer = FakeWarehouseWriter(str(tmp_path / "wh"))
    cfg = _cfg(
        tmp_path,
        table_name="orders",
        partition=None,
        backend_writer=writer,
    )
    OffloadPipeline(spark, cfg).run(src)
    cfg2 = _cfg(
        tmp_path,
        table_name="orders",
        partition=None,
        backend_writer=writer,
        reset_backend_table=True,
    )
    OffloadPipeline(spark, cfg2).run(src)
    assert any(c.startswith("DROP TABLE") for c in writer.commands)
    assert writer.read_final(spark).count() == src.count()


def test_cli_reset_requires_force(tmp_path):
    from goe_spark.cli import main

    rc = main(
        [
            "offload",
            "--table",
            "orders",
            "--source-dir",
            SF_SMALL,
            "--target-dir",
            str(tmp_path / "f"),
            "--staging-dir",
            str(tmp_path / "s"),
            "--metadata-dir",
            str(tmp_path / "m"),
            "--reset-backend-table",
        ]
    )
    assert rc == 2
