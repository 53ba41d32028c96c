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


# --- review-finding regressions ---------------------------------------------


def test_full_with_list_values_moves_everything(spark, tmp_path):
    """FULL + LIST values is 100/10 for the LIST shape: everything
    moves, the values land in metadata as the view boundary."""
    from goe_spark.plans.hybrid_view import hybrid_view_df

    src = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    cfg = _cfg(
        tmp_path,
        table_name="orders",
        partition=None,
        offload_type="FULL",
        list_partition_column="o_orderpriority",
        list_partition_values=["1-URGENT"],
    )
    res = OffloadPipeline(spark, cfg).run(src)
    assert res.rows_final == src.count()  # NOT just the urgent slice
    md = MetadataStore(cfg.metadata_dir).get("tpch", "orders")
    assert md.offload_type == "LIST"
    assert md.offloaded_high_values == ["1-URGENT"]
    hybrid = hybrid_view_df(spark, md, cfg.target_dir, src)
    assert hybrid.count() == src.count()


def test_full_conversion_clears_stale_boundary(spark, tmp_path):
    """90/10 then explicit FULL (no ida options) is the 100/0
    conversion: the stale RANGE boundary must be cleared or the
    hybrid view keeps sourcing above-boundary rows from a frontend
    that is about to be retired."""
    from goe_spark.plans.hybrid_view import hybrid_view_df

    src = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    OffloadPipeline(spark, _cfg(tmp_path, hwm="1997-12")).run(src)
    cfg2 = _cfg(tmp_path, offload_type="FULL")
    res = OffloadPipeline(spark, cfg2).run(src)
    assert res.rows_final == src.count()
    md = MetadataStore(cfg2.metadata_dir).get("tpch", "lineitem")
    assert md.offload_type == "FULL"
    assert md.incremental_high_value is None
    # The hybrid view is now backend-only and complete.
    empty_frontend = src.limit(0)
    hybrid = hybrid_view_df(spark, md, cfg2.target_dir, empty_frontend)
    assert hybrid.count() == src.count()


def test_downgrade_note_surfaces(spark, tmp_path):
    src = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    cfg = _cfg(
        tmp_path,
        table_name="orders",
        partition=None,
        offload_type="INCREMENTAL",
    )
    res = OffloadPipeline(spark, cfg).run(src)
    assert any("FULL" in n for n in res.notes)


def test_reset_rejected_with_ddl_file(spark, tmp_path):
    from goe_spark.plans.offload import OffloadValidationError

    src = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    cfg = _cfg(
        tmp_path,
        table_name="orders",
        partition=None,
        ddl_file=str(tmp_path / "out.sql"),
        reset_backend_table=True,
    )
    with pytest.raises(OffloadValidationError, match="preview-only"):
        OffloadPipeline(spark, cfg).run(src)


def test_chunked_rejects_offload_type(spark, tmp_path):
    from goe_spark.plans.offload import (
        OffloadValidationError,
        offload_from_spec,
    )

    spec = {
        "table": "lineitem",
        "source_dir": SF_SMALL,
        "target_dir": str(tmp_path / "f"),
        "staging_dir": str(tmp_path / "s"),
        "metadata_dir": str(tmp_path / "m"),
        "partition_column": "l_shipdate",
        "chunked": True,
        "offload_type": "FULL",
    }
    with pytest.raises(OffloadValidationError, match="offload-type"):
        offload_from_spec(None, spec)


def test_chunked_reset_resets_once_then_reoffloads_all(spark, tmp_path):
    """Chunked + reset: the reset happens once up front (before the
    prior HWM is read), so the full history below the cap is
    re-offloaded and nothing below the old HWM is lost."""
    from goe_spark.plans.offload import offload_from_spec

    spec = {
        "table": "lineitem",
        "source_dir": SF_SMALL,
        "target_dir": str(tmp_path / "f"),
        "staging_dir": str(tmp_path / "s"),
        "metadata_dir": str(tmp_path / "m"),
        "partition_column": "l_shipdate",
        "hwm": "1997-12",
    }
    offload_from_spec(spark, dict(spec))  # unchunked 90/10 first

    spec2 = dict(spec, chunked=True, hwm="1998-12", reset_backend_table=True)
    out = offload_from_spec(spark, spec2)
    src = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    expected = src.where(
        F.date_format("l_shipdate", "yyyy-MM") <= "1998-12"
    ).count()
    assert out["rows_offloaded"] == expected
    final = spark.read.parquet(spec["target_dir"])
    assert final.count() == expected  # rows <= 1997-12 re-offloaded


def test_predicate_hybrid_keeps_null_eval_rows(spark, tmp_path):
    """A row for which every offloaded predicate evaluates NULL was
    never offloaded and must stay frontend-side, not vanish."""
    from goe_spark.plans.hybrid_view import hybrid_view_df

    rows = [(1, 150.0), (2, 50.0), (3, None)]
    src = spark.createDataFrame(rows, "id long, amount double")
    backend_path = str(tmp_path / "backend")
    src.where("amount > 100").write.parquet(backend_path)
    md = OffloadMetadata(
        owner="sh",
        table_name="t",
        offload_type="PREDICATE",
        offloaded_predicates=["amount > 100"],
    )
    hybrid = hybrid_view_df(spark, md, backend_path, src)
    assert sorted(r.id for r in hybrid.collect()) == [1, 2, 3]
