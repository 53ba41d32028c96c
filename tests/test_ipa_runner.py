"""Chunked incremental offload driver (plans/ipa_runner.py): the
select -> chunk -> per-chunk pipeline loop with HWM advancing after
each verified chunk, and crash-resume between chunks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goe_spark.plans.ipa_runner import (
    discover_partitions,
    offload_partitioned_table,
)
from goe_spark.plans.metadata import MetadataStore
from goe_spark.plans.offload import (
    OffloadConfig,
    OffloadPipeline,
    OffloadValidationError,
    PartitionSpec,
)
from tests.conftest import SF_SMALL


def _cfg(tmp_path):
    return OffloadConfig(
        owner="sh",
        table_name="orders",
        target_dir=str(tmp_path / "final"),
        staging_dir=str(tmp_path / "staging"),
        metadata_dir=str(tmp_path / "md"),
        partition=PartitionSpec("o_orderdate", "date", "M"),
    )


@pytest.fixture()
def orders(spark):
    return spark.read.parquet(f"{SF_SMALL}/orders.parquet")


def test_discover_partitions_matches_distinct_months(spark, orders):
    cfg_part = PartitionSpec("o_orderdate", "date", "M")
    parts = discover_partitions(orders, cfg_part.expr())
    months = {
        r[0]
        for r in orders.select(cfg_part.expr().alias("m")).distinct().collect()
    }
    assert {p.high_value for p in parts} == months
    assert sum(p.row_count for p in parts) == orders.count()


def test_chunked_offload_covers_everything(spark, orders, tmp_path):
    cfg = _cfg(tmp_path)
    # Small chunk cap -> many chunks; every chunk one pipeline pass.
    res = offload_partitioned_table(
        spark, cfg, orders, max_chunk_count=20
    )
    assert res.chunks_run > 1
    assert res.rows_offloaded == orders.count()
    # HWMs strictly increase and the store holds the last one.
    assert res.hwms == sorted(res.hwms)
    md = MetadataStore(cfg.metadata_dir).get("sh", "orders")
    assert md.incremental_high_value == res.hwms[-1]
    final = spark.read.parquet(cfg.target_dir)
    assert final.count() == orders.count()

    # Idempotent: nothing left past the HWM, zero chunks on re-run.
    res2 = offload_partitioned_table(spark, cfg, orders, max_chunk_count=20)
    assert res2.chunks_run == 0
    assert spark.read.parquet(cfg.target_dir).count() == orders.count()


def test_crash_between_chunks_resumes_from_verified_hwm(
    spark, orders, tmp_path, monkeypatch
):
    cfg = _cfg(tmp_path)

    # Fail the pipeline's verification on the 3rd chunk.
    calls = {"n": 0}
    orig = OffloadPipeline._verify_count

    def flaky(self, check_df):
        calls["n"] += 1
        if calls["n"] == 3:
            return -1  # mismatch -> OffloadValidationError + rollback
        return orig(self, check_df)

    monkeypatch.setattr(OffloadPipeline, "_verify_count", flaky)
    with pytest.raises(OffloadValidationError):
        offload_partitioned_table(spark, cfg, orders, max_chunk_count=20)

    md = MetadataStore(cfg.metadata_dir).get("sh", "orders")
    assert md is not None  # two chunks committed before the crash
    hwm_after_crash = md.incremental_high_value
    committed = spark.read.parquet(cfg.target_dir).count()
    part_expr = cfg.partition.expr()
    expected_committed = orders.where(
        part_expr <= F.lit(hwm_after_crash)
    ).count()
    # The failed chunk's files were rolled back: target holds exactly
    # the verified chunks.
    assert committed == expected_committed

    # Resume: re-run picks up AFTER the recorded HWM and completes.
    monkeypatch.setattr(OffloadPipeline, "_verify_count", orig)
    res = offload_partitioned_table(spark, cfg, orders, max_chunk_count=20)
    assert res.chunks_run > 0
    assert spark.read.parquet(cfg.target_dir).count() == orders.count()


def test_cli_chunked_offload(tmp_path, capsys):
    from goe_spark.cli import main

    rc = main(
        [
            "offload",
            "--owner", "sh",
            "--table", "orders",
            "--source-dir", SF_SMALL,
            "--target-dir", str(tmp_path / "final"),
            "--staging-dir", str(tmp_path / "stage"),
            "--metadata-dir", str(tmp_path / "md"),
            "--partition-column", "o_orderdate",
            "--partition-kind", "date",
            "--granularity", "M",
            "--chunked",
            "--max-chunk-count", "25",
        ]
    )
    assert rc == 0
    import json

    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["chunks"] > 1
    assert out["rows_offloaded"] > 0
    assert out["hwms"] == sorted(out["hwms"])


class TestListPartitionAppend:
    def _cfg(self, tmp_path):
        return OffloadConfig(
            owner="sh",
            table_name="orders",
            target_dir=str(tmp_path / "final"),
            staging_dir=str(tmp_path / "staging"),
            metadata_dir=str(tmp_path / "md"),
        )

    def test_lpa_by_value_then_resume(self, spark, orders, tmp_path):
        from goe_spark.plans.ipa_runner import offload_list_partitions

        cfg = self._cfg(tmp_path)
        res = offload_list_partitions(
            spark, cfg, orders, "o_orderpriority",
            requested_values=["1-URGENT", "2-HIGH"],
            max_chunk_count=1,  # one value per chunk
        )
        assert res.chunks_run == 2
        expected = orders.where(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        ).count()
        assert res.rows_offloaded == expected
        assert spark.read.parquet(cfg.target_dir).count() == expected

        md = MetadataStore(cfg.metadata_dir).get("sh", "orders")
        assert md.offload_type == "LIST"
        assert set(md.offloaded_high_values) == {"1-URGENT", "2-HIGH"}

        # Re-requesting an offloaded value is a no-op (selection drops
        # it); adding a new one appends only the new slice.
        res2 = offload_list_partitions(
            spark, cfg, orders, "o_orderpriority",
            requested_values=["1-URGENT", "3-MEDIUM"],
        )
        assert res2.chunks_run == 1
        total = orders.where(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")
        ).count()
        assert spark.read.parquet(cfg.target_dir).count() == total

    def test_pipeline_rejects_double_offload_of_value(
        self, spark, orders, tmp_path
    ):
        from dataclasses import replace

        cfg = replace(
            self._cfg(tmp_path),
            list_partition_column="o_orderpriority",
            list_partition_values=["1-URGENT"],
        )
        OffloadPipeline(spark, cfg).run(orders)
        with pytest.raises(OffloadValidationError, match="already offloaded"):
            OffloadPipeline(spark, cfg).run(orders)


def test_spec_lpa_via_listener_shape(spark, orders, tmp_path):
    """The flat offload spec (CLI + listener) carries LIST values."""
    from goe_spark.plans.offload import offload_from_spec

    out = offload_from_spec(
        spark,
        {
            "owner": "sh",
            "table": "orders",
            "source_dir": SF_SMALL,
            "target_dir": str(tmp_path / "final"),
            "staging_dir": str(tmp_path / "stage"),
            "metadata_dir": str(tmp_path / "md"),
            "list_partition_column": "o_orderpriority",
            "list_partition_values": ["1-URGENT"],
        },
    )
    expected = orders.where(F.col("o_orderpriority") == "1-URGENT").count()
    assert out["rows_final"] == expected
    md = MetadataStore(str(tmp_path / "md")).get("sh", "orders")
    assert md.offloaded_high_values == ["1-URGENT"]


def test_chunked_spec_rejects_predicate_and_list(spark, tmp_path):
    """Chunk 2 would refuse a predicate chunk 1 already recorded —
    the spec path must fail up front instead of half-offloading."""
    from goe_spark.plans.offload import (
        OffloadValidationError,
        offload_from_spec,
    )

    base = {
        "owner": "sh",
        "table": "orders",
        "source_dir": SF_SMALL,
        "target_dir": str(tmp_path / "final"),
        "staging_dir": str(tmp_path / "stage"),
        "metadata_dir": str(tmp_path / "md"),
        "partition_column": "o_orderdate",
        "chunked": True,
    }
    with pytest.raises(OffloadValidationError, match="chunked"):
        offload_from_spec(
            spark,
            {**base, "predicate": 'column(o_orderpriority) = string("1-URGENT")'},
        )
    with pytest.raises(OffloadValidationError, match="chunked"):
        offload_from_spec(
            spark,
            {
                **base,
                "list_partition_column": "o_orderpriority",
                "list_partition_values": ["1-URGENT"],
            },
        )


def test_lpa_date_values_not_reoffloaded_after_json_roundtrip(
    spark, tmp_path
):
    """LIST values that JSON stringifies (dates) must still be
    recognized as already offloaded on the next run."""
    import datetime

    from goe_spark.plans.ipa_runner import offload_list_partitions

    src = spark.createDataFrame(
        [(i, datetime.date(2024, 1 + i % 2, 1)) for i in range(20)],
        "id long, d date",
    )
    cfg = OffloadConfig(
        owner="sh",
        table_name="t",
        target_dir=str(tmp_path / "final"),
        staging_dir=str(tmp_path / "stage"),
        metadata_dir=str(tmp_path / "md"),
    )
    res = offload_list_partitions(
        spark, cfg, src, "d",
        requested_values=[datetime.date(2024, 1, 1)],
    )
    assert res.chunks_run == 1
    n = spark.read.parquet(cfg.target_dir).count()
    assert n == 10
    # Second run with the SAME date value: recognized via the stored
    # string form, nothing re-offloaded.
    res2 = offload_list_partitions(
        spark, cfg, src, "d",
        requested_values=[datetime.date(2024, 1, 1)],
    )
    assert res2.chunks_run == 0
    assert spark.read.parquet(cfg.target_dir).count() == n
