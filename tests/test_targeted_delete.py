"""Targeted delete (plans/targeted_delete.py): partition-bounded
rewrite, byte-stability of untouched partitions, crash healing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from goe_spark.plans.offload import OffloadConfig, OffloadPipeline, PartitionSpec
from goe_spark.plans.targeted_delete import delete_rows
from tests.conftest import SF_SMALL


@pytest.fixture
def offloaded(spark, tmp_path):
    src = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    cfg = OffloadConfig(
        owner="tpch",
        table_name="orders",
        target_dir=str(tmp_path / "final"),
        staging_dir=str(tmp_path / "staging"),
        metadata_dir=str(tmp_path / "meta"),
        partition=PartitionSpec(
            source_column="o_orderdate", kind="date", granularity="M"
        ),
    )
    OffloadPipeline(spark, cfg).run(src)
    return cfg.target_dir, src


def _file_map(path):
    out = {}
    for d in os.listdir(path):
        full = os.path.join(path, d)
        if d.startswith("goe_part_key=") and os.path.isdir(full):
            out[d] = {
                f: os.path.getmtime(os.path.join(full, f))
                for f in os.listdir(full)
                if not f.startswith(("_", "."))
            }
    return out


def test_delete_removes_only_requested_rows(spark, offloaded):
    target, src = offloaded
    doomed = [r[0] for r in src.select("o_orderkey").limit(5).collect()]
    before = spark.read.parquet(target).count()

    rep = delete_rows(spark, target, "o_orderkey", doomed)
    assert rep.rows_deleted == 5
    after = spark.read.parquet(target)
    assert after.count() == before - 5
    assert after.where(F.col("o_orderkey").isin(doomed)).count() == 0


def test_untouched_partitions_stay_byte_identical(spark, offloaded):
    target, src = offloaded
    # One key -> at most a couple of affected partitions.
    doomed = [src.select("o_orderkey").first()[0]]
    files_before = _file_map(target)
    rep = delete_rows(spark, target, "o_orderkey", doomed)
    files_after = _file_map(target)
    assert rep.partitions_affected >= 1
    touched = {d for d, _ in rep.details}
    for d, fmap in files_before.items():
        if d not in touched:
            assert files_after[d] == fmap, f"{d} was rewritten needlessly"


def test_delete_with_dataframe_keyset(spark, offloaded):
    target, src = offloaded
    keys_df = src.select("o_orderkey").limit(7)
    n_keys = keys_df.count()
    before = spark.read.parquet(target).count()
    rep = delete_rows(spark, target, "o_orderkey", keys_df)
    assert rep.rows_deleted == n_keys
    assert spark.read.parquet(target).count() == before - n_keys


def test_delete_is_idempotent(spark, offloaded):
    target, src = offloaded
    doomed = [r[0] for r in src.select("o_orderkey").limit(3).collect()]
    delete_rows(spark, target, "o_orderkey", doomed)
    rep2 = delete_rows(spark, target, "o_orderkey", doomed)
    assert rep2.rows_deleted == 0
    assert rep2.partitions_affected == 0


def test_delete_heals_interrupted_swap(spark, offloaded, tmp_path):
    """A marker left by a crash mid-swap is completed before the new
    delete runs (same healing contract as compaction)."""
    import json

    from goe_spark.plans.compaction import _data_files, _tmp_dir

    target, src = offloaded
    part = next(
        d for d in sorted(os.listdir(target)) if d.startswith("goe_part_key=")
    )
    full = os.path.join(target, part)
    old_files = _data_files(full)
    # Simulate: rewritten data in tmp, marker written, crash before
    # the swap touched the partition.
    part_df = spark.read.parquet(full)
    n_rows = part_df.count()
    part_df.write.mode("overwrite").parquet(_tmp_dir(target, part))
    with open(
        os.path.join(target, f".compact_swap.{part}.json"), "w"
    ) as fh:
        json.dump({"partition": part, "old_files": old_files}, fh)

    rep = delete_rows(spark, target, "o_orderkey", [-1])  # no-op key
    assert rep.partitions_healed == 1
    assert spark.read.parquet(full).count() == n_rows
    assert not os.path.exists(_tmp_dir(target, part))


def test_unpartitioned_target_rejected(spark, tmp_path):
    src = spark.read.parquet(f"{SF_SMALL}/region.parquet")
    flat = str(tmp_path / "flat")
    src.write.parquet(flat)
    with pytest.raises(ValueError, match="not partitioned"):
        delete_rows(spark, flat, "r_regionkey", [0])
