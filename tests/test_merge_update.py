"""Keyed merge/upsert (plans/merge_update.py): update-in-place,
insert, partition move, byte-stability, healing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from goe_spark.plans.merge_update import merge_rows
from goe_spark.plans.offload import OffloadConfig, OffloadPipeline, PartitionSpec
from tests.conftest import SF_SMALL

SPEC = PartitionSpec(source_column="o_orderdate", kind="date", granularity="M")


@pytest.fixture
def offloaded(spark, tmp_path):
    src = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    cfg = OffloadConfig(
        owner="tpch",
        table_name="orders",
        target_dir=str(tmp_path / "final"),
        staging_dir=str(tmp_path / "staging"),
        metadata_dir=str(tmp_path / "meta"),
        partition=SPEC,
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


def test_update_in_place(spark, offloaded):
    target, src = offloaded
    victim = src.orderBy("o_orderkey").first()
    updates = spark.createDataFrame(
        [
            (
                victim.o_orderkey,
                victim.o_custkey,
                victim.o_orderstatus,
                999999.0,
                victim.o_orderdate,
                victim.o_orderpriority,
            )
        ],
        src.schema,
    )
    rep = merge_rows(spark, target, "o_orderkey", updates, SPEC)
    assert rep.rows_updated == 1 and rep.rows_inserted == 0
    after = spark.read.parquet(target)
    assert after.count() == src.count()  # replaced, not added
    got = after.where(F.col("o_orderkey") == victim.o_orderkey).first()
    assert got.o_totalprice == 999999.0


def test_insert_new_key(spark, offloaded):
    target, src = offloaded
    new_key = src.agg(F.max("o_orderkey")).first()[0] + 1000
    row = src.first()
    updates = spark.createDataFrame(
        [
            (
                new_key,
                row.o_custkey,
                "O",
                1.0,
                row.o_orderdate,
                row.o_orderpriority,
            )
        ],
        src.schema,
    )
    rep = merge_rows(spark, target, "o_orderkey", updates, SPEC)
    assert rep.rows_updated == 0 and rep.rows_inserted == 1
    after = spark.read.parquet(target)
    assert after.count() == src.count() + 1
    assert after.where(F.col("o_orderkey") == new_key).count() == 1


def test_partition_move(spark, offloaded):
    """An updated partition-source value MOVES the row: gone from the
    old partition, present (once) in the new one."""
    target, src = offloaded
    victim = src.orderBy("o_orderkey").first()
    old_part = victim.o_orderdate.strftime("%Y-%m")
    new_date = victim.o_orderdate.replace(year=victim.o_orderdate.year + 1)
    updates = spark.createDataFrame(
        [
            (
                victim.o_orderkey,
                victim.o_custkey,
                victim.o_orderstatus,
                victim.o_totalprice,
                new_date,
                victim.o_orderpriority,
            )
        ],
        src.schema,
    )
    rep = merge_rows(spark, target, "o_orderkey", updates, SPEC)
    assert rep.rows_updated == 1 and rep.rows_inserted == 0
    after = spark.read.option("basePath", target).parquet(target)
    rows = after.where(F.col("o_orderkey") == victim.o_orderkey).collect()
    assert len(rows) == 1
    assert str(rows[0].goe_part_key) != old_part
    assert after.count() == src.count()


def test_untouched_partitions_stay_byte_identical(spark, offloaded):
    target, src = offloaded
    victim = src.first()
    updates = spark.createDataFrame([tuple(victim)], src.schema)
    files_before = _file_map(target)
    rep = merge_rows(spark, target, "o_orderkey", updates, SPEC)
    files_after = _file_map(target)
    touched = {d for d, _, _ in rep.details}
    assert touched  # at least the victim's partition rewrote
    for d, fmap in files_before.items():
        if d not in touched:
            assert files_after[d] == fmap, f"{d} was rewritten needlessly"


def test_missing_columns_rejected(spark, offloaded):
    target, src = offloaded
    with pytest.raises(ValueError, match="missing"):
        merge_rows(
            spark,
            target,
            "o_orderkey",
            src.select("o_orderkey"),
            SPEC,
        )
