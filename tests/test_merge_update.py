"""Keyed merge/upsert (plans/merge_update.py): update-in-place,
insert, partition move, byte-stability, CDC dedup enforcement, null
partition values."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goe_spark.plans.merge_update import merge_rows
from tests.conftest import partition_file_map


def test_update_in_place(spark, offloaded_orders):
    target, src, spec = offloaded_orders
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
    rep = merge_rows(spark, target, "o_orderkey", updates, spec)
    assert rep.rows_updated == 1 and rep.rows_inserted == 0
    after = spark.read.parquet(target)
    assert after.count() == src.count()  # replaced, not added
    got = after.where(F.col("o_orderkey") == victim.o_orderkey).first()
    assert got.o_totalprice == 999999.0


def test_insert_new_key(spark, offloaded_orders):
    target, src, spec = offloaded_orders
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
    rep = merge_rows(spark, target, "o_orderkey", updates, spec)
    assert rep.rows_updated == 0 and rep.rows_inserted == 1
    after = spark.read.parquet(target)
    assert after.count() == src.count() + 1
    assert after.where(F.col("o_orderkey") == new_key).count() == 1


def test_partition_move(spark, offloaded_orders):
    """An updated partition-source value MOVES the row: gone from the
    old partition, present (once) in the new one."""
    target, src, spec = offloaded_orders
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
    rep = merge_rows(spark, target, "o_orderkey", updates, spec)
    assert rep.rows_updated == 1 and rep.rows_inserted == 0
    after = spark.read.option("basePath", target).parquet(target)
    rows = after.where(F.col("o_orderkey") == victim.o_orderkey).collect()
    assert len(rows) == 1
    assert str(rows[0].goe_part_key) != old_part
    assert after.count() == src.count()


def test_untouched_partitions_stay_byte_identical(spark, offloaded_orders):
    target, src, spec = offloaded_orders
    victim = src.first()
    updates = spark.createDataFrame([tuple(victim)], src.schema)
    files_before = partition_file_map(target)
    merge_rows(spark, target, "o_orderkey", updates, spec)
    files_after = partition_file_map(target)
    victim_part = f"goe_part_key={victim.o_orderdate.strftime('%Y-%m')}"
    changed = {
        d
        for d in files_before
        if files_after.get(d) != files_before[d]
    }
    assert changed == {victim_part}


def test_duplicate_update_keys_rejected(spark, offloaded_orders):
    target, src, spec = offloaded_orders
    row = src.first()
    updates = spark.createDataFrame([tuple(row), tuple(row)], src.schema)
    with pytest.raises(ValueError, match="unique"):
        merge_rows(spark, target, "o_orderkey", updates, spec)


def test_null_partition_value_lands_and_survives(spark, offloaded_orders):
    """An update with a NULL partition-source value lands in the Hive
    default-partition directory (not silently dropped) and is
    retrievable."""
    target, src, spec = offloaded_orders
    row = src.first()
    new_key = src.agg(F.max("o_orderkey")).first()[0] + 5000
    updates = spark.createDataFrame(
        [(new_key, row.o_custkey, "O", 2.0, None, row.o_orderpriority)],
        src.schema,
    )
    rep = merge_rows(spark, target, "o_orderkey", updates, spec)
    assert rep.rows_inserted == 1
    after = spark.read.parquet(target)
    assert after.where(F.col("o_orderkey") == new_key).count() == 1


def test_missing_columns_rejected(spark, offloaded_orders):
    target, src, spec = offloaded_orders
    with pytest.raises(ValueError, match="missing"):
        merge_rows(spark, target, "o_orderkey", src.select("o_orderkey"), spec)


def test_merge_heals_crashed_phase_b(spark, offloaded_orders):
    """A crash between the delete phase and the append leaves the
    staged copy + marker on disk; the next merge completes it first —
    no updated row is ever lost."""
    import os

    from goe_spark.plans.merge_update import (
        MERGE_MARKER,
        MERGE_STAGING_DIR,
        heal_pending_merge,
    )
    from goe_spark.plans.metadata import atomic_write_json
    from goe_spark.plans.targeted_delete import delete_rows

    target, src, spec = offloaded_orders
    victim = src.orderBy("o_orderkey").first()
    updates = spark.createDataFrame(
        [
            (
                victim.o_orderkey,
                victim.o_custkey,
                victim.o_orderstatus,
                123456.0,
                victim.o_orderdate,
                victim.o_orderpriority,
            )
        ],
        src.schema,
    )
    # Simulate the crash point: staged + marker + phase A done, no
    # phase B append.
    staging = os.path.join(target, MERGE_STAGING_DIR)
    updates.withColumn("goe_part_key", spec.expr()).write.parquet(staging)
    atomic_write_json(
        os.path.join(target, MERGE_MARKER),
        {"key_column": "o_orderkey", "partition_col": "goe_part_key"},
    )
    delete_rows(spark, target, "o_orderkey", [victim.o_orderkey])
    assert (
        spark.read.parquet(target)
        .where(F.col("o_orderkey") == victim.o_orderkey)
        .count()
        == 0
    )  # the dangerous window

    assert heal_pending_merge(spark, target)
    after = spark.read.parquet(target)
    got = after.where(F.col("o_orderkey") == victim.o_orderkey).collect()
    assert len(got) == 1 and got[0].o_totalprice == 123456.0
    assert not os.path.exists(os.path.join(target, MERGE_MARKER))
    assert not os.path.exists(staging)


def test_heal_is_idempotent_after_full_completion(spark, offloaded_orders):
    from goe_spark.plans.merge_update import heal_pending_merge

    target, _, _ = offloaded_orders
    assert heal_pending_merge(spark, target) is False


def test_null_key_updates_rejected(spark, offloaded_orders):
    """A NULL merge key can never be replaced (semi/anti joins skip
    NULLs) — merge would silently append a duplicate per run, so it
    must refuse."""
    target, src, spec = offloaded_orders
    row = src.first()
    updates = spark.createDataFrame(
        [
            (
                None,
                row.o_custkey,
                "O",
                1.0,
                row.o_orderdate,
                row.o_orderpriority,
            )
        ],
        src.schema,
    )
    with pytest.raises(ValueError, match="NULL o_orderkey"):
        merge_rows(spark, target, "o_orderkey", updates, spec)
