"""Streaming CDC apply (streaming/cdc.py): end-to-end drain equals the
batch merge result, within-batch collapse keeps only the latest
version per key, deletes apply, re-delivery is idempotent with and
without the ledger entry, duplicate (key, seq) rejected."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goe_spark.streaming.cdc import (
    collapse_batch,
    make_cdc_sink,
    stream_cdc_apply,
)

CDC_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
    "cdc_seq",
    "cdc_op",
)


def _cdc_df(spark, src, rows):
    """rows: list of (base_row, seq, op, price_override)."""
    data = [
        (
            r.o_orderkey,
            r.o_custkey,
            r.o_orderstatus,
            price if price is not None else r.o_totalprice,
            r.o_orderdate,
            r.o_orderpriority,
            seq,
            op,
        )
        for (r, seq, op, price) in rows
    ]
    schema = src.schema.add("cdc_seq", "long").add("cdc_op", "string")
    return spark.createDataFrame(data, schema)


def test_collapse_keeps_latest_version(spark, offloaded_orders):
    _, src, _ = offloaded_orders
    r = src.first()
    batch = _cdc_df(
        spark, src, [(r, 1, "U", 10.0), (r, 3, "U", 30.0), (r, 2, "U", 20.0)]
    )
    got = collapse_batch(batch, "o_orderkey", "cdc_seq", "cdc_op").collect()
    assert len(got) == 1
    assert got[0].o_totalprice == 30.0 and got[0].cdc_seq == 3


def test_collapse_rejects_tied_sequence(spark, offloaded_orders):
    _, src, _ = offloaded_orders
    r = src.first()
    batch = _cdc_df(spark, src, [(r, 1, "U", 10.0), (r, 1, "U", 20.0)])
    with pytest.raises(ValueError, match="duplicate"):
        collapse_batch(batch, "o_orderkey", "cdc_seq", "cdc_op").collect()


def _write_change_file(df, path):
    df.coalesce(1).write.mode("append").parquet(path)


def test_stream_apply_end_to_end(spark, offloaded_orders, tmp_path):
    """Upsert + insert + superseded version + delete, streamed through
    a file source, equals the hand-applied batch result."""
    target, src, spec = offloaded_orders
    rows = src.orderBy("o_orderkey").limit(3).collect()
    upd, dead, _ = rows
    new_key = src.agg(F.max("o_orderkey")).first()[0] + 777

    changes = _cdc_df(
        spark,
        src,
        [
            (upd, 1, "U", 111.0),  # superseded by seq 4
            (upd, 4, "U", 444.0),
            (dead, 2, "D", None),
            (upd, 3, "U", 333.0),  # superseded
        ],
    )
    insert = spark.createDataFrame(
        [
            (
                new_key,
                upd.o_custkey,
                "O",
                55.0,
                upd.o_orderdate,
                upd.o_orderpriority,
                5,
                "I",
            )
        ],
        changes.schema,
    )
    changes = changes.union(insert)

    src_dir = str(tmp_path / "cdc_in")
    _write_change_file(changes, src_dir)
    stream = spark.readStream.schema(changes.schema).parquet(src_dir)
    stream_cdc_apply(
        spark,
        stream,
        target,
        str(tmp_path / "ckpt"),
        str(tmp_path / "meta"),
        "o_orderkey",
        spec,
    )

    after = spark.read.parquet(target).cache()
    assert after.where(F.col("o_orderkey") == dead.o_orderkey).count() == 0
    got = after.where(F.col("o_orderkey") == upd.o_orderkey).collect()
    assert len(got) == 1 and got[0].o_totalprice == 444.0
    assert after.where(F.col("o_orderkey") == new_key).count() == 1
    # net: -1 delete +1 insert
    assert after.count() == src.count()
    after.unpersist()

    # Re-run with the same checkpoint: source-side progress, no change.
    stream2 = spark.readStream.schema(changes.schema).parquet(src_dir)
    stream_cdc_apply(
        spark,
        stream2,
        target,
        str(tmp_path / "ckpt"),
        str(tmp_path / "meta"),
        "o_orderkey",
        spec,
    )
    assert spark.read.parquet(target).count() == src.count()


def test_sink_redelivery_idempotent(spark, offloaded_orders, tmp_path):
    """The at-least-once contract, exercised on the sink directly:
    applying the same batch twice — first WITHOUT the ledger entry
    (crash before commit), then WITH it — leaves the same table."""
    target, src, spec = offloaded_orders
    r = src.orderBy("o_orderkey").first()
    batch = _cdc_df(spark, src, [(r, 1, "U", 999.0)])

    sink = make_cdc_sink(
        target,
        str(tmp_path / "ckpt"),
        str(tmp_path / "meta"),
        "o_orderkey",
        spec,
    )
    sink(batch, 0)
    count_after = spark.read.parquet(target).count()

    # Crash-before-ledger-commit replay: wipe the ledger, re-apply.
    import glob
    import os

    for f in glob.glob(str(tmp_path / "meta" / "*stream_batches*")):
        os.remove(f)
    sink(batch, 0)
    after = spark.read.parquet(target)
    assert after.count() == count_after
    got = after.where(F.col("o_orderkey") == r.o_orderkey).collect()
    assert len(got) == 1 and got[0].o_totalprice == 999.0

    # Committed-batch replay: short-circuited by the ledger.
    sink(batch, 0)
    assert spark.read.parquet(target).count() == count_after


def test_unknown_op_rejected(spark, offloaded_orders, tmp_path):
    target, src, spec = offloaded_orders
    r = src.first()
    batch = _cdc_df(spark, src, [(r, 1, "X", 1.0)])
    sink = make_cdc_sink(
        target,
        str(tmp_path / "ckpt"),
        str(tmp_path / "meta"),
        "o_orderkey",
        spec,
    )
    with pytest.raises(ValueError, match="unknown CDC op"):
        sink(batch, 0)


def test_null_op_rejected(spark, offloaded_orders, tmp_path):
    """A NULL cdc_op falls through both the upsert and delete branches
    (three-valued logic) — the sink must refuse the batch instead of
    silently dropping the change."""
    target, src, spec = offloaded_orders
    r = src.first()
    batch = _cdc_df(spark, src, [(r, 1, None, 1.0)])
    sink = make_cdc_sink(
        target,
        str(tmp_path / "ckpt"),
        str(tmp_path / "meta"),
        "o_orderkey",
        spec,
    )
    with pytest.raises(ValueError, match="unknown CDC op"):
        sink(batch, 0)
