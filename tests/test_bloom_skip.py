"""Bloom-filter file skipping: no false negatives, real skipping,
driver/engine hash agreement."""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import given, settings
from pyspark.sql import functions as F

from goe_spark.plans.bloom_skip import (
    K_HASHES,
    M_BITS,
    build_bloom_manifest,
    prune_files_bloom,
    read_pruned_bloom,
    value_positions,
)


def _write_fixture(spark, path: str):
    """8 files, doc ids range-clustered so a point id lives in one
    file; a lang column with per-file-skewed values."""
    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("lang_"), (F.col("id") % 37).cast("string")).alias(
            "lang"
        ),
    )
    (
        df.repartitionByRange(8, "doc_id")
        .write.mode("overwrite")
        .parquet(path)
    )


def test_spark_and_python_positions_agree(spark):
    """The prune-time Python positions must equal the build-time Spark
    positions for ints and strings — THE invariant the no-false-
    negative property rests on."""
    vals = [0, 1, 42, 999_999_999_999, "x", "lang_7", "héllo wörld"]
    df = spark.createDataFrame(
        [(str(v),) for v in vals], "v string"
    ).select(
        "v",
        F.array(
            *__import__(
                "goe_spark.plans.bloom_skip", fromlist=["_positions_expr"]
            )._positions_expr("v")
        ).alias("ps"),
    )
    got = {r.v: [int(p) for p in r.ps] for r in df.collect()}
    for v in vals:
        assert got[str(v)] == value_positions(v), v


@settings(max_examples=25, deadline=None)
@given(st.one_of(st.integers(min_value=-(2**62), max_value=2**62), st.text(max_size=30)))
def test_python_positions_well_formed(v):
    ps = value_positions(v)
    assert len(ps) == K_HASHES
    assert all(0 <= p < M_BITS for p in ps)


def test_no_false_negatives_and_point_lookup_skips(spark, tmp_path):
    path = str(tmp_path / "bloomed")
    _write_fixture(spark, path)
    build_bloom_manifest(spark, path, ["doc_id", "lang"])

    # every row's own file must survive a probe of its value
    rows = (
        spark.read.parquet(path)
        .select("doc_id", F.input_file_name().alias("f"))
        .where(F.col("doc_id").isin([0, 777, 1500, 2222, 3999]))
        .collect()
    )
    for r in rows:
        files, total = prune_files_bloom(path, {"doc_id": r.doc_id})
        assert any(f.endswith(r.f.rsplit("/", 1)[-1]) for f in files), r
        # range-clustered ids: the point probe must actually skip
        assert len(files) < total

    # pruned read returns exactly the probed row after the exact filter
    df, n_read, n_total = read_pruned_bloom(spark, path, {"doc_id": 1500})
    assert df is not None and n_read < n_total
    got = df.where(F.col("doc_id") == 1500).collect()
    assert len(got) == 1 and got[0].doc_id == 1500


def test_conjunction_and_missing_manifest(spark, tmp_path):
    path = str(tmp_path / "bloomed2")
    _write_fixture(spark, path)
    # no manifest yet: everything survives (correct, just unpruned)
    files, total = prune_files_bloom(path, {"doc_id": 3})
    assert len(files) == total > 0

    build_bloom_manifest(spark, path, ["doc_id"])
    # conjunction: un-indexed column makes no claim; indexed one prunes
    files, total = prune_files_bloom(
        path, {"doc_id": 3, "lang": "lang_3"}
    )
    assert 0 < len(files) < total

    # a value outside the domain may prune to zero files (no false
    # negatives required only for PRESENT values); the read contract
    # returns None then
    df, n_read, _ = read_pruned_bloom(spark, path, {"doc_id": -123456789})
    assert df is None or df.where(F.col("doc_id") == -123456789).count() == 0


def test_partitioned_build_and_delete_integration(spark, offloaded_orders):
    """Bloom-bounded takedown: same deletions as the unbounded path,
    phase-1 file set strictly pruned, and the rewritten partition's
    manifest dropped (stale claims die with their files)."""
    import os

    from goe_spark.plans.bloom_skip import (
        BLOOM_MANIFEST_NAME,
        build_bloom_manifest_partitioned,
        prune_partitioned_bloom_in,
    )
    from goe_spark.plans.targeted_delete import delete_rows

    target, src, _ = offloaded_orders
    n_parts = build_bloom_manifest_partitioned(
        spark, target, ["o_orderkey"]
    )
    assert n_parts > 0

    doomed = [r[0] for r in src.select("o_orderkey").limit(3).collect()]
    files, total = prune_partitioned_bloom_in(target, "o_orderkey", doomed)
    assert 0 < len(files) < total  # the probe really skips files

    before = spark.read.parquet(target).count()
    rep = delete_rows(
        spark, target, "o_orderkey", doomed, use_bloom=True
    )
    assert rep.rows_deleted == 3
    after = spark.read.parquet(target)
    assert after.count() == before - 3
    assert after.where(F.col("o_orderkey").isin(doomed)).count() == 0

    # rewritten partitions dropped their manifests; untouched kept
    touched = {d for d, _ in rep.details}
    for d in touched:
        assert not os.path.exists(
            os.path.join(target, d, BLOOM_MANIFEST_NAME)
        )
    untouched_with_manifest = [
        d
        for d in os.listdir(target)
        if os.path.isdir(os.path.join(target, d))
        and d not in touched
        and os.path.exists(os.path.join(target, d, BLOOM_MANIFEST_NAME))
    ]
    assert untouched_with_manifest  # the drop was surgical

    # absent keys: bloom proves no file can match -> zero-cost no-op
    rep2 = delete_rows(
        spark, target, "o_orderkey", [-1, -2], use_bloom=True
    )
    assert rep2.rows_deleted == 0 and rep2.partitions_affected == 0
