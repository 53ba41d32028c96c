"""Result cache (plans/result_cache.py): hit/miss semantics,
structural staleness via source fingerprints, eviction, and value
equality between the built and cached paths."""

from __future__ import annotations

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from goe_spark.plans import result_cache as RC
from tests.conftest import SF_SMALL


@pytest.fixture(autouse=True)
def clean_cache():
    RC.clear()
    yield
    RC.clear()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_hit_after_miss_and_value_equality(spark):
    calls = []

    def build(s, d):
        calls.append(1)
        from goe_spark.queries.profiling import benford_first_digit_audit

        return benford_first_digit_audit(s, d)

    df1, hit1 = RC.get_or_build(spark, "benford", SF_SMALL, build)
    r1 = _rows(df1)
    df2, hit2 = RC.get_or_build(spark, "benford", SF_SMALL, build)
    r2 = _rows(df2)
    assert (hit1, hit2) == (False, True)
    assert len(calls) == 1, "build must run exactly once"
    assert r1 == r2
    # schema identical between miss (read-back) and hit paths
    assert df1.schema == df2.schema


def test_source_change_invalidates(spark, tmp_path):
    """Copy the fixture, warm the cache, rewrite one source file —
    the key changes, the old entry is evicted, build runs again."""
    d = str(tmp_path / "fix")
    os.makedirs(d)
    for t in ("orders", "customer", "lineitem"):
        src = os.path.join(SF_SMALL, f"{t}.parquet")
        shutil.copy(src, os.path.join(d, f"{t}.parquet"))

    calls = []

    def build(s, sf):
        calls.append(1)
        return (
            s.read.parquet(os.path.join(sf, "orders.parquet"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    _, h1 = RC.get_or_build(spark, "probe", d, build)
    _, h2 = RC.get_or_build(spark, "probe", d, build)
    assert (h1, h2) == (False, True) and len(calls) == 1

    # mutate a source: append a byte + bump mtime -> new fingerprint
    p = os.path.join(d, "orders.parquet")
    spark.read.parquet(p).limit(10).write.mode("overwrite").parquet(
        p + ".new"
    )
    shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
    os.rename(p + ".new", p)
    os.utime(p, (time.time() + 5, time.time() + 5))

    _, h3 = RC.get_or_build(spark, "probe", d, build)
    assert h3 is False and len(calls) == 2
    # stale entry evicted: exactly one dir for this name remains
    entries = [
        e for e in os.listdir(RC.CACHE_ROOT) if e.startswith("probe--")
    ]
    assert len(entries) == 1


def test_distinct_names_do_not_collide(spark):
    def build_a(s, d):
        return s.range(3).select(F.col("id").alias("a"))

    def build_b(s, d):
        return s.range(5).select(F.col("id").alias("b"))

    da, _ = RC.get_or_build(spark, "qa", SF_SMALL, build_a)
    db, _ = RC.get_or_build(spark, "qb", SF_SMALL, build_b)
    assert da.count() == 3 and db.count() == 5
    da2, hit = RC.get_or_build(spark, "qa", SF_SMALL, build_a)
    assert hit and da2.columns == ["a"]


def test_cli_cache_list_and_clear(spark, capsys):
    import json

    from goe_spark.cli import main
    from goe_spark.queries.profiling import benford_first_digit_audit

    RC.get_or_build(spark, "bf", SF_SMALL, benford_first_digit_audit)
    assert main(["cache", "list"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert any(e["name"] == "bf" and e["bytes"] > 0 for e in out["entries"])
    assert main(["cache", "clear"]) == 0
    assert RC.lookup("bf", SF_SMALL) is None


def test_cli_query_cached(spark):
    from goe_spark.cli import main

    rc = main(
        ["query", "benford_first_digit_audit", "--sf-dir", SF_SMALL,
         "--cached", "--limit", "3"]
    )
    assert rc == 0
    rc = main(
        ["query", "benford_first_digit_audit", "--sf-dir", SF_SMALL,
         "--cached", "--limit", "3"]
    )
    assert rc == 0
    assert RC.lookup("benford_first_digit_audit", SF_SMALL) is not None


def test_evict_skips_live_tmp_dirs(spark):
    """A concurrent writer's in-progress .tmp-<pid> build dir must
    survive another writer's eviction pass (round-10 ADVICE): only
    completed entries are evicted; tmp dirs age out separately."""
    def build(s, d):
        return s.range(3).select(F.col("id").alias("x"))

    RC.get_or_build(spark, "ev", SF_SMALL, build)
    # simulate a concurrent writer of a DIFFERENT key mid-build
    tmp = os.path.join(RC.CACHE_ROOT, "ev--deadbeefdeadbeef.tmp-99999")
    os.makedirs(tmp)
    stale = os.path.join(RC.CACHE_ROOT, "ev--0123456789abcdef")
    os.makedirs(stale)
    n = RC._evict_other_keys("ev", RC.cache_key("ev", SF_SMALL))
    assert n == 1
    assert os.path.isdir(tmp), "in-progress tmp dir was rmtree'd"
    assert not os.path.isdir(stale)
    # age-based GC: fresh tmp survives, old tmp goes
    assert RC._gc_orphan_tmps() == 0
    old = time.time() - 2 * RC.TMP_GC_AGE_S
    os.utime(tmp, (old, old))
    assert RC._gc_orphan_tmps() == 1
    assert not os.path.isdir(tmp)


def test_cli_cache_list_labels_tmp_dirs(spark, capsys):
    import json

    from goe_spark.cli import main

    def build(s, d):
        return s.range(2).select(F.col("id").alias("x"))

    RC.get_or_build(spark, "lv", SF_SMALL, build)
    tmp = os.path.join(RC.CACHE_ROOT, "lv--feedfacefeedface.tmp-12345")
    os.makedirs(tmp)
    assert main(["cache", "list"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert all(".tmp-" not in e["key"] for e in out["entries"])
    assert [t["dir"] for t in out["tmp_dirs"]] == [
        "lv--feedfacefeedface.tmp-12345"
    ]
    assert out["tmp_dirs"][0]["age_s"] < 60
