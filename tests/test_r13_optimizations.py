"""Focused pins for the round-13 optimization-round rewrites: the
driver-side bounded-state loops must be bit-equal to their distributed
formulations, and the new reader-plan caches must serve fresh plans
whenever the underlying files change."""

from __future__ import annotations

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from goe_spark.session import get_spark

    s = get_spark("r13-opt-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_bpe_driver_loop_matches_distributed_semantics():
    """_bpe_merge_rows_driver is a pure function; pin the greedy
    non-overlap + merged-operand semantics the distributed loop had
    (same fixture as test_bpe_train_greedy_overlap_on_handcrafted)."""
    from goe_spark.queries.training import _bpe_merge_rows_driver

    # 'aaaa' x3 + 'xy': step1 (a,a) freq 9, greedy leaves 'aa aa';
    # step2 merges the merged outputs (aa,aa) freq 3.
    rows = _bpe_merge_rows_driver([("aaaa", 3), ("xy", 1)])
    s1, s2 = rows[0], rows[1]
    assert (s1[1], s1[2], s1[4]) == ("a", "a", 9)
    assert s1[5] == 3 * 2 + 2  # symbols_after step 1
    assert (s2[1], s2[2], s2[3], s2[4]) == ("aa", "aa", "aaaa", 3)
    assert s2[5] == 3 * 1 + 2
    # ties break (freq DESC, left ASC, right ASC)
    rows = _bpe_merge_rows_driver([("ab", 2), ("cd", 2)])
    assert (rows[0][1], rows[0][2]) == ("a", "b")


def test_pagerank_driver_matches_distributed(spark):
    """The driver PageRank loop must produce the same rows as the
    distributed formulation on the same edge list (the
    _cc_labels_driver agreement discipline)."""
    from goe_spark.queries.training import (
        PR_ITERS,
        PR_SCALE,
        PR_TOP_K,
        _pagerank_driver,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 5), (1, 6)], "id1 long, id2 long"
    )
    got = {
        (r.doc_id, r.pr_q12, r.degree)
        for r in _pagerank_driver(spark, edges).collect()
    }
    # independent reference: same integer arithmetic, dict-free order
    sym = [(a, b) for a, b in [(1, 2), (2, 3), (3, 1), (4, 5), (1, 6)]]
    sym = sym + [(b, a) for a, b in sym]
    deg: dict[int, int] = {}
    for s, _d in sym:
        deg[s] = deg.get(s, 0) + 1
    n = len(deg)
    base = 15 * PR_SCALE // (100 * n)
    pr = {v: PR_SCALE // n for v in deg}
    for _ in range(PR_ITERS):
        acc: dict[int, int] = {}
        for s, d in sym:
            acc[d] = acc.get(d, 0) + pr[s] // deg[s]
        pr = {v: base + 85 * acc.get(v, 0) // 100 for v in deg}
    want = {
        (v, pr[v], deg[v])
        for v in sorted(pr, key=lambda v: (-pr[v], v))[:PR_TOP_K]
    }
    assert got == want
    # rank mass concentrates on the triangle+spoke component hub
    top = max(got, key=lambda t: t[1])
    assert top[0] == 1


def test_load_table_plan_cache_reuses_and_invalidates(spark, tmp_path):
    """Same (session, path, file state) must return the SAME plan
    object; touching the file must invalidate."""
    import goe_spark.catalog as C

    d1 = C.load_table(spark, SF_SMALL, "documents")
    d2 = C.load_table(spark, SF_SMALL, "documents")
    assert d1 is d2
    # copy a table into tmp and mutate it
    sfd = tmp_path / "sf"
    sfd.mkdir()
    shutil.copy(
        os.path.join(SF_SMALL, "documents.parquet"),
        sfd / "documents.parquet",
    )
    a = C.load_table(spark, str(sfd), "documents")
    assert a is not d1
    n0 = a.count()
    os.utime(sfd / "documents.parquet", (time.time(), time.time() + 5))
    b = C.load_table(spark, str(sfd), "documents")
    assert b is not a  # fingerprint change -> fresh plan
    assert b.count() == n0


def test_index_frame_cache_invalidated_by_maintenance(spark):
    """Append through the maintenance API must invalidate the cached
    index frame (key fingerprints the whole index dir)."""
    from goe_spark.operators.minhash_index import (
        append_signatures,
        build_signature_index,
        load_signatures,
    )
    from goe_spark.catalog import load_table

    docs = load_table(spark, SF_SMALL, "documents").limit(20)
    index_dir = "/tmp/r13_opt_idx_cache_test"
    shutil.rmtree(index_dir, ignore_errors=True)
    build_signature_index(spark, docs.where(F.col("doc_id") < 10), index_dir)
    s1 = load_signatures(spark, index_dir)
    n1 = s1.count()
    assert load_signatures(spark, index_dir) is s1  # cache hit
    appended = append_signatures(
        spark, index_dir, docs.where(F.col("doc_id") >= 10)
    )
    s2 = load_signatures(spark, index_dir)
    assert s2 is not s1  # append changed the dir fingerprint
    assert s2.count() == n1 + appended
    shutil.rmtree(index_dir, ignore_errors=True)


def test_stream_state_partitions_scopes_and_restores(spark):
    """The streaming drain tuning must scope the shuffle-partition
    conf and restore the session value even on error."""
    from goe_spark.streaming.tuning import (
        STREAM_STATE_PARTITIONS,
        stream_state_partitions,
    )

    old = spark.conf.get("spark.sql.shuffle.partitions")
    with stream_state_partitions(spark):
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(
            STREAM_STATE_PARTITIONS
        )
    assert spark.conf.get("spark.sql.shuffle.partitions") == old
    with pytest.raises(RuntimeError):
        with stream_state_partitions(spark):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == old


def test_memo_exprs_reuses_per_name_and_context(spark):
    """memo_exprs must return the SAME object for repeated (name,
    context) calls without re-invoking the builder, and distinct
    objects for distinct names."""
    from goe_spark.catalog import memo_exprs

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return [F.lit(1).alias("one")]

    a = memo_exprs("test-memo-a", build)
    b = memo_exprs("test-memo-a", build)
    assert a is b and calls["n"] == 1
    c = memo_exprs("test-memo-b", build)
    assert c is not a and calls["n"] == 2


def test_memoized_media_queries_build_stable_plans(spark):
    """The mp4/tiff expression memo is plan-level reuse only: two
    invocations must produce identical analyzed plans (and the first
    call after the memo warms must match the cold call)."""
    from goe_spark.queries.multimodal import (
        media_mp4_stats,
        media_tiff_stats,
    )

    import re

    def norm(df):
        s = df._jdf.queryExecution().analyzed().toString()
        return re.sub(r"#\d+", "#", s)  # exprIds are per-invocation

    for fn in (media_mp4_stats, media_tiff_stats):
        assert norm(fn(spark, SF_SMALL)) == norm(fn(spark, SF_SMALL))
