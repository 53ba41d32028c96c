"""Query result cache keyed on source fingerprints — the warehouse
results-cache pattern (BigQuery's 24-hour result reuse, Snowflake's
RESULT_SCAN): a deterministic query over unchanged sources returns
the PERSISTED previous answer instead of recomputing the plan.

The reference has no result cache (its queries run in the backend
warehouse, which provides one); this module gives the rebuilt engine
the same property, riding the exact staleness discipline the
materialized indexes already use (operators/ivf.py
`_source_fingerprint`: name/size/mtime of every source file — cheap
stat calls, no data read).

Design:

- cache key = md5 over {layout version, query name, sf_dir, the
  fingerprint of EVERY catalog table under sf_dir}. Any source file
  change (size or mtime) changes the key, so staleness is structural
  — there is no TTL to tune and no way to read a stale result.
- entry layout: ``result_cache/{name}--{key8}/data/`` parquet +
  ``_CACHE_META.json``. A changed key lands in a NEW directory; other
  directories for the same query name are evicted on write.
- writes are atomic: build into ``.tmp-{pid}``, ``os.rename`` into
  place. A concurrent writer losing the rename race simply reads the
  winner's entry (both computed the same deterministic result).
- the cached frame is the parquet READ-BACK, not the in-memory
  result — so hit and miss return byte-identical schemas and the
  cache cannot drift from what was persisted.

At 100 TB the cache stores query RESULTS (report-sized — every
registry query returns grain-bounded output), never corpus-scale
intermediates; the win is skipping the corpus-scale scan/shuffle that
produced them. Cache rot is bounded by eviction-on-write per query
name; `clear()` drops everything.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

from goe_spark import catalog
from goe_spark.operators.ivf import _REPO_ROOT, _source_fingerprint

CACHE_ROOT = os.path.join(_REPO_ROOT, "spark-warehouse", "result_cache")
CACHE_VERSION = 1


def _sources_fingerprint(sf_dir: str) -> dict[str, str]:
    """Fingerprint of every catalog table file under sf_dir that
    exists (missing tables are skipped so subset fixtures work)."""
    fps = {}
    for t in catalog.TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            fps[t] = _source_fingerprint(path)
    return fps


def cache_key(name: str, sf_dir: str) -> str:
    blob = json.dumps(
        {
            "version": CACHE_VERSION,
            "name": name,
            "sf_dir": os.path.abspath(sf_dir),
            "sources": _sources_fingerprint(sf_dir),
        },
        sort_keys=True,
    )
    return hashlib.md5(blob.encode()).hexdigest()[:16]


def _entry_dir(name: str, key: str) -> str:
    return os.path.join(CACHE_ROOT, f"{name}--{key}")


def lookup(name: str, sf_dir: str) -> str | None:
    """Path of a fresh cache entry's data dir, or None."""
    d = _entry_dir(name, cache_key(name, sf_dir))
    meta = os.path.join(d, "_CACHE_META.json")
    data = os.path.join(d, "data")
    if os.path.exists(meta) and os.path.exists(data):
        return data
    return None


#: tmp build dirs older than this are presumed orphaned by a crashed
#: writer and safe to garbage-collect; a LIVE writer finishes a build
#: in seconds-to-minutes, far inside this window.
TMP_GC_AGE_S = 24 * 3600


def _evict_other_keys(name: str, keep_key: str) -> int:
    """Drop COMPLETED entries for `name` under any other key (stale
    sources). In-progress ``.tmp-<pid>`` build dirs are never touched
    here — a concurrent writer of a different key may be mid-parquet
    -write in one, and rmtree'ing it would crash that run (the
    loser-reads-winner rename race only protects same-key writers).
    Orphaned tmp dirs are aged out separately by `_gc_orphan_tmps`."""
    if not os.path.isdir(CACHE_ROOT):
        return 0
    n = 0
    prefix = f"{name}--"
    for entry in os.listdir(CACHE_ROOT):
        if ".tmp-" in entry:
            continue
        if entry.startswith(prefix) and entry != f"{name}--{keep_key}":
            shutil.rmtree(os.path.join(CACHE_ROOT, entry), ignore_errors=True)
            n += 1
    return n


def _gc_orphan_tmps(max_age_s: float = TMP_GC_AGE_S) -> int:
    """Remove ``.tmp-<pid>`` build dirs left behind by crashed
    writers, identified purely by age — never by pid liveness, which
    is unreliable across containers sharing the cache root."""
    if not os.path.isdir(CACHE_ROOT):
        return 0
    n = 0
    now = time.time()
    for entry in os.listdir(CACHE_ROOT):
        if ".tmp-" not in entry:
            continue
        p = os.path.join(CACHE_ROOT, entry)
        try:
            age = now - os.path.getmtime(p)
        except OSError:
            continue  # racing writer renamed/removed it — fine
        if age > max_age_s:
            shutil.rmtree(p, ignore_errors=True)
            n += 1
    return n


def get_or_build(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    build,
) -> tuple[DataFrame, bool]:
    """Return (result frame, was_hit). ``build(spark, sf_dir)`` runs
    only on miss; both paths return the parquet read-back."""
    key = cache_key(name, sf_dir)
    hit = lookup(name, sf_dir)
    if hit is not None:
        return spark.read.parquet(hit), True

    df = build(spark, sf_dir)
    final = _entry_dir(name, key)
    tmp = f"{final}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp), exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(tmp, "data"))
    with open(os.path.join(tmp, "_CACHE_META.json"), "w") as f:
        json.dump(
            {"version": CACHE_VERSION, "name": name, "key": key}, f
        )
    try:
        os.rename(tmp, final)
    except OSError:
        # lost the race to a concurrent writer of the SAME key — the
        # deterministic result is already in place; use theirs
        shutil.rmtree(tmp, ignore_errors=True)
    _evict_other_keys(name, key)
    _gc_orphan_tmps()
    return spark.read.parquet(os.path.join(final, "data")), False


def clear() -> None:
    shutil.rmtree(CACHE_ROOT, ignore_errors=True)
