"""The bench's stdout contract: the driver keeps only the LAST ~2000
characters of stdout and json-parses the final line, so the compact
summary line must stay under that window no matter how many queries
the registry grows to (rounds 3-8 shipped an unparseable 5 KB line
and the driver recorded parsed=null for six rounds)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_last_line_is_compact_parseable_json():
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "bench.py"),
            "--only",
            "count_validate_orders",
            "--runs",
            "1",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-800:]
    line = proc.stdout.strip().splitlines()[-1]
    assert len(line) < 1900, len(line)
    d = json.loads(line)
    assert d["metric"] == "headline_queries_total_runtime"
    assert d["value"] is None  # --only mode: no misleading partial sum
    assert d["headline_rev"] == 8
    assert d["detail"] == "BENCH_PARTIAL.json"  # --only: full artifact untouched
    assert d["n_failed"] == 0
    # full detail landed on disk with the per-query medians
    with open(os.path.join(REPO, "BENCH_PARTIAL.json")) as fh:
        full = json.load(fh)
    assert "count_validate_orders" in full["queries"]
