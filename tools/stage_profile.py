"""Per-stage dissection of one query run: stage name, wall time,
task count, shuffle bytes — the Spark-UI 'Stages' view as text
(guide §1.1 empirical loop, for a judge/sandbox without the UI).

Usage: python tools/stage_profile.py QUERY [--sf-dir DIR] [--runs N]

Runs the query N times (noop sink), then prints the stages of the
LAST run's jobs in submission order with per-stage executorRunTime,
shuffle read/write bytes and row counts, plus the job count — the
numbers that decide whether a bench second is scheduler latency,
shuffle, or executor compute.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from goe_spark.queries import queries_dict
    from goe_spark.session import get_spark

    spark = get_spark(
        "goe-stageprof",
        extra_conf={
            "spark.sql.ansi.enabled": "true",
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    qs = queries_dict()

    def rest(path: str):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/{path}") as r:
            return json.load(r)

    for name in args.names:
        fn = qs[name]
        for i in range(args.runs):
            before_jobs = {j["jobId"] for j in rest("jobs")}
            spark.sparkContext.setJobDescription(f"stageprof:{name}:run{i}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            if i < args.runs - 1:
                continue
            jobs = [j for j in rest("jobs") if j["jobId"] not in before_jobs]
            stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
            print(
                f"\n=== {name} run{i}: build={t1 - t0:.3f}s exec={t2 - t1:.3f}s "
                f"jobs={len(jobs)} stages={len(stage_ids)}"
            )
            stages = {s["stageId"]: s for s in rest("stages")}
            for sid in stage_ids:
                s = stages.get(sid)
                if s is None:
                    continue
                dur = s.get("executorRunTime", 0) / 1e3
                cpu = s.get("executorCpuTime", 0) / 1e9
                sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
                comp = s.get("completionTime")
                wall = ""
                try:
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    w = (
                        datetime.strptime(comp, fmt)
                        - datetime.strptime(sub, fmt)
                    ).total_seconds()
                    wall = f"wall={w:6.2f}s "
                except Exception:
                    pass
                print(
                    f"  stage {sid:>4} {wall}runSum={dur:6.2f}s cpuSum={cpu:6.2f}s "
                    f"tasks={s.get('numCompleteTasks', 0):>3} "
                    f"in={s.get('inputBytes', 0) >> 10:>7}K "
                    f"sr={s.get('shuffleReadBytes', 0) >> 10:>6}K "
                    f"sw={s.get('shuffleWriteBytes', 0) >> 10:>6}K  "
                    f"{s.get('name', '')[:70]}"
                )


if __name__ == "__main__":
    main()
