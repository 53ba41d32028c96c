"""Per-query wall-clock breakdown: DSL build vs analysis/planning vs
execution, for N warm repetitions — tells you whether a bench second
is driver-side (plan) or executor-side (run), which decides the
optimization lever (guide §1: measure first).

Usage: python tools/profile_query.py q1 q2 ... [--sf-dir DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from goe_spark.queries import queries_dict
    from goe_spark.session import get_spark

    spark = get_spark(
        "goe-profile", extra_conf={"spark.sql.ansi.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries_dict()
    for name in args.names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        for i in range(args.runs):
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t3 = time.perf_counter()
            print(
                f"{name} run{i}: build={t1 - t0:6.3f}s "
                f"plan={t2 - t1:6.3f}s exec={t3 - t2:6.3f}s "
                f"total={t3 - t0:6.3f}s",
                flush=True,
            )
            spark.catalog.clearCache()
            jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
            it = jmap.values().iterator()
            while it.hasNext():
                it.next().unpersist(False)


if __name__ == "__main__":
    main()
