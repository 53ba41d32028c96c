"""Capture .explain("formatted") for named queries into a directory.

Usage: python tools/capture_plans.py OUTDIR SUFFIX q1 q2 ...
Writes OUTDIR/<query>_<SUFFIX>.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from goe_spark.queries import queries_dict
    from goe_spark.session import get_spark

    spark = get_spark(
        "goe-plans", extra_conf={"spark.sql.ansi.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries_dict()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)


if __name__ == "__main__":
    main()
