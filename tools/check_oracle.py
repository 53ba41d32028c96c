"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() twin on DuckDB at sf0.01, then compares row count,
schema (column names) and an order-insensitive value hash the same
way the driver does (sort columns by name, sort rows, hash values).

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")


def normalize_cell(v):
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    # STRICT: no rounding. The driver's hash proved stricter than a
    # 9-digit round (r4: 6 queries passed here, failed there), so the
    # mirror must be at least as strict — representation differences
    # are the QUERY's job to eliminate (round-then-cast to
    # decimal/string identically on both engines).
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def frame_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, str, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    norm_rows = sorted(
        "\x1f".join(normalize_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(norm_rows).encode()).hexdigest()[:16]
    return len(rows), ",".join(sorted_cols), h


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from goe_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("check-oracle", shuffle_partitions=8)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"skip  {name}: no oracle ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            failures.append(name)
            continue
        sn, sc, sh = frame_fingerprint(scols, srows)
        on, oc, oh = frame_fingerprint(ocols, orows)
        dt = time.time() - t0
        if (sn, sc, sh) == (on, oc, oh):
            print(f"OK    {name}: {sn} rows ({dt:.1f}s)")
        else:
            failures.append(name)
            print(f"FAIL  {name}:")
            if sn != on:
                print(f"      rows spark={sn} duckdb={on}")
            if sc != oc:
                print(f"      cols spark={sc} duckdb={oc}")
            if sh != oh:
                print(f"      hash spark={sh} duckdb={oh}")
                so = sorted(range(len(scols)), key=lambda i: scols[i])
                oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sset = sorted(
                    "\x1f".join(normalize_cell(r[i]) for i in so) for r in srows
                )
                oset = sorted(
                    "\x1f".join(normalize_cell(r[i]) for i in oo) for r in orows
                )
                for i, (a, b) in enumerate(zip(sset, oset)):
                    if a != b:
                        print(f"      first diff row {i}:\n        S {a}\n        D {b}")
                        break
    print(f"\n{len(qs) - len(failures)}/{len(qs)} OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
