"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() twin on DuckDB at sf0.01, then compares row count,
schema (column names) and an order-insensitive value hash.

CRITICAL: the comparison goes through PANDAS on both sides
(Spark df.toPandas() vs DuckDB con.execute(sql).df()), because that
is the driver's fetch path and it is dtype-destructive in ways the
collect()/fetchall() object path is not: DuckDB's .df() converts
HUGEINT -> float64 and DECIMAL -> float64 while Spark's toPandas()
keeps int64 / object(Decimal). Round 5 proved the old object-level
mirror reported 118/118 OK while the driver failed 6 queries for
exactly this reason — the same value rendered '352.0' vs '352'.
The render below is dtype-sensitive on purpose: if the two engines
hand pandas different dtypes for a column, that is a QUERY bug (fix
it with CAST ... AS BIGINT / round-then-cast-to-DOUBLE on both
sides), not something the mirror should paper over.

The one normalization we do apply is dates: DuckDB DATE arrives as
datetime64[ns] (midnight) while Spark DateType arrives as
datetime.date objects; the driver normalizes this, so the mirror
renders any midnight timestamp as its date.

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import datetime
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")


def normalize_cell(v):
    import decimal
    import math

    import numpy as np
    import pandas as pd

    if v is None:
        return "NULL"
    # pandas NaT / NaN missing markers
    if v is pd.NaT:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    # STRICT: floats render via repr with no rounding — representation
    # differences are the QUERY's job to eliminate (round at a fixed
    # scale in-query on both engines, and make both engines hand
    # pandas the same dtype). float64 352.0 renders '352.0' and will
    # NOT match int64 352 ('352'): that is the driver's behavior.
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    # Decimal survives Spark's toPandas (object column). It renders
    # scale-sensitively ('123.40' != '123.4') — again deliberate:
    # DuckDB's .df() would have turned the same column into float64,
    # so a Decimal here means the two engines disagree on dtype.
    if isinstance(v, decimal.Decimal):
        return str(v)
    # Dates: render midnight timestamps as bare dates (driver-style
    # normalization — DuckDB DATE becomes datetime64[ns] midnight).
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        if v.time() == datetime.time(0, 0) and v.tzinfo is None:
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(normalize_cell(x) for x in v) + "]"
    return str(v)


def dtype_kind_mismatches(spdf, opdf) -> list[tuple[str, str, str]]:
    """Cross-KIND pandas dtype splits between the two engines' fetch
    frames: (column, spark_dtype, duckdb_dtype) per offending column.

    int32 vs int64 render identically (str(int(v))) — only cross-kind
    differences (int vs float vs object) can change the driver's
    hash, so only those count. A hash that matches DESPITE one is
    luck (e.g. float64 values that all avoid trailing zeros vs
    Decimal objects); one data nudge flips it red, so both this
    tool and the pytest gate treat it as a failure."""
    bad = []
    for c in spdf.columns:
        if c not in opdf.columns:
            continue
        sd, od = str(spdf[c].dtype), str(opdf[c].dtype)

        def _kind(dtype):
            k = getattr(dtype, "kind", "O")
            return "i" if k in "iu" else k

        def _is_datey(col, dtype_str):
            if dtype_str.startswith("datetime"):
                return True
            if dtype_str == "object":
                vals = [v for v in col if v is not None]
                return bool(vals) and all(
                    isinstance(v, (datetime.date, datetime.datetime))
                    for v in vals
                )
            return False

        if _kind(spdf[c].dtype) != _kind(opdf[c].dtype) and not (
            _is_datey(spdf[c], sd) and _is_datey(opdf[c], od)
        ):
            bad.append((c, sd, od))
    return bad


def frame_fingerprint(pdf) -> tuple[int, str, str, list[str]]:
    """Row count, sorted column list, order-insensitive value hash —
    over a pandas frame, the driver's fetch representation."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    norm_rows = sorted(
        "\x1f".join(normalize_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )
    h = hashlib.sha256("\n".join(norm_rows).encode()).hexdigest()[:16]
    return len(pdf), ",".join(cols), h, norm_rows


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from goe_spark.session import get_spark

    only = set(sys.argv[1:])
    # Driver parity: the driver's session runs spark.sql.ansi.enabled
    # =true, so the mirror MUST too — round 11's only red row
    # (DIVIDE_BY_ZERO in dedup_survivor_bias_audit) passed 8/8 under
    # the old ANSI-off mirror. CHECK_ANSI=0 restores the engine's
    # documented non-ANSI SAFE_CAST semantics for debugging.
    ansi = os.environ.get("CHECK_ANSI", "1").lower() in ("1", "true")
    spark = get_spark(
        "check-oracle",
        shuffle_partitions=8,
        extra_conf={"spark.sql.ansi.enabled": "true" if ansi else "false"},
    )
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(path):
            # Spark-written table directory (e.g. the .scale/sf1
            # probe fixtures) — DuckDB needs the part-file glob
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    n_checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_checked += 1
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"skip  {name}: no oracle ({len(spdf)} rows)")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            failures.append(name)
            continue
        sn, sc, sh, srows = frame_fingerprint(spdf)
        on, oc, oh, orows = frame_fingerprint(opdf)
        dt = time.time() - t0
        if (sn, sc, sh) == (on, oc, oh):
            print(f"OK    {name}: {sn} rows ({dt:.1f}s)")
            # Latent-flake audit: a hash match with mismatched pandas
            # dtypes is LUCK (e.g. a float64 column whose values all
            # happen to avoid trailing zeros vs a Decimal column) —
            # one data nudge flips it red. FAIL even on green.
            for c, sd, od in dtype_kind_mismatches(spdf, opdf):
                print(
                    f"      FAIL dtype[{c}]: spark={sd} duckdb={od}"
                    " (green by luck — align dtypes in-query)"
                )
                if name not in failures:  # count each query once
                    failures.append(name)
        else:
            failures.append(name)
            print(f"FAIL  {name}:")
            if sn != on:
                print(f"      rows spark={sn} duckdb={on}")
            if sc != oc:
                print(f"      cols spark={sc} duckdb={oc}")
            if sh != oh:
                print(f"      hash spark={sh} duckdb={oh}")
                print(f"      dtypes spark={dict(spdf.dtypes.astype(str))}")
                print(f"      dtypes duck ={dict(opdf.dtypes.astype(str))}")
                cols = sorted(spdf.columns)
                for i, (a, b) in enumerate(zip(srows, orows)):
                    if a != b:
                        print(f"      first diff row {i} (field-wise):")
                        for c, av, bv in zip(
                            cols, a.split("\x1f"), b.split("\x1f")
                        ):
                            if av != bv:
                                note = ""
                                try:  # ulp distance: float noise vs real
                                    fa, fb = float(av), float(bv)
                                    note = f"  (delta={abs(fa - fb):.3e})"
                                except ValueError:
                                    pass
                                print(
                                    f"        {c}: S={av} D={bv}{note}"
                                )
                        break
    print(f"\n{n_checked - len(failures)}/{n_checked} OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
