"""As-of join edge semantics on hand-built data, plus plan shape."""

from __future__ import annotations

import datetime as dt

from goe_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-10T00:00:00"), "before_any"),
            (1, _ts("2024-01-15T00:00:00"), "exact_tie"),
            (1, _ts("2024-01-20T00:00:00"), "after_two"),
            (2, _ts("2024-01-05T00:00:00"), "other_key"),
            (3, _ts("2024-01-05T00:00:00"), "no_right_rows"),
        ],
        "k long, t timestamp, label string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-12T00:00:00"), 100),
            (1, _ts("2024-01-15T00:00:00"), 150),
            (2, _ts("2024-01-01T00:00:00"), 200),
            (2, _ts("2024-01-06T00:00:00"), 999),  # after left row: invisible
        ],
        "k long, t timestamp, v int",
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _frames(spark)
    out = {
        r.label: r.v
        for r in asof_join(
            left, right, on="k", right_on="k", left_time="t",
            right_time="t", payload_cols=["v"],
        ).collect()
    }
    assert out["before_any"] is None  # no right row at or before
    assert out["exact_tie"] == 150  # right_time == left_time is visible
    assert out["after_two"] == 150  # latest wins, not first
    assert out["other_key"] == 200  # keys don't bleed; future row unseen
    assert out["no_right_rows"] is None


def test_asof_null_payload_not_backfilled_from_older_row(spark):
    """The matched right row's NULL field must stay NULL — forwarding
    each payload column independently would stitch it from an older
    right row."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-20T00:00:00"), "probe")],
        "k long, t timestamp, label string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-10T00:00:00"), 2, 7),
            (1, _ts("2024-01-15T00:00:00"), 5, None),  # latest: b is NULL
        ],
        "k long, t timestamp, a int, b int",
    )
    row = asof_join(
        left, right, on="k", right_on="k", left_time="t",
        right_time="t", payload_cols=["a", "b"],
    ).first()
    assert row.a == 5
    assert row.b is None  # NOT 7


def test_asof_preserves_left_rowcount(spark):
    left, right = _frames(spark)
    joined = asof_join(
        left, right, on="k", right_on="k", left_time="t",
        right_time="t", payload_cols=["v"],
    )
    assert joined.count() == left.count()


def test_asof_plan_is_single_shuffle(spark):
    left, right = _frames(spark)
    joined = asof_join(
        left, right, on="k", right_on="k", left_time="t",
        right_time="t", payload_cols=["v"],
    )
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    # union + window, never a join operator (a range-condition join
    # would risk BroadcastNestedLoop at scale)
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_tolerance_nullifies_stale_matches(spark):
    """Tolerance semantics on a handcrafted series: a right row 10
    units back matches with tolerance 15 but not with tolerance 5; a
    same-time match always survives; tolerance never ADDS matches."""
    from pyspark.sql import functions as F

    from goe_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, 103), (2, 50)], "k long, t long"
    )
    right = spark.createDataFrame(
        [(1, 93, "old"), (1, 103, "now"), (2, 10, "stale")],
        "k long, rt long, v string",
    )

    def run(tol):
        return {
            (r.k, r.t): r.v
            for r in asof_join(
                left, right, on="k", right_on="k",
                left_time="t", right_time="rt",
                payload_cols=["v"], tolerance=tol,
            ).collect()
        }

    wide = run(F.lit(15))
    assert wide == {(1, 100): "old", (1, 103): "now", (2, 50): None}
    tight = run(F.lit(5))
    # the 10-units-back match dies; the same-time match survives
    assert tight == {(1, 100): None, (1, 103): "now", (2, 50): None}
    unbounded = run(None)
    assert unbounded == {(1, 100): "old", (1, 103): "now", (2, 50): "stale"}
    # tolerance is a pure restriction of the unbounded join
    for key, v in tight.items():
        assert v is None or unbounded[key] == v


def test_asof_forward_direction_and_null_times(spark):
    """Forward mode matches the EARLIEST right row at or after the
    left time (inclusive), NULL left times match nothing in either
    direction, and forward tolerance bounds how far AHEAD a match may
    be."""
    from pyspark.sql import functions as F

    from goe_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, 103), (1, 200), (1, None)], "k long, t long"
    )
    right = spark.createDataFrame(
        [(1, 103, "a"), (1, 110, "b")], "k long, rt long, v string"
    )

    def run(**kw):
        return {
            (r.k, r.t): r.v
            for r in asof_join(
                left, right, on="k", right_on="k",
                left_time="t", right_time="rt",
                payload_cols=["v"], **kw,
            ).collect()
        }

    fwd = run(direction="forward")
    assert fwd == {
        (1, 100): "a",   # earliest rt >= 100
        (1, 103): "a",   # inclusive at equal time
        (1, 200): None,  # nothing after
        (1, None): None, # NULL time sees nothing
    }
    fwd_tight = run(direction="forward", tolerance=F.lit(2))
    assert fwd_tight == {
        (1, 100): None,  # 103 is 3 ahead > tolerance 2
        (1, 103): "a",
        (1, 200): None,
        (1, None): None,
    }
    bwd = run(direction="backward")
    assert bwd == {
        (1, 100): None, (1, 103): "a", (1, 200): "b", (1, None): None,
    }


def test_asof_null_right_times_never_match(spark):
    """Right rows with NULL right_time are excluded from matching in
    BOTH directions and with or without tolerance (DuckDB/pandas ASOF
    semantics) — previously they sorted nulls-first with a non-NULL
    payload struct and could be inherited by left rows that have no
    real qualifying match."""
    import pyspark.sql.functions as F

    left = spark.createDataFrame(
        [(1, _ts("2024-01-10T00:00:00"), "only_null_right")],
        "k long, t timestamp, label string",
    )
    right = spark.createDataFrame(
        [(1, None, 777)], "k long, t timestamp, v int"
    )
    for direction in ("backward", "forward"):
        row = asof_join(
            left, right, on="k", right_on="k", left_time="t",
            right_time="t", payload_cols=["v"], direction=direction,
        ).collect()[0]
        assert row.v is None, direction
    # consistent WITH tolerance too (previously only the tolerance
    # path nullified these)
    row = asof_join(
        left, right, on="k", right_on="k", left_time="t",
        right_time="t", payload_cols=["v"],
        tolerance=F.expr("INTERVAL 30 DAYS"),
    ).collect()[0]
    assert row.v is None
