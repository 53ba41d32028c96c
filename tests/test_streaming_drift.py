"""Streaming CUSUM drift detector vs its batch twin: the stateful
applyInPandasWithState recurrence and the window closed form
(cumsum - running min) must agree row-for-row on a finite drain."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _key(rows):
    return {
        r.event_type: (
            r.n_events,
            r.n_onsets_up,
            r.n_onsets_down,
            r.max_s_up,
            r.max_s_down,
        )
        for r in rows
    }


def test_stream_equals_batch_twin(spark):
    from goe_spark.queries.timeseries import cusum_event_drift
    from goe_spark.streaming.drift import drift_summary_stream

    batch = _key(cusum_event_drift(spark, SF_SMALL).collect())
    stream = _key(drift_summary_stream(spark, SF_SMALL).collect())
    assert batch, "fixture must have events"
    assert stream == batch


def test_cusum_closed_form_crafted(spark):
    """Hand-run the recurrence: target 5000, k 100, h 10000.
    Values chosen so S+ crosses h exactly once and the max is known:
    three events at 120.00 push S+ by (12000-5100)=6900 each ->
    6900, 13800 (onset), 20700; a 1.00 event then drags it down by
    5000+100-100=... (100 - 5100) = -5000 -> 15700."""
    import datetime

    from goe_spark.queries import timeseries as TS

    vals = [120.0, 120.0, 120.0, 1.0]
    rows = [
        (i, datetime.datetime(2024, 1, 1, 0, 0, i), 1, "t", v, "{}")
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import goe_spark.catalog as cat

    orig = cat.load_table
    try:
        cat.load_table = lambda s, d, n: df if n == "events" else orig(s, d, n)
        TS.load_table = cat.load_table
        got = TS.cusum_event_drift(spark, "ignored").collect()
    finally:
        cat.load_table = orig
        TS.load_table = orig
    assert len(got) == 1
    r = got[0]
    assert r.n_events == 4
    assert r.n_onsets_up == 1
    assert r.n_onsets_down == 0
    assert r.max_s_up == 20700
    # s_dn: d_dn = cents - 4900; cum_dn rises 7100/step then falls
    # 4800 on the 1.00 event; running max - cum = 4800
    assert r.max_s_down == 4800
