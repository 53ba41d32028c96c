"""Unit pins for tools/plan_audit.py's detection heuristics — the
sweep is only as good as its parsers, and the global-window detector
already shipped one false-negative (sortorder vs 'col ASC' rendering,
fixed in round 9)."""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)
plan_audit = importlib.import_module("plan_audit")


def _globals_of(formatted: str) -> int:
    n = 0
    for m in plan_audit.WINDOW_RE.finditer(formatted):
        first = m.group(1).split(",")[0].strip()
        if (
            " ASC" in first
            or " DESC" in first
            or first.startswith("specifiedwindowframe")
        ):
            n += 1
    return n


def test_global_window_detector_formatted_rendering():
    """Real formatted-plan spellings: partitioned specs (bare column
    refs first) are NOT flagged; orderBy-only specs ARE."""
    partitioned = (
        "windowspecdefinition(user_id#28L, ts#33 ASC NULLS FIRST, "
        "event_id#26L ASC NULLS FIRST, specifiedwindowframe(RowFrame"
    )
    global_win = (
        "windowspecdefinition(_w0#21 ASC NULLS FIRST, "
        "specifiedwindowframe(RangeFrame, -6, currentrow$("
    )
    global_desc = (
        "windowspecdefinition(n#5L DESC NULLS LAST, "
        "specifiedwindowframe(RowFrame"
    )
    assert _globals_of(partitioned + ")") == 0
    assert _globals_of(global_win + ")") == 1
    assert _globals_of(global_desc + ")") == 1
    assert _globals_of((partitioned + ")") + (global_win + ")")) == 1


def test_whitelists_reference_real_queries():
    """Every whitelist entry must name a registry query — a renamed
    query must not leave a stale whitelist row silently passing."""
    from goe_spark.queries import all_queries

    names = {s.name for s in all_queries()}
    for wl in (
        plan_audit.MD5_FILTER_OK,
        plan_audit.GLOBAL_WINDOW_OK,
        plan_audit.NESTED_LOOP_OK,
    ):
        stale = wl - names
        assert not stale, stale
