"""Multi-column RANGE high values (tuple HWMs) and subpartition-grain
IPA selection.

The reference models partition high values as positional tuples
(high_values_python, offload_source_data.py:453-469) compared
lexicographically (offload_source_data.py:620-626), with MAXVALUE
allowed per position; subpartition-grain selection additionally needs
the common-across-parents boundary rule (common_hwm_fn,
offload_source_data.py:453-455).
"""

from __future__ import annotations

import pytest

from goe_spark.plans.chunker import chunk_partitions
from goe_spark.plans.metadata import MetadataStore, OffloadMetadata
from goe_spark.plans.partitions import (
    MAXVALUE,
    PartitionSelectionError,
    SourcePartition,
    hv_boundary_filter,
    hv_key,
    hwm_of,
    select_list,
    select_range,
    select_range_split,
    with_subpartition_boundary_info,
    SPLIT_90_10,
)

P = SourcePartition


def ym_parts():
    """A (year, month)-partitioned table — the shape the verdict calls
    'the first thing a real migration hits'."""
    return [
        P("p_2011_12", (2011, 12), size_bytes=10),
        P("p_2012_01", (2012, 1), size_bytes=10),
        P("p_2012_02", (2012, 2), size_bytes=10),
        P("p_2012_03", (2012, 3), size_bytes=10),
        P("p_2012_max", (2012, MAXVALUE), size_bytes=10),
        P("p_max", (MAXVALUE, MAXVALUE), size_bytes=10),
    ]


class TestTupleComparison:
    def test_lexicographic(self):
        assert hv_key((2012, 1)) < hv_key((2012, 2))
        assert hv_key((2011, 12)) < hv_key((2012, 1))
        assert hv_key((2012, 2)) == hv_key([2012, 2])  # list == tuple

    def test_maxvalue_greatest_per_position(self):
        assert hv_key((2012, 99)) < hv_key((2012, MAXVALUE))
        assert hv_key((2012, MAXVALUE)) < hv_key((MAXVALUE, MAXVALUE))
        assert hv_key((2012, MAXVALUE)) == hv_key((2012, "maxvalue"))

    def test_scalar_still_works(self):
        assert hv_key("2012-01") < hv_key("2012-02")
        assert hv_key(5) < hv_key(MAXVALUE)


class TestMultiColumnRange:
    def test_select_range_tuple_hwm(self):
        got = select_range(ym_parts(), new_hwm=(2012, 2))
        assert [p.name for p in got] == ["p_2011_12", "p_2012_01", "p_2012_02"]

    def test_select_range_prior_and_new(self):
        got = select_range(
            ym_parts(), new_hwm=(2012, 3), prior_hwm=(2012, 1)
        )
        assert [p.name for p in got] == ["p_2012_02", "p_2012_03"]

    def test_maxvalue_position_never_range_appends(self):
        # Both the per-position and the all-MAXVALUE open partitions
        # are excluded from RPA, as in the reference.
        got = select_range(ym_parts(), new_hwm=(MAXVALUE, MAXVALUE))
        assert "p_2012_max" not in {p.name for p in got}
        assert "p_max" not in {p.name for p in got}

    def test_hwm_of_tuple(self):
        got = select_range(ym_parts(), new_hwm=(2012, 2))
        assert hwm_of(got) == (2012, 2)

    def test_prior_hwm_accepts_json_list_form(self):
        # Metadata JSON round-trips tuples as lists; selection must
        # treat them identically.
        got = select_range(ym_parts(), new_hwm=(2012, 3), prior_hwm=[2012, 1])
        assert [p.name for p in got] == ["p_2012_02", "p_2012_03"]

    def test_select_range_split_90_10(self):
        sel = select_range_split(ym_parts(), SPLIT_90_10, new_hwm=(2012, 2))
        assert sel.hwm == (2012, 2)
        assert len(sel.partitions) == 3

    def test_select_list_tuple_values(self):
        got = select_list(
            ym_parts(),
            requested_values=[(2012, 1), (2012, 2)],
            offloaded_values=[[2012, 1]],  # list form from metadata
        )
        assert [p.name for p in got] == ["p_2012_02"]


class TestMetadataRoundTrip:
    def test_tuple_hwm_survives_store(self, tmp_path):
        store = MetadataStore(str(tmp_path))
        md = OffloadMetadata(
            owner="o",
            table_name="t",
            offload_type="RANGE",
            incremental_key="year,month",
            incremental_high_value=(2012, 2),
        )
        store.save(md)
        back = store.get("o", "t")
        # JSON turns the tuple into a list; hv_key equates them and
        # selection accepts either spelling.
        assert hv_key(back.incremental_high_value) == hv_key((2012, 2))
        got = select_range(
            ym_parts(), new_hwm=(2012, 3),
            prior_hwm=back.incremental_high_value,
        )
        assert [p.name for p in got] == ["p_2012_03"]


class TestChunkerTupleHwm:
    def test_hwm_closure_on_tuple_hv(self):
        # Two subpartitions sharing (2012, 1) must land in one chunk
        # even when the size cap says split — one spelled as list.
        parts = [
            P("a", (2012, 1), size_bytes=100),
            P("b", [2012, 1], size_bytes=100),
            P("c", (2012, 2), size_bytes=100),
        ]
        chunks = list(chunk_partitions(parts, max_bytes=150))
        assert [len(c) for c in chunks] == [2, 1]


class TestBoundaryFilter:
    def test_arity_mismatch_rejected(self):
        with pytest.raises(PartitionSelectionError):
            hv_boundary_filter(["y", "m"], (2012,))

    def test_lexicographic_filter_matches_python(self, spark):
        rows = [
            (2011, 12, "a"),
            (2012, 1, "b"),
            (2012, 2, "c"),
            (2012, 3, "d"),
            (2013, 1, "e"),
        ]
        df = spark.createDataFrame(rows, ["y", "m", "v"])
        got = {
            r["v"]
            for r in df.where(
                hv_boundary_filter(["y", "m"], (2012, 2))
            ).collect()
        }
        assert got == {"a", "b", "c"}
        strict = {
            r["v"]
            for r in df.where(
                hv_boundary_filter(["y", "m"], (2012, 2), inclusive=False)
            ).collect()
        }
        assert strict == {"a", "b"}

    def test_maxvalue_position_collapses_to_prefix(self, spark):
        rows = [(2011, 12, "a"), (2012, 99, "b"), (2013, 1, "c")]
        df = spark.createDataFrame(rows, ["y", "m", "v"])
        got = {
            r["v"]
            for r in df.where(
                hv_boundary_filter(["y", "m"], (2012, MAXVALUE))
            ).collect()
        }
        # (y < 2012) OR (y = 2012 AND TRUE): everything through 2012.
        assert got == {"a", "b"}


class TestStatusReportNativeMultiCol:
    def test_retained_reclaimable_over_tuple_hwm(self, spark, tmp_path):
        """Native (year, month) RANGE key with no synthetic partition:
        the retained/reclaimable split uses the lexicographic boundary
        over the physical columns."""
        from goe_spark.plans.status_report import status_report

        rows = [
            (2011, 12, 1.0),
            (2012, 1, 1.0),
            (2012, 2, 1.0),
            (2012, 3, 1.0),
            (2013, 1, 1.0),
        ]
        src_path = str(tmp_path / "src")
        spark.createDataFrame(rows, ["y", "m", "v"]).write.parquet(src_path)
        store = MetadataStore(str(tmp_path / "md"))
        store.save(
            OffloadMetadata(
                owner="sh",
                table_name="ym",
                offload_type="RANGE",
                incremental_key="y,m",
                incremental_high_value=(2012, 2),
            )
        )
        row = status_report(
            spark, store, source_paths={("sh", "ym"): src_path}
        ).first()
        assert row.reclaimable_rows == 3  # through (2012, 2)
        assert row.retained_rows == 2


def composite_parts():
    """Composite table: parents q1/q2 (quarter LIST), RANGE
    subpartitions on month — subpartition HVs repeat across parents.
    q2 is missing the m3 subpartition, so 3 is NOT a common boundary.
    """
    raw = [
        P("q1_m1", 1, size_bytes=10, parent_name="q1"),
        P("q1_m2", 2, size_bytes=10, parent_name="q1"),
        P("q1_m3", 3, size_bytes=10, parent_name="q1"),
        P("q2_m1", 1, size_bytes=10, parent_name="q2"),
        P("q2_m2", 2, size_bytes=10, parent_name="q2"),
    ]
    return with_subpartition_boundary_info(raw)


class TestSubpartitionGrain:
    def test_boundary_info_marks_common(self):
        parts = composite_parts()
        by_name = {p.name: p for p in parts}
        assert by_name["q1_m1"].common_hwm and by_name["q2_m1"].common_hwm
        assert by_name["q1_m2"].common_hwm
        assert not by_name["q1_m3"].common_hwm  # q2 has no m3

    def test_select_range_at_subpartition_grain(self):
        got = select_range(composite_parts(), new_hwm=2)
        assert {p.name for p in got} == {"q1_m1", "q1_m2", "q2_m1", "q2_m2"}

    def test_hwm_requires_common_value(self):
        # Selecting through m3 must still close the HWM at 2: value 3
        # exists only under q1, so it cannot be the table boundary.
        got = select_range(composite_parts(), new_hwm=3)
        assert hwm_of(got, require_common=True) == 2
        assert hwm_of(got) == 3  # partition-grain rule unchanged

    def test_incremental_append_from_common_hwm(self):
        # Next run resumes from the recorded common HWM and picks up
        # the straggler q1_m3 plus anything new.
        parts = composite_parts() + with_subpartition_boundary_info(
            [P("q2_m3", 3, size_bytes=10, parent_name="q2")]
        )
        got = select_range(parts, new_hwm=3, prior_hwm=2)
        assert {p.name for p in got} == {"q1_m3", "q2_m3"}

    def test_chunker_keeps_shared_subpart_hv_together(self):
        parts = sorted(composite_parts(), key=lambda p: hv_key(p.high_value))
        chunks = list(chunk_partitions(parts, max_count=1))
        # m1 pair, m2 pair, then the lone m3 — HWM closure overrides
        # the count cap for repeated subpartition HVs.
        assert [sorted(p.name for p in c) for c in chunks] == [
            ["q1_m1", "q2_m1"],
            ["q1_m2", "q2_m2"],
            ["q1_m3"],
        ]


class TestHvKeyProperties:
    """Property tests: hv_key must be a total order that agrees with
    Python tuple ordering on concrete values and places MAXVALUE
    greatest at any position."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    ints = st.integers(min_value=-(10**6), max_value=10**6)
    tuples = st.tuples(ints, ints, ints)

    @given(tuples, tuples)
    @settings(max_examples=200, deadline=None)
    def test_agrees_with_tuple_order(self, a, b):
        assert (hv_key(a) < hv_key(b)) == (a < b)
        assert (hv_key(a) == hv_key(b)) == (a == b)

    @given(tuples, st.integers(min_value=0, max_value=2))
    @settings(max_examples=200, deadline=None)
    def test_maxvalue_greatest_at_any_position(self, a, pos):
        lifted = tuple(
            MAXVALUE if i == pos else v for i, v in enumerate(a)
        )
        if a[pos] != MAXVALUE:
            assert hv_key(a) < hv_key(lifted)
        # Idempotent: lifting twice compares equal.
        assert hv_key(lifted) == hv_key(list(lifted))

    @given(st.lists(tuples, min_size=1, max_size=20))
    @settings(max_examples=100, deadline=None)
    def test_sort_matches_python_sort(self, xs):
        assert sorted(xs, key=hv_key) == sorted(xs)
