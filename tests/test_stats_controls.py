"""Stats copy/compute (A10/A11): decision algebra + live gather/analyze."""

from __future__ import annotations

import pytest

from goe_spark.plans.stats import (
    ColumnStats,
    analyze_table,
    cap_column_stats,
    copy_stats_decision,
    gather_stats,
    table_stats,
)
from tests.conftest import SF_SMALL


class TestCopyDecision:
    def test_fewer_rdbms_rows_blocks_copy(self):
        d = copy_stats_decision(rdbms_num_rows=100, backend_num_rows=200)
        assert not d.copy_table_stats and not d.copy_column_stats
        assert "row count" in d.reason

    def test_equal_rows_blocks_copy(self):
        assert not copy_stats_decision(100, 100).copy_table_stats

    def test_plain_copy_caps_ndv_at_rdbms_rows(self):
        d = copy_stats_decision(rdbms_num_rows=500, backend_num_rows=200)
        assert d.copy_table_stats and d.ndv_cap == 500
        assert d.num_null_factor == 1.0

    def test_additive_copy_sums_cap_and_factors_nulls(self):
        d = copy_stats_decision(
            rdbms_num_rows=1000,
            backend_num_rows=400,
            additive=True,
            pro_rate_num_rows=100,
        )
        assert d.copy_table_stats
        assert d.ndv_cap == 1400
        # (100 incremental + 400 already there) / 1000 total
        assert d.num_null_factor == pytest.approx(0.5)

    def test_negative_backend_rows_treated_as_zero(self):
        d = copy_stats_decision(10, -1, additive=True)
        assert d.ndv_cap == 10

    def test_cap_application(self):
        d = copy_stats_decision(1000, 400, additive=True, pro_rate_num_rows=100)
        capped = cap_column_stats(
            {"a": ColumnStats(ndv=5000, num_nulls=10)}, d
        )
        assert capped["a"].ndv == 1400
        assert capped["a"].num_nulls == 5


class TestLiveStats:
    def test_gather_stats_orders(self, spark):
        df = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        n_rows, stats = gather_stats(df, ["o_orderkey", "o_orderstatus"])
        assert n_rows == df.count()
        # keys are unique: HLL estimate within its ~2% default rsd
        # (observed ~7% at 1.5k rows — small-cardinality bias)
        assert stats["o_orderkey"].ndv == pytest.approx(n_rows, rel=0.10)
        assert stats["o_orderkey"].num_nulls == 0
        assert 1 <= stats["o_orderstatus"].ndv <= 3
        assert stats["o_orderkey"].low_value == 0
        assert stats["o_orderkey"].high_value == n_rows - 1

    def test_analyze_table_native(self, spark, tmp_path):
        df = spark.read.parquet(f"{SF_SMALL}/region.parquet")
        df.write.mode("overwrite").saveAsTable("stats_probe")
        try:
            analyze_table(spark, "stats_probe")
            st = table_stats(spark, "stats_probe")
            assert "statistics" in st and "rows" in st["statistics"]
        finally:
            spark.sql("DROP TABLE IF EXISTS stats_probe")


def test_status_report_html_rendering(spark, tmp_path):
    """HTML status output (the reference's third format,
    offload_status_report.py:2786+): a self-contained table for both
    levels, with metadata values present and markup-significant
    characters escaped."""
    from goe_spark.plans.metadata import MetadataStore, OffloadMetadata
    from goe_spark.plans.status_report import render_report, status_report

    store = MetadataStore(str(tmp_path / "md"))
    store.save(
        OffloadMetadata(
            owner="sh",
            table_name="orders<&>",
            offload_type="RANGE",
            incremental_key="o_orderdate",
            incremental_high_value="1996-06",
        )
    )
    rpt = status_report(spark, store)
    html = render_report(rpt, fmt="html", level="detail")
    assert html.startswith("<!DOCTYPE html>")
    assert "<table>" in html and "</table>" in html
    assert "orders&lt;&amp;&gt;" in html  # escaped, not raw
    assert "1996-06" in html
    summary = render_report(rpt, fmt="html", level="summary")
    assert summary.startswith("<!DOCTYPE html>")
    assert "<table>" in summary
    assert "offloaded_tables" in summary  # keys render as row headers
