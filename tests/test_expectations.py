"""Data-quality expectations: every rule kind fires on planted
violations and is silent on clean data; row-level rules share one
scan."""

from __future__ import annotations

from goe_spark.plans.expectations import (
    accepted_values,
    check_expectations,
    expression,
    foreign_key,
    not_null,
    unique,
)


def _report(spark, df, rules):
    return {
        r.rule: (r.n_violations, r.passed)
        for r in check_expectations(spark, df, rules).collect()
    }


def test_each_rule_kind_fires(spark):
    df = spark.createDataFrame(
        [
            (1, "A", 10.0),
            (1, "A", -5.0),  # dup key, negative price
            (None, "B", 3.0),  # null key
            (4, "X", None),  # bad status, NULL expression input
            (5, "A", 1.0),  # orphan vs ref
        ],
        "k long, status string, price double",
    )
    ref = spark.createDataFrame([(1,), (4,), (99,)], "rk long")
    rep = _report(
        spark,
        df,
        [
            not_null("k"),
            accepted_values("status", ["A", "B"]),
            expression("price_positive", "price > 0"),
            unique("k"),
            foreign_key("k", ref, "rk"),
        ],
    )
    assert rep["not_null_k"] == (1, False)
    assert rep["accepted_values_status"] == (1, False)  # 'X'
    # -5.0 fails, NULL price counts as a violation too
    assert rep["price_positive"] == (2, False)
    assert rep["unique_k"] == (2, False)  # both rows of the dup key
    assert rep["fk_k"] == (1, False)  # k=5 orphaned (nulls skipped)


def test_clean_data_all_pass(spark):
    df = spark.createDataFrame(
        [(1, "A", 1.0), (2, "B", 2.0)], "k long, status string, price double"
    )
    ref = spark.createDataFrame([(1,), (2,)], "rk long")
    rep = _report(
        spark,
        df,
        [
            not_null("k"),
            accepted_values("status", ["A", "B"]),
            expression("price_positive", "price > 0"),
            unique("k"),
            foreign_key("k", ref, "rk"),
        ],
    )
    assert all(v == (0, True) for v in rep.values())
    assert len(rep) == 5


def test_row_level_rules_share_one_scan(spark):
    """All row-level rules fold into a single aggregate: the plan has
    exactly one FileScan-free local relation here, but the real check
    is one Aggregate pair (partial+final), no join, no extra scan."""
    from goe_spark.catalog import load_table
    from tests.conftest import SF_SMALL

    o = load_table(spark, SF_SMALL, "orders")
    df = check_expectations(
        spark,
        o,
        [
            not_null("o_orderkey"),
            accepted_values("o_orderstatus", ["F", "O", "P"]),
            expression("price_positive", "o_totalprice > 0"),
        ],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1
    assert "Join" not in plan


def test_offload_gate_passes_and_blocks(spark, tmp_path):
    """CHECK_EXPECTATIONS in the offload pipeline: a passing rule set
    records the step and loads; a failing rule aborts BEFORE the
    final load touches the target (retryable failure)."""
    import os

    import pytest as _pytest

    from goe_spark.plans.offload import (
        OffloadConfig,
        OffloadPipeline,
        OffloadValidationError,
        PartitionSpec,
    )
    from tests.conftest import SF_SMALL

    src = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")

    def cfg(sub, rules):
        return OffloadConfig(
            owner="tpch",
            table_name="lineitem",
            target_dir=str(tmp_path / sub / "final"),
            staging_dir=str(tmp_path / sub / "staging"),
            metadata_dir=str(tmp_path / sub / "meta"),
            partition=PartitionSpec(
                source_column="l_shipdate", kind="date", granularity="M"
            ),
            expectations=rules,
        )

    ok = cfg("ok", [not_null("l_orderkey"), expression("qty_pos", "l_quantity > 0")])
    res = OffloadPipeline(spark, ok).run(src)
    assert "CHECK_EXPECTATIONS" in res.steps
    assert res.rows_final == src.count()

    bad = cfg("bad", [expression("impossible", "l_quantity > 1e12")])
    with _pytest.raises(OffloadValidationError, match="impossible"):
        OffloadPipeline(spark, bad).run(src)
    assert not os.path.exists(str(tmp_path / "bad" / "final"))
