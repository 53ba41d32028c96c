"""Orchestration control plane: step runner, locks, schema sync,
status report (SURVEY §2.11 O1/O6/O7/O8)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from goe_spark.plans.locks import LockTakenError, TableLock
from goe_spark.plans.metadata import MetadataStore, OffloadMetadata
from goe_spark.plans.schema_sync import (
    SchemaSyncError,
    diff_schemas,
    schema_sync_ddl,
    sync_table_schema,
)
from goe_spark.plans.status_report import status_report
from goe_spark.plans.steps import StepError, StepRunner
from tests.conftest import SF_SMALL


class TestStepRunner:
    def test_ok_and_skip_and_timing(self):
        r = StepRunner(skip={"verify"}, log=lambda *_: None)
        assert r.run("transport", lambda: 42) == 42
        assert r.run("verify", lambda: 1 / 0) is None  # skipped, not run
        assert r.summary() == {"transport": "ok", "verify": "skipped"}
        assert r.results[0].seconds >= 0

    def test_error_wraps_and_records(self):
        r = StepRunner(log=lambda *_: None)
        with pytest.raises(StepError, match="final_load"):
            r.run("final_load", lambda: (_ for _ in ()).throw(ValueError("boom")))
        assert r.summary() == {"final_load": "error"}

    def test_injected_error_before_step(self):
        r = StepRunner(error_at="staging", log=lambda *_: None)
        r.run("transport", lambda: 1)
        with pytest.raises(StepError, match="staging"):
            r.run("staging", lambda: 2)


class TestLocks:
    def test_exclusive(self, tmp_path):
        root = str(tmp_path)
        with TableLock(root, "SH", "SALES"):
            with pytest.raises(LockTakenError):
                TableLock(root, "SH", "SALES").acquire()
        # released: can take again
        with TableLock(root, "sh", "sales"):
            pass

    def test_different_tables_dont_conflict(self, tmp_path):
        with TableLock(str(tmp_path), "SH", "A"), TableLock(
            str(tmp_path), "SH", "B"
        ):
            pass


class TestSchemaSync:
    BACK = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )

    def test_additive_diff_and_ddl(self):
        front = StructType(
            [
                StructField("id", LongType()),
                StructField("name", StringType()),
                StructField("added_at", StringType()),
                StructField("score", IntegerType()),
            ]
        )
        delta = diff_schemas(front, self.BACK)
        assert [f.name for f in delta.new_columns] == ["added_at", "score"]
        assert delta.is_additive
        ddl = schema_sync_ddl("db.t", delta)
        assert ddl == [
            "ALTER TABLE db.t ADD COLUMNS (`added_at` string, `score` int)"
        ]

    def test_drop_and_retype_refused(self):
        front = StructType([StructField("id", StringType())])  # retyped + dropped
        delta = diff_schemas(front, self.BACK)
        assert delta.dropped_columns == ("name",)
        assert delta.retyped_columns == ("id",)
        with pytest.raises(SchemaSyncError, match="additive"):
            schema_sync_ddl("db.t", delta)

    def test_case_insensitive_no_change(self):
        front = StructType(
            [StructField("ID", LongType()), StructField("NAME", StringType())]
        )
        delta = diff_schemas(front, self.BACK)
        assert delta.new_columns == () and delta.is_additive

    def test_live_alter_on_catalog_table(self, spark, tmp_path):
        tbl = "schema_sync_t1"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(
            f"CREATE TABLE {tbl} (id bigint, name string) USING parquet "
            f"LOCATION '{tmp_path}/t1'"
        )
        try:
            front = StructType(
                [
                    StructField("id", LongType()),
                    StructField("name", StringType()),
                    StructField("extra", IntegerType()),
                ]
            )
            delta = sync_table_schema(spark, tbl, front)
            assert [f.name for f in delta.new_columns] == ["extra"]
            assert [f.name for f in spark.table(tbl).schema.fields] == [
                "id",
                "name",
                "extra",
            ]
            # idempotent second run: empty delta
            delta2 = sync_table_schema(spark, tbl, front)
            assert delta2.new_columns == ()
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")


class TestStatusReport:
    def test_report_over_store(self, spark, tmp_path):
        store = MetadataStore(str(tmp_path / "md"))
        store.save(
            OffloadMetadata(
                owner="SH",
                table_name="SALES",
                offload_type="RANGE",
                incremental_key="o_orderdate",
                incremental_high_value="1997-01-01",
            )
        )
        store.save(OffloadMetadata(owner="SH", table_name="DIM"))
        # back one table with real files
        src = spark.read.parquet(f"{SF_SMALL}/region.parquet")
        out = str(tmp_path / "final_sales")
        src.write.mode("overwrite").parquet(out)
        rpt = status_report(
            spark, store, {("sh", "sales"): out}
        ).orderBy("table_name")
        rows = rpt.collect()
        assert [r.table_name for r in rows] == ["dim", "sales"]
        sales = rows[1]
        assert sales.offload_type == "RANGE"
        assert sales.backend_rows == 5
        assert sales.backend_bytes > 0
        assert rows[0].backend_rows is None  # no path mapped

    def test_empty_store(self, spark, tmp_path):
        rpt = status_report(spark, MetadataStore(str(tmp_path / "empty")))
        assert rpt.count() == 0
        assert "offload_type" in rpt.columns
