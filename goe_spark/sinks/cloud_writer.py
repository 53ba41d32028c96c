"""LIVE cloud-warehouse backend writer (S13) — BigQuery / Snowflake
over their Spark connector datasources, jar-gated the way the native
Avro writer is (sources/files.py avro_available).

Reference parity: the first thing a real GOE deployment drives is an
Oracle -> BigQuery offload; the final-table half of that is
`bigquery_backend_table.py:157-177` (create / insert-select / verify)
over `bigquery_backend_api.py:1425-1473`. This writer implements the
same five-call BackendWriter protocol over
``spark.write.format("bigquery"|"snowflake")``:

- create_table returns the SAME DDL text the recordable
  FakeWarehouseWriter produces (shared builder
  backend_writer.warehouse_create_table_ddl — parity by
  construction, pinned by tests). The table itself materializes on
  first write: both connectors create-on-save, and the partition /
  cluster layout rides the WRITE OPTIONS (BigQuery ``partitionField``
  / ``clusteringFields``; Snowflake has no partition clause —
  micro-partitions cluster on ingest order), so the DDL text is the
  logging/DDL-file artifact, exactly as ParquetBackendWriter treats
  it.
- load_final hands the staged DataFrame to the connector's
  distributed sink — every executor streams its partitions, nothing
  is collected to the driver; at 100 TB the write parallelism is the
  DataFrame's partitioning (BigQuery indirect mode stages to GCS and
  issues one load job; Snowflake stages to an internal stage and
  COPYs).
- snapshot/rollback are control-plane SQL: Snowflake routes through
  the connector's ``Utils.runQuery`` (driver-side, one statement);
  BigQuery DML needs the google-cloud-bigquery client, import-gated
  the same way — where neither control plane is importable the
  methods raise rather than pretend (the honest-gap rule the fake
  follows).

The option-assembly methods are PURE (no session, no jar), so the
plumbing is testable credential-free; the live path is behind
``connector_available`` and skips cleanly in jarless environments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from goe_spark.sinks.backend_writer import (
    BackendWriter,
    warehouse_create_table_ddl,
)

# Spark datasource short names the connectors register.
_FORMATS = {"bigquery": "bigquery", "snowflake": "snowflake"}


def connector_available(spark: SparkSession, dialect: str) -> bool:
    """True if the dialect's Spark connector jar is on the classpath
    (the avro_available probe pattern: a read against a path that
    cannot exist distinguishes 'datasource missing' from every other
    failure)."""
    fmt = _FORMATS[dialect]
    try:
        spark.read.format(fmt).load("/nonexistent-connector-probe")
        return True  # pragma: no cover - only with the jar present
    except Exception as e:  # noqa: BLE001 - the probe IS the contract
        return "Failed to find data source" not in str(e)


class CloudWarehouseWriter(BackendWriter):
    """BackendWriter over a cloud warehouse Spark connector.

    ``connection`` carries the connector's session options — BigQuery:
    ``parentProject`` / ``temporaryGcsBucket`` (indirect writes) or
    ``writeMethod: direct``; Snowflake: ``sfURL sfUser sfPassword
    sfDatabase sfSchema sfWarehouse``. They are passed through
    verbatim on every read and write, the reference's connection-
    profile behavior."""

    def __init__(
        self,
        dialect: str,
        owner: str,
        table_name: str,
        connection: dict[str, str] | None = None,
        partition_col: str | None = None,
        cluster_columns: list[str] | None = None,
    ):
        if dialect not in _FORMATS:
            raise ValueError(f"unknown warehouse dialect: {dialect}")
        self.dialect = dialect
        self.backend_name = dialect
        self.owner = owner
        self.table_name = table_name
        self.connection = dict(connection or {})
        self.partition_col = partition_col
        self.cluster_columns = list(cluster_columns or [])

    # ---- pure option plumbing (credential-free testable) ----------

    @property
    def qualified(self) -> str:
        return f"{self.owner}.{self.table_name}"

    def table_options(self) -> dict[str, str]:
        """Connector options naming the target table."""
        if self.dialect == "bigquery":
            return {"table": self.qualified}
        return {"dbtable": self.qualified}

    def write_options(self) -> dict[str, str]:
        """The full option map a load passes to
        ``df.write.format(...)`` — connection + table + layout."""
        opts = dict(self.connection)
        opts.update(self.table_options())
        if self.dialect == "bigquery":
            if self.partition_col:
                opts["partitionField"] = self.partition_col
            if self.cluster_columns:
                # connector option is a comma-separated list
                opts["clusteringFields"] = ",".join(self.cluster_columns)
        return opts

    def read_options(self) -> dict[str, str]:
        opts = dict(self.connection)
        opts.update(self.table_options())
        return opts

    # ---- the five-call protocol ------------------------------------

    def create_table(
        self,
        owner,
        table_name,
        canonical_cols,
        partition_col=None,
        cluster_columns=None,
    ) -> str:
        self.owner, self.table_name = owner, table_name
        if partition_col is not None:
            self.partition_col = partition_col
        if cluster_columns:
            self.cluster_columns = list(cluster_columns)
        return warehouse_create_table_ddl(
            self.dialect,
            owner,
            table_name,
            canonical_cols,
            partition_col=self.partition_col,
            cluster_columns=self.cluster_columns,
        )

    def load_final(
        self, df, replace, partition_col=None, slice_clause=None
    ) -> None:
        (
            df.write.format(_FORMATS[self.dialect])
            .options(**self.write_options())
            .mode("overwrite" if replace else "append")
            .save()
        )

    def read_final(self, spark) -> DataFrame:
        return (
            spark.read.format(_FORMATS[self.dialect])
            .options(**self.read_options())
            .load()
        )

    # ---- control plane ----------------------------------------------

    def run_sql(self, spark: SparkSession, sql: str) -> None:
        """One driver-side control-plane statement (rollback DELETEs,
        drop). Snowflake: the connector's Utils.runQuery. BigQuery:
        the google-cloud-bigquery client. Raises where the control
        plane is not importable — never silently skips."""
        if self.dialect == "snowflake":
            utils = (
                spark._jvm.net.snowflake.spark.snowflake.Utils
            )  # pragma: no cover - jar-gated
            jmap = spark._jvm.java.util.HashMap()  # pragma: no cover
            for k, v in self.read_options().items():  # pragma: no cover
                jmap.put(k, v)  # pragma: no cover
            utils.runQuery(jmap, sql)  # pragma: no cover
            return  # pragma: no cover
        try:
            from google.cloud import bigquery  # type: ignore
        except ImportError as e:
            raise NotImplementedError(
                "BigQuery control-plane SQL needs google-cloud-bigquery "
                "(rollback/drop are DML the Spark connector cannot issue)"
            ) from e
        client = bigquery.Client(  # pragma: no cover - client-gated
            project=self.connection.get("parentProject")
        )
        client.query(sql).result()  # pragma: no cover

    def rollback_sql(self, slice_clause: str | None) -> str:
        """The DELETE that undoes an in-flight incremental slice —
        the relational rollback shape jdbc_writer proves live (file
        snapshots don't exist once rows are inside a warehouse)."""
        if not slice_clause:
            raise ValueError("cloud rollback needs the slice clause")
        return f"DELETE FROM {self.qualified} WHERE {slice_clause}"

    def snapshot(self, spark):
        # The rollback token is the slice boundary itself: incremental
        # loads carry their slice_clause, and rollback deletes it.
        return self.qualified

    def rollback_to(self, token, spark) -> None:
        raise NotImplementedError(
            "cloud rollback is slice-scoped: call "
            "run_sql(spark, rollback_sql(slice_clause)) with the "
            "in-flight slice — a whole-table file snapshot does not "
            "exist inside a warehouse"
        )

    def drop_table(self, spark) -> None:
        self.run_sql(spark, f"DROP TABLE IF EXISTS {self.qualified}")
