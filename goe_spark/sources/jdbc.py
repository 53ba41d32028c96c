"""Bind a SplitPlan to Spark's JDBC reader.

The reference generates a PySpark script whose JDBC options block is
templated text (src/goe/offload/offload_transport.py:1748-1757); here
the same decision becomes a plain options dict handed to
``spark.read.format("jdbc")`` — no codegen, no process boundary.

There is no RDBMS in the test container, so this module is exercised
two ways: unit tests assert the option dicts (the reference's own test
style for transport SQL), and tests/test_sources.py replays the plan's
``predicates`` against a parquet-backed DataFrame to prove each plan
partitions the table into disjoint, complete batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from goe_spark.sources.split_strategy import (
    SPLIT_BY_ID_RANGE,
    SPLIT_BY_NATIVE_RANGE,
    SplitPlan,
)


def dbtable_subquery(
    table: str,
    columns: list[str] | None = None,
    where: str | None = None,
    snapshot_clause: str | None = None,
) -> str:
    """Render the row-source subquery for the ``dbtable`` option.

    Predicate pushdown and column pruning happen *inside the source
    database* when baked into the dbtable text — the cheapest possible
    place (SURVEY.md §4 row 1). The snapshot clause (e.g. Oracle
    ``AS OF SCN n``) rides along verbatim, matching the reference's
    consistent-read scan (oracle_offload_transport_rdbms_api.py:636-645).
    """
    cols = ", ".join(columns) if columns else "*"
    src = table + (f" {snapshot_clause}" if snapshot_clause else "")
    q = f"SELECT {cols} FROM {src}"
    if where:
        q += f" WHERE {where}"
    return f"({q}) goe_src"


def jdbc_reader_options(
    url: str,
    table: str,
    plan: SplitPlan,
    columns: list[str] | None = None,
    where: str | None = None,
    custom_schema: str | None = None,
) -> dict[str, str]:
    """The complete options dict for ``spark.read.format("jdbc")``.

    Range-shaped plans map to partitionColumn/lowerBound/upperBound/
    numPartitions; predicate-shaped plans are returned without
    partitioning options (the caller passes ``plan.predicates`` to
    ``spark.read.jdbc(predicates=...)`` — Spark's DataFrameReader only
    accepts a predicate array through that API, not as an option).
    """
    opts = {
        "url": url,
        "dbtable": dbtable_subquery(
            table, columns, where, plan.snapshot_clause
        ),
        "fetchsize": str(plan.fetch_size),
    }
    if plan.split_type in (SPLIT_BY_ID_RANGE, SPLIT_BY_NATIVE_RANGE):
        if plan.lower_bound is None or plan.upper_bound is None:
            raise ValueError(
                f"{plan.split_type} plan has unresolved bounds; "
                "run min/max discovery first"
            )
        opts.update(
            partitionColumn=plan.partition_column,
            lowerBound=str(plan.lower_bound),
            upperBound=str(plan.upper_bound),
            numPartitions=str(plan.num_partitions or 1),
        )
    if plan.session_init_statement:
        opts["sessionInitStatement"] = plan.session_init_statement
    if custom_schema:
        opts["customSchema"] = custom_schema
    return opts


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    plan: SplitPlan,
    columns: list[str] | None = None,
    where: str | None = None,
    custom_schema: str | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Execute the plan. Predicate-shaped plans use the predicates API."""
    if plan.predicates:
        props = dict(properties or {})
        props.setdefault("fetchsize", str(plan.fetch_size))
        if custom_schema:
            props.setdefault("customSchema", custom_schema)
        return spark.read.jdbc(
            url=url,
            table=dbtable_subquery(table, columns, where, plan.snapshot_clause),
            predicates=list(plan.predicates),
            properties=props,
        )
    opts = jdbc_reader_options(url, table, plan, columns, where, custom_schema)
    return spark.read.format("jdbc").options(**opts).load()
