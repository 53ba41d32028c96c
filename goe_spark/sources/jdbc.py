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


# Frontend-dialect sample clauses for sampling pushdown (the
# reference pushes ``SAMPLE BLOCK (pct)`` into the Oracle scan —
# oracle_offload_source_table.py:784, driven by
# offload_source_table.py:668-927 — so a 1% type-tightening sample
# reads ~1% of the blocks instead of scanning the full table and
# discarding 99% client-side). Dialects whose sample operator
# suffixes the TABLE REFERENCE:
_TABLE_SAMPLE_CLAUSES = {
    "oracle": "SAMPLE BLOCK ({pct})",
    "postgresql": "TABLESAMPLE SYSTEM ({pct})",
    "mssql": "TABLESAMPLE SYSTEM ({pct} PERCENT)",
    "ansi": "TABLESAMPLE SYSTEM ({pct})",
}
# Dialects whose sample operator suffixes the whole QUERY:
_QUERY_SAMPLE_CLAUSES = {
    "teradata": "SAMPLE {frac}",
}


def _fixed_point(x: float) -> str:
    """Decimal-point rendering with no exponent: SAMPLE / TABLESAMPLE
    parsers reject '1e-05', which '%g' emits for tiny percents."""
    s = f"{x:.10f}".rstrip("0").rstrip(".")
    return s or "0"


def sample_clause(dialect: str, percent: float) -> tuple[str, str] | None:
    """(position, clause) for the dialect's native sampler, or None
    when the frontend has none (caller falls back to a post-read
    ``df.sample`` — correct but scans everything).

    percent == 100 returns None — a full read needs no sampler, and
    rendering it would be hazardous on Teradata, where ``SAMPLE 1``
    (an INTEGER argument) means ONE ROW, not fraction 1.0: a silent
    one-row sample would have type-sampling derive types from a
    single row."""
    if not 0 < percent <= 100:
        raise ValueError(f"sample percent out of range: {percent}")
    if percent == 100:
        return None
    d = dialect.lower()
    if d in _TABLE_SAMPLE_CLAUSES:
        return "table", _TABLE_SAMPLE_CLAUSES[d].format(
            pct=_fixed_point(percent)
        )
    if d in _QUERY_SAMPLE_CLAUSES:
        # Teradata reads a fractional argument as a proportion; keep
        # an explicit decimal point so it can never parse as a row
        # count (integer form).
        frac = percent / 100.0
        rendered = _fixed_point(frac)
        if "." not in rendered:
            rendered += ".0"
        return "query", _QUERY_SAMPLE_CLAUSES[d].format(frac=rendered)
    return None


def dialect_from_jdbc_url(url: str) -> str:
    """Frontend dialect keyword from a JDBC URL's subprotocol
    (``jdbc:derby:...`` -> ``derby``). Drives dialect-templated SQL
    that runs INSIDE the source DB (sample pushdown, MOD-split hash);
    unknown subprotocols return themselves so templated lookups fall
    through to their safe defaults."""
    u = url.lower()
    if not u.startswith("jdbc:"):
        return "ansi"
    sub = u[len("jdbc:"):].split(":", 1)[0]
    return {"sqlserver": "mssql", "postgres": "postgresql"}.get(sub, sub)


def dbtable_subquery(
    table: str,
    columns: list[str] | None = None,
    where: str | None = None,
    snapshot_clause: str | None = None,
    sample: tuple[str, str] | None = None,
) -> str:
    """Render the row-source subquery for the ``dbtable`` option.

    Predicate pushdown and column pruning happen *inside the source
    database* when baked into the dbtable text — the cheapest possible
    place (SURVEY.md §4 row 1). The snapshot clause (e.g. Oracle
    ``AS OF SCN n``) rides along verbatim, matching the reference's
    consistent-read scan (oracle_offload_transport_rdbms_api.py:636-645).
    ``sample`` is a (position, clause) pair from sample_clause();
    table-positioned clauses follow the snapshot clause (Oracle's
    flashback-then-sample table_reference order), query-positioned
    ones append after WHERE.
    """
    cols = ", ".join(columns) if columns else "*"
    src = table + (f" {snapshot_clause}" if snapshot_clause else "")
    if sample and sample[0] == "table":
        src += f" {sample[1]}"
    q = f"SELECT {cols} FROM {src}"
    if where:
        q += f" WHERE {where}"
    if sample and sample[0] == "query":
        q += f" {sample[1]}"
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
