"""Query registry: every operator exposed through the driver contract.

Each QuerySpec pairs a Spark DataFrame builder with the ANSI-SQL
oracle string DuckDB runs on the same parquet tables. The driver
(and tools/check_oracle.py locally) compares row counts, schemas and
order-insensitive value hashes — so every computed column is aliased
identically on both sides, and floating-point aggregates are rounded
to a fixed scale to make the comparison deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


def all_queries() -> list[QuerySpec]:
    from goe_spark.queries import (
        asof,
        dedup,
        multimodal,
        offload,
        relational,
        relational2,
        relational3,
        similarity,
        streaming_batch,
        text,
        validation,
    )

    specs: list[QuerySpec] = []
    for mod in (
        asof,
        relational,
        relational2,
        relational3,
        validation,
        offload,
        dedup,
        text,
        similarity,
        streaming_batch,
        multimodal,
    ):
        specs.extend(mod.QUERIES)
    names = [s.name for s in specs]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(f"duplicate query names: {dupes}")
    return specs


def queries_dict() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.fn for s in all_queries()}


def oracle_dict() -> dict[str, str]:
    return {s.name: s.oracle for s in all_queries() if s.oracle is not None}
