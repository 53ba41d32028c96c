"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query smoke check on sf0.001.
queries()       — every implemented operator (SURVEY.md §2 + the
                  LLM-pipeline additions) as (spark, sf_dir) callables.
oracle_sql()    — matching DuckDB ANSI-SQL oracles for the driver's
                  sf0.01 hash-compare.

Implementation lives in goe_spark/; this module only adapts it to the
driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-shape pricing summary on sf0.001."""
    from goe_spark.queries.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from goe_spark.queries import queries_dict

    return queries_dict()


def oracle_sql() -> dict[str, str]:
    from goe_spark.queries import oracle_dict

    return oracle_dict()
