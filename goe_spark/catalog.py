"""Test-data catalog: load the driver's parquet tables.

Mirrors the reference's frontend/backend table abstraction at its
simplest (a named table you can read) — the full typed-source
machinery lives in goe_spark.sources.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at any realistic scale
# factor (region=5, nation=25 rows; supplier/part grow with SF but
# stay far below lineitem).
BROADCAST_DIMS = ("region", "nation")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS), which Spark rejects unless
        # nanosAsLong is set. Set it here (runtime-settable) so the
        # read works on ANY session, not just ours from session.py —
        # the correctness driver builds its own unconfigured session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # Read as long nanos and truncate to microseconds, matching
        # what micro-resolution engines (DuckDB included) see.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql access."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
