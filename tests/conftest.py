from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from goe_spark.session import get_spark

    # Driver parity: run the test session ANSI-on (the driver's
    # correctness gate does) so ANSI-semantics bugs (DIVIDE_BY_ZERO,
    # CAST_INVALID_INPUT) surface locally instead of shipping.
    # GOE_TEST_ANSI=0 restores the engine's non-ANSI default.
    ansi = os.environ.get("GOE_TEST_ANSI", "1").lower() in ("1", "true")
    s = get_spark(
        "goe-spark-tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.ansi.enabled": "true" if ansi else "false"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    yield con


@pytest.fixture
def offloaded_orders(spark, tmp_path):
    """Orders offloaded to a month-partitioned parquet target — shared
    by the targeted-delete and merge test suites. Returns
    (target_dir, source_df, PartitionSpec)."""
    from goe_spark.plans.offload import (
        OffloadConfig,
        OffloadPipeline,
        PartitionSpec,
    )

    spec = PartitionSpec(
        source_column="o_orderdate", kind="date", granularity="M"
    )
    src = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    cfg = OffloadConfig(
        owner="tpch",
        table_name="orders",
        target_dir=str(tmp_path / "final"),
        staging_dir=str(tmp_path / "staging"),
        metadata_dir=str(tmp_path / "meta"),
        partition=spec,
    )
    OffloadPipeline(spark, cfg).run(src)
    return cfg.target_dir, src, spec


def partition_file_map(path):
    """{partition_dir: {file: mtime}} for byte-stability assertions."""
    out = {}
    for d in os.listdir(path):
        full = os.path.join(path, d)
        if "=" in d and not d.startswith(".") and os.path.isdir(full):
            out[d] = {
                f: os.path.getmtime(os.path.join(full, f))
                for f in os.listdir(full)
                if not f.startswith(("_", "."))
            }
    return out
