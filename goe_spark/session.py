"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same config
block is what we would ship to a 1000-executor cluster — AQE owns the
shuffle-partition decision at runtime, broadcast threshold is left to
Spark's default (10 MB) plus explicit ``broadcast()`` hints on
dimension tables, and the session timezone is pinned to UTC so
timestamp semantics match the DuckDB correctness oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tuned for the local[32]/128GiB test box; on a real cluster the same
# settings hold except shuffle.partitions, which AQE coalesces anyway.
_DEFAULT_CONF = {
    # AQE: runtime re-planning (skew-join splitting, partition
    # coalescing, dynamic join-strategy switch). Essential at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # AQE's coalescing floor. The engine's hot stages are expression-
    # dense and byte-light (collected group arrays, candidate pairs,
    # hash keys), so the stock 1 MB floor folds real CPU stages onto
    # 1-2 cores (r13 §15 measured a 1.7 s single task behind a 551 KB
    # exchange). Env-overridable for A/B; scale-safe either way —
    # at volume the 64 MB advisory target dominates and the floor
    # only governs small stages.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": os.environ.get(
        "GOE_AQE_MIN_PARTITION_SIZE", "1m"
    ),
    # Deterministic timestamp semantics (matches DuckDB oracle).
    "spark.sql.session.timeZone": "UTC",
    # Arrow for any pandas_udf / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet scan: pushdown + pruning are defaults, stated here as
    # load-bearing config we rely on.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # ANSI off by default: GOE semantics are "cast failure => NULL"
    # (SAFE_CAST); we use try_* functions explicitly where it matters.
    # The VERIFICATION stack (tools/check_oracle.py, the oracle pytest
    # gate, bench.py) overrides this to "true" for driver parity —
    # round 11 proved an ANSI-off mirror is blind to DIVIDE_BY_ZERO /
    # CAST_INVALID_INPUT bugs the driver's ANSI-on session raises.
    # Env override SPARK_GRAFT_ANSI=1/0 wins over both.
    "spark.sql.ansi.enabled": "false",
    # events.parquet carries TIMESTAMP(NANOS) which Spark has no native
    # type for; read as long and convert in catalog.load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")


def get_spark(
    app_name: str = "goe-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the SparkSession.

    ``shuffle_partitions`` defaults to the local core count — AQE
    coalesces down from there; on a cluster you'd set it high (or rely
    on spark.sql.adaptive.coalescePartitions.initialPartitionNum).
    """
    builder = SparkSession.builder.appName(app_name).master(master or default_master())
    conf = dict(_DEFAULT_CONF)
    nshuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    conf["spark.sql.shuffle.partitions"] = str(nshuffle)
    if extra_conf:
        conf.update(extra_conf)
    ansi_env = os.environ.get("SPARK_GRAFT_ANSI")
    if ansi_env is not None:
        conf["spark.sql.ansi.enabled"] = (
            "true" if ansi_env.lower() in ("1", "true") else "false"
        )
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
