"""Incremental partition-append runner — the reference's offload main
loop (offload_table -> get_partitions_to_offload_chunks -> one
transport+stage+load cycle per chunk,
offload_source_data.py:1273-1308 + goe.py's chunk loop).

Selection picks the partitions past the stored HWM, the chunker bounds
each cycle at max_bytes/max_count (HWM closure keeps equal-HV
partitions together), and each chunk runs the FULL OffloadPipeline
with hwm = that chunk's max high value. The pipeline saves the HWM in
metadata only after its own verification passes, so a crash between
chunks resumes from the last VERIFIED chunk — re-running the runner
re-selects only what is still unoffloaded. Restart scope and executor
memory are therefore bounded by chunk size no matter how large the
backlog, which is the property that matters when the backlog is
100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.plans.chunker import (
    MAX_CHUNK_BYTES,
    MAX_CHUNK_COUNT,
    chunk_partitions,
)
from goe_spark.plans.metadata import MetadataStore
from goe_spark.plans.offload import OffloadConfig, OffloadPipeline
from goe_spark.plans.partitions import (
    SPLIT_90_10,
    SourcePartition,
    hwm_of,
    select_list,
    select_range,
)


def discover_partitions(
    source_df: DataFrame,
    partition_expr,
    avg_row_bytes: int = 128,
) -> list[SourcePartition]:
    """Derive the partition catalog from the data itself: one
    SourcePartition per distinct synthetic partition value, sized from
    row counts (the reference reads Oracle's segment catalog; a file
    frontend has no catalog, so one aggregate scan stands in). The
    aggregate output is one row per partition — driver-safe."""
    rows = (
        source_df.groupBy(partition_expr.alias("hv"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return sorted(
        (
            SourcePartition(
                name=f"p_{r['hv']}",
                high_value=r["hv"],
                size_bytes=int(r["n"]) * avg_row_bytes,
                row_count=int(r["n"]),
            )
            for r in rows
            if r["hv"] is not None
        ),
        key=lambda p: str(p.high_value),
    )


@dataclass
class IpaResult:
    chunks_run: int = 0
    rows_offloaded: int = 0
    hwms: list = field(default_factory=list)  # HWM after each chunk
    chunk_results: list = field(default_factory=list)


def offload_partitioned_table(
    spark: SparkSession,
    cfg: OffloadConfig,
    source_df: DataFrame,
    partitions: list[SourcePartition] | None = None,
    new_hwm=None,
    split: str = SPLIT_90_10,
    max_chunk_bytes: int = MAX_CHUNK_BYTES,
    max_chunk_count: int = MAX_CHUNK_COUNT,
) -> IpaResult:
    """Offload every unoffloaded partition up to ``new_hwm`` (None =
    all closed partitions), one bounded chunk at a time.

    cfg.partition must be set (the synthetic expression IS the
    partition identity); cfg.hwm is managed per-chunk by this runner.
    """
    if cfg.partition is None:
        raise ValueError("offload_partitioned_table requires cfg.partition")
    if split != SPLIT_90_10:
        raise ValueError(
            "chunked runner implements the 90/10 incremental split; "
            "100/10 and 100/0 are single-pass (use OffloadPipeline)"
        )
    if partitions is None:
        partitions = discover_partitions(source_df, cfg.partition.expr())

    store = MetadataStore(cfg.metadata_dir)
    md = store.get(cfg.owner, cfg.table_name)
    prior = md.incremental_high_value if md is not None else None

    selected = select_range(partitions, new_hwm=new_hwm, prior_hwm=prior)
    result = IpaResult()
    for chunk in chunk_partitions(
        selected, max_bytes=max_chunk_bytes, max_count=max_chunk_count
    ):
        chunk_hwm = hwm_of(chunk)
        chunk_cfg = replace(cfg, hwm=chunk_hwm)
        res = OffloadPipeline(spark, chunk_cfg).run(source_df)
        # The pipeline verified and SAVED this chunk's HWM before we
        # get here — a crash on the NEXT chunk resumes after this one.
        result.chunks_run += 1
        result.rows_offloaded += res.rows_final
        result.hwms.append(chunk_hwm)
        result.chunk_results.append(res)
    return result


def offload_list_partitions(
    spark: SparkSession,
    cfg: OffloadConfig,
    source_df: DataFrame,
    partition_column: str,
    partitions: list[SourcePartition] | None = None,
    requested_names: list[str] | None = None,
    requested_values: list | None = None,
    max_chunk_bytes: int = MAX_CHUNK_BYTES,
    max_chunk_count: int = MAX_CHUNK_COUNT,
) -> IpaResult:
    """LPA driver: offload the requested LIST partitions (by name or
    value), minus those already recorded in offloaded_high_values,
    one bounded chunk at a time. Each chunk slices the source with
    `partition_column IN (chunk values)` and the pipeline appends and
    records the values only after verification — crash-resume drops
    straight out of the bookkeeping, as in the RANGE runner."""
    if partitions is None:
        partitions = discover_partitions(source_df, F.col(partition_column))
    store = MetadataStore(cfg.metadata_dir)
    md = store.get(cfg.owner, cfg.table_name)
    # Metadata stores LIST values as strings (JSON round-trip), so the
    # already-offloaded filter compares string forms — hv_key equality
    # would miss date/decimal values against their stored spelling.
    already = {
        str(v)
        for v in (md.offloaded_high_values if md is not None else [])
    }
    selected = [
        p
        for p in select_list(
            partitions,
            requested_names=requested_names,
            requested_values=requested_values,
        )
        if str(p.high_value) not in already
    ]
    result = IpaResult()
    for chunk in chunk_partitions(
        selected, max_bytes=max_chunk_bytes, max_count=max_chunk_count
    ):
        values = [p.high_value for p in chunk]
        chunk_cfg = replace(
            cfg,
            list_partition_column=partition_column,
            list_partition_values=values,
        )
        res = OffloadPipeline(spark, chunk_cfg).run(source_df)
        result.chunks_run += 1
        result.rows_offloaded += res.rows_final
        result.hwms.append(values)
        result.chunk_results.append(res)
    return result
