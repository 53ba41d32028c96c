"""Partition chunker (O3 — offload_source_data.py:1273-1308).

Greedy size/count-bounded chunks; each chunk is one
transport+stage+load cycle so memory and restart scope stay bounded.
The HWM-closure rule: partitions sharing a high value must land in
the same chunk, otherwise a failure between chunks would leave a HWM
that lies about what was moved.
"""

from __future__ import annotations

from collections.abc import Iterator

from goe_spark.plans.partitions import SourcePartition, hv_key

MAX_CHUNK_BYTES = 16 * 1024**3  # reference default 16G
MAX_CHUNK_COUNT = 100  # reference default 100 partitions


def chunk_partitions(
    partitions: list[SourcePartition],
    max_bytes: int = MAX_CHUNK_BYTES,
    max_count: int = MAX_CHUNK_COUNT,
) -> Iterator[list[SourcePartition]]:
    """Yield chunks preserving input order. A chunk closes when adding
    the next partition would exceed either cap — unless that partition
    shares the current chunk's trailing high value (HWM closure)."""
    chunk: list[SourcePartition] = []
    chunk_bytes = 0
    for p in partitions:
        if chunk:
            over = (
                chunk_bytes + p.size_bytes > max_bytes
                or len(chunk) + 1 > max_count
            )
            # hv_key equality so scalar/tuple/list spellings of the
            # same HV (JSON round-trips tuples as lists) still close
            # together, including at subpartition grain where HVs
            # repeat across parents.
            same_hwm = hv_key(p.high_value) == hv_key(chunk[-1].high_value)
            if over and not same_hwm:
                yield chunk
                chunk, chunk_bytes = [], 0
        chunk.append(p)
        chunk_bytes += p.size_bytes
    if chunk:
        yield chunk
