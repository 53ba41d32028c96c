"""Incremental partition selection (IPA) — the six source-data
strategies of the reference reduced to their Spark-rebuild shape
(offload_source_data.py:1316-3189, factory :138-290).

A SourcePartition is catalog metadata: name, high value(s), size.
Strategies decide WHICH partitions move this run:

- FULL / 100_0: everything not yet offloaded.
- RANGE (RPA): partitions whose high value <= the requested HWM and
  > the already-offloaded HWM — append-only forward motion. A
  MAXVALUE partition can only move under FULL semantics.
- LIST (LPA): explicitly named partitions / high values, minus those
  already offloaded.
- PREDICATE (PBO): no partition bookkeeping; the predicate itself is
  recorded in metadata and re-offloading the same predicate is
  rejected.
"""

from __future__ import annotations

from dataclasses import dataclass, field

MAXVALUE = "MAXVALUE"


@dataclass(frozen=True)
class SourcePartition:
    """One source partition's catalog row
    (OffloadSourcePartition, offload_source_data.py:374)."""

    name: str
    high_value: object  # comparable HV; MAXVALUE sentinel allowed
    size_bytes: int = 0
    row_count: int = 0


class PartitionSelectionError(ValueError):
    pass


def _is_maxvalue(hv) -> bool:
    return isinstance(hv, str) and hv.upper() == MAXVALUE


def select_full(partitions: list[SourcePartition]) -> list[SourcePartition]:
    return list(partitions)


def select_range(
    partitions: list[SourcePartition],
    new_hwm,
    prior_hwm=None,
) -> list[SourcePartition]:
    """RPA: move every partition with prior_hwm < high_value <= new_hwm.

    Partitions are treated as sorted by high value (range partitions
    are ordered by construction). A MAXVALUE partition never qualifies
    for a range append — the reference forces FULL for that.
    """
    out = []
    for p in partitions:
        if _is_maxvalue(p.high_value):
            continue
        if prior_hwm is not None and not (p.high_value > prior_hwm):
            continue
        if new_hwm is not None and not (p.high_value <= new_hwm):
            continue
        out.append(p)
    return sorted(out, key=lambda p: p.high_value)


def select_list(
    partitions: list[SourcePartition],
    requested_names: list[str] | None = None,
    requested_values: list | None = None,
    offloaded_values: list | None = None,
) -> list[SourcePartition]:
    """LPA: select by partition name or by high value; drop values
    already offloaded."""
    offloaded = set(offloaded_values or [])
    out = []
    for p in partitions:
        if requested_names is not None and p.name not in requested_names:
            continue
        if requested_values is not None and p.high_value not in requested_values:
            continue
        if p.high_value in offloaded:
            continue
        out.append(p)
    if requested_names:
        known = {p.name for p in partitions}
        missing = set(requested_names) - known
        if missing:
            raise PartitionSelectionError(f"unknown partitions: {sorted(missing)}")
    return out


def hwm_of(selected: list[SourcePartition]):
    """The new high-water mark after offloading `selected` (the max
    non-MAXVALUE high value)."""
    hvs = [p.high_value for p in selected if not _is_maxvalue(p.high_value)]
    return max(hvs) if hvs else None
