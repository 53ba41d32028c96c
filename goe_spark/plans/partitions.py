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


DEFAULT_PARTITION = "DEFAULT"  # LIST's catch-all, the MAXVALUE analog


def _is_default(hv) -> bool:
    return isinstance(hv, str) and hv.upper() == DEFAULT_PARTITION


def select_list_as_range(
    partitions: list[SourcePartition],
    new_hwm=None,
    inclusive: bool = False,
    prior_hwm=None,
) -> list[SourcePartition]:
    """LIST_AS_RANGE: a LIST-partitioned source whose single-valued
    partitions mimic RANGE partitioning
    (reference OffloadSourceDataIpaListAsRange,
    offload_source_data.py:2988).

    Differences from plain RANGE, mirroring the reference:
    - partitions are sorted by high value (LIST catalogs are
      unordered, RANGE behavior needs an order);
    - a partition with MULTIPLE high values cannot be range-mapped —
      hard error ("Partitions have key values which are incompatible
      with LIST_AS_RANGE offloading");
    - the boundary compares the partition VALUE itself, so the
      user filter is strict `<` (a LIST high value is partition
      content, not an exclusive range bound); `inclusive=True` is
      the reference's --equal-to-values `<=` variant;
    - the DEFAULT catch-all partition is silently skipped for
      incremental offloads (reference
      _do_not_offload_open_ended_partition).
    """
    multi = [
        p.name
        for p in partitions
        if isinstance(p.high_value, (tuple, list)) and len(p.high_value) > 1
    ]
    if multi:
        raise PartitionSelectionError(
            f"partition high values incompatible with LIST_AS_RANGE: {multi}"
        )
    out = []
    for p in partitions:
        if _is_default(p.high_value) or _is_maxvalue(p.high_value):
            continue
        if prior_hwm is not None and not (p.high_value > prior_hwm):
            continue
        if new_hwm is not None:
            ok = p.high_value <= new_hwm if inclusive else p.high_value < new_hwm
            if not ok:
                continue
        out.append(p)
    return sorted(out, key=lambda p: p.high_value)


# Offload-type splits (reference LAPBO_TYPE_* constants,
# offload_source_data.py:87-89): how much data moves vs how much the
# hybrid-view boundary retains.
SPLIT_90_10 = "90/10"  # incremental: move up to HWM, retain the rest
SPLIT_100_10 = "100/10"  # move EVERYTHING, HWM still defines the view offset
SPLIT_100_0 = "100/0"  # move everything, no boundary at all


@dataclass(frozen=True)
class RangeSelection:
    partitions: list = field(default_factory=list)
    hwm: object | None = None  # boundary recorded in metadata


def select_range_split(
    partitions: list[SourcePartition],
    split: str,
    new_hwm=None,
    prior_hwm=None,
) -> RangeSelection:
    """RANGE selection under an offload-type split.

    - 90/10 — classic IPA: move partitions in (prior_hwm, new_hwm],
      boundary = max moved high value.
    - 100/10 — everything moves (MAXVALUE partition included), but the
      requested filter still defines the boundary: the reference
      "ignores filtering and offloads all partitions, however we still
      use filter to define view HWM" (offload_source_data.py:2392).
    - 100/0 — everything moves, no incremental boundary
      (OffloadSourceDataFull/FullPartitioned,
      offload_source_data.py:1736,1801).
    """
    if split == SPLIT_90_10:
        got = select_range(partitions, new_hwm=new_hwm, prior_hwm=prior_hwm)
        return RangeSelection(partitions=got, hwm=hwm_of(got))
    if split == SPLIT_100_10:
        got = select_full(partitions)
        hwm = new_hwm if new_hwm is not None else hwm_of(got)
        return RangeSelection(partitions=got, hwm=hwm)
    if split == SPLIT_100_0:
        return RangeSelection(partitions=select_full(partitions), hwm=None)
    raise PartitionSelectionError(f"unknown offload split: {split!r}")
