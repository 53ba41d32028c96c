"""Backend sort/cluster columns on write (--sort-columns).

The reference orders the final backend table on user-chosen columns
(BigQuery ``CLUSTER BY``, Hive/Impala ``SORT BY``):
src/goe/offload/operation/sort_columns.py:76-160 resolves the CSV
against metadata (the GOE_SORT_NOT_SET sentinel keeps the previous
offload's choice, NONE clears it), validates that every named column
exists and its type can be a sort key, and caps the count
(bigquery_backend_api.py:1992-1993: 4).

Spark-first rendering: ordering inside a parquet file IS the backend
clustering — ``sortWithinPartitions`` before the write gives
row-group locality, so min/max page statistics prune reads on the
sort key at query time. No extra shuffle: the sort is per-partition,
map-side, exactly the property CLUSTER BY buys in BigQuery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from goe_spark.types import canonical as C
from goe_spark.types.canonical import CanonicalColumn
from goe_spark.types.controls import expand_columns_csv

# Sentinels (offload_constants.py:98-99).
SORT_COLUMNS_NO_CHANGE = "GOE_SORT_NOT_SET"
SORT_COLUMNS_NONE = "NONE"
# BigQuery's cluster-column cap (bigquery_backend_api.py:1992-1993).
MAX_SORT_COLUMNS = 4

# Types that cannot be cluster/sort keys: approximate floats (no
# total order across NaN), binaries and intervals (BigQuery refuses
# them as clustering columns too).
_UNSORTABLE_TYPES = (
    C.FLOAT,
    C.DOUBLE,
    C.BINARY,
    C.LARGE_BINARY,
    C.INTERVAL_DS,
    C.INTERVAL_YM,
)


class SortColumnsError(ValueError):
    pass


def is_valid_sort_type(col: CanonicalColumn) -> bool:
    return col.data_type not in _UNSORTABLE_TYPES


def resolve_sort_columns(
    sort_columns_csv: str | None,
    prior_sort_columns: list[str] | None,
    canonical_cols: list[CanonicalColumn],
) -> list[str] | None:
    """CSV + prior metadata -> the effective sort-column list.

    - GOE_SORT_NOT_SET (default): keep whatever the previous offload
      used (None on first offload);
    - NONE: explicitly no sorting;
    - a CSV: expand wildcards against the table columns, require all
      names to exist, types to be sortable, and <= MAX_SORT_COLUMNS.
    """
    if sort_columns_csv is None or sort_columns_csv == SORT_COLUMNS_NO_CHANGE:
        return list(prior_sort_columns) if prior_sort_columns else None
    if sort_columns_csv == SORT_COLUMNS_NONE:
        return None
    names = [c.name for c in canonical_cols]
    by_name = {c.name: c for c in canonical_cols}
    requested = [t.strip() for t in sort_columns_csv.split(",") if t.strip()]
    resolved: list[str] = []
    for token in requested:
        matches = expand_columns_csv(token, names)
        if not matches:
            raise SortColumnsError(f"Sort column does not exist: {token}")
        resolved.extend(m for m in matches if m not in resolved)
    for name in resolved:
        if not is_valid_sort_type(by_name[name]):
            raise SortColumnsError(
                f"Sort column is not a sortable type: {name}/"
                f"{by_name[name].data_type}"
            )
    if len(resolved) > MAX_SORT_COLUMNS:
        raise SortColumnsError(
            f"Too many sort columns: {len(resolved)} > {MAX_SORT_COLUMNS}"
        )
    return resolved


def apply_sort_on_write(df: DataFrame, sort_columns: list[str] | None) -> DataFrame:
    """Per-partition (map-side, shuffle-free) sort before a write; a
    no-op when no sort columns are in force."""
    if not sort_columns:
        return df
    return df.sortWithinPartitions(*sort_columns)
