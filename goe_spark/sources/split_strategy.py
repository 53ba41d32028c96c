"""Scan-parallelization planner: how to split one big table scan.

The reference decides per-table how to parallelize the frontend read
(``get_transport_split_type``,
src/goe/offload/oracle/oracle_offload_transport_rdbms_api.py:537-634):
by (sub)partition, by ROWID extent, by MOD over a hash, or by an id
range — then renders one row-source branch per batch. Spark's JDBC
source natively supports exactly two shapes:

- ``predicates=[...]`` — one WHERE fragment per Spark partition
  (covers PARTITION and MOD splits), and
- ``partitionColumn/lowerBound/upperBound/numPartitions`` — numeric
  range striping (covers ID_RANGE and NATIVE_RANGE).

So the planner here emits those shapes directly; the Oracle-physical
EXTENT split (rowid ranges via a pipelined PL/SQL function) is
deliberately dropped — hash-mod gives the same balanced-batch property
without engine-private addressing (SURVEY.md §2.1 S3).

Everything in this module is pure logic (no SparkSession): it is the
part of the engine that must be unit-testable the way the reference
unit-tests its transport SQL text (tests/unit/offload/
test_offload_transport*.py).

Scale notes: a split plan bounds per-task row volume, so transport
parallelism scales linearly with executors until the source DB's
concurrent-cursor limit; fetchsize (reference default 5000,
src/goe/config/orchestration_defaults.py:760-762) bounds round-trips.
"""

from __future__ import annotations

from dataclasses import dataclass

# Reference defaults (src/goe/config/orchestration_defaults.py).
DEFAULT_FETCH_SIZE = 5000
DEFAULT_PARALLELISM = 2

SPLIT_BY_PARTITION = "PARTITION"
SPLIT_BY_SUBPARTITION = "SUBPARTITION"
SPLIT_BY_MOD = "MOD"
SPLIT_BY_ID_RANGE = "ID_RANGE"
SPLIT_BY_NATIVE_RANGE = "NATIVE_RANGE"

# Beyond this many UNION ALL branches the source DB's parser/optimizer
# chokes (oracle_offload_transport_rdbms_api.py:75).
MAX_UNION_ALL_SPLITS = 1024

# Per-dialect NON-NEGATIVE slice expression for the MOD split,
# mirroring the reference's ``MOD(ORA_HASH(col), degree)``
# (oracle_offload_transport_rdbms_api.py:754-775): hashing (a) maps
# any key type, (b) de-skews clustered/sign-symmetric keys, and (c) is
# already non-negative on every dialect that has it. Dialects WITHOUT
# a SQL hash function (Derby) get the sign-free double-mod
# ``MOD(MOD(col, n) + n, n)`` — total over negatives WITHOUT ``ABS``,
# whose 64-bit-minimum argument raises 22003 on strict engines and
# folds +k/-k onto one slice (round-9 ADVICE).
_MOD_HASH_TEMPLATES = {
    "oracle": "MOD(ORA_HASH({col}), {n})",
    # hashtext() is int4 and may be negative; double-mod normalizes.
    "postgresql": (
        "MOD(MOD(hashtext(CAST({col} AS text)), {n}) + {n}, {n})"
    ),
    # CHECKSUM() is int4 and may be negative; T-SQL spells mod as %.
    "mssql": "((CHECKSUM({col}) % {n}) + {n}) % {n}",
    # HASHBUCKET(HASHROW(..)) is a non-negative bucket number.
    "teradata": "MOD(HASHBUCKET(HASHROW({col})), {n})",
    "derby": "MOD(MOD({col}, {n}) + {n}, {n})",
}
_MOD_FALLBACK_TEMPLATE = "MOD(MOD({col}, {n}) + {n}, {n})"


def mod_hash_template(dialect: str) -> str:
    """The dialect's non-negative ``{col}``/``{n}`` slice template for
    :func:`mod_split_predicates`. Unknown dialects get the sign-free
    double-mod (numeric keys only — safe, never raises, never drops)."""
    return _MOD_HASH_TEMPLATES.get(
        dialect.lower(), _MOD_FALLBACK_TEMPLATE
    )


@dataclass(frozen=True)
class SplitPlan:
    """A fully decided parallel-scan plan for one table."""

    split_type: str
    # predicates-shaped plans (PARTITION / MOD)
    predicates: tuple[str, ...] = ()
    # range-shaped plans (ID_RANGE / NATIVE_RANGE)
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int | None = None
    fetch_size: int = DEFAULT_FETCH_SIZE
    session_init_statement: str | None = None
    snapshot_clause: str | None = None  # e.g. "AS OF SCN 123" pass-through
    notes: tuple[str, ...] = ()


def partition_split_predicates(
    partition_names: list[str],
    parallelism: int,
    quote: str = '"',
) -> list[str]:
    """One predicate per batch, each covering partition i % parallelism.

    The reference emits one UNION ALL branch per partition with a
    ``batch = i % parallelism`` routing column
    (oracle_offload_transport_rdbms_api.py:685-719); with Spark the
    same routing is the ``predicates`` array — each array element
    becomes one Spark partition, so we group partitions round-robin
    into ``parallelism`` disjoint IN-lists.
    """
    if parallelism < 1:
        raise ValueError("parallelism must be >= 1")
    batches: list[list[str]] = [[] for _ in range(min(parallelism, len(partition_names)))]
    for i, p in enumerate(partition_names):
        batches[i % len(batches)].append(p)
    col = f"{quote}GOE_PARTITION_NAME{quote}"
    return [
        col + " IN (" + ", ".join(f"'{p}'" for p in batch) + ")"
        for batch in batches
        if batch
    ]


def subpartition_split_predicates(
    subpartition_names: list[str],
    parallelism: int,
    quote: str = '"',
) -> list[str]:
    """One predicate per batch over SUBPARTITION names — the second
    half of S2. The reference renders ``SUBPARTITION ("name")`` row
    sources (oracle_offload_transport_rdbms_api.py:685-719); the Spark
    binding is the same round-robin IN-list grouping as PARTITION,
    keyed on the subpartition name pseudo-column."""
    if parallelism < 1:
        raise ValueError("parallelism must be >= 1")
    batches: list[list[str]] = [
        [] for _ in range(min(parallelism, len(subpartition_names)))
    ]
    for i, p in enumerate(subpartition_names):
        batches[i % len(batches)].append(p)
    col = f"{quote}GOE_SUBPARTITION_NAME{quote}"
    return [
        col + " IN (" + ", ".join(f"'{p}'" for p in batch) + ")"
        for batch in batches
        if batch
    ]


def mod_split_predicates(
    column: str,
    parallelism: int,
    hash_template: str = "MOD(ABS(HASH({col})), {n})",
    null_safe: bool = False,
) -> list[str]:
    """Hash-mod batch predicates: one per batch k.

    Mirrors the MOD split (oracle_offload_transport_rdbms_api.py:
    754-775) where the batch column is ``MOD(ORA_HASH(col), degree)``.
    The hash expression is dialect-templated because it runs inside the
    source database, not in Spark.

    ``null_safe=True`` folds ``col IS NULL`` into batch 0: any SQL
    expression over a NULL key is NULL, which matches NONE of the
    ``= k`` slices, so without the extra arm every NULL-keyed row is
    silently dropped from a parallel transport. Callers splitting on
    a column not proven NOT NULL must pass it (plans/offload.py does).
    """
    if parallelism < 1:
        raise ValueError("parallelism must be >= 1")
    expr = hash_template.format(col=column, n=parallelism)
    preds = [f"{expr} = {k}" for k in range(parallelism)]
    if null_safe:
        preds[0] = f"({preds[0]} OR {column} IS NULL)"
    return preds


def id_range_split(
    column: str,
    min_value: int,
    max_value: int,
    parallelism: int,
) -> SplitPlan:
    """Numeric range striping with known bounds.

    Matches the reference's ID_RANGE (min/max queried up front,
    oracle_offload_transport_rdbms_api.py:776-811). Spark's JDBC
    range partitioning makes the upper bound exclusive-ish (rows >=
    upperBound all land in the last stripe), so like the reference's
    ``upperBound+1`` adjustment (offload_transport.py:1527-1535) we
    pad the top to keep stripes balanced.
    """
    return SplitPlan(
        split_type=SPLIT_BY_ID_RANGE,
        partition_column=column,
        lower_bound=int(min_value),
        upper_bound=int(max_value) + 1,
        num_partitions=max(1, parallelism),
    )


def native_range_split(column: str, parallelism: int) -> SplitPlan:
    """Range striping where bounds are discovered by the engine.

    NATIVE_RANGE in the reference defers min/max discovery to Spark
    (offload_transport.py:1578-1604); bounds are filled in by the
    caller after a cheap ``SELECT MIN(col), MAX(col)`` — represented
    here as a plan with unresolved bounds.
    """
    return SplitPlan(
        split_type=SPLIT_BY_NATIVE_RANGE,
        partition_column=column,
        num_partitions=max(1, parallelism),
        notes=("bounds unresolved: run SELECT MIN/MAX before binding",),
    )


@dataclass(frozen=True)
class TableScanMeta:
    """What the planner needs to know about the source table."""

    partition_names: tuple[str, ...] = ()
    # Subpartition names, flattened across partitions. For a
    # subpartition-RANGE offload the chunker stores one record per
    # subpartition in partition_names instead (the reference does the
    # same: oracle_offload_transport_rdbms_api.py:696-702), flagged by
    # offload_by_subpartition.
    subpartition_names: tuple[str, ...] = ()
    offload_by_subpartition: bool = False
    numeric_id_column: str | None = None
    id_bounds: tuple[int, int] | None = None  # (min, max) if known
    id_nullable: bool = True
    any_column: str | None = None  # fallback column for MOD hashing


def choose_split_strategy(
    meta: TableScanMeta,
    parallelism: int = DEFAULT_PARALLELISM,
    fetch_size: int = DEFAULT_FETCH_SIZE,
    snapshot_clause: str | None = None,
) -> SplitPlan:
    """Decide the split type for a table, reference-priority order.

    Priority (get_transport_split_type, oracle_offload_transport_
    rdbms_api.py:537-634, minus the Oracle-physical EXTENT option):

    1. enough partitions (>= parallelism, <= MAX_UNION_ALL_SPLITS) →
       PARTITION split — or SUBPARTITION when the offload itself is
       subpartition-scoped (offload_by_subpartition, whose chunk
       records ARE subpartitions);
    2. too few partitions but enough subpartitions → SUBPARTITION
       split (the reference's "fewer partitions than requested
       parallelism" branch, :583-593);
    3. non-null numeric id with known bounds → ID_RANGE;
    4. non-null numeric id, bounds unknown → NATIVE_RANGE (Spark
       discovers bounds);
    5. otherwise → MOD over a hash of any stable column (null-safe:
       hash(NULL) lands in one batch rather than being dropped, which
       is why MOD is the fallback when the id column is nullable —
       range striping silently drops NULL ids); a partitioned table
       with no splittable column falls back to one-batch-per-
       partition rather than failing (the reference would use the
       EXTENT split we dropped by design).
    """
    base = dict(fetch_size=fetch_size, snapshot_clause=snapshot_clause)
    n_parts = len(meta.partition_names)
    n_subparts = len(meta.subpartition_names)
    if n_parts and parallelism <= n_parts <= MAX_UNION_ALL_SPLITS:
        if meta.offload_by_subpartition:
            # Subpartition-scoped offload: the chunk's "partitions"
            # are subpartition names already.
            return SplitPlan(
                split_type=SPLIT_BY_SUBPARTITION,
                predicates=tuple(
                    subpartition_split_predicates(
                        list(meta.partition_names), parallelism
                    )
                ),
                **base,
            )
        return SplitPlan(
            split_type=SPLIT_BY_PARTITION,
            predicates=tuple(
                partition_split_predicates(list(meta.partition_names), parallelism)
            ),
            **base,
        )
    if n_parts and parallelism <= n_subparts <= MAX_UNION_ALL_SPLITS:
        return SplitPlan(
            split_type=SPLIT_BY_SUBPARTITION,
            predicates=tuple(
                subpartition_split_predicates(
                    list(meta.subpartition_names), parallelism
                )
            ),
            **base,
        )
    if n_parts and not meta.numeric_id_column and not meta.any_column:
        return SplitPlan(
            split_type=SPLIT_BY_PARTITION,
            predicates=tuple(
                partition_split_predicates(list(meta.partition_names), parallelism)
            ),
            **base,
        )
    if meta.numeric_id_column and not meta.id_nullable:
        if meta.id_bounds is not None:
            lo, hi = meta.id_bounds
            plan = id_range_split(meta.numeric_id_column, lo, hi, parallelism)
        else:
            plan = native_range_split(meta.numeric_id_column, parallelism)
        return SplitPlan(
            split_type=plan.split_type,
            partition_column=plan.partition_column,
            lower_bound=plan.lower_bound,
            upper_bound=plan.upper_bound,
            num_partitions=plan.num_partitions,
            notes=plan.notes,
            **base,
        )
    col = meta.numeric_id_column or meta.any_column
    if not col:
        raise ValueError("no splittable column available")
    # This fallback is reached exactly when the split column is NOT
    # proven NOT NULL (the non-nullable id took the range branch above),
    # so the NULL arm is mandatory: HASH(NULL) is NULL on most dialects
    # and a NULL-keyed row would match none of the `= k` slices —
    # silent row loss on the parallel transport (round-9 ADVICE).
    return SplitPlan(
        split_type=SPLIT_BY_MOD,
        predicates=tuple(
            mod_split_predicates(col, parallelism, null_safe=True)
        ),
        **base,
    )
