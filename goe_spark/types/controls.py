"""User column-control overrides — the ``--<type>-columns`` family.

The reference lets a user force the canonical type of named columns
instead of accepting the automatic mapping/sampling proposal:
``--integer-8-columns``, ``--decimal-columns`` (+ paired
``--decimal-columns-type``), ``--date-columns``, ``--double-columns``,
``--variable-string-columns``, ``--unicode-string-columns``. This
module re-expresses that control surface for the Spark engine.

Reference parity:
- option-name map: src/goe/offload/column_metadata.py:99-115
- CSV expansion with ``*`` wildcards, case-insensitive:
  src/goe/offload/offload_functions.py:128-160
- override construction + conflict detection:
  src/goe/offload/operation/data_type_controls.py:70-105
- base override generation incl. balanced --decimal-columns /
  --decimal-columns-type pairs: src/goe/goe.py:1353-1445,2155-2182
- validity matrix (which source classes may convert to which
  canonical targets): offload_source_table.py:1182-1261 +
  oracle_offload_source_table.py:1668-1711, re-derived for Spark
  source types
- precedence and safe-mapping merge:
  operation/data_type_controls.py:151-256 (overrides beat sampling,
  sampling beats the default mapping; safe_mapping merges one-way
  through is_safe_mapping)
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from fnmatch import fnmatchcase

from goe_spark.types import canonical as C
from goe_spark.types.canonical import (
    CanonicalColumn,
    is_safe_mapping,
)

CANONICAL_TYPE_OPTION_NAMES = {
    C.BINARY: "--binary-columns",
    C.DATE: "--date-columns",
    C.DECIMAL: "--decimal-columns",
    C.DOUBLE: "--double-columns",
    C.INTEGER_1: "--integer-1-columns",
    C.INTEGER_2: "--integer-2-columns",
    C.INTEGER_4: "--integer-4-columns",
    C.INTEGER_8: "--integer-8-columns",
    C.INTEGER_38: "--integer-38-columns",
    C.LARGE_STRING: "--large-string-columns",
    C.LARGE_BINARY: "--large-binary-columns",
    C.VARIABLE_STRING: "--variable-string-columns",
    C.INTERVAL_DS: "--interval-ds-columns",
    C.INTERVAL_YM: "--interval-ym-columns",
    C.TIMESTAMP_TZ: "--timestamp-tz-columns",
}

DECIMAL_SPEC_SYNTAX = (
    'must be of format "precision,scale" where 1<=precision<=38 and '
    "0<=scale<=38 and scale<=precision"
)


class ColumnControlsError(ValueError):
    pass


@dataclass
class ColumnControls:
    """The user's type-control options for one offload, CSV-valued
    exactly like the reference CLI (wildcards allowed)."""

    integer_1_columns_csv: str | None = None
    integer_2_columns_csv: str | None = None
    integer_4_columns_csv: str | None = None
    integer_8_columns_csv: str | None = None
    integer_38_columns_csv: str | None = None
    date_columns_csv: str | None = None
    double_columns_csv: str | None = None
    variable_string_columns_csv: str | None = None
    unicode_string_columns_csv: str | None = None
    # Parallel lists: each CSV of columns gets the matching "p,s" spec
    # (--decimal-columns is repeatable in the reference CLI).
    decimal_columns_csv_list: list[str] | None = None
    decimal_columns_type_list: list[str] | None = None
    # The reference's float-leniency switch (goe.py:176,
    # --allow-floating-point-conversions): without it FLOAT/DOUBLE
    # sources may only stay floating; with it they may be forced into
    # exact numerics — marked unsafe, since NaN/Inf and trailing
    # precision cannot survive the cast.
    allow_floating_point_conversions: bool = False

    def any_set(self) -> bool:
        return any(v for v in self.__dict__.values())


def expand_columns_csv(columns_csv: str | None, reference_names: list[str]) -> list[str]:
    """CSV -> column-name list; ``*`` wildcards expand against the
    reference names, all matching case-insensitive; results carry the
    reference-list casing."""
    if not columns_csv:
        return []
    out: list[str] = []
    for token in (t.strip() for t in columns_csv.split(",") if t.strip()):
        matched = [
            ref
            for ref in reference_names
            if fnmatchcase(ref.lower(), token.lower())
        ]
        for ref in matched:
            if ref not in out:
                out.append(ref)
    return out


def parse_decimal_spec(spec: str) -> tuple[int, int]:
    try:
        p_s = [int(x) for x in spec.split(",")]
        precision, scale = p_s
    except (ValueError, TypeError):
        raise ColumnControlsError(
            f"--decimal-columns-type {spec!r} {DECIMAL_SPEC_SYNTAX}"
        )
    if not (1 <= precision <= C.MAX_SUPPORTED_PRECISION) or not (
        0 <= scale <= C.MAX_SUPPORTED_SCALE
    ) or scale > precision:
        raise ColumnControlsError(
            f"--decimal-columns-type {spec!r} {DECIMAL_SPEC_SYNTAX}"
        )
    return precision, scale


def _overrides_for_csv(
    data_type: str,
    columns_csv: str,
    existing: list[CanonicalColumn],
    reference_cols: list[CanonicalColumn],
    precision: int | None = None,
    scale: int | None = None,
) -> list[CanonicalColumn]:
    names = expand_columns_csv(columns_csv, [c.name for c in reference_cols])
    conflicting = [c.name for c in existing if c.name in names]
    if conflicting:
        raise ColumnControlsError(
            f"Data type conflict for columns {conflicting} when assigning "
            f"type with {CANONICAL_TYPE_OPTION_NAMES[data_type]}"
        )
    if "*" in columns_csv and not names:
        raise ColumnControlsError(f"No columns match pattern: {columns_csv}")
    return [
        CanonicalColumn(
            name=n,
            data_type=data_type,
            data_precision=precision,
            data_scale=scale,
            from_override=True,
        )
        for n in names
    ]


def build_overrides(
    controls: ColumnControls, reference_cols: list[CanonicalColumn]
) -> list[CanonicalColumn]:
    """The user's CANONICAL override columns. Conflicts (one column
    claimed by two options) raise; the construction order matches the
    reference so the conflict messages name the same option."""
    out: list[CanonicalColumn] = []
    for data_type, csv in (
        (C.INTEGER_1, controls.integer_1_columns_csv),
        (C.INTEGER_2, controls.integer_2_columns_csv),
        (C.INTEGER_4, controls.integer_4_columns_csv),
        (C.INTEGER_8, controls.integer_8_columns_csv),
        (C.INTEGER_38, controls.integer_38_columns_csv),
        (C.DATE, controls.date_columns_csv),
    ):
        if csv:
            out.extend(_overrides_for_csv(data_type, csv, out, reference_cols))
    csv_list = controls.decimal_columns_csv_list or []
    type_list = controls.decimal_columns_type_list or []
    if csv_list:
        if len(csv_list) != len(type_list):
            raise ColumnControlsError(
                "Unbalanced --decimal-columns, --decimal-columns-type pairs "
                f"(--decimal-columns * {len(csv_list)}, "
                f"--decimal-columns-type * {len(type_list)})"
            )
        for col_csv, spec in zip(csv_list, type_list):
            precision, scale = parse_decimal_spec(spec)
            out.extend(
                _overrides_for_csv(
                    C.DECIMAL, col_csv, out, reference_cols, precision, scale
                )
            )
    for data_type, csv in (
        (C.DOUBLE, controls.double_columns_csv),
        (C.VARIABLE_STRING, controls.variable_string_columns_csv),
    ):
        if csv:
            out.extend(_overrides_for_csv(data_type, csv, out, reference_cols))
    return out


def char_semantics_overrides(
    controls: ColumnControls, reference_cols: list[CanonicalColumn]
) -> dict[str, str]:
    """--unicode-string-columns -> {name: UNICODE}; only string-based
    columns may carry char semantics."""
    names = expand_columns_csv(
        controls.unicode_string_columns_csv, [c.name for c in reference_cols]
    )
    if (
        controls.unicode_string_columns_csv
        and "*" in controls.unicode_string_columns_csv
        and not names
    ):
        raise ColumnControlsError(
            f"No columns match pattern: {controls.unicode_string_columns_csv}"
        )
    by_name = {c.name: c for c in reference_cols}
    for n in names:
        if not by_name[n].is_string():
            raise ColumnControlsError(
                f"Invalid data type conversion for column {n}: "
                f"{by_name[n].data_type} is not string based"
            )
    return {n: C.CHAR_SEMANTICS_UNICODE for n in names}


# Which canonical targets a source column class may be forced into.
# Spark re-derivation of the reference's per-frontend matrices
# (oracle_offload_source_table.py:1668-1711): numbers convert within
# the numeric class (FLOAT/DOUBLE only widen), dates within the date
# class or to strings, strings/binaries/intervals keep their class.
def valid_override(
    source: CanonicalColumn,
    target_type: str,
    allow_floating_point_conversions: bool = False,
) -> bool:
    if source.data_type == C.DOUBLE:
        return target_type == C.DOUBLE or (
            allow_floating_point_conversions and target_type in C.NUMERIC_TYPES
        )
    if source.data_type == C.FLOAT:
        return target_type in (C.FLOAT, C.DOUBLE) or (
            allow_floating_point_conversions and target_type in C.NUMERIC_TYPES
        )
    if source.is_numeric():
        return target_type in C.NUMERIC_TYPES
    if source.data_type == C.TIMESTAMP_TZ:
        return target_type == C.TIMESTAMP_TZ
    if source.is_date_based():
        return target_type in C.DATE_TYPES or target_type in C.STRING_TYPES
    if source.is_string():
        return target_type in C.STRING_TYPES
    if source.data_type in (C.BINARY, C.LARGE_BINARY):
        return target_type in (C.BINARY, C.LARGE_BINARY)
    if source.data_type in (C.INTERVAL_DS, C.INTERVAL_YM):
        return target_type == source.data_type
    return False


def source_to_canonical_mappings(
    source_cols: list[CanonicalColumn],
    controls: ColumnControls | None = None,
    sampled: dict[str, CanonicalColumn] | None = None,
) -> list[CanonicalColumn]:
    """Final canonical mapping with the reference's precedence:

    default mapping < sampling proposal < user override.

    A user-overridden column is never replaced by sampling (the
    reference skips sampling such columns entirely), and the
    safe-mapping state merges ONE-WAY through is_safe_mapping — once
    any stage declares a column's mapping unsafe, a later "safe"
    proposal cannot launder it back to safe.
    """
    overrides = (
        {o.name: o for o in build_overrides(controls, source_cols)}
        if controls
        else {}
    )
    semantics = (
        char_semantics_overrides(controls, source_cols) if controls else {}
    )
    sampled = sampled or {}
    out: list[CanonicalColumn] = []
    for src in source_cols:
        col = src
        if src.name in sampled and src.name not in overrides:
            prop = sampled[src.name]
            col = replace(
                prop,
                name=src.name,
                nullable=src.nullable,
                safe_mapping=is_safe_mapping(
                    src.safe_mapping, prop.safe_mapping
                ),
            )
        if src.name in overrides:
            ov = overrides[src.name]
            allow_fp = bool(
                controls and controls.allow_floating_point_conversions
            )
            if not valid_override(src, ov.data_type, allow_fp):
                raise ColumnControlsError(
                    f"Invalid data type conversion for column {src.name}: "
                    f"{src.data_type} -> {ov.data_type}"
                )
            lossy_fp = (
                src.data_type in (C.FLOAT, C.DOUBLE)
                and ov.data_type not in (C.FLOAT, C.DOUBLE)
            )
            col = replace(
                ov,
                nullable=src.nullable,
                safe_mapping=is_safe_mapping(
                    src.safe_mapping, False if lossy_fp else ov.safe_mapping
                ),
            )
        if src.name in semantics:
            col = replace(col, char_semantics=semantics[src.name])
        out.append(col)
    return out
