"""Declarative data-quality expectations over any DataFrame — the
dbt-tests / Great-Expectations surface a pipeline gates loads on,
expressed Spark-first.

Rule kinds:
- not_null(col)                   row-level
- accepted_values(col, values)    row-level
- expression(name, sql_bool)      row-level (any boolean SQL over the row)
- unique(col)                     grouped (duplicate keys)
- foreign_key(col, ref_df, ref)   anti-join (orphaned keys)

Evaluation cost is the point: ALL row-level rules evaluate in ONE
aggregate pass over the table (a conditional sum per rule inside the
same partial-aggregated scan — adding a rule adds a counter, not a
scan). `unique` adds one groupBy on its column; `foreign_key` one
anti-join against the (broadcast-able) reference keys. Output is one
row per rule: (rule, kind, column_name, n_violations, passed) — the gate a
load step checks before the swap.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str  # not_null | accepted_values | expression | unique | foreign_key
    column: str
    condition: object = None  # values list / sql text / (ref_df, ref_col)


def not_null(col: str) -> Rule:
    return Rule(f"not_null_{col}", "not_null", col)


def accepted_values(col: str, values: list) -> Rule:
    return Rule(f"accepted_values_{col}", "accepted_values", col, tuple(values))


def expression(name: str, sql_bool: str) -> Rule:
    """Violations = rows where the boolean SQL is NOT satisfied
    (NULL counts as a violation — an unknown check is a failed
    check, matching dbt's severity semantics)."""
    return Rule(name, "expression", "", sql_bool)


def unique(col: str) -> Rule:
    return Rule(f"unique_{col}", "unique", col)


def foreign_key(col: str, ref_df: DataFrame, ref_col: str) -> Rule:
    return Rule(f"fk_{col}", "foreign_key", col, (ref_df, ref_col))


def check_expectations(
    spark: SparkSession, df: DataFrame, rules: list[Rule]
) -> DataFrame:
    """One (rule, kind, column_name, n_violations, passed) row per rule."""
    row_level = [
        r for r in rules if r.kind in ("not_null", "accepted_values", "expression")
    ]
    reports: list[DataFrame] = []

    if row_level:
        aggs = []
        for r in row_level:
            if r.kind == "not_null":
                bad = F.col(r.column).isNull()
            elif r.kind == "accepted_values":
                bad = ~F.col(r.column).isin(list(r.condition)) | F.col(
                    r.column
                ).isNull()
            else:  # expression: NULL result counts as a violation
                bad = ~F.coalesce(F.expr(str(r.condition)), F.lit(False))
            aggs.append(F.sum(bad.cast("long")).alias(r.name))
        one = df.agg(*aggs)
        stacked = one.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r.name).alias("rule"),
                            F.lit(r.kind).alias("kind"),
                            F.lit(r.column).alias("column_name"),
                            F.col(r.name).alias("n_violations"),
                        )
                        for r in row_level
                    ]
                )
            ).alias("s")
        ).select("s.*")
        reports.append(stacked)

    for r in rules:
        if r.kind == "unique":
            dup = (
                df.where(F.col(r.column).isNotNull())
                .groupBy(r.column)
                .agg(F.count(F.lit(1)).alias("c"))
                .where(F.col("c") > 1)
                .agg(
                    F.coalesce(F.sum("c"), F.lit(0)).alias("n_violations")
                )
            )
            reports.append(
                dup.select(
                    F.lit(r.name).alias("rule"),
                    F.lit(r.kind).alias("kind"),
                    F.lit(r.column).alias("column_name"),
                    "n_violations",
                )
            )
        elif r.kind == "foreign_key":
            ref_df, ref_col = r.condition
            orphans = (
                df.where(F.col(r.column).isNotNull())
                .join(
                    F.broadcast(
                        ref_df.select(
                            F.col(ref_col).alias(r.column)
                        ).distinct()
                    ),
                    r.column,
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).alias("n_violations"))
            )
            reports.append(
                orphans.select(
                    F.lit(r.name).alias("rule"),
                    F.lit(r.kind).alias("kind"),
                    F.lit(r.column).alias("column_name"),
                    "n_violations",
                )
            )

    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.select(
        "rule",
        "kind",
        "column_name",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
