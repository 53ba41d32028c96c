"""Per-backend identifier rules: case folding, quoting, length caps.

Every system the engine fronts or targets has its own identifier
physics; getting them wrong surfaces as either a failed CREATE or —
worse — two tables that differ only by case. Reference parity:

- case conversion driven by one option:
  src/goe/offload/offload_functions.py:104-126
  (convert_backend_identifier_case: LOWER / UPPER / no-change);
- quoting per system: backtick (BigQuery
  bigquery_backend_api.py:1246-1249, Hadoop — which also force-lowers,
  hadoop_backend_api.py:825-829), double-quote (Oracle
  oracle_frontend_api.py:831, Teradata, Snowflake
  snowflake_backend_api.py:928-931), brackets (Synapse
  synapse_backend_api.py:1271-1274, MSSQL);
- length caps per system: BigQuery 1024/300
  (bigquery_backend_api.py:1967-1996), Snowflake 255
  (snowflake_backend_api.py:1761), Synapse/MSSQL/Teradata/Hadoop 128
  (synapse_backend_api.py:2113, mssql_frontend_api.py:56,
  teradata_frontend_api.py:854);
- scenario: tests/integration/scenarios/test_identifiers.py
  (case-converted and max-length names must round-trip an offload).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# Unquoted-identifier charset shared by every supported system.
_VALID_IDENTIFIER = re.compile(r"^[A-Za-z_][A-Za-z0-9_$]*$")


class IdentifierError(ValueError):
    pass


@dataclass(frozen=True)
class IdentifierRules:
    name: str
    quote_prefix: str
    quote_suffix: str
    # Case applied to unquoted identifiers: lower | upper | preserve.
    case: str
    max_table_name_length: int
    max_column_name_length: int


IDENTIFIER_RULES = {
    # The engine itself: Spark over a Hive metastore lower-cases
    # object names; backticks quote.
    "spark": IdentifierRules("spark", "`", "`", "lower", 128, 128),
    "hadoop": IdentifierRules("hadoop", "`", "`", "lower", 128, 128),
    "bigquery": IdentifierRules("bigquery", "`", "`", "preserve", 1024, 300),
    "snowflake": IdentifierRules("snowflake", '"', '"', "upper", 255, 255),
    "synapse": IdentifierRules("synapse", "[", "]", "preserve", 128, 128),
    "mssql": IdentifierRules("mssql", "[", "]", "preserve", 128, 128),
    "oracle": IdentifierRules("oracle", '"', '"', "upper", 128, 128),
    "teradata": IdentifierRules("teradata", '"', '"', "preserve", 128, 128),
}


def rules_for(backend: str) -> IdentifierRules:
    try:
        return IDENTIFIER_RULES[backend.lower()]
    except KeyError:
        raise IdentifierError(f"unknown backend: {backend}")


def convert_identifier_case(
    name: str, rules: IdentifierRules, case_override: str | None = None
) -> str:
    """Backend case folding; ``case_override`` mirrors the reference's
    BACKEND_IDENTIFIER_CASE option (LOWER/UPPER/NO_MODIFY beats the
    backend default)."""
    case = (case_override or rules.case).lower()
    if case == "lower":
        return name.lower()
    if case == "upper":
        return name.upper()
    return name


def enclose_identifier(name: str, rules: IdentifierRules) -> str:
    return f"{rules.quote_prefix}{name}{rules.quote_suffix}"


def validate_identifier(
    name: str, rules: IdentifierRules, kind: str = "table"
) -> None:
    """Charset + per-kind length check; raises IdentifierError."""
    cap = (
        rules.max_table_name_length
        if kind == "table"
        else rules.max_column_name_length
    )
    if not name:
        raise IdentifierError(f"empty {kind} name")
    if len(name) > cap:
        raise IdentifierError(
            f"{kind} name exceeds {rules.name} maximum "
            f"({len(name)} > {cap}): {name[:40]}..."
        )
    if not _VALID_IDENTIFIER.match(name):
        raise IdentifierError(
            f"invalid {kind} name for {rules.name}: {name!r}"
        )


def backend_safe_identifier(
    name: str,
    backend: str = "spark",
    kind: str = "table",
    case_override: str | None = None,
) -> str:
    """Case-fold then validate — the one call sites use."""
    rules = rules_for(backend)
    out = convert_identifier_case(name, rules, case_override)
    validate_identifier(out, rules, kind)
    return out
