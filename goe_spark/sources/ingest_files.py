"""Raw text-file ingestion (JSONL / CSV) with corrupt-record quarantine.

The reference transports from managed RDBMS sources, so every record
is well-formed by construction; a training-data pipeline's raw inputs
(crawl dumps, vendor drops, log exports) are not. This module is the
landing step in front of the staging surface (sources/files.py): read
semi-structured text files against a REQUIRED explicit schema, route
malformed records to a quarantine sink instead of dropping them
silently, and report the accounting a load gate can act on.

Design (Spark-first):
- PERMISSIVE mode + ``columnNameOfCorruptRecord``: the parser itself
  classifies records; no Python sees a row. Malformed rows carry the
  raw line in the corrupt column and null data columns.
- One pass, two sinks: the parsed frame is split by corrupt-column
  nullness; good rows stage as parquet, bad raw lines quarantine as
  text with their source file (``input_file_name``) for replay. The
  split runs off one cached scan, so the input is read once.
- The corrupt column must be SELECTED to be populated (Spark prunes
  it otherwise) and must also appear in the explicit schema for JSON
  sources — both handled here so callers can't hold it wrong.
- Scale: schema inference is OFF (it is a full extra pass at 100 TB
  and non-deterministic under drift); the explicit schema is the
  contract. Reads parallelize per file/split exactly like any text
  source; the quarantine write adds no shuffle.

A load gate consumes IngestReport: ``max_bad_fraction`` is the policy
knob (None = land everything, report only).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"


class IngestValidationError(ValueError):
    """Raised when the bad-record fraction exceeds the gate."""


@dataclass(frozen=True)
class IngestReport:
    n_good: int
    n_bad: int
    good_path: str
    quarantine_path: str | None  # None when nothing was quarantined

    @property
    def bad_fraction(self) -> float:
        total = self.n_good + self.n_bad
        return (self.n_bad / total) if total else 0.0


def _with_corrupt_col(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not pre-declare {CORRUPT_COL!r}")
    # StructType.add mutates in place — never touch the caller's schema.
    from pyspark.sql.types import StructField

    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )


def _ddl(schema: StructType) -> str:
    return ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
    )


def _remove_dir(spark: SparkSession, path: str) -> None:
    """Best-effort recursive delete through the Hadoop FileSystem API
    so the same call clears file:// and hdfs/gs/s3a/abfss quarantine
    locations alike."""
    from goe_spark.sources.dfs import HadoopDfs

    try:
        HadoopDfs(spark).delete(path, recursive=True)
    except Exception:
        # Missing path (the common case) or a permission problem:
        # never fail a CLEAN ingest over quarantine housekeeping.
        pass


def read_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "json",
    **options: str,
) -> DataFrame:
    """Parse JSONL/CSV at ``path`` against an explicit schema in
    PERMISSIVE mode. Returns one row per non-blank input line with the
    schema's columns, CORRUPT_COL (null ⇔ the record parsed clean) and
    ``_source_file`` provenance. ``options`` pass through to the
    parser (e.g. sep='|' for CSV; CSV is headerless — the explicit
    schema IS the contract).

    Implementation reads lines with the text source and parses via
    from_json/from_csv expressions rather than the raw JSON/CSV
    readers: the raw readers disallow plans that reference only the
    corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), which is
    exactly what a quarantine split does. The expression form has no
    such restriction, scans with the same per-file parallelism, and
    keeps parsing inside codegen."""
    return parse_lines(spark.read.text(path), schema, fmt=fmt, **options)


def parse_lines(
    raw: DataFrame, schema: StructType, fmt: str = "json", **options: str
) -> DataFrame:
    """The shared parse step over a text frame (column ``value``) —
    used by the batch reader above AND the streaming landing
    (streaming/landing.py), so the quarantine classification exists
    once. Blank lines are dropped (the native readers skip them too);
    output is schema columns + CORRUPT_COL + ``_source_file``."""
    if fmt not in ("json", "csv"):
        raise ValueError(f"quarantine ingest supports json/csv, not {fmt!r}")
    full = _with_corrupt_col(schema)
    opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
        **options,
    }
    kept = raw.where(F.length(F.trim("value")) > 0).select(
        "value", F.input_file_name().alias("_source_file")
    )
    if fmt == "json":
        parsed = F.from_json("value", full, opts)
    else:
        parsed = F.from_csv("value", _ddl(full), opts)
    return kept.select(parsed.alias("r"), "_source_file").select(
        "r.*", "_source_file"
    )


def ingest_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    good_path: str,
    quarantine_path: str,
    fmt: str = "json",
    max_bad_fraction: float | None = None,
    **options: str,
) -> IngestReport:
    """One-pass landing: good rows -> parquet at ``good_path``, raw
    malformed lines (+ their source file) -> json at
    ``quarantine_path`` for inspection/replay. Raises
    IngestValidationError (writing NEITHER sink beyond the temp scan)
    when the bad fraction exceeds ``max_bad_fraction``."""
    parsed = read_with_quarantine(spark, path, schema, fmt=fmt, **options)
    parsed.persist()
    try:
        bad = parsed.where(F.col(CORRUPT_COL).isNotNull()).select(
            F.col(CORRUPT_COL).alias("raw_record"), "_source_file"
        )
        good = parsed.where(F.col(CORRUPT_COL).isNull()).drop(
            CORRUPT_COL, "_source_file"
        )
        n_bad = bad.count()
        n_good = good.count()
        frac = n_bad / (n_good + n_bad) if (n_good + n_bad) else 0.0
        if max_bad_fraction is not None and frac > max_bad_fraction:
            raise IngestValidationError(
                f"bad-record fraction {frac:.4f} exceeds gate "
                f"{max_bad_fraction:.4f} ({n_bad}/{n_good + n_bad})"
            )
        good.write.mode("overwrite").parquet(good_path)
        q_path = None
        if n_bad:
            bad.write.mode("overwrite").json(quarantine_path)
            q_path = quarantine_path
        else:
            # A clean rerun must not leave a PREVIOUS run's quarantine
            # on disk: an operator inspecting the path (rather than
            # the report) would read stale bad rows as current.
            _remove_dir(spark, quarantine_path)
        return IngestReport(
            n_good=n_good,
            n_bad=n_bad,
            good_path=good_path,
            quarantine_path=q_path,
        )
    finally:
        parsed.unpersist()


def replay_quarantine(
    spark: SparkSession,
    quarantine_path: str,
    schema: StructType,
    fmt: str = "json",
    **options: str,
) -> DataFrame:
    """Re-parse quarantined raw records (after an upstream fix or a
    schema amendment) — the recovery half of the quarantine contract.
    Returns the full PERMISSIVE frame so the caller decides whether
    the replay cleared the backlog (CORRUPT_COL null everywhere)."""
    if fmt != "json":
        raise ValueError("replay supports json quarantines only")
    raw = spark.read.json(quarantine_path).select("raw_record")
    return raw.select(
        F.from_json(
            "raw_record",
            _with_corrupt_col(schema),
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("r")
    ).select("r.*")


def quarantine_summary(spark: SparkSession, quarantine_path: str) -> DataFrame:
    """Per-source-file quarantine accounting (which input files are
    producing the garbage)."""
    if not os.path.exists(quarantine_path):
        return spark.createDataFrame(
            [], "source_file string, n_bad long"
        )
    return (
        spark.read.json(quarantine_path)
        .groupBy(F.col("_source_file").alias("source_file"))
        .agg(F.count(F.lit(1)).alias("n_bad"))
    )
