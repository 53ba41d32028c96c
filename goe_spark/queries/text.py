"""Text-analysis queries over the documents table.

Beyond-reference scope (BASELINE.json north star): token counting,
quality scoring, language-ID heuristic, document fingerprinting.
All are single-scan, codegen-only plans — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.catalog import load_table
from goe_spark.functions import text as T
from goe_spark.functions.hashing import hash64, hash64_sql
from goe_spark.queries import QuerySpec


def token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting rolled up by language: a full-scan projection +
    tiny grouped aggregate (5 language rows)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", T.token_count("text").alias("n_tokens"), "n_chars")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


TOKEN_STATS_SQL = f"""
SELECT lang,
       count(*)                               AS n_docs,
       cast(sum(n_tokens) AS bigint)          AS total_tokens,
       min(n_tokens)                          AS min_tokens,
       max(n_tokens)                          AS max_tokens,
       round(avg(n_tokens), 4)                AS avg_tokens,
       cast(sum(n_chars) AS bigint)           AS total_chars
FROM (SELECT lang, {T.token_count_sql('text')} AS n_tokens, n_chars FROM documents)
GROUP BY lang
"""


def quality_scores_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (length/token-shape/punct composite) per source."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("source", T.quality_score("text").alias("q"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("q"), 6).alias("avg_quality"),
            F.min("q").alias("min_quality"),
            F.max("q").alias("max_quality"),
        )
    )


QUALITY_SQL = f"""
SELECT source,
       count(*)            AS n_docs,
       round(avg(q), 6)    AS avg_quality,
       min(q)              AS min_quality,
       max(q)              AS max_quality
FROM (SELECT source, {T.quality_score_sql('text')} AS q FROM documents)
GROUP BY source
"""


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic vs the labeled lang column: a confusion
    matrix. Predicted = argmax stopword-marker overlap with a
    deterministic tie-break (score desc, lang asc); 'und' if all
    scores are zero. The marker lists are tiny so this is a pure
    map-side expression."""
    d = load_table(spark, sf_dir, "documents")
    scores = T.lang_scores("text")
    # argmax via greatest + chained when (deterministic tie-break by
    # lang name order because we check in sorted order).
    best = F.greatest(*[scores[lang] for lang in sorted(scores)])
    pred = F.lit("und")
    for lang in sorted(scores, reverse=True):
        pred = F.when(
            (best > 0) & (scores[lang] == best), F.lit(lang)
        ).otherwise(pred)
    return (
        d.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _lang_id_sql() -> str:
    scores = T.lang_scores_sql("text")
    langs = sorted(scores)
    best = "greatest(" + ", ".join(scores[lang] for lang in langs) + ")"
    case = "CASE"
    for lang in langs:
        case += f" WHEN {best} > 0 AND {scores[lang]} = {best} THEN '{lang}'"
    case += " ELSE 'und' END"
    return f"""
SELECT lang, pred_lang, count(*) AS n_docs
FROM (SELECT lang, {case} AS pred_lang FROM documents)
GROUP BY lang, pred_lang
"""


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: 60-bit content hash over normalized
    text (lowercase, collapsed whitespace). The fingerprint column is
    what exact-dedup joins on at 100 TB — distinct-count and min/max
    per lang witness identical hashing in both engines."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return (
        d.select("lang", hash64(norm).alias("fp"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_distinct_fp"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
    )


_NORM_SQL = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"

FINGERPRINT_SQL = f"""
SELECT lang,
       count(*)             AS n_docs,
       count(DISTINCT fp)   AS n_distinct_fp,
       min(fp)              AS min_fp,
       max(fp)              AS max_fp
FROM (SELECT lang,
             {hash64_sql(_NORM_SQL)} AS fp
      FROM documents)
GROUP BY lang
"""


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured projection: JSON field extraction from the
    events props column + hourly time bucketing — the shape of a
    log-enrichment pipeline stage."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.col("event_type"),
            F.get_json_object("props", "$.k").cast("long").alias("k"),
            F.date_trunc("hour", "ts").cast("date").alias("day"),
            F.col("value"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("day").alias("n_days"),
        )
    )


EVENTS_JSON_SQL = """
SELECT event_type,
       count(*)                              AS n_events,
       cast(sum(k) AS bigint)                AS sum_k,
       round(sum(value), 2)                  AS sum_value,
       count(DISTINCT day)                   AS n_days
FROM (
  SELECT event_type,
         cast(json_extract_string(props, '$.k') AS bigint) AS k,
         cast(date_trunc('hour', ts) AS date)              AS day,
         value
  FROM events
)
GROUP BY event_type
"""


def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish subword counting next to whitespace counting, rolled up
    by language — the tokenizer-budget view of a corpus. Same
    single-scan codegen-only plan as token_stats_by_lang."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "lang",
            T.token_count("text").alias("ws_tokens"),
            T.bpe_token_count("text").alias("bpe_tokens"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws_tokens").alias("total_ws_tokens"),
            F.sum("bpe_tokens").alias("total_bpe_tokens"),
            F.round(
                F.avg(F.col("bpe_tokens") / F.col("ws_tokens")), 4
            ).alias("avg_fertility"),
        )
    )


BPE_TOKEN_SQL = f"""
SELECT lang,
       count(*)                          AS n_docs,
       cast(sum(ws_tokens) AS bigint)    AS total_ws_tokens,
       cast(sum(bpe_tokens) AS bigint)   AS total_bpe_tokens,
       round(avg(bpe_tokens / cast(ws_tokens AS double)), 4) AS avg_fertility
FROM (SELECT lang,
             {T.token_count_sql('text')} AS ws_tokens,
             {T.bpe_token_count_sql('text')} AS bpe_tokens
      FROM documents)
GROUP BY lang
"""


QUERIES = [
    QuerySpec("token_stats_by_lang", token_stats_by_lang, TOKEN_STATS_SQL),
    QuerySpec("bpe_token_stats", bpe_token_stats, BPE_TOKEN_SQL),
    QuerySpec("quality_scores_by_source", quality_scores_by_source, QUALITY_SQL),
    QuerySpec("lang_id_confusion", lang_id_confusion, _lang_id_sql()),
    QuerySpec("doc_fingerprints", doc_fingerprints, FINGERPRINT_SQL),
    QuerySpec("events_json_extract", events_json_extract, EVENTS_JSON_SQL),
]
