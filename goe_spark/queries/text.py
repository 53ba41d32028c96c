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
    from goe_spark.catalog import spread
    from goe_spark.functions.text import LANG_MARKERS, _isin_pred

    # spread: the single-file documents scan yields ONE split and the
    # marker-overlap scoring inherits it (serial stage); the
    # repartition is a no-op on any many-file table (100 TB case).
    d = spread(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "text"
        ),
        "doc_id",
    )
    # Bind-once discipline (the media-parser shape): tokenize ONCE
    # into a bound column, score each language from the bound tokens,
    # then take argmax over the bound scores. The r13 shape inlined
    # tokens(text) into every one of the 5 scores, and each score
    # into greatest() plus the 5-arm when-chain — dozens of split()
    # evaluations per row once the projection falls out of codegen
    # CSE. Values are identical; only the binding changes.
    toked = d.select("lang", T.tokens("text").alias("toks"))
    langs = sorted(LANG_MARKERS)
    scored = toked.select(
        "lang",
        *[
            F.size(
                F.filter(F.col("toks"), _isin_pred(LANG_MARKERS[lang]))
            )
            .cast("long")
            .alias(f"s_{lang}")
            for lang in langs
        ],
    )
    with_best = scored.select(
        "lang",
        *[f"s_{lang}" for lang in langs],
        F.greatest(*[F.col(f"s_{lang}") for lang in langs]).alias("best"),
    )
    # argmax via chained when over the BOUND scores (deterministic
    # tie-break by lang name order because we check in sorted order).
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when(
            (F.col("best") > 0) & (F.col(f"s_{lang}") == F.col("best")),
            F.lit(lang),
        ).otherwise(pred)
    return (
        with_best.select("lang", pred.alias("pred_lang"))
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


# Gopher-style repetition thresholds (Rae et al. 2021 use 0.2 for the
# top-2-gram fraction on web text; the synthetic fixture's word-salad
# sits lower, so the cutoffs split the fixture rather than copying the
# paper's): flag a doc when one word dominates or diversity collapses.
TOP_WORD_FRAC_MAX = 0.12
DISTINCT_RATIO_MIN = 0.55


def repetition_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition/diversity quality signals per source — the filter
    family Gopher/MassiveText-style pipelines apply before training:
    top-word fraction (one token dominating a doc) and distinct-token
    ratio (copy-paste loops collapse it).

    Plan: explode to (doc, word) and aggregate twice. The first
    groupBy's key space is ~tokens-per-corpus but partial aggregation
    (map-side combine) collapses each doc's repeats before the
    shuffle, so the shuffled volume is distinct-(doc,word) pairs —
    bounded by doc length, independent of corpus size. The second
    groupBy is doc-cardinality, the third source-cardinality. Nothing
    here is a Python UDF; the whole plan is codegen'd."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", "source", F.explode(T.tokens("text")).alias("word")
    )
    per_word = words.groupBy("doc_id", "source", "word").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = per_word.groupBy("doc_id", "source").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    top_frac = F.col("top_c") / F.col("n_words")
    distinct_ratio = F.col("n_distinct") / F.col("n_words")
    flagged = (top_frac > TOP_WORD_FRAC_MAX) | (
        distinct_ratio < DISTINCT_RATIO_MIN
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(top_frac), 6).alias("avg_top_word_frac"),
        F.round(F.avg(distinct_ratio), 6).alias("avg_distinct_ratio"),
        F.sum(flagged.cast("long")).alias("n_flagged"),
    )


REPETITION_SQL = f"""
WITH words AS (
  SELECT doc_id, source,
         unnest({T.tokens_sql('text')}) AS word
  FROM documents
), per_word AS (
  SELECT doc_id, source, word, count(*) AS c
  FROM words GROUP BY 1, 2, 3
), per_doc AS (
  SELECT doc_id, source,
         sum(c)   AS n_words,
         count(*) AS n_distinct,
         max(c)   AS top_c
  FROM per_word GROUP BY 1, 2
)
SELECT source,
       count(*) AS n_docs,
       round(avg(top_c / cast(n_words AS double)), 6)      AS avg_top_word_frac,
       round(avg(n_distinct / cast(n_words AS double)), 6) AS avg_distinct_ratio,
       cast(sum(CASE WHEN top_c / cast(n_words AS double) > {TOP_WORD_FRAC_MAX}
                       OR n_distinct / cast(n_words AS double) < {DISTINCT_RATIO_MIN}
                     THEN 1 ELSE 0 END) AS bigint)         AS n_flagged
FROM per_doc GROUP BY source
"""


# Keep only bigrams covering >= 1/1000 of all bigram occurrences — a
# relative threshold so the query returns a stable-shaped result at
# every scale factor (integer cross-multiplication, no float cutoff).
PMI_MIN_COUNT_PER_MILLE = 1


def term_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus collocation mining: pointwise mutual information of
    adjacent word pairs, for every bigram above a relative frequency
    floor. The classic corpus-statistics op (Church & Hanks 1990) a
    data-quality team runs to find boilerplate and template phrases.

    Plan: bigrams are built with a JVM-side transform() over the token
    array (no Python), exploded, and counted — partial aggregation
    collapses repeats map-side, so the shuffle carries distinct
    bigrams. Unigram counts come from one more explode/count; both
    count relations are vocabulary-sized (tiny next to the corpus) and
    the unigram side is broadcast into the PMI join twice. The
    frequency floor is integer arithmetic (c2 * 1000 >= N2) so both
    engines make the identical cut."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(T.tokens("text").alias("ws"))
    # Guard size > 1: Spark's sequence(1, 0) DESCENDS rather than
    # yielding empty, which would fabricate bigrams for 1-token docs.
    big = toks.where(F.size("ws") > 1).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1),"
                " i -> concat(ws[i-1], ' ', ws[i]))"
            )
        ).alias("bigram")
    )
    uni = toks.select(F.explode("ws").alias("word"))
    c2 = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("c2"))
    c1 = uni.groupBy("word").agg(F.count(F.lit(1)).alias("c1"))
    # One scan for both totals (token arrays are never empty, so
    # sum(size - 1) equals the exploded bigram count).
    totals = toks.agg(
        F.sum(F.size("ws")).alias("n1"),
        F.sum(F.size("ws") - 1).alias("n2"),
    ).first()
    n1, n2 = int(totals["n1"]), int(totals["n2"])
    left = F.split(F.col("bigram"), " ").getItem(0)
    right = F.split(F.col("bigram"), " ").getItem(1)
    joined = (
        c2.where(F.col("c2") * 1000 >= F.lit(n2) * PMI_MIN_COUNT_PER_MILLE)
        .join(
            F.broadcast(c1.select(F.col("word").alias("w1"), F.col("c1").alias("ca"))),
            left == F.col("w1"),
        )
        .join(
            F.broadcast(c1.select(F.col("word").alias("w2"), F.col("c1").alias("cb"))),
            right == F.col("w2"),
        )
    )
    pmi = F.log(
        (F.col("c2") / F.lit(float(n2)))
        / ((F.col("ca") / F.lit(float(n1))) * (F.col("cb") / F.lit(float(n1))))
    )
    return joined.select(
        "bigram", "c2", F.round(pmi, 6).alias("pmi")
    )


BIGRAM_PMI_SQL = f"""
WITH toks AS (
  SELECT {T.tokens_sql('text')} AS ws FROM documents
), big AS (
  SELECT unnest(list_transform(range(1, len(ws)),
                               i -> ws[i] || ' ' || ws[i + 1])) AS bigram
  FROM toks
), uni AS (
  SELECT unnest(ws) AS word FROM toks
), c2 AS (
  SELECT bigram, count(*) AS c2 FROM big GROUP BY bigram
), c1 AS (
  SELECT word, count(*) AS c1 FROM uni GROUP BY word
), n AS (
  SELECT (SELECT count(*) FROM big) AS n2,
         (SELECT count(*) FROM uni) AS n1
)
SELECT c2.bigram, c2.c2,
       round(ln((c2.c2 / cast(n.n2 AS double))
                / ((a.c1 / cast(n.n1 AS double))
                   * (b.c1 / cast(n.n1 AS double)))), 6) AS pmi
FROM c2
CROSS JOIN n
JOIN c1 a ON a.word = string_split(c2.bigram, ' ')[1]
JOIN c1 b ON b.word = string_split(c2.bigram, ' ')[2]
WHERE c2.c2 * 1000 >= n.n2 * {PMI_MIN_COUNT_PER_MILLE}
"""


# Unigram-LM scoring: vocabulary cap and the OOV pseudo-count. The
# cap is the scale knob — the score join broadcasts a TOP_K-row vocab,
# never the full corpus vocabulary.
LM_VOCAB_TOP_K = 5_000
LM_OOV_PSEUDO = 0.5


def _unigram_doc_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, n_toks, logprob): the per-document unigram-LM
    score lineage — ONE copy shared by unigram_logprob_scores and
    perplexity_band_stats so the smoothing/top-K/rounding rules can
    never diverge between the report and the band split (round-13
    review finding). See unigram_logprob_scores for the plan story."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", T.tokens("text").alias("toks")
    )
    tok = d.select("doc_id", "lang", F.explode("toks").alias("t"))
    counts = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    top = counts.orderBy(F.desc("c"), F.asc("t")).limit(LM_VOCAB_TOP_K)
    total = tok.count()  # scalar: total corpus tokens
    return (
        tok.join(F.broadcast(top), "t", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.round(
                F.avg(F.log(F.coalesce(F.col("c"), F.lit(LM_OOV_PSEUDO))))
                - F.log(F.lit(float(total))),
                6,
            ).alias("logprob"),
        )
    )


def unigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality proxy (the KenLM-perplexity
    curation signal, reduced to order-1): per document, the mean
    ln-probability of its tokens under the corpus's own top-{K}
    unigram distribution, OOV tokens smoothed with a
    {LM_OOV_PSEUDO}-pseudo-count. Low scores flag gibberish /
    boilerplate; per-language means + low-tail counts come out as the
    curation report.

    Plan: scan 1 builds the token counts (explode + groupBy, map-side
    partial); only the top-K survive (TakeOrdered, deterministic
    count-desc/token-asc tie-break) and BROADCAST into scan 2's
    per-token lookup, so the corpus-sized explode never shuffles —
    per-doc means aggregate map-side. avg(ln p) decomposes as
    avg(ln count) - ln(total): both engines compute ln on the same
    integers, immune to p-quotient rounding.
    """
    scored = _unigram_doc_logprob(spark, sf_dir)
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("logprob"), 4).alias("avg_logprob"),
        F.round(F.min("logprob"), 6).alias("worst_logprob"),
        F.sum(
            (F.col("logprob") < F.lit(-9.0)).cast("long")
        ).alias("n_low_tail"),
    )


# Bigram LM: conditional-probability vocabulary size and the low-tail
# threshold. Conditional ln-probs are much less negative than unigram
# joint probs, so the tail threshold is tighter.
LM_BIGRAM_TOP_K = 20_000
BIGRAM_LOW_TAIL = -7.0


def bigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-2 LM quality proxy (one step closer to the KenLM
    perplexity filter than unigram_logprob_scores): per token position,
    ln p(cur | prev) = ln c(prev,cur) - ln c(prev) when both the
    bigram (top-{LM_BIGRAM_TOP_K}) and the previous token
    (top-{LM_VOCAB_TOP_K}) are in vocabulary, else BACKOFF to the
    smoothed unigram ln p(cur) — document position 1 backs off by
    construction (no prev). Per-language rollup mirrors the unigram
    report.

    Every probability is a quotient of corpus counts, so scores
    decompose as differences of ln(integer) — bit-identical across
    engines, immune to quotient rounding.

    Plan: the corpus-sized position explode joins ONLY against
    broadcast vocab tables (bigram top-K, unigram top-K twice), then
    aggregates map-side to doc grain — the explode itself never
    shuffles. The position frame is tokenized ONCE into a
    localCheckpoint (the r12 shape re-tokenized the corpus four
    times: unigram vocab, bigram vocab, the total count, and the
    scored pass); the existing total-count action materializes it.
    At 100 TB the same featurize-once layout checkpoints the position
    frame to DFS — plan shape identical."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", T.tokens("text").alias("toks")
    )
    toks = F.col("toks")
    pos = (
        d.select(
            "doc_id",
            "lang",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks)),
                    lambda i: F.struct(
                        F.when(i > 1, F.element_at(toks, i - 1)).alias(
                            "prev"
                        ),
                        F.element_at(toks, i).alias("cur"),
                    ),
                )
            ).alias("p"),
        )
        .select("doc_id", "lang", "p.prev", "p.cur")
        # localCheckpoint (not persist): ContextCleaner releases the
        # blocks when the driver reference is GC'd (round-7 ADVICE)
        .localCheckpoint(eager=False)
    )
    uni = (
        pos.groupBy(F.col("cur").alias("t"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("t"))
        .limit(LM_VOCAB_TOP_K)
    )
    big = (
        pos.where(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("bc"))
        .orderBy(F.desc("bc"), F.asc("prev"), F.asc("cur"))
        .limit(LM_BIGRAM_TOP_K)
    )
    total = pos.count()  # materializes the checkpoint; total tokens
    up = F.broadcast(
        uni.select(F.col("t").alias("prev"), F.col("c").alias("pc"))
    )
    uc = F.broadcast(
        uni.select(F.col("t").alias("cur"), F.col("c").alias("cc"))
    )
    lp = F.when(
        F.col("bc").isNotNull() & F.col("pc").isNotNull(),
        F.log("bc") - F.log("pc"),
    ).otherwise(
        F.log(F.coalesce(F.col("cc"), F.lit(LM_OOV_PSEUDO)))
        - F.log(F.lit(float(total)))
    )
    scored = (
        pos.join(F.broadcast(big), ["prev", "cur"], "left")
        .join(up, "prev", "left")
        .join(uc, "cur", "left")
        .groupBy("doc_id", "lang")
        .agg(F.round(F.avg(lp), 6).alias("logprob"))
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("logprob"), 4).alias("avg_logprob"),
        F.round(F.min("logprob"), 6).alias("worst_logprob"),
        F.sum(
            (F.col("logprob") < F.lit(BIGRAM_LOW_TAIL)).cast("long")
        ).alias("n_low_tail"),
    )


BIGRAM_LM_SQL = f"""
WITH pos AS (
  SELECT doc_id, lang,
         CASE WHEN i > 1 THEN toks[i - 1] END AS prev,
         toks[i] AS cur
  FROM (SELECT doc_id, lang, {T.tokens_sql('text')} AS toks
        FROM documents),
       LATERAL unnest(range(1, len(toks) + 1)) AS r(i)
), uni AS (
  SELECT cur AS t, count(*) AS c FROM pos GROUP BY 1
  ORDER BY c DESC, t ASC LIMIT {LM_VOCAB_TOP_K}
), big AS (
  SELECT prev, cur, count(*) AS bc FROM pos
  WHERE prev IS NOT NULL GROUP BY 1, 2
  ORDER BY bc DESC, prev ASC, cur ASC LIMIT {LM_BIGRAM_TOP_K}
), total AS (
  SELECT count(*) AS n FROM pos
), per_doc AS (
  SELECT pos.doc_id, pos.lang,
         round(avg(CASE WHEN big.bc IS NOT NULL AND up.c IS NOT NULL
                        THEN ln(big.bc) - ln(up.c)
                        ELSE ln(coalesce(uc.c, {LM_OOV_PSEUDO}))
                             - ln((SELECT n FROM total)) END), 6)
           AS logprob
  FROM pos
  LEFT JOIN big ON big.prev = pos.prev AND big.cur = pos.cur
  LEFT JOIN uni up ON up.t = pos.prev
  LEFT JOIN uni uc ON uc.t = pos.cur
  GROUP BY pos.doc_id, pos.lang
)
SELECT lang,
       count(*)                        AS n_docs,
       round(avg(logprob), 4)          AS avg_logprob,
       round(min(logprob), 6)          AS worst_logprob,
       cast(sum(CASE WHEN logprob < {BIGRAM_LOW_TAIL} THEN 1 ELSE 0 END)
            AS bigint) AS n_low_tail
FROM per_doc GROUP BY lang
"""


# Shared per-document unigram-LM CTE chain (ends in
# per_doc(doc_id, lang, n_toks, logprob)) — the DuckDB twin of
# _unigram_doc_logprob, composed by UNIGRAM_LM_SQL and
# PERPLEXITY_BAND_SQL so the lineages cannot drift.
_UNIGRAM_PER_DOC_CTES = f"""tok AS (
  SELECT doc_id, lang, unnest({T.tokens_sql('text')}) AS t FROM documents
), counts AS (
  SELECT t, count(*) AS c FROM tok GROUP BY t
), top AS (
  SELECT t, c FROM counts ORDER BY c DESC, t ASC LIMIT {LM_VOCAB_TOP_K}
), total AS (
  SELECT count(*) AS n FROM tok
), per_doc AS (
  SELECT tok.doc_id, tok.lang,
         count(*) AS n_toks,
         round(avg(ln(coalesce(top.c, {LM_OOV_PSEUDO})))
               - ln((SELECT n FROM total)), 6) AS logprob
  FROM tok LEFT JOIN top ON top.t = tok.t
  GROUP BY tok.doc_id, tok.lang
)"""

UNIGRAM_LM_SQL = f"""
WITH {_UNIGRAM_PER_DOC_CTES}
SELECT lang,
       count(*)                        AS n_docs,
       round(avg(logprob), 4)          AS avg_logprob,
       round(min(logprob), 6)          AS worst_logprob,
       cast(sum(CASE WHEN logprob < -9.0 THEN 1 ELSE 0 END)
            AS bigint) AS n_low_tail
FROM per_doc GROUP BY lang
"""


def perplexity_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet head/middle/tail split — the canonical LM-perplexity
    curation move (Wenzek et al. 2020): score every document with the
    corpus-trained unigram LM (same lineage as
    unigram_logprob_scores), cut each LANGUAGE at its own logprob
    terciles, and report per (lang, band) the doc count, token mass,
    and logprob stats. CCNet keeps head+middle and drops (or
    down-weights) tail; per-language cutoffs are the equity move — a
    global cutoff would empty low-resource languages whose absolute
    logprobs sit lower.

    Plan: one token explode + top-K vocabulary broadcast (the
    unigram_logprob_scores shape); the tercile thresholds are a
    lang-cardinality aggregate broadcast back; rollup is
    (lang x 3)-grain. Exact-percentile thresholds swap to
    approx_percentile at 100 TB like order_value_percentiles."""
    per_doc = _unigram_doc_logprob(spark, sf_dir)
    th = per_doc.groupBy("lang").agg(
        F.round(F.percentile("logprob", F.lit(1.0 / 3)), 6).alias("p33"),
        F.round(F.percentile("logprob", F.lit(2.0 / 3)), 6).alias("p66"),
    )
    j = per_doc.join(F.broadcast(th), "lang")
    band = (
        F.when(F.col("logprob") >= F.col("p66"), "head")
        .when(F.col("logprob") >= F.col("p33"), "middle")
        .otherwise("tail")
    )
    return j.groupBy("lang", band.alias("band")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
        F.round(F.avg("logprob"), 4).alias("avg_logprob"),
        F.round(F.min("logprob"), 6).alias("min_logprob"),
        F.round(F.max("logprob"), 6).alias("max_logprob"),
    )


PERPLEXITY_BAND_SQL = f"""
WITH {_UNIGRAM_PER_DOC_CTES}, th AS (
  SELECT lang,
         round(quantile_cont(logprob, 1.0 / 3), 6) AS p33,
         round(quantile_cont(logprob, 2.0 / 3), 6) AS p66
  FROM per_doc GROUP BY lang
), banded AS (
  SELECT d.lang, d.n_toks, d.logprob,
         CASE WHEN d.logprob >= t.p66 THEN 'head'
              WHEN d.logprob >= t.p33 THEN 'middle'
              ELSE 'tail' END AS band
  FROM per_doc d JOIN th t USING (lang)
)
SELECT lang, band,
       count(*) AS n_docs,
       cast(sum(n_toks) AS bigint) AS n_tokens,
       round(avg(logprob), 4) AS avg_logprob,
       round(min(logprob), 6) AS min_logprob,
       round(max(logprob), 6) AS max_logprob
FROM banded GROUP BY lang, band
"""


TFIDF_TOP_N = 3


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keyword extraction: the top {TFIDF_TOP_N}
    terms of every document by tf * ln(N/df) over the corpus's own
    document frequencies — the classic relevance/feature signal a
    retrieval or curation pipeline derives before anything fancier.

    Plan: one explode -> (doc, term) counts (partial aggregation
    collapses repeats map-side), document frequencies reduce to a
    vocabulary-cardinality relation that BROADCASTS into the scoring
    join, and the top-k runs as a window partitioned by doc_id — one
    shuffle of term-grain counts, one of doc-grain rows; nothing
    global. Ranking uses the ROUNDED score with a term tie-break so
    both engines make the identical cut."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    # N folds in as a 1-row broadcast aggregate, not an eager count():
    # building the DataFrame must not run a corpus-sized job.
    totals = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs_total"))
    tf = (
        d.select(
            "doc_id",
            F.explode(T.tokens(F.lower(F.col("text")))).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs_total") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TFIDF_TOP_N)
        .select("doc_id", "term", "tf", "df", "tfidf", "rn")
    )


TFIDF_SQL = f"""
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest({T.tokens_sql('lower(text)')}) AS term
        FROM documents)
  GROUP BY 1, 2
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         round(tf.tf * ln(n.n_docs / cast(dfreq.df AS double)), 6) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) AS rn
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf, rn
FROM ranked WHERE rn <= {TFIDF_TOP_N}
"""


# Lexicon-based sentiment (the classic distributed text-analytics
# rollup — cf. "Large Scale Sentiment Analysis on Twitter with
# Spark", EDBT 2016, in PAPERS.md). The lexicon is a broadcast-tiny
# word list; on the synthetic corpus it is a stand-in drawn from the
# fixture vocabulary — the OPERATOR (per-doc lexicon hit counts ->
# bounded score -> per-slice rollup, all codegen expressions) is what
# carries to a real lexicon at 100 TB.
SENT_POS = ("fast", "big", "merge", "value")
SENT_NEG = ("slow", "small", "dup", "scan")


def sentiment_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) sentiment rollup: doc score =
    (pos - neg) / (pos + neg + 1) over lexicon hits, bounded (-1, 1).
    One scan, map-side array filters, one slice-cardinality shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    pos = F.size(F.filter(toks, T._isin_pred(SENT_POS))).cast("double")
    neg = F.size(F.filter(toks, T._isin_pred(SENT_NEG))).cast("double")
    score = F.round((pos - neg) / (pos + neg + 1), 6)
    scored = d.select("lang", "source", score.alias("s"))
    return scored.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("s"), 6).alias("avg_sentiment"),
        F.sum((F.col("s") > 0).cast("long")).alias("n_positive_docs"),
        F.sum((F.col("s") < 0).cast("long")).alias("n_negative_docs"),
    )


def _sentiment_sql() -> str:
    toks = T.tokens_sql("text")
    pos_list = ", ".join(f"'{w}'" for w in SENT_POS)
    neg_list = ", ".join(f"'{w}'" for w in SENT_NEG)
    return f"""
WITH scored AS (
  SELECT lang, source,
         round(
           (cast(len(list_filter({toks}, t -> t IN ({pos_list}))) AS double)
            - len(list_filter({toks}, t -> t IN ({neg_list}))))
           / (cast(len(list_filter({toks}, t -> t IN ({pos_list}))) AS double)
              + len(list_filter({toks}, t -> t IN ({neg_list}))) + 1),
           6) AS s
  FROM documents
)
SELECT lang, source,
       count(*) AS n_docs,
       round(avg(s), 6) AS avg_sentiment,
       cast(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS bigint)
         AS n_positive_docs,
       cast(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS bigint)
         AS n_negative_docs
FROM scored GROUP BY lang, source
"""


def token_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram Shannon entropy — the lexical-diversity
    signal curation pipelines use to spot template/boilerplate-heavy
    sources (low H) and noise/garbage sources (H near ln|V|).
    H = ln(N) - (1/N)·Σ c·ln(c), computed from EXACT integer token
    counts: the Σ c·ln(c) term is fixed-point quantized PER TERM
    (floor(c·ln(c)·1e6), BIGINT) before summation, so the sum is
    order-free and both engines quantize the same per-term double —
    the money.py discipline applied to log mass.

    Plan: one explode + (source, token) hash aggregate (map-side
    partial), then a source-grain rollup — two shuffles, both carrying
    counts, never text. Per-source term cardinality is vocab-bounded,
    so the plan is flat in corpus size at 100 TB."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", T.tokens("text").alias("toks")
    )
    tok = d.select("source", F.explode("toks").alias("t"))
    counts = tok.groupBy("source", "t").agg(
        F.count(F.lit(1)).alias("c")
    )
    per = counts.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(
            F.floor(F.col("c") * F.log(F.col("c")) * 1e6)
            .cast("decimal(38,0)")
        ).alias("slogq"),
    )
    ent = (
        F.log(F.col("n_tokens"))
        - F.col("slogq").cast("double") / 1e6 / F.col("n_tokens")
    )
    return per.select(
        "source",
        "n_tokens",
        "n_terms",
        F.floor(ent * 1e4 + 0.5).cast("long").alias("entropy_q4"),
    )


TOKEN_ENTROPY_SQL = f"""
WITH tok AS (
  SELECT source, unnest({T.tokens_sql('text')}) AS t FROM documents
), counts AS (
  SELECT source, t, count(*) AS c FROM tok GROUP BY source, t
), per AS (
  SELECT source,
         cast(sum(c) AS bigint) AS n_tokens,
         count(*) AS n_terms,
         sum(cast(floor(c * ln(c) * 1e6) AS bigint)) AS slogq
  FROM counts GROUP BY source
)
SELECT source, n_tokens, n_terms,
       cast(floor((ln(n_tokens) - cast(slogq AS double) / 1e6 / n_tokens)
                  * 1e4 + 0.5) AS bigint) AS entropy_q4
FROM per
"""


def vocab_overlap_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the corpus-mixing
    diagnostic that tells a pretraining-data curator which sources are
    lexically redundant (merge/deprioritize) vs complementary. For
    each unordered source pair: |Va∩Vb|, |Va|, |Vb| and the Jaccard
    similarity, fixed-point quantized.

    Plan: distinct (source, token) — one hash aggregate — then a
    token-keyed self-join whose per-token posting list is bounded by
    the SOURCE COUNT (each token contributes at most |S|² pair hits,
    |S| = tens-to-hundreds), then a pair-grain rollup: inverted-index
    asymptotics, no corpus-sized pairwise term. Vocab sizes broadcast
    into the final pair join."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", T.tokens("text").alias("toks")
    )
    vocab = d.select(
        "source", F.explode("toks").alias("t")
    ).distinct()
    sizes = vocab.groupBy("source").agg(
        F.count(F.lit(1)).alias("vsize")
    )
    a = vocab.alias("a")
    b = vocab.alias("b")
    inter = (
        a.join(b, (F.col("a.t") == F.col("b.t")))
        .where(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("vsize").alias("va")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("vsize").alias("vb")
    )
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            "va",
            "vb",
            F.floor(
                F.col("n_common")
                * 1e6
                / (F.col("va") + F.col("vb") - F.col("n_common"))
            )
            .cast("long")
            .alias("jaccard_q6"),
        )
    )


VOCAB_OVERLAP_SQL = f"""
WITH vocab AS (
  SELECT DISTINCT source, t
  FROM (SELECT source, unnest({T.tokens_sql('text')}) AS t FROM documents)
), sizes AS (
  SELECT source, count(*) AS vsize FROM vocab GROUP BY source
), inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         count(*) AS n_common
  FROM vocab a JOIN vocab b ON a.t = b.t AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, n_common,
       sa.vsize AS va, sb.vsize AS vb,
       cast(floor(n_common * 1e6
                  / (sa.vsize + sb.vsize - n_common)) AS bigint)
         AS jaccard_q6
FROM inter
JOIN sizes sa ON sa.source = source_a
JOIN sizes sb ON sb.source = source_b
"""


ZIPF_TOP_N = 500
ZIPF_Q = 1_000_000  # fixed-point grid for ln(rank)/ln(count) terms


def zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit — the corpus-health check that a
    natural-language corpus obeys freq ~ rank^s with s near -1
    (template/boilerplate corpora flatten, scraped junk steepens):
    least-squares slope/intercept/R^2 of ln(freq) on ln(rank) over
    the top-{ZIPF_TOP_N} tokens, plus the token-mass share those top
    tokens cover. All regression sums are per-term fixed-point
    quantized (ln values on the {ZIPF_Q} grid, BIGINT products)
    before DECIMAL(38,0) summation — order-free, engine-exact; the
    closed-form slope divides the exact sums cast to double once.

    Plan at 100 TB: one map-side-combined token count is the only
    corpus-sized op; top-N is TakeOrdered; the rank window and the
    regression aggregate run on the {ZIPF_TOP_N}-row relation
    (bounded-global window, whitelisted in tools/plan_audit.py)."""
    from pyspark.sql.window import Window

    from goe_spark.catalog import spread

    # spread: the tokenize + explode + partial count is the corpus
    # pass and the single-file scan would run it on ONE task (no-op
    # on a many-file table). explode_OUTER + null drop, not plain
    # explode: explode makes Catalyst infer `size(tokens) > 0` and
    # push it below the parallelizing repartition, inlining the
    # tokenize into a single-task filter (the documented
    # cross_lang_shingle_leakage gotcha).
    d = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
    )
    tok = d.select(F.explode_outer(T.tokens("text")).alias("t")).where(
        F.col("t").isNotNull()
    )
    counts = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(
        F.sum("c").alias("total_mass"),
        F.count(F.lit(1)).alias("n_terms_all"),
    )
    top = counts.orderBy(F.desc("c"), F.asc("t")).limit(ZIPF_TOP_N)
    w = Window.orderBy(F.desc("c"), F.asc("t"))
    ranked = top.withColumn("r", F.row_number().over(w)).select(
        F.floor(F.log(F.col("r").cast("double")) * ZIPF_Q)
        .cast("long")
        .alias("xq"),
        F.floor(F.log(F.col("c").cast("double")) * ZIPF_Q)
        .cast("long")
        .alias("yq"),
        "c",
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    sums = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("xq"))).alias("sx"),
        F.sum(dec(F.col("yq"))).alias("sy"),
        F.sum(dec(F.col("xq") * F.col("yq"))).alias("sxy"),
        F.sum(dec(F.col("xq") * F.col("xq"))).alias("sxx"),
        F.sum(dec(F.col("yq") * F.col("yq"))).alias("syy"),
        F.sum("c").alias("top_mass"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double") / ZIPF_Q
    sy = F.col("sy").cast("double") / ZIPF_Q
    sxy = F.col("sxy").cast("double") / ZIPF_Q / ZIPF_Q
    sxx = F.col("sxx").cast("double") / ZIPF_Q / ZIPF_Q
    syy = F.col("syy").cast("double") / ZIPF_Q / ZIPF_Q
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = (
        (n * sxy - sx * sy)
        * (n * sxy - sx * sy)
        / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    )
    return sums.crossJoin(F.broadcast(total)).select(
        F.col("n").cast("long").alias("n_terms"),
        "n_terms_all",
        "total_mass",
        "top_mass",
        F.floor(F.col("top_mass") * 1e6 / F.col("total_mass"))
        .cast("long")
        .alias("top_mass_share_q6"),
        F.floor(slope * 1e6).cast("long").alias("slope_q6"),
        F.floor(intercept * 1e6).cast("long").alias("intercept_q6"),
        F.floor(r2 * 1e4).cast("long").alias("r2_q4"),
    )


ZIPF_SQL = f"""
WITH tok AS (
  SELECT unnest({T.tokens_sql('text')}) AS t FROM documents
), counts AS (
  SELECT t, count(*) AS c FROM tok GROUP BY t
), total AS (
  SELECT cast(sum(c) AS bigint) AS total_mass,
         count(*) AS n_terms_all
  FROM counts
), top AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, t ASC) AS r
  FROM (SELECT * FROM counts ORDER BY c DESC, t ASC LIMIT {ZIPF_TOP_N})
), ranked AS (
  SELECT cast(floor(ln(cast(r AS double)) * {ZIPF_Q}) AS bigint) AS xq,
         cast(floor(ln(cast(c AS double)) * {ZIPF_Q}) AS bigint) AS yq,
         c
  FROM top
), sums AS (
  SELECT count(*) AS n,
         sum(xq) AS sx, sum(yq) AS sy,
         sum(xq * yq) AS sxy, sum(xq * xq) AS sxx, sum(yq * yq) AS syy,
         cast(sum(c) AS bigint) AS top_mass
  FROM ranked
)
SELECT cast(n AS bigint) AS n_terms,
       n_terms_all,
       total_mass,
       top_mass,
       cast(floor(top_mass * 1e6 / total_mass) AS bigint)
         AS top_mass_share_q6,
       cast(floor(
         (cast(n AS double) * (cast(sxy AS double) / {ZIPF_Q} / {ZIPF_Q})
          - (cast(sx AS double) / {ZIPF_Q}) * (cast(sy AS double) / {ZIPF_Q}))
         / (cast(n AS double) * (cast(sxx AS double) / {ZIPF_Q} / {ZIPF_Q})
            - (cast(sx AS double) / {ZIPF_Q}) * (cast(sx AS double) / {ZIPF_Q}))
         * 1e6) AS bigint) AS slope_q6,
       cast(floor(
         ((cast(sy AS double) / {ZIPF_Q})
          - ((cast(n AS double) * (cast(sxy AS double) / {ZIPF_Q} / {ZIPF_Q})
              - (cast(sx AS double) / {ZIPF_Q}) * (cast(sy AS double) / {ZIPF_Q}))
             / (cast(n AS double) * (cast(sxx AS double) / {ZIPF_Q} / {ZIPF_Q})
                - (cast(sx AS double) / {ZIPF_Q}) * (cast(sx AS double) / {ZIPF_Q})))
            * (cast(sx AS double) / {ZIPF_Q}))
         / cast(n AS double) * 1e6) AS bigint) AS intercept_q6,
       cast(floor(
         (cast(n AS double) * (cast(sxy AS double) / {ZIPF_Q} / {ZIPF_Q})
          - (cast(sx AS double) / {ZIPF_Q}) * (cast(sy AS double) / {ZIPF_Q}))
         * (cast(n AS double) * (cast(sxy AS double) / {ZIPF_Q} / {ZIPF_Q})
            - (cast(sx AS double) / {ZIPF_Q}) * (cast(sy AS double) / {ZIPF_Q}))
         / ((cast(n AS double) * (cast(sxx AS double) / {ZIPF_Q} / {ZIPF_Q})
             - (cast(sx AS double) / {ZIPF_Q}) * (cast(sx AS double) / {ZIPF_Q}))
            * (cast(n AS double) * (cast(syy AS double) / {ZIPF_Q} / {ZIPF_Q})
               - (cast(sy AS double) / {ZIPF_Q}) * (cast(sy AS double) / {ZIPF_Q})))
         * 1e4) AS bigint) AS r2_q4
FROM sums CROSS JOIN total
"""


def quality_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-threshold calibration: decile-binned quality scores
    crossed with the exact-dup signal — the report a curator reads to
    pick quality_min (does the low-quality tail actually hold the
    duplicates/boilerplate?) before running the curation pipeline.
    Per quality bin: docs, exact-dup docs (corpus fingerprint seen
    >1x), dup rate per 10k, token mass, mean tokens.

    Plan: one scan computes (q, fp, n_tokens); the fp spread count is
    a hash-only aggregate joined back by fingerprint; the final
    rollup is 10 bins. Same shuffle discipline as dedup_exact —
    fingerprints move, text never does."""
    from pyspark.sql.window import Window

    from goe_spark.catalog import spread as _spread

    # spread: the quality/fingerprint/token-count expressions are the
    # CPU wall and the single-file scan would run them on ONE task
    # (no-op on a many-file table).
    d = _spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
    )
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    docs = d.select(
        T.quality_score("text").alias("q"),
        hash64(norm).alias("fp"),
        T.token_count("text").alias("n_tokens"),
    )
    # fingerprint spread via a WINDOW count over fp instead of the r13
    # groupBy + self-join: the join re-ran the quality/hash/token
    # expressions once per exchange (the two consumers shuffle
    # different projections, so exchange reuse never applied) — the
    # window computes n_occ in the single fp exchange (guide §2.4
    # "two operations keyed the same way share one exchange").
    # Identical n_occ per row; fp partitions are fingerprint-value
    # grain (bounded by duplicate-group size), never corpus grain.
    n_occ = F.count(F.lit(1)).over(Window.partitionBy("fp"))
    binned = docs.select(
        F.least(F.lit(9), F.floor(F.col("q") * 10))
        .cast("int")
        .alias("q_bin"),
        "n_tokens",
        (n_occ > 1).cast("long").alias("is_dup"),
    )
    return binned.groupBy("q_bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_dup").alias("n_dup_docs"),
        F.floor(F.sum("is_dup") * 10000.0 / F.count(F.lit(1)))
        .cast("long")
        .alias("dup_per_10k"),
        F.sum("n_tokens").alias("token_mass"),
        F.floor(F.sum("n_tokens") / F.count(F.lit(1)))
        .cast("long")
        .alias("mean_tokens"),
    )


QUALITY_CALIBRATION_SQL = f"""
WITH docs AS (
  SELECT {T.quality_score_sql('text')} AS q,
         {hash64_sql(_NORM_SQL)} AS fp,
         {T.token_count_sql('text')} AS n_tokens
  FROM documents
), spread AS (
  SELECT fp, count(*) AS n_occ FROM docs GROUP BY fp
), binned AS (
  SELECT cast(least(9, floor(q * 10)) AS int) AS q_bin,
         n_tokens,
         CASE WHEN n_occ > 1 THEN 1 ELSE 0 END AS is_dup
  FROM docs JOIN spread USING (fp)
)
SELECT q_bin,
       count(*) AS n_docs,
       cast(sum(is_dup) AS bigint) AS n_dup_docs,
       cast(floor(sum(is_dup) * 10000.0 / count(*)) AS bigint)
         AS dup_per_10k,
       cast(sum(n_tokens) AS bigint) AS token_mass,
       cast(floor(cast(sum(n_tokens) AS double) / count(*)) AS bigint)
         AS mean_tokens
FROM binned GROUP BY q_bin
"""


KL_VOCAB_TOP_K = 1_000


def unigram_kl_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise unigram KL divergence between sources — the
    distribution-shift companion to vocab_overlap_sources (set
    overlap says WHETHER vocabularies differ; KL says how much the
    usage FREQUENCIES differ — the signal a data-mixing curator uses
    to weight sources, cf. DoReMi/DSIR-style domain reweighting).
    Support is the corpus top-{K} tokens (deterministic count-desc /
    token-asc TakeOrdered), add-one smoothed over the ACTUAL support
    size L (not the K cap — a corpus with fewer than K distinct
    tokens must still normalize to a proper distribution, else "KL"
    goes negative) so no source zeroes out; both directions reported
    per unordered pair.

    Plan: one explode+groupBy builds token counts; the K-row support
    and per-source masses BROADCAST; the scoring grid is K x |S| rows
    (vocabulary grain, never corpus grain) and is localCheckpointed
    before its self-join so the corpus scan happens once. ln is taken
    on INTEGERS only (the unigram_logprob_scores discipline) and each
    token contribution is fixed-pointed to q12 before summing, so the
    rollup is order-insensitive and cross-engine exact."""
    K = KL_VOCAB_TOP_K
    d = load_table(spark, sf_dir, "documents").select(
        "source", T.tokens("text").alias("toks")
    )
    tok = d.select("source", F.explode("toks").alias("t"))
    counts = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    top = counts.orderBy(F.desc("c"), F.asc("t")).limit(K).select("t")
    sc_counts = (
        tok.join(F.broadcast(top), "t")
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sources = d.select("source").distinct()
    grid0 = (
        top.crossJoin(F.broadcast(sources))
        .join(sc_counts, ["source", "t"], "left")
        .select(
            "t", "source", F.coalesce(F.col("c"), F.lit(0)).alias("c")
        )
    )
    # per-source restricted mass n AND support size L in one pass —
    # the zero-filled grid has exactly one row per (support token,
    # source), so count(*) IS the support size
    mass = grid0.groupBy("source").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("L")
    )
    grid = (
        grid0.join(F.broadcast(mass), "source")
        .localCheckpoint(eager=True)  # K x |S| rows; cut the corpus
    )  # lineage so the pair self-join scans the corpus once
    a = grid.select(
        "t",
        F.col("source").alias("source_a"),
        F.col("c").alias("ca"),
        F.col("n").alias("na"),
        F.col("L").alias("la"),
    )
    b = grid.select(
        "t",
        F.col("source").alias("source_b"),
        F.col("c").alias("cb"),
        F.col("n").alias("nb"),
        F.col("L").alias("lb"),
    )
    pair = a.join(b, "t").where(F.col("source_a") < F.col("source_b"))
    ln_combo = (
        F.log(F.col("ca") + 1)
        - F.log(F.col("cb") + 1)
        + F.log(F.col("nb") + F.col("lb"))
        - F.log(F.col("na") + F.col("la"))
    )
    pa = (F.col("ca") + 1) / (F.col("na") + F.col("la"))
    pb = (F.col("cb") + 1) / (F.col("nb") + F.col("lb"))
    per = pair.select(
        "source_a",
        "source_b",
        F.floor(pa * ln_combo * 1e12).cast("bigint").alias("ab_q12"),
        F.floor(pb * -ln_combo * 1e12).cast("bigint").alias("ba_q12"),
    )
    return per.groupBy("source_a", "source_b").agg(
        F.sum("ab_q12").alias("kl_ab_q12"),
        F.sum("ba_q12").alias("kl_ba_q12"),
    )


def _unigram_kl_sql() -> str:
    K = KL_VOCAB_TOP_K
    toks = T.tokens_sql("text")
    return f"""
WITH tok AS (
  SELECT source, unnest({toks}) AS t FROM documents
), counts AS (
  SELECT t, count(*) AS c FROM tok GROUP BY t
), top AS (
  SELECT t FROM counts ORDER BY c DESC, t ASC LIMIT {K}
), sc_counts AS (
  SELECT source, tok.t, count(*) AS c
  FROM tok JOIN top ON tok.t = top.t
  GROUP BY source, tok.t
), grid0 AS (
  SELECT top.t, s.source, coalesce(sc.c, 0) AS c
  FROM top
  CROSS JOIN (SELECT DISTINCT source FROM documents) s
  LEFT JOIN sc_counts sc ON sc.t = top.t AND sc.source = s.source
), mass AS (
  SELECT source, sum(c) AS n, count(*) AS L FROM grid0 GROUP BY source
), grid AS (
  SELECT grid0.t, grid0.source, grid0.c, mass.n, mass.L
  FROM grid0 JOIN mass ON mass.source = grid0.source
), pair AS (
  SELECT a.source AS source_a, b.source AS source_b,
         a.c AS ca, a.n AS na, a.L AS la,
         b.c AS cb, b.n AS nb, b.L AS lb
  FROM grid a JOIN grid b ON a.t = b.t AND a.source < b.source
), per AS (
  SELECT source_a, source_b,
    cast(floor((ca + 1) / (na + la)
         * (ln(ca + 1) - ln(cb + 1) + ln(nb + lb) - ln(na + la))
         * 1e12) AS bigint) AS ab_q12,
    cast(floor((cb + 1) / (nb + lb)
         * -(ln(ca + 1) - ln(cb + 1) + ln(nb + lb) - ln(na + la))
         * 1e12) AS bigint) AS ba_q12
  FROM pair
)
SELECT source_a, source_b,
       cast(sum(ab_q12) AS bigint) AS kl_ab_q12,
       cast(sum(ba_q12) AS bigint) AS kl_ba_q12
FROM per GROUP BY source_a, source_b
"""


UNIGRAM_KL_SQL = _unigram_kl_sql()


def doc_quality_length_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Pearson correlation between quality score and document
    length, per source — the curation diagnostic that catches a
    quality scorer degenerating into a length proxy (if corr ~ 1 the
    composite adds nothing over n_chars, a known failure mode of
    length-weighted quality heuristics).

    Determinism: the score is floor-quantized to the 1e-6 grid
    (functions/text.quality_score), recovered as an exact INT (q6);
    all five moment sums accumulate as DECIMAL(38,0) (the money.py
    discipline — order-insensitive, no float folding), and doubles
    appear only in the final r formula, computed identically on both
    engines and floor-quantized to q6.

    Plan: single scan, map-side partial aggregation to one row per
    source — nothing but 6 numbers per source ever shuffles."""
    d = load_table(spark, sf_dir, "documents")
    x = F.col("n_chars").cast("decimal(38,0)")
    y = F.floor(T.quality_score("text") * 1e6 + 0.5).cast("decimal(38,0)")
    per = d.select("source", x.alias("x"), y.alias("y"))
    agg = per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    num = n * F.col("sxy").cast("double") - sx * sy
    den = F.sqrt(
        (n * F.col("sxx").cast("double") - sx * sx)
        * (n * F.col("syy").cast("double") - sy * sy)
    )
    r = F.when(den > 0, num / den).otherwise(F.lit(0.0))
    return agg.select(
        "source",
        F.col("n").alias("n_docs"),
        F.floor(r * 1e6 + 0.5).cast("bigint").alias("corr_q6"),
    )


def _quality_length_corr_sql() -> str:
    q = T.quality_score_sql("text")
    return f"""
WITH per AS (
  SELECT source,
         cast(n_chars AS DECIMAL(38,0)) AS x,
         cast(floor({q} * 1e6 + 0.5) AS DECIMAL(38,0)) AS y
  FROM documents
), agg AS (
  SELECT source,
         count(*) AS n,
         cast(sum(x) AS DECIMAL(38,0)) AS sx,
         cast(sum(y) AS DECIMAL(38,0)) AS sy,
         cast(sum(x * x) AS DECIMAL(38,0)) AS sxx,
         cast(sum(x * y) AS DECIMAL(38,0)) AS sxy,
         cast(sum(y * y) AS DECIMAL(38,0)) AS syy
  FROM per GROUP BY source
)
SELECT source,
       cast(n AS bigint) AS n_docs,
       cast(floor(
         CASE WHEN (cast(n AS double) * cast(sxx AS double)
                    - cast(sx AS double) * cast(sx AS double))
                 * (cast(n AS double) * cast(syy AS double)
                    - cast(sy AS double) * cast(sy AS double)) > 0
              THEN (cast(n AS double) * cast(sxy AS double)
                    - cast(sx AS double) * cast(sy AS double))
                   / sqrt((cast(n AS double) * cast(sxx AS double)
                           - cast(sx AS double) * cast(sx AS double))
                          * (cast(n AS double) * cast(syy AS double)
                             - cast(sy AS double) * cast(sy AS double)))
              ELSE 0.0 END * 1e6 + 0.5) AS bigint) AS corr_q6
FROM agg
"""


def quality_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise two-sample Kolmogorov-Smirnov statistic between the
    per-source quality-score distributions — the drift test a data
    curator runs before assuming one quality_min threshold fits every
    source (a large KS means per-source calibration, cf.
    quality_calibration_bins). EXACT, not sampled: scores live on a
    1e-3 bucket grid (the score is already 1e-6-quantized), the step
    CDFs jump only at observed buckets, and the max |CDF_a - CDF_b|
    over jump points IS the KS statistic. All comparisons are
    cross-multiplied integers (|cum_a*n_b - cum_b*n_a|), so the
    result is exact and cross-engine hash-stable; ks_q6 divides out
    at the end.

    Plan: one scan to (source, bucket) counts; the zero-filled grid
    is <= 1001 buckets x |sources| rows; the cumulative window runs
    over <= 1001 rows per source; the pair join is grid-grain. At
    100 TB only the first aggregate touches the corpus."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    bucket = F.floor(T.quality_score("text") * 1000).cast("int")
    counts = (
        d.select("source", bucket.alias("b"))
        .groupBy("source", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    buckets = counts.select("b").distinct()
    sources = d.select("source").distinct()
    grid = (
        buckets.crossJoin(F.broadcast(sources))
        .join(counts, ["source", "b"], "left")
        .select("source", "b", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    w = (
        Window.partitionBy("source")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cdf = grid.select(
        "source",
        "b",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy("source")).alias("n"),
    ).localCheckpoint(eager=True)  # bucket-grain; cut the corpus scan
    a = cdf.select(
        F.col("source").alias("source_a"),
        "b",
        F.col("cum").alias("ca"),
        F.col("n").alias("na"),
    )
    bb = cdf.select(
        F.col("source").alias("source_b"),
        "b",
        F.col("cum").alias("cb"),
        F.col("n").alias("nb"),
    )
    pair = a.join(bb, "b").where(F.col("source_a") < F.col("source_b"))
    # DECIMAL(38,0): cum * n reaches ~1e20 at 1e10 docs — past int64;
    # the q6 scale-up adds 6 more digits, still 12 under the ceiling
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    gap = F.abs(dec("ca") * dec("nb") - dec("cb") * dec("na"))
    return (
        pair.groupBy("source_a", "source_b")
        .agg(
            F.max(gap).alias("max_gap"),
            F.max("na").alias("n_a"),
            F.max("nb").alias("n_b"),
        )
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            F.floor(
                F.col("max_gap").cast("decimal(38,0)")
                * 1000000
                / (
                    F.col("n_a").cast("decimal(19,0)")
                    * F.col("n_b").cast("decimal(19,0)")
                )
            )
            .cast("bigint")
            .alias("ks_q6"),
        )
    )


def _quality_ks_sql() -> str:
    q = T.quality_score_sql("text")
    return f"""
WITH counts AS (
  SELECT source, cast(floor({q} * 1000) AS int) AS b, count(*) AS c
  FROM documents GROUP BY 1, 2
), grid AS (
  SELECT s.source, bk.b, coalesce(counts.c, 0) AS c
  FROM (SELECT DISTINCT b FROM counts) bk
  CROSS JOIN (SELECT DISTINCT source FROM documents) s
  LEFT JOIN counts ON counts.source = s.source AND counts.b = bk.b
), cdf AS (
  SELECT source, b,
         sum(c) OVER (PARTITION BY source ORDER BY b
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY source) AS n
  FROM grid
), pair AS (
  SELECT a.source AS source_a, b2.source AS source_b,
         abs(cast(a.cum AS DECIMAL(19,0)) * cast(b2.n AS DECIMAL(19,0))
             - cast(b2.cum AS DECIMAL(19,0)) * cast(a.n AS DECIMAL(19,0)))
           AS gap,
         a.n AS na, b2.n AS nb
  FROM cdf a JOIN cdf b2 ON a.b = b2.b AND a.source < b2.source
)
SELECT source_a, source_b,
       cast(max(na) AS bigint) AS n_a,
       cast(max(nb) AS bigint) AS n_b,
       cast(floor(cast(max(gap) AS DECIMAL(38,0)) * 1000000
                  / (cast(max(na) AS DECIMAL(19,0))
                     * cast(max(nb) AS DECIMAL(19,0)))) AS bigint)
         AS ks_q6
FROM pair GROUP BY source_a, source_b
"""


POSITIONAL_P = 16


def positional_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token entropy BY POSITION over the first {P} token slots — the
    templated-document detector: corpora stamped from a boilerplate
    skeleton show a low-entropy prefix (every doc opens with the same
    words) that corpus-wide entropy (token_entropy_by_source)
    averages away. Per position: contributing docs, distinct tokens,
    and Shannon entropy in the same exact fixed-point arithmetic as
    the corpus-wide op (per-term floor(c*ln(c)*1e6) BIGINT mass, ln
    on integers, order-free DECIMAL sums).

    Plan: one posexplode over a 16-token slice (bounded fan-out, not
    the whole doc), one (pos, token) hash aggregate (map-side
    partial), then a 16-row rollup — nothing text-sized shuffles and
    the output is position-bounded at any corpus size."""
    P = POSITIONAL_P
    d = load_table(spark, sf_dir, "documents").select(
        T.tokens("text").alias("toks")
    )
    pt = d.select(
        F.posexplode(F.slice("toks", 1, P)).alias("pos", "t")
    )
    counts = pt.groupBy("pos", "t").agg(F.count(F.lit(1)).alias("c"))
    per = counts.groupBy("pos").agg(
        F.sum("c").alias("n_docs"),
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(
            F.floor(F.col("c") * F.log(F.col("c")) * 1e6)
            .cast("decimal(38,0)")
        ).alias("slogq"),
    )
    ent = (
        F.log(F.col("n_docs"))
        - F.col("slogq").cast("double") / 1e6 / F.col("n_docs")
    )
    return per.select(
        F.col("pos").cast("int").alias("pos"),
        "n_docs",
        "n_terms",
        F.floor(ent * 1e4 + 0.5).cast("long").alias("entropy_q4"),
    )


POSITIONAL_ENTROPY_SQL = f"""
WITH toks AS (
  SELECT {T.tokens_sql('text')} AS tk FROM documents
), pt AS (
  SELECT cast(i AS int) AS pos, tk[i + 1] AS t
  FROM toks, LATERAL unnest(range(0, least(len(tk), {POSITIONAL_P}))) u(i)
), counts AS (
  SELECT pos, t, count(*) AS c FROM pt GROUP BY pos, t
), per AS (
  SELECT pos,
         cast(sum(c) AS bigint) AS n_docs,
         count(*) AS n_terms,
         sum(cast(floor(c * ln(c) * 1e6) AS bigint)) AS slogq
  FROM counts GROUP BY pos
)
SELECT pos, n_docs, n_terms,
       cast(floor((ln(n_docs) - cast(slogq AS double) / 1e6 / n_docs)
                  * 1e4 + 0.5) AS bigint) AS entropy_q4
FROM per
"""


def ngram_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram diversity (trigram type-token ratio) per source — the
    standard lexical-diversity screen for machine-generated or
    template-stuffed corpora: a source whose distinct/total trigram
    ratio collapses is emitting the same phrases over and over, even
    when exact and near-dup both pass (repetition lives BELOW the
    document grain).

    Reuses the canonical hashed-shingle lineage (queries/dedup), so
    'trigram' here is the same 60-bit arithmetic hash every dedup
    operator blocks on — distinct counting on the hash equals distinct
    counting on the string up to a 2^-60 collision, at ~8 bytes per
    shuffled element instead of the text.

    Plan: ONE pass — map-side shingle hashing (codegen md5) feeds a
    single (source, doc_id, shingle) explode aggregated once with
    count + two count-distincts (Catalyst expands to a single
    shuffled aggregate). An earlier two-branch formulation (totals
    join distincts) recomputed the md5 lineage per branch and ran
    71 s at sf0.1; this shape runs in seconds. The exact distinct is
    the honest corpus-scale shuffle (the sketch path for when 100 TB
    makes it too hot is daily_distinct_users_hll's HLL pattern)."""
    from goe_spark.queries.dedup import _shingle_hashed

    sh = _shingle_hashed(spark, sf_dir)
    # explode_OUTER + manual null drop, NOT plain explode: explode
    # makes Catalyst infer `size(sh) > 0` and push that filter below
    # the parallelizing repartition, inlining the md5 shingle lineage
    # into a single-task filter (the cross_lang_shingle_leakage
    # gotcha — 55 s vs 3 s at sf0.1, re-measured here).
    posts = sh.select(
        "source", "doc_id", F.explode_outer("sh").alias("t")
    ).where(F.col("t").isNotNull())
    agg = posts.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_trigrams"),
        F.countDistinct("t").alias("n_distinct"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_trigrams",
        "n_distinct",
        F.round(F.col("n_distinct") / F.col("n_trigrams"), 6).alias(
            "diversity"
        ),
    )


def _ngram_diversity_sql() -> str:
    from goe_spark.queries.dedup import _shingle_hashed_sql

    return f"""
WITH sh AS ({_shingle_hashed_sql()}),
posts AS (
  SELECT source, doc_id, unnest(sh) AS t FROM sh
)
SELECT source,
       count(DISTINCT doc_id) AS n_docs,
       count(*)               AS n_trigrams,
       count(DISTINCT t)      AS n_distinct,
       round(count(DISTINCT t) / (1.0 * count(*)), 6) AS diversity
FROM posts GROUP BY source
"""


def classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast linear quality-classifier inference over the corpus —
    the model-scoring stage (fastText/logistic quality classifier)
    every production curation pipeline runs after rule filters:
    per-document logit = bias + mean weight of hashed unigrams, with
    the fixed-point weight vector shipped inside the plan
    (functions/classifier.py). Per-language report: docs, keeps
    (logit > 0), strong keeps (> 500 milli), exact logit sum and
    min/max, mean logit.

    Plan: ZERO joins and zero explodes — scoring is a per-row codegen
    aggregate() fold over the token array against the plan-literal
    weight array (the broadcast-small-model pattern); the only
    shuffle is the lang-grain rollup. Integer milli-unit logits make
    the DuckDB replay bit-identical. At 100 TB this is one corpus
    scan, embarrassingly parallel."""
    from goe_spark.functions.classifier import classifier_logit_milli

    d = load_table(spark, sf_dir, "documents")
    per = d.select(
        "lang", classifier_logit_milli(F.col("text")).alias("logit")
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("logit") > 0).cast("long")).alias("n_keep"),
        F.sum((F.col("logit") > 500).cast("long")).alias("n_strong"),
        F.sum("logit").alias("sum_logit_milli"),
        F.min("logit").alias("min_logit_milli"),
        F.max("logit").alias("max_logit_milli"),
        F.round(F.avg("logit"), 4).alias("avg_logit_milli"),
    )


def _classifier_sql() -> str:
    from goe_spark.functions.classifier import classifier_logit_milli_sql

    return f"""
WITH per AS (
  SELECT lang, {classifier_logit_milli_sql('text')} AS logit
  FROM documents
)
SELECT lang,
       count(*) AS n_docs,
       cast(sum(CASE WHEN logit > 0 THEN 1 ELSE 0 END) AS bigint) AS n_keep,
       cast(sum(CASE WHEN logit > 500 THEN 1 ELSE 0 END) AS bigint)
         AS n_strong,
       cast(sum(logit) AS bigint) AS sum_logit_milli,
       min(logit) AS min_logit_milli,
       max(logit) AS max_logit_milli,
       round(avg(logit), 4) AS avg_logit_milli
FROM per GROUP BY lang
"""


# Hygiene defect classes + the scrub expression live in
# functions/text.py (shared with the curation HYGIENE_SCRUB stage).
_CTRL_JAVA = T.CTRL_JAVA
_CTRL_RE2 = T.CTRL_RE2
_ZW_JAVA = T.ZW_JAVA
_ZW_RE2 = T.ZW_RE2


def text_hygiene_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-hygiene screen — the pre-tokenizer scrub every web
    pipeline runs: control characters (broken extraction), U+FFFD
    (encoding damage), zero-width characters (spam/homoglyph
    carriers), run-on whitespace, and non-ASCII share, plus the
    character mass a scrub pass would remove. The fixture corpus is
    clean ASCII, so defects are INJECTED deterministically from
    doc_id (the media-fixture convention) and detected back purely
    from the dirty string — the detection/scrub expressions are the
    operator; the injection is the fixture.

    Plan: single scan, all codegen regexp arithmetic, one
    source-grain aggregate. At 100 TB: map-side only."""
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    dirty = F.concat(
        F.col("text"),
        F.when(did % 7 == 0, F.lit("\u0007")).otherwise(F.lit("")),
        F.when(did % 11 == 0, F.lit("broken \uFFFD char")).otherwise(
            F.lit("")
        ),
        F.when(did % 13 == 0, F.lit("zero\u200Bwidth")).otherwise(F.lit("")),
        F.when(did % 5 == 0, F.lit("  doubled  spaces")).otherwise(
            F.lit("")
        ),
        F.when(did % 17 == 0, F.lit(" caf\u00E9")).otherwise(F.lit("")),
    )
    scrubbed = T.hygiene_scrub(dirty)
    per = d.select(
        "source",
        dirty.alias("t"),
        (F.length(dirty) - F.length(scrubbed)).cast("long").alias("removed"),
    ).select(
        "source",
        "removed",
        F.col("t").rlike(_CTRL_JAVA).cast("long").alias("has_ctrl"),
        F.col("t").rlike("\\uFFFD").cast("long").alias("has_fffd"),
        F.col("t").rlike(_ZW_JAVA).cast("long").alias("has_zw"),
        F.col("t").rlike(" {2,}").cast("long").alias("has_msp"),
        F.col("t").rlike("[^\\x00-\\x7F]").cast("long").alias("has_na"),
    )
    clean = (
        (F.col("has_ctrl") + F.col("has_fffd") + F.col("has_zw")
         + F.col("has_msp") + F.col("has_na")) == 0
    ).cast("long")
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("has_ctrl").alias("n_ctrl"),
        F.sum("has_fffd").alias("n_replacement"),
        F.sum("has_zw").alias("n_zero_width"),
        F.sum("has_msp").alias("n_multispace"),
        F.sum("has_na").alias("n_nonascii"),
        F.sum(clean).alias("n_clean"),
        F.sum("removed").alias("chars_scrubbed"),
    )


def _hygiene_sql() -> str:
    return f"""
WITH dirty AS (
  SELECT source,
         concat(text,
           CASE WHEN doc_id % 7 = 0 THEN chr(7) ELSE '' END,
           CASE WHEN doc_id % 11 = 0
                THEN 'broken ' || chr(65533) || ' char' ELSE '' END,
           CASE WHEN doc_id % 13 = 0
                THEN 'zero' || chr(8203) || 'width' ELSE '' END,
           CASE WHEN doc_id % 5 = 0 THEN '  doubled  spaces' ELSE '' END,
           CASE WHEN doc_id % 17 = 0 THEN ' caf' || chr(233) ELSE '' END
         ) AS t
  FROM documents
), per AS (
  SELECT source,
         length(t) - length({T.hygiene_scrub_sql('t')}) AS removed,
         CASE WHEN regexp_matches(t, '{_CTRL_RE2}') THEN 1 ELSE 0 END
           AS has_ctrl,
         CASE WHEN regexp_matches(t, '\\x{{FFFD}}') THEN 1 ELSE 0 END
           AS has_fffd,
         CASE WHEN regexp_matches(t, '{_ZW_RE2}') THEN 1 ELSE 0 END
           AS has_zw,
         CASE WHEN regexp_matches(t, ' {{2,}}') THEN 1 ELSE 0 END
           AS has_msp,
         CASE WHEN regexp_matches(t, '[^\\x00-\\x7F]') THEN 1 ELSE 0 END
           AS has_na
  FROM dirty
)
SELECT source,
       count(*) AS n_docs,
       cast(sum(has_ctrl) AS bigint) AS n_ctrl,
       cast(sum(has_fffd) AS bigint) AS n_replacement,
       cast(sum(has_zw) AS bigint) AS n_zero_width,
       cast(sum(has_msp) AS bigint) AS n_multispace,
       cast(sum(has_na) AS bigint) AS n_nonascii,
       cast(sum(CASE WHEN has_ctrl + has_fffd + has_zw + has_msp + has_na
                     = 0 THEN 1 ELSE 0 END) AS bigint) AS n_clean,
       cast(sum(removed) AS bigint) AS chars_scrubbed
FROM per GROUP BY source
"""


def classifier_calibration_bins(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Classifier-threshold calibration — the report a curator reads
    before setting classifier_min_logit_milli (the CLASSIFIER_FILTER
    stage's cut): documents binned by the model's fixed-point logit
    (200-milli bins, clamped to ±5) and crossed with the two signals
    a threshold should align with — the heuristic quality score and
    the exact-duplicate mass. A model whose low-logit bins do NOT
    hold the dups/low-quality tail is mis-calibrated for this corpus.

    Plan: the logit is the same zero-join aggregate() fold as
    classifier_scores; the dup signal reuses the fingerprint-spread
    shuffle (hashes move, text never does); the rollup is <= 11
    bins."""
    from goe_spark.functions.classifier import classifier_logit_milli

    d = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    docs = d.select(
        classifier_logit_milli(F.col("text")).alias("logit"),
        T.quality_score("text").alias("q"),
        hash64(norm).alias("fp"),
        T.token_count("text").alias("n_tokens"),
    )
    spread = docs.groupBy("fp").agg(F.count(F.lit(1)).alias("n_occ"))
    binned = docs.join(spread, "fp").select(
        F.least(
            F.lit(5),
            F.greatest(
                F.lit(-5),
                F.floor(F.col("logit") / 200.0).cast("int"),
            ),
        ).cast("int").alias("cls_bin"),
        "q",
        "n_tokens",
        (F.col("n_occ") > 1).cast("long").alias("is_dup"),
    )
    return binned.groupBy("cls_bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_dup").alias("n_dup_docs"),
        F.floor(F.sum("is_dup") * 10000.0 / F.count(F.lit(1)))
        .cast("long")
        .alias("dup_per_10k"),
        F.round(F.avg("q"), 4).alias("avg_quality"),
        F.sum("n_tokens").alias("token_mass"),
        F.floor(F.sum("n_tokens") / F.count(F.lit(1)))
        .cast("long")
        .alias("mean_tokens"),
    )


def _classifier_calibration_sql() -> str:
    from goe_spark.functions.classifier import classifier_logit_milli_sql

    return f"""
WITH docs AS (
  SELECT {classifier_logit_milli_sql('text')} AS logit,
         {T.quality_score_sql('text')} AS q,
         {hash64_sql(_NORM_SQL)} AS fp,
         {T.token_count_sql('text')} AS n_tokens
  FROM documents
), spread AS (
  SELECT fp, count(*) AS n_occ FROM docs GROUP BY fp
), binned AS (
  SELECT cast(least(5, greatest(-5, floor(logit / 200.0))) AS int)
           AS cls_bin,
         q, n_tokens,
         CASE WHEN n_occ > 1 THEN 1 ELSE 0 END AS is_dup
  FROM docs JOIN spread USING (fp)
)
SELECT cls_bin,
       count(*) AS n_docs,
       cast(sum(is_dup) AS bigint) AS n_dup_docs,
       cast(floor(sum(is_dup) * 10000.0 / count(*)) AS bigint)
         AS dup_per_10k,
       round(avg(q), 4) AS avg_quality,
       cast(sum(n_tokens) AS bigint) AS token_mass,
       cast(floor(sum(n_tokens) / count(*)) AS bigint) AS mean_tokens
FROM binned GROUP BY cls_bin
"""


def classifier_threshold_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source classifier-threshold calibration — the equity move
    production pipelines make after scoring: one GLOBAL logit cutoff
    silently empties sources whose score distribution sits low (CCNet
    keeps per-segment thresholds for exactly this reason). Per source:
    exact logit quartiles (the p50 IS the per-source threshold for a
    50% keep rate) and the keep rate a global zero-cutoff would
    actually give that source, per 10k — the spread of that column
    across sources is the inequity a per-source threshold removes.

    Plan: one scoring pass (plan-literal weights, zero joins), one
    source-grain exact-percentile aggregate (groups are catalog-
    bounded; at 100 TB swap approx_percentile as order_value_
    percentiles documents)."""
    from goe_spark.functions.classifier import classifier_logit_milli

    d = load_table(spark, sf_dir, "documents")
    per = d.select(
        "source", classifier_logit_milli(F.col("text")).alias("logit")
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.percentile("logit", F.lit(0.25)), 2).alias("p25"),
        F.round(F.percentile("logit", F.lit(0.5)), 2).alias(
            "threshold_keep50"
        ),
        F.round(F.percentile("logit", F.lit(0.75)), 2).alias("p75"),
        F.min("logit").alias("min_logit"),
        F.max("logit").alias("max_logit"),
        F.floor(
            F.sum((F.col("logit") > 0).cast("long")) * 10000
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("keep_at_zero_per_10k"),
    )


def _classifier_threshold_sql() -> str:
    from goe_spark.functions.classifier import classifier_logit_milli_sql

    return f"""
WITH per AS (
  SELECT source, {classifier_logit_milli_sql('text')} AS logit
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       round(quantile_cont(logit, 0.25), 2) AS p25,
       round(quantile_cont(logit, 0.5), 2) AS threshold_keep50,
       round(quantile_cont(logit, 0.75), 2) AS p75,
       min(logit) AS min_logit,
       max(logit) AS max_logit,
       cast(floor(sum(CASE WHEN logit > 0 THEN 1 ELSE 0 END) * 10000
                  / (1.0 * count(*))) AS bigint)
         AS keep_at_zero_per_10k
FROM per GROUP BY source
"""


def html_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text extraction — the stage that precedes EVERYTHING in
    a web-crawl pipeline (trafilatura/jusText reduced to its
    deterministic regex core): drop boilerplate ELEMENTS (nav, footer,
    ad divs) wholesale, strip remaining tags, unescape the common
    entities, collapse whitespace. The corpus ships plain text, so the
    docs are first wrapped in a deterministic spec-true HTML shell
    (title/nav/optional ad block/p-wrapped body/footer — build columns
    never reach the extractor, which sees ONLY the html column); the
    EXTRACTION chain is the operator. Per source: docs, html bytes,
    extracted bytes, extraction yield per 10k bytes, boilerplate
    removed, ad-bearing docs, and docs whose extracted text round-trips
    the original exactly (the correctness anchor: a lossless extractor
    must recover the body it was handed).

    Plan: synthesis + extraction are ONE projection of codegen
    regexp_replace chains (no UDF, no shuffle before the source
    rollup); at 100 TB this is the classic map-only pass."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    did = F.col("doc_id")
    # Entities: the body escapes & < > like a real serializer would.
    body = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), "&", "&amp;"), "<", "&lt;"
        ),
        ">",
        "&gt;",
    )
    ad = F.when(
        did % 3 == 0,
        F.lit('<div class="ad">SPONSORED buy now limited offer</div>'),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        did.cast("string"),
        F.lit("</title></head><body><nav>home | about | contact</nav>"),
        ad,
        F.lit("<p>"),
        body,
        F.lit("</p><footer>(c) example.com · terms · privacy</footer>"),
        F.lit("</body></html>"),
    )
    page = d.select("source", "text", html.alias("html"))
    h = F.col("html")
    # explicit alternation, no backreference: the DuckDB twin runs on
    # RE2, which has no \1
    no_blocks = F.regexp_replace(
        h,
        r"(?s)<nav>.*?</nav>|<footer>.*?</footer>"
        r"|<script>.*?</script>|<style>.*?</style>"
        r'|<div class="ad">.*?</div>'
        r"|<head>.*?</head>",
        "",
    )
    no_tags = F.regexp_replace(no_blocks, r"<[^>]*>", " ")
    unescaped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(no_tags, "&lt;", "<"), "&gt;", ">"
        ),
        "&amp;",
        "&",
    )
    extracted = F.trim(F.regexp_replace(unescaped, r"\s+", " "))
    per = page.select(
        "source",
        F.length("html").cast("long").alias("html_bytes"),
        F.length(extracted).cast("long").alias("ext_bytes"),
        (extracted == F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
        .cast("long")
        .alias("roundtrip"),
        h.contains('<div class="ad">').cast("long").alias("has_ad"),
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("html_bytes").alias("html_bytes"),
        F.sum("ext_bytes").alias("extracted_bytes"),
        F.floor(F.sum("ext_bytes") * 10000 / F.sum("html_bytes"))
        .cast("long")
        .alias("yield_per_10k"),
        F.sum(F.col("html_bytes") - F.col("ext_bytes")).alias(
            "bytes_removed"
        ),
        F.sum("has_ad").alias("n_with_ads"),
        F.sum("roundtrip").alias("n_roundtrip_exact"),
    )


def _html_extract_sql() -> str:
    return r"""
WITH page AS (
  SELECT source, text,
         '<html><head><title>Doc ' || doc_id
         || '</title></head><body><nav>home | about | contact</nav>'
         || CASE WHEN doc_id % 3 = 0
            THEN '<div class="ad">SPONSORED buy now limited offer</div>'
            ELSE '' END
         || '<p>'
         || replace(replace(replace(text, '&', '&amp;'),
                            '<', '&lt;'), '>', '&gt;')
         || '</p><footer>(c) example.com · terms · privacy</footer>'
         || '</body></html>' AS html
  FROM documents
), ext AS (
  SELECT source, html, text,
         trim(regexp_replace(
           replace(replace(replace(
             regexp_replace(
               regexp_replace(html,
                 '(?s)<nav>.*?</nav>|<footer>.*?</footer>'
                 || '|<script>.*?</script>|<style>.*?</style>'
                 || '|<div class="ad">.*?</div>'
                 || '|<head>.*?</head>', '', 'g'),
               '<[^>]*>', ' ', 'g'),
             '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
           '\s+', ' ', 'g')) AS extracted
  FROM page
), per AS (
  SELECT source,
         length(html) AS html_bytes,
         length(extracted) AS ext_bytes,
         CASE WHEN extracted
                   = trim(regexp_replace(text, '\s+', ' ', 'g'))
              THEN 1 ELSE 0 END AS roundtrip,
         CASE WHEN contains(html, '<div class="ad">')
              THEN 1 ELSE 0 END AS has_ad
  FROM ext
)
SELECT source,
       count(*) AS n_docs,
       cast(sum(html_bytes) AS bigint) AS html_bytes,
       cast(sum(ext_bytes) AS bigint) AS extracted_bytes,
       cast(floor(sum(ext_bytes) * 10000 / (1.0 * sum(html_bytes)))
            AS bigint) AS yield_per_10k,
       cast(sum(html_bytes - ext_bytes) AS bigint) AS bytes_removed,
       cast(sum(has_ad) AS bigint) AS n_with_ads,
       cast(sum(roundtrip) AS bigint) AS n_roundtrip_exact
FROM per GROUP BY source
"""


QUERIES = [
    QuerySpec("sentiment_by_source", sentiment_by_source, _sentiment_sql()),
    QuerySpec(
        "classifier_calibration_bins",
        classifier_calibration_bins,
        _classifier_calibration_sql(),
        "classifier-logit bins vs quality + dup mass (threshold pick)",
    ),
    QuerySpec(
        "text_hygiene_audit",
        text_hygiene_audit,
        _hygiene_sql(),
        "unicode-hygiene screen: ctrl/U+FFFD/zero-width/whitespace",
    ),
    QuerySpec(
        "classifier_scores",
        classifier_scores,
        _classifier_sql(),
        "broadcast fixed-point linear quality-classifier inference",
    ),
    QuerySpec(
        "ngram_diversity_by_source",
        ngram_diversity_by_source,
        _ngram_diversity_sql(),
        "trigram type-token ratio per source (template/genai screen)",
    ),
    QuerySpec("tfidf_top_terms", tfidf_top_terms, TFIDF_SQL),
    QuerySpec("token_stats_by_lang", token_stats_by_lang, TOKEN_STATS_SQL),
    QuerySpec("bpe_token_stats", bpe_token_stats, BPE_TOKEN_SQL),
    QuerySpec("quality_scores_by_source", quality_scores_by_source, QUALITY_SQL),
    QuerySpec("lang_id_confusion", lang_id_confusion, _lang_id_sql()),
    QuerySpec("doc_fingerprints", doc_fingerprints, FINGERPRINT_SQL),
    QuerySpec("events_json_extract", events_json_extract, EVENTS_JSON_SQL),
    QuerySpec("repetition_doc_stats", repetition_doc_stats, REPETITION_SQL),
    QuerySpec("term_bigram_pmi", term_bigram_pmi, BIGRAM_PMI_SQL),
    QuerySpec(
        "unigram_logprob_scores", unigram_logprob_scores, UNIGRAM_LM_SQL
    ),
    QuerySpec(
        "perplexity_band_stats",
        perplexity_band_stats,
        PERPLEXITY_BAND_SQL,
        "CCNet head/middle/tail split at per-language logprob "
        "terciles",
    ),
    QuerySpec(
        "bigram_logprob_scores", bigram_logprob_scores, BIGRAM_LM_SQL
    ),
    QuerySpec(
        "token_entropy_by_source",
        token_entropy_by_source,
        TOKEN_ENTROPY_SQL,
        "per-source unigram Shannon entropy, fixed-point log mass",
    ),
    QuerySpec(
        "vocab_overlap_sources",
        vocab_overlap_sources,
        VOCAB_OVERLAP_SQL,
        "pairwise source vocabulary Jaccard via inverted index",
    ),
    QuerySpec(
        "zipf_slope_fit",
        zipf_slope_fit,
        ZIPF_SQL,
        "Zipf rank-frequency least-squares fit over the top-500 tokens",
    ),
    QuerySpec(
        "quality_calibration_bins",
        quality_calibration_bins,
        QUALITY_CALIBRATION_SQL,
        "quality-decile x exact-dup calibration for filter thresholds",
    ),
    QuerySpec(
        "unigram_kl_matrix",
        unigram_kl_matrix,
        UNIGRAM_KL_SQL,
        "pairwise source unigram KL divergence (domain-mix shift)",
    ),
    QuerySpec(
        "doc_quality_length_corr",
        doc_quality_length_corr,
        _quality_length_corr_sql(),
        "exact fixed-point Pearson r of quality vs length per source",
    ),
    QuerySpec(
        "quality_ks_drift",
        quality_ks_drift,
        _quality_ks_sql(),
        "exact pairwise KS drift between source quality distributions",
    ),
    QuerySpec(
        "positional_entropy_profile",
        positional_entropy_profile,
        POSITIONAL_ENTROPY_SQL,
        "token entropy by position (templated-prefix detector)",
    ),
    QuerySpec(
        "html_extract_stats",
        html_extract_stats,
        _html_extract_sql(),
        "HTML boilerplate-block removal + tag strip + entity unescape",
    ),
    QuerySpec(
        "classifier_threshold_by_source",
        classifier_threshold_by_source,
        _classifier_threshold_sql(),
        "per-source classifier threshold calibration (CCNet-style)",
    ),
]
