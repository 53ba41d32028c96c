"""PII scrubbing and rule-based quality filtering for training data.

Beyond-reference scope (BASELINE.json north star): the privacy-hygiene
and rule-filter passes every public pretraining pipeline runs (C4's
rule filters, Gopher's quality rules, Dolma/RefinedWeb PII scrubbing):

- pii_scan_by_source: detect emails / phone numbers / IPv4 addresses
  with portable regexes and report per-source incidence — the audit a
  pipeline runs BEFORE deciding to scrub.
- pii_redaction_audit: apply the redaction (match -> typed placeholder)
  and prove closure: residual match count on the redacted text is
  recomputed honestly and must be zero.
- gopher_quality_filter: per-document boolean rules (min/max words,
  mean token length bounds, stopword presence, alpha-word fraction)
  with per-rule violation accounting — the "what did each rule cost
  me" breakdown that makes a filter tunable.

Scale: everything here is a single corpus scan of built-in regexp /
array expressions — whole-stage codegen, no Python, no UDFs; the only
shuffle is the final small-cardinality group-by. At 100 TB these ops
are scan-bound, which is the correct floor for a filter pass.

Determinism note: the synthetic fixture corpus contains no PII (it is
digit-free word soup), so the scan/redaction queries would degenerate
to all-zero counts. Both engines therefore AUGMENT the text with
deterministically injected PII derived from doc_id (same closed form
in Spark and the DuckDB oracle) — the regex machinery is exercised for
real and the cross-engine hash comparison stays meaningful. The
augmentation expression is separate from the detection/redaction
builders, which operate on any text column.

Regex portability: patterns restricted to the Java-regex ∩ RE2 subset
(\\d, \\b, bounded quantifiers, non-capturing groups) so Spark and
DuckDB compile the same language.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.catalog import load_table
from goe_spark.functions import text as T
from goe_spark.queries import QuerySpec

# --------------------------------------------------------------------
# Portable PII patterns (Java regex ∩ RE2).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b(?:\d{1,3}\.)(?:\d{1,3}\.)(?:\d{1,3}\.)\d{1,3}\b"

PII_KINDS = (
    ("email", EMAIL_RE, "[EMAIL]"),
    ("phone", PHONE_RE, "[PHONE]"),
    ("ip", IPV4_RE, "[IP]"),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_count(col: Column | str, pattern: str) -> Column:
    return F.regexp_count(_c(col), F.lit(pattern)).cast("long")


def pii_count_sql(expr: str, pattern: str) -> str:
    return f"len(regexp_extract_all({expr}, '{pattern}'))"


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its typed placeholder. Order is
    fixed (email, phone, ip) and the patterns are disjoint on any
    input (an email never parses as a phone/IP and vice versa), so
    the chain is order-insensitive in effect."""
    out = _c(col)
    for _, pat, repl in PII_KINDS:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_pii_sql(expr: str) -> str:
    out = expr
    for _, pat, repl in PII_KINDS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


# --------------------------------------------------------------------
# Deterministic PII injection: the fixture corpus is PII-free, so both
# engines append the same doc_id-derived contact line to a subset of
# documents. Moduli are coprime so the email/phone/ip subsets overlap
# in all combinations.
def augmented_text() -> Column:
    did = F.col("doc_id")
    email = F.when(
        did % 7 == 0,
        F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 11 == 0,
        F.concat(
            F.lit(" call 555-"),
            F.lpad((did % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((did % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 13 == 0,
        F.concat(
            F.lit(" from 10."),
            (did % 256).cast("string"),
            F.lit("."),
            ((did * 7) % 256).cast("string"),
            F.lit("."),
            (did % 100).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(F.col("text"), email, phone, ip)


AUGMENTED_TEXT_SQL = """(text
  || CASE WHEN doc_id % 7 = 0
          THEN ' contact user' || cast(doc_id AS varchar) || '@example.com'
          ELSE '' END
  || CASE WHEN doc_id % 11 = 0
          THEN ' call 555-' || lpad(cast(doc_id % 1000 AS varchar), 3, '0')
               || '-' || lpad(cast(doc_id % 10000 AS varchar), 4, '0')
          ELSE '' END
  || CASE WHEN doc_id % 13 = 0
          THEN ' from 10.' || cast(doc_id % 256 AS varchar)
               || '.' || cast((doc_id * 7) % 256 AS varchar)
               || '.' || cast(doc_id % 100 AS varchar)
          ELSE '' END)"""


def pii_scan_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII incidence audit: how many documents carry each
    PII kind and the total match counts. One scan, codegen'd regexes,
    one source-cardinality shuffle."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "aug", augmented_text()
    )
    counts = {k: pii_count("aug", pat) for k, pat, _ in PII_KINDS}
    any_pii = sum((counts[k] > 0).cast("long") for k in counts) > 0
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(any_pii.cast("long")).alias("docs_with_pii"),
        F.sum(counts["email"]).alias("n_emails"),
        F.sum(counts["phone"]).alias("n_phones"),
        F.sum(counts["ip"]).alias("n_ips"),
    )


def _scan_sql() -> str:
    e = pii_count_sql("aug", EMAIL_RE)
    p = pii_count_sql("aug", PHONE_RE)
    i = pii_count_sql("aug", IPV4_RE)
    return f"""
WITH aug AS (
  SELECT source, {AUGMENTED_TEXT_SQL} AS aug FROM documents
)
SELECT source,
       count(*) AS n_docs,
       cast(sum(CASE WHEN {e} + {p} + {i} > 0 THEN 1 ELSE 0 END) AS bigint)
         AS docs_with_pii,
       cast(sum({e}) AS bigint) AS n_emails,
       cast(sum({p}) AS bigint) AS n_phones,
       cast(sum({i}) AS bigint) AS n_ips
FROM aug GROUP BY source
"""


def pii_redaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply redaction and prove closure per source: docs changed,
    net character delta, and the RESIDUAL match count recomputed on
    the redacted text (must be zero — computed, not assumed)."""
    d = (
        load_table(spark, sf_dir, "documents")
        .withColumn("aug", augmented_text())
        .withColumn("red", redact_pii(F.col("aug")))
    )
    residual = sum(pii_count("red", pat) for _, pat, _ in PII_KINDS)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("aug") != F.col("red")).cast("long")).alias(
            "docs_redacted"
        ),
        F.sum(F.length("aug") - F.length("red")).alias("chars_removed"),
        F.sum(residual).alias("residual_matches"),
    )


def _redact_sql() -> str:
    red = redact_pii_sql("aug")
    resid = " + ".join(
        pii_count_sql("red", pat) for _, pat, _ in PII_KINDS
    )
    return f"""
WITH aug AS (
  SELECT source, {AUGMENTED_TEXT_SQL} AS aug FROM documents
), redacted AS (
  SELECT source, aug, {red} AS red FROM aug
)
SELECT source,
       count(*) AS n_docs,
       cast(sum(CASE WHEN aug <> red THEN 1 ELSE 0 END) AS bigint)
         AS docs_redacted,
       cast(sum(length(aug) - length(red)) AS bigint) AS chars_removed,
       cast(sum({resid}) AS bigint) AS residual_matches
FROM redacted GROUP BY source
"""


# --------------------------------------------------------------------
# Gopher-style rule filter (public: Rae et al. 2021 §A1.1 — the rule
# SHAPE; thresholds retuned to this fixture's word-soup docs).
MIN_WORDS = 20
MAX_WORDS = 100_000
MIN_MEAN_TOK_LEN = 3.0
MAX_MEAN_TOK_LEN = 10.0
STOP_REQ_WORDS = ("the", "of", "and", "to", "a")
MIN_STOP_DISTINCT = 2
MIN_ALPHA_FRAC = 0.8


def gopher_rule_violations(
    col: Column | str, require_stopwords: bool = True
) -> dict[str, Column]:
    """Per-rule violation booleans. ``require_stopwords=False`` drops
    the (English-marker) stopword rule — the right setting for a
    multilingual pipeline; the per-language audit query keeps it on."""
    toks = T.tokens(_c(col))
    n = F.size(toks).cast("long")
    tot_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    mean_len = tot_len.cast("double") / F.greatest(n, F.lit(1)).cast("double")
    alpha = F.size(F.filter(toks, lambda t: t.rlike("^[A-Za-z]"))).cast(
        "double"
    ) / F.greatest(n, F.lit(1)).cast("double")
    out = {
        "word_count": (n < MIN_WORDS) | (n > MAX_WORDS),
        "mean_tok_len": (mean_len < MIN_MEAN_TOK_LEN)
        | (mean_len > MAX_MEAN_TOK_LEN),
        "alpha_frac": alpha < MIN_ALPHA_FRAC,
    }
    if require_stopwords:
        stop_distinct = F.size(
            F.array_intersect(
                toks, F.array(*[F.lit(w) for w in STOP_REQ_WORDS])
            )
        )
        out["stopwords"] = stop_distinct < MIN_STOP_DISTINCT
    return out


def gopher_keep(col: Column | str, require_stopwords: bool = True) -> Column:
    """True iff the document violates NO rule."""
    keep = F.lit(True)
    for viol in gopher_rule_violations(col, require_stopwords).values():
        keep = keep & ~viol
    return keep


def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based document filter with per-rule violation accounting,
    grouped per language: n_docs, one violation count per rule, and
    survivors (docs violating NO rule). A doc can violate several
    rules, so violation columns are not additive to n_docs - n_kept —
    that is the point of per-rule accounting."""
    d = load_table(spark, sf_dir, "documents")
    v = gopher_rule_violations(F.col("text"))
    f_words = v["word_count"]
    f_mean = v["mean_tok_len"]
    f_stop = v["stopwords"]
    f_alpha = v["alpha_frac"]
    keep = ~(f_words | f_mean | f_stop | f_alpha)

    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(f_words.cast("long")).alias("fail_word_count"),
        F.sum(f_mean.cast("long")).alias("fail_mean_tok_len"),
        F.sum(f_stop.cast("long")).alias("fail_stopwords"),
        F.sum(f_alpha.cast("long")).alias("fail_alpha_frac"),
        F.sum(keep.cast("long")).alias("n_kept"),
    )


def _gopher_sql() -> str:
    toks = T.tokens_sql("text")
    stops = ", ".join(f"'{w}'" for w in STOP_REQ_WORDS)
    return f"""
WITH feats AS (
  SELECT lang,
         len({toks}) AS n,
         list_sum(list_transform({toks}, t -> length(t))) AS tot_len,
         len(list_intersect({toks}, [{stops}])) AS stop_distinct,
         len(list_filter({toks}, t -> regexp_matches(t, '^[A-Za-z]')))
           AS n_alpha
  FROM documents
), rules AS (
  SELECT lang,
         (n < {MIN_WORDS} OR n > {MAX_WORDS}) AS f_words,
         (tot_len / cast(greatest(n, 1) AS double) < {MIN_MEAN_TOK_LEN}
          OR tot_len / cast(greatest(n, 1) AS double) > {MAX_MEAN_TOK_LEN})
           AS f_mean,
         (stop_distinct < {MIN_STOP_DISTINCT}) AS f_stop,
         (n_alpha / cast(greatest(n, 1) AS double) < {MIN_ALPHA_FRAC})
           AS f_alpha
  FROM feats
)
SELECT lang,
       count(*) AS n_docs,
       cast(sum(CASE WHEN f_words THEN 1 ELSE 0 END) AS bigint)
         AS fail_word_count,
       cast(sum(CASE WHEN f_mean THEN 1 ELSE 0 END) AS bigint)
         AS fail_mean_tok_len,
       cast(sum(CASE WHEN f_stop THEN 1 ELSE 0 END) AS bigint)
         AS fail_stopwords,
       cast(sum(CASE WHEN f_alpha THEN 1 ELSE 0 END) AS bigint)
         AS fail_alpha_frac,
       cast(sum(CASE WHEN NOT (f_words OR f_mean OR f_stop OR f_alpha)
                THEN 1 ELSE 0 END) AS bigint) AS n_kept
FROM rules GROUP BY lang
"""


K_ANON_K = 5  # groups smaller than this are re-identification risks
K_ANON_LEN_BUCKET = 200  # chars per quasi-identifier length bucket


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the corpus's quasi-identifiers — the
    privacy review step release pipelines run next to PII scrubbing
    (public method: Sweeney 2002). Quasi-identifier = (lang, source,
    length bucket); a document in a group smaller than K remains
    re-identifiable even with direct identifiers redacted. Reports
    per lang: group count, docs in sub-K groups, the smallest group,
    and the risk fraction.

    Plan (100 TB): one scan, ONE group-grain aggregate (the QI tuple
    is map-side arithmetic), then a lang-cardinality rollup of the
    group table — group cardinality is bounded by
    |langs|x|sources|x|len buckets|, tiny at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    qi = d.select(
        "lang",
        "source",
        F.floor(F.length("text") / K_ANON_LEN_BUCKET).alias("len_bucket"),
    )
    groups = qi.groupBy("lang", "source", "len_bucket").agg(
        F.count(F.lit(1)).alias("k")
    )
    return groups.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("k").alias("n_docs"),
        F.min("k").alias("min_group_size"),
        F.sum(F.when(F.col("k") < K_ANON_K, F.col("k")).otherwise(0)).alias(
            "n_docs_at_risk"
        ),
        F.sum((F.col("k") < K_ANON_K).cast("long")).alias("n_small_groups"),
        F.round(
            (
                F.sum(
                    F.when(F.col("k") < K_ANON_K, F.col("k")).otherwise(0)
                )
                / F.sum("k")
            ).cast("double"),
            6,
        ).alias("risk_frac"),
    )


K_ANON_SQL = f"""
WITH groups AS (
  SELECT lang, source,
         floor(length(text) / {K_ANON_LEN_BUCKET}) AS len_bucket,
         count(*) AS k
  FROM documents
  GROUP BY 1, 2, 3
)
SELECT lang,
       count(*)                                        AS n_groups,
       cast(sum(k) AS bigint)                          AS n_docs,
       min(k)                                          AS min_group_size,
       cast(sum(CASE WHEN k < {K_ANON_K} THEN k ELSE 0 END) AS bigint)
         AS n_docs_at_risk,
       cast(sum(CASE WHEN k < {K_ANON_K} THEN 1 ELSE 0 END) AS bigint)
         AS n_small_groups,
       round(sum(CASE WHEN k < {K_ANON_K} THEN k ELSE 0 END)
             / cast(sum(k) AS double), 6) AS risk_frac
FROM groups GROUP BY lang
"""


def pii_cooccurrence_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-kind co-occurrence per source — the re-identification-risk
    sharpener on top of pii_scan_by_source: one PII kind in a doc is
    a contact detail, MULTIPLE kinds together (email + phone + IP) is
    a linkable identity record, the thing takedown/k-anonymity policy
    actually triggers on. Per source: docs by number of distinct PII
    kinds present (0/1/2/3) and the count of each pairwise
    combination.

    Plan: the same single codegen-regex scan as the PII battery; one
    source-cardinality aggregate. Counts are exact integers."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "aug", augmented_text()
    )
    has = {
        k: (pii_count("aug", pat) > 0).cast("int")
        for k, pat, _ in PII_KINDS
    }
    nkinds = sum(has.values())
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((nkinds == 0).cast("long")).alias("n_zero"),
        F.sum((nkinds == 1).cast("long")).alias("n_one"),
        F.sum((nkinds == 2).cast("long")).alias("n_two"),
        F.sum((nkinds == 3).cast("long")).alias("n_three"),
        F.sum((has["email"] * has["phone"]).cast("long")).alias(
            "n_email_phone"
        ),
        F.sum((has["email"] * has["ip"]).cast("long")).alias("n_email_ip"),
        F.sum((has["phone"] * has["ip"]).cast("long")).alias("n_phone_ip"),
    )


def _cooccurrence_sql() -> str:
    e = f"(CASE WHEN {pii_count_sql('aug', EMAIL_RE)} > 0 THEN 1 ELSE 0 END)"
    p = f"(CASE WHEN {pii_count_sql('aug', PHONE_RE)} > 0 THEN 1 ELSE 0 END)"
    i = f"(CASE WHEN {pii_count_sql('aug', IPV4_RE)} > 0 THEN 1 ELSE 0 END)"
    nk = f"({e} + {p} + {i})"
    return f"""
WITH aug AS (
  SELECT source, {AUGMENTED_TEXT_SQL} AS aug FROM documents
)
SELECT source,
       count(*) AS n_docs,
       cast(sum(CASE WHEN {nk} = 0 THEN 1 ELSE 0 END) AS bigint) AS n_zero,
       cast(sum(CASE WHEN {nk} = 1 THEN 1 ELSE 0 END) AS bigint) AS n_one,
       cast(sum(CASE WHEN {nk} = 2 THEN 1 ELSE 0 END) AS bigint) AS n_two,
       cast(sum(CASE WHEN {nk} = 3 THEN 1 ELSE 0 END) AS bigint) AS n_three,
       cast(sum({e} * {p}) AS bigint) AS n_email_phone,
       cast(sum({e} * {i}) AS bigint) AS n_email_ip,
       cast(sum({p} * {i}) AS bigint) AS n_phone_ip
FROM aug GROUP BY source
"""


QUERIES = [
    QuerySpec("pii_scan_by_source", pii_scan_by_source, _scan_sql()),
    QuerySpec("pii_redaction_audit", pii_redaction_audit, _redact_sql()),
    QuerySpec("gopher_quality_filter", gopher_quality_filter, _gopher_sql()),
    QuerySpec(
        "k_anonymity_audit",
        k_anonymity_audit,
        K_ANON_SQL,
        "quasi-identifier k-anonymity risk audit",
    ),
    QuerySpec(
        "pii_cooccurrence_audit",
        pii_cooccurrence_audit,
        _cooccurrence_sql(),
        "multi-kind PII co-occurrence (linkable-identity risk)",
    ),
]
