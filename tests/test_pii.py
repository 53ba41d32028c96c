"""PII detection/redaction and the Gopher-style rule filter.

The registry queries are oracle-checked by test_queries_oracle; these
tests pin the regex semantics on handcrafted strings (the fixture
corpus is PII-free, so the registry path exercises only the injected
augmentation) and the filter rules' edge behavior.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goe_spark.queries.pii import (
    EMAIL_RE,
    IPV4_RE,
    MIN_STOP_DISTINCT,
    MIN_WORDS,
    PHONE_RE,
    PII_KINDS,
    augmented_text,
    pii_count,
    redact_pii,
)
from tests.conftest import SF_SMALL

CASES = [
    # (text, n_email, n_phone, n_ip)
    ("mail me at jane.doe+spam@corp.example.org today", 1, 0, 0),
    ("two mails a@b.co and c_d%e@f-g.io", 2, 0, 0),
    ("call 555-123-4567 or 555-000-9999", 0, 2, 0),
    ("host 192.168.0.1 and 10.0.255.7", 0, 0, 2),
    ("mixed: x@y.zz 111-222-3333 8.8.8.8", 1, 1, 1),
    ("none here, just words and 12345 and a.b", 0, 0, 0),
    # phone boundary: embedded in a longer digit run must NOT match
    ("9555-123-45678", 0, 0, 0),
    # ip-ish but only three octets must NOT match
    ("version 1.2.3 released", 0, 0, 0),
]


def test_regex_counts_on_handcrafted_strings(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(CASES)], "id long, t string"
    )
    rows = {
        r.id: r
        for r in df.select(
            "id",
            pii_count("t", EMAIL_RE).alias("e"),
            pii_count("t", PHONE_RE).alias("p"),
            pii_count("t", IPV4_RE).alias("i"),
        ).collect()
    }
    for i, (t, e, p, ip) in enumerate(CASES):
        got = rows[i]
        assert (got.e, got.p, got.i) == (e, p, ip), t


def test_redaction_closes_and_placeholders_present(spark):
    df = spark.createDataFrame(
        [(t,) for t, *_ in CASES], "t string"
    ).withColumn("red", redact_pii(F.col("t")))
    out = df.agg(
        F.sum(
            sum(pii_count("red", pat) for _, pat, _ in PII_KINDS)
        ).alias("resid"),
        F.sum(F.col("red").contains("[EMAIL]").cast("long")).alias("ne"),
        F.sum(F.col("red").contains("[PHONE]").cast("long")).alias("np"),
        F.sum(F.col("red").contains("[IP]").cast("long")).alias("ni"),
    ).collect()[0]
    assert out.resid == 0
    assert out.ne == 3 and out.np == 2 and out.ni == 2


def test_augmentation_hits_expected_moduli(spark):
    from goe_spark.catalog import load_table

    d = load_table(spark, SF_SMALL, "documents").withColumn(
        "aug", augmented_text()
    )
    chk = d.select(
        F.sum(
            (
                (F.col("doc_id") % 7 == 0)
                != (pii_count("aug", EMAIL_RE) > 0)
            ).cast("long")
        ).alias("email_mismatch"),
        F.sum(
            (
                (F.col("doc_id") % 11 == 0)
                != (pii_count("aug", PHONE_RE) > 0)
            ).cast("long")
        ).alias("phone_mismatch"),
        F.sum(
            (
                (F.col("doc_id") % 13 == 0)
                != (pii_count("aug", IPV4_RE) > 0)
            ).cast("long")
        ).alias("ip_mismatch"),
    ).collect()[0]
    assert (chk.email_mismatch, chk.phone_mismatch, chk.ip_mismatch) == (
        0,
        0,
        0,
    )


def test_gopher_filter_rule_edges(spark):
    """Rule edge cases: a doc exactly at MIN_WORDS with stopwords and
    alpha tokens survives; short/stopword-free/symbol docs fail the
    right rule."""
    from goe_spark.queries import pii as P

    good = " ".join(["the", "of"] + ["word"] * (MIN_WORDS - 2))
    short = "the of word"
    no_stop = " ".join(["word"] * MIN_WORDS)
    symbols = " ".join(["the", "of"] + ["@@@@"] * (MIN_WORDS - 2))
    df = spark.createDataFrame(
        [
            (0, good, "en"),
            (1, short, "en"),
            (2, no_stop, "en"),
            (3, symbols, "en"),
        ],
        "doc_id long, text string, lang string",
    )
    import goe_spark.catalog as cat

    orig = cat.load_table
    try:
        cat.load_table = lambda s, sf, name: df  # noqa: ARG005
        # patch the module-level import used inside the query fn
        P.load_table = cat.load_table
        out = {r.lang: r for r in P.gopher_quality_filter(spark, SF_SMALL).collect()}
    finally:
        cat.load_table = orig
        P.load_table = orig
    en = out["en"]
    assert en.n_docs == 4
    assert en.fail_word_count == 1  # `short`
    assert en.fail_stopwords == 1  # `no_stop`
    assert en.fail_alpha_frac >= 1  # `symbols`
    assert en.n_kept == 1  # only `good`


def test_stop_distinct_counts_distinct_not_total(spark):
    """'the the the of' has 2 DISTINCT required stopwords — the rule
    must count distinct overlap, not occurrences."""
    t = " ".join(["the"] * (MIN_WORDS - 1) + ["of"])
    df = spark.createDataFrame([(t,)], "text string")
    from goe_spark.functions import text as T

    got = df.select(
        F.size(
            F.array_intersect(
                T.tokens(F.col("text")),
                F.array(*[F.lit(w) for w in ("the", "of", "and", "to", "a")]),
            )
        ).alias("k")
    ).collect()[0].k
    assert got == MIN_STOP_DISTINCT


def test_cross_engine_regex_fuzz(spark, duck):
    """Seeded pseudo-random fuzz over a PII-shaped alphabet: Spark
    (Java regex) and DuckDB (RE2) must count identical matches for
    every pattern on every string — the portability contract the
    whole module rests on. One batch, one job."""
    import random

    from goe_spark.queries.pii import pii_count_sql

    rng = random.Random(20260814)
    alphabet = list("abcXY012345 .-@_%+()") + ["@example.com", "555-", ".org"]
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        for _ in range(200)
    ]
    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(cases)], "id long, t string")
    got_spark = {
        r.id: (r.e, r.p, r.i)
        for r in sdf.select(
            "id",
            pii_count("t", EMAIL_RE).alias("e"),
            pii_count("t", PHONE_RE).alias("p"),
            pii_count("t", IPV4_RE).alias("i"),
        ).collect()
    }
    duck.execute("CREATE OR REPLACE TEMP TABLE fuzz(id BIGINT, t VARCHAR)")
    duck.executemany("INSERT INTO fuzz VALUES (?, ?)", list(enumerate(cases)))
    got_duck = {
        row[0]: (row[1], row[2], row[3])
        for row in duck.execute(
            f"SELECT id, {pii_count_sql('t', EMAIL_RE)}, "
            f"{pii_count_sql('t', PHONE_RE)}, "
            f"{pii_count_sql('t', IPV4_RE)} FROM fuzz"
        ).fetchall()
    }
    assert got_spark == got_duck
