"""Deduplication operators over the documents table.

Beyond-reference scope (BASELINE.json north star). Scale notes:

- exact dedup: hash-groupBy on a 60-bit content fingerprint — one
  shuffle of (fp, doc_id), never the text payload. At 100 TB the
  shuffle carries ~16 bytes/row.
- n-gram Jaccard: shingle → explode → self-join *within buckets*
  (lang, source) so the candidate space is bucket-local, then
  intersection/union counting. The bucket key bounds the join.
- MinHash-LSH and SimHash live here too (added in
  minhash_lsh_candidates / simhash_by_lang): signatures are computed
  with cross-engine md5-derived hashes so DuckDB can verify them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.catalog import load_table
from goe_spark.functions.hashing import hash64, hash64_sql
from goe_spark.queries import QuerySpec


def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, keep-first semantics: survivors are rows whose
    doc_id is the min within their content-fingerprint group.
    Implemented as a window-min (one shuffle on fp); at scale this
    beats a groupBy+join because the payload never moves twice."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    fp = hash64(norm).alias("fp")
    w = Window.partitionBy("fp")
    survivors = (
        d.select("doc_id", "lang", fp)
        .withColumn("keep_id", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("keep_id"))
    )
    return survivors.groupBy("lang").agg(
        F.count(F.lit(1)).alias("survivors"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


_NORM_SQL = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"

DEDUP_EXACT_SQL = f"""
WITH fps AS (
  SELECT doc_id, lang,
         {hash64_sql(_NORM_SQL)} AS fp
  FROM documents
), keep AS (
  SELECT doc_id, lang, min(doc_id) OVER (PARTITION BY fp) AS keep_id FROM fps
)
SELECT lang, count(*) AS survivors, min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM keep WHERE doc_id = keep_id
GROUP BY lang
"""


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word 3-gram Jaccard near-dup: shingle each doc, explode, and
    count per-pair common shingles via a bucket-local self-join;
    Jaccard = |∩| / (|A| + |B| - |∩|). Buckets are (lang, source) so
    the quadratic term is bounded per bucket — at 100 TB the bucket
    key would be an LSH band (see minhash_lsh_candidates), same plan.

    Output: doc pairs with jaccard >= 0.1 (id1 < id2).
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    toks = F.split(F.trim(F.col("text")), r"\s+")
    shingled = d.select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2),
                    F.element_at(toks, i + 3),
                ),
            )
        ).alias("shingles"),
    ).where(F.size(toks) >= 3)
    sizes = shingled.select(
        "doc_id", "lang", "source", F.size("shingles").cast("long").alias("n_sh")
    )
    # Group key is the shingle *hash* (xxhash64, internal only):
    # 8 bytes through the shuffle instead of the string.
    exploded = shingled.select(
        "doc_id",
        "lang",
        "source",
        F.explode(
            F.transform(F.col("shingles"), lambda s: F.xxhash64(s))
        ).alias("sh"),
    )
    # Instead of a self-join of two exploded tables (quadratic shuffle
    # on both sides), group doc_ids per (bucket, shingle) and emit the
    # i<j pairs in-group: one shuffle in, pair rows out.
    grouped = exploded.groupBy("lang", "source", "sh").agg(
        F.sort_array(F.collect_set("doc_id")).alias("ids")
    )
    n = F.size("ids")
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, n - i - 1),
                lambda y: F.struct(x.alias("id1"), y.alias("id2")),
            ),
        )
    )
    common = (
        grouped.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.id1").alias("id1"), F.col("p.id2").alias("id2"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id1"), F.col("n_sh").alias("n1"))
    sb = sizes.select(F.col("doc_id").alias("id2"), F.col("n_sh").alias("n2"))
    return (
        common.join(sa, "id1")
        .join(sb, "id2")
        .select(
            "id1",
            "id2",
            F.round(
                F.col("n_common")
                / (F.col("n1") + F.col("n2") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.1)
    )


NGRAM_JACCARD_SQL = """
WITH toks AS (
  SELECT doc_id, lang, source, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents
), shingled AS (
  SELECT doc_id, lang, source,
         list_distinct(list_transform(range(len(t) - 2),
             i -> concat(t[i+1], ' ', t[i+2], ' ', t[i+3]))) AS shingles
  FROM toks WHERE len(t) >= 3
), sizes AS (
  SELECT doc_id, len(shingles) AS n_sh FROM shingled
), exploded AS (
  SELECT doc_id, lang, source, unnest(shingles) AS sh FROM shingled
), common AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_common
  FROM exploded a JOIN exploded b
    ON a.lang = b.lang AND a.source = b.source AND a.sh = b.sh
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id1, id2,
       round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = id1
JOIN sizes sb ON sb.doc_id = id2
WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.1
"""


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id, lang, source + distinct word 3-gram shingles."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2),
                    F.element_at(toks, i + 3),
                ),
            )
        ).alias("shingles"),
    ).where(F.size(toks) >= 3)


_SHINGLED_SQL = r"""
  SELECT doc_id, lang, source,
         list_distinct(list_transform(range(len(t) - 2),
             i -> concat(t[i+1], ' ', t[i+2], ' ', t[i+3]))) AS shingles
  FROM (SELECT doc_id, lang, source,
               regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents)
  WHERE len(t) >= 3
"""


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates with verified agreement.

    Plan: signatures are map-side (md5 + modular arithmetic inside
    codegen); one shuffle buckets docs by (band, band-signature); the
    in-bucket pair expansion mirrors ngram_jaccard_pairs; a broadcast
    join re-attaches the K-value signatures to score candidates. At
    100 TB the band signature is the ONLY blocking key — no quadratic
    term outside genuinely colliding buckets.
    """
    from goe_spark.operators import minhash as MH

    sigs = (
        _shingled(spark, sf_dir)
        .select(
            "doc_id",
            MH.minhash_signature(MH.shingle_hashes(F.col("shingles"))).alias("mh"),
        )
    )
    bands = sigs.select(
        "doc_id", F.explode(MH.band_structs(F.col("mh"))).alias("bs")
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    grouped = bands.groupBy("band", "sig").agg(
        F.sort_array(F.collect_set("doc_id")).alias("ids")
    )
    n = F.size("ids")
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, n - i - 1),
                lambda y: F.struct(x.alias("id1"), y.alias("id2")),
            ),
        )
    )
    cands = (
        grouped.where(n >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.id1", "p.id2")
        .distinct()
    )
    s1 = sigs.select(F.col("doc_id").alias("id1"), F.col("mh").alias("mh1"))
    s2 = sigs.select(F.col("doc_id").alias("id2"), F.col("mh").alias("mh2"))
    return (
        cands.join(s1, "id1")
        .join(s2, "id2")
        .select(
            "id1",
            "id2",
            F.round(MH.minhash_agreement(F.col("mh1"), F.col("mh2")), 6).alias(
                "est_jaccard"
            ),
        )
    )


def _minhash_lsh_sql() -> str:
    from goe_spark.operators import minhash as MH

    mh_expr = MH.minhash_signature_sql(MH.shingle_hashes_sql("shingles"))
    return f"""
WITH shingled AS ({_SHINGLED_SQL}),
sigs AS (
  SELECT doc_id, {mh_expr} AS mh FROM shingled
),
bands AS ({MH.band_rows_sql("mh")}),
cands AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
)
SELECT id1, id2,
       round({MH.minhash_agreement_sql("s1.mh", "s2.mh")}, 6) AS est_jaccard
FROM cands
JOIN sigs s1 ON s1.doc_id = id1
JOIN sigs s2 ON s2.doc_id = id2
"""


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 16-bit signatures over token hashes, pairs
    with hamming distance <= 6 inside a (lang, source) block.

    The signature is a pure map-side expression; blocking bounds the
    pair join (at 100 TB the block key would be a signature prefix —
    same plan, different key).
    """
    from goe_spark.operators import minhash as MH

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    toks = F.split(F.trim(F.col("text")), r"\s+")
    sigs = d.select(
        "doc_id",
        "lang",
        "source",
        MH.simhash_signature(
            F.transform(toks, lambda t: MH.hash31_lambda(t))
        ).alias("simhash"),
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id1"),
            F.col("b.doc_id").alias("id2"),
            MH.hamming(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .where(F.col("hamming") <= 6)
    )


def _simhash_sql() -> str:
    from goe_spark.operators import minhash as MH

    sig = MH.simhash_signature_sql(
        "list_transform(t, tk -> " + MH.hash31_lambda_sql("tk") + ")"
    )
    return rf"""
WITH sigs AS (
  SELECT doc_id, lang, source, {sig} AS simhash
  FROM (SELECT doc_id, lang, source,
               regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents)
)
SELECT a.doc_id AS id1, b.doc_id AS id2,
       {MH.hamming_sql("a.simhash", "b.simhash")} AS hamming
FROM sigs a JOIN sigs b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
WHERE {MH.hamming_sql("a.simhash", "b.simhash")} <= 6
"""


QUERIES = [
    QuerySpec("dedup_exact_keep_first", dedup_exact_keep_first, DEDUP_EXACT_SQL),
    QuerySpec("ngram_jaccard_pairs", ngram_jaccard_pairs, NGRAM_JACCARD_SQL),
    QuerySpec("minhash_lsh_pairs", minhash_lsh_pairs, _minhash_lsh_sql()),
    QuerySpec("simhash_pairs", simhash_pairs, _simhash_sql()),
]
