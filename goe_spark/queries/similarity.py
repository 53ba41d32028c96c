"""Similarity search over the embeddings table (array<float>, 64-dim).

Beyond-reference scope (BASELINE.json north star).

- brute-force cosine top-k: the exact baseline. Query set is tiny
  (broadcast); candidates stream through a map-side dot product with
  zero shuffle until the final per-query top-k (TakeOrdered via
  window + filter). At 100 TB this is the "scan everything once"
  floor; the LSH-bucketed variant (ann_lsh_topk, operators/similarity)
  cuts the candidate set by bucketing on random hyperplane signs.
- embedding near-dup: cosine >= threshold pairs within a label bucket
  (label plays the role of an IVF/coarse-quantizer cell).

All arithmetic is done in double with sequential list folds so the
DuckDB oracle computes bit-identical sums, then rounded to 6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.catalog import load_table
from goe_spark.queries import QuerySpec

N_QUERIES = 5
TOP_K = 10


def _dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm2(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


DOT_SQL = (
    "list_reduce(list_transform(range(len({a})), "
    "i -> cast({a}[i+1] AS double) * cast({b}[i+1] AS double)), (x, y) -> x + y)"
)
NORM2_SQL = (
    "list_reduce(list_transform({a}, x -> cast(x AS double) * cast(x AS double)), "
    "(x, y) -> x + y)"
)


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbours for the first 5 vectors.

    Plan: queries (5 rows) broadcast against the full candidate scan;
    cosine is codegen'd array arithmetic; per-query top-k via window
    row_number. One narrow shuffle of (qid, cos, vec_id) triples.
    """
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    cand = emb.select(
        F.col("vec_id"), F.col("embedding"), _norm2(F.col("embedding")).alias("cnorm")
    )
    qry = (
        emb.where(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qvec"),
            _norm2(F.col("embedding")).alias("qnorm"),
        )
    )
    scored = (
        cand.crossJoin(F.broadcast(qry))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(
                _dot(F.col("qvec"), F.col("embedding"))
                / F.sqrt(F.col("qnorm") * F.col("cnorm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("qid", "vec_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


ANN_BRUTEFORCE_SQL = f"""
WITH cand AS (
  SELECT vec_id, embedding,
         {NORM2_SQL.format(a='embedding')} AS cnorm
  FROM embeddings
), qry AS (
  SELECT vec_id AS qid, embedding AS qvec,
         {NORM2_SQL.format(a='embedding')} AS qnorm
  FROM embeddings WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT qid, vec_id,
         round({DOT_SQL.format(a='qvec', b='embedding')} / sqrt(qnorm * cnorm), 6) AS cosine
  FROM cand CROSS JOIN qry
  WHERE vec_id != qid
)
SELECT qid, vec_id, cosine, cast(rank AS int) AS rank
FROM (
  SELECT qid, vec_id, cosine,
         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: pairs with cosine >= 0.25 inside the
    same label cell (IVF-style coarse partition bounds the join)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", _norm2(F.col("embedding")).alias("nrm")
    )
    a = emb.alias("a")
    b = emb.alias("b")
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.label").alias("label"),
            F.col("a.vec_id").alias("id1"),
            F.col("b.vec_id").alias("id2"),
            F.round(
                _dot(F.col("a.embedding"), F.col("b.embedding"))
                / F.sqrt(F.col("a.nrm") * F.col("b.nrm")),
                6,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.25)
    )


NEAR_DUP_SQL = f"""
WITH emb AS (
  SELECT vec_id, label, embedding,
         {NORM2_SQL.format(a='embedding')} AS nrm
  FROM embeddings
)
SELECT a.label AS label, a.vec_id AS id1, b.vec_id AS id2,
       round({DOT_SQL.format(a='a.embedding', b='b.embedding')} / sqrt(a.nrm * b.nrm), 6) AS cosine
FROM emb a JOIN emb b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round({DOT_SQL.format(a='a.embedding', b='b.embedding')} / sqrt(a.nrm * b.nrm), 6) >= 0.25
"""


QUERIES = [
    QuerySpec("ann_bruteforce_topk", ann_bruteforce_topk, ANN_BRUTEFORCE_SQL),
    QuerySpec(
        "embedding_near_dup_pairs", embedding_near_dup_pairs, NEAR_DUP_SQL
    ),
]
