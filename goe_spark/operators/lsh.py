"""Sign-LSH (random-hyperplane) approximate nearest neighbour.

The third point on the ANN cost/recall curve next to brute force
(exact, scans everything) and IVF (operators/ivf, probes nearest
coarse cells):

1. hyperplanes: a deterministic sample of the corpus — the first
   ``n_planes`` vectors act as hyperplane normals (production swaps
   in Gaussian draws; determinism keeps the DuckDB oracle replayable,
   same convention as IVF centroids).
2. signature: bit k of a vector's bucket id is
   ``dot(v, plane_k) >= 0``. Cosine-similar vectors agree on most
   sign bits, so they collide into the same bucket.
3. probe: each query is signed the same way and scored exactly, but
   only against candidates in ITS bucket — the candidate set shrinks
   by ~2^n_planes (minus skew).

Plan shape at 100 TB: planes are a broadcast (n_planes rows);
signing is map-side; the only shuffle keys on (bucket) and AQE's
skew-join split handles popular buckets. The bucket id can be
written as a partition column so repeated query batches prune files.

Arithmetic: sequential double folds rounded to 6 before the sign
test and the final ranking, matching queries/similarity.py, so both
engines agree bitwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_PLANES = 4


from goe_spark.operators.vector import dot as _dot  # noqa: E402
from goe_spark.operators.vector import norm2 as _norm2  # noqa: E402


def hyperplanes(emb: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """Deterministic hyperplane normals: first n_planes vectors."""
    return emb.where(F.col("vec_id") < n_planes).select(
        F.col("vec_id").alias("plane"),
        F.col("embedding").alias("pvec"),
    )


def signatures(emb: DataFrame, planes: DataFrame) -> DataFrame:
    """(vec_id, embedding, vnorm2, bucket): the n_planes-bit sign
    signature of every vector, via one broadcast join + grouped
    conditional sum (no per-bit column explosion)."""
    signed = emb.crossJoin(F.broadcast(planes)).select(
        "vec_id",
        "plane",
        F.when(
            F.round(_dot(F.col("embedding"), F.col("pvec")), 6) >= 0,
            F.expr("shiftleft(1, cast(plane AS int))"),
        )
        .otherwise(0)
        .alias("bit"),
    )
    buckets = signed.groupBy("vec_id").agg(
        F.sum("bit").cast("long").alias("bucket")
    )
    return emb.select(
        "vec_id", "embedding", _norm2(F.col("embedding")).alias("vnorm2")
    ).join(buckets, "vec_id")


def lsh_topk(
    emb: DataFrame,
    n_queries: int,
    top_k: int,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Per-query exact cosine top-k restricted to the query's LSH
    bucket. Output: (qid, vec_id, cosine, rank)."""
    planes = hyperplanes(emb, n_planes)
    signed = signatures(emb, planes)
    qry = signed.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("vnorm2").alias("qnorm2"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        signed.join(F.broadcast(qry), F.col("bucket") == F.col("qbucket"))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(
                _dot(F.col("qvec"), F.col("embedding"))
                / F.sqrt(F.col("qnorm2") * F.col("vnorm2")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("qid", "vec_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )
