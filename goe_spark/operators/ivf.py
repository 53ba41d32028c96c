"""IVF (inverted-file) approximate nearest neighbour — the scale path.

Brute-force cosine scans every candidate per query; IVF bounds the
scan to ``nprobe`` of ``n_cells`` coarse cells:

1. centroids: a deterministic sample of the corpus (first ``n_cells``
   vectors). Production swaps in sampled k-means; the *plan shape* —
   tiny broadcast centroid table, map-side assignment — is identical,
   and determinism is what makes the DuckDB oracle replayable.
2. assignment: every vector joins the broadcast centroids, keeps its
   argmax-cosine cell. One narrow shuffle to materialize (vec_id,
   cell); at 100 TB this is the index-build scan, written once and
   reused across queries (cells are the partition key, so per-cell
   files give partition-pruned probes).
3. probe: each query ranks the same centroid table, keeps ``nprobe``
   cells, and scores exact cosine only against vectors assigned to
   those cells — the candidate set shrinks by ~n_cells/nprobe.

All arithmetic is sequential double folds rounded to 6, matching the
conventions in queries/similarity.py so both engines agree bitwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_CELLS = 8
N_PROBE = 2


from goe_spark.operators.vector import dot as _dot  # noqa: E402
from goe_spark.operators.vector import norm2 as _norm2  # noqa: E402


def centroids(emb: DataFrame, n_cells: int = N_CELLS) -> DataFrame:
    """Deterministic coarse quantizer: first n_cells vectors by id."""
    return emb.where(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"),
        F.col("embedding").alias("cvec"),
        _norm2(F.col("embedding")).alias("cnorm2"),
    )


def assign_cells(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cell, embedding, norm2): argmax-cosine cell per vector.

    Broadcast the centroid table; the argmax is a window over the tiny
    per-vector group (n_cells rows) — map-heavy, one shuffle out.
    """
    scored = (
        emb.select(
            "vec_id", "embedding", _norm2(F.col("embedding")).alias("vnorm2")
        )
        .crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "embedding",
            "vnorm2",
            "cell",
            F.round(
                _dot(F.col("embedding"), F.col("cvec"))
                / F.sqrt(F.col("vnorm2") * F.col("cnorm2")),
                6,
            ).alias("ccos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cell"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("vec_id", "cell", "embedding", "vnorm2")
    )


def probe_cells(
    queries: DataFrame, cents: DataFrame, nprobe: int = N_PROBE
) -> DataFrame:
    """(qid, cell) for the nprobe closest cells per query vector."""
    scored = queries.crossJoin(F.broadcast(cents)).select(
        "qid",
        "cell",
        F.round(
            _dot(F.col("qvec"), F.col("cvec"))
            / F.sqrt(F.col("qnorm2") * F.col("cnorm2")),
            6,
        ).alias("ccos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("ccos"), F.asc("cell"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= nprobe)
        .select("qid", "cell")
    )


def ivf_topk(
    emb: DataFrame,
    n_queries: int = 5,
    top_k: int = 10,
    n_cells: int = N_CELLS,
    nprobe: int = N_PROBE,
) -> DataFrame:
    """End-to-end IVF search: build index, probe, exact-rescore top-k."""
    cents = centroids(emb, n_cells)
    assigned = assign_cells(emb, cents)
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        _norm2(F.col("embedding")).alias("qnorm2"),
    )
    probes = probe_cells(queries, cents, nprobe)
    cand = probes.join(assigned, "cell").where(F.col("vec_id") != F.col("qid"))
    scored = cand.join(F.broadcast(queries), "qid").select(
        "qid",
        "vec_id",
        F.round(
            _dot(F.col("qvec"), F.col("embedding"))
            / F.sqrt(F.col("qnorm2") * F.col("vnorm2")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("qid", "vec_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )
