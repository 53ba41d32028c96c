"""Similarity search over the embeddings table (array<float>, 64-dim).

Beyond-reference scope (BASELINE.json north star).

- brute-force cosine top-k: the exact baseline. Query set is tiny
  (broadcast); candidates stream through a map-side dot product with
  zero shuffle until the final per-query top-k (TakeOrdered via
  window + filter). At 100 TB this is the "scan everything once"
  floor; the LSH-bucketed variant (ann_lsh_topk, operators/lsh)
  cuts the candidate set by bucketing on hyperplane sign bits.
- embedding near-dup: cosine >= threshold pairs within a label bucket
  (label plays the role of an IVF/coarse-quantizer cell).

Arithmetic convention: the fold-based operators (brute force, IVF,
LSH) use operators/vector's sequential double folds, which DuckDB's
list_reduce reproduces bit-for-bit. embedding_near_dup_pairs is the
one deliberate exception: it batches each cell through one BLAS
matmul, whose blocked accumulation can differ from the sequential
fold in the last float64 bits — after round(6) the oracle compare has
held at every tested SF, but a cosine landing within ~1e-15 of a
rounding boundary could in principle flip membership; that residual
risk is the price of the ~6x speedup and is confined to that query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.catalog import load_table, pin_cpu_stage
from goe_spark.queries import QuerySpec

N_QUERIES = 5
TOP_K = 10


from goe_spark.operators.vector import DOT_SQL, NORM2_SQL
from goe_spark.operators.vector import dot as _dot
from goe_spark.operators.vector import norm2 as _norm2


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


EMB_CELL_CAP = 128


def sub_bucketed_cells(emb: DataFrame, cap: int = EMB_CELL_CAP) -> DataFrame:
    """(vec_id, label, embedding, sub): label cells above ``cap`` rows
    split into ceil(n/cap) sub-buckets by a secondary hash of vec_id;
    cells at or under the cap keep sub = 0. The per-label count is a
    10-row broadcast, so the only full-data shuffle stays the
    downstream groupBy on (label, sub)."""
    from goe_spark.functions.hashing import hash64

    sizes = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_cell"))
    n_sub = F.expr(f"greatest(1, (n_cell + {cap} - 1) div {cap})")
    return (
        emb.join(F.broadcast(sizes), "label")
        .withColumn("sub", F.pmod(hash64(F.col("vec_id").cast("string")), n_sub))
        .select("vec_id", "label", "embedding", "sub")
    )


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: pairs with cosine >= 0.25 inside the
    same label cell (IVF-style coarse partition bounds the join).

    One applyInPandas per cell: the cell's pairwise cosine matrix is
    one float64 BLAS matmul, ~50x faster than exploding the self-join
    into per-pair interpreted array folds.

    Cell-size bound: a skewed label cell is quadratic work and an
    OOM-sized Arrow batch with nothing to stop it, so cells above
    EMB_CELL_CAP are sub-bucketed by a secondary hash of vec_id into
    ceil(n/EMB_CELL_CAP) slices — the same frequency-cap trade
    LSH_BUCKET_CAP makes for band buckets:
    pairs straddling two sub-buckets of an oversized cell are
    forfeited, in exchange for a hard per-group bound that holds at
    any skew. The sub-bucket arithmetic (hash64, pmod) is replayed
    identically in the DuckDB oracle.

    Plan: one tiny per-label count (broadcast back), one shuffle on
    (label, sub); the count join adds no second full-data shuffle.
    """
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    bucketed = sub_bucketed_cells(emb)

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        order = np.argsort(pdf["vec_id"].to_numpy())
        ids = pdf["vec_id"].to_numpy()[order]
        V = np.asarray(
            [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]],
            dtype=np.float64,
        )[order]
        nrm = np.sqrt(np.einsum("ij,ij->i", V, V))
        C = (V @ V.T) / np.outer(nrm, nrm)
        i, j = np.triu_indices(len(ids), k=1)
        cos = np.round(C[i, j], 6)
        keep = cos >= 0.25
        return pd.DataFrame(
            {
                "label": np.full(int(keep.sum()), pdf["label"].iloc[0]),
                "id1": ids[i[keep]],
                "id2": ids[j[keep]],
                "cosine": cos[keep],
            }
        )

    return bucketed.groupBy("label", "sub").applyInPandas(
        cell_pairs, "label int, id1 long, id2 long, cosine double"
    )


def _near_dup_sql() -> str:
    from goe_spark.functions.hashing import hash64_sql

    h = hash64_sql("cast(vec_id AS varchar)")
    cap = EMB_CELL_CAP
    return f"""
WITH sizes AS (
  SELECT label, count(*) AS n_cell FROM embeddings GROUP BY label
), emb AS (
  -- sub-bucket oversized cells: ((h % k) + k) % k == Spark's pmod
  SELECT e.vec_id, e.label, e.embedding,
         {NORM2_SQL.format(a='embedding')} AS nrm,
         (({h} % greatest(1, (s.n_cell + {cap} - 1) // {cap}))
          + greatest(1, (s.n_cell + {cap} - 1) // {cap}))
         % greatest(1, (s.n_cell + {cap} - 1) // {cap}) AS sub
  FROM embeddings e JOIN sizes s USING (label)
)
SELECT a.label AS label, a.vec_id AS id1, b.vec_id AS id2,
       round({DOT_SQL.format(a='a.embedding', b='b.embedding')} / sqrt(a.nrm * b.nrm), 6) AS cosine
FROM emb a JOIN emb b ON a.label = b.label AND a.sub = b.sub AND a.vec_id < b.vec_id
WHERE round({DOT_SQL.format(a='a.embedding', b='b.embedding')} / sqrt(a.nrm * b.nrm), 6) >= 0.25
"""


def semantic_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication accounting: within each
    coarse embedding cell, a vector is DROPPED iff it is cosine-similar
    (>= the near-dup threshold) to ANY lower-vec_id vector — the
    keep-first rule dedup_exact_keep_first applies to content hashes,
    lifted to embedding space. Deliberately declarative (drop if
    similar to an earlier vector, kept or not) rather than the
    sequential greedy chain, so the DuckDB oracle replays it exactly;
    the greedy variant keeps strictly more docs but is
    order-sequential per cell.

    Scale: rides embedding_near_dup_pairs (cell-capped BLAS pair
    generation — one shuffle); the drop set is pair-bounded and the
    final rollup is label-cardinality. Output: per-label survivor
    accounting."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    pairs = embedding_near_dup_pairs(spark, sf_dir)
    dropped = pairs.select("label", F.col("id2").alias("vec_id")).distinct()
    flagged = emb.join(
        dropped.withColumn("is_dropped", F.lit(1)), ["label", "vec_id"], "left"
    )
    return flagged.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.coalesce(F.col("is_dropped"), F.lit(0))).alias("n_dropped"),
        F.sum(
            F.when(F.col("is_dropped").isNull(), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_kept"),
    )


def _semantic_dedup_sql() -> str:
    return f"""
WITH pairs AS ({_near_dup_sql()}),
dropped AS (
  SELECT DISTINCT label, id2 AS vec_id FROM pairs
)
SELECT e.label,
       count(*) AS n_vectors,
       cast(sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS bigint)
         AS n_dropped,
       cast(sum(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END) AS bigint)
         AS n_kept
FROM embeddings e
LEFT JOIN dropped d ON d.label = e.label AND d.vec_id = e.vec_id
GROUP BY e.label
"""


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN (operators/ivf): probe 2 of 8 sampled-k-means
    cells instead of scanning every candidate — the 100 TB scale path
    where brute force is the floor.

    The k-means index is MATERIALIZED (ensure_index): the Lloyd pass
    + full-corpus assignment are paid once per source fingerprint and
    persisted partitioned by cell; this query only reads centroids
    and the probed cells' files. Results are identical to the
    in-session build — the oracle SQL below replays build+probe."""
    from goe_spark.operators.ivf import ensure_index, ivf_topk_indexed

    index_dir = ensure_index(spark, sf_dir)
    return ivf_topk_indexed(
        spark,
        load_table(spark, sf_dir, "embeddings"),
        index_dir,
        n_queries=N_QUERIES,
        top_k=TOP_K,
    )


def _ivf_assigned_ctes() -> str:
    """The emb -> seeds -> 1-Lloyd-step centroids -> assigned CTE
    chain shared by the IVF ANN oracle and the IVF-cell kNN-graph
    oracle — one definition so the quantizer replay cannot drift
    between them."""
    from goe_spark.functions.hashing import hash64_sql
    from goe_spark.operators.ivf import CENT_DEC, DIM, N_CELLS

    sum_cols = ", ".join(
        f"sum(CAST(embedding[{i + 1}] AS {CENT_DEC})) AS s{i}" for i in range(DIM)
    )
    cvec_list = "[" + ", ".join(f"CAST(s{i} AS DOUBLE)" for i in range(DIM)) + "]"
    h = hash64_sql("cast(vec_id AS varchar)")
    return f"""
WITH emb AS (
  SELECT vec_id, embedding, {NORM2_SQL.format(a='embedding')} AS vnorm2
  FROM embeddings
), seeds AS (
  -- sampled k-means seeds: smallest cross-engine hash of the id
  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cell, cvec, cnorm2
  FROM (
    SELECT {h} AS h, vec_id, embedding AS cvec, vnorm2 AS cnorm2
    FROM emb ORDER BY h, vec_id LIMIT {N_CELLS}
  )
), seed_assigned AS (
  SELECT vec_id, cell, embedding FROM (
    SELECT e.vec_id, s.cell, e.embedding,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round({DOT_SQL.format(a='e.embedding', b='s.cvec')} / sqrt(e.vnorm2 * s.cnorm2), 6) DESC,
                      s.cell ASC
           ) AS rk
    FROM emb e CROSS JOIN seeds s
  ) WHERE rk = 1
), cent_sums AS (
  -- one Lloyd step; exact decimal sums, cosine is scale-invariant
  SELECT cell, {sum_cols}
  FROM seed_assigned GROUP BY cell
), cents AS (
  SELECT cell, cvec, {NORM2_SQL.format(a='cvec')} AS cnorm2
  FROM (SELECT cell, {cvec_list} AS cvec FROM cent_sums)
), assigned AS (
  SELECT vec_id, cell, embedding, vnorm2 FROM (
    SELECT e.vec_id, c.cell, e.embedding, e.vnorm2,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round({DOT_SQL.format(a='e.embedding', b='c.cvec')} / sqrt(e.vnorm2 * c.cnorm2), 6) DESC,
                      c.cell ASC
           ) AS rk
    FROM emb e CROSS JOIN cents c
  ) WHERE rk = 1
)"""


def _ann_ivf_sql() -> str:
    return _ivf_assigned_ctes() + f""",
qry AS (
  SELECT vec_id AS qid, embedding AS qvec, vnorm2 AS qnorm2
  FROM emb WHERE vec_id < {N_QUERIES}
), probes AS (
  SELECT qid, cell FROM (
    SELECT q.qid, c.cell,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY round({DOT_SQL.format(a='q.qvec', b='c.cvec')} / sqrt(q.qnorm2 * c.cnorm2), 6) DESC,
                      c.cell ASC
           ) AS rk
    FROM qry q CROSS JOIN cents c
  ) WHERE rk <= 2
), scored AS (
  SELECT q.qid, a.vec_id,
         round({DOT_SQL.format(a='q.qvec', b='a.embedding')} / sqrt(q.qnorm2 * a.vnorm2), 6) AS cosine
  FROM probes p
  JOIN assigned a ON a.cell = p.cell
  JOIN qry q ON q.qid = p.qid
  WHERE a.vec_id != q.qid
)
SELECT qid, vec_id, cosine, cast(rank AS int) AS rank
FROM (
  SELECT qid, vec_id, cosine,
         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/pq): 4-bit-per-subspace
    codes make the candidate scan read M bytes per vector instead of
    DIM*4 (32x at float32); ADC scores the compressed codes map-side
    and only the RERANK shortlist touches raw vectors for the exact
    cosine top-k."""
    from goe_spark.operators.pq import pq_topk

    return pq_topk(
        load_table(spark, sf_dir, "embeddings"),
        n_queries=N_QUERIES,
        top_k=TOP_K,
    )


def _ann_pq_sql() -> str:
    from goe_spark.functions.hashing import hash64_sql
    from goe_spark.operators.pq import K_CODE, M_SUB, RERANK, SUB

    h = hash64_sql("cast(vec_id AS varchar)")

    def subdist(vec: str, m: str, cw: str) -> str:
        diff = f"(cast({vec}[{m} * {SUB} + d + 1] AS double) - {cw}[d+1])"
        return (
            f"round(list_reduce(list_transform(range({SUB}), "
            f"d -> {diff} * {diff}), (x, y) -> x + y), 6)"
        )

    return f"""
WITH emb AS (
  SELECT vec_id, embedding, {NORM2_SQL.format(a='embedding')} AS vnorm2
  FROM embeddings
), seeds AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS j, embedding
  FROM (SELECT {h} AS h, vec_id, embedding FROM emb ORDER BY h, vec_id LIMIT {K_CODE})
), codebook AS (
  -- codeword j of subspace m = sample vector j's m-th subvector
  SELECT ms.m, s.j,
         list_transform(range({SUB}),
                        d -> cast(s.embedding[ms.m * {SUB} + d + 1] AS double)) AS cw
  FROM seeds s CROSS JOIN (SELECT unnest(range({M_SUB})) AS m) ms
), codes AS (
  -- encode: argmin rounded subspace l2^2, ties to the smaller code
  SELECT vec_id, m, j AS code FROM (
    SELECT e.vec_id, c.m, c.j,
           row_number() OVER (PARTITION BY e.vec_id, c.m
             ORDER BY {subdist('e.embedding', 'c.m', 'c.cw')} ASC, c.j ASC) AS rk
    FROM emb e CROSS JOIN codebook c
  ) WHERE rk = 1
), qry AS (
  SELECT vec_id AS qid, embedding AS qvec, vnorm2 AS qnorm2
  FROM emb WHERE vec_id < {N_QUERIES}
), adc AS (
  -- per-subspace distances are on the 1e-6 grid, so this unordered
  -- SUM matches Spark's fold after the final round
  SELECT q.qid, cd.vec_id,
         round(sum({subdist('q.qvec', 'cd.m', 'cb.cw')}), 6) AS ad
  FROM qry q
  JOIN codes cd ON cd.vec_id != q.qid
  JOIN codebook cb ON cb.m = cd.m AND cb.j = cd.code
  GROUP BY q.qid, cd.vec_id
), shortlist AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY ad ASC, vec_id ASC) AS srk
    FROM adc
  ) WHERE srk <= {RERANK}
), rescored AS (
  SELECT s.qid, s.vec_id,
         round({DOT_SQL.format(a='q.qvec', b='e.embedding')}
               / sqrt(q.qnorm2 * e.vnorm2), 6) AS cosine
  FROM shortlist s
  JOIN qry q ON q.qid = s.qid
  JOIN emb e ON e.vec_id = s.vec_id
)
SELECT qid, vec_id, cosine, cast(rank AS int) AS rank
FROM (
  SELECT qid, vec_id, cosine,
         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM rescored
)
WHERE rank <= {TOP_K}
"""


def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN (operators/pq): nprobe cells bound the
    candidate set, M-byte PQ codes bound the per-candidate cost — the
    standard billion-vector layout, oracle-replayed end-to-end
    (sampled k-means centroids + sample codebooks + ADC) in DuckDB.
    Runs against the MATERIALIZED coarse index (ivf.ensure_index),
    so the Lloyd pass is paid once per source fingerprint; results
    are identical to the in-session build (pinned by
    tests/test_similarity_pq.py)."""
    from goe_spark.operators.ivf import ensure_index
    from goe_spark.operators.pq import ivf_pq_topk_indexed

    index_dir = ensure_index(spark, sf_dir)
    return ivf_pq_topk_indexed(
        spark,
        load_table(spark, sf_dir, "embeddings"),
        index_dir,
        n_queries=N_QUERIES,
        top_k=TOP_K,
    )


def _ann_ivf_pq_sql() -> str:
    from goe_spark.functions.hashing import hash64_sql
    from goe_spark.operators.ivf import CENT_DEC, DIM, N_PROBE
    from goe_spark.operators.pq import K_CODE, M_SUB, RERANK, SUB

    sum_cols = ", ".join(
        f"sum(CAST(embedding[{i + 1}] AS {CENT_DEC})) AS s{i}" for i in range(DIM)
    )
    cvec_list = "[" + ", ".join(f"CAST(s{i} AS DOUBLE)" for i in range(DIM)) + "]"
    h = hash64_sql("cast(vec_id AS varchar)")

    def subdist(vec: str, m: str, cw: str) -> str:
        diff = f"(cast({vec}[{m} * {SUB} + d + 1] AS double) - {cw}[d+1])"
        return (
            f"round(list_reduce(list_transform(range({SUB}), "
            f"d -> {diff} * {diff}), (x, y) -> x + y), 6)"
        )

    return f"""
WITH emb AS (
  SELECT vec_id, embedding, {NORM2_SQL.format(a='embedding')} AS vnorm2
  FROM embeddings
), seeds AS (
  -- IVF coarse quantizer: sampled k-means, same seeding as ann_ivf
  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cell, cvec, cnorm2
  FROM (
    SELECT {h} AS h, vec_id, embedding AS cvec, vnorm2 AS cnorm2
    FROM emb ORDER BY h, vec_id LIMIT 8
  )
), seed_assigned AS (
  SELECT vec_id, cell, embedding FROM (
    SELECT e.vec_id, s.cell, e.embedding,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round({DOT_SQL.format(a='e.embedding', b='s.cvec')} / sqrt(e.vnorm2 * s.cnorm2), 6) DESC,
                      s.cell ASC
           ) AS rk
    FROM emb e CROSS JOIN seeds s
  ) WHERE rk = 1
), cent_sums AS (
  SELECT cell, {sum_cols}
  FROM seed_assigned GROUP BY cell
), cents AS (
  SELECT cell, cvec, {NORM2_SQL.format(a='cvec')} AS cnorm2
  FROM (SELECT cell, {cvec_list} AS cvec FROM cent_sums)
), assigned AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round({DOT_SQL.format(a='e.embedding', b='c.cvec')} / sqrt(e.vnorm2 * c.cnorm2), 6) DESC,
                      c.cell ASC
           ) AS rk
    FROM emb e CROSS JOIN cents c
  ) WHERE rk = 1
), qry AS (
  SELECT vec_id AS qid, embedding AS qvec, vnorm2 AS qnorm2
  FROM emb WHERE vec_id < {N_QUERIES}
), probes AS (
  SELECT qid, cell FROM (
    SELECT q.qid, c.cell,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY round({DOT_SQL.format(a='q.qvec', b='c.cvec')} / sqrt(q.qnorm2 * c.cnorm2), 6) DESC,
                      c.cell ASC
           ) AS rk
    FROM qry q CROSS JOIN cents c
  ) WHERE rk <= {N_PROBE}
), pq_seeds AS (
  -- PQ codebooks: same hash-seeded sample rule, K_CODE vectors
  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS j, embedding
  FROM (SELECT {h} AS h, vec_id, embedding FROM emb ORDER BY h, vec_id LIMIT {K_CODE})
), codebook AS (
  SELECT ms.m, s.j,
         list_transform(range({SUB}),
                        d -> cast(s.embedding[ms.m * {SUB} + d + 1] AS double)) AS cw
  FROM pq_seeds s CROSS JOIN (SELECT unnest(range({M_SUB})) AS m) ms
), codes AS (
  SELECT vec_id, m, j AS code FROM (
    SELECT e.vec_id, c.m, c.j,
           row_number() OVER (PARTITION BY e.vec_id, c.m
             ORDER BY {subdist('e.embedding', 'c.m', 'c.cw')} ASC, c.j ASC) AS rk
    FROM emb e CROSS JOIN codebook c
  ) WHERE rk = 1
), adc AS (
  -- ADC restricted to the probed cells' members
  SELECT q.qid, cd.vec_id,
         round(sum({subdist('q.qvec', 'cd.m', 'cb.cw')}), 6) AS ad
  FROM qry q
  JOIN probes p ON p.qid = q.qid
  JOIN assigned a ON a.cell = p.cell
  JOIN codes cd ON cd.vec_id = a.vec_id AND cd.vec_id != q.qid
  JOIN codebook cb ON cb.m = cd.m AND cb.j = cd.code
  GROUP BY q.qid, cd.vec_id
), shortlist AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY ad ASC, vec_id ASC) AS srk
    FROM adc
  ) WHERE srk <= {RERANK}
), rescored AS (
  SELECT s.qid, s.vec_id,
         round({DOT_SQL.format(a='q.qvec', b='e.embedding')}
               / sqrt(q.qnorm2 * e.vnorm2), 6) AS cosine
  FROM shortlist s
  JOIN qry q ON q.qid = s.qid
  JOIN emb e ON e.vec_id = s.vec_id
)
SELECT qid, vec_id, cosine, cast(rank AS int) AS rank
FROM (
  SELECT qid, vec_id, cosine,
         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM rescored
)
WHERE rank <= {TOP_K}
"""


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN (operators/lsh): score only candidates
    in the query's 4-bit hyperplane bucket or its flip-1-bit
    neighbours (deterministic multi-probe) — the bucket-join scale
    path where even IVF's nprobe cells are too many rows."""
    from goe_spark.operators.lsh import lsh_topk

    return lsh_topk(
        load_table(spark, sf_dir, "embeddings"),
        n_queries=N_QUERIES,
        top_k=TOP_K,
    )


def _ann_lsh_sql() -> str:
    from goe_spark.operators.lsh import planes_sql, probe_masks

    masks = ", ".join(str(m) for m in probe_masks())
    return f"""
WITH emb AS (
  SELECT vec_id, embedding, {NORM2_SQL.format(a='embedding')} AS vnorm2
  FROM embeddings
), planes AS (
  -- seeded pseudo-random normals, literal-identical in both engines
  {planes_sql()}
), sigs AS (
  SELECT e.vec_id,
         cast(sum(CASE WHEN round({DOT_SQL.format(a='e.embedding', b='p.pvec')}, 6) >= 0
                       THEN (1 << plane) ELSE 0 END) AS BIGINT) AS bucket
  FROM emb e CROSS JOIN planes p
  GROUP BY e.vec_id
), signed AS (
  SELECT e.vec_id, e.embedding, e.vnorm2, s.bucket
  FROM emb e JOIN sigs s USING (vec_id)
), qry AS (
  SELECT vec_id AS qid, embedding AS qvec, vnorm2 AS qnorm2, bucket AS qbucket
  FROM signed WHERE vec_id < {N_QUERIES}
), probes AS (
  -- multi-probe: own bucket (mask 0) plus every flip-1-bit bucket
  SELECT qid, qvec, qnorm2, xor(qbucket, mask) AS pbucket
  FROM qry CROSS JOIN (SELECT unnest([{masks}]) AS mask) m
), scored AS (
  SELECT q.qid, c.vec_id,
         round({DOT_SQL.format(a='q.qvec', b='c.embedding')} / sqrt(q.qnorm2 * c.vnorm2), 6) AS cosine
  FROM signed c JOIN probes q ON c.bucket = q.pbucket
  WHERE c.vec_id != q.qid
)
SELECT qid, vec_id, cosine, cast(rank AS int) AS rank
FROM (
  SELECT qid, vec_id, cosine,
         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


def embedding_cluster_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality report over the IVF quantizer: per cell, its
    population, mean/worst cosine cohesion to the refined centroid,
    and the id range — the audit a pipeline runs before trusting an
    ANN index (an empty-ish or low-cohesion cell means probes will
    miss). Reuses the exact sampled-k-means build (seed -> one Lloyd
    step -> argmax assign) the IVF oracle replays, so the hash match
    re-proves the quantizer itself, not just the top-k path.

    Plan: reads the MATERIALIZED index (ensure_index — build paid
    once per source fingerprint, same as ann_ivf_topk), so the audit
    is one scan of assigned/ with the 8-row centroid table broadcast
    in and a cell-cardinality aggregate: no k-means rebuild, no
    corpus shuffle at all."""
    import os

    from goe_spark.operators.index_maintenance import _INDEX_DF_CACHE
    from goe_spark.operators.ivf import (
        ensure_index,
        load_centroids,
    )

    index_dir = ensure_index(spark, sf_dir)
    cents = load_centroids(spark, index_dir)
    # RAW assigned read (no tombstone view): this audits the BUILD,
    # exactly what the oracle replays. Plan-cached like the other
    # index readers.
    from goe_spark.catalog import _path_fingerprint

    apath = os.path.join(index_dir, "assigned")
    akey = (spark, index_dir, "assigned_raw", _path_fingerprint(apath))
    assigned = _INDEX_DF_CACHE.get(akey)
    if assigned is None:
        assigned = spark.read.parquet(apath)
        _INDEX_DF_CACHE[akey] = assigned
    cos = F.round(
        _dot(F.col("embedding"), F.col("cvec"))
        / F.sqrt(F.col("vnorm2") * F.col("cnorm2")),
        6,
    )
    return (
        assigned.join(F.broadcast(cents), "cell")
        .select("cell", "vec_id", cos.alias("ccos"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("ccos"), 4).alias("avg_cohesion"),
            F.min("ccos").alias("worst_cohesion"),
            F.min("vec_id").alias("min_vec_id"),
            F.max("vec_id").alias("max_vec_id"),
        )
    )


def _cluster_audit_sql() -> str:
    from goe_spark.functions.hashing import hash64_sql
    from goe_spark.operators.ivf import CENT_DEC, DIM, N_CELLS

    sum_cols = ", ".join(
        f"sum(CAST(embedding[{i + 1}] AS {CENT_DEC})) AS s{i}" for i in range(DIM)
    )
    cvec_list = "[" + ", ".join(f"CAST(s{i} AS DOUBLE)" for i in range(DIM)) + "]"
    h = hash64_sql("cast(vec_id AS varchar)")
    return f"""
WITH emb AS (
  SELECT vec_id, embedding, {NORM2_SQL.format(a='embedding')} AS vnorm2
  FROM embeddings
), seeds AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cell, cvec, cnorm2
  FROM (
    SELECT {h} AS h, vec_id, embedding AS cvec, vnorm2 AS cnorm2
    FROM emb ORDER BY h, vec_id LIMIT {N_CELLS}
  )
), seed_assigned AS (
  SELECT vec_id, cell, embedding FROM (
    SELECT e.vec_id, s.cell, e.embedding,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round({DOT_SQL.format(a='e.embedding', b='s.cvec')} / sqrt(e.vnorm2 * s.cnorm2), 6) DESC,
                      s.cell ASC
           ) AS rk
    FROM emb e CROSS JOIN seeds s
  ) WHERE rk = 1
), cent_sums AS (
  SELECT cell, {sum_cols}
  FROM seed_assigned GROUP BY cell
), cents AS (
  SELECT cell, cvec, {NORM2_SQL.format(a='cvec')} AS cnorm2
  FROM (SELECT cell, {cvec_list} AS cvec FROM cent_sums)
), assigned AS (
  SELECT vec_id, cell, ccos FROM (
    SELECT e.vec_id, c.cell,
           round({DOT_SQL.format(a='e.embedding', b='c.cvec')} / sqrt(e.vnorm2 * c.cnorm2), 6) AS ccos,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round({DOT_SQL.format(a='e.embedding', b='c.cvec')} / sqrt(e.vnorm2 * c.cnorm2), 6) DESC,
                      c.cell ASC
           ) AS rk
    FROM emb e CROSS JOIN cents c
  ) WHERE rk = 1
)
SELECT cell,
       count(*)                    AS n_vectors,
       round(avg(ccos), 4)         AS avg_cohesion,
       min(ccos)                   AS worst_cohesion,
       min(vec_id)                 AS min_vec_id,
       max(vec_id)                 AS max_vec_id
FROM assigned GROUP BY cell
"""


def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-method near-dup diagnostic: how much do the TEXT pair
    finder (MinHash-LSH over word shingles) and the EMBEDDING pair
    finder (cosine within coarse cells) agree? The documents and
    embeddings fixtures share ids, so the two pair sets join directly;
    the report is the three-way split plus the pair-set Jaccard — the
    number a curation team reads before choosing which detector (or
    both) gates the corpus.

    Plan: both pair generators are their production plans (bounded
    buckets, group-local emission); the agreement join moves only the
    pair sets, which are candidate-bounded — at 100 TB this aggregate
    is two near-dup runs plus a pairs-sized join."""
    from goe_spark.queries.dedup import minhash_lsh_pairs

    t = (
        minhash_lsh_pairs(spark, sf_dir)
        .select("id1", "id2")
        .withColumn("in_text", F.lit(1))
        .withColumn("in_emb", F.lit(0))
    )
    e = (
        embedding_near_dup_pairs(spark, sf_dir)
        .select("id1", "id2")
        .withColumn("in_text", F.lit(0))
        .withColumn("in_emb", F.lit(1))
    )
    merged = (
        t.unionByName(e)
        .groupBy("id1", "id2")
        .agg(
            F.max("in_text").alias("in_text"),
            F.max("in_emb").alias("in_emb"),
        )
    )
    return merged.agg(
        F.sum("in_text").alias("n_text_pairs"),
        F.sum("in_emb").alias("n_emb_pairs"),
        F.sum(
            (F.col("in_text") + F.col("in_emb") == 2).cast("long")
        ).alias("n_both"),
        F.round(
            F.sum((F.col("in_text") + F.col("in_emb") == 2).cast("long"))
            / F.count(F.lit(1)),
            6,
        ).alias("pair_jaccard"),
    )


def _agreement_sql() -> str:
    from goe_spark.queries.dedup import _minhash_lsh_sql

    return f"""
WITH text_pairs AS (
  SELECT id1, id2 FROM ({_minhash_lsh_sql()})
), emb_pairs AS (
  SELECT id1, id2 FROM ({_near_dup_sql()})
), merged AS (
  SELECT id1, id2, max(in_text) AS in_text, max(in_emb) AS in_emb
  FROM (
    SELECT id1, id2, 1 AS in_text, 0 AS in_emb FROM text_pairs
    UNION ALL
    SELECT id1, id2, 0, 1 FROM emb_pairs
  ) GROUP BY id1, id2
)
SELECT cast(sum(in_text) AS bigint) AS n_text_pairs,
       cast(sum(in_emb) AS bigint)  AS n_emb_pairs,
       cast(sum(CASE WHEN in_text + in_emb = 2 THEN 1 ELSE 0 END) AS bigint)
         AS n_both,
       round(sum(CASE WHEN in_text + in_emb = 2 THEN 1 ELSE 0 END)
             / cast(count(*) AS double), 6) AS pair_jaccard
FROM merged
"""


RRF_K = 60  # the standard reciprocal-rank-fusion constant
POOL = 20  # per-list pool size fused per query
HYBRID_TOP_K = 10


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — the modern search stack's core operator:
    fuse a LEXICAL ranking (idf-weighted shared-term score over the
    documents table) with a VECTOR ranking (cosine over the aligned
    embeddings table) by Reciprocal Rank Fusion:
    ``rrf = Σ_list 1/(RRF_K + rank)``, absent-from-list contributing 0.

    Determinism discipline: idf is an INTEGER milli-nat surrogate
    (round(1000·ln(N/df))) so the lexical score is an integer SUM —
    float summation order can differ between engines and even between
    Spark runs, but integer sums cannot; ranks tie-break on vec_id;
    the rrf doubles come from integer ranks in a fixed expression
    order, so round(6) is engine-exact.

    Plan/scale: the lexical side is an inverted-index join — distinct
    (doc, term) explode, term-grain df counts (idf broadcasts), query
    terms broadcast — exactly the asymptotics of a posting-list scan;
    the vector side here is the brute-force pool (the IVF index
    replaces it at 100 TB, same fused output contract); both pools cut
    to POOL rows per query BEFORE fusion, so the fusion join and the
    final window touch ≤ n_queries × POOL rows. Every window is
    partitioned by qid."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()  # scalar for idf; driver-bounded by definition
    terms = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
        ).alias("term"),
    )
    idf = terms.groupBy("term").agg(
        F.round(
            F.log(F.lit(float(n_docs)) / F.count(F.lit(1))) * 1000
        )
        .cast("long")
        .alias("idf_milli")
    )
    qterms = terms.where(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("qid"), "term"
    )
    lex_scored = (
        terms.join(F.broadcast(qterms), "term")
        .where(F.col("doc_id") != F.col("qid"))
        .join(idf, "term")
        .groupBy("qid", F.col("doc_id").alias("vec_id"))
        .agg(F.sum("idf_milli").alias("lex_milli"))
    )
    w_lex = Window.partitionBy("qid").orderBy(
        F.desc("lex_milli"), F.asc("vec_id")
    )
    lex_pool = (
        lex_scored.withColumn("lex_rank", F.row_number().over(w_lex))
        .where(F.col("lex_rank") <= POOL)
        .select("qid", "vec_id", "lex_rank")
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cand = emb.select(
        "vec_id", "embedding", _norm2(F.col("embedding")).alias("cnorm")
    )
    qry = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        _norm2(F.col("embedding")).alias("qnorm"),
    )
    vec_scored = (
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
    w_vec = Window.partitionBy("qid").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    vec_pool = (
        vec_scored.withColumn("vec_rank", F.row_number().over(w_vec))
        .where(F.col("vec_rank") <= POOL)
        .select("qid", "vec_id", "vec_rank")
    )

    fused = lex_pool.join(vec_pool, ["qid", "vec_id"], "full").select(
        "qid",
        "vec_id",
        F.round(
            F.coalesce(1.0 / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(
                1.0 / (F.lit(RRF_K) + F.col("vec_rank")), F.lit(0.0)
            ),
            6,
        ).alias("rrf"),
        F.col("lex_rank").cast("int").alias("lex_rank"),
        F.col("vec_rank").cast("int").alias("vec_rank"),
    )
    w_f = Window.partitionBy("qid").orderBy(F.desc("rrf"), F.asc("vec_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w_f))
        .where(F.col("rank") <= HYBRID_TOP_K)
        .select(
            "qid",
            "vec_id",
            "rrf",
            "lex_rank",
            "vec_rank",
            F.col("rank").cast("int").alias("rank"),
        )
    )


HYBRID_RRF_SQL = f"""
WITH terms AS (
  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS term
  FROM documents
), idf AS (
  SELECT term,
         cast(round(ln((SELECT count(*) FROM documents) / cast(count(*) AS double)) * 1000)
              AS bigint) AS idf_milli
  FROM terms GROUP BY term
), qterms AS (
  SELECT doc_id AS qid, term FROM terms WHERE doc_id < {N_QUERIES}
), lex_scored AS (
  SELECT q.qid, t.doc_id AS vec_id, sum(i.idf_milli) AS lex_milli
  FROM terms t JOIN qterms q USING (term) JOIN idf i USING (term)
  WHERE t.doc_id <> q.qid
  GROUP BY q.qid, t.doc_id
), lex_pool AS (
  SELECT qid, vec_id, lex_rank FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY lex_milli DESC, vec_id) AS lex_rank
    FROM lex_scored
  ) WHERE lex_rank <= {POOL}
), cand AS (
  SELECT vec_id, embedding, {NORM2_SQL.format(a='embedding')} AS cnorm
  FROM embeddings
), qry AS (
  SELECT vec_id AS qid, embedding AS qvec,
         {NORM2_SQL.format(a='embedding')} AS qnorm
  FROM embeddings WHERE vec_id < {N_QUERIES}
), vec_scored AS (
  SELECT qid, vec_id,
         round({DOT_SQL.format(a='qvec', b='embedding')} / sqrt(qnorm * cnorm), 6) AS cosine
  FROM cand CROSS JOIN qry WHERE vec_id <> qid
), vec_pool AS (
  SELECT qid, vec_id, vec_rank FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cosine DESC, vec_id) AS vec_rank
    FROM vec_scored
  ) WHERE vec_rank <= {POOL}
), fused AS (
  SELECT coalesce(l.qid, v.qid) AS qid,
         coalesce(l.vec_id, v.vec_id) AS vec_id,
         round(coalesce(1.0 / ({RRF_K} + l.lex_rank), 0)
               + coalesce(1.0 / ({RRF_K} + v.vec_rank), 0), 6) AS rrf,
         cast(l.lex_rank AS int) AS lex_rank,
         cast(v.vec_rank AS int) AS vec_rank
  FROM lex_pool l FULL JOIN vec_pool v
    ON l.qid = v.qid AND l.vec_id = v.vec_id
)
SELECT qid, vec_id, rrf, lex_rank, vec_rank, cast(rank AS int) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY rrf DESC, vec_id) AS rank
  FROM fused
)
WHERE rank <= {HYBRID_TOP_K}
"""


# --- int8 quantization audit -------------------------------------------------

EMB_DIM = 64
_Q_ERR_SCALE = 10**12  # fixed-point grid for squared-error terms
_Q_COS_SCALE = 10**6   # fixed-point grid for per-vector cosines


def embedding_int8_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-dimension int8 quantization audit — the standard
    check before shipping embeddings to an int8 vector store: quantize
    q_i = clamp(round(x_i / s_i * 127)), s_i = per-dim abs-max;
    reconstruct; report per label the mean squared error, the worst
    vector's MSE, and the mean cosine(original, reconstructed).

    Determinism discipline: every per-dimension error term and every
    per-vector cosine is fixed-point quantized (floor at 1e12 / 1e6)
    BEFORE summation, so all aggregates are exact integer sums —
    float addition order cannot flip the oracle hash (same rule as
    the two-pass ranks and DSIR).

    Plan (100 TB): dims posexplode map-side; ONE 64-row dim-grain
    aggregate builds the scale table (broadcast back); the scoring
    pass re-aggregates to vector grain then label grain. Payload
    vectors never shuffle — only (vec_id, exact-integer sums)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "x")
    ).select("vec_id", "label", "i", F.col("x").cast("double").alias("x"))
    scales = dims.groupBy("i").agg(F.max(F.abs(F.col("x"))).alias("s"))
    scored = dims.join(F.broadcast(scales), "i")
    q = F.when(
        F.col("s") > 0,
        F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127), F.floor(F.col("x") / F.col("s") * 127 + 0.5)
            ),
        ),
    ).otherwise(F.lit(0))
    dq = q * F.col("s") / 127
    err2_q = F.floor((F.col("x") - dq) * (F.col("x") - dq) * _Q_ERR_SCALE)
    dot_q = F.floor(F.col("x") * dq * _Q_ERR_SCALE)
    x2_q = F.floor(F.col("x") * F.col("x") * _Q_ERR_SCALE)
    dq2_q = F.floor(dq * dq * _Q_ERR_SCALE)
    per_vec = scored.groupBy("vec_id", "label").agg(
        F.sum(err2_q).alias("e2"),
        F.sum(dot_q).alias("dt"),
        F.sum(x2_q).alias("x2"),
        F.sum(dq2_q).alias("d2"),
    )
    # cast BEFORE the product: x2*d2 as longs overflows int64
    cos = F.col("dt") / F.sqrt(F.col("x2").cast("double") * F.col("d2"))
    cos_q = F.when(
        (F.col("x2") > 0) & (F.col("d2") > 0),
        F.floor(cos * _Q_COS_SCALE),
    ).otherwise(F.lit(0)).cast("long")
    vec_stats = per_vec.select("label", "e2", cos_q.alias("cq"))
    return vec_stats.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(
            (
                F.sum("e2") / F.count(F.lit(1)) / EMB_DIM / _Q_ERR_SCALE
            ).cast("double"),
            9,
        ).alias("avg_mse"),
        F.round(
            (F.max("e2") / EMB_DIM / _Q_ERR_SCALE).cast("double"), 9
        ).alias("worst_vec_mse"),
        F.round(
            (F.sum("cq") / F.count(F.lit(1)) / _Q_COS_SCALE).cast("double"),
            6,
        ).alias("avg_cos_recon"),
    )


def _int8_audit_sql() -> str:
    return f"""
WITH dims AS (
  SELECT vec_id, label, i,
         cast(embedding[i + 1] AS double) AS x
  FROM embeddings
  CROSS JOIN (SELECT unnest(range({EMB_DIM})) AS i)
), scales AS (
  SELECT i, max(abs(x)) AS s FROM dims GROUP BY i
), scored AS (
  SELECT d.vec_id, d.label,
         d.x,
         CASE WHEN s.s > 0 THEN
           greatest(-127, least(127, floor(d.x / s.s * 127 + 0.5)))
         ELSE 0 END * s.s / 127 AS dq
  FROM dims d JOIN scales s USING (i)
), per_vec AS (
  SELECT vec_id, label,
         sum(cast(floor((x - dq) * (x - dq) * {_Q_ERR_SCALE}) AS bigint)) AS e2,
         sum(cast(floor(x * dq * {_Q_ERR_SCALE}) AS bigint)) AS dt,
         sum(cast(floor(x * x * {_Q_ERR_SCALE}) AS bigint)) AS x2,
         sum(cast(floor(dq * dq * {_Q_ERR_SCALE}) AS bigint)) AS d2
  FROM scored GROUP BY vec_id, label
), vec_stats AS (
  SELECT label, e2,
         CASE WHEN x2 > 0 AND d2 > 0 THEN
           cast(floor(dt / sqrt(cast(x2 AS double) * d2)
                      * {_Q_COS_SCALE}) AS bigint)
         ELSE 0 END AS cq
  FROM per_vec
)
SELECT label,
       count(*) AS n_vecs,
       round(cast(sum(e2) AS double) / count(*) / {EMB_DIM}
             / {_Q_ERR_SCALE}, 9) AS avg_mse,
       round(cast(max(e2) AS double) / {EMB_DIM} / {_Q_ERR_SCALE}, 9)
         AS worst_vec_mse,
       round(cast(sum(cq) AS double) / count(*) / {_Q_COS_SCALE}, 6)
         AS avg_cos_recon
FROM vec_stats GROUP BY label
"""


# --- matryoshka truncation recall ---------------------------------------------

MRL_HALF = 32  # truncated prefix dimensionality


def matryoshka_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka/truncation audit: how much cosine top-k recall
    survives keeping only the first {MRL_HALF} of {EMB_DIM}
    dimensions — THE decision metric for shipping truncated
    embeddings (MRL, Kusupati et al. 2022, public method). Per query:
    |top-k(full) ∩ top-k(truncated)| / k.

    Plan: ONE candidate scan computes both cosines in the same row
    (the truncated vector is a slice — no second pass), both
    row_number windows share the qid partition key (one exchange),
    and the overlap count is a qid-grain aggregate. Ranks order by
    round(cos, 6) DESC with vec_id tie-break — the module's standard
    determinism convention."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    half = F.slice(F.col("embedding"), 1, MRL_HALF)
    cand = emb.select(
        "vec_id",
        "embedding",
        _norm2(F.col("embedding")).alias("cn_f"),
        _norm2(half).alias("cn_h"),
    )
    qry = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        _norm2(F.col("embedding")).alias("qn_f"),
        _norm2(F.slice(F.col("embedding"), 1, MRL_HALF)).alias("qn_h"),
    )
    qhalf = F.slice(F.col("qvec"), 1, MRL_HALF)
    chalf = F.slice(F.col("embedding"), 1, MRL_HALF)
    scored = (
        cand.crossJoin(F.broadcast(qry))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("qvec"))
                / F.sqrt(F.col("cn_f") * F.col("qn_f")),
                6,
            ).alias("cos_f"),
            F.round(
                _dot(chalf, qhalf) / F.sqrt(F.col("cn_h") * F.col("qn_h")),
                6,
            ).alias("cos_h"),
        )
    )
    w_f = Window.partitionBy("qid").orderBy(
        F.col("cos_f").desc(), F.col("vec_id").asc()
    )
    w_h = Window.partitionBy("qid").orderBy(
        F.col("cos_h").desc(), F.col("vec_id").asc()
    )
    ranked = scored.select(
        "qid",
        F.row_number().over(w_f).alias("rn_f"),
        F.row_number().over(w_h).alias("rn_h"),
    )
    return ranked.groupBy("qid").agg(
        F.sum(
            ((F.col("rn_f") <= TOP_K) & (F.col("rn_h") <= TOP_K)).cast("long")
        ).alias("n_overlap"),
        F.round(
            F.sum(
                ((F.col("rn_f") <= TOP_K) & (F.col("rn_h") <= TOP_K)).cast(
                    "long"
                )
            )
            / TOP_K,
            2,
        ).alias("recall_at_k"),
    )


def _matryoshka_sql() -> str:
    dot_f = DOT_SQL.format(a="c.embedding", b="q.qvec")
    half_c = f"c.embedding[1:{MRL_HALF}]"
    half_q = f"q.qvec[1:{MRL_HALF}]"
    dot_h = DOT_SQL.format(a=half_c, b=half_q)
    return f"""
WITH emb AS (
  SELECT vec_id, embedding,
         {NORM2_SQL.format(a='embedding')} AS cn_f,
         {NORM2_SQL.format(a=f'embedding[1:{MRL_HALF}]')} AS cn_h
  FROM embeddings
), qry AS (
  SELECT vec_id AS qid, embedding AS qvec, cn_f AS qn_f, cn_h AS qn_h
  FROM emb WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.qid, c.vec_id,
         round({dot_f} / sqrt(c.cn_f * q.qn_f), 6) AS cos_f,
         round({dot_h} / sqrt(c.cn_h * q.qn_h), 6) AS cos_h
  FROM emb c CROSS JOIN qry q
  WHERE c.vec_id != q.qid
), ranked AS (
  SELECT qid,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos_f DESC, vec_id ASC) AS rn_f,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos_h DESC, vec_id ASC) AS rn_h
  FROM scored
)
SELECT qid,
       cast(sum(CASE WHEN rn_f <= {TOP_K} AND rn_h <= {TOP_K}
                     THEN 1 ELSE 0 END) AS bigint) AS n_overlap,
       round(sum(CASE WHEN rn_f <= {TOP_K} AND rn_h <= {TOP_K}
                      THEN 1 ELSE 0 END) / cast({TOP_K} AS double), 2)
         AS recall_at_k
FROM ranked GROUP BY qid
"""


KNN_GRAPH_K = 5


def knn_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN graph diagnostics over the embedding space — the
    structure SemDeDup/clustering/graph-pruning pipelines build before
    deciding what to drop: per coarse cell (label), each vector's
    top-{KNN_GRAPH_K} cosine neighbours, and how reciprocal the graph
    is (a low mutual-edge rate flags hubness/anisotropy problems that
    make cosine pruning unreliable).

    Plan: the candidate join is bounded per (label, sub) cell by the
    same EMB_CELL_CAP sub-bucketing as embedding_near_dup_pairs — no
    all-pairs term at any skew; cosine is codegen'd array arithmetic;
    per-source top-k is a cell-partitioned window; the mutuality check
    is a self-join of the k-bounded edge list (|V|·k rows). The final
    rollup is label-cardinality. At 100 TB the label cells come from
    the IVF quantizer (operators/ivf.py) instead of fixture labels —
    the plan shape is identical.

    Edge accounting is fixed-point (cosine already rounded to 6dp,
    then quantized to int for the order-free mean)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    return _knn_graph_rollup(emb)


def _knn_graph_rollup(emb: DataFrame) -> DataFrame:
    """Shared kNN-graph build + reciprocity rollup over any coarse
    cell column named `label` — fixture labels (knn_graph_stats) or
    the IVF quantizer's cells (knn_graph_ivf_stats)."""
    from pyspark.sql.window import Window

    # NOTE: this stays the two-sided self-join deliberately — the
    # group-local collect_list expansion (the _labeled_cell_pairs
    # shape) was tried in the r13 optimization round and REGRESSED
    # here (knn_graph_ivf_stats 1.24 -> 2.38 s), and RE-TESTED in the
    # same round with the AQE-coalesce fix (pin_cpu_stage) plus a
    # group-local comparator top-k: still a regression (A/B at equal
    # throttle: 2.85/1.64 -> 3.75/3.72 s). The broadcast self-join +
    # native window sort beats per-element comparator array_sorts for
    # this full-graph shape; _labeled_cell_neighbours wins only where
    # it also deletes a pair-grain window AND per-src aggregates.
    cells = sub_bucketed_cells(emb)
    a = cells.select(
        "label",
        "sub",
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("avec"),
        _norm2(F.col("embedding")).alias("anrm"),
    )
    b = cells.select(
        "label",
        "sub",
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("bvec"),
        _norm2(F.col("embedding")).alias("bnrm"),
    )
    scored = (
        a.join(b, ["label", "sub"])
        .where(F.col("src") != F.col("dst"))
        .select(
            "label",
            "src",
            "dst",
            F.round(
                _dot(F.col("avec"), F.col("bvec"))
                / F.sqrt(F.col("anrm") * F.col("bnrm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("label", "src").orderBy(
        F.desc("cosine"), F.asc("dst")
    )
    edges = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= KNN_GRAPH_K)
        .select("label", "src", "dst", "cosine")
    )
    rev = edges.select(
        "label",
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        F.lit(1).alias("is_mutual"),
    )
    marked = edges.join(rev, ["label", "src", "dst"], "left")
    return marked.groupBy("label").agg(
        F.count_distinct("src").alias("n_vertices"),
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(F.coalesce(F.col("is_mutual"), F.lit(0)).cast("long")).alias(
            "n_mutual"
        ),
        F.floor(
            F.sum(F.coalesce(F.col("is_mutual"), F.lit(0)).cast("long"))
            * 1e4
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("reciprocity_q4"),
        F.floor(
            F.sum(
                F.floor(F.col("cosine") * 1e6 + 0.5).cast("decimal(38,0)")
            ).cast("double")
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("mean_cosine_q6"),
    )


def _knn_graph_sql() -> str:
    from goe_spark.functions.hashing import hash64_sql

    h = hash64_sql("cast(vec_id AS varchar)")
    cap = EMB_CELL_CAP
    nsub = f"greatest(1, (s.n_cell + {cap} - 1) // {cap})"
    cos = (
        f"round({DOT_SQL.format(a='a.embedding', b='b.embedding')}"
        " / sqrt(a.nrm * b.nrm), 6)"
    )
    return f"""
WITH sizes AS (
  SELECT label, count(*) AS n_cell FROM embeddings GROUP BY label
), cells AS (
  SELECT e.vec_id, e.label, e.embedding,
         {NORM2_SQL.format(a='embedding')} AS nrm,
         (({h} % {nsub}) + {nsub}) % {nsub} AS sub
  FROM embeddings e JOIN sizes s USING (label)
), scored AS (
  SELECT a.label, a.vec_id AS src, b.vec_id AS dst, {cos} AS cosine
  FROM cells a JOIN cells b
    ON a.label = b.label AND a.sub = b.sub AND a.vec_id != b.vec_id
), edges AS (
  SELECT label, src, dst, cosine FROM (
    SELECT *, row_number() OVER
      (PARTITION BY label, src ORDER BY cosine DESC, dst ASC) AS rk
    FROM scored
  ) WHERE rk <= {KNN_GRAPH_K}
), marked AS (
  SELECT e.label, e.src, e.dst, e.cosine,
         CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END AS is_mutual
  FROM edges e LEFT JOIN edges r
    ON r.label = e.label AND r.src = e.dst AND r.dst = e.src
)
SELECT label,
       count(DISTINCT src) AS n_vertices,
       count(*) AS n_edges,
       cast(sum(is_mutual) AS bigint) AS n_mutual,
       cast(floor(sum(is_mutual) * 1e4 / count(*)) AS bigint)
         AS reciprocity_q4,
       cast(floor(cast(sum(cast(floor(cosine * 1e6 + 0.5) AS bigint))
                       AS double) / count(*)) AS bigint)
         AS mean_cosine_q6
FROM marked GROUP BY label
"""


def knn_graph_ivf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kNN graph over the IVF QUANTIZER's cells — the exact plan
    knn_graph_stats documents as its 100 TB form, made real: coarse
    cells come from operators/ivf.py's sampled-k-means quantizer
    (hash-seeded sample + one Lloyd step, the same quantizer the ANN
    index uses) instead of fixture labels, then the identical
    cap-sub-bucketed edge build and reciprocity rollup. Per cell:
    vertices, edges, mutual edges, reciprocity and mean cosine.

    Plan: the assignment comes from the MATERIALIZED IVF index
    (ensure_index — the same discipline ann_ivf_topk,
    minhash_probe_new_docs and contamination_check follow), so the
    quantizer chain (seed sample + Lloyd step + argmax assignment) is
    paid once per source fingerprint, not once per run: both sides of
    the rollup's self-join are plain parquet scans of the index's
    assigned/ files (measured 4.2 s -> ~1.7 s at sf0.1; the previous
    form localCheckpointed an in-session rebuild every run). The
    DuckDB oracle replays the quantizer through the SAME CTE chain as
    ann_ivf_topk (_ivf_assigned_ctes — one definition, cannot drift),
    and the persisted assignment is bit-identical to the replay
    because build_index assigns against its own persisted centroids
    (doubles survive parquet exactly)."""
    from goe_spark.operators.ivf import ensure_index, load_assigned

    index_dir = ensure_index(spark, sf_dir)
    assigned = load_assigned(spark, index_dir).select(
        "vec_id", "cell", "embedding"
    )
    return (
        _knn_graph_rollup(
            assigned.select(
                "vec_id", F.col("cell").alias("label"), "embedding"
            )
        )
        .withColumn("cell", F.col("label").cast("int"))
        .drop("label")
        .select(
            "cell",
            "n_vertices",
            "n_edges",
            "n_mutual",
            "reciprocity_q4",
            "mean_cosine_q6",
        )
    )


def _knn_graph_ivf_sql() -> str:
    from goe_spark.functions.hashing import hash64_sql

    h = hash64_sql("cast(vec_id AS varchar)")
    cap = EMB_CELL_CAP
    nsub = f"greatest(1, (s.n_cell + {cap} - 1) // {cap})"
    cos = (
        f"round({DOT_SQL.format(a='a.embedding', b='b.embedding')}"
        " / sqrt(a.nrm * b.nrm), 6)"
    )
    return _ivf_assigned_ctes() + f""",
sizes2 AS (
  SELECT cell, count(*) AS n_cell FROM assigned GROUP BY cell
), gcells AS (
  SELECT e.vec_id, e.cell, e.embedding, e.vnorm2 AS nrm,
         (({h} % {nsub}) + {nsub}) % {nsub} AS sub
  FROM assigned e JOIN sizes2 s USING (cell)
), scored AS (
  SELECT a.cell, a.vec_id AS src, b.vec_id AS dst, {cos} AS cosine
  FROM gcells a JOIN gcells b
    ON a.cell = b.cell AND a.sub = b.sub AND a.vec_id != b.vec_id
), edges AS (
  SELECT cell, src, dst, cosine FROM (
    SELECT *, row_number() OVER
      (PARTITION BY cell, src ORDER BY cosine DESC, dst ASC) AS rk
    FROM scored
  ) WHERE rk <= {KNN_GRAPH_K}
), marked AS (
  SELECT e.cell, e.src, e.dst, e.cosine,
         CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END AS is_mutual
  FROM edges e LEFT JOIN edges r
    ON r.cell = e.cell AND r.src = e.dst AND r.dst = e.src
)
SELECT cast(cell AS int) AS cell,
       count(DISTINCT src) AS n_vertices,
       count(*) AS n_edges,
       cast(sum(is_mutual) AS bigint) AS n_mutual,
       cast(floor(sum(is_mutual) * 1e4 / count(*)) AS bigint)
         AS reciprocity_q4,
       cast(floor(cast(sum(cast(floor(cosine * 1e6 + 0.5) AS bigint))
                       AS double) / count(*)) AS bigint)
         AS mean_cosine_q6
FROM marked GROUP BY cell
"""


def embedding_dimension_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension moment audit of the embedding space — the
    anisotropy check run before trusting cosine retrieval: a few
    dominant high-variance dimensions (or strongly off-center means)
    mean similarities are driven by a low-rank subspace and the space
    needs centering/whitening. Per dimension: exact fixed-point mean
    and variance from order-free integer sums.

    Plan: posexplode is a map-side projection; the aggregate is a
    64-group (d-bounded) hash groupBy with partial aggregation —
    corpus-sized data shuffles only d·|partials| integer triples.
    Sums accumulate in DECIMAL(38,0): per-element squares on the 1e6
    grid reach ~4e12, so a long sum wraps after ~2e6 rows/dim — the
    money.py headroom rule applies here too."""
    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    el = emb.select(
        F.posexplode("embedding").alias("pos", "v")
    ).select(
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("v").cast("double") * 1e6 + 0.5)
        .cast("long")
        .alias("vq"),
    )
    per = el.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("vq").cast("decimal(38,0)")).alias("s1"),
        F.sum((F.col("vq") * F.col("vq")).cast("decimal(38,0)")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n") / 1e6
    var = (
        F.col("s2").cast("double") / F.col("n")
        - (F.col("s1").cast("double") / F.col("n"))
        * (F.col("s1").cast("double") / F.col("n"))
    ) / 1e12
    return per.select(
        F.col("dim").cast("int").alias("dim"),
        "n",
        F.floor(mean * 1e6 + 0.5).cast("long").alias("mean_q6"),
        F.floor(var * 1e6 + 0.5).cast("long").alias("var_q6"),
    )


EMB_DIM_STATS_SQL = """
WITH el AS (
  SELECT i AS dim,
         cast(floor(cast(embedding[i] AS double) * 1e6 + 0.5) AS bigint)
           AS vq
  FROM embeddings,
       LATERAL unnest(range(1, len(embedding) + 1)) AS r(i)
), per AS (
  SELECT dim, count(*) AS n,
         sum(vq) AS s1,
         sum(vq * vq) AS s2
  FROM el GROUP BY dim
)
SELECT cast(dim AS int) AS dim, n,
       cast(floor(cast(s1 AS double) / n / 1e6 * 1e6 + 0.5) AS bigint)
         AS mean_q6,
       cast(floor((cast(s2 AS double) / n
                   - (cast(s1 AS double) / n) * (cast(s1 AS double) / n))
                  / 1e12 * 1e6 + 0.5) AS bigint) AS var_q6
FROM per
"""


GRAM_Q = 1_000  # per-element fixed-point grid for the exact Gram
GRAM_CHUNK = 1_000  # rows per int64 partial matmul (overflow headroom)


def embedding_gram_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix G = V^T V — the covariance/PCA/whitening
    precursor every embedding-space audit starts from — computed as
    EXACT integer linear algebra: elements quantized to the {GRAM_Q}
    grid, per-chunk int64 BLAS matmuls inside mapInPandas (chunks of
    {GRAM_CHUNK} rows bound the int64 partial sums), partials summed
    in DECIMAL(38,0). Per dimension i the registry row reports G_ii,
    the off-diagonal absolute mass sum_j!=i |G_ij| and their ratio —
    the cross-correlation signal that says whether dimensions carry
    independent information (ratio << 1) or the space needs whitening.

    Plan (100 TB): each task reduces its rows to ceil(rows/chunk)
    64x64 integer matrices — the shuffle carries d^2-bounded partial
    matrices, never vectors; the final sum is a d^2-group aggregate.
    This is the classic treeAggregate Gram pattern (Spark MLlib's
    computeGramianMatrix), expressed Arrow-batched with exact
    arithmetic so the DuckDB oracle (pairwise product sums over the
    same quantized elements) matches hash-for-hash at any scale.
    tests/test_round9_ops.py adds the numpy cross-check and the
    PCA-variance consumer (eigh on the collected 64x64)."""
    import pandas as pd

    from goe_spark.operators.ivf import DIM

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")

    def partial_grams(batches):
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.asarray(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            Vq = np.floor(V * GRAM_Q + 0.5).astype(np.int64)
            for lo in range(0, len(Vq), GRAM_CHUNK):
                G = Vq[lo : lo + GRAM_CHUNK].T @ Vq[lo : lo + GRAM_CHUNK]
                i, j = np.meshgrid(range(DIM), range(DIM), indexing="ij")
                yield pd.DataFrame(
                    {
                        "i": (i.ravel() + 1).astype("int32"),
                        "j": (j.ravel() + 1).astype("int32"),
                        "g": G.ravel(),
                    }
                )

    partial = emb.mapInPandas(partial_grams, "i int, j int, g long")
    gram = partial.groupBy("i", "j").agg(
        F.sum(F.col("g").cast("decimal(38,0)")).alias("g")
    )
    return gram.groupBy("i").agg(
        F.sum(F.when(F.col("j") == F.col("i"), F.col("g"))).alias("_diag"),
        F.sum(
            F.when(F.col("j") != F.col("i"), F.abs(F.col("g"))).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        ).alias("_off"),
    ).select(
        F.col("i").alias("dim"),
        F.col("_diag").cast("double").alias("gram_diag"),
        F.col("_off").cast("double").alias("offdiag_abs_mass"),
        F.floor(
            F.col("_off").cast("double")
            / F.col("_diag").cast("double")
            * 1e6
        )
        .cast("long")
        .alias("cross_ratio_q6"),
    )


def _gram_sql() -> str:
    from goe_spark.operators.ivf import DIM

    q = GRAM_Q
    return f"""
WITH el AS (
  SELECT vid, i, cast(floor(v * {q} + 0.5) AS bigint) AS vq
  FROM (
    SELECT vec_id AS vid, r.i AS i,
           cast(embedding[r.i] AS double) AS v
    FROM embeddings,
         LATERAL unnest(range(1, {DIM} + 1)) AS r(i)
  )
), gram AS (
  SELECT a.i AS i, b.i AS j, sum(a.vq * b.vq) AS g
  FROM el a JOIN el b ON a.vid = b.vid
  GROUP BY a.i, b.i
)
SELECT cast(i AS int) AS dim,
       cast(sum(CASE WHEN j = i THEN g END) AS double) AS gram_diag,
       cast(sum(CASE WHEN j != i THEN abs(g) ELSE 0 END) AS double)
         AS offdiag_abs_mass,
       cast(floor(cast(sum(CASE WHEN j != i THEN abs(g) ELSE 0 END)
                       AS double)
                  / cast(sum(CASE WHEN j = i THEN g END) AS double)
                  * 1e6) AS bigint) AS cross_ratio_q6
FROM gram GROUP BY i
"""


def _labeled_cell_neighbours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, slabel, nbrs): per vector, its ordered candidate list
    inside its (IVF cell, sub-bucket) — an array of
    struct(cosine, dst, dlabel) sorted by (cosine DESC, dst ASC) —
    the shared kNN-candidate construction of knn_label_agreement and
    hard_negative_mining_stats. Cell fan-out is bounded by
    EMB_CELL_CAP sub-bucketing exactly like knn_graph_ivf_stats; the
    quantizer assignment comes from the materialized index.

    The sort happens GROUP-LOCALLY in the same task that already
    expands the bucket's candidate pairs, so the per-src ranking both
    consumers need costs zero extra shuffles: the r12 shape exploded
    ~215k pair rows only to re-shuffle them through a
    row_number window and a per-src groupBy. The comparator spells
    out (cosine DESC, dst ASC) with SQL comparisons — the exact total
    order the window used (cosines are rounded fractions; the fixture
    has no NaN/zero-norm vectors, pinned by the green ANSI qcos
    cast)."""
    from goe_spark.functions.hashing import hash64
    from goe_spark.operators.ivf import ensure_index, load_assigned

    cap = EMB_CELL_CAP
    index_dir = ensure_index(spark, sf_dir)
    assigned = load_assigned(spark, index_dir).select(
        "vec_id", "cell", "embedding"
    )
    lbl = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label"
    )
    emb = assigned.join(lbl, "vec_id")
    sizes = emb.groupBy("cell").agg(F.count(F.lit(1)).alias("n_cell"))
    n_sub = F.expr(f"greatest(1, (n_cell + {cap} - 1) div {cap})")
    g = (
        emb.join(F.broadcast(sizes), "cell")
        .withColumn(
            "sub", F.pmod(hash64(F.col("vec_id").cast("string")), n_sub)
        )
        .select(
            "cell",
            "sub",
            "vec_id",
            "label",
            "embedding",
            _norm2(F.col("embedding")).alias("nrm"),
        )
    )
    # The expansion below is tiny in BYTES (a few hundred KB of
    # collected structs) but huge in CPU (|bucket|^2 64-dim dots), so
    # AQE's byte-based coalescing folds the post-groupBy stage into
    # ONE partition and serializes all of it onto one core (measured:
    # a single 1.5 s task). The pin must sit BELOW the groupBy — the
    # user repartition's hash partitioning satisfies the aggregate's
    # clustering, so it REPLACES the coalescable ENSURE_REQUIREMENTS
    # exchange; r13 pinned ABOVE the groupBy on the aggregate's own
    # keys and the optimizer's redundant-repartition rule silently
    # removed it (the r13 placement-rule-2 case, visible in
    # plans/r13/knn_label_agreement_after.txt: Exchange (22) stayed
    # ENSURE_REQUIREMENTS and AQE ran the expansion on one task).
    g = pin_cpu_stage(g, "cell", "sub")
    # Group-local ordered-pair expansion (the minhash_lsh_pairs
    # shape): ONE (cell, sub) groupBy replaces the r12 self-join's
    # two exchanges + duplicated `g` lineage. Buckets are
    # EMB_CELL_CAP-bounded by the sub-bucketing above, so the
    # collected struct list stays a few hundred rows; the cosine is
    # the identical round(dot/sqrt, 6) expression inline.
    grouped = g.groupBy("cell", "sub").agg(
        F.collect_list(
            F.struct("vec_id", "label", "embedding", "nrm")
        ).alias("ds")
    )

    def _cmp(lhs: Column, rhs: Column) -> Column:
        return (
            F.when(lhs["cosine"] > rhs["cosine"], F.lit(-1))
            .when(lhs["cosine"] < rhs["cosine"], F.lit(1))
            .when(lhs["dst"] < rhs["dst"], F.lit(-1))
            .when(lhs["dst"] > rhs["dst"], F.lit(1))
            .otherwise(F.lit(0))
        )

    src_structs = F.transform(
        F.col("ds"),
        lambda x: F.struct(
            x["vec_id"].alias("src"),
            x["label"].alias("slabel"),
            F.array_sort(
                F.transform(
                    F.filter(
                        F.col("ds"), lambda y: y["vec_id"] != x["vec_id"]
                    ),
                    lambda y: F.struct(
                        F.round(
                            _dot(x["embedding"], y["embedding"])
                            / F.sqrt(x["nrm"] * y["nrm"]),
                            6,
                        ).alias("cosine"),
                        y["vec_id"].alias("dst"),
                        y["label"].alias("dlabel"),
                    ),
                ),
                _cmp,
            ).alias("nbrs"),
        ),
    )
    return (
        grouped.where(F.size("ds") >= 2)
        .select(F.explode_outer(src_structs).alias("p"))
        .select("p.src", "p.slabel", "p.nbrs")
    )


def knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit (the confident-learning shape, Northcutt et
    al.): each vector's top-{KNN_GRAPH_K} cosine neighbours inside its
    IVF cell vote on its label — a vector whose neighbourhood
    disagrees with its recorded label is a mislabeled-example
    candidate, the screen run before trusting labels for classifier
    training or stratified sampling. Per label: vectors with
    neighbours, kNN edges, label-agreeing edges, agreement per 10k,
    and suspects (strict minority agreement, 2*agree < k).

    Plan: the neighbour candidates are bounded per (IVF cell, sub)
    exactly like knn_graph_ivf_stats — the quantizer assignment comes
    from the MATERIALIZED index (ensure_index, paid once per source
    fingerprint), cells above EMB_CELL_CAP sub-bucket by the vec_id
    hash, no all-pairs term at any skew; fixture labels join back 1:1
    at vector grain; the rollup is label-cardinality. The DuckDB
    oracle replays the quantizer through the SAME _ivf_assigned_ctes
    chain as ann_ivf_topk."""
    nb = _labeled_cell_neighbours(spark, sf_dir)
    # top-K is a slice of the group-locally sorted candidate array —
    # the r12 window (Exchange + Sort over ~215k pair rows) and the
    # per-src groupBy collapse into map-side array ops on one row per
    # vector.
    topk = F.slice(F.col("nbrs"), 1, KNN_GRAPH_K)
    per_vec = nb.select(
        "src",
        "slabel",
        F.size(topk).cast("long").alias("k_actual"),
        F.size(
            F.filter(topk, lambda n: n["dlabel"] == F.col("slabel"))
        )
        .cast("long")
        .alias("agree"),
    )
    return per_vec.groupBy(F.col("slabel").alias("label")).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("k_actual").alias("n_edges"),
        F.sum("agree").alias("n_agree"),
        F.floor(F.sum("agree") * 10000 / F.sum("k_actual"))
        .cast("long")
        .alias("agreement_per_10k"),
        F.sum((2 * F.col("agree") < F.col("k_actual")).cast("long")).alias(
            "n_suspect"
        ),
    )


def _labeled_cell_pairs_ctes_sql() -> str:
    """Shared DuckDB CTE chain ending in ``scored(src, slabel, dst,
    dlabel, cosine)`` — the twin of _labeled_cell_pairs."""
    from goe_spark.functions.hashing import hash64_sql

    h = hash64_sql("cast(vec_id AS varchar)")
    cap = EMB_CELL_CAP
    nsub = f"greatest(1, (s.n_cell + {cap} - 1) // {cap})"
    cos = (
        f"round({DOT_SQL.format(a='a.embedding', b='b.embedding')}"
        " / sqrt(a.nrm * b.nrm), 6)"
    )
    return _ivf_assigned_ctes() + f""",
lbl AS (
  SELECT vec_id, label FROM embeddings
), sizes2 AS (
  SELECT cell, count(*) AS n_cell FROM assigned GROUP BY cell
), gcells AS (
  SELECT e.vec_id, e.cell, e.embedding, e.vnorm2 AS nrm, l.label,
         (({h} % {nsub}) + {nsub}) % {nsub} AS sub
  FROM assigned e JOIN sizes2 s USING (cell) JOIN lbl l USING (vec_id)
), scored AS (
  SELECT a.vec_id AS src, a.label AS slabel,
         b.vec_id AS dst, b.label AS dlabel, {cos} AS cosine
  FROM gcells a JOIN gcells b
    ON a.cell = b.cell AND a.sub = b.sub AND a.vec_id != b.vec_id
)"""


def _knn_label_agreement_sql() -> str:
    return _labeled_cell_pairs_ctes_sql() + f""", nn AS (
  SELECT * FROM (
    SELECT *, row_number() OVER
      (PARTITION BY src ORDER BY cosine DESC, dst ASC) AS rk
    FROM scored
  ) WHERE rk <= {KNN_GRAPH_K}
), per_vec AS (
  SELECT src, slabel,
         count(*) AS k_actual,
         sum(CASE WHEN slabel = dlabel THEN 1 ELSE 0 END) AS agree
  FROM nn GROUP BY 1, 2
)
SELECT slabel AS label,
       count(*) AS n_vecs,
       cast(sum(k_actual) AS bigint) AS n_edges,
       cast(sum(agree) AS bigint) AS n_agree,
       cast(floor(sum(agree) * 10000 / (1.0 * sum(k_actual)))
            AS bigint) AS agreement_per_10k,
       cast(sum(CASE WHEN 2 * agree < k_actual THEN 1 ELSE 0 END)
            AS bigint) AS n_suspect
FROM per_vec GROUP BY slabel
"""


def hard_negative_mining_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hard-negative mining audit — the contrastive-training prep
    step (retrieval/embedding fine-tuning mines, per anchor, the
    highest-similarity CROSS-label neighbours as hard negatives): per
    label, anchors with candidates, anchors that have a cross-label
    candidate at all, hard-negative edges inside the top-{KNN_GRAPH_K}
    (the pairs a contrastive batch would actually use), the mean rank
    of the FIRST cross-label neighbour (low rank = negatives crowd
    the anchor, hard mining pays off; rank near k = negatives are
    easy), and the mean margin best-same-label-cosine minus
    best-cross-label-cosine in 1e-6 units (negative margin = the
    nearest neighbour is a different label — a label-noise or
    boundary anchor).

    Determinism: cosines are rounded to 1e-6 then quantized to
    integers BEFORE any summation, so margins aggregate as exact
    ints. Plan: rides the SAME bounded (cell, sub) candidate pairs as
    knn_label_agreement (_labeled_cell_pairs — one shared
    construction, two audits); one per-anchor aggregate, one
    label-grain rollup."""
    nb = _labeled_cell_neighbours(spark, sf_dir)

    def _qcos(n: Column) -> Column:
        return F.floor(n["cosine"] * 1e6 + 0.5).cast("long")

    def _same(n: Column) -> Column:
        return n["dlabel"] == F.col("slabel")

    # All per-anchor stats are array folds over the group-locally
    # sorted candidate list (r12: window rank + per-src groupBy over
    # ~215k exploded pair rows). The candidate array arrives sorted
    # (cosine DESC, dst ASC), so rank = 1-based array index.
    neg_ranks = F.filter(
        F.transform(
            F.col("nbrs"), lambda n, i: F.when(~_same(n), i + 1)
        ),
        lambda v: v.isNotNull(),
    )
    per_src = nb.select(
        "src",
        "slabel",
        F.array_max(
            F.transform(F.filter(F.col("nbrs"), _same), _qcos)
        ).alias("best_pos_q"),
        F.array_max(
            F.transform(
                F.filter(F.col("nbrs"), lambda n: ~_same(n)), _qcos
            )
        ).alias("best_neg_q"),
        F.get(neg_ranks, 0).alias("first_neg_rank"),
        F.size(
            F.filter(
                F.slice(F.col("nbrs"), 1, KNN_GRAPH_K),
                lambda n: ~_same(n),
            )
        )
        .cast("long")
        .alias("hard_in_topk"),
    )
    both = F.col("best_pos_q").isNotNull() & F.col(
        "best_neg_q"
    ).isNotNull()
    n_with_neg = F.sum(F.col("best_neg_q").isNotNull().cast("long"))
    n_both = F.sum(both.cast("long"))
    return per_src.groupBy(F.col("slabel").alias("label")).agg(
        F.count(F.lit(1)).alias("n_anchors"),
        n_with_neg.alias("n_with_neg"),
        F.sum("hard_in_topk").alias("hard_neg_edges_topk"),
        F.when(
            n_with_neg > 0,
            F.floor(
                F.sum("first_neg_rank") * 10000 / n_with_neg
            ),
        )
        .cast("long")
        .alias("mean_first_neg_rank_q4"),
        F.when(
            n_both > 0,
            F.floor(
                F.sum(
                    F.when(
                        both, F.col("best_pos_q") - F.col("best_neg_q")
                    )
                )
                / n_both
            ),
        )
        .cast("long")
        .alias("mean_margin_q6"),
    )


def _hard_negative_sql() -> str:
    return _labeled_cell_pairs_ctes_sql() + f""", ranked AS (
  SELECT *, row_number() OVER
    (PARTITION BY src ORDER BY cosine DESC, dst ASC) AS rk,
         cast(floor(cosine * 1e6 + 0.5) AS bigint) AS qcos
  FROM scored
), per_src AS (
  SELECT src, slabel,
         max(CASE WHEN slabel = dlabel THEN qcos END) AS best_pos_q,
         max(CASE WHEN slabel <> dlabel THEN qcos END) AS best_neg_q,
         min(CASE WHEN slabel <> dlabel THEN rk END) AS first_neg_rank,
         sum(CASE WHEN slabel <> dlabel AND rk <= {KNN_GRAPH_K}
                  THEN 1 ELSE 0 END) AS hard_in_topk
  FROM ranked GROUP BY 1, 2
)
SELECT slabel AS label,
       count(*) AS n_anchors,
       cast(sum(CASE WHEN best_neg_q IS NOT NULL THEN 1 ELSE 0 END)
            AS bigint) AS n_with_neg,
       cast(sum(hard_in_topk) AS bigint) AS hard_neg_edges_topk,
       cast(CASE WHEN sum(CASE WHEN best_neg_q IS NOT NULL
                               THEN 1 ELSE 0 END) > 0 THEN
         floor(sum(first_neg_rank) * 10000.0
               / sum(CASE WHEN best_neg_q IS NOT NULL THEN 1 ELSE 0 END))
       END AS bigint) AS mean_first_neg_rank_q4,
       cast(CASE WHEN sum(CASE WHEN best_pos_q IS NOT NULL
                               AND best_neg_q IS NOT NULL
                               THEN 1 ELSE 0 END) > 0 THEN
         floor(sum(CASE WHEN best_pos_q IS NOT NULL
                        AND best_neg_q IS NOT NULL
                        THEN best_pos_q - best_neg_q END)
               / (1.0 * sum(CASE WHEN best_pos_q IS NOT NULL
                                 AND best_neg_q IS NOT NULL
                                 THEN 1 ELSE 0 END)))
       END AS bigint) AS mean_margin_q6
FROM per_src GROUP BY slabel
"""


#: power-iteration rounds for the top-PC audit
PI_ITERS = 4
#: fixed-point grid for quantized embedding components and the
#: iterated eigenvector (milli-units)
PI_Q = 1000


def _quantized_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, q): embeddings quantized to the PI_Q fixed-point grid
    — the shared input of the power-iteration family."""
    emb = load_table(spark, sf_dir, "embeddings")
    qcol = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * PI_Q + 0.5).cast("long"),
    )
    return emb.select("label", qcol.alias("q"))


def _power_iterate(base: DataFrame) -> tuple[list[int], list[tuple], int]:
    """Run PI_ITERS exact fixed-point power-iteration rounds over a
    frame with a quantized `q` array column; returns (final
    eigenvector milli-ints, per-iteration metric tuples, trace).
    See embedding_power_iteration for the exactness contract.

    ONE distributed pass (r13): the corpus only ever enters the
    iteration through w_j = Σ_rows q_j·(q·v), and integer
    distributivity regroups that EXACTLY as Σ_k G_jk·v_k where
    G = Σ_rows q qᵀ is the dim×dim integer Gram/second-moment matrix
    — so G is aggregated once (upper triangle, dim·(dim+1)/2 = 2080
    groups at EMB_DIM=64, map-side partial aggregation), collected at
    matrix grain, and every iteration plus the trace (Σ_j G_jj) runs
    on the driver with exact Python ints. Replaces the r12 shape of
    one trace job + one corpus pass PER iteration (5 sequential jobs
    over the same data) with a single job; bit-identical rows because
    every regrouped sum is integer arithmetic in both layouts, and
    the driver's arbitrary-precision ints only widen the headroom the
    Spark bigint path had."""
    import math

    dim = EMB_DIM
    qd = base.select(F.posexplode("q").alias("j", "qj"), "q")
    g_rows = (
        qd.select(
            "j",
            "qj",
            F.posexplode(
                F.slice(F.col("q"), F.col("j") + 1, F.lit(dim))
            ).alias("k0", "qk"),
        )
        .groupBy("j", "k0")
        .agg(F.sum(F.col("qj") * F.col("qk")).alias("g"))
        .collect()
    )
    G = [[0] * dim for _ in range(dim)]
    for r in g_rows:
        j = int(r["j"])
        k = j + int(r["k0"])
        G[j][k] = int(r["g"])
        G[k][j] = int(r["g"])
    trace = sum(G[j][j] for j in range(dim))

    v = [PI_Q] * dim
    rows: list[tuple] = []
    for it in range(1, PI_ITERS + 1):
        w = [
            sum(G[j][k] * v[k] for k in range(dim)) for j in range(dim)
        ]
        r_num = sum(vj * wj for vj, wj in zip(v, w))      # exact int
        r_den = sum(vj * vj for vj in v)                  # exact int
        n2 = sum(wj * wj for wj in w)                     # exact int
        norm = math.sqrt(float(n2))
        v = [
            math.floor(float(wj) / norm * PI_Q + 0.5) for wj in w
        ]
        lam = float(r_num) / r_den
        rows.append(
            (
                it,
                round(lam, 3),
                round(lam / trace, 6),
                sum(abs(x) for x in v),
                sum((j + 1) * x for j, x in enumerate(v)),
            )
        )
    return v, rows, trace


def embedding_power_iteration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dominant principal direction of the embedding corpus via
    {PI_ITERS} rounds of EXACT fixed-point power iteration on the
    (uncentered) second-moment matrix M = sum(x xᵀ) — the anisotropy
    audit (Ethayarajh 2019-style): a corpus whose top component holds
    most of the energy has embeddings collapsed into a cone, which
    degrades cosine retrieval and PQ codebooks alike. Per iteration:
    the Rayleigh quotient λ̂ = vᵀMv / vᵀv, its share of trace(M)
    (the anisotropy number), and the updated eigenvector's L1 mass
    and position checksum.

    Exactness: components quantize to the {PI_Q} grid; Mv is computed
    WITHOUT materializing M — per row s = q·v (int fold), then
    w_j = sum(s * q_j) = Σ_k G_jk v_k for the integer Gram matrix
    G = Σ q qᵀ (exact regrouping — integer distributivity); v
    renormalizes on the driver with ONE double sqrt/division per
    component (norm² summed exactly in integers first, so no float
    accumulation order exists), matching the DuckDB oracle's
    unrolled-iteration CTEs bit for bit. Integer magnitudes stay
    under 2^53 through sf10; a 1e9-vector corpus promotes G to
    decimal(38,0), same plan shape (SCALE.md).

    Plan (r13): ONE corpus pass total — the Gram upper triangle
    aggregates map-side into 2080 groups and collects at matrix
    grain; every iteration and the trace then run on the driver over
    G (the bounded-model-state pattern of bpe_train_merges), so the
    r12 shape of one corpus job per iteration is gone."""
    base = _quantized_embeddings(spark, sf_dir).select("q")
    v, rows, _ = _power_iterate(base)
    return spark.createDataFrame(
        rows,
        "iter int, rayleigh_r3 double, energy_share_r6 double,"
        " v_l1 bigint, v_checksum bigint",
    )


def _power_iteration_cte_list() -> tuple[list[str], list[str]]:
    """(cte blocks, per-iteration metric selects) — shared by the
    power-iteration oracle and the anisotropy-by-label oracle so the
    quantizer + iteration replay cannot drift between them. The last
    eigenvector relation is v{PI_ITERS}."""
    ctes = [
        f"""base AS (
  SELECT vec_id,
         [cast(floor(cast(x AS double) * {PI_Q} + 0.5) AS bigint)
          FOR x IN embedding] AS q
  FROM embeddings
), qd AS (
  SELECT vec_id, unnest(q) AS qv,
         generate_subscripts(q, 1) - 1 AS dim
  FROM base
), tr AS (
  SELECT sum(cast(qv AS hugeint) * qv) AS trace FROM qd
), v0 AS (
  SELECT cast(r.range AS bigint) AS dim, cast({PI_Q} AS bigint) AS v
  FROM range({EMB_DIM}) r
)"""
    ]
    selects = []
    for it in range(1, PI_ITERS + 1):
        p = it - 1
        ctes.append(
            f"""s{it} AS (
  SELECT d.vec_id, sum(d.qv * v.v) AS s
  FROM qd d JOIN v{p} v USING (dim) GROUP BY d.vec_id
), w{it} AS (
  SELECT d.dim, sum(cast(s.s AS hugeint) * d.qv) AS w
  FROM qd d JOIN s{it} s USING (vec_id) GROUP BY d.dim
), st{it} AS (
  SELECT sum(cast(v.v AS hugeint) * w.w) AS r_num,
         sum(cast(v.v AS hugeint) * v.v) AS r_den,
         sum(cast(w.w AS hugeint) * w.w) AS n2
  FROM w{it} w JOIN v{p} v USING (dim)
), v{it} AS (
  SELECT w.dim,
         cast(floor(cast(w.w AS double)
                    / sqrt(cast(st.n2 AS double)) * {PI_Q} + 0.5)
              AS bigint) AS v
  FROM w{it} w, st{it} st
), m{it} AS (
  SELECT {it} AS iter,
         round(cast(st.r_num AS double) / cast(st.r_den AS double), 3)
           AS rayleigh_r3,
         round(cast(st.r_num AS double) / cast(st.r_den AS double)
               / cast(tr.trace AS double), 6) AS energy_share_r6,
         (SELECT cast(sum(abs(v)) AS bigint) FROM v{it})
           AS v_l1,
         (SELECT cast(sum((dim + 1) * v) AS bigint) FROM v{it})
           AS v_checksum
  FROM st{it} st, tr
)"""
        )
        selects.append(f"SELECT * FROM m{it}")
    return ctes, selects


def _power_iteration_sql() -> str:
    ctes, selects = _power_iteration_cte_list()
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY iter"
    )


def embedding_anisotropy_by_label(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """How much of each label cell's energy lies along the corpus's
    TOP principal direction — the per-slice anisotropy report (the
    'all-but-the-top' diagnostic, Mu & Viswanath 2018): a label whose
    vectors ride the global dominant direction contributes little
    contrast to cosine retrieval, and removing the top component
    would change that slice most. Per label: vectors, mean/max of
    cos²(q, v₁) in ppm (the energy fraction along v₁), and the count
    above 10%.

    Exactness: v₁ comes from the SAME _power_iterate loop as
    embedding_power_iteration (4 rounds); per row the energy fraction
    is (q·v)² / (|q|²·|v|²) — three exact int64 dot products and ONE
    double division, floored to ppm, so both engines compute the
    identical integer. Rollup is label-cardinality.

    Plan (r13): ONE Gram-matrix training pass (matrix-grain collect;
    iterations replay on the driver — see _power_iterate) + one
    scoring pass with the eigenvector as a plan literal; zero
    joins."""
    base = _quantized_embeddings(spark, sf_dir)
    v, _, _ = _power_iterate(base.select("q"))
    vlit = F.array(*[F.lit(x) for x in v])
    vv = sum(x * x for x in v)  # exact int, plan literal
    qv = F.aggregate(
        F.zip_with(F.col("q"), vlit, lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    qq = F.aggregate(
        F.transform(F.col("q"), lambda a: a * a),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = base.select("label", qv.alias("qv"), qq.alias("qq")).where(
        F.col("qq") > 0
    )
    frac_ppm = F.floor(
        (F.col("qv") * F.col("qv"))
        / (F.col("qq") * F.lit(float(vv)))
        * 1e6
    ).cast("long")
    per = scored.select("label", frac_ppm.alias("f"))
    return per.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.floor(F.sum("f") / F.count(F.lit(1)))
        .cast("long")
        .alias("mean_energy_ppm"),
        F.max("f").alias("max_energy_ppm"),
        F.sum((F.col("f") >= 100_000).cast("long")).alias(
            "n_above_10pct"
        ),
    )


def _anisotropy_by_label_sql() -> str:
    ctes, _ = _power_iteration_cte_list()
    last = f"v{PI_ITERS}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
vv AS (
  SELECT sum(cast(v AS hugeint) * v) AS vv FROM {last}
), dots AS (
  SELECT d.vec_id,
         sum(d.qv * v.v) AS qv,
         sum(d.qv * d.qv) AS qq
  FROM qd d JOIN {last} v USING (dim)
  GROUP BY d.vec_id
), per AS (
  SELECT e.label,
         cast(floor((cast(d.qv AS double) * d.qv)
                    / (d.qq * cast(vv.vv AS double)) * 1e6)
              AS bigint) AS f
  FROM dots d JOIN embeddings e USING (vec_id), vv
  WHERE d.qq > 0
)
SELECT label,
       count(*) AS n_vecs,
       cast(floor(sum(f) / (1.0 * count(*))) AS bigint)
         AS mean_energy_ppm,
       max(f) AS max_energy_ppm,
       cast(sum(CASE WHEN f >= 100000 THEN 1 ELSE 0 END) AS bigint)
         AS n_above_10pct
FROM per GROUP BY label
"""
    )


def embedding_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise label-centroid geometry — the embedding-modality twin
    of unigram_kl_matrix: how far apart (cosine) the per-label mean
    vectors sit, and how their magnitudes compare. A retrieval/dedup
    operator reads this before trusting one ANN threshold across
    labels (collapsing centroids = labels are not separable in this
    space; a big norm ratio = per-label score calibration needed).

    Determinism: centroids are exact per-dimension DECIMAL({CENT_DEC})
    sums divided by exact counts (the ivf.centroids discipline);
    cosine/ratio are fixed sequential-fold double expressions floor-
    quantized to q6.

    Plan: ONE corpus aggregate to |labels| x {DIM} decimal sums
    (map-side partial); the pair join is a label-cardinality scalar
    table joined to itself (bounded by the label count, whitelisted
    in tools/plan_audit.py with a SCALE.md row) — the corpus is
    touched exactly once."""
    from goe_spark.catalog import memo_exprs
    from goe_spark.operators.ivf import CENT_DEC, DIM
    from goe_spark.operators.vector import dot, norm2

    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", "embedding"
    )
    # The {DIM}-wide decimal-sum aggregate + centroid array are ~200
    # py4j Column constructions per call; both are pure literal/col
    # trees over fixed names, so build once per JVM (the media-parser
    # memo discipline; DIM/CENT_DEC are module constants).
    agg_exprs = memo_exprs(
        "centroid_shift.sums",
        lambda: [
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(
                    F.element_at("embedding", i + 1).cast(CENT_DEC)
                ).alias(f"s{i}")
                for i in range(DIM)
            ],
        ],
    )
    sums = emb.groupBy("label").agg(*agg_exprs)
    cvec = memo_exprs(
        "centroid_shift.cvec",
        lambda: F.array(
            *[
                (F.col(f"s{i}").cast("double") / F.col("n"))
                for i in range(DIM)
            ]
        ),
    )
    cents = sums.select(
        "label", F.col("n"), cvec.alias("cvec")
    ).localCheckpoint(eager=True)  # |labels| rows; corpus scans once
    a = cents.select(
        F.col("label").alias("label_a"),
        F.col("n").alias("n_a"),
        F.col("cvec").alias("ca"),
    )
    b = cents.select(
        F.col("label").alias("label_b"),
        F.col("n").alias("n_b"),
        F.col("cvec").alias("cb"),
    )
    pair = a.crossJoin(b).where(F.col("label_a") < F.col("label_b"))
    cos = dot(F.col("ca"), F.col("cb")) / F.sqrt(
        norm2(F.col("ca")) * norm2(F.col("cb"))
    )
    ratio = F.sqrt(
        F.least(norm2(F.col("ca")), norm2(F.col("cb")))
        / F.greatest(norm2(F.col("ca")), norm2(F.col("cb")))
    )
    return pair.select(
        F.col("label_a").cast("int").alias("label_a"),
        F.col("label_b").cast("int").alias("label_b"),
        "n_a",
        "n_b",
        F.floor(cos * 1e6 + 0.5).cast("bigint").alias("cos_q6"),
        F.floor(ratio * 1e6 + 0.5).cast("bigint").alias("norm_ratio_q6"),
    )


def _centroid_shift_sql() -> str:
    from goe_spark.operators.ivf import CENT_DEC, DIM

    sum_cols = ", ".join(
        f"sum(CAST(embedding[{i + 1}] AS {CENT_DEC})) AS s{i}"
        for i in range(DIM)
    )
    cvec = (
        "["
        + ", ".join(f"CAST(s{i} AS DOUBLE) / n" for i in range(DIM))
        + "]"
    )
    cos = (
        f"{DOT_SQL.format(a='a.ca', b='b.cb')}"
        f" / sqrt({NORM2_SQL.format(a='a.ca')}"
        f" * {NORM2_SQL.format(a='b.cb')})"
    )
    ratio = (
        f"sqrt(least({NORM2_SQL.format(a='a.ca')},"
        f" {NORM2_SQL.format(a='b.cb')})"
        f" / greatest({NORM2_SQL.format(a='a.ca')},"
        f" {NORM2_SQL.format(a='b.cb')}))"
    )
    return f"""
WITH sums AS (
  SELECT label, count(*) AS n, {sum_cols}
  FROM embeddings GROUP BY label
), cents AS (
  SELECT label, n, {cvec} AS cv FROM sums
), a AS (SELECT label AS label_a, n AS n_a, cv AS ca FROM cents),
b AS (SELECT label AS label_b, n AS n_b, cv AS cb FROM cents)
SELECT cast(label_a AS int) AS label_a,
       cast(label_b AS int) AS label_b,
       n_a, n_b,
       cast(floor(({cos}) * 1e6 + 0.5) AS bigint) AS cos_q6,
       cast(floor(({ratio}) * 1e6 + 0.5) AS bigint) AS norm_ratio_q6
FROM a JOIN b ON label_a < label_b
"""


# Norm-outlier screen: quantized squared-norm bucket width. Values on
# the 1e6 grid give per-vector norm² up to ~1.8e13 on this fixture's
# 64 dims; 1e10 buckets bound the grain table at a few thousand rows
# at ANY corpus size (the domain is the value range, not the corpus).
NORM_BUCKET = 10**10


def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust corrupt-vector screen: per label, median/MAD outlier
    detection on the QUANTIZED squared L2 norm — zeroed vectors,
    double-scaled ingests and NaN-poisoned rows all land in norm
    buckets far from their label's median, and median/MAD doesn't
    move when they do (the value_mad_outliers discipline applied to
    the embedding table).

    Exactness: each vector's norm² is an integer sum of squares on
    the 1e6 grid (map-side F.aggregate fold, no explode, no Python),
    bucketed to a BOUNDED domain (NORM_BUCKET) so the exact
    median/MAD grain machinery applies at any corpus size. The
    cutoff is |bucket - med| * 10000 > 44478 * max(mad, 1) — integer
    end-to-end; max(mad, 1) keeps a degenerate zero-MAD label from
    flagging every off-median vector.

    Plan: one corpus scan with a codegen array fold, one (label,
    bucket) hash aggregate; all windows run on the bounded grain."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    q = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 1e6 + 0.5).cast("long"),
    )
    nq2 = F.aggregate(
        q, F.lit(0).cast("long"), lambda acc, v: acc + v * v
    )
    counts = (
        # integer `div`, NOT double division + cast: a quotient one
        # ulp below an integer would truncate differently from
        # DuckDB's exact `//` on bigints
        emb.select("label", nq2.alias("nq2"))
        .select(
            "label", F.expr(f"nq2 div {NORM_BUCKET}").alias("b")
        )
        .groupBy("label", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = (
        Window.partitionBy("label")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("label")
    cum = counts.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "n", F.sum("c").over(wall)
    )
    med = cum.groupBy("label").agg(
        F.max("n").alias("n_vecs"),
        F.min(
            F.when(F.col("cum") >= F.ceil(F.col("n") / 2), F.col("b"))
        ).alias("med"),
    )
    dev = (
        counts.join(med, "label")
        .select(
            "label", "n_vecs", "med",
            F.abs(F.col("b") - F.col("med")).alias("d"), "c",
        )
        .groupBy("label", "n_vecs", "med", "d")
        .agg(F.sum("c").alias("c"))
    )
    wdev = (
        Window.partitionBy("label")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dcum = dev.withColumn("cum", F.sum("c").over(wdev))
    stats = dcum.groupBy("label", "n_vecs", "med").agg(
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.col("n_vecs") / 2), F.col("d")
            )
        ).alias("mad"),
        F.max("d").alias("max_dev"),
    )
    out = (
        dev.join(stats.select("label", "mad"), "label")
        .where(
            F.col("d") * 10000
            > F.lit(44478) * F.greatest(F.col("mad"), F.lit(1))
        )
        .groupBy("label")
        .agg(F.sum("c").alias("n_outliers"))
    )
    return stats.join(out, "label", "left").select(
        "label",
        "n_vecs",
        F.col("med").alias("med_bucket"),
        F.col("mad").alias("mad_bucket"),
        F.coalesce("n_outliers", F.lit(0)).alias("n_outliers"),
        F.round(
            F.coalesce("n_outliers", F.lit(0)) / F.col("n_vecs"), 6
        ).alias("outlier_share"),
        F.col("max_dev").alias("max_dev_bucket"),
    )


NORM_OUTLIERS_SQL = f"""
WITH counts AS (
  SELECT label,
         cast(list_sum(list_transform(embedding,
                x -> cast(floor(cast(x AS double) * 1e6 + 0.5) AS bigint)
                     * cast(floor(cast(x AS double) * 1e6 + 0.5) AS bigint)))
              // {NORM_BUCKET} AS bigint) AS b,
         count(*) AS c
  FROM embeddings GROUP BY 1, 2
), cum AS (
  SELECT *,
         sum(c) OVER (PARTITION BY label ORDER BY b
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY label) AS n
  FROM counts
), med AS (
  SELECT label, cast(max(n) AS bigint) AS n_vecs,
         min(CASE WHEN cum >= ceil(n / 2.0) THEN b END) AS med
  FROM cum GROUP BY label
), dev AS (
  SELECT counts.label, n_vecs, med, abs(b - med) AS d,
         cast(sum(c) AS bigint) AS c
  FROM counts JOIN med ON counts.label = med.label
  GROUP BY 1, 2, 3, 4
), dcum AS (
  SELECT *,
         sum(c) OVER (PARTITION BY label ORDER BY d
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM dev
), stats AS (
  SELECT label, n_vecs, med,
         min(CASE WHEN cum >= ceil(n_vecs / 2.0) THEN d END) AS mad,
         max(d) AS max_dev
  FROM dcum GROUP BY 1, 2, 3
), outs AS (
  SELECT dev.label, cast(sum(c) AS bigint) AS n_outliers
  FROM dev JOIN stats ON dev.label = stats.label
  WHERE d * 10000 > 44478 * greatest(mad, 1)
  GROUP BY 1
)
SELECT stats.label, n_vecs,
       med AS med_bucket,
       mad AS mad_bucket,
       coalesce(n_outliers, 0) AS n_outliers,
       round(coalesce(n_outliers, 0) / (1.0 * n_vecs), 6)
         AS outlier_share,
       max_dev AS max_dev_bucket
FROM stats LEFT JOIN outs ON stats.label = outs.label
"""


#: a dimension whose quantized variance is below this is "dead" —
#: carries no signal, wastes index bytes, and poisons PQ codebooks
DEAD_DIM_VAR = 1e-6


def embedding_dead_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension distribution audit over the embedding corpus —
    the pre-quantization screen: a DEAD dimension (near-zero variance)
    wastes PQ codebook capacity and signals an upstream projection
    bug; a HOT dimension dominates L2 distances. Per dim: exact
    fixed-point mean/variance (1e6-grid integer sums like
    embedding_norm_outliers; the squared sums ride decimal(38,0) so a
    1e9-vector corpus cannot wrap int64), min/max, and the dead flag.

    Plan: posexplode to (dim, q) rides map-side partial aggregation —
    the shuffle carries 64 x n_partitions partial rows, never the
    corpus; output is dimension-grain (64 rows) at any scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 1e6 + 0.5).cast("long"),
    )
    per = emb.select(F.posexplode(q).alias("dim", "qv"))
    n = F.count(F.lit(1))
    sq = F.sum("qv")
    sqq = F.sum((F.col("qv") * F.col("qv")).cast("decimal(38,0)"))
    mean = sq.cast("double") / n / 1e6
    var = (
        sqq.cast("double") / n
        - (sq.cast("double") / n) * (sq.cast("double") / n)
    ) / 1e12
    return per.groupBy("dim").agg(
        n.alias("n_vecs"),
        F.round(mean, 6).alias("mean_r6"),
        F.round(var, 8).alias("var_r8"),
        F.min("qv").alias("min_q"),
        F.max("qv").alias("max_q"),
        (var < F.lit(DEAD_DIM_VAR)).cast("long").alias("is_dead"),
    )


DEAD_DIMS_SQL = f"""
WITH per AS (
  SELECT cast(d AS int) AS dim,
         cast(floor(cast(embedding[d + 1] AS double) * 1e6 + 0.5)
              AS bigint) AS qv
  FROM embeddings, LATERAL unnest(range({EMB_DIM})) AS r(d)
)
SELECT dim,
       count(*) AS n_vecs,
       round(cast(sum(qv) AS double) / count(*) / 1e6, 6) AS mean_r6,
       round((cast(sum(cast(qv AS hugeint) * qv) AS double) / count(*)
              - (cast(sum(qv) AS double) / count(*))
                * (cast(sum(qv) AS double) / count(*))) / 1e12, 8)
         AS var_r8,
       min(qv) AS min_q,
       max(qv) AS max_q,
       cast(CASE WHEN (cast(sum(cast(qv AS hugeint) * qv) AS double)
                       / count(*)
                       - (cast(sum(qv) AS double) / count(*))
                         * (cast(sum(qv) AS double) / count(*))) / 1e12
                      < {DEAD_DIM_VAR} THEN 1 ELSE 0 END AS bigint)
         AS is_dead
FROM per GROUP BY dim
"""


def embedding_dispersion_by_label(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Within-label embedding DISPERSION — the diversity/coherence
    number a curator reads before using labels for stratified
    sampling or hard-negative mining: per label, the EXACT mean
    pairwise dot product over all n*(n-1) ordered pairs and the mean
    squared distance, computed WITHOUT forming a single pair via the
    sum-vector identity sum_{{u != v}} <u,v> = ||sum v||^2 - sum ||v||^2.
    A label whose mean pairwise dot approaches its mean self-dot is a
    near-duplicate cluster (low diversity); a label near zero is
    incoherent.

    Exactness discipline: vectors quantize to the 1e6 integer grid
    (the embedding_dead_dims convention); per-dim sums are int64, the
    squared sums ride decimal(38,0) (hugeint in DuckDB) so nothing
    wraps at corpus scale; each metric is ONE double expression over
    exact integer totals, so summation order cannot move the hash.

    Plan: the O(n^2) pair semantics costs ONE corpus pass — posexplode
    to (label, dim, qv) with map-side partial aggregation, a
    (label x {EMB_DIM})-row intermediate, then a label-grain rollup.
    Compare embedding_near_dup_pairs, which pays the real pair join;
    this is the aggregate-only counterpart at any scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 1e6 + 0.5).cast("long"),
    )
    qd = emb.select("label", F.posexplode(q).alias("dim", "qv"))
    per_dim = qd.groupBy("label", "dim").agg(
        F.sum("qv").alias("s"),
        F.sum((F.col("qv") * F.col("qv")).cast("decimal(38,0)")).alias(
            "ss"
        ),
    )
    lab = per_dim.groupBy("label").agg(
        F.sum(
            F.col("s").cast("decimal(38,0)")
            * F.col("s").cast("decimal(38,0)")
        ).alias("s2"),
        F.sum("ss").alias("ssq"),
    )
    nv = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    j = lab.join(nv, "label")
    n = F.col("n")
    self_dot = F.col("ssq").cast("double") / n / 1e12
    pair_dot = (
        (F.col("s2").cast("double") - F.col("ssq").cast("double"))
        / (n * (n - F.lit(1)))
        / 1e12
    )
    return j.select(
        "label",
        n.cast("long").alias("n_vecs"),
        F.round(self_dot, 6).alias("mean_self_dot_q6"),
        F.when(n > 1, F.round(pair_dot, 6)).alias("mean_pair_dot_q6"),
        F.when(n > 1, F.round(2 * (self_dot - pair_dot), 6)).alias(
            "mean_sq_dist_q6"
        ),
    )


DISPERSION_SQL = f"""
WITH qd AS (
  SELECT label, cast(d AS int) AS dim,
         cast(floor(cast(embedding[d + 1] AS double) * 1e6 + 0.5)
              AS bigint) AS qv
  FROM embeddings, LATERAL unnest(range({EMB_DIM})) AS r(d)
), per_dim AS (
  SELECT label, dim, cast(sum(qv) AS bigint) AS s,
         sum(cast(qv AS hugeint) * qv) AS ss
  FROM qd GROUP BY label, dim
), lab AS (
  SELECT label, sum(cast(s AS hugeint) * s) AS s2, sum(ss) AS ssq
  FROM per_dim GROUP BY label
), nv AS (
  SELECT label, count(*) AS n FROM embeddings GROUP BY label
)
SELECT l.label,
       cast(n AS bigint) AS n_vecs,
       round(cast(ssq AS double) / n / 1e12, 6) AS mean_self_dot_q6,
       CASE WHEN n > 1 THEN
         round((cast(s2 AS double) - cast(ssq AS double))
               / (n * (n - 1)) / 1e12, 6) END AS mean_pair_dot_q6,
       CASE WHEN n > 1 THEN
         round(2 * (cast(ssq AS double) / n / 1e12
                    - (cast(s2 AS double) - cast(ssq AS double))
                      / (n * (n - 1)) / 1e12), 6) END AS mean_sq_dist_q6
FROM lab l JOIN nv USING (label)
"""


QUERIES = [
    QuerySpec(
        "embedding_dead_dims",
        embedding_dead_dims,
        DEAD_DIMS_SQL,
        "per-dimension variance audit (dead-dim / PQ-prep screen)",
    ),
    QuerySpec(
        "embedding_dispersion_by_label",
        embedding_dispersion_by_label,
        DISPERSION_SQL,
        "exact mean pairwise dot / squared distance per label via the "
        "sum-vector identity (no pair join)",
    ),
    QuerySpec(
        "embedding_norm_outliers",
        embedding_norm_outliers,
        NORM_OUTLIERS_SQL,
        "median/MAD corrupt-vector screen on quantized norms",
    ),
    QuerySpec("ann_bruteforce_topk", ann_bruteforce_topk, ANN_BRUTEFORCE_SQL),
    QuerySpec(
        "knn_graph_stats",
        knn_graph_stats,
        _knn_graph_sql(),
        "mutual-kNN graph reciprocity per embedding cell",
    ),
    QuerySpec(
        "embedding_dimension_stats",
        embedding_dimension_stats,
        EMB_DIM_STATS_SQL,
        "per-dimension mean/variance anisotropy audit",
    ),
    QuerySpec(
        "knn_graph_ivf_stats",
        knn_graph_ivf_stats,
        _knn_graph_ivf_sql(),
        "kNN-graph reciprocity over the IVF quantizer's cells",
    ),
    QuerySpec(
        "embedding_gram_summary",
        embedding_gram_summary,
        _gram_sql(),
        "exact distributed Gram matrix (PCA precursor) per-dim summary",
    ),
    QuerySpec(
        "hybrid_search_rrf",
        hybrid_search_rrf,
        HYBRID_RRF_SQL,
        "lexical+vector reciprocal-rank fusion",
    ),
    QuerySpec(
        "embedding_near_dup_pairs", embedding_near_dup_pairs, _near_dup_sql()
    ),
    QuerySpec("ann_ivf_topk", ann_ivf_topk, _ann_ivf_sql()),
    QuerySpec("ann_lsh_topk", ann_lsh_topk, _ann_lsh_sql()),
    QuerySpec("ann_pq_topk", ann_pq_topk, _ann_pq_sql()),
    QuerySpec("ann_ivf_pq_topk", ann_ivf_pq_topk, _ann_ivf_pq_sql()),
    QuerySpec(
        "embedding_cluster_audit", embedding_cluster_audit, _cluster_audit_sql()
    ),
    QuerySpec(
        "dedup_method_agreement", dedup_method_agreement, _agreement_sql()
    ),
    QuerySpec(
        "semantic_dedup_keep_first",
        semantic_dedup_keep_first,
        _semantic_dedup_sql(),
    ),
    QuerySpec(
        "embedding_int8_audit",
        embedding_int8_audit,
        _int8_audit_sql(),
        "symmetric per-dim int8 quantization error/cosine audit",
    ),
    QuerySpec(
        "matryoshka_recall_audit",
        matryoshka_recall_audit,
        _matryoshka_sql(),
        "top-k recall surviving dimension truncation",
    ),
    QuerySpec(
        "embedding_centroid_shift",
        embedding_centroid_shift,
        _centroid_shift_sql(),
        "pairwise label-centroid cosine/norm geometry (embedding drift)",
    ),
    QuerySpec(
        "embedding_power_iteration",
        embedding_power_iteration,
        _power_iteration_sql(),
        "fixed-point power-iteration top-PC anisotropy audit",
    ),
    QuerySpec(
        "knn_label_agreement",
        knn_label_agreement,
        _knn_label_agreement_sql(),
        "kNN label-noise audit over IVF-bounded neighbourhoods",
    ),
    QuerySpec(
        "hard_negative_mining_stats",
        hard_negative_mining_stats,
        _hard_negative_sql(),
        "contrastive-training prep: per-label hard-negative ranks and "
        "pos/neg cosine margins",
    ),
    QuerySpec(
        "embedding_anisotropy_by_label",
        embedding_anisotropy_by_label,
        _anisotropy_by_label_sql(),
        "per-label energy share along the power-iterated top PC",
    ),
]
