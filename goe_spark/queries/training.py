"""Training-data pipeline operators over the documents table.

Beyond-reference scope (BASELINE.json north star): the three steps a
100 TB pretraining pipeline runs AFTER near-dup pair generation and
text analysis — cluster resolution, deterministic sampling, and
sequence packing.

- dedup_clusters: connected components over the MinHash-LSH candidate
  pairs (the step that turns pairwise near-dups into keep-one-per-
  cluster decisions). Iterative min-label propagation: per round each
  node takes the min label among itself and its neighbors; rounds
  bounded by component diameter, and near-dup components are star-like
  (a template plus its variants) so convergence is fast. Each round is
  one join + one groupBy on the EDGE table only — the corpus payload
  never enters the loop. At larger diameters the alternating
  large-star/small-star variant (Kiveris et al., "Connected Components
  in MapReduce", SoCC'14) halves diameter per round; simple
  propagation keeps the oracle (a recursive CTE) exactly replayable.

- stratified_sample_docs: per-language deterministic sampling by
  bucketing a 60-bit content-independent hash of doc_id into 100
  buckets — reproducible across runs/engines (no RNG state), map-side
  only, and exactly mirrored by the DuckDB oracle.

- token_pack_bins: greedy contiguous packing of documents into
  fixed token budgets (the sequence-packing step that turns documents
  into training rows). Deterministic: docs ordered by doc_id within
  (lang, shard), exclusive-cumsum window assigns each doc the bin its
  first token lands in. The shard key (hash of doc_id) is the scale
  design: a window partitioned by lang alone would funnel an entire
  language through one task at 100 TB, so packing is per (lang,
  shard) — bins never cross shards, which is exactly what a training
  loader wants (shards are its parallelism unit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.catalog import load_table
from goe_spark.functions import text as T
from goe_spark.functions.hashing import hash64, hash64_sql
from goe_spark.queries import QuerySpec
from goe_spark.queries.dedup import _minhash_lsh_sql, minhash_lsh_pairs

MAX_CC_ITERS = 20

# Connected components below this edge count resolve with a driver-
# side union-find: the LSH pair set is bucket-capped (tiny next to
# the corpus), and at bench scale the iterative loop's ~5 Spark jobs
# of sub-thousand-row shuffles cost ~2 s of pure scheduling overhead
# for work a single task finishes in milliseconds. 1M edges collect
# to ~50 MB of driver tuples — well inside bounds; anything larger
# takes the distributed min-label loop below (the 100 TB path).
CC_DRIVER_EDGE_CAP = 1_000_000

# Per-language sampling rates out of 100 (en kept at 3x the default —
# the usual "downsample the dominant language" shape).
SAMPLE_RATE_DEFAULT = 10
SAMPLE_RATE_EN = 30

PACK_BUDGET_TOKENS = 512
PACK_SHARDS = 8


def _cc_labels_driver(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Union-find with path compression over a collected edge list.
    Output is identical to the distributed loop (label = component min
    node) regardless of union order, pinned by
    tests/test_training_ops.py::test_driver_and_distributed_cc_agree."""
    return _cc_labels_driver_rows(spark, edges.collect())


def _cc_labels_driver_rows(spark: SparkSession, rows) -> DataFrame:
    """_cc_labels_driver over an already-collected edge row list —
    lets _cc_labels reuse its cap-probe collect instead of paying a
    second count job (rows carry .id1/.id2)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = r.id1, r.id2
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    members: dict[int, list[int]] = {}
    for node in parent:
        members.setdefault(find(node), []).append(node)
    rows = [
        (node, min(group))
        for group in members.values()
        for node in group
    ]
    return spark.createDataFrame(rows, "node long, label long")


def _cc_labels(
    spark: SparkSession,
    sf_dir: str,
    docs: DataFrame | None = None,
    edges: DataFrame | None = None,
) -> DataFrame:
    """(node, label) per doc appearing in any near-dup pair; label =
    the component's min doc_id (iterative min-label propagation).
    ``docs`` narrows pair generation to a pipeline stage's subset;
    ``edges`` (already-checkpointed (id1, id2)) skips pair generation
    entirely — callers that also consume the pair table pass it so
    the LSH job runs once, not twice."""
    if edges is None:
        edges = (
            minhash_lsh_pairs(spark, sf_dir, docs)
            .select("id1", "id2")
            # The pair generator is itself a multi-stage job;
            # checkpoint so the CC loop's 2xITERS references don't
            # replay it every round. LAZY: the cap probe below is the
            # first consumer and materializes the blocks it touches —
            # an eager checkpoint paid a separate blocking job first.
            .localCheckpoint(eager=False)
        )
    # ONE action instead of count-then-collect: collect at most
    # CAP + 1 rows — if the limit returns <= CAP rows it IS the
    # complete edge set (drive the union-find over it); a truncated
    # CAP + 1 result means the old count() > CAP branch, so fall
    # through to the distributed loop. Never collects more than
    # CAP + 1 rows, so the driver-memory bound is unchanged.
    probe = edges.limit(CC_DRIVER_EDGE_CAP + 1).collect()
    if len(probe) <= CC_DRIVER_EDGE_CAP:
        return _cc_labels_driver_rows(spark, probe)
    sym = edges.union(
        edges.select(F.col("id2").alias("id1"), F.col("id1").alias("id2"))
    )
    labels = (
        sym.select(F.col("id1").alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(MAX_CC_ITERS):
        neighbor_min = (
            sym.join(
                labels.select(
                    F.col("node").alias("id2"), F.col("label").alias("nl")
                ),
                "id2",
            )
            .groupBy(F.col("id1").alias("node"))
            .agg(F.min("nl").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    "label", F.coalesce("nmin", F.col("label"))
                ).alias("label"),
                (F.col("nmin") < F.col("label")).alias("chg"),
            )
        ).localCheckpoint(eager=True)
        changed = new_labels.where("chg").count()
        labels = new_labels.drop("chg")
        if changed == 0:
            break
    else:  # pragma: no cover - adversarial chain longer than the cap
        raise RuntimeError(
            f"connected components did not converge in {MAX_CC_ITERS} rounds"
        )
    return labels


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve near-dup pairs into clusters; one row per cluster with
    its min-doc_id label and size. Components have >= 2 docs by
    construction (every node has an edge)."""
    labels = _cc_labels(spark, sf_dir)
    return (
        labels.groupBy(F.col("label").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.max("node").alias("max_doc_id"))
    )


DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE lsh_pairs AS (
  SELECT id1, id2 FROM ({_minhash_lsh_sql()})
), edges AS (
  SELECT id1 AS src, id2 AS dst FROM lsh_pairs
  UNION ALL
  SELECT id2, id1 FROM lsh_pairs
), reach(node, anc) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.anc FROM reach r JOIN edges e ON e.src = r.node
), labels AS (
  SELECT node, min(anc) AS cluster_id FROM reach GROUP BY node
)
SELECT cluster_id, count(*) AS n_docs, max(node) AS max_doc_id
FROM labels GROUP BY cluster_id
"""


def dedup_cluster_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster PROVENANCE mix — the diagnostic that tells a
    curator whether duplication is syndication (clusters spanning
    SOURCES: drop all but one feed) or re-crawls (single-source
    clusters: fix the crawler), which imply different fixes upstream
    of dedup. One summary row: clusters, clustered docs,
    single-source vs cross-source cluster counts, cross rate per 10k,
    and the widest cluster's source spread.

    Plan: rides the capped LSH pair set and the CC labels
    (operators/ranks-style bounded iteration, pair-bounded relation);
    the source join moves (doc_id, source) — label-relation grain —
    and the rollup is a single row. Nothing corpus-quadratic."""
    labels = _cc_labels(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    per_cluster = (
        labels.join(docs, labels.node == docs.doc_id)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
        )
    )
    return per_cluster.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("n_docs").alias("n_clustered_docs"),
        F.sum((F.col("n_sources") == 1).cast("long")).alias(
            "n_single_source"
        ),
        F.sum((F.col("n_sources") > 1).cast("long")).alias(
            "n_cross_source"
        ),
        F.floor(
            F.sum((F.col("n_sources") > 1).cast("long"))
            * 10000.0
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("cross_per_10k"),
        F.max("n_sources").alias("max_sources"),
    )


DEDUP_CLUSTER_SOURCE_MIX_SQL = f"""
WITH RECURSIVE lsh_pairs AS (
  SELECT id1, id2 FROM ({_minhash_lsh_sql()})
), edges AS (
  SELECT id1 AS src, id2 AS dst FROM lsh_pairs
  UNION ALL
  SELECT id2, id1 FROM lsh_pairs
), reach(node, anc) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.anc FROM reach r JOIN edges e ON e.src = r.node
), labels AS (
  SELECT node, min(anc) AS cluster_id FROM reach GROUP BY node
), per_cluster AS (
  SELECT l.cluster_id,
         count(*) AS n_docs,
         count(DISTINCT d.source) AS n_sources
  FROM labels l JOIN documents d ON d.doc_id = l.node
  GROUP BY l.cluster_id
)
SELECT count(*) AS n_clusters,
       cast(sum(n_docs) AS bigint) AS n_clustered_docs,
       cast(sum(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS bigint)
         AS n_single_source,
       cast(sum(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END) AS bigint)
         AS n_cross_source,
       cast(floor(sum(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END)
                  * 10000.0 / count(*)) AS bigint) AS cross_per_10k,
       max(n_sources) AS max_sources
FROM per_cluster
"""


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation decision near-dup clustering exists to make: per
    cluster, KEEP the highest-quality document (ties broken by lowest
    doc_id so both engines agree), drop the rest. Output: one row per
    cluster with the survivor and what was dropped. The quality score
    is the same composite queries/text.py reports, so the whole
    pipeline — pairs -> clusters -> keep decision — shares one
    definition of 'better'. Scale: the labels table is pair-bounded
    (tiny next to the corpus); the quality join touches only clustered
    docs via a broadcast-able semi-selection, and the keep decision is
    one row_number window over cluster-sized groups."""
    from pyspark.sql.window import Window

    labels = _cc_labels(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", T.quality_score("text").alias("quality")
    )
    # quality_score is already quantized to the 1e-6 grid internally
    # (floor-based half-up — see its docstring for the cross-engine
    # round() divergence the sf1 probe caught)
    scored = labels.join(d, labels.node == d.doc_id).select(
        F.col("label").alias("cluster_id"),
        "doc_id",
        "quality",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    ranked = scored.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("cluster_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("keep_doc_id"),
        F.max(F.when(F.col("rn") == 1, F.col("quality"))).alias("keep_quality"),
        (F.count(F.lit(1)) - 1).alias("n_dropped"),
    )


def _dedup_keep_best_sql() -> str:
    from goe_spark.functions.text import quality_score_sql

    return f"""
WITH RECURSIVE lsh_pairs AS (
  SELECT id1, id2 FROM ({_minhash_lsh_sql()})
), edges AS (
  SELECT id1 AS src, id2 AS dst FROM lsh_pairs
  UNION ALL
  SELECT id2, id1 FROM lsh_pairs
), reach(node, anc) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.anc FROM reach r JOIN edges e ON e.src = r.node
), labels AS (
  SELECT node, min(anc) AS cluster_id FROM reach GROUP BY node
), scored AS (
  SELECT l.cluster_id, d.doc_id,
         {quality_score_sql('d.text')} AS quality
  FROM labels l JOIN documents d ON d.doc_id = l.node
), ranked AS (
  SELECT cluster_id, doc_id, quality,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY quality DESC, doc_id ASC) AS rn
  FROM scored
)
SELECT cluster_id,
       max(CASE WHEN rn = 1 THEN doc_id END)  AS keep_doc_id,
       max(CASE WHEN rn = 1 THEN quality END) AS keep_quality,
       count(*) - 1                           AS n_dropped
FROM ranked GROUP BY cluster_id
"""


def dedup_survivor_bias_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """What the keep-best dedup rule REMOVES, per source — the bias
    audit a curator runs before trusting a dedup pass: a source whose
    docs disproportionately lose the per-cluster quality argmax is
    being silently downweighted by dedup (syndicated feeds whose
    copies are marginally worse, re-crawls with boilerplate drift).
    Per source: docs, clustered docs, removed docs (non-survivors
    under the SAME keep-best rule as dedup_keep_best), removal rate
    per 10k, token mass removed, and mean quality of removed vs
    surviving clustered docs.

    Plan: rides the pair-bounded CC labels; quality/token scoring
    joins only clustered docs (label-relation grain); the per-source
    totals are one cheap corpus aggregate joined at source grain
    (<= catalog-bounded rows). Nothing corpus-quadratic."""
    from pyspark.sql.window import Window

    labels = _cc_labels(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        T.quality_score("text").alias("quality"),
        T.token_count("text").alias("n_tokens"),
    )
    scored = labels.join(d, labels.node == d.doc_id).select(
        F.col("label").alias("cluster_id"),
        "doc_id",
        "source",
        "quality",
        "n_tokens",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    ranked = scored.withColumn(
        "removed", (F.row_number().over(w) > 1).cast("long")
    )
    per_source_cluster = ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_clustered"),
        F.sum("removed").alias("n_removed"),
        F.sum(F.col("removed") * F.col("n_tokens")).alias(
            "tokens_removed"
        ),
        # try_divide: a source whose clustered docs are ALL rank-1
        # survivors has sum(removed)=0 — the ratio must be NULL (as
        # DuckDB's /0 yields) rather than raise under the driver's
        # ANSI-on session. kept-denominator is provably >=1 per group
        # but hardened identically for free.
        F.round(
            F.try_divide(
                F.sum(F.col("removed") * F.col("quality")),
                F.sum("removed"),
            ),
            6,
        ).alias("avg_quality_removed"),
        F.round(
            F.try_divide(
                F.sum((1 - F.col("removed")) * F.col("quality")),
                F.sum(1 - F.col("removed")),
            ),
            6,
        ).alias("avg_quality_kept"),
    )
    totals = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        totals.join(per_source_cluster, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_clustered", F.lit(0)).alias("n_clustered"),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
            F.floor(
                F.coalesce("n_removed", F.lit(0)) * 10000.0 / F.col("n_docs")
            ).cast("long").alias("removed_per_10k"),
            F.coalesce("tokens_removed", F.lit(0)).alias("tokens_removed"),
            "avg_quality_removed",
            "avg_quality_kept",
        )
    )


def _survivor_bias_sql() -> str:
    from goe_spark.functions.text import quality_score_sql, token_count_sql

    return f"""
WITH RECURSIVE lsh_pairs AS (
  SELECT id1, id2 FROM ({_minhash_lsh_sql()})
), edges AS (
  SELECT id1 AS src, id2 AS dst FROM lsh_pairs
  UNION ALL
  SELECT id2, id1 FROM lsh_pairs
), reach(node, anc) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.anc FROM reach r JOIN edges e ON e.src = r.node
), labels AS (
  SELECT node, min(anc) AS cluster_id FROM reach GROUP BY node
), scored AS (
  SELECT l.cluster_id, d.doc_id, d.source,
         {quality_score_sql('d.text')} AS quality,
         {token_count_sql('d.text')} AS n_tokens
  FROM labels l JOIN documents d ON d.doc_id = l.node
), ranked AS (
  SELECT *, CASE WHEN row_number() OVER (
              PARTITION BY cluster_id
              ORDER BY quality DESC, doc_id ASC) > 1
            THEN 1 ELSE 0 END AS removed
  FROM scored
), per_source AS (
  SELECT source,
         count(*) AS n_clustered,
         cast(sum(removed) AS bigint) AS n_removed,
         cast(sum(removed * n_tokens) AS bigint) AS tokens_removed,
         round(sum(removed * quality) / sum(removed), 6)
           AS avg_quality_removed,
         round(sum((1 - removed) * quality) / sum(1 - removed), 6)
           AS avg_quality_kept
  FROM ranked GROUP BY source
), totals AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
)
SELECT t.source,
       t.n_docs,
       coalesce(p.n_clustered, 0) AS n_clustered,
       coalesce(p.n_removed, 0) AS n_removed,
       cast(floor(coalesce(p.n_removed, 0) * 10000.0 / t.n_docs)
            AS bigint) AS removed_per_10k,
       coalesce(p.tokens_removed, 0) AS tokens_removed,
       p.avg_quality_removed,
       p.avg_quality_kept
FROM totals t LEFT JOIN per_source p USING (source)
"""


def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sampling audit: hash doc_id into 100
    buckets, keep buckets below the language's rate. Output is the
    per-(lang, source) sample accounting a pipeline run would log."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(hash64(F.col("doc_id").cast("string")), F.lit(100))
    rate = F.when(F.col("lang") == "en", F.lit(SAMPLE_RATE_EN)).otherwise(
        F.lit(SAMPLE_RATE_DEFAULT)
    )
    return (
        d.select("lang", "source", (bucket < rate).alias("sampled"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("sampled").cast("long")).alias("n_sampled"),
        )
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT lang, source,
       count(*) AS n_total,
       cast(sum(CASE WHEN ({hash64_sql('cast(doc_id AS varchar)')} % 100) <
                          (CASE WHEN lang = 'en' THEN {SAMPLE_RATE_EN}
                                ELSE {SAMPLE_RATE_DEFAULT} END)
                     THEN 1 ELSE 0 END)
            AS bigint) AS n_sampled
FROM documents
GROUP BY lang, source
"""


def token_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous sequence packing: per (lang, shard), docs in
    doc_id order fill {PACK_BUDGET_TOKENS}-token bins; a doc belongs
    to the bin its first token lands in. Output: per-language packing
    accounting (bins, docs, fill)."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", T.token_count("text").alias("n_tokens")
    )
    shard = F.pmod(hash64(F.col("doc_id").cast("string")), F.lit(PACK_SHARDS))
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = (
        d.withColumn("shard", shard)
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn(
            "bin",
            F.floor(
                (F.col("cum") - F.col("n_tokens"))
                / F.lit(PACK_BUDGET_TOKENS)
            ),
        )
    )
    per_bin = binned.groupBy("lang", "shard", "bin").agg(
        F.count(F.lit(1)).alias("docs_in_bin"),
        F.sum("n_tokens").alias("bin_tokens"),
    )
    return per_bin.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("docs_in_bin").alias("n_docs"),
        F.max("bin_tokens").alias("max_bin_tokens"),
        F.round(F.avg("bin_tokens"), 4).alias("avg_bin_tokens"),
    )


TOKEN_PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang,
         {T.token_count_sql('text')} AS n_tokens,
         ({hash64_sql('cast(doc_id AS varchar)')} % {PACK_SHARDS}) AS shard
  FROM documents
), binned AS (
  SELECT lang, shard, n_tokens,
         floor((sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) - n_tokens)
               / {PACK_BUDGET_TOKENS}) AS bin
  FROM toks
), per_bin AS (
  SELECT lang, shard, bin, count(*) AS docs_in_bin,
         sum(n_tokens) AS bin_tokens
  FROM binned GROUP BY 1, 2, 3
)
SELECT lang,
       count(*)                       AS n_bins,
       cast(sum(docs_in_bin) AS bigint)   AS n_docs,
       -- bin_tokens is SUM(int) = HUGEINT -> float64 in pandas
       cast(max(bin_tokens) AS bigint)    AS max_bin_tokens,
       round(avg(bin_tokens), 4)      AS avg_bin_tokens
FROM per_bin GROUP BY lang
"""


# Context lengths the packing-waste sweep evaluates (tokens).
PACK_SWEEP_LENS = (512, 1024, 2048, 4096)


def packing_waste_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing waste across candidate context lengths — the
    table that picks a training context length and packing strategy:
    per (lang, seq_len in {PACK_SWEEP_LENS}), BOTH packing models'
    costs. Pad model (one doc per sequence, ceil(t/L) sequences):
    sequence count and padding waste. Concat model (GPT-style stream
    chunking in doc_id order per shard): sequence count, tail waste
    (only the last partial chunk of each shard pads), and
    docs_split — documents straddling a chunk boundary, the
    fragmentation cost concat packing pays instead of padding. Short
    contexts waste little padding but split many docs; long contexts
    invert the trade.

    Plan: ONE cumulative-sum window per (lang, shard) — the
    token_pack_bins shard discipline that bounds any language's
    partition — shared by every seq_len via arithmetic (no per-L
    window); the sweep explodes a {len(PACK_SWEEP_LENS)}-element
    struct array; rollups are (lang x seq_len)-grain, and the shard
    tail frame is (lang x shard)-grain."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", T.token_count("text").alias("n_tokens")
    )
    shard = F.pmod(
        hash64(F.col("doc_id").cast("string")), F.lit(PACK_SHARDS)
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = (
        d.withColumn("shard", shard)
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn("start", F.col("cum") - F.col("n_tokens"))
    )
    t = F.col("n_tokens")
    doc_sweep = base.select(
        "lang",
        "n_tokens",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(L).alias("seq_len"),
                        (
                            F.floor(F.col("start") / F.lit(L))
                            != F.floor((F.col("cum") - 1) / F.lit(L))
                        )
                        .cast("long")
                        .alias("crosses"),
                        F.floor((t + F.lit(L - 1)) / F.lit(L))
                        .cast("long")
                        .alias("pad_seqs"),
                    )
                    for L in PACK_SWEEP_LENS
                ]
            )
        ).alias("x"),
    )
    docs_agg = doc_sweep.groupBy(
        "lang", F.col("x.seq_len").alias("seq_len")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("x.crosses").alias("docs_split"),
        F.sum("x.pad_seqs").alias("pad_seqs"),
    )
    shard_tot = base.groupBy("lang", "shard").agg(
        F.max("cum").alias("st")
    )
    tail_sweep = shard_tot.select(
        "lang",
        "st",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(L).alias("seq_len"),
                        F.floor((F.col("st") + F.lit(L - 1)) / F.lit(L))
                        .cast("long")
                        .alias("cseqs"),
                    )
                    for L in PACK_SWEEP_LENS
                ]
            )
        ).alias("x"),
    )
    tails_agg = tail_sweep.groupBy(
        "lang", F.col("x.seq_len").alias("seq_len")
    ).agg(
        F.sum("x.cseqs").alias("concat_seqs"),
        (
            F.sum(F.col("x.cseqs") * F.col("x.seq_len")) - F.sum("st")
        ).alias("concat_tail_waste"),
    )
    j = docs_agg.join(tails_agg, ["lang", "seq_len"])
    pad_waste = (
        F.col("pad_seqs") * F.col("seq_len") - F.col("total_tokens")
    )
    return j.select(
        "lang",
        "seq_len",
        "n_docs",
        "total_tokens",
        "docs_split",
        F.floor(F.col("docs_split") * 10000 / F.col("n_docs"))
        .cast("long")
        .alias("split_per_10k"),
        "pad_seqs",
        pad_waste.cast("long").alias("pad_waste"),
        F.floor(
            pad_waste * 10000 / (F.col("pad_seqs") * F.col("seq_len"))
        )
        .cast("long")
        .alias("pad_waste_per_10k"),
        "concat_seqs",
        F.col("concat_tail_waste").cast("long").alias("concat_tail_waste"),
    )


def _packing_sweep_sql() -> str:
    lens_vals = ", ".join(f"({L})" for L in PACK_SWEEP_LENS)
    return f"""
WITH toks AS (
  SELECT doc_id, lang,
         {T.token_count_sql('text')} AS n_tokens,
         ({hash64_sql('cast(doc_id AS varchar)')} % {PACK_SHARDS}) AS shard
  FROM documents
), base AS (
  SELECT lang, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM toks
), doc_sweep AS (
  SELECT lang, n_tokens, l.seq_len,
         CASE WHEN floor((cum - n_tokens) / (1.0 * l.seq_len))
                   <> floor((cum - 1) / (1.0 * l.seq_len))
              THEN 1 ELSE 0 END AS crosses,
         cast(floor((n_tokens + l.seq_len - 1) / (1.0 * l.seq_len))
              AS bigint) AS pad_seqs
  FROM base CROSS JOIN (VALUES {lens_vals}) AS l(seq_len)
), docs_agg AS (
  SELECT lang, seq_len,
         count(*) AS n_docs,
         cast(sum(n_tokens) AS bigint) AS total_tokens,
         cast(sum(crosses) AS bigint) AS docs_split,
         cast(sum(pad_seqs) AS bigint) AS pad_seqs
  FROM doc_sweep GROUP BY lang, seq_len
), shard_tot AS (
  SELECT lang, shard, max(cum) AS st FROM base GROUP BY lang, shard
), tails_agg AS (
  SELECT lang, l.seq_len,
         cast(sum(floor((st + l.seq_len - 1) / (1.0 * l.seq_len)))
              AS bigint) AS concat_seqs,
         cast(sum(floor((st + l.seq_len - 1) / (1.0 * l.seq_len))
                  * l.seq_len) - sum(st) AS bigint)
           AS concat_tail_waste
  FROM shard_tot CROSS JOIN (VALUES {lens_vals}) AS l(seq_len)
  GROUP BY lang, l.seq_len
)
SELECT d.lang, cast(d.seq_len AS int) AS seq_len, d.n_docs,
       d.total_tokens, d.docs_split,
       cast(floor(d.docs_split * 10000.0 / d.n_docs) AS bigint)
         AS split_per_10k,
       d.pad_seqs,
       cast(d.pad_seqs * d.seq_len - d.total_tokens AS bigint)
         AS pad_waste,
       cast(floor((d.pad_seqs * d.seq_len - d.total_tokens) * 10000.0
                  / (d.pad_seqs * d.seq_len)) AS bigint)
         AS pad_waste_per_10k,
       t.concat_seqs, t.concat_tail_waste
FROM docs_agg d JOIN tails_agg t USING (lang, seq_len)
"""


EVAL_SOURCE = "src0"  # the fixture slice standing in for a benchmark
MIN_SHARED_SHINGLES = 5


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: which training documents share
    enough word-3-gram shingles with the eval/benchmark slice that
    they would leak the benchmark into training. The standard
    pretraining hygiene step (n-gram overlap decontamination).

    Plan: the eval side is a benchmark — tiny by construction — so its
    exploded shingle set is BROADCAST; the training corpus streams
    past it map-side, shared-shingle counts partial-aggregate before
    the one shuffle on (train, eval) pairs, and pairs below
    MIN_SHARED_SHINGLES drop at the aggregate. At 100 TB the eval
    broadcast is the whole trick: the corpus is never shuffled on
    shingle. Shingle sets come from the MATERIALIZED signature index
    (operators/minhash_index — bit-identical to recomputation by the
    index's contract), joined to the narrow (doc_id, source)
    projection of the catalog table: the expensive shingle pass is
    paid once per corpus across ALL dedup consumers, not per query
    (round-8 bench caught the recomputing form at 43 s vs ~1 s).
    A df-quantile stop-shingle cap would trim boilerplate join
    fan-out; the threshold already suppresses its false positives.

    Output: one row per contaminated training doc — how many eval
    docs it hits and the worst overlap.
    """
    from goe_spark.catalog import load_table as _lt
    from goe_spark.operators.minhash_index import (
        ensure_signature_index,
        load_signatures,
    )

    idx = load_signatures(
        spark, ensure_signature_index(spark, sf_dir)
    ).select("doc_id", F.col("shd"))
    src = _lt(spark, sf_dir, "documents").select("doc_id", "source")
    sh = idx.join(src, "doc_id")
    eval_ex = sh.where(F.col("source") == EVAL_SOURCE).select(
        F.col("doc_id").alias("eval_id"), F.explode("shd").alias("g")
    )
    train_ex = sh.where(F.col("source") != EVAL_SOURCE).select(
        F.col("doc_id").alias("train_id"), F.explode("shd").alias("g")
    )
    pairs = (
        train_ex.join(F.broadcast(eval_ex), "g")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= MIN_SHARED_SHINGLES)
    )
    return pairs.groupBy(F.col("train_id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_eval_docs"),
        F.max("shared").alias("max_shared_shingles"),
    )


def _contamination_sql() -> str:
    from goe_spark.queries.dedup import _shingle_hashed_sql

    return f"""
WITH shingled AS (
  SELECT doc_id, source, list_distinct(sh) AS shd
  FROM ({_shingle_hashed_sql()})
), eval_ex AS (
  SELECT doc_id AS eval_id, unnest(shd) AS g
  FROM shingled WHERE source = '{EVAL_SOURCE}'
), train_ex AS (
  SELECT doc_id AS train_id, unnest(shd) AS g
  FROM shingled WHERE source <> '{EVAL_SOURCE}'
), pairs AS (
  SELECT train_id, eval_id, count(*) AS shared
  FROM train_ex JOIN eval_ex USING (g)
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_SHARED_SHINGLES}
)
SELECT train_id AS doc_id,
       count(*)        AS n_eval_docs,
       max(shared)     AS max_shared_shingles
FROM pairs GROUP BY train_id
"""


CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


def sliding_window_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window sequence chunking: each document becomes
    overlapping {CHUNK_TOKENS}-token windows advanced by
    {CHUNK_STRIDE} — the context-window sharding step that turns long
    documents into training rows without losing the text across a hard
    split. A doc with n tokens yields 1 window if n <= W, else
    ceil((n - W) / S) + 1.

    Plan: the window index is exploded from a sequence() built out of
    the token COUNT — only (doc, chunk_idx) pairs materialize, never
    the token payload per chunk, so the explode fan-out is
    chunks-per-doc (bounded by doc length / stride), map-side, no
    shuffle until the per-language rollup. Output: per-language chunk
    accounting (chunks, effective vs padded tokens)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", T.token_count("text").alias("n")
    )
    n = F.col("n")
    n_chunks = F.when(n <= CHUNK_TOKENS, F.lit(1)).otherwise(
        F.ceil((n - CHUNK_TOKENS) / F.lit(float(CHUNK_STRIDE))) + 1
    )
    chunks = d.withColumn(
        "i", F.explode(F.sequence(F.lit(0), n_chunks.cast("int") - 1))
    )
    eff = F.least(F.lit(CHUNK_TOKENS), n - F.col("i") * CHUNK_STRIDE)
    return chunks.groupBy("lang").agg(
        F.sum((F.col("i") == 0).cast("long")).alias("n_docs"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(eff).alias("effective_tokens"),
        F.round(F.avg(eff), 4).alias("avg_chunk_tokens"),
    )


SLIDING_CHUNK_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, {T.token_count_sql('text')} AS n FROM documents
), counted AS (
  SELECT doc_id, lang, n,
         CASE WHEN n <= {CHUNK_TOKENS} THEN 1
              ELSE cast(ceil((n - {CHUNK_TOKENS}) / {CHUNK_STRIDE}.0)
                        AS bigint) + 1
         END AS k
  FROM toks
), chunks AS (
  SELECT lang, n, unnest(range(0, k)) AS i
  FROM counted
)
SELECT lang,
       cast(sum(CASE WHEN i = 0 THEN 1 ELSE 0 END) AS bigint) AS n_docs,
       count(*)                                               AS n_chunks,
       cast(sum(least({CHUNK_TOKENS}, n - i * {CHUNK_STRIDE}))
            AS bigint)                                        AS effective_tokens,
       round(avg(least({CHUNK_TOKENS}, n - i * {CHUNK_STRIDE})), 4)
                                                              AS avg_chunk_tokens
FROM chunks GROUP BY lang
"""


# Mixture temperature: weight_i ∝ tokens_i^0.5 (the "flatten the
# source distribution" resampling used when mixing pretraining
# domains; alpha = 1 is proportional, alpha = 0 uniform).
EPOCH_SAMPLE_DOCS = 10_000


def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: per-source sampling weights under
    temperature alpha = 0.5 over token counts, and the doc budget each
    source gets in a {EPOCH_SAMPLE_DOCS}-doc epoch. One corpus scan,
    one source-cardinality aggregate; the normalizing total is a
    scalar broadcast back across the (tiny) per-source relation, so
    nothing corpus-sized shuffles twice. floor() keeps the budget
    integer-deterministic across engines."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count("text")).alias("total_tokens"),
    )
    tot = per.agg(F.sum(F.sqrt("total_tokens")).alias("z"))
    # epoch_docs floors the ROUNDED weight (the output column), not
    # the raw ratio: sum(sqrt(...)) can differ by an ulp between
    # engines depending on summation order, and floor() at an integer
    # boundary would amplify that into an off-by-one. Derived from the
    # same rounded value, the two columns can only diverge together.
    w = F.round(F.sqrt("total_tokens") / F.col("z"), 6)
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "total_tokens",
        w.alias("weight"),
        F.floor(w * EPOCH_SAMPLE_DOCS).cast("long").alias("epoch_docs"),
    )


MIXTURE_SQL = f"""
WITH per AS (
  SELECT source,
         count(*) AS n_docs,
         cast(sum({T.token_count_sql('text')}) AS bigint) AS total_tokens
  FROM documents GROUP BY source
)
SELECT source, n_docs, total_tokens,
       round(sqrt(total_tokens) / sum(sqrt(total_tokens)) OVER (), 6)
         AS weight,
       cast(floor(round(sqrt(total_tokens) / sum(sqrt(total_tokens)) OVER (), 6)
                  * {EPOCH_SAMPLE_DOCS}) AS bigint) AS epoch_docs
FROM per
"""


# Global token budget one mixture-sampling epoch may spend.
MIX_TOKEN_BUDGET = 150_000

# Temperature exponents for the sweep, in percent. Chosen so every
# power is an EXACT composition of IEEE-correctly-rounded ops
# (sqrt/sqrt-of-sqrt/their product) — pow(x, 0.3) is not guaranteed
# correctly rounded and could differ by an ulp between the JVM and
# DuckDB's libm, flipping a rounded weight at a boundary.
MIX_SWEEP_ALPHAS = (25, 50, 75, 100)


def mixture_temperature_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sampling-temperature sweep — the design table a multilingual /
    multi-domain pretraining run is tuned from (mT5/XLM-R style):
    for each temperature alpha in {MIX_SWEEP_ALPHAS} (percent), the
    per-source sampling weight w_s = tokens_s^alpha / sum tokens^alpha,
    the token budget share of a {MIX_TOKEN_BUDGET}-token epoch, and
    the EFFECTIVE EPOCHS over that source's data (budget/tokens — the
    repetition count a low-resource source suffers as alpha drops;
    >1 means the source repeats within one epoch, the overfitting
    signal that bounds how low alpha can go). alpha=100 is
    proportional sampling (epochs equal across sources), alpha=25 is
    aggressive flattening.

    Plan: ONE corpus scan to a source-cardinality aggregate; the four
    powers are computed per source (sqrt compositions), the
    normalizers are one scalar-broadcast aggregate, and the sweep
    explodes a 4-element struct array over the tiny per-source
    relation — rows = sources x 4."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count("text")).alias("total_tokens"),
    )
    t = F.col("total_tokens").cast("double")
    s = F.sqrt(t)
    q = F.sqrt(s)
    pows = {25: q, 50: s, 75: s * q, 100: t}
    per2 = per.select(
        "source",
        "n_docs",
        "total_tokens",
        *[pows[a].alias(f"p{a}") for a in MIX_SWEEP_ALPHAS],
    )
    tot = per2.agg(
        *[F.sum(f"p{a}").alias(f"z{a}") for a in MIX_SWEEP_ALPHAS]
    )
    sweep = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(a).alias("alpha_pct"),
                    F.round(F.col(f"p{a}") / F.col(f"z{a}"), 6).alias(
                        "w"
                    ),
                )
                for a in MIX_SWEEP_ALPHAS
            ]
        )
    ).alias("x")
    picked = per2.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", "total_tokens", sweep
    )
    w = F.col("x.w")
    budget = F.floor(w * MIX_TOKEN_BUDGET).cast("long")
    return picked.select(
        "source",
        F.col("x.alpha_pct").alias("alpha_pct"),
        "n_docs",
        "total_tokens",
        w.alias("weight"),
        budget.alias("budget_tokens"),
        F.round(budget / F.col("total_tokens").cast("double"), 6).alias(
            "effective_epochs_q6"
        ),
    )


def _mixture_sweep_sql() -> str:
    pows = {
        25: "sqrt(sqrt(cast(total_tokens AS double)))",
        50: "sqrt(cast(total_tokens AS double))",
        75: "sqrt(cast(total_tokens AS double))"
        " * sqrt(sqrt(cast(total_tokens AS double)))",
        100: "cast(total_tokens AS double)",
    }
    p_cols = ", ".join(f"{pows[a]} AS p{a}" for a in MIX_SWEEP_ALPHAS)
    # weights are computed BEFORE the alpha cross join: a sum() OVER ()
    # taken after the x4 fan-out would quadruple every normalizer
    w_cols = ", ".join(
        f"round(p{a} / sum(p{a}) OVER (), 6) AS w{a}"
        for a in MIX_SWEEP_ALPHAS
    )
    w_case = " ".join(
        f"WHEN {a} THEN w{a}" for a in MIX_SWEEP_ALPHAS
    )
    alpha_vals = ", ".join(f"({a})" for a in MIX_SWEEP_ALPHAS)
    return f"""
WITH per AS (
  SELECT source,
         count(*) AS n_docs,
         cast(sum({T.token_count_sql('text')}) AS bigint) AS total_tokens
  FROM documents GROUP BY source
), powed AS (
  SELECT source, n_docs, total_tokens, {p_cols} FROM per
), weights AS (
  SELECT source, n_docs, total_tokens, {w_cols} FROM powed
), sweep AS (
  SELECT source, n_docs, total_tokens, a.alpha_pct,
         CASE a.alpha_pct {w_case} END AS weight
  FROM weights CROSS JOIN (VALUES {alpha_vals}) AS a(alpha_pct)
)
SELECT source, cast(alpha_pct AS int) AS alpha_pct, n_docs,
       total_tokens, weight,
       cast(floor(weight * {MIX_TOKEN_BUDGET}) AS bigint)
         AS budget_tokens,
       round(floor(weight * {MIX_TOKEN_BUDGET})
             / cast(total_tokens AS double), 6) AS effective_epochs_q6
FROM sweep
"""


def mixture_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted mixture sampling: the step after mixture_weights —
    spend a {MIX_TOKEN_BUDGET}-token epoch budget across sources in
    proportion to their temperature weights, then pick the ACTUAL
    documents deterministically.

    Per source: budget_s = floor(weight_s * budget). Docs are laid out
    in hash-of-doc_id order (reproducible pseudo-random, no RNG state)
    and a doc is selected iff its first token lands inside the
    source's budget — the same exclusive-cumsum rule token_pack_bins
    uses, so selection is exact, order-stable, and engine-agnostic.

    Plan: one corpus scan to (doc_id, source, n_tokens); the
    source-cardinality weight relation broadcasts back; one window
    shuffle on source for the cumsum. At 100 TB the per-source window
    would funnel a dominant source through one task — the scale form
    replaces the exact prefix with a hash-threshold chosen from a
    bucket-quantile sample (select docs with hash < t where t lands
    the budget), trading exactness-of-budget for a fully map-side
    selection; this exact window version is the semantic spec the
    approximation is tested against."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", T.token_count("text").alias("n_tokens")
    )
    per = d.groupBy("source").agg(F.sum("n_tokens").alias("total_tokens"))
    tot = per.agg(F.sum(F.sqrt("total_tokens")).alias("z"))
    w = F.round(F.sqrt("total_tokens") / F.col("z"), 6)
    budgets = (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.floor(w * MIX_TOKEN_BUDGET).cast("long").alias("budget_tokens"),
        )
    )
    ordkey = hash64(F.col("doc_id").cast("string"))
    win = (
        Window.partitionBy("source")
        .orderBy(ordkey.asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = d.withColumn("cum", F.sum("n_tokens").over(win))
    picked = cum.join(F.broadcast(budgets), "source").where(
        (F.col("cum") - F.col("n_tokens")) < F.col("budget_tokens")
    )
    return picked.groupBy("source").agg(
        F.min("budget_tokens").alias("budget_tokens"),
        F.count(F.lit(1)).alias("n_docs_selected"),
        F.sum("n_tokens").alias("tokens_selected"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


MIXTURE_SAMPLE_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, {T.token_count_sql('text')} AS n_tokens,
         {hash64_sql('cast(doc_id AS varchar)')} AS hk
  FROM documents
), per AS (
  SELECT source, sum(n_tokens) AS total_tokens FROM toks GROUP BY source
), budgets AS (
  SELECT source,
         cast(floor(round(sqrt(total_tokens)
                          / sum(sqrt(total_tokens)) OVER (), 6)
                    * {MIX_TOKEN_BUDGET}) AS bigint) AS budget_tokens
  FROM per
), cums AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY hk, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM toks
)
SELECT c.source,
       min(b.budget_tokens)        AS budget_tokens,
       count(*)                    AS n_docs_selected,
       cast(sum(c.n_tokens) AS bigint) AS tokens_selected,
       min(c.doc_id)               AS min_doc_id,
       max(c.doc_id)               AS max_doc_id
FROM cums c JOIN budgets b ON b.source = c.source
WHERE c.cum - c.n_tokens < b.budget_tokens
GROUP BY c.source
"""


# Hash resolution for the threshold sampler (1e6 buckets ≈ 20 bits —
# threshold granularity far below any realistic budget tolerance).
MIX_HASH_BUCKETS = 1_000_000


def mixture_threshold_pick(d: DataFrame, token_budget: int) -> DataFrame:
    """The shared map-side threshold sampler: keep rows whose uniform
    doc_id-hash bucket falls below budget_s / total_tokens_s, where
    per-source budgets split ``token_budget`` by sqrt-temperature
    weights. ``d`` must carry doc_id, source, n_tokens; every input
    column is preserved, plus budget_tokens/total_tokens. One source-
    cardinality aggregate pair broadcasts back — selection itself is
    map-side. Used by BOTH mixture_sample_threshold (whose exact-spec
    test pins the rule) and the curation pipeline, so the sampling
    math exists once."""
    per = d.groupBy("source").agg(F.sum("n_tokens").alias("total_tokens"))
    tot = per.agg(F.sum(F.sqrt("total_tokens")).alias("z"))
    w = F.round(F.sqrt("total_tokens") / F.col("z"), 6)
    budgets = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "total_tokens",
        F.floor(w * token_budget).cast("long").alias("budget_tokens"),
    )
    frac = F.col("budget_tokens") / F.col("total_tokens")
    h = F.pmod(
        hash64(F.col("doc_id").cast("string")), F.lit(MIX_HASH_BUCKETS)
    ) / F.lit(float(MIX_HASH_BUCKETS))
    return d.join(F.broadcast(budgets), "source").where(h < frac)


def mixture_sample_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of mixture_sample_docs: replace the exact
    per-source prefix window with a per-source HASH THRESHOLD.

    The exact sampler needs a cumsum window per source — at corpus
    scale a dominant source funnels through one task. Instead: tokens
    are independent of the doc_id hash, so keeping docs whose
    uniform-[0,1) hash bucket falls below budget_s / total_tokens_s
    lands the token budget in expectation with O(1/sqrt(n_docs))
    relative error, and the selection is FULLY map-side (the only
    shuffles left are the two source-cardinality aggregates). The
    budget is approximate where the window form is exact — that is
    the trade, and tests/test_training_ops.py pins the threshold
    form's spend against the exact spec's budget.

    Deterministic (pure function of the data, no RNG state), so the
    DuckDB oracle hash-matches it like any other query."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", T.token_count("text").alias("n_tokens")
    )
    picked = mixture_threshold_pick(d, MIX_TOKEN_BUDGET)
    return picked.groupBy("source").agg(
        F.min("budget_tokens").alias("budget_tokens"),
        F.count(F.lit(1)).alias("n_docs_selected"),
        F.sum("n_tokens").alias("tokens_selected"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


MIXTURE_THRESHOLD_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, {T.token_count_sql('text')} AS n_tokens,
         ({hash64_sql('cast(doc_id AS varchar)')} % {MIX_HASH_BUCKETS})
           / {float(MIX_HASH_BUCKETS)} AS h
  FROM documents
), per AS (
  SELECT source, sum(n_tokens) AS total_tokens FROM toks GROUP BY source
), budgets AS (
  SELECT source, total_tokens,
         cast(floor(round(sqrt(total_tokens)
                          / sum(sqrt(total_tokens)) OVER (), 6)
                    * {MIX_TOKEN_BUDGET}) AS bigint) AS budget_tokens
  FROM per
)
SELECT t.source,
       min(b.budget_tokens)            AS budget_tokens,
       count(*)                        AS n_docs_selected,
       cast(sum(t.n_tokens) AS bigint) AS tokens_selected,
       min(t.doc_id)                   AS min_doc_id,
       max(t.doc_id)                   AS max_doc_id
FROM toks t JOIN budgets b ON b.source = t.source
WHERE t.h < b.budget_tokens / cast(b.total_tokens AS double)
GROUP BY t.source
"""


WEIGHTED_SAMPLE_N = 50


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES, exponential-jumps form): each doc
    draws key = -ln(u) / w with u a hash-derived uniform and
    w = n_chars; the WEIGHTED_SAMPLE_N smallest keys ARE a weighted
    sample — longer documents proportionally likelier, yet the whole
    draw replays bit-for-bit from doc_id alone (no RNG state, so any
    executor, any partition order, any engine agrees).

    Numeric discipline: u = (hash31(doc_id)+1) / 2^31 is EXACT in
    both engines (numerator < 2^31, division by a power of two);
    ln is the only libm call and the key is rounded to 9 decimals
    before ranking, so a 1-ulp ln difference cannot reorder engines.
    Plan: map-side key computation, TakeOrdered top-n — no shuffle
    beyond the top-n gather; at 100 TB this is one scan, the same
    shape as any hash-threshold sampler."""
    from goe_spark.functions.hashing import MERSENNE_P

    d = load_table(spark, sf_dir, "documents")
    u = (
        F.pmod(hash64(F.col("doc_id").cast("string")), F.lit(MERSENNE_P))
        + 1
    ) / F.lit(float(2**31))
    w = F.greatest(F.col("n_chars"), F.lit(1))
    key = F.round(-F.log(u) / w, 9)
    return (
        d.select("doc_id", "lang", "source", "n_chars", key.alias("k"))
        .orderBy(F.col("k").asc(), F.col("doc_id").asc())
        .limit(WEIGHTED_SAMPLE_N)
    )


WEIGHTED_SAMPLE_SQL = f"""
SELECT doc_id, lang, source, n_chars, k
FROM (
  SELECT doc_id, lang, source, n_chars,
         round(-ln((({hash64_sql('cast(doc_id AS varchar)')} % 2147483647) + 1)
                   / 2147483648.0)
               / greatest(n_chars, 1), 9) AS k
  FROM documents
)
ORDER BY k ASC, doc_id ASC
LIMIT {{n}}
""".format(n=WEIGHTED_SAMPLE_N)


BPE_TOP_PAIRS = 20


def bpe_merge_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE-training iteration, distributed: corpus -> word
    frequencies, then adjacent character-pair counts weighted by word
    frequency, top-{BPE_TOP_PAIRS} merge candidates — the statistic a
    tokenizer trainer computes to pick its next merge rule.

    Scale design: the pair explode runs on the DISTINCT-WORD table
    (vocabulary grain — Heaps-law sublinear in corpus size), never on
    the corpus; the only corpus-sized operation is the map-side-
    combined wordcount shuffle. This is exactly why production BPE
    trainers pre-aggregate to word counts before any pair statistics:
    at 100 TB the vocabulary table is measured in millions of rows
    while the corpus is trillions of tokens.

    Deterministic: counts are exact integers; the top-k orders by
    (count DESC, pair ASC)."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(T.tokens(F.col("text"))).alias("w")).where(
        F.length("w") > 0
    )
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    chars = F.split(F.col("w"), "")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(chars) - 1),
        lambda i: F.concat(
            F.element_at(chars, i), F.lit(" "), F.element_at(chars, i + 1)
        ),
    )
    exploded = wc.where(F.length("w") >= 2).select(
        "n", F.explode(pairs).alias("pair")
    )
    return (
        exploded.groupBy("pair")
        .agg(F.sum("n").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
        .limit(BPE_TOP_PAIRS)
    )


BPE_MERGE_SQL = f"""
WITH words AS (
  SELECT unnest({T.tokens_sql('text')}) AS w FROM documents
), wc AS (
  SELECT w, count(*) AS n FROM words WHERE length(w) > 0 GROUP BY w
), pairs AS (
  SELECT n,
         unnest(list_transform(
           range(1, len(str_split(w, ''))),
           i -> str_split(w, '')[i] || ' ' || str_split(w, '')[i + 1]
         )) AS pair
  FROM wc WHERE length(w) >= 2
)
SELECT pair, cast(sum(n) AS bigint) AS n_occurrences
FROM pairs GROUP BY pair
ORDER BY n_occurrences DESC, pair ASC
LIMIT {BPE_TOP_PAIRS}
"""


# Word-dropout augmentation rate (percent) — the classic denoising /
# robustness augmentation applied when replicating corpus epochs.
DROPOUT_PCT = 15


def token_dropout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic word-dropout augmentation with exact accounting:
    token i of doc d is dropped iff hash(d:i) lands under
    {DROPOUT_PCT}%. No RNG state — the augmentation replays
    bit-for-bit on any engine/executor (the same discipline as the
    hash samplers), which is what makes augmented epochs reproducible
    AND lets the DuckDB oracle verify the transform exactly.

    Plan: one scan; the drop decision is a filter() lambda over the
    token array (codegen, positional hash), no explode of the corpus;
    rollup is lang-cardinality. Output per language: docs, tokens
    before/after, observed drop rate."""
    from goe_spark.functions.hashing import MERSENNE_P

    d = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    did = F.col("doc_id").cast("string")

    def keep(tok, i):
        h = F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(did, F.lit(":"), i.cast("string"))), 1, 15
                ),
                16,
                10,
            ).cast("long"),
            F.lit(100),
        )
        return h >= DROPOUT_PCT

    kept = F.filter(toks, keep)
    out = d.select(
        "lang",
        F.size(toks).cast("long").alias("n_before"),
        F.size(kept).cast("long").alias("n_after"),
    )
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_before").alias("tokens_before"),
        F.sum("n_after").alias("tokens_after"),
        F.round(
            1 - F.sum("n_after") / F.sum("n_before").cast("double"), 6
        ).alias("observed_drop_rate"),
    )


def _token_dropout_sql() -> str:
    toks = T.tokens_sql("text")
    h = (
        "(cast(concat('0x', substr(md5(cast(doc_id AS varchar) || ':' || "
        "cast(i - 1 AS varchar)), 1, 15)) AS bigint) % 100)"
    )
    return f"""
WITH per AS (
  SELECT lang,
         len({toks}) AS n_before,
         len(list_filter({toks}, (t, i) -> {h} >= {DROPOUT_PCT}))
           AS n_after
  FROM documents
)
SELECT lang,
       count(*) AS n_docs,
       cast(sum(n_before) AS bigint) AS tokens_before,
       cast(sum(n_after) AS bigint) AS tokens_after,
       round(1 - sum(n_after) / cast(sum(n_before) AS double), 6)
         AS observed_drop_rate
FROM per GROUP BY lang
"""


# Span corruption (the T5/BART denoising-objective prep): spans of
# SPAN_LEN tokens are masked starting at deterministically chosen
# positions; overlapping spans merge naturally in the coverage count.
SPAN_RATE_PCT = 5
SPAN_LEN = 3


def span_corruption_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-corruption accounting: position i starts a span iff the
    positional hash (same family as token_dropout_stats) lands under
    {SPAN_RATE_PCT}%; a token is masked iff ANY of the last
    {SPAN_LEN} positions (itself included) started a span. RNG-free,
    so the corruption replays identically everywhere and the oracle
    verifies it exactly.

    Plan: one scan; span starts are one array transform, coverage is
    an exists() over a length-{SPAN_LEN} slice per position (O(n*L)
    map-side, no explode); rollup is lang-cardinality. Output per
    language: docs, tokens, spans started, tokens masked, mask rate.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    n = F.size(toks)
    did = F.col("doc_id").cast("string")

    def is_start(i):
        return (
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(did, F.lit(":"), i.cast("string"))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(100),
            )
            < SPAN_RATE_PCT
        )

    # Materialize the span-start array ONCE per row. Higher-order
    # functions re-evaluate captured expressions per element, so
    # referencing the `starts` expression inside the per-position
    # coverage lambda would recompute all n md5 hashes for each of the
    # n positions — O(n^2) per document (measured 18x slower at
    # sf0.01). Selecting it as a column first keeps the whole query
    # O(n * SPAN_LEN) map-side.
    staged = d.select(
        "lang",
        n.cast("long").alias("n_tokens"),
        F.transform(F.sequence(F.lit(1), n), lambda i: is_start(i)).alias(
            "starts"
        ),
    )
    starts = F.col("starts")
    per = staged.select(
        "lang",
        "n_tokens",
        F.size(F.filter(starts, lambda s: s)).cast("long").alias("n_spans"),
        F.size(
            F.filter(
                F.sequence(F.lit(1), F.col("n_tokens").cast("int")),
                lambda j: F.exists(
                    F.slice(
                        starts,
                        F.greatest(F.lit(1), j - SPAN_LEN + 1),
                        F.least(j, F.lit(SPAN_LEN)),
                    ),
                    lambda x: x,
                ),
            )
        )
        .cast("long")
        .alias("n_masked"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens_total"),
        F.sum("n_spans").alias("spans_started"),
        F.sum("n_masked").alias("tokens_masked"),
        F.round(
            F.sum("n_masked") / F.sum("n_tokens").cast("double"), 6
        ).alias("mask_rate"),
    )


def _span_corruption_sql() -> str:
    toks = T.tokens_sql("text")
    h = (
        "((cast(concat('0x', substr(md5(cast(doc_id AS varchar) || ':' || "
        f"cast(i AS varchar)), 1, 15)) AS bigint) % 100) < {SPAN_RATE_PCT})"
    )
    return f"""
WITH per AS (
  SELECT lang,
         len({toks}) AS n_tokens,
         list_transform(range(1, len({toks}) + 1), i -> {h}) AS starts
  FROM documents
), counted AS (
  SELECT lang, n_tokens,
         len(list_filter(starts, s -> s)) AS n_spans,
         len(list_filter(range(1, n_tokens + 1),
             j -> len(list_filter(
                    list_slice(starts, greatest(1, j - {SPAN_LEN} + 1), j),
                    x -> x)) > 0)) AS n_masked
  FROM per
)
SELECT lang,
       count(*) AS n_docs,
       cast(sum(n_tokens) AS bigint) AS tokens_total,
       cast(sum(n_spans) AS bigint) AS spans_started,
       cast(sum(n_masked) AS bigint) AS tokens_masked,
       round(sum(n_masked) / cast(sum(n_tokens) AS double), 6) AS mask_rate
FROM counted GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Iterative BPE tokenizer TRAINING — the sequential merge loop that
# bpe_merge_pair_counts is the first iteration of. BPE is inherently
# sequential (merge k+1's statistics depend on merge k having been
# applied), so the distributed design is: the corpus is touched ONCE
# (the map-side-combined wordcount), training then loops over the
# vocabulary-grain symbol table — millions of rows at 100 TB while the
# corpus is trillions of tokens — and the only driver traffic per
# iteration is the 1-row argmax (the chosen pair) plus one scalar
# (the post-merge symbol count). That is the canonical production
# trainer shape; a driver loop over vocabulary-grain argmaxes is not a
# "collect the data" anti-pattern.
#
# Greedy left-to-right non-overlapping merge semantics, identically
# implemented twice:
#   - Spark: an aggregate() fold over the symbol array — merge iff the
#     accumulator's last element == left AND current == right (a fresh
#     merge output can never re-merge within the same pass, because
#     the concatenated token no longer equals `left`);
#   - DuckDB: position explode + run-parity (consecutive matching
#     positions only chain when left == right; within such a run the
#     greedy merges are exactly the even offsets).
BPE_TRAIN_STEPS = 6
BPE_TRAIN_VOCAB = 400


def _fold_merge(syms, left: str, right: str):
    """Greedy non-overlapping replacement of adjacent (left, right)
    with their concatenation, as a codegen'd array fold."""
    merged = left + right
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _bpe_train_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w, n): the top-{BPE_TRAIN_VOCAB} training vocabulary
    (frequency desc, word asc tie-break) — ONE copy of the selection
    rule, shared by the trainer and bpe_fertility_by_language's
    trained-character inventory so the OOV definition can never
    diverge from the vocabulary the merges were actually learned on
    (round-13 review finding)."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(T.tokens(F.col("text"))).alias("w")).where(
        F.length("w") > 0
    )
    return (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(BPE_TRAIN_VOCAB)
    )


def _bpe_merge_rows_driver(
    vocab: list[tuple[str, int]],
) -> list[tuple]:
    """The BPE merge loop over an already-collected (word, freq)
    vocabulary, on the driver: the state is bounded at
    {BPE_TRAIN_VOCAB} rows by construction (model state, not data —
    the same class as the trainer's CLS_DIM-grain gradient collect),
    so iterating it distributedly bought nothing but 3 scheduler
    round-trips per step (pair-count collect + fold checkpoint +
    symbols_after agg: 18 sequential jobs for 400 rows, the dominant
    wall cost of the r12 formulation). Arithmetic is exact integers
    and string tie-breaks compare identically in Python (code-point
    order), Spark (UTF-8 byte order — equal by UTF-8 monotonicity)
    and the DuckDB oracle, so the learned merges are bit-identical
    to the distributed loop's.

    Returns (step, left, right, merged, pair_freq, symbols_after)
    tuples, exactly bpe_train_merges' rows."""
    state = [(int(n), list(w)) for w, n in vocab]
    rows: list[tuple] = []
    for step in range(1, BPE_TRAIN_STEPS + 1):
        pairs: dict[tuple[str, str], int] = {}
        for n, syms in state:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:  # vocabulary fully merged — nothing left to learn
            break
        (left, right), pf = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = left + right
        new_state = []
        for n, syms in state:
            # greedy non-overlapping left-to-right — _fold_merge's
            # exact semantics (after a merge the new last symbol is
            # `merged`, so an overlapping second merge cannot fire)
            out: list[str] = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = merged
                else:
                    out.append(x)
            new_state.append((n, out))
        state = new_state
        symbols_after = sum(n * len(syms) for n, syms in state)
        rows.append((step, left, right, merged, pf, symbols_after))
    return rows


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training over the documents corpus:
    {BPE_TRAIN_STEPS} sequential merges learned on the
    top-{BPE_TRAIN_VOCAB} words (by frequency, word tie-break).
    Output: one row per learned merge — (step, left, right, merged,
    pair_freq, symbols_after) where symbols_after is the
    frequency-weighted total symbol count of the vocabulary after
    applying that merge (the quantity whose decrease IS the
    compression the tokenizer buys).

    Exactly deterministic: counts are integers, argmax tie-breaks on
    (freq DESC, left ASC, right ASC), and greedy merge application is
    order-defined — so the DuckDB oracle (the same loop unrolled as
    {BPE_TRAIN_STEPS} CTE blocks) replays it bit-for-bit.

    Scale: the corpus contributes ONE wordcount shuffle (+ top-k);
    the merge loop then runs on the driver over the collected
    {BPE_TRAIN_VOCAB}-row vocabulary — bounded model state, see
    _bpe_merge_rows_driver (a real deployment trains its tokenizer
    exactly this way: distributed wordcount, in-memory merge loop)."""
    vocab = [
        (r["w"], int(r["n"]))
        for r in _bpe_train_vocab(spark, sf_dir).collect()
    ]
    return spark.createDataFrame(
        _bpe_merge_rows_driver(vocab),
        "step int, left string, right string, merged string, "
        "pair_freq long, symbols_after long",
    )


def _bpe_merge_step_sql(prefix: str, keys: str, k: int, top: str) -> str:
    """One unrolled greedy-merge application: rows keyed by ``keys``
    (the word-instance key) in ``{prefix}state{k-1}`` have the pair
    from CTE ``top`` merged (run-parity = greedy non-overlapping) into
    ``{prefix}state{k}``. MATERIALIZED throughout: DuckDB inlines CTEs
    by default, and each state references its predecessor several
    times — inlined, a 6-step chain expands exponentially."""
    p = k - 1
    return f"""
{prefix}pos{k} AS MATERIALIZED (
  SELECT {keys}, n, syms[i] AS sym, i AS ord
  FROM (SELECT {keys}, n, str_split(sym, ' ') AS syms
        FROM {prefix}state{p}),
       LATERAL unnest(range(1, len(syms) + 1)) AS r(i)
),
{prefix}flag{k} AS MATERIALIZED (
  SELECT {keys}, n, sym, ord,
         coalesce(sym = (SELECT lft FROM {top})
                  AND lead(sym) OVER (PARTITION BY {keys} ORDER BY ord)
                      = (SELECT rgt FROM {top}), FALSE) AS is_pair
  FROM {prefix}pos{k}
),
{prefix}runs{k} AS MATERIALIZED (
  SELECT *, CASE WHEN is_pair THEN ord - row_number()
                 OVER (PARTITION BY {keys}, is_pair ORDER BY ord) END AS grp
  FROM {prefix}flag{k}
),
{prefix}marks{k} AS MATERIALIZED (
  SELECT {keys}, n, sym, ord,
         is_pair AND (ord - min(ord) OVER (PARTITION BY {keys}, grp)) % 2 = 0
           AS merge_start
  FROM {prefix}runs{k}
),
{prefix}built{k} AS MATERIALIZED (
  SELECT {keys}, n, ord,
         CASE WHEN merge_start
                THEN sym || lead(sym) OVER (PARTITION BY {keys} ORDER BY ord)
              WHEN coalesce(lag(merge_start)
                   OVER (PARTITION BY {keys} ORDER BY ord), FALSE)
                THEN NULL
              ELSE sym END AS new_sym
  FROM {prefix}marks{k}
),
{prefix}state{k} AS MATERIALIZED (
  SELECT {keys}, n, string_agg(new_sym, ' ' ORDER BY ord) AS sym
  FROM {prefix}built{k} WHERE new_sym IS NOT NULL GROUP BY {keys}, n
)"""


def _bpe_training_blocks() -> list[str]:
    """The shared training chain: wordcount, top-vocab initial state,
    and per step k the pair statistics + argmax (top{k}) + merge
    application (state{k})."""
    blocks = [
        f"""
wc AS MATERIALIZED (
  SELECT w, count(*) AS n
  FROM (SELECT unnest({T.tokens_sql('text')}) AS w FROM documents)
  WHERE length(w) > 0 GROUP BY w
),
state0 AS MATERIALIZED (
  SELECT w, n, array_to_string(str_split(w, ''), ' ') AS sym
  FROM wc ORDER BY n DESC, w ASC LIMIT {BPE_TRAIN_VOCAB}
)"""
    ]
    for k in range(1, BPE_TRAIN_STEPS + 1):
        blocks.append(
            f"""
pairs{k} AS MATERIALIZED (
  SELECT s[i] AS lft, s[i + 1] AS rgt, sum(n) AS pf
  FROM (SELECT n, str_split(sym, ' ') AS s FROM state{k - 1}),
       LATERAL unnest(range(1, len(s))) AS r(i)
  WHERE len(s) >= 2
  GROUP BY 1, 2
),
top{k} AS MATERIALIZED (
  SELECT lft, rgt, pf FROM pairs{k}
  ORDER BY pf DESC, lft ASC, rgt ASC LIMIT 1
)"""
            + ","
            + _bpe_merge_step_sql("", "w", k, f"top{k}")
        )
    return blocks


def _bpe_train_sql() -> str:
    """The training loop unrolled as CTE blocks; one output row per
    learned merge."""
    selects = [
        f"""
SELECT {k} AS step, t.lft AS left, t.rgt AS right,
       t.lft || t.rgt AS merged,
       cast(t.pf AS bigint) AS pair_freq,
       (SELECT cast(sum(n * len(str_split(sym, ' '))) AS bigint)
        FROM state{k}) AS symbols_after
FROM top{k} t"""
        for k in range(1, BPE_TRAIN_STEPS + 1)
    ]
    return "WITH " + ",".join(_bpe_training_blocks()) + "\nUNION ALL".join(
        selects
    )


def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY side of BPE training: encode the FULL per-language
    vocabulary with the merge table bpe_train_merges learned (on the
    global top-{BPE_TRAIN_VOCAB} words) and report frequency-weighted
    compression per language — words, chars (= symbols before),
    symbols after the merges, and the chars-per-symbol ratio the
    tokenizer buys.

    Scale: training is the documented vocabulary-grain loop; encoding
    is then PURELY map-side — the learned merge list broadcasts as
    {BPE_TRAIN_STEPS} nested array folds over the per-language
    wordcount table (vocabulary grain; at the corpus grain the same
    fold applies per token with the identical broadcast merge list).
    One wordcount shuffle + one lang-cardinality rollup; the merge
    loop itself is the driver-side bounded-state pass of
    _bpe_merge_rows_driver (one vocabulary collect, no per-step
    jobs)."""
    vocab = [
        (r["w"], int(r["n"]))
        for r in _bpe_train_vocab(spark, sf_dir).collect()
    ]
    merges = [
        (left, right)
        for _step, left, right, _m, _pf, _sa in _bpe_merge_rows_driver(
            vocab
        )
    ]
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "lang", F.explode(T.tokens(F.col("text"))).alias("w")
    ).where(F.length("w") > 0)
    wl = words.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("n"))
    syms = F.split("w", "")
    for left, right in merges:
        syms = _fold_merge(syms, left, right)
    per = wl.select(
        "lang",
        "n",
        F.length("w").cast("long").alias("chars"),
        F.size(syms).cast("long").alias("toks"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_vocab_words"),
        F.sum("n").alias("n_word_occurrences"),
        F.sum(F.col("n") * F.col("chars")).alias("chars_total"),
        F.sum(F.col("n") * F.col("toks")).alias("symbols_total"),
        F.round(
            F.sum(F.col("n") * F.col("chars"))
            / F.sum(F.col("n") * F.col("toks")).cast("double"),
            6,
        ).alias("compression"),
    )


def _bpe_encode_sql() -> str:
    """Training chain (for the tops) + a second unrolled merge chain
    over the per-language full vocabulary, then the per-language
    compression rollup."""
    blocks = list(_bpe_training_blocks())
    blocks.append(
        f"""
lstate0 AS MATERIALIZED (
  SELECT lang, w, count(*) AS n,
         array_to_string(str_split(w, ''), ' ') AS sym
  FROM (SELECT lang, unnest({T.tokens_sql('text')}) AS w FROM documents)
  WHERE length(w) > 0 GROUP BY lang, w
)"""
    )
    for k in range(1, BPE_TRAIN_STEPS + 1):
        blocks.append(_bpe_merge_step_sql("l", "lang, w", k, f"top{k}"))
    final = f"""
SELECT lang,
       count(*) AS n_vocab_words,
       cast(sum(n) AS bigint) AS n_word_occurrences,
       cast(sum(n * length(w)) AS bigint) AS chars_total,
       cast(sum(n * len(str_split(sym, ' '))) AS bigint) AS symbols_total,
       round(sum(n * length(w))
             / cast(sum(n * len(str_split(sym, ' '))) AS double), 6)
         AS compression
FROM lstate{BPE_TRAIN_STEPS}
GROUP BY lang"""
    return "WITH " + ",".join(blocks) + final


def bpe_fertility_by_language(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer FERTILITY / vocab-equity audit (round-12 verdict item
    6): bpe_encode_stats reports compression; this is the fairness
    view a multilingual curator judges vocab equity with. Per
    language, under the SAME broadcast merge table the trainer
    learned on the global top-{BPE_TRAIN_VOCAB} words:
    tokens-per-word (fertility — how many symbols an average word
    occurrence costs; high fertility = under-served script),
    bytes-per-token (how much text each symbol carries), and the
    byte-fallback/OOV rate — characters absent from the TRAINED
    vocabulary's character inventory, which a production BPE encodes
    as raw bytes (fallback_tokens_total re-prices each OOV char at
    its UTF-8 byte count, the fertility a byte-fallback tokenizer
    actually pays).

    OOV is computable from the word alone: learned merges only ever
    combine symbols present in the training vocabulary, so an
    untrained character can never participate in a merge and always
    survives as a single-char symbol.

    Plan: one wordcount shuffle to (lang, word) grain; the merge
    table and the trained character inventory (vocabulary-grain
    collects, <= {BPE_TRAIN_VOCAB} words) broadcast as plan literals;
    the 6-deep merge fold binds to ONE column alias (the fold-
    inlining discipline of bpe_encode_stats) and every other metric
    derives from the word string itself; final rollup is
    lang-cardinality. The training vocabulary is collected ONCE
    (bounded at {BPE_TRAIN_VOCAB} rows) and feeds both the
    driver-side merge loop (_bpe_merge_rows_driver) and the trained
    character inventory — the r12 formulation ran the full iterative
    trainer plus a second vocabulary job for the inventory."""
    vocab = [
        (r["w"], int(r["n"]))
        for r in _bpe_train_vocab(spark, sf_dir).collect()
    ]
    merges = [
        (left, right)
        for _step, left, right, _m, _pf, _sa in _bpe_merge_rows_driver(
            vocab
        )
    ]
    vocab_chars = sorted({c for w, _n in vocab for c in w})
    vlit = F.array(*[F.lit(c) for c in vocab_chars])

    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "lang", F.explode(T.tokens(F.col("text"))).alias("w")
    ).where(F.length("w") > 0)
    wl = words.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("n"))
    syms = F.split("w", "")
    for left, right in merges:
        syms = _fold_merge(syms, left, right)
    # bind the 6-deep fold ONCE; all later consumers read the column
    enc = wl.select("lang", "w", "n", syms.alias("syms"))
    oovs = F.filter(
        F.split("w", ""), lambda c: ~F.array_contains(vlit, c)
    )
    per = enc.select(
        "lang",
        "n",
        F.octet_length("w").cast("long").alias("bytes"),
        F.size("syms").cast("long").alias("toks"),
        F.size(oovs).cast("long").alias("oov"),
        F.aggregate(
            oovs,
            F.lit(0).cast("bigint"),
            lambda acc, c: acc + F.octet_length(c),
        ).alias("oov_bytes"),
    )
    n = F.col("n")
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_vocab_words"),
        F.sum(n).alias("n_word_occurrences"),
        F.sum(n * F.col("toks")).alias("symbols_total"),
        F.sum(n * F.col("bytes")).alias("bytes_total"),
        F.sum(n * F.col("oov")).alias("oov_symbols_total"),
        F.sum(
            n * (F.col("toks") - F.col("oov") + F.col("oov_bytes"))
        ).alias("fallback_tokens_total"),
        F.round(
            F.sum(n * F.col("toks")) / F.sum(n).cast("double"), 6
        ).alias("tokens_per_word_q6"),
        F.round(
            F.sum(n * F.col("bytes"))
            / F.sum(n * F.col("toks")).cast("double"),
            6,
        ).alias("bytes_per_token_q6"),
        F.floor(
            F.sum(n * F.col("oov")) * 10000
            / F.sum(n * F.col("toks"))
        )
        .cast("long")
        .alias("oov_per_10k"),
    )


def _bpe_fertility_sql() -> str:
    """Training chain + per-language merge chain (both shared with
    _bpe_encode_sql) + trained-char inventory + the fertility/OOV
    rollup."""
    blocks = list(_bpe_training_blocks())
    blocks.append(
        f"""
lstate0 AS MATERIALIZED (
  SELECT lang, w, count(*) AS n,
         array_to_string(str_split(w, ''), ' ') AS sym
  FROM (SELECT lang, unnest({T.tokens_sql('text')}) AS w FROM documents)
  WHERE length(w) > 0 GROUP BY lang, w
)"""
    )
    for k in range(1, BPE_TRAIN_STEPS + 1):
        blocks.append(_bpe_merge_step_sql("l", "lang, w", k, f"top{k}"))
    blocks.append(
        """
vchars AS MATERIALIZED (
  SELECT list(DISTINCT c) AS cs FROM (
    SELECT unnest(str_split(w, '')) AS c FROM state0
  )
)"""
    )
    final = f"""
SELECT lang,
       count(*) AS n_vocab_words,
       cast(sum(n) AS bigint) AS n_word_occurrences,
       cast(sum(n * toks) AS bigint) AS symbols_total,
       cast(sum(n * bytes) AS bigint) AS bytes_total,
       cast(sum(n * oov) AS bigint) AS oov_symbols_total,
       cast(sum(n * (toks - oov + oov_bytes)) AS bigint)
         AS fallback_tokens_total,
       round(cast(sum(n * toks) AS double) / sum(n), 6)
         AS tokens_per_word_q6,
       round(cast(sum(n * bytes) AS double) / sum(n * toks), 6)
         AS bytes_per_token_q6,
       cast(floor(sum(n * oov) * 10000.0 / sum(n * toks)) AS bigint)
         AS oov_per_10k
FROM (
  SELECT lang, n,
         cast(strlen(w) AS bigint) AS bytes,
         cast(len(str_split(sym, ' ')) AS bigint) AS toks,
         cast(len(oovl) AS bigint) AS oov,
         cast(coalesce(list_sum(
           list_transform(oovl, x -> strlen(x))), 0) AS bigint)
           AS oov_bytes
  FROM (
    SELECT s.lang, s.w, s.n, s.sym,
           list_filter(str_split(s.w, ''),
                       x -> NOT list_contains(v.cs, x)) AS oovl
    FROM lstate{BPE_TRAIN_STEPS} s CROSS JOIN vchars v
  )
)
GROUP BY lang"""
    return "WITH " + ",".join(blocks) + final


# --- DSIR importance resampling weights -------------------------------------

DSIR_B = 512  # hashed unigram feature buckets
DSIR_TARGET = ("src0", "src1")  # stand-in "high-quality target" slice
DSIR_SCALE = 1_000_000  # fixed-point quantization for order-free sums


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, public method):
    importance weights from hashed unigram bag features. A target
    slice (here two sources standing in for the curated target
    distribution) and the raw corpus each get an add-1-smoothed
    distribution over DSIR_B hashed buckets; each doc's weight is the
    mean per-token log-likelihood ratio ln(p_target/p_raw). Docs with
    positive weight are "selected" — the standard pretraining
    data-selection recipe.

    Determinism discipline: per-bucket log-ratios are fixed-point
    quantized (floor(lr * 1e6) as BIGINT) BEFORE any per-doc or
    per-source summation, so every aggregate is an exact integer sum
    — float addition order can never flip the oracle hash.

    Plan (100 TB): token explode -> ONE bucket-grain conditional
    aggregate builds BOTH distributions in one pass (B=512 rows);
    1-row totals broadcast; the B-row log-ratio table broadcast-joins
    back to the token stream, which re-aggregates to doc grain then
    source grain. Two corpus token passes total (distribution +
    scoring); at 100 TB the distribution pass materializes once per
    corpus snapshot and is reused across selection runs, exactly like
    the signature index."""
    from goe_spark.catalog import spread

    d = spread(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        ),
        "doc_id",
    )
    toks = d.select(
        "doc_id",
        "source",
        F.explode(T.tokens("text")).alias("tok"),
    ).select(
        "doc_id",
        "source",
        F.pmod(hash64(F.col("tok")), F.lit(DSIR_B)).alias("bkt"),
    )
    is_t = F.col("source").isin(*DSIR_TARGET).cast("long")
    dist = toks.groupBy("bkt").agg(
        F.sum(is_t).alias("t_cnt"),
        F.count(F.lit(1)).alias("r_cnt"),
    )
    totals = dist.agg(
        F.sum("t_cnt").alias("t_tot"), F.sum("r_cnt").alias("r_tot")
    )
    lr = (
        F.log((F.col("t_cnt") + 1).cast("double"))
        - F.log((F.col("t_tot") + DSIR_B).cast("double"))
        - F.log((F.col("r_cnt") + 1).cast("double"))
        + F.log((F.col("r_tot") + DSIR_B).cast("double"))
    )
    lr_table = dist.crossJoin(F.broadcast(totals)).select(
        "bkt",
        F.floor(lr * DSIR_SCALE).cast("long").alias("lr_q"),
    )
    per_doc = (
        toks.join(F.broadcast(lr_table), "bkt")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("lr_q").alias("wsum"),
            F.count(F.lit(1)).alias("n_tok"),
        )
        .select(
            "doc_id",
            "source",
            # fixed-point mean token log-ratio: exact integer math
            F.floor(F.col("wsum") / F.col("n_tok")).cast("long").alias("wq"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("wq") > 0).cast("long")).alias("n_selected"),
        # DECIMAL(38,0) sum: per-doc wq is a mean token log-ratio on
        # the 1e6 grid (~1e7 magnitude), so a bare long sum would wrap
        # int64 after ~1e11 docs per source — the same headroom bound
        # round-8 ADVICE flagged on money.py. DuckDB's SUM(BIGINT) is
        # already HUGEINT; casting each exact sum to double once keeps
        # both engines rounding the identical value.
        F.round(
            (
                F.sum(F.col("wq").cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1))
                / DSIR_SCALE
            ),
            6,
        ).alias("avg_weight"),
        F.min("wq").alias("min_wq"),
        F.max("wq").alias("max_wq"),
    )


def _dsir_sql() -> str:
    tgt = ", ".join(f"'{s}'" for s in DSIR_TARGET)
    bkt = f"(({hash64_sql('tok')} % {DSIR_B}) + {DSIR_B}) % {DSIR_B}"
    return f"""
WITH toks AS (
  SELECT doc_id, source, {bkt} AS bkt
  FROM (SELECT doc_id, source, unnest({T.tokens_sql('text')}) AS tok
        FROM documents)
), dist AS (
  SELECT bkt,
         sum(CASE WHEN source IN ({tgt}) THEN 1 ELSE 0 END) AS t_cnt,
         count(*) AS r_cnt
  FROM toks GROUP BY bkt
), totals AS (
  SELECT sum(t_cnt) AS t_tot, sum(r_cnt) AS r_tot FROM dist
), lr AS (
  SELECT bkt,
         cast(floor((ln(cast(t_cnt + 1 AS double))
                   - ln(cast(t_tot + {DSIR_B} AS double))
                   - ln(cast(r_cnt + 1 AS double))
                   + ln(cast(r_tot + {DSIR_B} AS double)))
                   * {DSIR_SCALE}) AS bigint) AS lr_q
  FROM dist, totals
), per_doc AS (
  SELECT doc_id, source,
         cast(floor(sum(lr_q) / cast(count(*) AS double)) AS bigint) AS wq
  FROM toks JOIN lr USING (bkt)
  GROUP BY doc_id, source
)
SELECT source,
       count(*) AS n_docs,
       cast(sum(CASE WHEN wq > 0 THEN 1 ELSE 0 END) AS bigint) AS n_selected,
       round(cast(sum(wq) AS double) / count(*) / {DSIR_SCALE}, 6)
         AS avg_weight,
       min(wq) AS min_wq,
       max(wq) AS max_wq
FROM per_doc GROUP BY source
"""


def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed near-dup cluster-size distribution — the
    diagnostic that tells a curation run whether duplication is
    long-tail (many pairs) or pathological (few giant boilerplate
    clusters needing a rule, not dedup). Per bucket: cluster count,
    docs covered, docs a keep-one pass would drop.

    Plan: rides the pair-bounded label table (_cc_labels — the corpus
    never enters); one cluster-grain aggregate then a bucket-grain
    rollup (<= 64 rows)."""
    labels = _cc_labels(spark, sf_dir)
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("sz"))
    bucket = F.floor(F.log2("sz")).cast("int")
    return sizes.groupBy(bucket.alias("log2_size")).agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("sz").alias("n_docs"),
        F.sum(F.col("sz") - 1).alias("n_droppable"),
        F.min("sz").alias("min_size"),
        F.max("sz").alias("max_size"),
    )


def classifier_train_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier TRAINING over the documents corpus — the
    train side of functions/classifier.py's broadcast inference:
    {CLS_EPOCHS} full-batch epochs of exact fixed-point logistic
    regression (hard sigmoid, squared loss) over hashed unigram
    features, labels from the rule-based quality score
    (y = quality >= {CLS_LABEL_Q}) — the standard bootstrap where a
    cheap heuristic labels the seed set for a learned classifier.
    One row per epoch: docs, positives, forward-pass accuracy count,
    total absolute error (milli), and the post-update weight vector's
    L1 mass and position-weighted checksum.

    Plan: per epoch ONE corpus pass (plan-literal weight broadcast,
    zero joins) materialized via localCheckpoint, then a CLS_DIM-grain
    (<= 1024 rows) gradient collect — the bounded vocabulary-grain
    pattern of bpe_train_merges. The DuckDB oracle replays the
    unrolled epochs as CTE blocks bit-for-bit."""
    from goe_spark.catalog import spread
    from goe_spark.functions.classifier import train_classifier_epochs

    d = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
    )
    _, rows = train_classifier_epochs(d)
    return spark.createDataFrame(
        rows,
        "epoch int, n_docs bigint, n_pos bigint, n_correct bigint,"
        " sum_abs_err_milli bigint, w_l1_after bigint,"
        " w_checksum_after bigint",
    )


def _classifier_train_ctes(extra_where: str = "") -> list[str]:
    """The unrolled-epoch CTE blocks the DuckDB oracles replay the
    trainer with — shared by _classifier_train_sql (full corpus) and
    _classifier_eval_holdout_sql (train split only, via
    ``extra_where``). The final weight vector is CTE
    ``w{CLS_EPOCHS}``; per-epoch metrics are ``m{e}``/``ws{e}``
    (unreferenced CTEs cost nothing in DuckDB)."""
    from goe_spark.functions.classifier import (
        CLS_BIAS_MILLI,
        CLS_DIM,
        CLS_EPOCHS,
        CLS_LABEL_Q,
        hard_sigmoid_milli_sql,
    )
    from goe_spark.functions.text import quality_score_sql, tokens_sql

    h = hash64_sql("t")
    ctes = [
        f"""base AS (
  SELECT doc_id, toks, y FROM (
    SELECT doc_id, {tokens_sql('text')} AS toks,
           CASE WHEN {quality_score_sql('text')} >= {CLS_LABEL_Q}
                THEN 1 ELSE 0 END AS y
    FROM documents
  ) WHERE len(toks) > 0{extra_where}
), bt AS (
  SELECT b.doc_id, ({h} % {CLS_DIM}) AS j
  FROM base b, unnest(b.toks) AS u(t)
), nd AS (SELECT count(*) AS n FROM base),
w0 AS (SELECT cast(r.range AS bigint) AS j, cast(0 AS bigint) AS w
       FROM range({CLS_DIM}) r)"""
    ]
    for e in range(1, CLS_EPOCHS + 1):
        p = e - 1
        ctes.append(
            f"""z{e} AS (
  SELECT t.doc_id, max(b.y) AS y,
         {CLS_BIAS_MILLI}
           + cast(floor(sum(w.w) / count(*)) AS bigint) AS z
  FROM bt t JOIN w{p} w USING (j) JOIN base b ON b.doc_id = t.doc_id
  GROUP BY t.doc_id
), e{e} AS (
  SELECT doc_id, y, z,
         {hard_sigmoid_milli_sql('z')} - 1000 * y AS err
  FROM z{e}
), g{e} AS (
  SELECT t.j, cast(sum(e.err) AS bigint) AS g
  FROM bt t JOIN e{e} e USING (doc_id) GROUP BY t.j
), w{e} AS (
  SELECT w.j,
         greatest(-1000, least(1000,
           w.w - cast(floor(coalesce(g.g, 0)
                            / (SELECT cast(n AS double) FROM nd))
                      AS bigint))) AS w
  FROM w{p} w LEFT JOIN g{e} g USING (j)
), m{e} AS (
  SELECT {e} AS epoch,
         count(*) AS n_docs,
         cast(sum(y) AS bigint) AS n_pos,
         cast(sum(CASE WHEN (z >= 0) = (y = 1) THEN 1 ELSE 0 END)
              AS bigint) AS n_correct,
         cast(sum(abs(err)) AS bigint) AS sum_abs_err_milli
  FROM e{e}
), ws{e} AS (
  SELECT cast(sum(abs(w)) AS bigint) AS w_l1_after,
         cast(sum((j + 1) * w) AS bigint) AS w_checksum_after
  FROM w{e}
)"""
        )
    return ctes


def _classifier_train_sql() -> str:
    from goe_spark.functions.classifier import CLS_EPOCHS

    ctes = _classifier_train_ctes()
    selects = [
        f"SELECT m{e}.*, ws{e}.w_l1_after, ws{e}.w_checksum_after"
        f" FROM m{e}, ws{e}"
        for e in range(1, CLS_EPOCHS + 1)
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY epoch"
    )


# Logit cutoffs (milli-units) the holdout evaluation sweeps — a
# symmetric band around the global-zero cutoff the curation stage's
# --classifier-min-logit-milli would use.
CLS_EVAL_THRESHOLDS = (-250, -100, 0, 100, 250)


def classifier_eval_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holdout evaluation of the TRAINED quality classifier — the
    round-12 gap: classifier_train_epochs learns weights and
    classifier_threshold_by_source calibrates cutoffs, but nothing
    measured the learned model on documents the trainer never saw.
    Documents get the split-leakage audit's deterministic hash split
    (md5-hash bucket of doc_id, < {SPLIT_TRAIN_PCT}% = train); the
    classifier trains CLS_EPOCHS epochs on the TRAIN side only, the
    final weight vector scores the HOLDOUT side through the same
    broadcast fold, and each row reports the confusion matrix +
    fixed-point precision/recall/accuracy (per 10k) at one logit
    threshold vs the rule-based labels (y = quality >= CLS_LABEL_Q).
    Train-split metrics would be optimistically biased by
    memorization; this is the honest number a curator thresholds on.

    Plan: training is the bounded CLS_DIM-grain iterative pattern of
    classifier_train_epochs (over ~80% of the corpus); holdout
    scoring is ONE map-only pass (plan-literal learned weights, zero
    joins); the threshold sweep explodes a {len(CLS_EVAL_THRESHOLDS)}-
    element literal array before a tiny threshold-grain aggregate.
    The DuckDB oracle replays the unrolled epochs on the same train
    split, then scores the holdout with CTE w{{CLS_EPOCHS}} — bit-
    identical end to end."""
    from goe_spark.catalog import spread
    from goe_spark.functions.classifier import (
        CLS_LABEL_Q,
        classifier_logit_from_tokens,
        train_classifier_epochs,
    )
    from goe_spark.functions.hashing import hash64
    from goe_spark.functions.text import quality_score, tokens
    from goe_spark.queries.dedup import SPLIT_TRAIN_PCT

    d = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
    )
    bucket = F.pmod(hash64(F.col("doc_id").cast("string")), F.lit(100))
    w, _ = train_classifier_epochs(d.where(bucket < SPLIT_TRAIN_PCT))
    scored = (
        d.where(bucket >= SPLIT_TRAIN_PCT)
        .select(
            tokens(F.col("text")).alias("toks"),
            (quality_score("text") >= F.lit(CLS_LABEL_Q))
            .cast("int")
            .alias("y"),
        )
        .where(F.size("toks") > 0)
        .select(
            "y",
            classifier_logit_from_tokens(F.col("toks"), w).alias("z"),
        )
    )
    per = scored.select(
        "y",
        "z",
        F.explode(
            F.array(*[F.lit(int(t)) for t in CLS_EVAL_THRESHOLDS])
        ).alias("thr"),
    )
    pred = (F.col("z") >= F.col("thr")).cast("int")
    y = F.col("y")
    agg = per.groupBy("thr").agg(
        F.count(F.lit(1)).alias("n_holdout"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(((pred == 1) & (y == 1)).cast("long")).alias("tp"),
        F.sum(((pred == 1) & (y == 0)).cast("long")).alias("fp"),
        F.sum(((pred == 0) & (y == 1)).cast("long")).alias("fn"),
        F.sum(((pred == 0) & (y == 0)).cast("long")).alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    return agg.select(
        "thr",
        "n_holdout",
        "n_pos",
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(tp + fp > 0, F.floor(tp * 10000 / (tp + fp)))
        .cast("long")
        .alias("precision_per_10k"),
        F.when(tp + fn > 0, F.floor(tp * 10000 / (tp + fn)))
        .cast("long")
        .alias("recall_per_10k"),
        F.when(
            F.col("n_holdout") > 0,
            F.floor((tp + tn) * 10000 / F.col("n_holdout")),
        )
        .cast("long")
        .alias("acc_per_10k"),
    )


def _classifier_eval_holdout_sql() -> str:
    from goe_spark.functions.classifier import (
        CLS_BIAS_MILLI,
        CLS_DIM,
        CLS_EPOCHS,
        CLS_LABEL_Q,
    )
    from goe_spark.functions.text import quality_score_sql, tokens_sql
    from goe_spark.queries.dedup import SPLIT_TRAIN_PCT

    split = f"({hash64_sql('cast(doc_id AS varchar)')}) % 100"
    ctes = _classifier_train_ctes(
        extra_where=f" AND {split} < {SPLIT_TRAIN_PCT}"
    )
    h = hash64_sql("t")
    thrs = ", ".join(str(int(t)) for t in CLS_EVAL_THRESHOLDS)
    ctes.append(
        f"""hold AS (
  SELECT doc_id, toks, y FROM (
    SELECT doc_id, {tokens_sql('text')} AS toks,
           CASE WHEN {quality_score_sql('text')} >= {CLS_LABEL_Q}
                THEN 1 ELSE 0 END AS y
    FROM documents
  ) WHERE len(toks) > 0 AND {split} >= {SPLIT_TRAIN_PCT}
), hbt AS (
  SELECT b.doc_id, ({h} % {CLS_DIM}) AS j
  FROM hold b, unnest(b.toks) AS u(t)
), hz AS (
  SELECT t.doc_id, max(b.y) AS y,
         {CLS_BIAS_MILLI}
           + cast(floor(sum(w.w) / count(*)) AS bigint) AS z
  FROM hbt t JOIN w{CLS_EPOCHS} w USING (j)
  JOIN hold b ON b.doc_id = t.doc_id
  GROUP BY t.doc_id
), thrs AS (SELECT cast(unnest([{thrs}]) AS int) AS thr)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT thr,
       count(*) AS n_holdout,
       cast(sum(y) AS bigint) AS n_pos,
       cast(sum(CASE WHEN z >= thr AND y = 1 THEN 1 ELSE 0 END)
            AS bigint) AS tp,
       cast(sum(CASE WHEN z >= thr AND y = 0 THEN 1 ELSE 0 END)
            AS bigint) AS fp,
       cast(sum(CASE WHEN z < thr AND y = 1 THEN 1 ELSE 0 END)
            AS bigint) AS fn,
       cast(sum(CASE WHEN z < thr AND y = 0 THEN 1 ELSE 0 END)
            AS bigint) AS tn,
       cast(CASE WHEN sum(CASE WHEN z >= thr THEN 1 ELSE 0 END) > 0
            THEN floor(sum(CASE WHEN z >= thr AND y = 1 THEN 1 ELSE 0 END)
                       * 10000.0
                       / sum(CASE WHEN z >= thr THEN 1 ELSE 0 END))
            END AS bigint) AS precision_per_10k,
       cast(CASE WHEN sum(y) > 0
            THEN floor(sum(CASE WHEN z >= thr AND y = 1 THEN 1 ELSE 0 END)
                       * 10000.0 / sum(y))
            END AS bigint) AS recall_per_10k,
       cast(CASE WHEN count(*) > 0
            THEN floor((sum(CASE WHEN z >= thr AND y = 1 THEN 1 ELSE 0 END)
                        + sum(CASE WHEN z < thr AND y = 0 THEN 1 ELSE 0 END))
                       * 10000.0 / count(*))
            END AS bigint) AS acc_per_10k
FROM hz CROSS JOIN thrs GROUP BY thr"""
    )


def dedup_chain_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitivity (chaining) audit of the near-dup clusters — the
    known failure mode of connected-component dedup: A~B and B~C
    chain A and C into one cluster even when A and C are NOT
    near-dups, so a keep-one pass silently drops non-duplicates. Per
    log2 cluster-size bucket: cluster count, mean edge density
    (2E / sz(sz-1), fixed-point q4 — density 1 = a clique, every
    member pairwise-similar; low density on big clusters = chaining)
    and how many clusters are non-cliques. This is the number that
    says whether CC labels can be trusted as "duplicate groups" or
    only as "merge candidates for review".

    Plan: rides the SAME pair-bounded label table as dedup_clusters
    (the corpus never enters); edge counts come from one join of the
    capped pair list against the labels; everything after is integer
    arithmetic at cluster grain then a <= 64-row rollup."""
    edges = (
        minhash_lsh_pairs(spark, sf_dir)
        .select("id1", "id2")
        .localCheckpoint(eager=True)
    )
    labels = _cc_labels(spark, sf_dir, edges=edges)
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("sz"))
    # every LSH pair is within one component by construction, so the
    # per-cluster edge count is a single label join on one endpoint
    e_per = (
        edges.join(
            labels.select(F.col("node").alias("id1"), "label"), "id1"
        )
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    per = sizes.join(e_per, "label").select(
        "sz",
        "n_edges",
        F.floor(
            F.col("n_edges") * 20000 / (F.col("sz") * (F.col("sz") - 1))
        )
        .cast("bigint")
        .alias("dens_q4"),
    )
    return per.groupBy(
        F.floor(F.log2("sz")).cast("int").alias("log2_size")
    ).agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("n_edges").alias("n_edges"),
        F.floor(F.sum("dens_q4") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("mean_density_q4"),
        F.min("dens_q4").alias("min_density_q4"),
        F.sum((F.col("dens_q4") < 10000).cast("long")).alias(
            "n_chained"
        ),
    )


def _chain_audit_sql() -> str:
    return f"""
WITH RECURSIVE lsh_pairs AS (
  SELECT id1, id2 FROM ({_minhash_lsh_sql()})
), edges AS (
  SELECT id1 AS src, id2 AS dst FROM lsh_pairs
  UNION ALL
  SELECT id2, id1 FROM lsh_pairs
), reach(node, anc) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.anc FROM reach r JOIN edges e ON e.src = r.node
), labels AS (
  SELECT node, min(anc) AS label FROM reach GROUP BY node
), sizes AS (
  SELECT label, count(*) AS sz FROM labels GROUP BY label
), e_per AS (
  SELECT l.label, count(*) AS n_edges
  FROM lsh_pairs p JOIN labels l ON l.node = p.id1
  GROUP BY l.label
), per AS (
  SELECT sz, n_edges,
         cast(floor(n_edges * 20000 / (sz * (sz - 1))) AS bigint)
           AS dens_q4
  FROM sizes JOIN e_per USING (label)
)
SELECT cast(floor(log2(sz)) AS int) AS log2_size,
       count(*) AS n_clusters,
       cast(sum(n_edges) AS bigint) AS n_edges,
       cast(floor(sum(dens_q4) / count(*)) AS bigint) AS mean_density_q4,
       min(dens_q4) AS min_density_q4,
       cast(sum(CASE WHEN dens_q4 < 10000 THEN 1 ELSE 0 END) AS bigint)
         AS n_chained
FROM per GROUP BY 1
"""


def _cluster_hist_sql() -> str:
    return f"""
WITH RECURSIVE lsh_pairs AS (
  SELECT id1, id2 FROM ({_minhash_lsh_sql()})
), edges AS (
  SELECT id1 AS src, id2 AS dst FROM lsh_pairs
  UNION ALL
  SELECT id2, id1 FROM lsh_pairs
), reach(node, anc) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.anc FROM reach r JOIN edges e ON e.src = r.node
), labels AS (
  SELECT node, min(anc) AS label FROM reach GROUP BY node
), sizes AS (
  SELECT label, count(*) AS sz FROM labels GROUP BY label
)
SELECT cast(floor(log2(sz)) AS int) AS log2_size,
       count(*)                     AS n_clusters,
       cast(sum(sz) AS bigint)      AS n_docs,
       cast(sum(sz - 1) AS bigint)  AS n_droppable,
       min(sz)                      AS min_size,
       max(sz)                      AS max_size
FROM sizes GROUP BY 1
"""


VOCAB_GROWTH_SHARDS = 10


def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps'-law) curve: split the corpus into
    {VOCAB_GROWTH_SHARDS} equal doc_id-ordered shards and report, per
    shard, how many NEVER-SEEN-BEFORE token types it contributes —
    the marginal-value-of-more-data diagnostic that tells a
    pretraining run when additional crawl stops buying new vocabulary.
    A token's first appearance is min(shard) over its occurrences, so
    the "seen before" state needs no sequential pass.

    Plan: one corpus count (scalar), one explode, one (token ->
    min shard, total occurrences) hash aggregate, then a
    {VOCAB_GROWTH_SHARDS}-row rollup whose cumulative sum runs on a
    bounded relation — at 100 TB the only corpus-sized work is the
    token aggregate, map-side combined. Dense doc_ids make the shard
    split exact; a sparse id space would use ntile's two-pass rank
    (operators/ranks.py) instead."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()  # scalar: shard width denominator
    shard = F.least(
        F.lit(VOCAB_GROWTH_SHARDS - 1),
        F.floor(
            F.col("doc_id") * VOCAB_GROWTH_SHARDS / F.lit(float(n_docs))
        ),
    ).cast("int")
    tok = d.select(shard.alias("shard"), F.explode(T.tokens("text")).alias("t"))
    first = tok.groupBy("t").agg(
        F.min("shard").alias("first_shard"),
        F.count(F.lit(1)).alias("occ"),
    )
    per = (
        tok.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
        .join(
            first.groupBy(F.col("first_shard").alias("shard")).agg(
                F.count(F.lit(1)).alias("n_new_types"),
            ),
            "shard",
            "left",
        )
        .na.fill({"n_new_types": 0})
    )
    w = Window.orderBy("shard").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per.select(
        "shard",
        "n_tokens",
        "n_new_types",
        F.sum("n_new_types").over(w).alias("cum_vocab"),
        F.floor(F.col("n_new_types") * 1e6 / F.col("n_tokens"))
        .cast("long")
        .alias("new_types_per_m_tokens"),
    )


def _vocab_growth_sql() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, text,
         cast(least({VOCAB_GROWTH_SHARDS - 1},
              floor(doc_id * {VOCAB_GROWTH_SHARDS}
                    / cast((SELECT count(*) FROM documents) AS double)))
              AS int) AS shard
  FROM documents
), tok AS (
  SELECT shard, unnest({T.tokens_sql('text')}) AS t FROM d
), first AS (
  SELECT t, min(shard) AS first_shard FROM tok GROUP BY t
), per AS (
  SELECT tok.shard, count(*) AS n_tokens
  FROM tok GROUP BY tok.shard
), news AS (
  SELECT first_shard AS shard, count(*) AS n_new_types
  FROM first GROUP BY first_shard
)
SELECT per.shard, per.n_tokens,
       cast(coalesce(news.n_new_types, 0) AS bigint) AS n_new_types,
       cast(sum(coalesce(news.n_new_types, 0))
            OVER (ORDER BY per.shard) AS bigint) AS cum_vocab,
       cast(floor(coalesce(news.n_new_types, 0) * 1e6 / per.n_tokens)
            AS bigint) AS new_types_per_m_tokens
FROM per LEFT JOIN news ON news.shard = per.shard
"""


# PageRank over the near-dup graph: fixed-point scale, iteration
# count and report size. Integer-exact so the unrolled-CTE oracle
# replays the loop bit-for-bit (the BPE discipline applied to a graph
# algorithm).
PR_SCALE = 10**12
PR_ITERS = 10
PR_TOP_K = 20


def _pagerank_driver(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """The identical fixed-point integer PageRank over a COLLECTED
    (id1, id2) pair list — every quantity is int64 arithmetic with
    order-insensitive sums, so the driver loop is bit-equal to the
    distributed formulation and to the DuckDB oracle's unrolled CTEs.
    Bounded by CC_DRIVER_EDGE_CAP exactly like _cc_labels_driver."""
    sym: list[tuple[int, int]] = []
    for r in edges.collect():
        sym.append((r.id1, r.id2))
        sym.append((r.id2, r.id1))
    deg: dict[int, int] = {}
    for s, _d in sym:
        deg[s] = deg.get(s, 0) + 1
    n = len(deg)
    base = 15 * PR_SCALE // (100 * n)
    pr = {node: PR_SCALE // n for node in deg}
    for _ in range(PR_ITERS):
        insum: dict[int, int] = {}
        for s, d in sym:
            insum[d] = insum.get(d, 0) + pr[s] // deg[s]
        pr = {
            node: base + 85 * insum.get(node, 0) // 100 for node in deg
        }
    top = sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))[:PR_TOP_K]
    return spark.createDataFrame(
        [(node, rank, deg[node]) for node, rank in top],
        "doc_id long, pr_q12 long, degree long",
    )


def pagerank_dedup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the near-dup pair graph — which
    documents sit at the CENTER of duplication neighborhoods (the
    canonical-representative signal template-cluster triage wants:
    high-PR nodes are the "original" boilerplate carriers, leaves are
    one-off copies). The graph is the capped LSH pair table, so this
    is an ITERATIVE algorithm over a pair-bounded relation — the
    corpus never enters the loop (the dedup_clusters CC discipline).

    Integer-exact fixed point: rank mass is int64 at PR_SCALE=1e12;
    per-edge contribution is pr div deg (truncating division,
    positive operands so floor); damping is (85 * insum) div 100 plus
    the teleport base floor(0.15 * SCALE / n). Integer sums are
    order-insensitive, so Spark's shuffle order and DuckDB's scan
    order cannot produce different hashes — the standard float
    PageRank would diverge in the last ulp.

    Plan: below CC_DRIVER_EDGE_CAP the collected pair list runs the
    loop on the driver (the _cc_labels discipline — identical integer
    arithmetic, so the result is bit-equal to the distributed loop;
    10 distributed iterations over a few-thousand-edge graph were
    pure scheduler latency, ~3 s of the r12 bench median). Above the
    cap: the SYMMETRIC edge list and the degree table are
    localCheckpoint'd once (round-10 verdict: the earlier shape
    checkpointed only the raw pairs, so all 10 iteration jobs
    re-ran the union + degree aggregation); each iteration is then
    one (edge join + target-grain aggregate) on those cached
    pair-bounded relations, checkpointed so lineage stays flat.
    Output: top-20 by rank (ties broken by doc_id — a deterministic
    SET, so LIMIT agrees cross-engine)."""
    edges = minhash_lsh_pairs(spark, sf_dir).select("id1", "id2")
    if edges.count() <= CC_DRIVER_EDGE_CAP:
        return _pagerank_driver(spark, edges)
    sym = (
        edges.union(
            edges.select(
                F.col("id2").alias("id1"), F.col("id1").alias("id2")
            )
        )
        .select(F.col("id1").alias("s"), F.col("id2").alias("d"))
        .localCheckpoint(eager=True)
    )
    deg = (
        sym.groupBy(F.col("s").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    n = deg.count()  # scalar; pair-bounded, never corpus-scale
    base = 15 * PR_SCALE // (100 * n)
    pr = deg.select(
        "node", "deg", F.lit(PR_SCALE // n).cast("long").alias("pr")
    )
    for _ in range(PR_ITERS):
        contrib = sym.join(
            pr.select(
                F.col("node").alias("s"),
                F.expr("pr div deg").alias("c"),
            ),
            "s",
        )
        insum = contrib.groupBy(F.col("d").alias("node")).agg(
            F.sum("c").alias("insum")
        )
        pr = (
            deg.join(insum, "node", "left")
            .select(
                "node",
                "deg",
                (
                    F.lit(base)
                    + F.expr("85 * coalesce(insum, 0) div 100")
                ).cast("long").alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        pr.orderBy(F.col("pr").desc(), F.col("node").asc())
        .limit(PR_TOP_K)
        .select(
            F.col("node").alias("doc_id"),
            F.col("pr").alias("pr_q12"),
            F.col("deg").alias("degree"),
        )
    )


def _pagerank_sql() -> str:
    prev = "pr0"
    iters = []
    for i in range(1, PR_ITERS + 1):
        iters.append(f"""it{i} AS (
  SELECT g.node, g.deg,
         (SELECT (15 * {PR_SCALE}) // (100 * n) FROM nn)
         + (85 * coalesce(sum(p.pr // p.deg), 0)) // 100 AS pr
  FROM deg g
  LEFT JOIN sym e ON e.d = g.node
  LEFT JOIN {prev} p ON p.node = e.s
  GROUP BY g.node, g.deg
)""")
        prev = f"it{i}"
    chain = ",\n".join(iters)
    # AS MATERIALIZED is load-bearing: sym/deg are referenced by all
    # ten iteration CTEs, and without the hint DuckDB inlines the
    # whole minhash-pair chain into each one (measured 100 s vs ~3 s)
    return f"""
WITH pairs AS MATERIALIZED ({_minhash_lsh_sql()}),
sym AS MATERIALIZED (
  SELECT id1 AS s, id2 AS d FROM pairs
  UNION ALL
  SELECT id2, id1 FROM pairs
),
deg AS MATERIALIZED (
  SELECT s AS node, count(*) AS deg FROM sym GROUP BY 1),
nn AS (SELECT count(*) AS n FROM deg),
pr0 AS (SELECT node, deg, (SELECT {PR_SCALE} // n FROM nn) AS pr FROM deg),
{chain}
SELECT node AS doc_id, cast(pr AS bigint) AS pr_q12,
       cast(deg AS bigint) AS degree
FROM {prev}
ORDER BY pr DESC, node ASC LIMIT {PR_TOP_K}
"""


def dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + local clustering coefficient over the
    near-dup pair graph — the structural complement of
    dedup_chain_audit: chain audit measures per-CLUSTER edge density,
    the clustering coefficient says per NODE whether its neighbors
    also match each other. A near-dup neighborhood that is a clique
    (coef 1) is one duplicated artifact; coef ~0 with high degree is
    chaining through a hub (boilerplate stitching unrelated docs) —
    the case where transitive-closure dedup over-merges.

    Triangle counting uses the oriented-edge join: with edges kept as
    id1 < id2, triangles are (a<b<c) with all three edges present —
    each triangle counted exactly once by joining the ordered edge
    list with itself on the shared endpoint and probing the closing
    edge. On the CAPPED pair graph (LSH_BUCKET_CAP) the join is
    pair-bounded; the corpus never appears.

    Output per log2-degree bucket: nodes, triangles (node-summed),
    mean clustering coefficient (q6) — bounded rows at any scale."""
    edges = (
        minhash_lsh_pairs(spark, sf_dir)
        .select("id1", "id2")
        .localCheckpoint(eager=True)
    )
    # wedges a<b<c from ordered edges (a,b) and (b,c)... two forms:
    # (a,b)+(a,c) share the smaller endpoint; close with (b,c).
    e1 = edges.select(F.col("id1").alias("a"), F.col("id2").alias("b"))
    wedge = e1.join(
        edges.select(F.col("id1").alias("a"), F.col("id2").alias("c")),
        "a",
    ).where(F.col("b") < F.col("c"))
    tri = wedge.join(
        edges.select(F.col("id1").alias("b"), F.col("id2").alias("c")),
        ["b", "c"],
    ).select("a", "b", "c")
    # per-node triangle participation: each triangle touches 3 nodes
    node_tri = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    sym = edges.union(
        edges.select(F.col("id2").alias("id1"), F.col("id1").alias("id2"))
    )
    deg = sym.groupBy(F.col("id1").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    scored = deg.join(node_tri, "node", "left").select(
        "node",
        "deg",
        F.coalesce("n_tri", F.lit(0)).alias("n_tri"),
        F.when(
            F.col("deg") >= 2,
            F.round(
                2 * F.coalesce("n_tri", F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1)),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("coef"),
    )
    bucket = F.length(F.bin(F.col("deg"))) - 1  # log2 magnitude
    return scored.groupBy(bucket.alias("deg_log2")).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("n_tri").alias("n_triangles"),
        F.round(F.avg("coef"), 6).alias("mean_coef"),
    )


def _triangles_sql() -> str:
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT id1, id2 FROM ({_minhash_lsh_sql()})
), wedge AS (
  SELECT x.id1 AS a, x.id2 AS b, y.id2 AS c
  FROM pairs x JOIN pairs y ON x.id1 = y.id1 AND x.id2 < y.id2
), tri AS (
  SELECT a, b, c FROM wedge
  JOIN pairs z ON z.id1 = wedge.b AND z.id2 = wedge.c
), node_tri AS (
  SELECT node, count(*) AS n_tri
  FROM (SELECT a AS node FROM tri UNION ALL
        SELECT b FROM tri UNION ALL
        SELECT c FROM tri)
  GROUP BY node
), sym AS (
  SELECT id1, id2 FROM pairs
  UNION ALL SELECT id2, id1 FROM pairs
), deg AS (
  SELECT id1 AS node, count(*) AS deg FROM sym GROUP BY 1
), scored AS (
  SELECT d.node, d.deg,
         coalesce(t.n_tri, 0) AS n_tri,
         CASE WHEN d.deg >= 2
              THEN round(2.0 * coalesce(t.n_tri, 0)
                         / (d.deg * (d.deg - 1)), 6)
              ELSE 0.0 END AS coef
  FROM deg d LEFT JOIN node_tri t ON t.node = d.node
)
SELECT length(bin(deg)) - 1 AS deg_log2,
       count(*) AS n_nodes,
       cast(sum(n_tri) AS bigint) AS n_triangles,
       round(avg(coef), 6) AS mean_coef
FROM scored GROUP BY 1
"""


QUERIES = [
    QuerySpec(
        "dedup_graph_triangles",
        dedup_graph_triangles,
        _triangles_sql(),
        "triangle count + clustering coefficient per degree bucket",
    ),
    QuerySpec(
        "pagerank_dedup_graph",
        pagerank_dedup_graph,
        _pagerank_sql(),
        "integer-exact PageRank over the capped near-dup pair graph",
    ),
    QuerySpec(
        "weighted_sample_docs", weighted_sample_docs, WEIGHTED_SAMPLE_SQL
    ),
    QuerySpec("dedup_clusters", dedup_clusters, DEDUP_CLUSTERS_SQL),
    QuerySpec(
        "dedup_cluster_source_mix",
        dedup_cluster_source_mix,
        DEDUP_CLUSTER_SOURCE_MIX_SQL,
        "near-dup cluster provenance: syndication vs re-crawl mix",
    ),
    QuerySpec(
        "vocab_growth_curve",
        vocab_growth_curve,
        _vocab_growth_sql(),
        "Heaps-law vocabulary growth per doc_id-ordered shard",
    ),
    QuerySpec("dedup_keep_best", dedup_keep_best, _dedup_keep_best_sql()),
    QuerySpec(
        "dedup_survivor_bias_audit",
        dedup_survivor_bias_audit,
        _survivor_bias_sql(),
        "per-source removal bias of the keep-best dedup rule",
    ),
    QuerySpec(
        "stratified_sample_docs", stratified_sample_docs, STRATIFIED_SAMPLE_SQL
    ),
    QuerySpec("token_pack_bins", token_pack_bins, TOKEN_PACK_SQL),
    QuerySpec(
        "packing_waste_curve",
        packing_waste_curve,
        _packing_sweep_sql(),
        "pad-vs-concat packing cost (waste, fragmentation) across "
        "candidate context lengths",
    ),
    QuerySpec("contamination_check", contamination_check, _contamination_sql()),
    QuerySpec(
        "sliding_window_chunks", sliding_window_chunks, SLIDING_CHUNK_SQL
    ),
    QuerySpec("mixture_weights", mixture_weights, MIXTURE_SQL),
    QuerySpec(
        "mixture_sample_docs", mixture_sample_docs, MIXTURE_SAMPLE_SQL
    ),
    QuerySpec(
        "mixture_sample_threshold",
        mixture_sample_threshold,
        MIXTURE_THRESHOLD_SQL,
    ),
    QuerySpec(
        "bpe_merge_pair_counts", bpe_merge_pair_counts, BPE_MERGE_SQL
    ),
    QuerySpec(
        "token_dropout_stats", token_dropout_stats, _token_dropout_sql()
    ),
    QuerySpec(
        "span_corruption_stats", span_corruption_stats, _span_corruption_sql()
    ),
    QuerySpec("bpe_train_merges", bpe_train_merges, _bpe_train_sql()),
    QuerySpec("bpe_encode_stats", bpe_encode_stats, _bpe_encode_sql()),
    QuerySpec(
        "bpe_fertility_by_language",
        bpe_fertility_by_language,
        _bpe_fertility_sql(),
        "vocab-equity audit: per-language fertility, bytes/token and "
        "byte-fallback OOV rate under the learned merges",
    ),
    QuerySpec(
        "mixture_temperature_sweep",
        mixture_temperature_sweep,
        _mixture_sweep_sql(),
        "per-source sampling weight / budget / effective-epochs table "
        "across temperature alphas",
    ),
    QuerySpec(
        "dsir_importance_weights",
        dsir_importance_weights,
        _dsir_sql(),
        "DSIR hashed-ngram importance-resampling selection weights",
    ),
    QuerySpec(
        "dedup_cluster_size_histogram",
        dedup_cluster_size_histogram,
        _cluster_hist_sql(),
        "log2 near-dup cluster-size distribution",
    ),
    QuerySpec(
        "dedup_chain_audit",
        dedup_chain_audit,
        _chain_audit_sql(),
        "CC chaining audit: edge density per cluster-size bucket",
    ),
    QuerySpec(
        "classifier_train_epochs",
        classifier_train_epochs,
        _classifier_train_sql(),
        "fixed-point logistic-regression training epochs",
    ),
    QuerySpec(
        "classifier_eval_holdout",
        classifier_eval_holdout,
        _classifier_eval_holdout_sql(),
        "train-split classifier evaluated on the hash-split holdout: "
        "per-threshold confusion/precision/recall vs rule labels",
    ),
]
