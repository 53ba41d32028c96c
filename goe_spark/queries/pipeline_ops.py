"""Training-data pipeline operators: boilerplate segment removal,
deterministic shard manifests, filter-funnel attrition accounting,
and per-source budget capping.

These are the remaining curation stages a 100 TB pretraining pipeline
runs between raw ingest and tokenization (CCNet / RefinedWeb /
Gopher-style), additive to the reference's scope (SURVEY §2.9) and
expressed entirely with built-in DataFrame operations:

- segment_dedup_stats — the "line-level dedup" step (RefinedWeb
  removes lines repeated across documents; our fixture text has no
  newlines, so the unit is non-overlapping W-word segments). Segment
  fingerprints shuffle as 8-byte hashes — never segment strings —
  through one count-distinct aggregation and one hash join back.
- shard_manifest — deterministic hash-sharding of the corpus into
  training shards: pure map-side shard keys, one aggregation; the
  manifest (docs/tokens/bytes per shard) is what a data loader
  verifies against. Re-running on the same corpus reproduces the
  exact same assignment (content-addressed, no RNG).
- filter_funnel_report — per-rule and cumulative attrition of a
  quality-filter chain in ONE scan (conditional aggregation; no rule
  runs a second pass). The operational report behind every "we
  dropped 37% at stage 2" pipeline dashboard.
- per_source_topk_cap — source budget capping: keep the top-K docs
  per source by quality (window partitioned BY SOURCE — the sort is
  executor-local per group, never global).

Scale notes (100 TB): every operator is one scan plus at most one
key-grain shuffle; outputs are source/shard-grain (tens of rows).
The md5-based 60-bit fingerprints (functions/hashing.py) exist for
cross-engine verification; at production scale xxhash64 halves the
map-side CPU with the identical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from goe_spark.catalog import load_table
from goe_spark.functions.hashing import hash64, hash64_sql
from goe_spark.queries import QuerySpec

from goe_spark.operators.segment_index import SEG_WORDS, segment_fp_frame

SEG_MIN_DOCS = 2  # a segment in >= this many docs is boilerplate
NEW_DOC_MOD = 10  # doc_id % 10 == 0 -> the ~10% "new batch" slice
N_SHARDS = 16
SOURCE_CAP_K = 10
MIN_CHARS = 100
MIN_TOKENS = 20


def segment_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-segment accounting per source: split each doc into
    non-overlapping SEG_WORDS-word segments, fingerprint each, count
    how many DISTINCT docs contain each fingerprint, and report per
    source how many segments a dedup pass would strip (those found in
    >= SEG_MIN_DOCS docs) — RefinedWeb's line-dedup, at segment grain.

    Plan: ONE corpus scan, no join. Segments explode map-side and
    reduce to (doc_id, source, fp) grain through one exchange; fp
    doc-frequency is then a COUNT over an fp-PARTITIONED window
    (sort-free, executor-local after the fp exchange — the same
    fp-window shape dedup_exact_keep_first pins). Everything that
    shuffles is 8-byte fingerprints + ids, never text. A universally
    duplicated segment concentrates its doc list in one window
    partition — bounded by that segment's doc frequency, the same
    bound exact dedup carries; the join-back formulation trades that
    for a second corpus scan, the worse deal."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    # (doc, fp) grain via the one canonical segment lineage (shared
    # with the materialized index + incremental probe). A doc belongs
    # to exactly one source, so fp doc-frequency is the plain row
    # count at this grain.
    doc_fp = segment_fp_frame(d)
    flagged = doc_fp.withColumn(
        "doc_freq", F.count(F.lit(1)).over(Window.partitionBy("fp"))
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("n_seg").alias("n_segments"),
            F.sum(
                F.when(
                    F.col("doc_freq") >= SEG_MIN_DOCS, F.col("n_seg")
                ).otherwise(0)
            ).alias("n_boilerplate"),
            F.countDistinct(
                F.when(F.col("doc_freq") >= SEG_MIN_DOCS, F.col("doc_id"))
            ).alias("n_docs_touched"),
        )
        .select(
            "source",
            "n_docs",
            "n_segments",
            "n_boilerplate",
            "n_docs_touched",
            F.round(F.col("n_boilerplate") / F.col("n_segments"), 6).alias(
                "boilerplate_frac"
            ),
        )
    )


_TOKS_SQL = r"regexp_split_to_array(trim(text), '\s+')"

SEGMENT_DEDUP_SQL = f"""
WITH segs AS (
  SELECT doc_id, source,
         {hash64_sql("seg")} AS fp
  FROM (
    SELECT doc_id, source,
           unnest(list_transform(
             range(cast(ceil(len(w) / {SEG_WORDS}.0) AS bigint)),
             i -> array_to_string(w[i * {SEG_WORDS} + 1 : i * {SEG_WORDS} + {SEG_WORDS}], ' ')
           )) AS seg
    FROM (SELECT doc_id, source, {_TOKS_SQL} AS w FROM documents)
  )
), freq AS (
  SELECT fp, count(DISTINCT doc_id) AS doc_freq FROM segs GROUP BY fp
)
SELECT source,
       count(DISTINCT s.doc_id)                        AS n_docs,
       count(*)                                        AS n_segments,
       cast(sum(CASE WHEN doc_freq >= {SEG_MIN_DOCS} THEN 1 ELSE 0 END) AS bigint)
                                                       AS n_boilerplate,
       count(DISTINCT CASE WHEN doc_freq >= {SEG_MIN_DOCS} THEN s.doc_id END)
                                                       AS n_docs_touched,
       round(sum(CASE WHEN doc_freq >= {SEG_MIN_DOCS} THEN 1 ELSE 0 END)
             / count(*), 6)                            AS boilerplate_frac
FROM segs s JOIN freq USING (fp)
GROUP BY source
"""


def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment + manifest: every doc
    hashes to one of N_SHARDS shards (content-addressed — the same
    corpus always produces the same shards, no RNG state); the
    manifest rows are what the training data loader checks off.

    Plan: map-side shard key, one shard-grain aggregation (N_SHARDS
    rows). At 100 TB the same expression feeds
    ``.write.partitionBy("shard")`` to materialize the shards; the
    manifest is the bookkeeping half."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    shard = F.pmod(hash64(F.col("doc_id").cast("string")), F.lit(N_SHARDS))
    return (
        d.select(
            shard.alias("shard"),
            F.col("doc_id"),
            toks.alias("n_tokens"),
            F.length("text").alias("n_bytes"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.sum("n_bytes").alias("sum_bytes"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


SHARD_MANIFEST_SQL = f"""
SELECT ({hash64_sql("cast(doc_id AS varchar)")}) % {N_SHARDS} AS shard,
       count(*)                                   AS n_docs,
       cast(sum(len({_TOKS_SQL})) AS bigint)      AS sum_tokens,
       cast(sum(length(text)) AS bigint)          AS sum_bytes,
       min(doc_id)                                AS min_doc_id,
       max(doc_id)                                AS max_doc_id
FROM documents
GROUP BY 1
"""


def filter_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter funnel: per source, how many docs survive each
    cumulative stage of the filter chain — min length, min tokens,
    mean-word-length band — plus each rule's solo kill count. ONE
    conditional-aggregation scan; adding a rule adds a column, never
    a pass. Thresholds compare in integer arithmetic (3*tokens <=
    chars <= 12*tokens) so no float boundary can disagree between
    engines."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    chars = F.length("text")
    r1 = chars >= MIN_CHARS
    r2 = toks >= MIN_TOKENS
    r3 = (F.lit(3) * toks <= chars) & (chars <= F.lit(12) * toks)
    flagged = d.select(
        "source",
        r1.cast("int").alias("p1"),
        r2.cast("int").alias("p2"),
        r3.cast("int").alias("p3"),
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("p1").alias("pass_len"),
        F.sum(F.col("p1") * F.col("p2")).alias("pass_len_tok"),
        F.sum(F.col("p1") * F.col("p2") * F.col("p3")).alias("pass_all"),
        F.sum(1 - F.col("p1")).alias("killed_by_len"),
        F.sum(1 - F.col("p2")).alias("killed_by_tok"),
        F.sum(1 - F.col("p3")).alias("killed_by_wordlen"),
    )


FILTER_FUNNEL_SQL = f"""
SELECT source,
       count(*) AS n_docs,
       cast(sum(p1) AS bigint)            AS pass_len,
       cast(sum(p1 * p2) AS bigint)       AS pass_len_tok,
       cast(sum(p1 * p2 * p3) AS bigint)  AS pass_all,
       cast(sum(1 - p1) AS bigint)        AS killed_by_len,
       cast(sum(1 - p2) AS bigint)        AS killed_by_tok,
       cast(sum(1 - p3) AS bigint)        AS killed_by_wordlen
FROM (
  SELECT source,
         CASE WHEN length(text) >= {MIN_CHARS} THEN 1 ELSE 0 END AS p1,
         CASE WHEN len({_TOKS_SQL}) >= {MIN_TOKENS} THEN 1 ELSE 0 END AS p2,
         CASE WHEN 3 * len({_TOKS_SQL}) <= length(text)
               AND length(text) <= 12 * len({_TOKS_SQL})
              THEN 1 ELSE 0 END AS p3
  FROM documents
)
GROUP BY source
"""


def per_source_topk_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source budget capping: keep only the SOURCE_CAP_K highest-
    quality docs per source (quality = token count here; any score
    column slots in) and report what the cap kept. The window
    partitions BY SOURCE, so each group's sort is executor-local —
    the per-entity top-k that DOES scale, in contrast to the global
    rankings operators/ranks.py replaces.

    Skew-safety REQUIRES Spark >= 3.5: InferWindowGroupLimit compiles
    `row_number() <= K` into a map-side per-group top-K prefilter
    (Partial WindowGroupLimit) before the shuffle, so a dominant
    source ships at most K rows per map task instead of its whole
    partition. tests/test_plan_structure.py pins both nodes in the
    physical plan — on an older Spark this query must switch to a
    groupBy + min_by/top-K-aggregate form."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    scored = d.select(
        "source", "doc_id", toks.alias("score"), F.length("text").alias("n_chars")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    kept = scored.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= SOURCE_CAP_K
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("score").alias("min_kept_score"),
        F.max("score").alias("max_kept_score"),
        F.sum("n_chars").alias("sum_chars_kept"),
        F.min("doc_id").alias("min_doc_id"),
    )


SOURCE_CAP_SQL = f"""
SELECT source,
       count(*)                      AS n_kept,
       min(score)                    AS min_kept_score,
       max(score)                    AS max_kept_score,
       cast(sum(n_chars) AS bigint)  AS sum_chars_kept,
       min(doc_id)                   AS min_doc_id
FROM (
  SELECT source, doc_id, score, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY score DESC, doc_id) AS rn
  FROM (
    SELECT source, doc_id,
           len({_TOKS_SQL}) AS score,
           length(text)     AS n_chars
    FROM documents
  )
)
WHERE rn <= {SOURCE_CAP_K}
GROUP BY source
"""


def segment_probe_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental boilerplate probe: a new ingest batch (doc_id %
    NEW_DOC_MOD == 0, standing in for a daily increment) scored
    against the MATERIALIZED standing-corpus segment index
    (operators/segment_index.ensure_segment_index — the minhash/IVF
    index discipline). Per new-batch source: how many of the batch's
    segments were already seen in the standing corpus, and how many
    hit full boilerplate frequency there.

    Cost structure: the index side scans column-pruned (doc_id, fp)
    parquet — no text, no md5 recompute — and reduces to fp grain
    with map-side partial counts; only the batch pays fingerprinting.
    Per-increment cost is O(batch) after the one-time build.
    Fingerprints are a pure function of the text, so the indexed
    result is bit-identical to the recompute-everything oracle."""
    from goe_spark.operators.segment_index import (
        ensure_segment_index,
        load_segments,
    )

    is_new = F.col("doc_id") % NEW_DOC_MOD == 0
    idx_dir = ensure_segment_index(spark, sf_dir)
    standing = (
        load_segments(spark, idx_dir)
        .where(~is_new)
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("standing_freq"))
    )
    batch = segment_fp_frame(
        load_table(spark, sf_dir, "documents").where(is_new)
    )
    joined = batch.join(standing, "fp", "left").na.fill(
        {"standing_freq": 0}
    )
    return joined.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_new_docs"),
        F.sum("n_seg").alias("n_segments"),
        F.sum(
            F.when(F.col("standing_freq") >= 1, F.col("n_seg")).otherwise(0)
        ).alias("n_seen"),
        F.sum(
            F.when(
                F.col("standing_freq") >= SEG_MIN_DOCS, F.col("n_seg")
            ).otherwise(0)
        ).alias("n_boilerplate"),
        F.round(
            F.sum(
                F.when(F.col("standing_freq") >= 1, F.col("n_seg")).otherwise(
                    0
                )
            )
            / F.sum("n_seg"),
            6,
        ).alias("seen_frac"),
    )


SEGMENT_PROBE_SQL = f"""
WITH doc_fp AS (
  SELECT doc_id, source, fp, count(*) AS n_seg
  FROM (
    SELECT doc_id, source, {hash64_sql("seg")} AS fp
    FROM (
      SELECT doc_id, source,
             unnest(list_transform(
               range(cast(ceil(len(w) / {SEG_WORDS}.0) AS bigint)),
               i -> array_to_string(w[i * {SEG_WORDS} + 1 : i * {SEG_WORDS} + {SEG_WORDS}], ' ')
             )) AS seg
      FROM (SELECT doc_id, source, {_TOKS_SQL} AS w FROM documents)
    )
  )
  GROUP BY doc_id, source, fp
), standing AS (
  SELECT fp, count(*) AS standing_freq
  FROM doc_fp WHERE doc_id % {NEW_DOC_MOD} <> 0 GROUP BY fp
), batch AS (
  SELECT b.source, b.doc_id, b.n_seg,
         coalesce(s.standing_freq, 0) AS standing_freq
  FROM doc_fp b LEFT JOIN standing s USING (fp)
  WHERE b.doc_id % {NEW_DOC_MOD} = 0
)
SELECT source,
       count(DISTINCT doc_id)         AS n_new_docs,
       cast(sum(n_seg) AS bigint)     AS n_segments,
       cast(sum(CASE WHEN standing_freq >= 1 THEN n_seg ELSE 0 END)
            AS bigint)                AS n_seen,
       cast(sum(CASE WHEN standing_freq >= {SEG_MIN_DOCS} THEN n_seg
                ELSE 0 END) AS bigint) AS n_boilerplate,
       round(sum(CASE WHEN standing_freq >= 1 THEN n_seg ELSE 0 END)
             / sum(n_seg), 6)         AS seen_frac
FROM batch GROUP BY source
"""


def length_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-curriculum binning: global DECILES of the corpus by
    token count (short→long — the classic curriculum-learning
    schedule), reported per bin with doc and token budgets.

    The global ranking uses the distributed two-pass rank
    (`operators/ranks.py` — range shuffle + partition-offset
    positions), proving the helper generalizes beyond customer grain:
    at billions of DOCS this plan still has no global window. ntile
    parity with the oracle's window form is exact (doc_id
    tie-break)."""
    from goe_spark.operators.ranks import (
        POS,
        ntile_expr,
        with_global_positions,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    scored = d.select("doc_id", toks.alias("n_tokens"))
    positioned, n = with_global_positions(
        scored, [F.col("n_tokens").asc(), F.col("doc_id").asc()]
    )
    binned = positioned.select(
        ntile_expr(F.col(POS), n, 10).alias("bin"), "n_tokens"
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
        F.sum("n_tokens").alias("sum_tokens"),
    )


CURRICULUM_SQL = f"""
SELECT bin,
       count(*)                       AS n_docs,
       min(n_tokens)                  AS min_tokens,
       max(n_tokens)                  AS max_tokens,
       cast(sum(n_tokens) AS bigint)  AS sum_tokens
FROM (
  SELECT ntile(10) OVER (ORDER BY n_tokens, doc_id) AS bin, n_tokens
  FROM (SELECT doc_id, len({_TOKS_SQL}) AS n_tokens FROM documents)
)
GROUP BY bin
"""


QUERIES = [
    QuerySpec(
        "segment_dedup_stats",
        segment_dedup_stats,
        SEGMENT_DEDUP_SQL,
        "RefinedWeb-style boilerplate segment accounting",
    ),
    QuerySpec(
        "shard_manifest",
        shard_manifest,
        SHARD_MANIFEST_SQL,
        "deterministic hash-shard manifest",
    ),
    QuerySpec(
        "filter_funnel_report",
        filter_funnel_report,
        FILTER_FUNNEL_SQL,
        "one-scan quality-filter attrition funnel",
    ),
    QuerySpec(
        "per_source_topk_cap",
        per_source_topk_cap,
        SOURCE_CAP_SQL,
        "per-source top-k budget cap",
    ),
    QuerySpec(
        "length_curriculum_bins",
        length_curriculum_bins,
        CURRICULUM_SQL,
        "global length deciles via the distributed two-pass rank",
    ),
    QuerySpec(
        "segment_probe_new_docs",
        segment_probe_new_docs,
        SEGMENT_PROBE_SQL,
        "incremental boilerplate probe vs the materialized segment index",
    ),
]
