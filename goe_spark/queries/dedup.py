"""Deduplication operators over the documents table.

Beyond-reference scope (BASELINE.json north star). Scale notes:

- exact dedup: hash-groupBy on a 60-bit content fingerprint — one
  shuffle of (fp, doc_id), never the text payload. At 100 TB the
  shuffle carries ~16 bytes/row.
- n-gram Jaccard: MinHash-LSH band buckets generate candidates
  (bucket size tracks signature collisions, not corpus size), then
  exact set intersection over the shingle arrays scores each pair.
- MinHash-LSH and SimHash live here too (added in
  minhash_lsh_candidates / simhash_by_lang): signatures are computed
  with cross-engine md5-derived hashes so DuckDB can verify them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.catalog import load_table, pin_cpu_stage, spread
from goe_spark.functions import text as T
from goe_spark.functions.hashing import hash64, hash64_sql
from goe_spark.queries import QuerySpec

# Frequency cap that bounds the in-bucket pair expansion: an LSH band
# bucket larger than LSH_BUCKET_CAP is dropped BEFORE pair emission.
# Without the cap a bucket of near-identical boilerplate makes
# collect_set unbounded and the pair count quadratic in bucket size;
# with it the worst bucket emits at most CAP*(CAP-1)/2 pairs.
# Oversized buckets are exact-dup clusters in disguise (identical
# signatures) — those belong to exact dedup, not the near-dup pair
# generator, so recall loss is negligible. At 100 TB the cap would be
# sized from a bucket-size quantile sample; the constant keeps the
# oracle deterministic here.
LSH_BUCKET_CAP = 64


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


def _shingle_hashed(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """(doc_id, lang, source, sh): arithmetic word-3-gram shingle
    hashes, built through TWO bound-column projections (token hashes,
    then shingle hashes) so no array expression is re-evaluated per
    element — see operators.minhash.arith_shingle_hashes.

    ``docs`` overrides the catalog table (any frame with doc_id,
    lang, source, text) so pipeline stages — e.g. plans/curation.py —
    can near-dup an already-filtered subset."""
    from goe_spark.operators import minhash as MH

    d = (
        docs
        if docs is not None
        else load_table(spark, sf_dir, "documents")
    ).select("doc_id", "lang", "source", "text")
    # Shingle hashing is the CPU-heavy stage (round-8 bench: 37 s of
    # codegen on one core when the scan yields a single split).
    d = spread(d, "doc_id")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    tok_hashed = d.select(
        "doc_id", "lang", "source", MH.token_hashes(toks).alias("th")
    ).where(F.size(toks) >= 3)
    return tok_hashed.select(
        "doc_id",
        "lang",
        "source",
        MH.arith_shingle_hashes(F.col("th")).alias("sh"),
    )


def _shingle_hashed_sql() -> str:
    from goe_spark.operators import minhash as MH

    toks_sql = r"regexp_split_to_array(trim(text), '\s+')"
    th_sql = MH.token_hashes_sql(toks_sql)
    sh_sql = MH.arith_shingle_hashes_sql("th")
    return f"""
  SELECT doc_id, lang, source, {sh_sql} AS sh
  FROM (SELECT doc_id, lang, source,
               {th_sql} AS th
        FROM documents)
  WHERE len(th) >= 3
"""


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word 3-gram Jaccard near-dup, LSH-blocked: MinHash band buckets
    generate the candidate pairs (the same machinery as
    minhash_lsh_pairs), then EXACT Jaccard over the distinct shingle
    sets scores each candidate; Jaccard = |∩| / (|A| + |B| - |∩|).

    The earlier formulation blocked on (lang, source) — a corpus-slice
    cardinality key whose buckets grow linearly with the corpus, so at
    100 TB the in-bucket quadratic term explodes (the r3 verdict's
    scale-killer watchlist). LSH band buckets spread over the band-
    signature value space instead: bucket size tracks genuine
    signature collisions, not corpus size, and LSH_BUCKET_CAP bounds
    the worst bucket. Recall is now governed by the banding S-curve
    (4 bands x 4 rows: ~50% at j≈0.6, near-1 above 0.8) rather than by
    slice co-membership — the trade the reference pipeline makes at
    scale, stated here instead of hidden.

    Plan shape: signature + banding are map-side codegen; one shuffle
    groups (band, sig) buckets; pairs are emitted group-locally (no
    exploded self-join); the candidate set (small) joins back to the
    shingle arrays twice for exact verification — the verify join
    moves arrays only for candidates, never all-pairs.

    Shingles are 64-bit arithmetic hashes (operators.minhash), never
    strings, and both engines compute identical signatures so the
    DuckDB oracle agrees bit-for-bit.

    Output: candidate doc pairs with exact jaccard >= 0.1 (id1 < id2).
    """
    from goe_spark.operators import minhash as MH
    from goe_spark.operators.minhash_index import (
        ensure_signature_index,
        load_signatures,
    )

    # All three consumers (signature branch + the two verify joins)
    # read the MATERIALIZED v2 index — (doc_id, shd, mh) parquet — so
    # the md5-heavy shingle lineage is never recomputed at query time
    # and no repartition exchange is needed to share it; each consumer
    # is a column-pruned parquet scan.
    idx = load_signatures(spark, ensure_signature_index(spark, sf_dir))
    shingled = idx.select("doc_id", "shd")
    sigs = idx.select("doc_id", "mh")
    bands = sigs.select(
        "doc_id", F.explode(MH.band_structs(F.col("mh"))).alias("bs")
    ).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    grouped = bands.groupBy("band", "sig").agg(
        F.array_sort(F.collect_set("doc_id")).alias("ids")
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
    # n >= 2 guard is load-bearing with explode_outer: an empty pair
    # array would otherwise emit a (NULL, NULL) row. The upper bound
    # drops degenerate buckets (LSH_BUCKET_CAP).
    cands = (
        grouped.where((n >= 2) & (n <= LSH_BUCKET_CAP))
        .select(F.explode_outer(pair_structs).alias("p"))
        .select("p.id1", "p.id2")
        .distinct()
    )
    scored = cands.join(
        shingled.select(
            F.col("doc_id").alias("id1"), F.col("shd").alias("shd1")
        ),
        "id1",
    ).join(
        shingled.select(
            F.col("doc_id").alias("id2"), F.col("shd").alias("shd2")
        ),
        "id2",
    )
    n_common = F.size(F.array_intersect("shd1", "shd2"))
    jaccard = F.round(
        n_common / (F.size("shd1") + F.size("shd2") - n_common), 6
    )
    return (
        scored.select("id1", "id2", jaccard.alias("jaccard"))
        .where(F.col("jaccard") >= 0.1)
    )


def _ngram_jaccard_sql() -> str:
    from goe_spark.operators import minhash as MH

    mh_expr = MH.minhash_signature_sql("shd")
    return f"""
WITH shingled AS (
  SELECT doc_id, list_distinct(sh) AS shd
  FROM ({_shingle_hashed_sql()})
), sigs AS (
  SELECT doc_id, {mh_expr} AS mh FROM shingled
), bands AS ({MH.band_rows_sql("mh")}),
ok_buckets AS (
  -- band-bucket cap: mirror of LSH_BUCKET_CAP
  SELECT band, sig FROM bands GROUP BY 1, 2 HAVING count(*) <= {LSH_BUCKET_CAP}
), cands AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  JOIN ok_buckets ok ON ok.band = a.band AND ok.sig = a.sig
)
SELECT id1, id2,
       round(len(list_intersect(sa.shd, sb.shd))
             / (len(sa.shd) + len(sb.shd) - len(list_intersect(sa.shd, sb.shd))),
             6) AS jaccard
FROM cands
JOIN shingled sa ON sa.doc_id = id1
JOIN shingled sb ON sb.doc_id = id2
WHERE round(len(list_intersect(sa.shd, sb.shd))
            / (len(sa.shd) + len(sb.shd) - len(list_intersect(sa.shd, sb.shd))),
            6) >= 0.1
"""


NGRAM_JACCARD_SQL = _ngram_jaccard_sql()


def minhash_lsh_pairs(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """MinHash-LSH near-dup candidates with verified agreement.

    Plan: signatures are map-side (md5 + modular arithmetic inside
    codegen) and computed ONCE — the full K-value signature rides the
    band explode as a payload, so in-bucket pair expansion scores
    est_jaccard inline with zero signature re-joins (an earlier
    formulation recomputed the signature lineage three times and was
    2.5x slower). Shuffles: one groupBy on (band, band-signature) —
    the only blocking key at 100 TB, no quadratic term outside
    genuinely colliding buckets — plus the cross-band dedup distinct.
    """
    from goe_spark.operators import minhash as MH

    if docs is None:
        # Full-catalog run: read the materialized signature index
        # (operators/minhash_index, fingerprint-fresh) instead of
        # recomputing the md5 shingle lineage — the same persisted
        # signatures the incremental probe scans. Subset runs
        # (curation stages) compute fresh: the index covers the
        # catalog table only.
        from goe_spark.operators.minhash_index import (
            ensure_signature_index,
            load_signatures,
        )

        sigs = load_signatures(
            spark, ensure_signature_index(spark, sf_dir)
        )
    else:
        sigs = _shingle_hashed(spark, sf_dir, docs).select(
            "doc_id", MH.minhash_signature_named("sh").alias("mh")
        )
    bands = sigs.select(
        F.struct("doc_id", "mh").alias("doc"),
        F.explode(MH.band_structs(F.col("mh"))).alias("bs"),
    ).select("doc", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    grouped = bands.groupBy("band", "sig").agg(
        F.array_sort(F.collect_set("doc")).alias("docs")
    )
    n = F.size("docs")
    pair_structs = F.flatten(
        F.transform(
            F.col("docs"),
            lambda x, i: F.transform(
                F.slice(F.col("docs"), i + 2, n - i - 1),
                lambda y: F.struct(
                    x["doc_id"].alias("id1"),
                    y["doc_id"].alias("id2"),
                    F.round(
                        MH.minhash_agreement(x["mh"], y["mh"]), 6
                    ).alias("est_jaccard"),
                ),
            ),
        )
    )
    return (
        grouped.where((n >= 2) & (n <= LSH_BUCKET_CAP))
        .select(F.explode_outer(pair_structs).alias("p"))
        .select("p.id1", "p.id2", "p.est_jaccard")
        .distinct()
    )


def _minhash_lsh_sql() -> str:
    from goe_spark.operators import minhash as MH

    mh_expr = MH.minhash_signature_sql("sh")
    return f"""
WITH shingled AS ({_shingle_hashed_sql()}),
sigs AS (
  SELECT doc_id, {mh_expr} AS mh FROM shingled
),
bands AS ({MH.band_rows_sql("mh")}),
ok_buckets AS (
  -- band-bucket cap: mirror of LSH_BUCKET_CAP
  SELECT band, sig FROM bands GROUP BY 1, 2 HAVING count(*) <= {LSH_BUCKET_CAP}
),
cands AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  JOIN ok_buckets ok ON ok.band = a.band AND ok.sig = a.sig
)
SELECT id1, id2,
       round({MH.minhash_agreement_sql("s1.mh", "s2.mh")}, 6) AS est_jaccard
FROM cands
JOIN sigs s1 ON s1.doc_id = id1
JOIN sigs s2 ON s2.doc_id = id2
"""


# (bands, rows) layouts of the K_MINHASH=16 signature the LSH tuning
# sweep evaluates; all use the full signature (b*r = 16).
LSH_SWEEP_CONFIGS = ((2, 8), (4, 4), (8, 2), (16, 1))
# "true" near-dup floor for the sweep's precision/recall: >= 8 of 16
# signature components agree (est Jaccard >= 0.5)
LSH_SWEEP_MIN_MATCH = 8


def lsh_param_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH (bands x rows) TUNING TABLE — the S-curve trade every
    MinHash deployment sets by hand: more bands with fewer rows per
    band catches lower-similarity pairs (recall up, candidate volume
    and verification cost up); fewer, deeper bands demand
    near-identical signatures (precision up, recall down). Per
    layout of the SAME 16-component signatures: candidate pairs,
    true pairs among them (>= LSH_SWEEP_MIN_MATCH/16 component
    agreement), precision
    and recall per 10k (recall vs the union of true pairs ANY layout
    surfaced), and the mean component-agreement of candidates. All
    metrics are integer match counts — no floats anywhere.

    Plan: signatures come from the materialized index (one md5
    lineage, paid once); ALL layouts re-band the 16-long arrays
    map-side in one tagged explode and share ONE (layout, band, sig)
    groupBy with the same LSH_BUCKET_CAP bound as minhash_lsh_pairs —
    candidate volume stays collision-bounded per layout, and the
    full-signature agreement rides the bucket expansion inline (zero
    re-joins). The union truth set is pair-table-grain; its 1-row
    count broadcasts back (the scalar cross-join pattern)."""
    from goe_spark.operators.minhash import K_MINHASH
    from goe_spark.operators.minhash_index import (
        ensure_signature_index,
        load_signatures,
    )

    sigs = load_signatures(
        spark, ensure_signature_index(spark, sf_dir)
    ).select("doc_id", "mh")
    # ALL four layouts ride ONE tagged explode + ONE (layout, band,
    # sig) groupBy + ONE distinct instead of four independent
    # explode/shuffle chains over the same signature frame: the layout
    # columns join the grouping key, so per-layout buckets (and the
    # pairs expanded from them) are exactly the sets the per-config
    # chains produced — same rows, 4 index scans and 12 shuffles
    # collapsed to 1 and 3. The band signature is ONLY a grouping key,
    # so group on the raw signature slice (array grouping keys
    # hash/compare natively; injective either way).
    #
    # Shuffle IDS, not signatures (guide §2.3 "shuffle keys and
    # metadata instead of payloads"): the r13 shape carried the full
    # minhash array through the band exchange as a struct payload so
    # `matches` could be computed inline — 14 MB written at sf0.1 and
    # a full signature per band row at any scale. The band rows now
    # carry doc_id only (the exchange drops to ~2 MB); the
    # full-signature agreement is scored ONCE per unique candidate
    # pair by joining the deduped pair ids back to the signature
    # frame (no broadcast hint — the planner picks SMJ at scale), and
    # per-layout rows re-attach the score by (id1, id2). Same pairs,
    # same integer match counts, same output (oracle-verified).
    # the 30-struct tagged-band array is ~150 py4j round-trips to
    # build (measured 1.4 s of driver time per call) and is a pure
    # function of literals + col("mh") — memoize it per SparkContext
    # (the catalog.memo_exprs discipline the media stacks use).
    from goe_spark.catalog import memo_exprs

    band_arr = memo_exprs(
        "lsh_sweep_band_arr",
        lambda: F.array(
            *[
                F.struct(
                    F.lit(b).alias("bands"),
                    F.lit(r).alias("rows_per_band"),
                    F.lit(i).alias("band"),
                    F.slice(F.col("mh"), i * r + 1, r).alias("sig"),
                )
                for b, r in LSH_SWEEP_CONFIGS
                for i in range(b)
            ]
        ),
    )
    bands = sigs.select(
        "doc_id",
        F.explode(band_arr).alias("bs"),
    ).select(
        "doc_id",
        F.col("bs.bands").alias("bands"),
        F.col("bs.rows_per_band").alias("rows_per_band"),
        F.col("bs.band").alias("band"),
        F.col("bs.sig").alias("sig"),
    )
    grouped = bands.groupBy("bands", "rows_per_band", "band", "sig").agg(
        F.array_sort(F.collect_set("doc_id")).alias("ids")
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
    allp = (
        grouped.where((n >= 2) & (n <= LSH_BUCKET_CAP))
        .select(
            "bands",
            "rows_per_band",
            F.explode_outer(pair_structs).alias("p"),
        )
        .select("bands", "rows_per_band", "p.id1", "p.id2")
        .distinct()
        # the per-layout pair set feeds BOTH the unique-pair scoring
        # join and the per-layout rollup; the checkpoint materializes
        # the bucket agg + pair expansion + distinct once (the r13
        # lesson: exchange reuse alone re-ran the post-exchange
        # machinery per consumer).
        .localCheckpoint(eager=False)
    )
    # score each UNIQUE pair once (the r13 shape re-scored a pair per
    # layout it appeared in); `matches` is a pure function of the two
    # signatures, so re-attaching by (id1, id2) is exact.
    scored = (
        allp.select("id1", "id2")
        .distinct()
        .join(
            sigs.select(
                F.col("doc_id").alias("id1"), F.col("mh").alias("mh1")
            ),
            "id1",
        )
        .join(
            sigs.select(
                F.col("doc_id").alias("id2"), F.col("mh").alias("mh2")
            ),
            "id2",
        )
        .select(
            "id1",
            "id2",
            F.size(
                F.filter(
                    F.zip_with(
                        F.col("mh1"), F.col("mh2"), lambda p, q: p == q
                    ),
                    lambda v: v,
                )
            ).alias("matches"),
        )
        # NOT checkpointed: both consumers re-run only the cheap
        # sig-join over allp's checkpointed blocks (~0.3 s exec),
        # while a checkpoint costs a full plan-compile round on the
        # driver (~1 s/call, measured) — the opposite trade from allp.
    )
    good = F.col("matches") >= LSH_SWEEP_MIN_MATCH
    truth = scored.where(good).agg(
        F.count(F.lit(1)).alias("n_truth_pairs")
    )
    per_cfg = (
        allp.join(scored, ["id1", "id2"])
        .groupBy("bands", "rows_per_band")
        .agg(
            F.count(F.lit(1)).alias("n_candidate_pairs"),
            F.sum(good.cast("long")).alias("n_good_pairs"),
            F.sum("matches").alias("sum_matches"),
        )
    )
    # A layout with ZERO candidates produces no group — left-join a
    # layout dim so every layout still gets its row (count 0, NULL
    # rates), exactly what the oracle's GROUP-BY-less per-layout
    # aggregates emit over an empty candidate set.
    layout_dim = spark.createDataFrame(
        list(LSH_SWEEP_CONFIGS), "bands int, rows_per_band int"
    )
    per_cfg = layout_dim.join(
        per_cfg, ["bands", "rows_per_band"], "left"
    ).withColumn(
        "n_candidate_pairs",
        F.coalesce("n_candidate_pairs", F.lit(0)).cast("long"),
    )
    np = F.col("n_candidate_pairs")
    return per_cfg.crossJoin(F.broadcast(truth)).select(
        "bands",
        "rows_per_band",
        "n_candidate_pairs",
        "n_good_pairs",
        F.when(np > 0, F.floor(F.col("n_good_pairs") * 10000 / np))
        .cast("long")
        .alias("precision_per_10k"),
        "n_truth_pairs",
        F.when(
            F.col("n_truth_pairs") > 0,
            F.floor(
                F.col("n_good_pairs") * 10000 / F.col("n_truth_pairs")
            ),
        )
        .cast("long")
        .alias("recall_per_10k"),
        F.when(
            np > 0,
            F.floor(F.col("sum_matches") * 10000 / (np * K_MINHASH)),
        )
        .cast("long")
        .alias("mean_matches_q4"),
    )


def _lsh_sweep_sql() -> str:
    from goe_spark.operators import minhash as MH

    mh_expr = MH.minhash_signature_sql("sh")
    matches = (
        "len(list_filter(list_zip(s1.mh, s2.mh), p -> p[1] = p[2]))"
    )
    ctes = [
        f"shingled AS ({_shingle_hashed_sql()})",
        f"sigs AS (SELECT doc_id, {mh_expr} AS mh FROM shingled)",
    ]
    m_sel = []
    goods = []
    for b, r in LSH_SWEEP_CONFIGS:
        tag = f"b{b}r{r}"
        slices = " UNION ALL ".join(
            f"SELECT doc_id, {i} AS band, "
            f"array_to_string(list_slice(mh, {i * r + 1}, {(i + 1) * r}),"
            f" ':') AS sig FROM sigs"
            for i in range(b)
        )
        ctes.append(f"bands_{tag} AS ({slices})")
        ctes.append(
            f"""ok_{tag} AS (
  SELECT band, sig FROM bands_{tag} GROUP BY 1, 2
  HAVING count(*) >= 2 AND count(*) <= {LSH_BUCKET_CAP}
)"""
        )
        ctes.append(
            f"""pairs_{tag} AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM bands_{tag} a JOIN bands_{tag} b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  JOIN ok_{tag} ok ON ok.band = a.band AND ok.sig = a.sig
)"""
        )
        ctes.append(
            f"""scored_{tag} AS (
  SELECT id1, id2, {matches} AS matches
  FROM pairs_{tag}
  JOIN sigs s1 ON s1.doc_id = id1
  JOIN sigs s2 ON s2.doc_id = id2
)"""
        )
        m_sel.append(
            f"""SELECT {b} AS bands, {r} AS rows_per_band,
       count(*) AS n_candidate_pairs,
       cast(sum(CASE WHEN matches >= {LSH_SWEEP_MIN_MATCH}
                     THEN 1 ELSE 0 END) AS bigint) AS n_good_pairs,
       cast(sum(matches) AS bigint) AS sum_matches
FROM scored_{tag}"""
        )
        goods.append(
            f"SELECT id1, id2 FROM scored_{tag}"
            f" WHERE matches >= {LSH_SWEEP_MIN_MATCH}"
        )
    ctes.append(
        "truth AS (SELECT count(*) AS n_truth_pairs FROM ("
        "SELECT DISTINCT id1, id2 FROM ("
        + " UNION ALL ".join(goods)
        + ")))"
    )
    ctes.append(
        "per_cfg AS (" + "\nUNION ALL\n".join(m_sel) + ")"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT bands, rows_per_band, n_candidate_pairs, n_good_pairs,
       cast(CASE WHEN n_candidate_pairs > 0 THEN
         floor(n_good_pairs * 10000.0 / n_candidate_pairs)
       END AS bigint) AS precision_per_10k,
       n_truth_pairs,
       cast(CASE WHEN n_truth_pairs > 0 THEN
         floor(n_good_pairs * 10000.0 / n_truth_pairs)
       END AS bigint) AS recall_per_10k,
       cast(CASE WHEN n_candidate_pairs > 0 THEN
         floor(sum_matches * 10000.0
               / (n_candidate_pairs * {MH.K_MINHASH}))
       END AS bigint) AS mean_matches_q4
FROM per_cfg CROSS JOIN truth
"""
    )


# est-Jaccard cutoffs the sensitivity sweep evaluates — exact
# multiples of 1/16 (the signature grid), so every comparison is an
# exact double comparison in both engines.
DEDUP_SENS_THRESHOLDS = (0.5, 0.625, 0.75, 0.875)


def dedup_threshold_sensitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Near-dup THRESHOLD sensitivity — what a curator reads before
    fixing the dedup cutoff: per candidate est-Jaccard threshold,
    how many LSH pairs qualify, how many docs are involved, how many
    docs a pairwise keep-first pass would drop (the max-id side of
    >= 1 qualifying pair), and the token mass those losers carry.
    A cliff between two thresholds = a large near-dup family sitting
    at that similarity; a flat curve = the cutoff barely matters.

    Determinism: est_jaccard values are exact multiples of 1/16
    (match-count / K), and the sweep thresholds are on the same grid,
    so comparisons are exact in both engines. Plan: ONE pair
    generation (the capped LSH job), a 4-element literal explode
    over the pair table, distinct losers at (threshold, doc) grain,
    one broadcast-size token join — nothing corpus-scale beyond the
    signature lineage the index already materializes."""
    pairs = minhash_lsh_pairs(spark, sf_dir).localCheckpoint(eager=True)
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", T.token_count("text").alias("n_tokens")
    )
    sweep = pairs.select(
        "id1",
        "id2",
        "est_jaccard",
        F.explode(
            F.array(*[F.lit(t) for t in DEDUP_SENS_THRESHOLDS])
        ).alias("threshold"),
    ).where(F.col("est_jaccard") >= F.col("threshold"))
    per_t = sweep.groupBy("threshold").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    losers = (
        sweep.select(
            "threshold", F.greatest("id1", "id2").alias("doc_id")
        )
        .distinct()
        .join(toks, "doc_id")
        .groupBy("threshold")
        .agg(
            F.count(F.lit(1)).alias("n_loser_docs"),
            F.sum("n_tokens").alias("tokens_at_risk"),
        )
    )
    involved = (
        sweep.select(
            "threshold", F.explode(F.array("id1", "id2")).alias("doc_id")
        )
        .distinct()
        .groupBy("threshold")
        .agg(F.count(F.lit(1)).alias("n_docs_involved"))
    )
    return (
        per_t.join(involved, "threshold", "left")
        .join(losers, "threshold", "left")
        .select(
            F.round("threshold", 3).alias("threshold_q3"),
            "n_pairs",
            F.coalesce("n_docs_involved", F.lit(0))
            .cast("long")
            .alias("n_docs_involved"),
            F.coalesce("n_loser_docs", F.lit(0))
            .cast("long")
            .alias("n_loser_docs"),
            F.coalesce("tokens_at_risk", F.lit(0))
            .cast("long")
            .alias("tokens_at_risk"),
        )
    )


def _dedup_sensitivity_sql() -> str:
    thr = ", ".join(f"({t})" for t in DEDUP_SENS_THRESHOLDS)
    return f"""
WITH lsh AS ({_minhash_lsh_sql()}),
toks AS (
  SELECT doc_id, {T.token_count_sql('text')} AS n_tokens FROM documents
), sweep AS (
  SELECT id1, id2, est_jaccard, t.threshold
  FROM lsh CROSS JOIN (VALUES {thr}) AS t(threshold)
  WHERE est_jaccard >= t.threshold
), per_t AS (
  SELECT threshold, count(*) AS n_pairs FROM sweep GROUP BY threshold
), losers AS (
  SELECT threshold,
         count(*) AS n_loser_docs,
         cast(sum(n_tokens) AS bigint) AS tokens_at_risk
  FROM (SELECT DISTINCT threshold, greatest(id1, id2) AS doc_id
        FROM sweep)
  JOIN toks USING (doc_id)
  GROUP BY threshold
), involved AS (
  SELECT threshold, count(*) AS n_docs_involved FROM (
    SELECT DISTINCT threshold, doc_id FROM (
      SELECT threshold, id1 AS doc_id FROM sweep
      UNION ALL SELECT threshold, id2 FROM sweep
    )
  ) GROUP BY threshold
)
SELECT round(p.threshold, 3) AS threshold_q3,
       p.n_pairs,
       cast(coalesce(i.n_docs_involved, 0) AS bigint) AS n_docs_involved,
       cast(coalesce(l.n_loser_docs, 0) AS bigint) AS n_loser_docs,
       cast(coalesce(l.tokens_at_risk, 0) AS bigint) AS tokens_at_risk
FROM per_t p
LEFT JOIN involved i USING (threshold)
LEFT JOIN losers l USING (threshold)
"""


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 60-bit signatures over token hashes, all
    pairs with hamming distance <= 3 (Manku et al., WWW'07).

    The signature is a pure map-side expression. Candidate generation
    bands the signature into 4 x 15-bit blocks: a pair within hamming
    3 must agree exactly on >= 1 block (pigeonhole), so bucketing on
    (band, band value) is LOSSLESS while the bucket key spreads over
    the 15-bit value space — unlike the earlier (lang, source)
    blocking, bucket size no longer scales with corpus-level slice
    cardinality, so the in-bucket pair expansion stays bounded at
    100 TB. Pairs are emitted group-locally (no exploded self-join);
    the full signature rides the band explode so hamming is computed
    inline with no signature re-join. The DuckDB oracle is the
    brute-force all-pairs join — the hash match doubles as a proof
    the banding lost no pair at test scale.

    Signatures come from the MATERIALIZED v3 index (one long per
    doc, computed once per corpus fingerprint alongside the MinHash
    columns) — round-8 bench caught this query as the last near-dup
    operator recomputing its signature from raw text per run (2.1 s
    vs 0.6-0.9 s for the index-backed siblings). Like the whole
    shingle lineage, the index covers docs with >= 3 tokens (the
    shingle-ability floor); the oracle applies the same filter.
    """
    from goe_spark.operators import minhash as MH
    from goe_spark.operators.minhash_index import (
        ensure_signature_index,
        load_signatures,
    )

    sigs = load_signatures(
        spark, ensure_signature_index(spark, sf_dir)
    ).select("doc_id", F.col("sim").alias("simhash"))
    bands = sigs.select(
        F.struct("doc_id", "simhash").alias("doc"),
        F.explode(MH.simhash_band_structs(F.col("simhash"))).alias("bs"),
    ).select("doc", F.col("bs.band").alias("band"), F.col("bs.val").alias("val"))
    grouped = bands.groupBy("band", "val").agg(
        F.array_sort(F.collect_set("doc")).alias("docs")
    )
    n = F.size("docs")
    pair_structs = F.flatten(
        F.transform(
            F.col("docs"),
            lambda x, i: F.transform(
                F.slice(F.col("docs"), i + 2, n - i - 1),
                lambda y: F.struct(
                    x["doc_id"].alias("id1"),
                    y["doc_id"].alias("id2"),
                    MH.hamming(x["simhash"], y["simhash"]).alias("hamming"),
                ),
            ),
        )
    )
    return (
        grouped.where(n >= 2)
        .select(F.explode_outer(pair_structs).alias("p"))
        .select("p.id1", "p.id2", "p.hamming")
        .where(F.col("hamming") <= MH.SIMHASH_BANDS - 1)
        .distinct()
    )


def _simhash_sql() -> str:
    from goe_spark.operators import minhash as MH

    sig = MH.simhash_signature_sql("th")
    toks_sql = r"regexp_split_to_array(trim(text), '\s+')"
    th_sql = MH.token_hashes_sql(toks_sql)
    return f"""
WITH sigs AS (
  SELECT doc_id, {sig} AS simhash
  FROM (SELECT doc_id,
               {th_sql} AS th
        FROM documents)
  WHERE len(th) >= 3
)
SELECT a.doc_id AS id1, b.doc_id AS id2,
       {MH.hamming_sql("a.simhash", "b.simhash")} AS hamming
FROM sigs a JOIN sigs b
  ON a.doc_id < b.doc_id
WHERE {MH.hamming_sql("a.simhash", "b.simhash")} <= {MH.SIMHASH_BANDS - 1}
"""


def cross_doc_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span coverage — the ExactSubstr-dedup
    diagnostic (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): per document, the fraction of its
    distinct word-3-gram shingles that also occur in at least one
    OTHER document, rolled up per source. High coverage flags
    boilerplate-heavy slices before near-dup pair mining even runs.

    Plan shape (verified via .explain): shingles are the 8-byte
    arithmetic hashes from operators.minhash — no n-gram strings ever
    shuffle. The gram-hash frame is checkpointed so the tokenize+md5
    shingle pass runs ONCE and both consumers (the doc-frequency
    aggregate and the coverage join probe) read the materialization —
    the staged-gram-table layout a real 100 TB run would use, rather
    than the single-pass window formulation (count over partition by
    gram), whose WindowExec buffers an entire stop-gram partition in
    one task. At report SF the aggregate output broadcasts into the
    coverage join; at corpus scale AQE plans it as a hash join over
    gram-hash exchanges and splits stop-gram skew.
    The per-doc and per-source rollups shuffle doc- and
    source-cardinality rows respectively.

    The >= 50% "high-coverage" flag compares 2*n_dup >= n_grams in
    integer arithmetic so both engines agree without a float
    threshold.
    """
    grams = (
        _shingle_hashed(spark, sf_dir)
        .select(
            "doc_id",
            "source",
            F.explode(F.array_distinct("sh")).alias("g"),
        )
        # Both consumers (the doc-frequency aggregate and the coverage
        # join probe) read the SAME gram rows; without the checkpoint
        # each is planned as its own scan and the tokenize+md5 shingle
        # pass runs twice. Checkpointing the 3-column hash frame
        # (8-byte gram hashes + ids, never text) halves the heavy
        # pass; the doc-frequency aggregate then exchanges only these
        # hash rows and broadcasts back. Per-invocation only — cleared
        # between bench queries; at 100 TB this is the staged gram
        # table the docstring already prescribes.
        .localCheckpoint(eager=True)
    )
    gram_docs = grams.groupBy("g").agg(F.count(F.lit(1)).alias("nd"))
    per_doc = (
        grams.join(gram_docs, "g")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("nd") >= 2).cast("long")).alias("n_dup"),
        )
    )
    frac = F.col("n_dup") / F.col("n_grams")
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_grams").alias("total_grams"),
        F.sum("n_dup").alias("dup_grams"),
        F.round(F.avg(frac), 6).alias("avg_dup_frac"),
        F.sum((F.col("n_dup") * 2 >= F.col("n_grams")).cast("long")).alias(
            "n_high_dup"
        ),
    )


CROSS_DOC_NGRAM_SQL = f"""
WITH shingled AS ({_shingle_hashed_sql()}),
grams AS (
  SELECT doc_id, source, unnest(list_distinct(sh)) AS g FROM shingled
), gram_docs AS (
  SELECT g, count(*) AS nd FROM grams GROUP BY g
), per_doc AS (
  SELECT gr.doc_id, gr.source,
         count(*) AS n_grams,
         sum(CASE WHEN gd.nd >= 2 THEN 1 ELSE 0 END) AS n_dup
  FROM grams gr JOIN gram_docs gd ON gr.g = gd.g
  GROUP BY 1, 2
)
SELECT source,
       count(*)                      AS n_docs,
       cast(sum(n_grams) AS bigint)  AS total_grams,
       cast(sum(n_dup) AS bigint)    AS dup_grams,
       round(avg(n_dup / cast(n_grams AS double)), 6) AS avg_dup_frac,
       cast(sum(CASE WHEN n_dup * 2 >= n_grams THEN 1 ELSE 0 END) AS bigint)
                                     AS n_high_dup
FROM per_doc GROUP BY source
"""


def corpus_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-saturation curve: treating doc_id as crawl order, what
    fraction of each decile's distinct word-3-gram shingles is NOVEL
    (first seen in that document — no smaller doc_id contains it)?
    A flattening novelty curve is the curator's 'more crawling buys
    little new data' signal; a late-decile novelty spike flags a new
    content source entering the crawl. Per doc_id decile: docs,
    distinct grams, novel grams, novelty per 10k.

    Plan: per-doc distinct shingles (the _shingle_hashed bound-column
    lineage), one gram-grain groupBy for min(doc_id) — first-seen
    attribution without posting lists — then a 1:1 join back and a
    10-row decile rollup. The decile edge rides a driver-inlined
    max(doc_id) scalar (one bounded 1-row aggregate, the BPE-argmax
    pattern) so no global window and no broadcast-scalar nested loop
    exists in the plan."""
    d = load_table(spark, sf_dir, "documents")
    max_id = int(d.agg(F.max("doc_id")).first()[0])
    grams = _shingle_hashed(spark, sf_dir).select(
        "doc_id", F.explode(F.array_distinct("sh")).alias("g")
    )
    first_seen = grams.groupBy("g").agg(F.min("doc_id").alias("fs"))
    per_doc = (
        grams.join(first_seen, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("fs") == F.col("doc_id")).cast("long")).alias(
                "n_novel"
            ),
        )
    )
    bucket = F.least(
        F.lit(9), F.floor(F.col("doc_id") * 10 / (max_id + 1))
    ).cast("int")
    return per_doc.groupBy(bucket.alias("decile")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_grams").alias("total_grams"),
        F.sum("n_novel").alias("novel_grams"),
        F.floor(F.sum("n_novel") * 10000 / F.sum("n_grams"))
        .cast("long")
        .alias("novelty_per_10k"),
    )


def _novelty_curve_sql() -> str:
    return f"""
WITH shingled AS ({_shingle_hashed_sql()}),
grams AS (
  SELECT doc_id, unnest(list_distinct(sh)) AS g FROM shingled
), first_seen AS (
  SELECT g, min(doc_id) AS fs FROM grams GROUP BY g
), per_doc AS (
  SELECT gr.doc_id,
         count(*) AS n_grams,
         sum(CASE WHEN f.fs = gr.doc_id THEN 1 ELSE 0 END) AS n_novel
  FROM grams gr JOIN first_seen f USING (g)
  GROUP BY gr.doc_id
), edge AS (SELECT max(doc_id) AS mx FROM documents)
SELECT cast(least(9, (doc_id * 10) // (mx + 1)) AS int) AS decile,
       count(*) AS n_docs,
       cast(sum(n_grams) AS bigint) AS total_grams,
       cast(sum(n_novel) AS bigint) AS novel_grams,
       cast(floor(sum(n_novel) * 10000 / (1.0 * sum(n_grams)))
            AS bigint) AS novelty_per_10k
FROM per_doc, edge GROUP BY 1
"""


def _span_cuts(d: DataFrame, min_run: int = 1) -> DataFrame:
    """(doc_id, cut_idxs, n_cut): the 0-BASED token positions each
    document loses under ExactSubstr-style cross-doc duplicated-span
    removal with keep-first semantics (Lee et al. 2022's destructive
    counterpart to the cross_doc_ngram_coverage diagnostic, at
    word-3-gram grain): a shingle occurring in >= 2 distinct docs is
    OWNED by its min-doc_id occurrence; in every other doc the three
    token positions it covers are cut. Within-doc repeats are not cut
    (cross-doc removal), and the owner doc keeps its own copy of the
    grams it owns. NOTE the keep-first guarantee is per-GRAM, not
    per-SPAN: when duplicated 3-grams with different owners overlap,
    a position the doc owns through one gram can still be cut by a
    neighbouring gram owned elsewhere, so a span can disappear from
    every document (doc1='a b c x', doc2='a b c d e', doc3='b c d e
    z': doc2 owns (b,c,d) yet loses positions 0-2 to doc1's (a,b,c),
    and doc3 loses its copy too — 'b c d' survives nowhere).
    Full reconstructibility of removed mass therefore holds only for
    duplicated spans that do not overlap distinct-owner grams; see
    tests/test_curation.py::test_span_scrub_overlapping_owners.

    min_run > 1 is Lee et al.'s actual minimum-span threshold: a
    candidate position is cut only when it sits in a maximal run of
    >= min_run consecutive candidate positions, so short incidental
    overlaps (idioms, boilerplate fragments) survive and only long
    duplicated spans are scrubbed. min_run=1 is the aggressive
    every-position behaviour and takes the window-free fast path.

    Plan: token/shingle hashing in two bound-column projections (the
    O(n^2)-inlining discipline of operators/minhash.py); the gram
    stats groupBy uses min/max(doc_id) — cross-doc iff min != max, no
    count-distinct, no posting-list collect; the occurrence-vs-owner
    join fans out 1:1 (gram grain on one side), stop-gram skew is
    AQE's skew-join case; the cut set aggregates to (doc,
    positions) — bounded by duplicated-occurrence volume, tiny next
    to the corpus. The min_run path adds one (doc_id, i) distinct +
    two DOC-partitioned windows (gaps-and-islands run length) over
    cut-candidate rows only — never corpus-grain."""
    from goe_spark.catalog import spread
    from goe_spark.operators import minhash as MH

    base = spread(d.select("doc_id", "text"), "doc_id")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    th_df = (
        base.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= 3)
        .select("doc_id", MH.token_hashes(F.col("toks")).alias("th"))
    )
    # DOC-grain checkpoint of the gram-hash arrays: occ feeds both
    # the gram-stats aggregate and the probe side of the fan-out
    # join, so without a barrier the md5 token hashing runs once per
    # branch (measured: two ~11 s-CPU stages per span query). A
    # checkpoint of the exploded corpus-POSITION rows was measured
    # (r13) and REVERTED (+0.7 s: materializing 1.5M rows cost more
    # than the saved pass); checkpointing BEFORE the explode stores
    # one array row per doc — the same bytes the md5 pass reads —
    # and both branches still explode lazily, so the aggregate
    # branch keeps its map-side partial aggregation on never-
    # materialized rows. Lazy (eager=False): the first action
    # materializes it; no extra job.
    sh_df = (
        th_df.select(
            "doc_id", MH.arith_shingle_hashes(F.col("th")).alias("sh")
        )
        .localCheckpoint(eager=False)
    )
    # posexplode_OUTER: the non-outer Generate injects an implicit
    # size(sh) > 0 predicate that projection collapse inlines as a
    # full md5-bearing Filter below the hashing projections (the
    # md5-in-Filter hazard) — outer adds no predicate, and empty sh
    # cannot occur past the size(toks) >= 3 guard; the g-isnotnull
    # the joins need is a cheap filter on the GENERATED attribute.
    occ = sh_df.select(
        "doc_id", F.posexplode_outer("sh").alias("pos", "g")
    ).where(F.col("g").isNotNull())
    dup_g = (
        occ.groupBy("g")
        .agg(F.min("doc_id").alias("owner"), F.max("doc_id").alias("mx"))
        .where(F.col("owner") != F.col("mx"))
        .select("g", "owner")
    )
    cand = (
        occ.join(dup_g, "g")
        .where(F.col("doc_id") != F.col("owner"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + 2)
            ).alias("i"),
        )
    )
    if min_run <= 1:
        return cand.groupBy("doc_id").agg(
            F.collect_set("i").alias("cut_idxs"),
            F.count_distinct("i").alias("n_cut"),
        )
    from pyspark.sql.window import Window

    w_ord = Window.partitionBy("doc_id").orderBy("i")
    w_run = Window.partitionBy("doc_id", "grp")
    return (
        cand.distinct()
        .withColumn("grp", F.col("i") - F.row_number().over(w_ord))
        .withColumn("run_len", F.count(F.lit(1)).over(w_run))
        .where(F.col("run_len") >= min_run)
        .groupBy("doc_id")
        .agg(
            F.collect_set("i").alias("cut_idxs"),
            F.count(F.lit(1)).alias("n_cut"),
        )
    )


def span_run_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-RUN length distribution — the diagnostic that picks
    an ExactSubstr minimum-span threshold (Lee et al. cut 50-token
    runs; cutting every duplicated 3-gram position, as SPAN_SCRUB
    does, is the aggressive end): consecutive cut positions within a
    doc coalesce into runs, reported per source as run counts by
    length bucket (1-2 / 3-7 / 8-31 / 32+), the longest run, and the
    token mass sitting in runs of 8+ — if most duplicated mass is in
    long runs, a conservative threshold still reclaims it.

    Plan: rides _span_cuts; runs come from the classic gaps-and-
    islands trick (pos - row_number per doc) with the window
    partitioned at DOC grain (never corpus); rollups are source-grain.
    """
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    cuts = _span_cuts(d).select(
        "doc_id", F.explode("cut_idxs").alias("i")
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    runs = (
        cuts.withColumn("grp", F.col("i") - F.row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    per = runs.join(
        d.select("doc_id", "source"), "doc_id"
    )
    rl = F.col("run_len")
    return per.groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_docs_touched"),
        F.count(F.lit(1)).alias("n_runs"),
        F.sum("run_len").alias("tokens_cut"),
        F.max("run_len").alias("max_run_len"),
        F.sum((rl <= 2).cast("long")).alias("runs_1_2"),
        F.sum(((rl >= 3) & (rl <= 7)).cast("long")).alias("runs_3_7"),
        F.sum(((rl >= 8) & (rl <= 31)).cast("long")).alias("runs_8_31"),
        F.sum((rl >= 32).cast("long")).alias("runs_32p"),
        F.sum(F.when(rl >= 8, rl).otherwise(0)).alias(
            "tokens_in_runs_8p"
        ),
    )


def _span_run_sql() -> str:
    from goe_spark.operators import minhash as MH

    toks_sql = r"regexp_split_to_array(trim(text), '\s+')"
    return f"""
WITH base AS (
  SELECT doc_id, source, {toks_sql} AS toks FROM documents
), th AS (
  SELECT doc_id, {MH.token_hashes_sql('toks')} AS th
  FROM base WHERE len(toks) >= 3
), shd AS (
  SELECT doc_id, {MH.arith_shingle_hashes_sql('th')} AS sh FROM th
), occ AS (
  SELECT doc_id, unnest(sh) AS g, generate_subscripts(sh, 1) AS pos
  FROM shd
), gs AS (
  SELECT g, min(doc_id) AS owner
  FROM occ GROUP BY g HAVING min(doc_id) <> max(doc_id)
), cuts AS (
  SELECT DISTINCT o.doc_id, i FROM (
    SELECT o.doc_id, unnest([o.pos, o.pos + 1, o.pos + 2]) AS i
    FROM occ o JOIN gs ON gs.g = o.g
    WHERE o.doc_id <> gs.owner
  ) o
), runs AS (
  SELECT doc_id, grp, count(*) AS run_len FROM (
    SELECT doc_id, i,
           i - row_number() OVER (PARTITION BY doc_id ORDER BY i)
             AS grp
    FROM cuts
  ) GROUP BY doc_id, grp
), per AS (
  SELECT r.doc_id, b.source, r.run_len
  FROM runs r JOIN base b USING (doc_id)
)
SELECT source,
       count(DISTINCT doc_id) AS n_docs_touched,
       count(*) AS n_runs,
       cast(sum(run_len) AS bigint) AS tokens_cut,
       cast(max(run_len) AS bigint) AS max_run_len,
       cast(sum(CASE WHEN run_len <= 2 THEN 1 ELSE 0 END) AS bigint)
         AS runs_1_2,
       cast(sum(CASE WHEN run_len BETWEEN 3 AND 7 THEN 1 ELSE 0 END)
            AS bigint) AS runs_3_7,
       cast(sum(CASE WHEN run_len BETWEEN 8 AND 31 THEN 1 ELSE 0 END)
            AS bigint) AS runs_8_31,
       cast(sum(CASE WHEN run_len >= 32 THEN 1 ELSE 0 END) AS bigint)
         AS runs_32p,
       cast(sum(CASE WHEN run_len >= 8 THEN run_len ELSE 0 END)
            AS bigint) AS tokens_in_runs_8p
FROM per GROUP BY source
"""


# Minimum-run threshold the THRESHOLDED span-scrub audit (and the
# curation stage's --span-min-run default recommendation) uses: the
# span_run_stats 8-31 bucket boundary — long enough that idioms and
# short boilerplate fragments (runs 1-7) survive, short enough that
# real duplicated passages are still reclaimed (Lee et al. used
# 50 BPE tokens on web-scale corpora; 8 word-tokens is the same
# knee on the small fixtures' run-length distribution).
SPAN_AUDIT_MIN_RUN = 8


def span_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruction accounting for cross-doc duplicated-span
    removal (the destructive ExactSubstr twin of
    cross_doc_ngram_coverage) per source: docs, token mass in, docs
    touched by a cut, tokens cut, docs fully emptied (every token
    inside a cross-doc duplicated span), and surviving token mass —
    exactly what plans/curation.py's SPAN_SCRUB stage removes, so a
    curator can audit the stage's bias before running it.

    Plan: rides _span_cuts (gram-grain min/max stats, 1:1 fan-out
    join, doc-grain cut sets); the accounting is one source-grain
    rollup over doc-grain rows."""
    return _span_scrub_accounting(spark, sf_dir, min_run=1)


def span_scrub_thresholded_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """span_scrub_stats under the Lee-et-al. minimum-span threshold
    (min_run={SPAN_AUDIT_MIN_RUN}): only maximal runs of >=
    SPAN_AUDIT_MIN_RUN consecutive duplicated positions are cut, so
    the report shows what the PRODUCTION setting of the SPAN_SCRUB
    stage (--span-min-run) would remove — the conservative
    counterpart the round-12 span_run_stats diagnostic exists to
    calibrate. Compare tokens_cut here vs span_scrub_stats to see
    the mass short incidental overlaps contribute.

    Plan: same shape as span_scrub_stats plus the doc-partitioned
    gaps-and-islands windows of _span_cuts(min_run>1) — windows run
    over cut-candidate rows only, never the corpus."""
    return _span_scrub_accounting(
        spark, sf_dir, min_run=SPAN_AUDIT_MIN_RUN
    )


def _span_scrub_accounting(
    spark: SparkSession, sf_dir: str, min_run: int
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    cuts = _span_cuts(d, min_run=min_run)
    per_doc = d.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_toks"),
    ).join(cuts.select("doc_id", "n_cut"), "doc_id", "left")
    n_cut = F.coalesce("n_cut", F.lit(0))
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("tokens_in"),
        F.sum((n_cut > 0).cast("long")).alias("docs_touched"),
        F.sum(n_cut).alias("tokens_cut"),
        F.sum((n_cut == F.col("n_toks")).cast("long")).alias(
            "docs_emptied"
        ),
        F.sum(F.col("n_toks") - n_cut).alias("tokens_kept"),
    )


def _span_scrub_sql(min_run: int = 1) -> str:
    from goe_spark.operators import minhash as MH

    toks_sql = r"regexp_split_to_array(trim(text), '\s+')"
    if min_run <= 1:
        cut_per_doc = (
            "SELECT doc_id, count(DISTINCT i) AS n_cut"
            " FROM cuts GROUP BY doc_id"
        )
    else:
        # gaps-and-islands over DISTINCT candidate positions, cut
        # only runs >= min_run — the DuckDB twin of
        # _span_cuts(min_run>1)'s doc-partitioned windows.
        cut_per_doc = f"""SELECT doc_id, count(*) AS n_cut FROM (
    SELECT doc_id, grp,
           count(*) OVER (PARTITION BY doc_id, grp) AS run_len
    FROM (
      SELECT doc_id, i,
             i - row_number() OVER (PARTITION BY doc_id ORDER BY i)
               AS grp
      FROM (SELECT DISTINCT doc_id, i FROM cuts)
    )
  ) WHERE run_len >= {min_run} GROUP BY doc_id"""
    return f"""
WITH base AS (
  SELECT doc_id, source, {toks_sql} AS toks FROM documents
), th AS (
  SELECT doc_id, {MH.token_hashes_sql('toks')} AS th
  FROM base WHERE len(toks) >= 3
), shd AS (
  SELECT doc_id, {MH.arith_shingle_hashes_sql('th')} AS sh FROM th
), occ AS (
  SELECT doc_id, unnest(sh) AS g, generate_subscripts(sh, 1) AS pos
  FROM shd
), gs AS (
  SELECT g, min(doc_id) AS owner
  FROM occ GROUP BY g HAVING min(doc_id) <> max(doc_id)
), cuts AS (
  SELECT o.doc_id, unnest([o.pos, o.pos + 1, o.pos + 2]) AS i
  FROM occ o JOIN gs ON gs.g = o.g
  WHERE o.doc_id <> gs.owner
), cut_per_doc AS (
  {cut_per_doc}
), per_doc AS (
  SELECT b.doc_id, b.source, len(b.toks) AS n_toks,
         coalesce(c.n_cut, 0) AS n_cut
  FROM base b LEFT JOIN cut_per_doc c USING (doc_id)
)
SELECT source,
       count(*) AS n_docs,
       cast(sum(n_toks) AS bigint) AS tokens_in,
       cast(sum(CASE WHEN n_cut > 0 THEN 1 ELSE 0 END) AS bigint)
         AS docs_touched,
       cast(sum(n_cut) AS bigint) AS tokens_cut,
       cast(sum(CASE WHEN n_cut = n_toks THEN 1 ELSE 0 END) AS bigint)
         AS docs_emptied,
       cast(sum(n_toks - n_cut) AS bigint) AS tokens_kept
FROM per_doc GROUP BY source
"""


TOP_DUP_NGRAMS_K = 20


def top_duplicate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-span heavy hitters: the {TOP_DUP_NGRAMS_K} word
    trigrams appearing in the most documents, with the gram TEXT for
    human inspection (curation pipelines eyeball exactly this list to
    write boilerplate strip rules).

    This query materializes gram strings — the thing the dedup family
    otherwise avoids — because the OUTPUT is text. The cost is
    contained: per-doc distinct trigram strings partial-aggregate
    map-side before the single gram shuffle, and the top-k is
    TakeOrdered (no global sort). At 100 TB you'd hash-group first
    and resolve text for the top candidates only; at report
    cardinality (k=20) the direct string group is one shuffle of
    short strings and keeps the oracle exact. Tie-break: doc
    frequency DESC, gram ASC — fully deterministic.
    """
    d = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
    )
    toks = T.tokens("text")
    n = F.size(toks)
    tri = F.transform(
        F.sequence(F.lit(0), n - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
            F.element_at(toks, i + 3),
        ),
    )
    grams = (
        d.where(n >= 3)
        .select("doc_id", F.explode(F.array_distinct(tri)).alias("gram"))
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), F.col("gram"))
        .limit(TOP_DUP_NGRAMS_K)
    )


TOP_DUP_NGRAMS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {T.tokens_sql('text')} AS tk FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(len(tk) - 2),
                i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]))) AS gram
  FROM toks WHERE len(tk) >= 3
)
SELECT gram, count(*) AS n_docs
FROM grams GROUP BY gram
HAVING count(*) >= 2
ORDER BY n_docs DESC, gram
LIMIT {TOP_DUP_NGRAMS_K}
"""


# Incremental probe: the "daily increment" near-dup shape — a small
# new batch probes the standing corpus signature index instead of
# re-running all-pairs LSH over (corpus + batch).
NEW_DOC_MOD = 10  # doc_id % 10 == 0 -> the ~10% "new batch" slice
PROBE_MIN_AGREEMENT = 0.5


def minhash_probe_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash near-dup probe: new docs vs the MATERIALIZED
    corpus signature index.

    The standing corpus's signatures are persisted once per source
    fingerprint (operators/minhash_index.ensure_signature_index — the
    same discipline the IVF vector index follows) and READ here: the
    index side of the probe never recomputes md5 shingle hashing, it
    scans (doc_id, mh) parquet — ~140 bytes a row, no text. Only the
    new batch (doc_id % NEW_DOC_MOD == 0, standing in for a daily
    increment) pays signature computation, so per-increment cost is
    O(batch) after the one-time build. Crowded index buckets (stop-
    shingle boilerplate) are capped at LSH_BUCKET_CAP, mirroring
    minhash_lsh_pairs; signatures ride the band rows as payload so
    agreement is scored inline with zero signature re-joins.

    Output: one row per new doc with >= 1 near-dup in the index -
    match count, best match and its estimated Jaccard (row_number
    tie-broken on match_id so both engines agree). Signatures are a
    pure function of the text, so the indexed result is bit-identical
    to the recompute-everything DuckDB oracle.
    """
    from goe_spark.operators import minhash as MH
    from goe_spark.operators.minhash_index import (
        ensure_signature_index,
        load_signatures,
        signature_frame,
    )

    is_new = F.col("doc_id") % NEW_DOC_MOD == 0
    idx_dir = ensure_signature_index(spark, sf_dir)
    idx_sigs = load_signatures(spark, idx_dir).where(~is_new)
    # The new-batch signature lineage feeds BOTH the occupancy union
    # and the candidate join; without a checkpoint Spark evaluates the
    # whole tokenize->md5->minhash chain (and scans documents) once
    # per consumer. One LAZY localCheckpoint of the O(batch) frame
    # (doc_id + 128-long signature) computes it exactly once,
    # materialized by the first consumer inside the query's single
    # action — the eager form paid an extra blocking job round per
    # call (the paragraph-probe regression's root cause). At 100 TB
    # the increment batch is the small side, so pinning it is the
    # standard "featurize the batch once" layout.
    new_sigs = (
        signature_frame(load_table(spark, sf_dir, "documents").where(is_new))
        .select("doc_id", "mh")
        .localCheckpoint(eager=False)
    )

    def bands_of(sigs: DataFrame) -> DataFrame:
        return sigs.select(
            "doc_id",
            "mh",
            F.explode(MH.band_structs(F.col("mh"))).alias("bs"),
        ).select(
            "doc_id",
            "mh",
            F.col("bs.band").alias("band"),
            F.col("bs.sig").alias("sig"),
        )

    new_b = bands_of(new_sigs).select(
        F.col("doc_id").alias("new_id"),
        F.col("mh").alias("new_mh"),
        "band",
        "sig",
    )
    idx_b = bands_of(idx_sigs)
    # Cap on TOTAL bucket occupancy (index + new), exactly as the
    # full minhash_lsh_pairs join does — capping on index-side rows
    # alone would let the probe emit pairs from buckets the full join
    # drops once the batch pushes occupancy past the cap (the probe
    # must stay a strict restriction of the full join). The union adds
    # only the batch's band rows to the count — O(batch) extra.
    occ = idx_b.select("band", "sig").unionByName(
        new_b.select("band", "sig")
    )
    ok = (
        occ.groupBy("band", "sig")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") <= LSH_BUCKET_CAP)
        .select("band", "sig")
    )
    idx_ok = idx_b.join(ok, ["band", "sig"]).select(
        F.col("doc_id").alias("match_id"),
        F.col("mh").alias("idx_mh"),
        "band",
        "sig",
    )
    cands = (
        new_b.join(idx_ok, ["band", "sig"])
        .select(
            "new_id",
            "match_id",
            F.round(
                MH.minhash_agreement(F.col("new_mh"), F.col("idx_mh")), 6
            ).alias("est_jaccard"),
        )
        .distinct()
        .where(F.col("est_jaccard") >= PROBE_MIN_AGREEMENT)
    )
    # Best match via ONE aggregate instead of a window + rn==1 scan:
    # max(struct(est, -match_id)) realizes exactly the window's
    # (est DESC, match_id ASC) ranking head (doubles here are rounded
    # agreement fractions, never NaN), dropping the extra Exchange +
    # Sort the row_number stage cost.
    best = F.max(
        F.struct(
            F.col("est_jaccard").alias("est"),
            (-F.col("match_id")).alias("neg_id"),
        )
    ).alias("b")
    return (
        cands.groupBy(F.col("new_id").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_matches"), best)
        .select(
            "doc_id",
            "n_matches",
            (-F.col("b.neg_id")).alias("best_match_id"),
            F.col("b.est").alias("best_est_jaccard"),
        )
    )


def _minhash_probe_sql() -> str:
    from goe_spark.operators import minhash as MH

    mh_expr = MH.minhash_signature_sql("sh")
    agr = MH.minhash_agreement_sql("s1.mh", "s2.mh")
    return f"""
WITH shingled AS ({_shingle_hashed_sql()}),
sigs AS (
  SELECT doc_id, {mh_expr} AS mh FROM shingled
),
bands AS ({MH.band_rows_sql("mh")}),
new_b AS (
  SELECT * FROM bands WHERE doc_id % {NEW_DOC_MOD} = 0
),
idx_b AS (
  SELECT * FROM bands WHERE doc_id % {NEW_DOC_MOD} <> 0
),
ok AS (
  -- total occupancy (index + new), mirroring the full join's cap
  SELECT band, sig FROM bands GROUP BY 1, 2
  HAVING count(*) <= {LSH_BUCKET_CAP}
),
cands AS (
  SELECT DISTINCT n.doc_id AS new_id, i.doc_id AS match_id
  FROM new_b n
  JOIN idx_b i ON i.band = n.band AND i.sig = n.sig
  JOIN ok ON ok.band = n.band AND ok.sig = n.sig
),
scored AS (
  SELECT new_id, match_id, round({agr}, 6) AS est_jaccard
  FROM cands
  JOIN sigs s1 ON s1.doc_id = new_id
  JOIN sigs s2 ON s2.doc_id = match_id
),
kept AS (
  SELECT * FROM scored WHERE est_jaccard >= {PROBE_MIN_AGREEMENT}
),
ranked AS (
  SELECT new_id, match_id, est_jaccard,
         row_number() OVER (PARTITION BY new_id
                            ORDER BY est_jaccard DESC, match_id ASC) AS rn
  FROM kept
)
SELECT new_id AS doc_id,
       count(*) AS n_matches,
       max(CASE WHEN rn = 1 THEN match_id END) AS best_match_id,
       max(CASE WHEN rn = 1 THEN est_jaccard END) AS best_est_jaccard
FROM ranked GROUP BY new_id
"""


# Deterministic corpus split for the leakage audit: hash(doc_id) into
# 100 buckets — <SPLIT_TRAIN_PCT train, <SPLIT_VAL_PCT val, else test.
SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 90


def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split LEAKAGE audit: assign every document a
    deterministic hash split, then count the near-dup pairs (the
    MinHash-LSH candidate set, same machinery as minhash_lsh_pairs)
    that land within vs ACROSS splits. Cross-split near-dups are
    evaluation contamination — a near-copy of a training document in
    the test split — which is exactly why pipelines dedup BEFORE
    splitting; this query measures how much leakage a hash split of
    the un-deduped corpus would ship.

    Output: one row per unordered split pair with the pair count and
    an is_leak flag (splits differ). Deterministic: the split hash is
    the cross-engine 60-bit md5 hash, pair set and agreement scores
    are the LSH query's own.

    Scale: rides the banded LSH pair generation (bucket-capped, no
    quadratic term); the split assignment is two map-side hash
    expressions on the pair table — no extra join against the corpus.
    """
    from goe_spark.functions.hashing import hash64

    def split_of(c):
        b = F.pmod(hash64(c.cast("string")), F.lit(100))
        return (
            F.when(b < SPLIT_TRAIN_PCT, "train")
            .when(b < SPLIT_VAL_PCT, "val")
            .otherwise("test")
        )

    pairs = minhash_lsh_pairs(spark, sf_dir).select(
        split_of(F.col("id1")).alias("s1"),
        split_of(F.col("id2")).alias("s2"),
    )
    return (
        pairs.groupBy(
            F.least("s1", "s2").alias("split_a"),
            F.greatest("s1", "s2").alias("split_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "split_a",
            "split_b",
            "n_pairs",
            (F.col("split_a") != F.col("split_b")).alias("is_leak"),
        )
    )


def _split_leakage_sql() -> str:
    from goe_spark.functions.hashing import hash64_sql

    def split_of(col: str) -> str:
        h = hash64_sql(f"cast({col} AS varchar)")
        return (
            f"CASE WHEN ({h}) % 100 < {SPLIT_TRAIN_PCT} THEN 'train' "
            f"WHEN ({h}) % 100 < {SPLIT_VAL_PCT} THEN 'val' "
            f"ELSE 'test' END"
        )

    return f"""
WITH pairs AS ({_minhash_lsh_sql()}),
labeled AS (
  SELECT {split_of('id1')} AS s1, {split_of('id2')} AS s2 FROM pairs
)
SELECT least(s1, s2) AS split_a,
       greatest(s1, s2) AS split_b,
       count(*) AS n_pairs,
       least(s1, s2) <> greatest(s1, s2) AS is_leak
FROM labeled
GROUP BY 1, 2
"""


LINE_WORDS = 10  # words per synthesized "line" (C4 uses \n; fixture
                 # text has none, so the boundary is a fixed word grid)


def line_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level dedup accounting — the C4/CCNet curation stage that
    drops boilerplate LINES shared across documents (cookie banners,
    nav menus) rather than whole near-dup docs. The fixture corpus has
    no newlines, so "lines" are deterministic {LINE_WORDS}-word chunks
    (same synthesized-boundary pattern as the media fixtures); the
    dedup math downstream of the split is the real thing: hash every
    line, count global occurrences, and report per source how much of
    its line mass is corpus-duplicated.

    Plan at 100 TB: chunking is a map-side array projection (two bound
    projections, no per-element re-eval); the only shuffle carries
    (line_fp) hashes for the global count and (source, flags) partial
    aggregates — never line text. Skew-safe: a boilerplate line that
    appears 1e9 times is ONE group of partial counts, not a gathered
    list.
    """
    d = load_table(spark, sf_dir, "documents")
    d = spread(d, "doc_id")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_lines = F.ceil(F.size(F.col("toks")) / LINE_WORDS).cast("int")
    lines = d.select(
        "doc_id", "source", toks.alias("toks")
    ).select(
        "doc_id",
        "source",
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: hash64(
                F.array_join(
                    F.slice(F.col("toks"), i * LINE_WORDS + 1, LINE_WORDS),
                    " ",
                )
            ),
        ).alias("fps"),
    )
    # explode_OUTER + NULL drop, not plain explode: the inferred
    # size(fps) > 0 filter would be pushed below the spread exchange
    # with the whole md5 line-hashing inlined, serializing the hashing
    # onto the scan's split (see cross_lang_shingle_leakage, which
    # measured the same shape at 41 s single-core; plan-guarded for
    # both queries in test_plan_structure.py).
    inst = lines.select(
        "source", F.explode_outer("fps").alias("fp")
    ).where(F.col("fp").isNotNull())
    counts = inst.groupBy("fp").agg(F.count(F.lit(1)).alias("n_occ"))
    return (
        inst.join(counts, "fp")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum((F.col("n_occ") > 1).cast("long")).alias("n_dup_lines"),
            F.count_distinct(F.col("fp")).alias("n_distinct_lines"),
            F.floor(
                F.sum((F.col("n_occ") > 1).cast("long"))
                * 10000.0
                / F.count(F.lit(1))
            )
            .cast("long")
            .alias("dup_lines_per_10k"),
        )
    )


def _line_dedup_sql() -> str:
    toks = r"regexp_split_to_array(trim(text), '\s+')"
    line = (
        f"array_to_string(toks[(i * {LINE_WORDS} + 1):"
        f"((i + 1) * {LINE_WORDS})], ' ')"
    )
    return f"""
WITH docs AS (
  SELECT doc_id, source, {toks} AS toks FROM documents
), inst AS (
  SELECT source, {hash64_sql(line)} AS fp
  FROM docs, LATERAL unnest(
    range(0, cast(ceil(len(toks) / {LINE_WORDS}.0) AS bigint))) AS r(i)
), counts AS (
  SELECT fp, count(*) AS n_occ FROM inst GROUP BY fp
)
SELECT source,
       count(*) AS n_lines,
       cast(sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS bigint)
         AS n_dup_lines,
       count(DISTINCT fp) AS n_distinct_lines,
       cast(floor(sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) * 10000.0
                  / count(*)) AS bigint) AS dup_lines_per_10k
FROM inst JOIN counts USING (fp)
GROUP BY source
"""


def cross_lang_shingle_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-language contamination audit: word-3-gram shingles that
    occur in MORE THAN ONE language's documents. In a multilingual
    pretraining corpus these flag mislabeled language IDs, embedded
    code/quotes, or translated boilerplate — docs the per-language
    dedup passes (which bucket by lang) would never compare. Per lang:
    distinct shingles, shingles shared with any other lang, and the
    shared rate per 10k.

    Plan: rides the same two-projection arithmetic shingle hashing as
    the MinHash family; shuffles carry (lang, sh) hash pairs and the
    sh -> n_langs counts only. At 100 TB the n_langs aggregate is a
    bounded-cardinality hash groupBy (distinct shingles), the standard
    inverted-index asymptotic — no pairwise term anywhere.
    """
    sh = _shingle_hashed(spark, sf_dir)
    # explode_OUTER, then drop the NULL rows ourselves: a plain
    # explode makes Catalyst infer `size(sh) > 0` and push that filter
    # BELOW the parallelizing repartition, inlining the whole
    # md5-shingle expression into a filter that runs on the scan's
    # (often single) split — measured 41 s single-core at sf0.1 vs
    # ~1 s spread over 32. The outer variant generates no inferable
    # filter, so the expensive projection stays above the exchange.
    lang_sh = (
        sh.select("lang", F.explode_outer("sh").alias("s"))
        .where(F.col("s").isNotNull())
        .distinct()
    )
    spread_langs = lang_sh.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_langs")
    )
    return (
        lang_sh.join(spread_langs, "s")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("n_langs") > 1).cast("long")).alias("n_shared"),
            F.floor(
                F.sum((F.col("n_langs") > 1).cast("long"))
                * 10000.0
                / F.count(F.lit(1))
            )
            .cast("long")
            .alias("shared_per_10k"),
        )
    )


def _cross_lang_sql() -> str:
    return f"""
WITH sh AS ({_shingle_hashed_sql()}),
lang_sh AS (
  SELECT DISTINCT lang, s
  FROM (SELECT lang, unnest(sh) AS s FROM sh)
), spreads AS (
  SELECT s, count(*) AS n_langs FROM lang_sh GROUP BY s
)
SELECT lang,
       count(*) AS n_shingles,
       cast(sum(CASE WHEN n_langs > 1 THEN 1 ELSE 0 END) AS bigint)
         AS n_shared,
       cast(floor(sum(CASE WHEN n_langs > 1 THEN 1 ELSE 0 END) * 10000.0
                  / count(*)) AS bigint) AS shared_per_10k
FROM lang_sh JOIN spreads USING (s)
GROUP BY lang
"""


def minhash_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration — the audit a dedup operator runs
    before trusting LSH thresholds at 100 TB: for every LSH candidate
    pair, compare the SIGNATURE-estimated Jaccard (fraction of
    agreeing minhash components) and the observed band agreements
    against the EXACT Jaccard of the distinct shingle sets, bucketed
    by exact Jaccard decile. Per bucket: pair count, mean estimated
    vs mean exact Jaccard (fixed-point q6), mean absolute estimator
    error (q6), and mean agreeing bands (q4) — the empirical banding
    S-curve next to its ground truth.

    Plan: candidates come from the SAME one-shuffle (band, sig)
    bucket grouping as minhash_lsh_pairs; the verify join moves the
    shingle arrays for candidates only (never all-pairs); everything
    after the fixed-point conversion is exact integer arithmetic, so
    the rollup is cross-engine hash-stable. All three consumers read
    the MATERIALIZED signature index (shd + mh columns) — no shingle
    recompute at query time."""
    from goe_spark.operators import minhash as MH
    from goe_spark.operators.minhash_index import (
        ensure_signature_index,
        load_signatures,
    )

    idx = load_signatures(spark, ensure_signature_index(spark, sf_dir))
    sigs = idx.select("doc_id", "mh")
    bands = sigs.select(
        "doc_id", F.explode(MH.band_structs(F.col("mh"))).alias("bs")
    ).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    grouped = bands.groupBy("band", "sig").agg(
        F.array_sort(F.collect_set("doc_id")).alias("ids")
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
        grouped.where((n >= 2) & (n <= LSH_BUCKET_CAP))
        .select(F.explode_outer(pair_structs).alias("p"))
        .select("p.id1", "p.id2")
        .distinct()
    )
    scored = cands.join(
        idx.select(
            F.col("doc_id").alias("id1"),
            F.col("shd").alias("shd1"),
            F.col("mh").alias("mh1"),
        ),
        "id1",
    ).join(
        idx.select(
            F.col("doc_id").alias("id2"),
            F.col("shd").alias("shd2"),
            F.col("mh").alias("mh2"),
        ),
        "id2",
    )
    n_common = F.size(F.array_intersect("shd1", "shd2"))
    exact = n_common / (F.size("shd1") + F.size("shd2") - n_common)
    est = MH.minhash_agreement(F.col("mh1"), F.col("mh2"))
    bands_agree = sum(
        (
            F.slice("mh1", b * MH.LSH_ROWS + 1, MH.LSH_ROWS)
            == F.slice("mh2", b * MH.LSH_ROWS + 1, MH.LSH_ROWS)
        ).cast("int")
        for b in range(MH.LSH_BANDS)
    )
    per = scored.select(
        F.least(F.floor(exact * 10), F.lit(9)).cast("int").alias("bin"),
        F.floor(est * 1e6 + 0.5).cast("bigint").alias("est_q6"),
        F.floor(exact * 1e6 + 0.5).cast("bigint").alias("exact_q6"),
        bands_agree.cast("bigint").alias("nb"),
    )
    cnt = F.count(F.lit(1))
    return per.groupBy("bin").agg(
        cnt.alias("n_pairs"),
        F.floor(F.sum("est_q6") / cnt).cast("bigint").alias("mean_est_q6"),
        F.floor(F.sum("exact_q6") / cnt)
        .cast("bigint")
        .alias("mean_exact_q6"),
        F.floor(F.sum(F.abs(F.col("est_q6") - F.col("exact_q6"))) / cnt)
        .cast("bigint")
        .alias("mean_abs_err_q6"),
        F.floor(F.sum(F.col("nb") * 10000) / cnt)
        .cast("bigint")
        .alias("mean_bands_q4"),
    )


def _minhash_calibration_sql() -> str:
    from goe_spark.operators import minhash as MH

    mh_expr = MH.minhash_signature_sql("shd")
    bands_agree = " + ".join(
        f"(CASE WHEN list_slice(sa.mh, {b * MH.LSH_ROWS + 1}, "
        f"{(b + 1) * MH.LSH_ROWS}) = list_slice(sb.mh, "
        f"{b * MH.LSH_ROWS + 1}, {(b + 1) * MH.LSH_ROWS}) "
        "THEN 1 ELSE 0 END)"
        for b in range(MH.LSH_BANDS)
    )
    exact = (
        "(len(list_intersect(sa.shd, sb.shd)) / (len(sa.shd) + len(sb.shd)"
        " - len(list_intersect(sa.shd, sb.shd))))"
    )
    est = MH.minhash_agreement_sql("sa.mh", "sb.mh")
    return f"""
WITH shingled AS (
  SELECT doc_id, list_distinct(sh) AS shd
  FROM ({_shingle_hashed_sql()})
), sigs AS (
  SELECT doc_id, {mh_expr} AS mh FROM shingled
), swm AS (
  SELECT s.doc_id, s.shd, g.mh FROM shingled s JOIN sigs g USING (doc_id)
), bands AS ({MH.band_rows_sql("mh")}),
ok_buckets AS (
  SELECT band, sig FROM bands GROUP BY 1, 2 HAVING count(*) <= {LSH_BUCKET_CAP}
), cands AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  JOIN ok_buckets ok ON ok.band = a.band AND ok.sig = a.sig
), per AS (
  SELECT least(cast(floor({exact} * 10) AS int), 9) AS bin,
         cast(floor({est} * 1e6 + 0.5) AS bigint) AS est_q6,
         cast(floor({exact} * 1e6 + 0.5) AS bigint) AS exact_q6,
         cast({bands_agree} AS bigint) AS nb
  FROM cands
  JOIN swm sa ON sa.doc_id = id1
  JOIN swm sb ON sb.doc_id = id2
)
SELECT bin,
       count(*) AS n_pairs,
       cast(floor(sum(est_q6) / count(*)) AS bigint) AS mean_est_q6,
       cast(floor(sum(exact_q6) / count(*)) AS bigint) AS mean_exact_q6,
       cast(floor(sum(abs(est_q6 - exact_q6)) / count(*)) AS bigint)
         AS mean_abs_err_q6,
       cast(floor(sum(nb * 10000) / count(*)) AS bigint) AS mean_bands_q4
FROM per GROUP BY bin
"""


# Edit-distance verification truncates normalized text to this many
# chars: Levenshtein is O(len^2) per pair, so the cap bounds verify
# CPU at 256^2 cells regardless of document length — the standard
# truncation trade in record-linkage verify stages: the score is the
# PREFIX distance, exact for docs shorter than the cap and a proxy
# beyond it (two docs identical in their first 256 chars score 0
# even if their tails differ — acceptable here because the LSH
# candidate stage already requires whole-document shingle agreement).
EDIT_PREFIX_CHARS = 256

# Posting-list cap for containment blocking: a shingle held by more
# than this many docs emits no candidate pairs (boilerplate shingles
# would otherwise fan out quadratically). Rare-shingle co-occurrence
# is the standard blocking key for CONTAINMENT — LSH bands estimate
# Jaccard, which is low for a short doc inside a long one, so the
# minhash buckets systematically miss exactly the pairs this
# operator exists to find.
CONTAINMENT_DF_CAP = 16


def editdist_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage near-dup: LSH candidate generation + EXACT
    Levenshtein verification — the two-stage shape (block, then
    verify with an expensive exact measure) every dedup pipeline at
    100 TB uses when set-based Jaccard is too loose (it ignores word
    ORDER; edit distance catches scrambled near-dups Jaccard scores
    as identical).

    Plan: candidates come from the same materialized MinHash band
    buckets as ngram_jaccard_pairs (bucket size tracks signature
    collisions, not corpus size; LSH_BUCKET_CAP bounds the worst
    bucket), so the quadratic Levenshtein kernel runs ONLY on
    candidate pairs, each over a 256-char normalized prefix
    (EDIT_PREFIX_CHARS bounds per-pair CPU). The verify join moves
    truncated text for candidates only — never all-pairs, never the
    full corpus. All compute is codegen (levenshtein is a JVM
    built-in); zero Python.

    Output: pairs with relative edit distance <= 0.5 (distance over
    the longer prefix), id1 < id2.
    """
    from goe_spark.operators import minhash as MH
    from goe_spark.operators.minhash_index import (
        ensure_signature_index,
        load_signatures,
    )

    idx = load_signatures(spark, ensure_signature_index(spark, sf_dir))
    bands = idx.select(
        "doc_id", F.explode(MH.band_structs(F.col("mh"))).alias("bs")
    ).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    grouped = bands.groupBy("band", "sig").agg(
        F.array_sort(F.collect_set("doc_id")).alias("ids")
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
        grouped.where((n >= 2) & (n <= LSH_BUCKET_CAP))
        .select(F.explode_outer(pair_structs).alias("p"))
        .select("p.id1", "p.id2")
        .distinct()
    )
    norm = F.substring(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
        1,
        EDIT_PREFIX_CHARS,
    )
    texts = load_table(spark, sf_dir, "documents").select(
        "doc_id", norm.alias("t")
    )
    scored = cands.join(
        texts.select(F.col("doc_id").alias("id1"), F.col("t").alias("t1")),
        "id1",
    ).join(
        texts.select(F.col("doc_id").alias("id2"), F.col("t").alias("t2")),
        "id2",
    )
    dist = F.levenshtein("t1", "t2")
    rel = F.round(dist / F.greatest(F.length("t1"), F.length("t2")), 6)
    return scored.select(
        "id1",
        "id2",
        dist.alias("edit_dist"),
        rel.alias("rel_edit"),
    ).where(F.col("rel_edit") <= 0.5)


def _editdist_sql() -> str:
    from goe_spark.operators import minhash as MH

    mh_expr = MH.minhash_signature_sql("shd")
    norm = (
        r"substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 1, "
        f"{EDIT_PREFIX_CHARS})"
    )
    return f"""
WITH shingled AS (
  SELECT doc_id, list_distinct(sh) AS shd
  FROM ({_shingle_hashed_sql()})
), sigs AS (
  SELECT doc_id, {mh_expr} AS mh FROM shingled
), bands AS ({MH.band_rows_sql("mh")}),
ok_buckets AS (
  SELECT band, sig FROM bands GROUP BY 1, 2 HAVING count(*) <= {LSH_BUCKET_CAP}
), cands AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  JOIN ok_buckets ok ON ok.band = a.band AND ok.sig = a.sig
), texts AS (
  SELECT doc_id, {norm} AS t FROM documents
), scored AS (
  SELECT id1, id2,
         levenshtein(ta.t, tb.t) AS edit_dist,
         round(levenshtein(ta.t, tb.t)
               / greatest(length(ta.t), length(tb.t)), 6) AS rel_edit
  FROM cands
  JOIN texts ta ON ta.doc_id = id1
  JOIN texts tb ON tb.doc_id = id2
)
SELECT id1, id2, edit_dist, rel_edit FROM scored WHERE rel_edit <= 0.5
"""


def shingle_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment detection — partial copies Jaccard
    misses: a 50-shingle doc pasted inside a 500-shingle doc scores
    Jaccard 0.1 (below every near-dup threshold) but containment 1.0.
    Containment C = |A ∩ B| / min(|A|, |B|); pairs with C >= 0.5 are
    quote-heavy syndication, excerpting, or template stuffing.

    Blocking is RARE-SHINGLE co-occurrence, not LSH: minhash bands
    estimate Jaccard, which is exactly the measure containment pairs
    fail, so LSH buckets systematically miss them. Instead: explode
    the materialized shingle index, keep shingles with document
    frequency in [2, CONTAINMENT_DF_CAP], and pair docs sharing one.
    The DF cap bounds per-shingle fanout at CAP*(CAP-1)/2 pairs; at
    100 TB the posting-list explode shuffles (shingle, doc_id) pairs
    only for rare shingles — boilerplate never pairs. Exact
    verification then intersects the full shingle arrays for the
    (small) candidate set.

    Output: id1 < id2, shingle-set sizes, common count, containment
    (q6), and which side is contained.
    """
    from goe_spark.operators.minhash_index import (
        ensure_signature_index,
        load_signatures,
    )

    idx = load_signatures(spark, ensure_signature_index(spark, sf_dir))
    shingled = idx.select("doc_id", "shd")
    posts = shingled.select(
        "doc_id", F.explode("shd").alias("sh")
    )
    # COUNT first, collect after: a single-pass collect_set would
    # materialize the full posting list of every boilerplate shingle
    # (df up to corpus size) only to throw it away at the cap — the
    # sf10 probe measured 24x wall-clock on 100x data for exactly
    # that; counting is a map-side-partial aggregate, and only
    # cap-bounded lists are ever collected. Both aggregates hash on
    # `sh`, so the second reuses the first's exchange.
    # pin_cpu_stage below the count: AQE re-plans the posts><rare_sh
    # join as a broadcast of POSTS and then reuses THIS exchange's
    # partitioning for everything downstream (collect_set + pair
    # expansion), so if it byte-coalesces here the whole expansion
    # serializes onto 2 cores (measured). Pinning the count exchange
    # pins the downstream CPU stages whichever build side AQE picks.
    # Partial-agg loss is immaterial: rare-shingle keys are
    # distinct-heavy, so count partials barely shrink the rows.
    rare_sh = (
        pin_cpu_stage(posts, "sh")
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= CONTAINMENT_DF_CAP))
        .select("sh")
    )
    # Both CPU walls below are byte-light, so AQE coalesces them onto
    # 1-2 cores without the pins (measured: expansion 1.5 s on 2
    # tasks, verify 11 s of array_intersect CPU on 8): pin the
    # posting-list expansion and the per-pair verify stages. The
    # expansion pin sits BELOW the groupBy — its hash partitioning
    # satisfies the aggregate's clustering, so it REPLACES the
    # coalescable exchange instead of adding one (a pin above the
    # aggregate gets collapsed into the (id1, id2) repartition by the
    # optimizer's redundant-repartition rule — verified in the plan).
    rare = (
        pin_cpu_stage(posts.join(rare_sh, "sh"), "sh")
        .groupBy("sh")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
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
    # pin_cpu_stage BEFORE distinct: the pinned hash partitioning on
    # (id1, id2) already satisfies the distinct's clustering, so the
    # dedup agg adds no exchange of its own and the verify inherits
    # the pinned slot count instead of AQE's byte-coalesced 8.
    cands = (
        pin_cpu_stage(
            rare.select(F.explode_outer(pair_structs).alias("p")).select(
                "p.id1", "p.id2"
            ),
            "id1",
            "id2",
        )
        .distinct()
    )
    # Explicit broadcast of the DOC side: size estimates otherwise
    # pick the PAIR side (~1M rows here) as the build side, collecting
    # it to the driver and running the whole array_intersect verify
    # inside the doc scan's single-file stage — one task (measured:
    # the verify wall). With the doc side built, the pinned pair
    # partitions stream and the verify spreads across the cores.
    #
    # The broadcast side is RESTRICTED to candidate docs first (semi-
    # join against the rare posting lists): every doc in any candidate
    # pair shares >= 1 rare shingle by construction, so the semi-join
    # loses nothing, and the broadcast is CANDIDATE-set grain — at
    # most CONTAINMENT_DF_CAP docs per rare shingle — instead of the
    # full corpus-grain index, which at 100 TB would blow Spark's
    # 8 GB broadcast cap (and contradict SCALE.md's bound for this
    # query). Locally the semi-join rides the already-shuffled rare
    # posting exchange (ReusedExchange).
    cand_ids = posts.join(rare_sh, "sh").select("doc_id").distinct()
    bounded = shingled.join(cand_ids, "doc_id", "semi")
    scored = cands.join(
        F.broadcast(
            bounded.select(
                F.col("doc_id").alias("id1"), F.col("shd").alias("shd1")
            )
        ),
        "id1",
    ).join(
        F.broadcast(
            bounded.select(
                F.col("doc_id").alias("id2"), F.col("shd").alias("shd2")
            )
        ),
        "id2",
    )
    n_common = F.size(F.array_intersect("shd1", "shd2"))
    containment = F.round(
        n_common / F.least(F.size("shd1"), F.size("shd2")), 6
    )
    return (
        scored.select(
            "id1",
            "id2",
            F.size("shd1").alias("n_sh1"),
            F.size("shd2").alias("n_sh2"),
            n_common.alias("n_common"),
            containment.alias("containment"),
            F.when(F.size("shd1") < F.size("shd2"), F.lit("left_in_right"))
            .when(F.size("shd2") < F.size("shd1"), F.lit("right_in_left"))
            .otherwise(F.lit("same_size"))
            .alias("relation"),
        )
        .where(F.col("containment") >= 0.5)
    )


def _containment_sql() -> str:
    return f"""
WITH shingled AS (
  SELECT doc_id, list_distinct(sh) AS shd
  FROM ({_shingle_hashed_sql()})
), posts AS (
  SELECT doc_id, unnest(shd) AS sh FROM shingled
), rare AS (
  SELECT sh FROM posts GROUP BY sh
  HAVING count(*) BETWEEN 2 AND {CONTAINMENT_DF_CAP}
), cands AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM posts a JOIN posts b ON a.sh = b.sh AND a.doc_id < b.doc_id
  JOIN rare r ON r.sh = a.sh
), scored AS (
  SELECT id1, id2,
         len(sa.shd) AS n_sh1,
         len(sb.shd) AS n_sh2,
         len(list_intersect(sa.shd, sb.shd)) AS n_common,
         round(len(list_intersect(sa.shd, sb.shd))
               / least(len(sa.shd), len(sb.shd)), 6) AS containment
  FROM cands
  JOIN shingled sa ON sa.doc_id = id1
  JOIN shingled sb ON sb.doc_id = id2
)
SELECT id1, id2, n_sh1, n_sh2, n_common, containment,
       CASE WHEN n_sh1 < n_sh2 THEN 'left_in_right'
            WHEN n_sh2 < n_sh1 THEN 'right_in_left'
            ELSE 'same_size' END AS relation
FROM scored WHERE containment >= 0.5
"""


# --- paragraph-grain fuzzy dedup -------------------------------------------
# Sub-document near-dup removal — the grain production pipelines
# actually scrub (quoted passages, syndicated intros, shared
# boilerplate paragraphs survive BOTH line-level exact dedup — a
# single changed word defeats the line hash — and doc-level minhash,
# whose whole-document signature dilutes a shared paragraph below
# threshold). The fixture corpus has no paragraph breaks, so a
# "paragraph" is a deterministic PARA_WORDS-word chunk (same
# synthesized-boundary convention as LINE_WORDS).
PARA_WORDS = 20
PARA_SIM_MIN = 0.6  # est_jaccard floor for a cross-doc paragraph dup
#: paragraph key = doc_id * PARA_KEY_BASE + idx: one int64 key rides
#: the band machinery unchanged; docs beyond 65536 paragraphs (1.3M
#: words at PARA_WORDS=20) are outside the fixture and any sane web doc
PARA_KEY_BASE = 65536


def _paragraph_sigs(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """(doc_id, lang, idx, n_paras, mh): MinHash signature per
    synthesized paragraph, map-side end-to-end. Paragraphs shorter
    than 3 tokens (the shingle width) carry a NULL signature and
    never enter the LSH stage — they still count in n_paras."""
    from goe_spark.operators import minhash as MH

    d = (
        docs if docs is not None else load_table(spark, sf_dir, "documents")
    ).select("doc_id", "lang", "text")
    d = spread(d, "doc_id")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_paras = F.ceil(F.size(F.col("toks")) / PARA_WORDS).cast("int")
    paras = d.select("doc_id", "lang", toks.alias("toks")).select(
        "doc_id",
        "lang",
        n_paras.alias("n_paras"),
        F.transform(
            F.sequence(F.lit(0), n_paras - 1),
            lambda i: F.struct(
                i.cast("int").alias("idx"),
                F.slice(F.col("toks"), i * PARA_WORDS + 1, PARA_WORDS).alias(
                    "ptoks"
                ),
            ),
        ).alias("ps"),
    )
    # explode_outer + NULL drop (not plain explode): see line_dedup's
    # plan note — an inferred size filter would push the hashing
    # below the spread exchange and serialize it onto one split
    inst = paras.select(
        "doc_id", "lang", "n_paras", F.explode_outer("ps").alias("p")
    ).where(F.col("p").isNotNull())
    # THREE bound-column projections (token hashes -> shingle hashes
    # -> signature), the signature_frame discipline: an inline
    # composition would duplicate the md5 token hashing into all 16
    # array_min references of minhash_signature (measured: the sf10
    # probe crawled at ~16x the expected per-paragraph cost).
    # CollapseProject keeps non-cheap aliases referenced more than
    # once as separate projects, so md5 runs once per token.
    th_f = inst.select(
        "doc_id",
        "lang",
        "n_paras",
        F.col("p.idx").alias("idx"),
        # `signed` is the CHEAP pre-hashing shingle-ability flag:
        # downstream LSH consumers filter on it, never on
        # mh.isNotNull() — that predicate would inline the whole md5
        # signature lineage into a Filter (the md5_in_filter hazard
        # class the plan audit polices)
        (F.size(F.col("p.ptoks")) >= 3).alias("signed"),
        F.when(
            F.size(F.col("p.ptoks")) >= 3,
            MH.token_hashes(F.col("p.ptoks")),
        ).alias("th"),
    )
    sh_f = th_f.select(
        "doc_id",
        "lang",
        "n_paras",
        "idx",
        "signed",
        F.when(
            F.col("th").isNotNull(), MH.arith_shingle_hashes(F.col("th"))
        ).alias("sh"),
    )
    return sh_f.select(
        "doc_id",
        "lang",
        "n_paras",
        "idx",
        "signed",
        F.when(
            F.col("sh").isNotNull(), MH.minhash_signature_named("sh")
        ).alias("mh"),
    )


def paragraph_dup_pairs(
    sigs: DataFrame, sim_min: float = PARA_SIM_MIN
) -> DataFrame:
    """(pid1, pid2) with pid1 < pid2: CROSS-DOC paragraph pairs whose
    MinHash agreement meets ``sim_min``, from a `_paragraph_sigs`
    frame. The LSH band groupBy is the only corpus-scale shuffle,
    bucket-capped like minhash_lsh_pairs; shared by the stats query
    and the curation PARAGRAPH_SCRUB stage (one code path, two
    surfaces)."""
    from goe_spark.operators import minhash as MH

    with_sig = sigs.where(F.col("signed")).select(
        (F.col("doc_id") * PARA_KEY_BASE + F.col("idx")).alias("pid"),
        "doc_id",
        "mh",
    )
    bands = with_sig.select(
        F.struct("pid", "doc_id", "mh").alias("doc"),
        F.explode(MH.band_structs(F.col("mh"))).alias("bs"),
    ).select(
        "doc", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    grouped = bands.groupBy("band", "sig").agg(
        F.array_sort(F.collect_set("doc")).alias("docs")
    )
    n = F.size("docs")
    pair_structs = F.flatten(
        F.transform(
            F.col("docs"),
            lambda x, i: F.transform(
                F.slice(F.col("docs"), i + 2, n - i - 1),
                lambda y: F.struct(
                    x["pid"].alias("pid1"),
                    y["pid"].alias("pid2"),
                    (
                        (x["doc_id"] != y["doc_id"])
                        & (
                            MH.minhash_agreement(x["mh"], y["mh"])
                            >= sim_min
                        )
                    ).alias("dup"),
                ),
            ),
        )
    )
    return (
        grouped.where((n >= 2) & (n <= LSH_BUCKET_CAP))
        .select(F.explode_outer(pair_structs).alias("p"))
        .where(F.col("p.dup"))
        .select("p.pid1", "p.pid2")
        .distinct()
    )


def paragraph_dedup_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Paragraph-grain MinHash near-dup accounting with DOC-LEVEL
    reconstruction: per language — paragraphs, cross-doc duplicated
    paragraphs (est_jaccard >= {PARA_SIM_MIN} with a paragraph of
    ANOTHER doc), docs touched, and docs FULLY reconstructible from
    other documents' paragraphs (every paragraph duplicated — the
    doc-level dedup miss this grain exists to catch).

    Plan: paragraph signatures are map-side (one spread exchange
    bounds the md5 work per task); the LSH band groupBy is the only
    corpus-scale shuffle, capped per bucket like minhash_lsh_pairs;
    dup flags aggregate at (doc, idx) grain, then one lang rollup.
    Nothing quadratic outside genuinely colliding buckets."""
    # Full-catalog run: read the materialized paragraph index
    # (operators/paragraph_index, fingerprint-fresh) instead of
    # re-shingling the corpus — the same persisted signatures the
    # incremental probe scans.
    from goe_spark.operators.paragraph_index import (
        ensure_paragraph_index,
        load_paragraphs,
    )

    sigs = load_paragraphs(spark, ensure_paragraph_index(spark, sf_dir))
    pairs = paragraph_dup_pairs(sigs)
    dup_pids = (
        pairs.select(F.col("pid1").alias("pid"))
        .union(pairs.select(F.col("pid2").alias("pid")))
        .distinct()
    )
    para_flags = sigs.join(
        dup_pids,
        (F.col("doc_id") * PARA_KEY_BASE + F.col("idx")) == F.col("pid"),
        "left",
    ).select(
        "doc_id", "lang", "n_paras",
        F.col("pid").isNotNull().cast("long").alias("is_dup"),
    )
    per_doc = para_flags.groupBy("doc_id", "lang").agg(
        F.max("n_paras").alias("n_paras"),
        F.sum("is_dup").alias("n_dup"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_paras").alias("n_paragraphs"),
        F.sum("n_dup").alias("n_dup_paragraphs"),
        F.sum((F.col("n_dup") > 0).cast("long")).alias("n_docs_affected"),
        F.sum(
            (F.col("n_dup") == F.col("n_paras")).cast("long")
        ).alias("n_docs_fully_dup"),
        F.floor(
            F.sum("n_dup") * 10000.0 / F.sum("n_paras")
        ).cast("long").alias("dup_paras_per_10k"),
    )


def paragraph_probe_new_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental paragraph-grain probe: new docs (doc_id %
    {NEW_DOC_MOD} == 0, the daily-increment stand-in) against the
    MATERIALIZED corpus paragraph index — does any paragraph of an
    incoming doc already exist (near-duplicate, agreement >=
    {PARA_SIM_MIN}) in the standing corpus? The sub-document twin of
    minhash_probe_new_docs: only the batch pays signature
    computation; the index side scans persisted (doc_id, idx, mh)
    rows, no text. Bucket occupancy is capped on the UNION of index
    and batch band rows, exactly like the full pair join, so the
    probe stays a strict restriction of it.

    Output: one row per new doc with >= 1 matched paragraph —
    paragraph counts, matched-paragraph count, best agreement, and
    the fully-duplicated flag (every signed paragraph already in the
    corpus: the doc adds nothing)."""
    from goe_spark.operators import minhash as MH
    from goe_spark.operators.paragraph_index import (
        ensure_paragraph_index,
        load_paragraphs,
    )

    is_new = F.col("doc_id") % NEW_DOC_MOD == 0
    idx_dir = ensure_paragraph_index(spark, sf_dir)
    idx_sigs = load_paragraphs(spark, idx_dir).where(~is_new)
    # The batch's paragraph-signature lineage feeds THREE consumers
    # (occupancy union, candidate join, the final per-doc rollup);
    # uncheckpointed, Spark re-runs the tokenize->md5->minhash chain
    # and the documents scan once per consumer. One LAZY
    # localCheckpoint of the O(batch) frame computes it exactly once,
    # materialized by the first consumer inside the query's single
    # action — the r13 EAGER variant added a blocking driver job
    # round before the action that cost more than the recomputation
    # it saved at this batch size (driver-measured 0.63x regression,
    # the round's one red; the drops/cuts checkpoints of
    # dedup_stage_overlap already use the lazy form).
    new_all = _paragraph_sigs(
        spark, sf_dir, docs=load_table(spark, sf_dir, "documents").where(is_new)
    ).select(
        "doc_id", "idx", "n_paras", "signed", "mh"
    ).localCheckpoint(eager=False)

    def bands_of(sigs: DataFrame, pid_name: str, mh_name: str) -> DataFrame:
        keyed = sigs.where(F.col("signed")).select(
            (F.col("doc_id") * PARA_KEY_BASE + F.col("idx")).alias(pid_name),
            F.col("mh").alias(mh_name),
        )
        return keyed.select(
            pid_name,
            mh_name,
            F.explode(MH.band_structs(F.col(mh_name))).alias("bs"),
        ).select(
            pid_name,
            mh_name,
            F.col("bs.band").alias("band"),
            F.col("bs.sig").alias("sig"),
        )

    new_b = bands_of(new_all, "new_pid", "new_mh")
    idx_b = bands_of(idx_sigs, "idx_pid", "idx_mh")
    occ = idx_b.select("band", "sig").unionByName(
        new_b.select("band", "sig")
    )
    ok = (
        occ.groupBy("band", "sig")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") <= LSH_BUCKET_CAP)
        .select("band", "sig")
    )
    # filter on the RAW agreement (the oracle SQL does too) and round
    # only the emitted est column — filtering the rounded value was a
    # latent cross-engine divergence had K_MINHASH or the threshold
    # stopped quantizing agreement to multiples of 1/16.
    cands = (
        new_b.join(idx_b.join(ok, ["band", "sig"]), ["band", "sig"])
        .select(
            "new_pid",
            "idx_pid",
            MH.minhash_agreement(F.col("new_mh"), F.col("idx_mh")).alias(
                "agree"
            ),
        )
        .distinct()
        .where(F.col("agree") >= PARA_SIM_MIN)
        .select("new_pid", "idx_pid", F.round("agree", 6).alias("est"))
    )
    per_para = cands.groupBy("new_pid").agg(F.max("est").alias("best_est"))
    joined = new_all.join(
        per_para,
        (F.col("doc_id") * PARA_KEY_BASE + F.col("idx"))
        == F.col("new_pid"),
        "left",
    )
    per_doc = joined.groupBy("doc_id").agg(
        F.max("n_paras").alias("n_paras"),
        F.sum(F.col("mh").isNotNull().cast("long")).alias("n_signed"),
        F.sum(F.col("new_pid").isNotNull().cast("long")).alias(
            "n_matched_paras"
        ),
        F.round(F.max("best_est"), 6).alias("best_est_jaccard"),
    )
    return per_doc.where(F.col("n_matched_paras") > 0).select(
        "doc_id",
        "n_paras",
        "n_signed",
        "n_matched_paras",
        "best_est_jaccard",
        (
            (F.col("n_signed") > 0)
            & (F.col("n_matched_paras") == F.col("n_signed"))
        ).cast("long").alias("fully_dup"),
    )


def _paragraph_probe_sql() -> str:
    from goe_spark.operators import minhash as MH

    agree = MH.minhash_agreement_sql("s1.mh", "s2.mh")
    return f"""
WITH {_paragraph_sig_ctes_sql()}, bands AS ({MH.band_rows_sql("mh")}),
new_b AS (
  SELECT * FROM bands WHERE doc_id // {PARA_KEY_BASE} % {NEW_DOC_MOD} = 0
),
idx_b AS (
  SELECT * FROM bands WHERE doc_id // {PARA_KEY_BASE} % {NEW_DOC_MOD} <> 0
),
ok AS (
  SELECT band, sig FROM bands GROUP BY 1, 2
  HAVING count(*) <= {LSH_BUCKET_CAP}
),
cands AS (
  SELECT DISTINCT n.doc_id AS new_pid, i.doc_id AS idx_pid
  FROM new_b n
  JOIN idx_b i ON i.band = n.band AND i.sig = n.sig
  JOIN ok ON ok.band = n.band AND ok.sig = n.sig
),
scored AS (
  SELECT new_pid, round({agree}, 6) AS est
  FROM cands
  JOIN sigs s1 ON s1.doc_id = new_pid
  JOIN sigs s2 ON s2.doc_id = idx_pid
  WHERE {agree} >= {PARA_SIM_MIN}
),
per_para AS (
  SELECT new_pid, max(est) AS best_est FROM scored GROUP BY new_pid
),
per_doc AS (
  SELECT a.doc_id,
         max(a.n_paras) AS n_paras,
         cast(sum(CASE WHEN a.mh IS NOT NULL THEN 1 ELSE 0 END)
              AS bigint) AS n_signed,
         cast(sum(CASE WHEN p.new_pid IS NOT NULL THEN 1 ELSE 0 END)
              AS bigint) AS n_matched_paras,
         round(max(p.best_est), 6) AS best_est_jaccard
  FROM allsigs a
  LEFT JOIN per_para p
    ON a.doc_id * {PARA_KEY_BASE} + a.idx = p.new_pid
  WHERE a.doc_id % {NEW_DOC_MOD} = 0
  GROUP BY a.doc_id
)
SELECT doc_id, n_paras, n_signed, n_matched_paras, best_est_jaccard,
       cast(CASE WHEN n_signed > 0 AND n_matched_paras = n_signed
                 THEN 1 ELSE 0 END AS bigint) AS fully_dup
FROM per_doc WHERE n_matched_paras > 0
"""


def _paragraph_sig_ctes_sql() -> str:
    """Shared DuckDB CTE block recomputing the paragraph signature
    lineage (docs -> paras -> hashed -> allsigs -> pid-keyed sigs) —
    one text, used by the stats oracle and the probe oracle so the
    lineages cannot drift."""
    from goe_spark.operators import minhash as MH

    toks = r"regexp_split_to_array(trim(text), '\s+')"
    ptoks = f"toks[(i * {PARA_WORDS} + 1):((i + 1) * {PARA_WORDS})]"
    th = MH.token_hashes_sql("ptoks")
    mh = MH.minhash_signature_sql("sh")
    return f"""docs AS (
  SELECT doc_id, lang, {toks} AS toks FROM documents
), paras AS (
  SELECT doc_id, lang,
         cast(ceil(len(toks) / {PARA_WORDS}.0) AS int) AS n_paras,
         cast(i AS int) AS idx, {ptoks} AS ptoks
  FROM docs, LATERAL unnest(
    range(0, cast(ceil(len(toks) / {PARA_WORDS}.0) AS bigint))) AS r(i)
), hashed AS (
  SELECT doc_id, lang, n_paras, idx, {th} AS th FROM paras
), allsigs AS (
  SELECT doc_id, lang, n_paras, idx,
         CASE WHEN len(th) >= 3
              THEN (SELECT {mh} FROM (SELECT
                    {MH.arith_shingle_hashes_sql('th')} AS sh))
         END AS mh
  FROM hashed
), sigs AS (
  SELECT doc_id * {PARA_KEY_BASE} + idx AS doc_id, mh
  FROM allsigs WHERE mh IS NOT NULL
)"""


def _paragraph_dedup_sql() -> str:
    from goe_spark.operators import minhash as MH

    agree = MH.minhash_agreement_sql("s1.mh", "s2.mh")
    return f"""
WITH {_paragraph_sig_ctes_sql()}, bands AS ({MH.band_rows_sql("mh")}),
ok_buckets AS (
  SELECT band, sig FROM bands GROUP BY 1, 2 HAVING count(*) <= {LSH_BUCKET_CAP}
),
cands AS (
  SELECT DISTINCT a.doc_id AS pid1, b.doc_id AS pid2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  JOIN ok_buckets ok ON ok.band = a.band AND ok.sig = a.sig
  WHERE a.doc_id // {PARA_KEY_BASE} <> b.doc_id // {PARA_KEY_BASE}
),
dup_pairs AS (
  SELECT pid1, pid2
  FROM cands
  JOIN sigs s1 ON s1.doc_id = pid1
  JOIN sigs s2 ON s2.doc_id = pid2
  WHERE {agree} >= {PARA_SIM_MIN}
),
dup_pids AS (
  SELECT pid1 AS pid FROM dup_pairs
  UNION SELECT pid2 FROM dup_pairs
),
per_doc AS (
  SELECT a.doc_id, a.lang, max(a.n_paras) AS n_paras,
         cast(sum(CASE WHEN d.pid IS NOT NULL THEN 1 ELSE 0 END)
              AS bigint) AS n_dup
  FROM allsigs a
  LEFT JOIN dup_pids d
    ON a.doc_id * {PARA_KEY_BASE} + a.idx = d.pid
  GROUP BY a.doc_id, a.lang
)
SELECT lang,
       count(*) AS n_docs,
       cast(sum(n_paras) AS bigint) AS n_paragraphs,
       cast(sum(n_dup) AS bigint) AS n_dup_paragraphs,
       cast(sum(CASE WHEN n_dup > 0 THEN 1 ELSE 0 END) AS bigint)
         AS n_docs_affected,
       cast(sum(CASE WHEN n_dup = n_paras THEN 1 ELSE 0 END) AS bigint)
         AS n_docs_fully_dup,
       cast(floor(sum(n_dup) * 10000.0 / sum(n_paras)) AS bigint)
         AS dup_paras_per_10k
FROM per_doc GROUP BY lang
"""


# The curation pipeline's seven dedup grains, in pipeline order
# (plans/curation.py STAGES restricted to the dedup stages). The
# thresholds mirror the CurationConfig defaults so the report
# describes the pipeline a default `goe curate` run executes.
DEDUP_STAGE_ORDER = (
    ("URL_DEDUP", 1),
    ("LINE_SCRUB", 2),
    ("EXACT_DEDUP", 3),
    ("NEAR_DEDUP", 4),
    ("PARAGRAPH_SCRUB", 5),
    ("SPAN_SCRUB", 6),
    ("CONTAINMENT_SCRUB", 7),
)
LINE_SCRUB_DOC_MAX = 2  # CurationConfig.line_doc_max default
CONT_SCRUB_MIN = 0.9  # CurationConfig.containment_min default


def dedup_stage_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curator's budget-allocation report (round-12 verdict item
    5): the pipeline runs seven dedup grains, and each stage's VALUE
    is the token mass it reclaims that NO earlier stage would have
    reclaimed — a stage whose standalone reclaim is huge but whose
    unique reclaim is near zero is pure overlap with cheaper earlier
    stages and can be dropped from the budget. Per stage (pipeline
    order): docs/tokens it would reclaim STANDALONE on the raw
    corpus, tokens only it reclaims given its pipeline position
    (unique = credited to the earliest stage that would reclaim each
    token), and the overlap mass (standalone - unique).

    Attribution model: whole-doc stages (URL/exact/near/containment)
    reclaim every token of a dropped doc; scrub stages (line/
    paragraph/span) reclaim their cut positions. Each (doc, token
    position) is credited to the MINIMUM stage_ord that reclaims it,
    where a doc-drop stage reclaims all positions of its dropped
    docs. Stage semantics and thresholds are exactly the destructive
    stages' (plans/curation.py), each computed INDEPENDENTLY on the
    raw corpus — the counterfactual "would have reclaimed", not the
    sequential funnel delta (which the funnel already reports).

    Plan: every per-stage set rides machinery that is already
    pair- or duplication-bounded (window-min keep-first, CC over
    LSH-capped pair lists, _span_cuts, chunk-hash heavy sets). The
    ONLY new shuffle is the (doc_id, pos) min-ord groupBy, whose
    cardinality is the union of CUT positions — duplicated-mass
    grain, not corpus grain — plus a doc-grain rollup for whole-doc
    residuals; dropped-doc tokens are counted arithmetically
    (n_toks - n_cut_positions), never exploded. See SCALE.md.

    The text is read and hashed ONCE: a single combined pass computes
    every per-doc derived value the seven branches need (md5 token
    hashes — shared by the SPAN and PARAGRAPH grains, whose shingle
    hashes are pure arithmetic over them; line-chunk fingerprints;
    the exact-dedup norm hash; the quality score; n_toks) into one
    localCheckpoint'd frame of hashes and small ints (never raw
    text). The r12 formulation ran six independent text passes, each
    re-tokenizing and re-md5ing the corpus — at any scale the guide's
    "compute the heavy proxy once, derive everything from it" case
    (a 100 TB deployment checkpoints this feature table to DFS; plan
    shape identical). The containment and doc-near-dup branches keep
    riding the materialized signature index as before."""
    from pyspark.sql.window import Window

    from goe_spark.operators import minhash as MH
    from goe_spark.queries.profiling import _synth_url_exprs
    from goe_spark.queries.training import _cc_labels

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    docs = spread(d, "doc_id")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")

    # ONE combined text pass -> checkpointed per-doc feature frame.
    n_chunks = F.ceil(F.size(F.col("toks")) / LINE_WORDS).cast("int")
    base = docs.select(
        "doc_id",
        "lang",
        "source",
        toks.alias("toks"),
        hash64(norm).alias("norm_fp"),
        T.quality_score("text").alias("quality"),
    )
    ck = base.select(
        "doc_id",
        "lang",
        "source",
        "norm_fp",
        "quality",
        F.size("toks").alias("n_toks"),
        MH.token_hashes(F.col("toks")).alias("th"),
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: hash64(
                F.array_join(
                    F.slice(F.col("toks"), i * LINE_WORDS + 1, LINE_WORDS),
                    " ",
                )
            ),
        ).alias("chunk_fps"),
        # LAZY: every consumer lives inside the final action, so the
        # first one materializes the pass there — the r13 eager form
        # paid a separate blocking driver job round first.
    ).localCheckpoint(eager=False)
    ntoks = ck.select("doc_id", "n_toks")

    # The two CC label tables are the audit's only BUILD-TIME Spark
    # work (each runs the LSH pair generation and collects the edge
    # list for the driver union-find); they are independent of each
    # other and of every lazy branch built below, so they run
    # CONCURRENTLY from a driver thread pool (guide §2.6 "overlap
    # independent jobs") while the main thread keeps building the
    # lazy DSL. r13 ran them back to back — two full sequential job
    # chains on an otherwise idle box, and the main reason the audit
    # was FASTER on 8 cores than 32 (nothing overlapped).
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    from goe_spark.operators.paragraph_index import (
        ensure_paragraph_index,
        load_paragraphs_raw,
    )

    def _near_labels() -> DataFrame:
        return _cc_labels(spark, sf_dir)

    def _para_labels() -> DataFrame:
        # RAW index read (no tombstone/override view): this audit's
        # oracle recomputes from text, and the maintained view would
        # silently diverge if evict/upsert state existed for the same
        # sf_dir. The raw base is what the fingerprint-fresh build
        # wrote from the source text — bit-identical to recompute.
        sigs = load_paragraphs_raw(
            spark, ensure_paragraph_index(spark, sf_dir)
        )
        pedges = (
            paragraph_dup_pairs(sigs, PARA_SIM_MIN)
            .select(F.col("pid1").alias("id1"), F.col("pid2").alias("id2"))
            # lazy: _cc_labels' cap probe is the first consumer
            .localCheckpoint(eager=False)
        )
        return _cc_labels(spark, sf_dir, edges=pedges)

    pool = ThreadPoolExecutor(max_workers=4)
    f_near = pool.submit(inheritable_thread_target(spark)(_near_labels))
    f_para = pool.submit(inheritable_thread_target(spark)(_para_labels))

    # -- whole-doc drop sets (stage semantics from plans/curation.py)
    _, canon, _ = _synth_url_exprs()
    url_drop = (
        ck.select("doc_id", "lang", "source")
        .withColumn("keep", F.min("doc_id").over(Window.partitionBy(canon)))
        .where(F.col("doc_id") != F.col("keep"))
        .select("doc_id")
    )
    exact_drop = (
        ck.select("doc_id", "norm_fp")
        .withColumn(
            "keep",
            F.min("doc_id").over(Window.partitionBy("norm_fp")),
        )
        .where(F.col("doc_id") != F.col("keep"))
        .select("doc_id")
    )
    cpairs = shingle_containment_pairs(spark, sf_dir).where(
        F.col("containment") >= CONT_SCRUB_MIN
    )
    cont_drop = cpairs.select(
        F.when(F.col("n_sh1") < F.col("n_sh2"), F.col("id1"))
        .when(F.col("n_sh2") < F.col("n_sh1"), F.col("id2"))
        .otherwise(F.greatest("id1", "id2"))
        .alias("doc_id")
    ).distinct()

    # -- cut-position sets (0-based token positions)
    chunks = ck.select(
        "doc_id",
        F.col("n_toks").alias("nt"),
        F.posexplode_outer("chunk_fps").alias("pos", "fp"),
    ).where(F.col("fp").isNotNull())
    heavy = (
        chunks.groupBy("fp")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") > LINE_SCRUB_DOC_MAX)
        .select("fp")
    )
    line_cut = chunks.join(F.broadcast(heavy), "fp").select(
        "doc_id",
        F.explode(
            F.sequence(
                F.col("pos") * LINE_WORDS,
                F.least(
                    F.col("pos") * LINE_WORDS + LINE_WORDS, F.col("nt")
                )
                - 1,
            )
        ).alias("i"),
    )
    # span cuts from the SHARED token hashes (_span_cuts' exact
    # min_run=1 lineage, minus its private tokenize+md5 pass)
    sh_df = ck.where(F.size("th") >= 3).select(
        "doc_id", MH.arith_shingle_hashes(F.col("th")).alias("sh")
    )
    occ = sh_df.select(
        "doc_id", F.posexplode_outer("sh").alias("pos", "g")
    ).where(F.col("g").isNotNull())
    dup_g = (
        occ.groupBy("g")
        .agg(F.min("doc_id").alias("owner"), F.max("doc_id").alias("mx"))
        .where(F.col("owner") != F.col("mx"))
        .select("g", "owner")
    )
    # distinct: overlapping grams cover the same position repeatedly;
    # _span_cuts deduped via its per-doc collect_set, and the
    # standalone rollup counts ROWS (one per cut position)
    span_cut = (
        occ.join(dup_g, "g")
        .where(F.col("doc_id") != F.col("owner"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + 2)
            ).alias("i"),
        )
        .distinct()
    )

    # paragraph signatures come from the MATERIALIZED paragraph index
    # (read raw, recompute-audit semantics — see _para_labels above);
    # paragraph_dup_pairs references its input 2-3x internally, so
    # recomputing the 128-hash minhash stack from ck's token hashes
    # ran the stack per reference (measured: three ~3 s 68-task
    # stages); the index read is a plan-cached parquet scan instead.
    labels = f_near.result()
    plabels = f_para.result()
    quality = ck.select("doc_id", "quality")
    near_drop = (
        labels.join(quality, labels.node == quality.doc_id)
        .select("label", "doc_id", "quality")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("label").orderBy(
                    F.col("quality").desc(), F.col("doc_id").asc()
                )
            ),
        )
        .where(F.col("rn") > 1)
        .select("doc_id")
    )
    para_cut = (
        plabels.where(F.col("node") != F.col("label"))
        .select(
            F.expr(f"node div {PARA_KEY_BASE}").cast("long").alias("doc_id"),
            F.pmod(F.col("node"), F.lit(PARA_KEY_BASE))
            .cast("int")
            .alias("idx"),
        )
        .join(ntoks, "doc_id")
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.col("idx") * PARA_WORDS,
                    F.least(
                        F.col("idx") * PARA_WORDS + PARA_WORDS,
                        F.col("n_toks"),
                    )
                    - 1,
                )
            ).alias("i"),
        )
    )
    def _tag_doc(df: DataFrame, ord_: int) -> DataFrame:
        return df.select("doc_id", F.lit(ord_).alias("ord"))

    def _tag_pos(df: DataFrame, ord_: int) -> DataFrame:
        return df.select("doc_id", "i", F.lit(ord_).alias("ord"))

    # Lazy checkpoints: `drops` is consumed twice (drop_min and the
    # standalone rollup) and `cuts` three times (pos_min feeds two
    # consumers, plus the standalone rollup). Exchange reuse alone
    # does NOT cover the post-exchange machinery, so without the
    # barriers the containment verify (~1M array_intersect pairs, the
    # most expensive stage of the whole audit) and the line/para/span
    # cut branches re-ran once per consumer (measured: the verify
    # stage at 41 s CPU ≈ 2x its standalone cost; three 68-task
    # span-join stages). Both frames are duplicated-mass grain —
    # doc-ids and cut positions, a few MB — never corpus grain.
    #
    # The checkpoint CALL itself compiles the frame's full plan on
    # the driver (measured 3.5 s for drops — it embeds the whole
    # containment lineage — and 1.7 s for cuts); the two compiles are
    # independent, so they run concurrently on the pool instead of
    # back to back on the main thread.
    drops_u = (
        _tag_doc(url_drop, 1)
        .unionAll(_tag_doc(exact_drop, 3))
        .unionAll(_tag_doc(near_drop, 4))
        .unionAll(_tag_doc(cont_drop, 7))
    )
    cuts_u = (
        _tag_pos(line_cut, 2)
        .unionAll(_tag_pos(para_cut, 5))
        .unionAll(_tag_pos(span_cut, 6))
    )
    f_drops = pool.submit(
        inheritable_thread_target(spark)(
            lambda: drops_u.localCheckpoint(eager=False)
        )
    )
    f_cuts = pool.submit(
        inheritable_thread_target(spark)(
            lambda: cuts_u.localCheckpoint(eager=False)
        )
    )
    drops = f_drops.result()
    cuts = f_cuts.result()
    pool.shutdown(wait=False)
    drop_min = drops.groupBy("doc_id").agg(F.min("ord").alias("drop_ord"))
    pos_min = cuts.groupBy("doc_id", "i").agg(
        F.min("ord").alias("scrub_ord")
    )
    pos_win = pos_min.join(drop_min, "doc_id", "left").select(
        F.least(
            F.col("scrub_ord"), F.coalesce("drop_ord", F.lit(99))
        ).alias("win"),
        F.lit(1).cast("long").alias("toks"),
    )
    cut_per_doc = pos_min.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_cutpos")
    )
    resid = (
        drop_min.join(ntoks, "doc_id")
        .join(cut_per_doc, "doc_id", "left")
        .select(
            F.col("drop_ord").alias("win"),
            (
                F.col("n_toks") - F.coalesce("n_cutpos", F.lit(0))
            )
            .cast("long")
            .alias("toks"),
        )
    )
    uniq = (
        pos_win.unionAll(resid)
        .groupBy("win")
        .agg(F.sum("toks").alias("tokens_unique"))
    )
    sd = (
        drops.join(ntoks, "doc_id")
        .groupBy("ord")
        .agg(
            F.count(F.lit(1)).alias("docs_standalone"),
            F.sum("n_toks").alias("tokens_standalone"),
        )
    )
    ss = cuts.groupBy("ord").agg(
        F.count_distinct("doc_id").alias("docs_standalone"),
        F.count(F.lit(1)).alias("tokens_standalone"),
    )
    stage_dim = spark.createDataFrame(
        [(o, n) for n, o in DEDUP_STAGE_ORDER], "stage_ord int, stage string"
    )
    stand = sd.unionAll(ss)
    return (
        stage_dim.join(stand, stage_dim.stage_ord == stand.ord, "left")
        .join(uniq, stage_dim.stage_ord == uniq.win, "left")
        .select(
            "stage_ord",
            "stage",
            F.coalesce("docs_standalone", F.lit(0))
            .cast("long")
            .alias("docs_standalone"),
            F.coalesce("tokens_standalone", F.lit(0))
            .cast("long")
            .alias("tokens_standalone"),
            F.coalesce("tokens_unique", F.lit(0))
            .cast("long")
            .alias("tokens_unique"),
            (
                F.coalesce("tokens_standalone", F.lit(0))
                - F.coalesce("tokens_unique", F.lit(0))
            )
            .cast("long")
            .alias("tokens_overlap"),
        )
    )


def _stage_overlap_sql() -> str:
    from goe_spark.functions.text import quality_score_sql
    from goe_spark.operators import minhash as MH
    from goe_spark.queries.profiling import _synth_url_sql

    url_rel = _synth_url_sql()
    toks = r"regexp_split_to_array(trim(text), '\s+')"
    line = (
        f"array_to_string(toks[(i * {LINE_WORDS} + 1):"
        f"((i + 1) * {LINE_WORDS})], ' ')"
    )
    norm = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
    agree = MH.minhash_agreement_sql("s1.mh", "s2.mh")
    stage_vals = ", ".join(
        f"({o}, '{n}')" for n, o in DEDUP_STAGE_ORDER
    )
    return f"""
WITH RECURSIVE docs0 AS (
  SELECT doc_id, len({toks}) AS n_toks FROM documents
), urld AS (
  SELECT doc_id FROM (
    SELECT doc_id, min(doc_id) OVER (PARTITION BY url) AS keep
    FROM ({url_rel})
  ) WHERE doc_id <> keep
), exd AS (
  SELECT doc_id FROM (
    SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS keep
    FROM (SELECT doc_id, {hash64_sql(norm)} AS fp FROM documents)
  ) WHERE doc_id <> keep
), lsh_pairs AS (
  SELECT id1, id2 FROM ({_minhash_lsh_sql()})
), nedges AS (
  SELECT id1 AS src, id2 AS dst FROM lsh_pairs
  UNION ALL
  SELECT id2, id1 FROM lsh_pairs
), nreach(node, anc) AS (
  SELECT DISTINCT src, src FROM nedges
  UNION
  SELECT e.dst, r.anc FROM nreach r JOIN nedges e ON e.src = r.node
), nlabels AS (
  SELECT node, min(anc) AS label FROM nreach GROUP BY node
), nranked AS (
  SELECT l.label, d.doc_id,
         row_number() OVER (
           PARTITION BY l.label
           ORDER BY {quality_score_sql('d.text')} DESC, d.doc_id ASC
         ) AS rn
  FROM nlabels l JOIN documents d ON d.doc_id = l.node
), neard AS (
  SELECT doc_id FROM nranked WHERE rn > 1
), contd AS (
  SELECT DISTINCT CASE WHEN n_sh1 < n_sh2 THEN id1
                       WHEN n_sh2 < n_sh1 THEN id2
                       ELSE greatest(id1, id2) END AS doc_id
  FROM ({_containment_sql()}) WHERE containment >= {CONT_SCRUB_MIN}
), lchunks AS (
  SELECT doc_id, len(toks) AS nt, cast(i AS int) AS pos,
         {hash64_sql(line)} AS fp
  FROM (SELECT doc_id, {toks} AS toks FROM documents),
       LATERAL unnest(
         range(0, cast(ceil(len(toks) / {LINE_WORDS}.0) AS bigint))
       ) AS r(i)
), lheavy AS (
  SELECT fp FROM lchunks GROUP BY fp
  HAVING count(DISTINCT doc_id) > {LINE_SCRUB_DOC_MAX}
), lpos AS (
  SELECT c.doc_id, cast(p AS int) AS i
  FROM lchunks c JOIN lheavy USING (fp),
       LATERAL unnest(range(pos * {LINE_WORDS},
                            least(pos * {LINE_WORDS} + {LINE_WORDS},
                                  nt))) AS u(p)
), {_paragraph_sig_ctes_sql()}, bands AS ({MH.band_rows_sql("mh")}),
ok_buckets AS (
  SELECT band, sig FROM bands GROUP BY 1, 2
  HAVING count(*) <= {LSH_BUCKET_CAP}
), pcands AS (
  SELECT DISTINCT a.doc_id AS pid1, b.doc_id AS pid2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  JOIN ok_buckets ok ON ok.band = a.band AND ok.sig = a.sig
  WHERE a.doc_id // {PARA_KEY_BASE} <> b.doc_id // {PARA_KEY_BASE}
), ppairs AS (
  SELECT pid1, pid2
  FROM pcands
  JOIN sigs s1 ON s1.doc_id = pid1
  JOIN sigs s2 ON s2.doc_id = pid2
  WHERE {agree} >= {PARA_SIM_MIN}
), pedges AS (
  SELECT pid1 AS src, pid2 AS dst FROM ppairs
  UNION ALL
  SELECT pid2, pid1 FROM ppairs
), preach(node, anc) AS (
  SELECT DISTINCT src, src FROM pedges
  UNION
  SELECT e.dst, r.anc FROM preach r JOIN pedges e ON e.src = r.node
), plabels AS (
  SELECT node, min(anc) AS label FROM preach GROUP BY node
), ppos AS (
  SELECT p.doc_id, cast(u.q AS int) AS i
  FROM (SELECT node // {PARA_KEY_BASE} AS doc_id,
               cast(node % {PARA_KEY_BASE} AS int) AS idx
        FROM plabels WHERE node <> label) p
  JOIN docs0 d USING (doc_id),
       LATERAL unnest(range(idx * {PARA_WORDS},
                            least(idx * {PARA_WORDS} + {PARA_WORDS},
                                  d.n_toks))) AS u(q)
), sth AS (
  SELECT doc_id, {MH.token_hashes_sql('toks')} AS th
  FROM (SELECT doc_id, {toks} AS toks FROM documents)
  WHERE len(toks) >= 3
), sshd AS (
  SELECT doc_id, {MH.arith_shingle_hashes_sql('th')} AS sh FROM sth
), socc AS (
  SELECT doc_id, unnest(sh) AS g,
         generate_subscripts(sh, 1) - 1 AS pos
  FROM sshd
), sgs AS (
  SELECT g, min(doc_id) AS owner
  FROM socc GROUP BY g HAVING min(doc_id) <> max(doc_id)
), spos AS (
  SELECT DISTINCT o.doc_id, i FROM (
    SELECT o.doc_id, unnest([o.pos, o.pos + 1, o.pos + 2]) AS i
    FROM socc o JOIN sgs ON sgs.g = o.g
    WHERE o.doc_id <> sgs.owner
  ) o
), drops AS (
  SELECT doc_id, 1 AS ord FROM urld
  UNION ALL SELECT doc_id, 3 FROM exd
  UNION ALL SELECT doc_id, 4 FROM neard
  UNION ALL SELECT doc_id, 7 FROM contd
), dropmin AS (
  SELECT doc_id, min(ord) AS drop_ord FROM drops GROUP BY doc_id
), cuts AS (
  SELECT doc_id, i, 2 AS ord FROM lpos
  UNION ALL SELECT doc_id, i, 5 FROM ppos
  UNION ALL SELECT doc_id, i, 6 FROM spos
), posmin AS (
  SELECT doc_id, i, min(ord) AS scrub_ord FROM cuts GROUP BY doc_id, i
), poswin AS (
  SELECT least(p.scrub_ord, coalesce(dm.drop_ord, 99)) AS win,
         cast(1 AS bigint) AS toks
  FROM posmin p LEFT JOIN dropmin dm USING (doc_id)
), cutperdoc AS (
  SELECT doc_id, count(*) AS n_cutpos FROM posmin GROUP BY doc_id
), resid AS (
  SELECT dm.drop_ord AS win,
         cast(d.n_toks - coalesce(c.n_cutpos, 0) AS bigint) AS toks
  FROM dropmin dm JOIN docs0 d USING (doc_id)
  LEFT JOIN cutperdoc c USING (doc_id)
), uniq AS (
  SELECT win AS ord, cast(sum(toks) AS bigint) AS tokens_unique
  FROM (SELECT win, toks FROM poswin
        UNION ALL SELECT win, toks FROM resid)
  GROUP BY win
), sd AS (
  SELECT ord, count(*) AS docs_standalone,
         cast(sum(n_toks) AS bigint) AS tokens_standalone
  FROM drops JOIN docs0 USING (doc_id) GROUP BY ord
), ss AS (
  SELECT ord, count(DISTINCT doc_id) AS docs_standalone,
         count(*) AS tokens_standalone
  FROM cuts GROUP BY ord
), stand AS (
  SELECT * FROM sd UNION ALL SELECT * FROM ss
), stages(stage_ord, stage) AS (
  VALUES {stage_vals}
)
SELECT s.stage_ord, s.stage,
       cast(coalesce(st.docs_standalone, 0) AS bigint)
         AS docs_standalone,
       cast(coalesce(st.tokens_standalone, 0) AS bigint)
         AS tokens_standalone,
       cast(coalesce(u.tokens_unique, 0) AS bigint) AS tokens_unique,
       cast(coalesce(st.tokens_standalone, 0)
            - coalesce(u.tokens_unique, 0) AS bigint) AS tokens_overlap
FROM stages s
LEFT JOIN stand st ON st.ord = s.stage_ord
LEFT JOIN uniq u ON u.ord = s.stage_ord
"""


QUERIES = [
    QuerySpec("dedup_exact_keep_first", dedup_exact_keep_first, DEDUP_EXACT_SQL),
    QuerySpec(
        "paragraph_dedup_stats",
        paragraph_dedup_stats,
        _paragraph_dedup_sql(),
        "sub-document MinHash dedup with doc reconstruction accounting",
    ),
    QuerySpec(
        "paragraph_probe_new_docs",
        paragraph_probe_new_docs,
        _paragraph_probe_sql(),
        "incremental paragraph probe vs the materialized index",
    ),
    QuerySpec("ngram_jaccard_pairs", ngram_jaccard_pairs, NGRAM_JACCARD_SQL),
    QuerySpec("minhash_lsh_pairs", minhash_lsh_pairs, _minhash_lsh_sql()),
    QuerySpec(
        "lsh_param_sweep",
        lsh_param_sweep,
        _lsh_sweep_sql(),
        "LSH (bands x rows) tuning table: candidates, precision, "
        "recall and mean agreement per layout",
    ),
    QuerySpec(
        "dedup_threshold_sensitivity",
        dedup_threshold_sensitivity,
        _dedup_sensitivity_sql(),
        "near-dup cutoff sensitivity: pairs, losers and token mass "
        "at risk per est-Jaccard threshold",
    ),
    QuerySpec("simhash_pairs", simhash_pairs, _simhash_sql()),
    QuerySpec(
        "cross_doc_ngram_coverage",
        cross_doc_ngram_coverage,
        CROSS_DOC_NGRAM_SQL,
    ),
    QuerySpec(
        "span_scrub_stats",
        span_scrub_stats,
        _span_scrub_sql(),
        "cross-doc duplicated-span removal accounting (aggressive, "
        "every duplicated position)",
    ),
    QuerySpec(
        "span_scrub_thresholded_stats",
        span_scrub_thresholded_stats,
        _span_scrub_sql(min_run=SPAN_AUDIT_MIN_RUN),
        "span removal accounting at the Lee-et-al. minimum-run "
        f"threshold (runs >= {SPAN_AUDIT_MIN_RUN} only)",
    ),
    QuerySpec(
        "dedup_stage_overlap",
        dedup_stage_overlap,
        _stage_overlap_sql(),
        "budget-allocation report: per dedup stage, standalone vs "
        "unique token reclaim (min-stage-ord attribution)",
    ),
    QuerySpec(
        "corpus_novelty_curve",
        corpus_novelty_curve,
        _novelty_curve_sql(),
        "first-seen shingle novelty per crawl-order decile",
    ),
    QuerySpec(
        "span_run_stats",
        span_run_stats,
        _span_run_sql(),
        "duplicated-run length distribution (min-span threshold pick)",
    ),
    QuerySpec(
        "top_duplicate_ngrams", top_duplicate_ngrams, TOP_DUP_NGRAMS_SQL
    ),
    QuerySpec(
        "minhash_probe_new_docs", minhash_probe_new_docs, _minhash_probe_sql()
    ),
    QuerySpec(
        "split_leakage_audit", split_leakage_audit, _split_leakage_sql()
    ),
    QuerySpec(
        "line_dedup_stats",
        line_dedup_stats,
        _line_dedup_sql(),
        "C4-style line-level boilerplate dedup accounting per source",
    ),
    QuerySpec(
        "cross_lang_shingle_leakage",
        cross_lang_shingle_leakage,
        _cross_lang_sql(),
        "shingles shared across languages (lang-ID/translation leaks)",
    ),
    QuerySpec(
        "minhash_calibration_bins",
        minhash_calibration_bins,
        _minhash_calibration_sql(),
        "MinHash estimate + band S-curve vs exact Jaccard, per decile",
    ),
    QuerySpec(
        "editdist_near_dup_pairs",
        editdist_near_dup_pairs,
        _editdist_sql(),
        "LSH-blocked Levenshtein verification (order-sensitive dedup)",
    ),
    QuerySpec(
        "shingle_containment_pairs",
        shingle_containment_pairs,
        _containment_sql(),
        "rare-shingle-blocked asymmetric containment (partial copies)",
    ),
]
