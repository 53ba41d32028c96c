"""Multimodal pipeline queries (registry entries + oracles).

The fake decode derives every feature from the payload byte length, so
DuckDB replicates the whole pipeline with octet_length(encode(text)) —
a full value-hash oracle over a mapInPandas operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goe_spark.catalog import load_table
from goe_spark.multimodal import (
    attach_media,
    decode_media_features,
    frame_sample,
    resize_images,
)
from goe_spark.queries import QuerySpec


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attach_media(load_table(spark, sf_dir, "documents"))


_MEDIA_SQL = """
  SELECT doc_id AS media_id,
         ['image','audio','video'][(doc_id % 3) + 1] AS kind,
         octet_length(encode(text)) AS n_bytes
  FROM documents
"""


def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_media_features(_media(spark, sf_dir), fake=True)


MEDIA_FEATURES_SQL = f"""
WITH media AS ({_MEDIA_SQL})
SELECT media_id, kind, n_bytes,
       CASE kind WHEN 'image' THEN cast(32 + n_bytes % 640 AS int)
                 WHEN 'video' THEN cast(32 + n_bytes % 1920 AS int) END AS width,
       CASE kind WHEN 'image' THEN cast(32 + (n_bytes * 7) % 480 AS int)
                 WHEN 'video' THEN cast(32 + (n_bytes * 3) % 1080 AS int) END AS height,
       CASE kind WHEN 'audio' THEN 16000 END AS sample_rate,
       CASE kind WHEN 'audio' THEN cast(100 + n_bytes % 10000 AS int)
                 WHEN 'video' THEN cast(100 + n_bytes % 60000 AS int) END AS duration_ms,
       CASE kind WHEN 'video' THEN cast(1 + n_bytes % 240 AS int) END AS n_frames
FROM media
"""


def media_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_images(_media(spark, sf_dir))


MEDIA_RESIZE_SQL = f"""
WITH media AS ({_MEDIA_SQL})
SELECT media_id,
       cast(224 AS int) AS width,
       cast(224 AS int) AS height,
       least(n_bytes, 224 * 224 * 3) AS n_bytes_out
FROM media WHERE kind = 'image'
"""


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_sample(_media(spark, sf_dir))


MEDIA_FRAMES_SQL = f"""
WITH media AS ({_MEDIA_SQL}),
vids AS (
  SELECT media_id, n_bytes, 1 + n_bytes % 240 AS n_frames,
         greatest(1, n_bytes // (1 + n_bytes % 240)) AS per
  FROM media WHERE kind = 'video'
)
SELECT media_id,
       cast(i AS int) AS frame_idx,
       i * per AS frame_offset_bytes
FROM vids, LATERAL unnest(range(0, n_frames, 30)) AS t(i)
"""


def media_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec-free binary payload audit per media kind — the REAL (not
    stubbed) half of the multimodal surface: magic-byte container
    sniffing, leading-byte class, and hex-nibble Shannon entropy (a
    corruption/compressibility signal), all pure byte arithmetic over
    the opaque content column. On the fixture (UTF-8 text payloads)
    every sniff is 'unknown' and leads are ASCII — the real magic-byte
    paths are pinned by tests/test_multimodal.py on handcrafted
    PNG/JPEG/GIF payloads.

    Plan: single scan, everything codegen (hex/replace/length
    arithmetic); one kind-cardinality aggregate."""
    from goe_spark.multimodal.media import nibble_entropy, sniff_format

    m = _media(spark, sf_dir)
    c = F.col("content")
    per = m.select(
        "kind",
        F.length(c).cast("long").alias("n_bytes"),
        sniff_format(c).alias("fmt"),
        (
            F.conv(F.substring(F.upper(F.hex(c)), 1, 2), 16, 10).cast("long")
            < 128
        ).alias("ascii_lead"),
        F.round(nibble_entropy(c), 6).alias("ent"),
    )
    return per.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum((F.col("fmt") != "unknown").cast("long")).alias("n_detected"),
        F.sum(F.col("ascii_lead").cast("long")).alias("n_ascii_lead"),
        F.round(F.avg("ent"), 4).alias("avg_entropy"),
        F.round(F.min("ent"), 6).alias("min_entropy"),
        F.round(F.max("ent"), 6).alias("max_entropy"),
    )


def _media_payload_sql() -> str:
    from goe_spark.multimodal.media import (
        nibble_entropy_sql,
        sniff_format_sql,
    )

    ent = nibble_entropy_sql("content")
    fmt = sniff_format_sql("content")
    lead = (
        "cast(concat('0x', substr(upper(hex(content)), 1, 2)) AS bigint)"
        " < 128"
    )
    return f"""
WITH media AS (
  SELECT doc_id AS media_id,
         ['image','audio','video'][(doc_id % 3) + 1] AS kind,
         encode(text) AS content
  FROM documents
), per AS (
  SELECT kind,
         octet_length(content) AS n_bytes,
         {fmt} AS fmt,
         {lead} AS ascii_lead,
         round({ent}, 6) AS ent
  FROM media
)
SELECT kind,
       count(*) AS n_media,
       cast(sum(n_bytes) AS bigint) AS total_bytes,
       cast(sum(CASE WHEN fmt <> 'unknown' THEN 1 ELSE 0 END) AS bigint)
         AS n_detected,
       cast(sum(CASE WHEN ascii_lead THEN 1 ELSE 0 END) AS bigint)
         AS n_ascii_lead,
       round(avg(ent), 4) AS avg_entropy,
       round(min(ent), 6) AS min_entropy,
       round(max(ent), 6) AS max_entropy
FROM per GROUP BY kind
"""


def media_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed exact dedup of binary payloads — the first
    pass every multimodal corpus runs (identical bytes are identical
    media; no codec needed). Per kind: distinct payloads, duplicate
    media count, and the bytes a dedup pass reclaims.

    Plan: md5 over the binary column is map-side codegen; ONE
    fingerprint-grain aggregate (the shuffle carries 16-byte hashes +
    a length, never payloads), then a kind-cardinality rollup. At
    100 TB this is exactly how object-store dedup manifests are
    built."""
    m = _media(spark, sf_dir)
    per_fp = (
        m.select(
            "kind",
            F.md5(F.col("content")).alias("fp"),
            F.length("content").cast("long").alias("n_bytes"),
        )
        .groupBy("kind", "fp")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.max("n_bytes").alias("n_bytes"),  # same fp => same bytes
        )
    )
    return per_fp.groupBy("kind").agg(
        F.sum("n_copies").alias("n_media"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("n_copies") - 1).alias("n_dup_media"),
        F.sum((F.col("n_copies") - 1) * F.col("n_bytes")).alias(
            "bytes_reclaimed"
        ),
        F.sum(F.col("n_copies") * F.col("n_bytes")).alias("bytes_total"),
    )


MEDIA_DEDUP_SQL = """
WITH media AS (
  SELECT doc_id AS media_id,
         ['image','audio','video'][(doc_id % 3) + 1] AS kind,
         text,
         encode(text) AS content
  FROM documents
), per_fp AS (
  -- DuckDB's md5() takes VARCHAR; content IS encode(text), so
  -- hashing the text hashes the identical UTF-8 bytes
  SELECT kind, md5(text) AS fp,
         count(*) AS n_copies,
         max(octet_length(content)) AS n_bytes
  FROM media GROUP BY kind, md5(text)
)
SELECT kind,
       cast(sum(n_copies) AS bigint)                  AS n_media,
       count(*)                                       AS n_distinct,
       cast(sum(n_copies - 1) AS bigint)              AS n_dup_media,
       cast(sum((n_copies - 1) * n_bytes) AS bigint)  AS bytes_reclaimed,
       cast(sum(n_copies * n_bytes) AS bigint)        AS bytes_total
FROM per_fp GROUP BY kind
"""


QUERIES = [
    QuerySpec("media_decode_features", media_decode_features, MEDIA_FEATURES_SQL),
    QuerySpec("media_resize_images", media_resize_images, MEDIA_RESIZE_SQL),
    QuerySpec("media_frame_sample", media_frame_sample, MEDIA_FRAMES_SQL),
    QuerySpec(
        "media_payload_stats", media_payload_stats, _media_payload_sql()
    ),
    QuerySpec(
        "media_exact_dedup",
        media_exact_dedup,
        MEDIA_DEDUP_SQL,
        "content-hash exact dedup of binary payloads",
    ),
]
