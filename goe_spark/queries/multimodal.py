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


QUERIES = [
    QuerySpec("media_decode_features", media_decode_features, MEDIA_FEATURES_SQL),
    QuerySpec("media_resize_images", media_resize_images, MEDIA_RESIZE_SQL),
    QuerySpec("media_frame_sample", media_frame_sample, MEDIA_FRAMES_SQL),
]
