from goe_spark.multimodal.media import (
    MEDIA_FEATURE_SCHEMA,
    attach_media,
    decode_media_features,
    frame_sample,
    resize_images,
)

__all__ = [
    "MEDIA_FEATURE_SCHEMA",
    "attach_media",
    "decode_media_features",
    "frame_sample",
    "resize_images",
]
