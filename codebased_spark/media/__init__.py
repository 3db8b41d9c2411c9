"""Multimodal (image/audio/video) column handling."""

from codebased_spark.media.decode import (  # noqa: F401
    MEDIA_SCHEMA,
    media_from_documents,
    media_metadata,
    synthetic_real_media,
)
from codebased_spark.media.headers import (  # noqa: F401
    parse_jpeg,
    parse_mp4,
    parse_png,
    parse_wav,
    sniff_media_format,
)
