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
from codebased_spark.media.headers import make_jpeg_exif, parse_exif, parse_id3v1  # noqa: F401
from codebased_spark.media.captions import parse_srt  # noqa: F401
