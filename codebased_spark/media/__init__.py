"""Multimodal (image/audio/video) column handling."""

from codebased_spark.media.decode import (  # noqa: F401
    MEDIA_SCHEMA,
    media_from_documents,
    media_metadata,
)
