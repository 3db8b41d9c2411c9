"""SRT subtitle/caption parsing — timed text for audio/video training pairs.

Caption files are the alignment layer of every speech/video-text dataset:
(start_ms, end_ms, caption) cues pair transcript spans with media time
ranges (the work-list mm_frame_sampling fans out over). SRT is the
plain-text interchange format: blank-line-separated blocks of

    <cue index>
    HH:MM:SS,mmm --> HH:MM:SS,mmm
    caption text

Parsing is pure codegen string work: one split per block boundary, one
posexplode, fixed-position regexp_extracts for the timestamp fields, and
integer arithmetic to milliseconds — no Python, no shuffle. Reference
analog: E14 typed extractor families (several grammars over the same
document, SURVEY.md §2.2) — this is the timed-text grammar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TS = r"(\d{2}):(\d{2}):(\d{2}),(\d{3})"
_CUE_TS_RE = _TS + r" --> " + _TS


def _ms(block, base: int):
    """Milliseconds from regex groups base..base+3 of the cue timestamp
    line (base 1 = start, base 5 = end)."""
    g = lambda i: F.regexp_extract(block, _CUE_TS_RE, i).cast("long")  # noqa: E731
    return ((g(base) * 3600 + g(base + 1) * 60 + g(base + 2)) * 1000
            + g(base + 3))


def parse_srt(
    docs: DataFrame,
    id_col: str = "doc_id",
    srt_col: str = "srt",
) -> DataFrame:
    """(id, cue_idx, start_ms, end_ms, dur_ms, caption) per cue. Blocks
    that do not carry a timestamp line are dropped (a resilient parser
    skips malformed cues rather than failing the file). CRLF/CR line
    endings are normalized before splitting, and multi-line captions
    keep every line from the third onward (joined with '\\n') — real SRT
    routinely wraps a cue across two or three lines."""
    block = F.col("block")
    norm = F.regexp_replace(F.col(srt_col), r"\r\n?", "\n")
    cues = docs.select(
        F.col(id_col),
        F.posexplode(F.split(norm, r"\n{2,}")).alias("pos", "block"),
    )
    start = _ms(block, 1)
    end = _ms(block, 5)
    lines = F.split(F.regexp_replace(block, r"^\n+|\n+$", ""), "\n")
    caption = F.array_join(
        F.slice(lines, 3, F.greatest(F.size(lines) - 2, F.lit(0))), "\n"
    )
    return (
        cues.where(block.rlike(_CUE_TS_RE))
        .select(
            id_col,
            F.regexp_extract(block, r"^(\d+)", 1).cast("long").alias("cue_idx"),
            start.alias("start_ms"),
            end.alias("end_ms"),
            (end - start).alias("dur_ms"),
            caption.alias("caption"),
        )
    )
