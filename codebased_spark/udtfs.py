"""Python UDTFs — the SQL-facing table-function surface (§2.8).

The ENGINE's hot path never runs per-row Python: extraction is codegen
regex or Arrow-batched stages (the §2.8 mapping of the reference's
parser plugins). But an ad-hoc SQL user wants table functions they can
LATERAL-join in a query without knowing the DataFrame API; Spark 4's
arrow-optimized Python UDTFs are that surface. Each UDTF here wraps an
operator the engine already exposes (and oracle-gates) in DataFrame
form — the UDTF is a convenience projection of the same semantics, for
interactive use, NOT the 10^12-row path (the docstring each carries
says which DataFrame op to use at scale).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pair_idx int, question string, answer string")
class QAPairs:
    """LATERAL-joinable Q/A pair extraction — interactive twin of
    textops/qa.py::qa_pairs (use that for corpus-scale runs).

        SELECT d.doc_id, q.* FROM docs d,
               LATERAL qa_pairs(d.text) q
    """

    def eval(self, text: str):  # noqa: D102
        import re

        if text is None:
            return
        from codebased_spark.textops.qa import A_PATTERN, PAIR_PATTERN, Q_PATTERN

        # one match per adjacent Q-then-A span (matches qa_pairs: an
        # unanswered question can never shift later answers)
        for i, m in enumerate(re.finditer(PAIR_PATTERN, text), start=1):
            span = m.group(0)
            yield (i, re.search(Q_PATTERN, span).group(1),
                   re.search(A_PATTERN, span).group(1))


@udtf(returnType="cue_idx bigint, start_ms bigint, end_ms bigint, caption string")
class SrtCues:
    """LATERAL-joinable SRT cue parsing — interactive twin of
    media/captions.py::parse_srt (use that for corpus-scale runs)."""

    _TS = r"(\d{2}):(\d{2}):(\d{2}),(\d{3})"

    def eval(self, srt: str):  # noqa: D102
        import re

        if srt is None:
            return
        pat = re.compile(
            r"^(\d+)\n" + self._TS + r" --> " + self._TS + r"\n(.*)",
            re.S,
        )
        # normalize CRLF/CR and keep every caption line (matches parse_srt)
        for block in re.split(r"\n{2,}", re.sub(r"\r\n?", "\n", srt)):
            m = pat.match(block.strip("\n"))
            if not m:
                continue
            g = [int(x) for x in m.groups()[1:9]]
            start = ((g[0] * 3600 + g[1] * 60 + g[2]) * 1000) + g[3]
            end = ((g[4] * 3600 + g[5] * 60 + g[6]) * 1000) + g[7]
            yield int(m.group(1)), start, end, m.group(10)


def register_udtfs(spark) -> None:
    """Register every table function on the session for SQL use."""
    spark.udtf.register("qa_pairs", QAPairs)
    spark.udtf.register("srt_cues", SrtCues)
