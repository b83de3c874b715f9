"""Python UDTFs (table-valued functions, Spark 3.5+/4 API).

The reference has no UDF/UDTF registration surface at all (SURVEY.md
§2 "deliberate absences") — Spark provides one natively, and this
module exercises it end to end: a class-based UDTF registered into the
SQL catalog and invoked with LATERAL, the SQL-native way to express a
one-row-to-many-rows transform.

UDTFs evaluate row-at-a-time in Python, so they are the SLOW path by
this repo's own rules — use them for API parity and for logic that is
genuinely iterative per row. ``sliding_chunks`` below has the same
cost shape as a mapInPandas chunker at the semantic level (output is
~n_tokens/stride rows per doc), and the whole-corpus equivalents
(`doc_chunks`, posexplode) remain the hot-path form.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

#: sliding-window chunking parameters (RAG-style: 32-token windows,
#: 8-token overlap between consecutive windows)
CHUNK_SIZE = 32
CHUNK_STRIDE = 24

_WS = re.compile(r"\s+")


@udtf(returnType="chunk_id int, chunk string, n_tokens int")
class SlidingChunks:
    """Overlapping token-window chunker.

    Window ``i`` covers tokens ``[i*stride, i*stride + size)``; the
    number of windows is ``1 + max(0, ceil((n - size) / stride))`` so
    every token is covered and no window starts past the end.
    Tokenization matches ``functions.tokens`` (trim + split on \\s+),
    keeping UDTF output comparable with the JVM-side token queries.
    """

    def eval(self, text: str | None):  # noqa: D102 — UDTF contract
        if text is None:
            return
        t = text.strip()
        if not t:
            return
        tok = _WS.split(t)
        n = len(tok)
        n_chunks = 1 + max(0, math.ceil((n - CHUNK_SIZE) / CHUNK_STRIDE))
        for cid in range(n_chunks):
            s = cid * CHUNK_STRIDE
            win = tok[s : s + CHUNK_SIZE]
            yield cid, " ".join(win), len(win)


def register_udtfs(spark: SparkSession) -> None:
    """Idempotently register all engine UDTFs into the SQL catalog."""
    spark.udtf.register("sliding_chunks", SlidingChunks)
