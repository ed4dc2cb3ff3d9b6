"""Python UDTFs (Spark 4 user-defined TABLE functions): the LATERAL-join
shape for one-row-to-many-rows Python logic, registered so SQL users can
call it like a built-in generator (`FROM docs, LATERAL chunk_windows(text)`).

When to reach for a UDTF instead of mapInPandas: the consumer is SQL (the
function composes with LATERAL/joins inside a query, not as a DataFrame
pipeline stage), and the per-row logic is a generator. The execution cost
model is the same caveat as all Python stages — rows cross the JVM/Python
boundary (BatchEvalPythonUDTF) — so the hot 100 TB path should still prefer
native explode/sequence when the logic is expressible; this module exists
for the genuinely-Python tails and the API-surface parity.

The chunker below is the standard overlapping sliding-window used to cut
documents into training/retrieval chunks: window of ``WINDOW`` words every
``STRIDE`` words (50% overlap). The split rule is a plain single-space
split — exactly replayable by the DuckDB oracle (list slicing over
string_split), which is why it avoids regex lookbehind.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

WINDOW = 16
STRIDE = 8


@udtf(returnType="chunk_index int, chunk_text string, n_words int")
class ChunkWindows:
    """Overlapping word-window chunks: chunk ``i`` covers words
    ``[i*STRIDE, i*STRIDE + WINDOW)``; the last chunk may be short; empty
    or NULL text yields no rows."""

    def eval(self, text: str):
        if not text:
            return
        words = text.split(" ")
        n = len(words)
        start = 0
        i = 0
        while start < n:
            chunk = words[start : start + WINDOW]
            yield i, " ".join(chunk), len(chunk)
            i += 1
            start += STRIDE


def register_udtfs(spark: SparkSession) -> None:
    """Idempotent registration of all engine UDTFs on a session."""
    spark.udtf.register("chunk_windows", ChunkWindows)
