"""Document chunking: split long documents into fixed-size token windows
with a configurable stride (overlap) — the step that turns a raw corpus
into context-length-bounded training sequences.

Pure native expressions: ``split`` tokenizes, ``sequence`` generates the
window starts, ``posexplode`` fans out one row per chunk, ``slice`` +
``array_join`` materialize the chunk text. No shuffles and no Python — at
100 TB this is a map-only stage pipelined into the scan, and the output
row count is bounded by ``ceil(n_tokens / stride)`` per document.

Chunk semantics (deterministic, engine-independent):
- tokens are the single-space split of the text (empty tokens from runs of
  spaces are preserved — both engines agree);
- window starts are 0, stride, 2*stride, ... strictly below n_tokens, so
  the last window may be short but is never empty;
- documents with no tokens produce no chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    chunk_size: int = 64,
    stride: int | None = None,
) -> DataFrame:
    """One output row per (document, window): ``(doc_id, chunk_index,
    chunk_start, chunk_tokens, chunk_text)``. ``stride`` defaults to
    ``chunk_size`` (non-overlapping); ``stride < chunk_size`` overlaps
    consecutive chunks by ``chunk_size - stride`` tokens."""
    if stride is None:
        stride = chunk_size
    if chunk_size <= 0 or stride <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # sequence's end bound is n-1, so every generated start is < n_tokens
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    base = df.select(
        F.col(id_col).alias("doc_id"), toks.alias("_toks"), starts.alias("_starts"), n.alias("_n")
    ).filter(F.col("_n") > 0)
    chunk = F.slice(F.col("_toks"), F.col("chunk_start") + 1, chunk_size)
    return (
        base.select("doc_id", "_toks", F.posexplode(F.col("_starts")).alias("chunk_index", "chunk_start"))
        .select(
            "doc_id",
            F.col("chunk_index").cast("int").alias("chunk_index"),
            F.col("chunk_start").cast("int").alias("chunk_start"),
            F.size(chunk).cast("int").alias("chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )
