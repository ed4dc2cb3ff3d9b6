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


# --------------------------------------------------------------------------
# Content-defined chunking (the Rabin rolling-hash scheme storage and
# dataset dedup systems use): a chunk boundary falls wherever the hash of
# the trailing ``window`` characters is divisible by ``divisor``, so
# boundaries RESYNCHRONIZE after an insertion or deletion — two near-
# identical documents share every chunk outside the edited region, which a
# fixed-offset chunker never does (one shifted byte re-offsets every later
# chunk). Chunk-level dedup over the chunk hashes is then an exact
# hash-groupBy, the scale-correct primitive at 100 TB.
#
# Everything is native expressions (transform/filter/aggregate over the
# character positions, posexplode per chunk) — map-only, no Python, no
# shuffle until the cross-corpus dedup aggregate. The rolling hash is an
# EXACT int64 polynomial: sum ascii(c[p-w+1+k]) * B^k for k in 0..w-1 with
# B=31, w=8 — max value ~127 * 31^7 * 8 < 2^45, no modulus needed, so
# DuckDB replays it bit-exactly with the same list pipeline.
# --------------------------------------------------------------------------

CDC_WINDOW = 8
CDC_BASE = 31
CDC_DIVISOR = 64


def cdc_chunks(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """One row per content-defined chunk: ``(doc_id, chunk_index,
    chunk_start, chunk_len, chunk_hash)`` — start is 1-based, hash is the
    md5 of the chunk text. Documents shorter than the hash window are one
    whole-document chunk."""
    w, b, d = CDC_WINDOW, CDC_BASE, CDC_DIVISOR
    # Perf ladder (measured at sf0.1, 2000 docs x ~550 chars, min-of-2
    # warm): the naive per-position inner aggregate() lambda — 8
    # substr+ascii evals under the INTERPRETED HOF evaluator per window
    # position — benched 17.5 s; precomputing the code-point array and
    # unrolling the polynomial into element_at terms took it to 4.9 s; the
    # word_ngrams shifted-slice trick (arrays_zip of the 8 shifted code
    # slices, one flat struct-field sum per position, no random access)
    # landed at 1.4 s. Same lesson as the SimHash/word_ngrams notes: keep
    # per-element lambdas few and flat in the O(n·w) hot path.
    from .importance import _widen

    # O(chars x window) map work: escape the byte-sized-split cliff (the
    # importance._widen lesson — a one-split corpus ran this whole rolling
    # hash on one core; no-op when splits already suffice)
    df = _widen(df)
    shifted = ", ".join(
        f"slice(__codes, {k + 1}, greatest(size(__codes) - {w - 1}, 0))"
        for k in range(w)
    )
    poly = " + ".join(f"CAST(s.`{k}` AS BIGINT) * {b**k}L" for k in range(w))
    cuts = (
        f"transform(filter(transform(arrays_zip({shifted}),"
        f" (s, i) -> named_struct('p', i + {w}, 'h', {poly})),"
        f" x -> x.h % {d} = 0), x -> x.p)"
    )
    ends = (
        f"CASE WHEN size(__cuts) > 0 AND element_at(__cuts, -1) = length(txt)"
        f" THEN __cuts ELSE concat(__cuts, array(length(txt))) END"
    )
    out = (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("txt"))
        .filter(F.length("txt") > 0)
        .withColumn("__codes", F.expr("transform(split(txt, ''), c -> ascii(c))"))
        .withColumn("__cuts", F.expr(cuts))
        .withColumn("__ends", F.expr(ends))
        .drop("__codes")
        .select(
            "doc_id",
            "txt",
            F.posexplode(
                F.expr(
                    "transform(__ends, (e, i) ->"
                    " struct(CASE WHEN i = 0 THEN 1"
                    "             ELSE element_at(__ends, i) + 1 END AS s,"
                    "        e AS e))"
                )
            ).alias("chunk_index", "span"),
        )
        .select(
            "doc_id",
            F.col("chunk_index").cast("long").alias("chunk_index"),
            F.col("span.s").cast("long").alias("chunk_start"),
            (F.col("span.e") - F.col("span.s") + 1).cast("long").alias("chunk_len"),
            F.expr("md5(substr(txt, span.s, CAST(span.e - span.s + 1 AS INT)))").alias(
                "chunk_hash"
            ),
        )
    )
    return out


def cdc_chunk_dedup(chunks: DataFrame) -> DataFrame:
    """Cross-corpus chunk-level dedup over :func:`cdc_chunks` output:
    per distinct chunk hash, the copy count, the canonical (minimum)
    (doc_id, chunk_index) owner, and the bytes a dedup store would save
    (= (copies - 1) * chunk_len). One hash-groupBy — map-side combined,
    the same shape as exact document dedup but at sub-document grain."""
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count("*").cast("long").alias("n_copies"),
            F.min(F.struct("doc_id", "chunk_index")).alias("_owner"),
            F.max("chunk_len").alias("_len"),
        )
        .select(
            "chunk_hash",
            "n_copies",
            F.col("_owner.doc_id").alias("canonical_doc_id"),
            F.col("_owner.chunk_index").cast("long").alias("canonical_chunk_index"),
            ((F.col("n_copies") - 1) * F.col("_len")).cast("long").alias("dedup_savings_bytes"),
        )
    )
