"""Content-defined chunking: boundary law, chunk reassembly, and the
resynchronization property that motivates CDC over fixed-offset splitting."""

from __future__ import annotations

import hashlib

from pipeline_etl_ecommerce_spark.operators.chunking import (
    CDC_BASE,
    CDC_DIVISOR,
    CDC_WINDOW,
    cdc_chunk_dedup,
    cdc_chunks,
)


def _py_cuts(text: str) -> list[int]:
    """Reference implementation of the boundary law (1-based end positions)."""
    n = len(text)
    cuts = []
    for p in range(CDC_WINDOW, n + 1):
        h = sum(
            ord(text[p - CDC_WINDOW + k]) * CDC_BASE**k for k in range(CDC_WINDOW)
        )
        if h % CDC_DIVISOR == 0:
            cuts.append(p)
    if not cuts or cuts[-1] != n:
        cuts.append(n)
    return cuts


def _py_chunks(text: str) -> list[tuple[int, int, str]]:
    out, prev = [], 0
    for e in _py_cuts(text):
        out.append((prev + 1, e - prev, text[prev:e]))
        prev = e
    return out


def _spark_chunks(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {
        (r["doc_id"], r["chunk_index"]): r
        for r in cdc_chunks(df, "text", "doc_id").collect()
    }


def test_chunks_match_reference_and_reassemble(spark):
    texts = [
        (0, "the fast key order sort table scan merge part window small hash " * 3),
        (1, "spark group query row data slow small filter customer line"),
        (2, "ab"),          # shorter than the window -> one whole-doc chunk
        (3, "x" * 200),     # degenerate repetition
    ]
    got = _spark_chunks(spark, texts)
    for doc_id, text in texts:
        expect = _py_chunks(text)
        rows = sorted(
            (k, v) for k, v in got.items() if k[0] == doc_id
        )
        assert len(rows) == len(expect), (doc_id, len(rows), len(expect))
        # chunks tile the document exactly: starts/lens/hashes all agree
        for (key, r), (start, length, chunk) in zip(rows, expect):
            assert r["chunk_start"] == start
            assert r["chunk_len"] == length
            assert r["chunk_hash"] == hashlib.md5(chunk.encode()).hexdigest()
        assert sum(r["chunk_len"] for _k, r in rows) == len(text)


def test_boundaries_resynchronize_after_prefix_edit(spark):
    """THE CDC property: prepending text shifts every byte offset, yet all
    chunks after the first boundary are shared verbatim — a fixed-offset
    splitter shares none of them."""
    body = "the fast key order sort table scan merge part window small hash " * 6
    a = "AAA " + body
    b = "BBBBBBBB " + body
    ca = [r["chunk_hash"] for _k, r in sorted(_spark_chunks(spark, [(0, a)]).items())]
    cb = [r["chunk_hash"] for _k, r in sorted(_spark_chunks(spark, [(1, b)]).items())]
    # after the first boundary whose hash window lies inside the shared
    # body, every later cut falls at the same CONTENT offset in both docs,
    # so the chunk sequences share their entire tail (only the head
    # chunk(s) containing the edit differ)
    common_tail = 0
    while (
        common_tail < min(len(ca), len(cb))
        and ca[-1 - common_tail] == cb[-1 - common_tail]
    ):
        common_tail += 1
    assert common_tail >= len(ca) - 2, (len(ca), len(cb), common_tail)
    assert common_tail >= 2
    # fixed-offset comparison: equal-width slices at the same offsets share
    # nothing once the prefix lengths differ
    fixed_a = {a[i : i + 64] for i in range(0, len(a), 64)}
    fixed_b = {b[i : i + 64] for i in range(0, len(b), 64)}
    assert not (fixed_a & fixed_b)


def test_chunk_dedup_counts_and_canonical_owner(spark):
    body = "the fast key order sort table scan merge part window small hash " * 6
    rows = [(7, "PREFIX " + body), (3, body), (9, body)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    dd = {r["chunk_hash"]: r for r in cdc_chunk_dedup(cdc_chunks(df, "text", "doc_id")).collect()}
    # identical docs 3 and 9 share every chunk; canonical owner is doc 3
    triple = [r for r in dd.values() if r["n_copies"] >= 2]
    assert triple, "expected shared chunks across the duplicated docs"
    for r in triple:
        assert r["canonical_doc_id"] == 3
        assert r["dedup_savings_bytes"] > 0
