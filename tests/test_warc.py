"""WARC source: framing law, gzip-member layout, strict rejections."""

from __future__ import annotations

import hashlib

import pytest

from pipeline_etl_ecommerce_spark.sources.warc import (
    WarcError,
    encode_warc_record,
    iter_warc_records,
)


def _mk(j, gz):
    body = bytes(97 + (5 * 43 + j * 17 + i * 7) % 26 for i in range(20 + (5 + j) % 15))
    return body, encode_warc_record(
        f"x-{j}",
        "response" if j % 2 == 0 else "request",
        f"http://example.com/5/{j}",
        body,
        gzip_member=gz,
    )


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_multi_record(gz):
    bodies, recs = zip(*(_mk(j, gz) for j in range(3)))
    out = list(iter_warc_records(b"".join(recs)))
    assert len(out) == 3
    for j, (h, b) in enumerate(out):
        assert b == bodies[j]
        assert h["WARC-Type"] == ("response" if j % 2 == 0 else "request")
        assert h["WARC-Target-URI"] == f"http://example.com/5/{j}"
        assert int(h["Content-Length"]) == len(b)


def test_content_length_is_enforced_not_scanned():
    """A payload that CONTAINS the record separator bytes must not split
    the record early — Content-Length framing is authoritative."""
    body = b"abc\r\n\r\ndef"
    rec = encode_warc_record("z", "response", "u", body)
    ((h, b),) = list(iter_warc_records(rec))
    assert b == body


def test_rejections():
    _, rec = _mk(0, False)
    _, gzrec = _mk(0, True)
    cases = [
        (b"HTTP/1.0\r\n\r\n", "missing WARC version"),
        (b"WARC/0.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n", "unsupported version"),
        (rec[:-2], "payload crosses stream end"),
        (b"WARC/1.0\r\nWARC-Type: x\r\n\r\n\r\n\r\n", "missing Content-Length"),
        (b"WARC/1.0\r\nContent-Length: -1\r\n\r\n\r\n\r\n", "negative"),
        (b"WARC/1.0\r\nContent-Length: x\r\n\r\n\r\n\r\n", "non-integer"),
        (b"WARC/1.0\r\nbadline\r\nContent-Length: 0\r\n\r\n\r\n\r\n", "malformed header"),
        (gzrec[:-8], "truncated gzip"),
        (gzrec + b"JUNK", "trailing bytes"),
    ]
    for payload, why in cases:
        with pytest.raises(WarcError):
            list(iter_warc_records(payload))


def test_separator_must_follow_payload():
    rec = bytearray(_mk(1, False)[1])
    rec[-1] = ord("X")  # corrupt the final CRLF
    with pytest.raises(WarcError, match="separator|crosses"):
        list(iter_warc_records(bytes(rec)))


def test_parse_warc_streams_dead_letters(spark):
    from pipeline_etl_ecommerce_spark.operators.multimodal import MEDIA_SCHEMA
    from pipeline_etl_ecommerce_spark.sources.warc import parse_warc_streams

    good = _mk(0, True)[1]
    rows = [(1, "application/warc", good), (2, "application/warc", b"NOTAWARC")]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in parse_warc_streams(media).collect()}
    assert out[1]["parse_status"] == "ok" and out[1]["compressed"] == 1
    assert out[1]["payload_hash"] == hashlib.md5(_mk(0, True)[0]).hexdigest()
    assert out[2]["parse_status"].startswith("error") and out[2]["payload_hash"] is None
