"""Baseline JPEG codec: exact round-trip error bounds (the decoded raster
is deterministic pure-Python IEEE arithmetic), structural rejection of the
unsupported modes, and fuzz totality — the same battery as the PNG codec."""

from __future__ import annotations

import struct as _struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pipeline_etl_ecommerce_spark.operators.imagecodec import DecodeError
from pipeline_etl_ecommerce_spark.operators.jpegcodec import (
    _AC_CHROMA_BITS,
    _AC_CHROMA_VALS,
    _AC_LUMA_BITS,
    _AC_LUMA_VALS,
    _DC_CHROMA_BITS,
    _DC_CHROMA_VALS,
    _DC_LUMA_BITS,
    _DC_LUMA_VALS,
    _build_codes,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_gray,
)
from pipeline_etl_ecommerce_spark.operators.multimodal import (
    JPEG_MAX_ABS_PIXEL_ERR,
    synth_raster_smooth,
)


def _noisy(w: int, h: int, seed: int) -> bytes:
    return bytes((seed * 31 + i * 7) % 256 for i in range(w * h * 3))


def test_annex_k_tables_are_wellformed():
    for bits, vals in (
        (_DC_LUMA_BITS, _DC_LUMA_VALS),
        (_DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (_AC_LUMA_BITS, _AC_LUMA_VALS),
        (_AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        assert sum(bits) == len(vals)
        codes = _build_codes(bits, vals)  # raises if the code space overflows
        # prefix-free: canonical construction guarantees it; spot-check no
        # code is a prefix of a longer one
        by_len = sorted(codes.values(), key=lambda cl: cl[1])
        for i, (c1, l1) in enumerate(by_len):
            for c2, l2 in by_len[i + 1 :]:
                if l2 > l1:
                    assert (c2 >> (l2 - l1)) != c1
    assert len(_AC_LUMA_VALS) == len(_AC_CHROMA_VALS) == 162


@pytest.mark.parametrize("media_id", [0, 1, 2, 3, 7, 12, 44])
def test_smooth_roundtrip_within_band(media_id):
    w, h, raster = synth_raster_smooth(media_id)
    sub = "4:4:4" if media_id % 2 == 0 else "4:2:0"
    st_ = decode_jpeg(encode_jpeg(w, h, raster, subsampling=sub))
    assert (st_["width"], st_["height"], st_["channels"]) == (w, h, 3)
    assert st_["subsampling"] == sub
    worst = max(abs(a - b) for a, b in zip(st_["raster"], raster))
    assert worst <= JPEG_MAX_ABS_PIXEL_ERR


def test_noisy_roundtrip_444_bounded():
    """Modular-noise raster (every frequency present): all-ones quant keeps
    per-pixel error within a few units at 4:4:4."""
    for seed in (3, 7, 10):
        w, h = 16 + seed % 9, 16 + seed % 5
        raster = _noisy(w, h, seed)
        st_ = decode_jpeg(encode_jpeg(w, h, raster))
        assert max(abs(a - b) for a, b in zip(st_["raster"], raster)) <= 6


def test_coarse_quant_still_decodes():
    """A non-trivial quant table (the lossy regime) decodes fine; error is
    bounded by the quantizer magnitude, not correctness."""
    w, h, raster = synth_raster_smooth(5)
    q = [16] * 64
    st_ = decode_jpeg(encode_jpeg(w, h, raster, quant_luma=q, quant_chroma=q))
    assert (st_["width"], st_["height"]) == (w, h)
    # DC quantized by 16 -> worst-case block offset 8; stay generous
    assert max(abs(a - b) for a, b in zip(st_["raster"], raster)) <= 24


def test_grayscale_single_component():
    w, h = 17, 9  # partial blocks both ways
    gray = bytes((x * 5 + y * 3) % 200 for y in range(h) for x in range(w))
    st_ = decode_jpeg(encode_jpeg_gray(w, h, gray))
    assert (st_["width"], st_["height"], st_["channels"]) == (w, h, 1)
    got = st_["raster"]
    worst = max(abs(got[3 * i] - gray[i]) for i in range(w * h))
    assert worst <= 2
    assert got[0::3] == got[1::3] == got[2::3]  # replicated channels


def test_baseline_relabeled_as_progressive_is_malformed():
    # progressive is IMPLEMENTED since r8 — a baseline stream relabeled
    # SOF2 is now a MALFORMED progressive file (its single Ss=0..Se=63
    # scan illegally mixes DC and AC), not a format gap
    w, h, raster = synth_raster_smooth(2)
    good = encode_jpeg(w, h, raster)
    sof_at = good.find(b"\xff\xc0")
    progressive = good[:sof_at] + b"\xff\xc2" + good[sof_at + 2 :]
    with pytest.raises(DecodeError, match="mixes DC and AC"):
        decode_jpeg(progressive)


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("ri", [1, 2, 5])
def test_restart_interval_roundtrip(sub, ri):
    """DRI/RSTn: byte-aligned restarts with predictor resets decode to the
    same band as the unrestarted stream; RST markers actually appear."""
    media_id = 8
    w, h, raster = synth_raster_smooth(media_id)
    jp = encode_jpeg(w, h, raster, subsampling=sub, restart_interval=ri)
    assert b"\xff\xdd" in jp  # DRI present
    mcu = 16 if sub == "4:2:0" else 8
    n_mcus = -(-w // mcu) * -(-h // mcu)
    if n_mcus > ri:  # restarts only occur between intervals
        assert any(bytes([0xFF, 0xD0 + m]) in jp for m in range(8))
    st_ = decode_jpeg(jp)
    assert (st_["width"], st_["height"], st_["subsampling"]) == (w, h, sub)
    worst = max(abs(a - b) for a, b in zip(st_["raster"], raster))
    assert worst <= JPEG_MAX_ABS_PIXEL_ERR


def test_missing_restart_marker_rejected():
    """A DRI announcement with no actual RST markers in the scan must fail
    loudly, not silently misparse coefficient bits as a marker."""
    w, h, raster = synth_raster_smooth(2)
    good = encode_jpeg(w, h, raster)  # no restarts in the scan
    sof_at = good.find(b"\xff\xc0")
    lying_dri = good[:sof_at] + b"\xff\xdd\x00\x04\x00\x01" + good[sof_at:]
    with pytest.raises(DecodeError):
        decode_jpeg(lying_dri)


def test_out_of_sequence_restart_rejected():
    w, h, raster = synth_raster_smooth(8)
    jp = bytearray(encode_jpeg(w, h, raster, restart_interval=1))
    first_rst = jp.find(bytes([0xFF, 0xD0]))
    assert first_rst > 0
    jp[first_rst + 1] = 0xD5  # wrong sequence number
    with pytest.raises(DecodeError):
        decode_jpeg(bytes(jp))


def test_truncation_and_garbage_rejected():
    w, h, raster = synth_raster_smooth(4)
    good = encode_jpeg(w, h, raster)
    with pytest.raises(DecodeError):
        decode_jpeg(good[: len(good) // 2])
    with pytest.raises(DecodeError):
        decode_jpeg(b"\xff\xd8\xff\xe0jpeg")
    with pytest.raises(DecodeError):
        decode_jpeg(b"notajpeg")


@settings(max_examples=300, deadline=None)
@given(data=st.binary(min_size=0, max_size=300))
def test_never_crashes_on_arbitrary_bytes(data):
    try:
        decode_jpeg(b"\xff\xd8" + data)
    except (DecodeError, NotImplementedError):
        pass


@settings(max_examples=200, deadline=None)
@given(pos=st.integers(0, 10_000), val=st.integers(0, 255))
def test_single_byte_mutation_never_crashes(pos, val):
    w, h, raster = synth_raster_smooth(6)
    good = bytearray(encode_jpeg(w, h, raster, subsampling="4:2:0"))
    good[pos % len(good)] = val
    try:
        decode_jpeg(bytes(good))
    except (DecodeError, NotImplementedError):
        pass


def test_resize_dispatch_roundtrip():
    from pipeline_etl_ecommerce_spark.operators.multimodal import _resize_payload

    w, h, raster = synth_raster_smooth(3)
    resized = _resize_payload(encode_jpeg(w, h, raster), 8, 6)
    st_ = decode_jpeg(resized)
    assert (st_["width"], st_["height"]) == (8, 6)


def test_422_subsampling_roundtrip_in_band():
    """4:2:2 (h2v1): 16x8 MCUs, horizontally averaged chroma — decoded
    pixels stay inside the same fidelity band as 4:4:4/4:2:0, the header
    reports the layout, and DRI restart markers compose with it."""
    from pipeline_etl_ecommerce_spark.operators.multimodal import (
        JPEG_MAX_ABS_PIXEL_ERR,
        synth_raster_smooth,
    )

    for mid in (2, 5, 8, 11):
        w, h, r = synth_raster_smooth(mid)
        for dri in (0, 2):
            st = decode_jpeg(encode_jpeg(w, h, r, subsampling="4:2:2", restart_interval=dri))
            assert st["subsampling"] == "4:2:2"
            assert (st["width"], st["height"]) == (w, h)
            assert max(abs(a - b) for a, b in zip(st["raster"], r)) <= JPEG_MAX_ABS_PIXEL_ERR
    with pytest.raises(ValueError):
        encode_jpeg(8, 8, bytes(192), subsampling="4:1:1")


# ---------------------------------------------------------------------------
# Progressive (SOF2) — r8
# ---------------------------------------------------------------------------

from pipeline_etl_ecommerce_spark.operators.jpegcodec import (  # noqa: E402
    encode_jpeg_progressive,
)


class TestProgressive:
    @pytest.mark.parametrize("sub", ["4:4:4", "4:2:0", "4:2:2"])
    def test_bit_identical_to_baseline(self, sub):
        # same planes + quant pipeline => a progressive round-trip must land
        # on the EXACT raster of the baseline round-trip
        for mid in (0, 1, 2, 7, 11):
            w, h, r = synth_raster_smooth(mid)
            base = decode_jpeg(encode_jpeg(w, h, r, subsampling=sub))
            prog = decode_jpeg(encode_jpeg_progressive(w, h, r, subsampling=sub))
            assert prog["raster"] == base["raster"]
            assert prog["subsampling"] == base["subsampling"] == sub

    def test_noise_and_flat_rasters(self):
        import random

        rng = random.Random(3)
        for w, h, kind in ((17, 9, "noise"), (8, 8, "flat"), (33, 5, "noise"), (1, 1, "noise")):
            if kind == "noise":
                r = bytes(rng.randrange(256) for _ in range(w * h * 3))
            else:
                r = bytes([200]) * (w * h * 3)
            ql = [rng.randrange(1, 12) for _ in range(64)]
            base = decode_jpeg(encode_jpeg(w, h, r, quant_luma=ql))["raster"]
            prog = decode_jpeg(encode_jpeg_progressive(w, h, r, quant_luma=ql))["raster"]
            assert base == prog

    def test_scan_script_shape(self):
        # 2 DC scans + (first + refine) x 2 bands x 3 components = 14 SOS
        w, h, r = synth_raster_smooth(4)
        payload = encode_jpeg_progressive(w, h, r)
        assert payload.count(b"\xff\xda") >= 14
        assert b"\xff\xc2" in payload and b"\xff\xc0" not in payload

    def test_mixed_dc_ac_scan_rejected(self):
        w, h, r = synth_raster_smooth(2)
        p = bytearray(encode_jpeg_progressive(w, h, r))
        # first SOS: corrupt Se (0 -> 5) so the DC scan claims an AC band
        i = p.index(b"\xff\xda") + 2
        seglen = (p[i] << 8) | p[i + 1]
        p[i + seglen - 2] = 5  # Se byte
        with pytest.raises(DecodeError, match="mixes DC and AC"):
            decode_jpeg(bytes(p))

    def test_truncation_totality(self):
        w, h, r = synth_raster_smooth(6)
        p = encode_jpeg_progressive(w, h, r, subsampling="4:2:0")
        for cut in range(0, len(p), 13):
            try:
                decode_jpeg(p[:cut])
            except (DecodeError, NotImplementedError):
                pass

    @settings(max_examples=120, deadline=None)
    @given(st.integers(0, 2**32 - 1), st.integers(0, 255), st.integers(0, 4000))
    def test_fuzz_mutations(self, seed, val, pos):
        w, h, r = synth_raster_smooth(seed % 30)
        p = bytearray(encode_jpeg_progressive(w, h, r, subsampling="4:2:0" if seed % 2 else "4:4:4"))
        p[pos % len(p)] = val
        try:
            out = decode_jpeg(bytes(p))
            assert len(out["raster"]) == out["width"] * out["height"] * 3
        except (DecodeError, NotImplementedError):
            pass

    def test_lossless_and_arithmetic_still_raise(self):
        w, h, r = synth_raster_smooth(1)
        p = bytearray(encode_jpeg_progressive(w, h, r))
        i = p.index(b"\xff\xc2")
        for m in (0xC3, 0xC9, 0xCB):  # lossless, arithmetic-sequential, arithmetic-lossless
            p2 = bytearray(p)
            p2[i + 1] = m
            with pytest.raises(NotImplementedError):
                decode_jpeg(bytes(p2))


class TestBatchKernelBitIdentity:
    """r9: the numpy-batched DCT kernels must be bit-identical to the scalar
    reference loops they replaced — the scalar _fdct/_idct stay in the module
    as the executable specification of the accumulation order."""

    def test_idct_batch_matches_scalar(self):
        import random

        from pipeline_etl_ecommerce_spark.operators.jpegcodec import (
            _idct,
            _idct_batch,
        )
        import numpy as np

        rng = random.Random(7)
        blocks = [[float(rng.randrange(-1024, 1024)) for _ in range(64)] for _ in range(50)]
        got = _idct_batch(np.asarray(blocks).reshape(-1, 8, 8)).reshape(-1, 64)
        for i, blk in enumerate(blocks):
            exp = _idct(blk)
            assert got[i].tolist() == exp  # exact float equality, no tolerance

    def test_fdct_batch_matches_scalar(self):
        import random

        from pipeline_etl_ecommerce_spark.operators.jpegcodec import (
            _fdct,
            _fdct_batch,
        )
        import numpy as np

        rng = random.Random(11)
        blocks = [[float(rng.randrange(256) - 128) for _ in range(64)] for _ in range(50)]
        got = _fdct_batch(np.asarray(blocks).reshape(-1, 8, 8)).reshape(-1, 64)
        for i, blk in enumerate(blocks):
            exp = _fdct(blk)
            assert got[i].tolist() == exp

    def test_rha_np_matches_scalar(self):
        from pipeline_etl_ecommerce_spark.operators.jpegcodec import (
            _rha_np,
            _round_half_away,
        )
        import numpy as np

        xs = [0.0, 0.5, -0.5, 1.5, -1.5, 2.4999, -2.4999, 127.5, -127.5, 255.49]
        got = _rha_np(np.asarray(xs))
        assert [int(v) for v in got] == [_round_half_away(x) for x in xs]
