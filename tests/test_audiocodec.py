"""Unit tests for the dependency-free RIFF/WAVE PCM codec: roundtrip,
chunk-walk robustness (pad bytes, unknown chunks, fixed-offset traps),
channel de-interleaving, and the malformed-payload error contract."""

from __future__ import annotations

import struct

import pytest

from pipeline_etl_ecommerce_spark.operators.audiocodec import (
    DecodeError,
    decode_wav,
    encode_wav,
)


def test_roundtrip_mono():
    samples = [0, 100, -200, 32767, -32768, 5]
    out = decode_wav(encode_wav(8000, 1, samples))
    assert out["sample_rate"] == 8000
    assert out["channels"] == 1
    assert out["bits"] == 16
    assert out["n_frames"] == 6
    assert out["sum_all"] == sum(samples)
    assert out["sum_ch0"] == sum(samples)
    assert out["sum_ch1"] is None
    assert out["peak_abs"] == 32768
    assert out["first_sample"] == 0


def test_roundtrip_stereo_deinterleaves():
    # interleaved L R L R: ch0 = evens, ch1 = odds
    samples = [1, 10, 2, 20, 3, 30]
    out = decode_wav(encode_wav(44100, 2, samples))
    assert out["n_frames"] == 3
    assert out["sum_ch0"] == 6
    assert out["sum_ch1"] == 60
    assert out["sum_all"] == 66


def test_junk_chunk_and_pad_byte_are_skipped():
    # default junk is odd-sized (5 bytes) -> a pad byte precedes fmt; a
    # parser that forgets RIFF word alignment misreads everything after.
    payload = encode_wav(8000, 1, [7, -7], junk=b"xyz")  # odd again
    assert decode_wav(payload)["sum_all"] == 0
    payload = encode_wav(8000, 1, [7, -7], junk=b"even")  # even: no pad
    assert decode_wav(payload)["sum_all"] == 0


def test_fmt_is_not_at_fixed_offset():
    # fmt must be found by chunk id, not position: it sits after JUNK.
    payload = encode_wav(16000, 1, [5])
    assert payload[12:16] == b"JUNK"
    assert decode_wav(payload)["sample_rate"] == 16000


def test_bad_magic_rejected():
    with pytest.raises(DecodeError):
        decode_wav(b"RIFX" + b"\x00" * 40)
    with pytest.raises(DecodeError):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"AVI ")
    with pytest.raises(DecodeError):
        decode_wav(b"")


def test_truncated_chunk_rejected():
    payload = bytearray(encode_wav(8000, 1, [1, 2, 3, 4]))
    # shrink the data chunk body but leave its declared size intact
    with pytest.raises(DecodeError):
        decode_wav(bytes(payload[:-3]))


def test_riff_size_exceeding_payload_rejected():
    payload = bytearray(encode_wav(8000, 1, [1]))
    payload[4:8] = struct.pack("<I", len(payload) + 100)
    with pytest.raises(DecodeError):
        decode_wav(bytes(payload))


def test_chunk_crossing_riff_boundary_rejected():
    # A chunk size that crosses the declared RIFF end must raise, even when
    # appended garbage makes the BUFFER long enough to satisfy the slice —
    # the advisor's probe: inflating the data size over trailing bytes
    # outside the container must not decode "successfully".
    payload = bytearray(encode_wav(8000, 1, [1, 2, 3, 4]))
    i = payload.index(b"data")
    size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
    payload[i + 4 : i + 8] = struct.pack("<I", size + 8)
    payload += b"\x00" * 16  # garbage past the RIFF container
    with pytest.raises(DecodeError):
        decode_wav(bytes(payload))


def test_non_pcm_raises_not_implemented():
    payload = bytearray(encode_wav(8000, 1, [1, 2]))
    i = payload.index(b"fmt ")
    payload[i + 8 : i + 10] = struct.pack("<H", 85)  # MP3 format tag
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(payload))


def test_non_16bit_raises_not_implemented():
    payload = bytearray(encode_wav(8000, 1, [1, 2]))
    i = payload.index(b"fmt ")
    payload[i + 22 : i + 24] = struct.pack("<H", 8)  # bits-per-sample
    # block align (channels*2) now disagrees with 8-bit, but bits gates first
    with pytest.raises((NotImplementedError, DecodeError)):
        decode_wav(bytes(payload))


def test_missing_data_chunk_rejected():
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    with pytest.raises(DecodeError):
        decode_wav(payload)


def test_partial_frame_rejected():
    payload = bytearray(encode_wav(8000, 2, [1, 2, 3, 4]))
    i = payload.index(b"data")
    size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
    payload[i + 4 : i + 8] = struct.pack("<I", size - 2)  # half a stereo frame
    with pytest.raises(DecodeError):
        decode_wav(bytes(payload[:-2]))


def test_encode_validates_inputs():
    with pytest.raises(ValueError):
        encode_wav(8000, 0, [])
    with pytest.raises(ValueError):
        encode_wav(8000, 2, [1, 2, 3])  # not a multiple of channels


# --- hypothesis fuzz: parser totality ---------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    rate=st.integers(min_value=1, max_value=192_000),
    channels=st.integers(min_value=1, max_value=4),
    frames=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=64
    ),
    junk=st.binary(min_size=0, max_size=9),
)
def test_roundtrip_fuzz(rate, channels, frames, junk):
    samples = (frames * channels)[: (len(frames) * channels)]
    out = decode_wav(encode_wav(rate, channels, samples, junk=junk))
    assert out["sample_rate"] == rate
    assert out["channels"] == channels
    assert out["n_frames"] == len(samples) // channels
    assert out["sum_all"] == sum(samples)


@settings(max_examples=300, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=200),
)
def test_arbitrary_bytes_never_crash(data):
    """A parser fed hostile bytes must raise the documented error types,
    never IndexError/struct.error/UnboundLocalError."""
    try:
        decode_wav(data)
    except (DecodeError, NotImplementedError):
        pass


@settings(max_examples=300, deadline=None)
@given(
    pos=st.integers(min_value=0, max_value=60),
    val=st.integers(min_value=0, max_value=255),
)
def test_single_byte_mutation_never_crashes(pos, val):
    payload = bytearray(encode_wav(8000, 2, [1, -2, 3, -4, 5, -6]))
    payload[pos % len(payload)] = val
    try:
        decode_wav(bytes(payload))
    except (DecodeError, NotImplementedError):
        pass


def test_decode_wav_samples_and_features_match_decode_wav():
    """decode_wav_samples is the raster twin: same parse, exposes PCM; the
    feature definitions (energy / ZCR / total variation over channel 0)
    recompute exactly from it."""
    from pipeline_etl_ecommerce_spark.operators.audiocodec import (
        decode_wav,
        decode_wav_samples,
        encode_wav,
    )

    samples = [(i * 523) % 4096 - 2048 for i in range(24)]  # 12 stereo frames
    payload = encode_wav(8000, 2, samples)
    rate, nch, pcm = decode_wav_samples(payload)
    assert (rate, nch) == (8000, 2)
    assert list(pcm) == samples
    st = decode_wav(payload)
    assert st["sum_all"] == sum(samples) and st["n_frames"] == 12
    ch0 = samples[0::2]
    assert sum(v * v for v in ch0) == sum(v * v for v in pcm[0::nch])
    zcr = sum(1 for a, b in zip(ch0, ch0[1:]) if (a < 0) != (b < 0))
    assert zcr >= 1  # this waveform genuinely alternates sign
