"""WebP container probe: foreign-stream interop (the one real .webp the
container ships — CPython's test asset, a lossy VP8X+ALPH+VP8 file),
hand-built VP8L/VP8 streams, and the documented decode gate."""

import glob
import struct

import pytest

from etl_for_dumdums_spark.operators.webp import (
    decode_webp,
    is_webp,
    probe_webp,
)

REAL_WEBP = sorted(
    glob.glob("/root/.pyenv/versions/*/lib/python*/test/imghdrdata/python.webp")
)


def _riff(chunks):
    body = b"WEBP"
    for tag, data in chunks:
        body += tag + struct.pack("<I", len(data)) + data
        if len(data) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _vp8l_chunk(w, h, alpha=False):
    bits = (w - 1) | ((h - 1) << 14) | (int(alpha) << 28)
    return b"\x2f" + struct.pack("<I", bits)


def _vp8_chunk(w, h):
    # 3-byte frame tag (keyframe, version 0, show, size 0) + start code +
    # 14-bit dims — header only, no macroblock data (probe never reads it)
    return b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", w, h)


@pytest.mark.skipif(not REAL_WEBP, reason="no real .webp on this box")
def test_real_foreign_webp_probes():
    buf = open(REAL_WEBP[0], "rb").read()
    assert is_webp(buf)
    p = probe_webp(buf)
    # cross-chunk consistency on a foreign stream: the VP8X canvas dims
    # must equal the embedded VP8 frame header dims parsed independently
    assert p["format"] == "vp8x"
    assert p["width"] == p["frame_width"] > 0
    assert p["height"] == p["frame_height"] > 0
    assert p["has_alpha"] is True  # the file carries an ALPH chunk
    assert p["is_animated"] is False
    assert p["lossless"] is False
    assert p["n_frames"] == 1


def test_vp8l_header_parses():
    p = probe_webp(_riff([(b"VP8L", _vp8l_chunk(800, 601, alpha=True))]))
    assert p["format"] == "vp8l"
    assert (p["width"], p["height"]) == (800, 601)
    assert p["lossless"] and p["has_alpha"]


def test_vp8_header_parses():
    p = probe_webp(_riff([(b"VP8 ", _vp8_chunk(320, 240))]))
    assert p["format"] == "vp8"
    assert (p["width"], p["height"]) == (320, 240)
    assert not p["lossless"] and not p["has_alpha"]


def test_vp8x_animation_counts_frames():
    vp8x = bytes([0x02, 0, 0, 0]) + (99).to_bytes(3, "little") + (49).to_bytes(3, "little")
    p = probe_webp(
        _riff([(b"VP8X", vp8x), (b"ANMF", b"\x00" * 16), (b"ANMF", b"\x00" * 16)])
    )
    assert p["is_animated"] and p["n_frames"] == 2
    assert (p["width"], p["height"]) == (100, 50)


def test_malformed_raises_valueerror():
    with pytest.raises(ValueError):
        probe_webp(b"RIFF\x00\x00\x00\x00WAVE")  # not WebP
    with pytest.raises(ValueError):
        probe_webp(_riff([]))  # no image chunk
    with pytest.raises(ValueError):
        probe_webp(_riff([(b"VP8L", b"\x2f\x01")]))  # truncated VP8L
    with pytest.raises(ValueError):
        probe_webp(_riff([(b"VP8 ", b"\x00\x00\x00bad")]))  # no start code
    bad = bytearray(_riff([(b"VP8L", _vp8l_chunk(4, 4))]))
    struct.pack_into("<I", bad, 16, 999)  # chunk length past EOF
    with pytest.raises(ValueError):
        probe_webp(bytes(bad))


def test_decode_gate_and_null_row_contract(spark):
    """decode_webp raises NotImplementedError; through the rgb_stats
    kernel a .webp payload yields a NULL row, not a dead task."""
    from etl_for_dumdums_spark.operators.multimodal import rgb_stats

    payload = _riff([(b"VP8L", _vp8l_chunk(8, 8))])
    with pytest.raises(NotImplementedError):
        decode_webp(payload)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    row = rgb_stats(df).collect()[0]
    assert row.mean_r is None and row.dec_width is None
