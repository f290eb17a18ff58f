"""Real raw-RGB8 kernels: round-trip, deterministic resize, Spark-side
feature extraction, and the preserved codec gate."""

from __future__ import annotations

import numpy as np
import pytest


def _gradient(h, w):
    a = np.zeros((h, w, 3), dtype=np.uint8)
    a[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    a[..., 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
    a[..., 2] = 7
    return a


def test_raw_rgb_roundtrip():
    from etl_for_dumdums_spark.operators.multimodal import (
        decode_rgb_raw,
        encode_rgb_raw,
    )

    a = _gradient(12, 9)
    assert np.array_equal(decode_rgb_raw(encode_rgb_raw(a)), a)


def test_raw_resize_nearest_exact():
    from etl_for_dumdums_spark.operators.multimodal import (
        decode_rgb_raw,
        encode_rgb_raw,
        resize_rgb_raw,
    )

    a = _gradient(8, 8)
    out = decode_rgb_raw(resize_rgb_raw(encode_rgb_raw(a), 4, 4))
    # nearest-neighbor with floored integer maps: out[y,x] = a[y*2, x*2]
    assert np.array_equal(out, a[::2, ::2])
    # upscale is deterministic too
    up = decode_rgb_raw(resize_rgb_raw(encode_rgb_raw(a), 16, 16))
    yi = (np.arange(16) * 8) // 16
    assert np.array_equal(up, a[yi][:, yi])


def test_codec_gate_preserved():
    from etl_for_dumdums_spark.operators.multimodal import decode_rgb_raw

    with pytest.raises(NotImplementedError):
        decode_rgb_raw(b"\xff\xd8\xff\xe0 fake jpeg bytes")


def test_rgb_stats_spark_pipeline(spark):
    from etl_for_dumdums_spark.operators.multimodal import (
        encode_rgb_raw,
        rgb_stats,
    )

    imgs = [
        (1, encode_rgb_raw(np.full((4, 6, 3), 10, dtype=np.uint8))),
        (2, encode_rgb_raw(_gradient(5, 5))),
        (3, b"\x89PNG not raw"),
        (4, None),
    ]
    media = spark.createDataFrame(imgs, "media_id long, payload binary")
    rows = {r["media_id"]: r for r in rgb_stats(media).collect()}
    assert rows[1]["dec_width"] == 6 and rows[1]["dec_height"] == 4
    assert rows[1]["mean_r"] == rows[1]["brightness"] == 10.0
    g = _gradient(5, 5).reshape(-1, 3).mean(axis=0)
    assert abs(rows[2]["mean_g"] - g[1]) < 1e-9
    # codec / null rows fall through with NULLs, not errors
    assert rows[3]["dec_width"] is None and rows[4]["brightness"] is None


# ---------------------------------------------------------------------------
# Raw PCM16 audio kernels (the audio twin of the RGB8 family)
# ---------------------------------------------------------------------------
def test_pcm16_roundtrip_and_downsample():
    import numpy as np

    from etl_for_dumdums_spark.operators.multimodal import (
        decode_pcm16,
        downsample_pcm16,
        encode_pcm16,
    )

    a = np.array([0, 100, -200, 32767, -32768, 15000], dtype=np.int16)
    payload = encode_pcm16(a, 16000)
    rate, back = decode_pcm16(payload)
    assert rate == 16000
    assert (back == a).all()
    r2, dec = decode_pcm16(downsample_pcm16(payload, 4))
    assert r2 == 4000
    assert list(dec) == [0, -32768]

    # non-divisor factors are rejected: 16000/3 would silently truncate to
    # 5333 Hz and every rate-derived stat would drift
    import pytest

    with pytest.raises(ValueError):
        downsample_pcm16(payload, 3)
    with pytest.raises(ValueError):
        downsample_pcm16(payload, 0)


def test_pcm16_codec_gate():
    import pytest

    from etl_for_dumdums_spark.operators.multimodal import decode_pcm16

    with pytest.raises(NotImplementedError):
        decode_pcm16(b"ID3\x04not-actually-raw")


def test_pcm_stats_matches_serial(spark):
    import math

    import numpy as np

    from etl_for_dumdums_spark.operators.multimodal import encode_pcm16, pcm_stats

    rng_clips = {
        1: np.array([100, -100, 200, -15500, 15000, 0, -1], dtype=np.int16),
        2: np.array([5, 5, 5], dtype=np.int16),
    }
    rows = [(mid, bytearray(encode_pcm16(a, 8000))) for mid, a in rng_clips.items()]
    rows.append((3, None))  # null payload passes through as NULLs
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in pcm_stats(media, clip_abs=15000).collect()}

    for mid, a in rng_clips.items():
        x = a.astype(np.int64)
        r = got[mid]
        assert r["rate"] == 8000
        assert r["n_samples"] == len(x)
        assert r["duration_ms"] == len(x) * 1000 // 8000
        assert r["rms_int"] == math.isqrt(int((x * x).sum()) // len(x))
        assert r["zero_cross"] == int((x[:-1] * x[1:] < 0).sum())
        assert r["peak"] == int(np.abs(x).max())
        assert r["n_clipped"] == int((np.abs(x) >= 15000).sum())
    assert got[3]["n_samples"] is None and got[3]["rms_int"] is None


def test_pcm_stats_undecodable_wav_yields_nulls(spark):
    """A float-format WAV passes is_wav() but decode_wav raises
    NotImplementedError inside the kernel — the row must pass through as
    NULLs instead of failing the whole Spark job (r4 advice finding #1)."""
    import struct

    import numpy as np

    from etl_for_dumdums_spark.operators.codecs import encode_wav, is_wav
    from etl_for_dumdums_spark.operators.multimodal import encode_pcm16, pcm_stats

    # IEEE-float WAV (format 3, 32-bit) — valid RIFF/WAVE framing
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    data = struct.pack("<4f", 0.1, -0.2, 0.3, -0.4)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    float_wav = b"RIFF" + struct.pack("<I", len(body)) + body
    assert is_wav(float_wav)  # the magic check alone cannot reject it

    # truncated/garbage RIFF body raises ValueError — also NULLs, not a crash
    corrupt_wav = b"RIFF\x08\x00\x00\x00WAVEgarb"

    good = encode_wav(np.array([100, -100, 200], dtype=np.int16), 8000)
    media = spark.createDataFrame(
        [
            (1, bytearray(float_wav)),
            (2, bytearray(corrupt_wav)),
            (3, bytearray(good)),
            (4, bytearray(encode_pcm16(np.array([5, -5], dtype=np.int16), 4000))),
        ],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r for r in pcm_stats(media).collect()}
    assert got[1]["n_samples"] is None and got[1]["rate"] is None
    assert got[2]["n_samples"] is None
    assert got[3]["n_samples"] == 3 and got[3]["rate"] == 8000
    assert got[4]["n_samples"] == 2 and got[4]["rate"] == 4000


def test_rgb_stats_malformed_body_yields_nulls(spark):
    """Valid PNG/JPEG magic + malformed body raises ValueError from the
    decoder — the kernel must emit a NULL row, not kill the task
    (r4 advice finding #2)."""
    import numpy as np

    from etl_for_dumdums_spark.operators.codecs import encode_png
    from etl_for_dumdums_spark.operators.multimodal import encode_rgb_raw, rgb_stats

    bad_png = b"\x89PNG\r\n\x1a\x0a" + b"\x00" * 16  # signature, no IHDR
    bad_jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 8  # SOI marker, junk body
    good_png = encode_png(np.full((2, 2, 3), 7, dtype=np.uint8))
    media = spark.createDataFrame(
        [
            (1, bytearray(bad_png)),
            (2, bytearray(bad_jpeg)),
            (3, bytearray(good_png)),
            (4, bytearray(encode_rgb_raw(np.full((3, 3, 3), 9, dtype=np.uint8)))),
        ],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r for r in rgb_stats(media).collect()}
    assert got[1]["dec_width"] is None
    assert got[2]["dec_width"] is None
    assert got[3]["dec_width"] == 2 and got[3]["mean_r"] == 7.0
    assert got[4]["dec_width"] == 3 and got[4]["brightness"] == 9.0
