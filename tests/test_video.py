"""AVI container + MJPEG/DIB video codec tests (operators/video.py).

Same policy as test_codecs/test_jpeg: byte-exact roundtrips where the
format is lossless (BI_RGB DIB), analytic exactness where it is lossy
(flat 8x8 MJPEG blocks at q95 — the mm_codec_roundtrip analysis), plus
independently-constructed containers (an AVI built by hand with struct,
absolute-offset idx1, no idx1 at all) so the parser is tested against
more than its own muxer's output."""

import struct

import numpy as np
import pytest

from etl_for_dumdums_spark.operators.video import (
    decode_avi,
    encode_avi,
    is_avi,
    probe_avi,
    video_stats,
)


def _rng_frames(n, h, w, seed=11):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)]


def _flat_quadrant_frame(d, f):
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    for q, (y0, x0) in enumerate(((0, 0), (0, 8), (8, 0), (8, 8))):
        img[y0 : y0 + 8, x0 : x0 + 8, :] = (d * 7 + f * 29 + q * 50) % 256
    return img


def test_dib_roundtrip_exact_odd_width():
    # width 23 -> row stride 72 != 69: exercises the 4-byte padding rule
    frames = _rng_frames(5, 17, 23)
    avi = encode_avi(frames, fps=24, codec="DIB ")
    assert is_avi(avi)
    fps, back = decode_avi(avi)
    assert fps == 24 and len(back) == 5
    for a, b in zip(frames, back):
        assert (a == b).all()


def test_probe_header_only_metadata():
    frames = _rng_frames(4, 8, 12)
    info = probe_avi(encode_avi(frames, fps=15, codec="DIB "))
    assert info == {"width": 12, "height": 8, "fps": 15, "n_frames": 4, "codec": "DIB "}
    minfo = probe_avi(encode_avi(frames, fps=30, codec="MJPG"))
    assert minfo["codec"] == "MJPG" and minfo["n_frames"] == 4


def test_mjpeg_flat_quadrants_exact_and_seek():
    frames = [_flat_quadrant_frame(5, f) for f in range(8)]
    avi = encode_avi(frames, fps=30, codec="MJPG", quality=95)
    _fps, picked = decode_avi(avi, indices=[0, 3, 6])
    for i, f in zip([0, 3, 6], picked):
        assert (f == frames[i]).all()
    # seek == full decode at the same indices
    _fps, full = decode_avi(avi)
    for i, f in zip([0, 3, 6], picked):
        assert (f == full[i]).all()


def test_idx1_absolute_offset_convention():
    """Rewrite the muxer's movi-relative idx1 offsets to absolute file
    offsets — the other convention in the wild — and decode again."""
    frames = [_flat_quadrant_frame(9, f) for f in range(3)]
    avi = bytearray(encode_avi(frames, fps=30, codec="MJPG", quality=95))
    movi_pos = bytes(avi).find(b"movi")
    idx_pos = bytes(avi).rfind(b"idx1")
    (idx_size,) = struct.unpack_from("<I", avi, idx_pos + 4)
    for i in range(idx_pos + 8, idx_pos + 8 + idx_size, 16):
        (off,) = struct.unpack_from("<I", avi, i + 8)
        struct.pack_into("<I", avi, i + 8, off + movi_pos)
    _fps, back = decode_avi(bytes(avi), indices=[2])
    assert (back[0] == frames[2]).all()


def test_no_idx1_linear_scan_fallback():
    frames = [_flat_quadrant_frame(3, f) for f in range(4)]
    avi = encode_avi(frames, fps=30, codec="MJPG", quality=95)
    pos = avi.rfind(b"idx1")
    stripped = avi[:pos]
    stripped = b"RIFF" + struct.pack("<I", len(stripped) - 8) + stripped[8:]
    _fps, back = decode_avi(stripped, indices=[3])
    assert (back[0] == frames[3]).all()


def test_handbuilt_container_decodes():
    """An AVI assembled by hand (not via encode_avi): one 2x2 BI_RGB frame,
    no idx1 — independent byte-stream construction."""
    w = h = 2
    rgb = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    # bottom-up BGR rows padded to 8 bytes
    row_bytes = []
    for y in (1, 0):
        row = b"".join(bytes(rgb[y, x, ::-1]) for x in range(w))
        row_bytes.append(row + b"\x00" * (8 - len(row)))
    dib = b"".join(row_bytes)
    avih = b"avih" + struct.pack("<I", 56) + struct.pack(
        "<14I", 100000, 0, 0, 0, 1, 0, 1, 0, w, h, 0, 0, 0, 0
    )
    strh = b"strh" + struct.pack("<I", 56) + b"vidsDIB " + struct.pack(
        "<IHHIIIIIIII4H", 0, 0, 0, 0, 1, 10, 0, 1, 0, 0xFFFFFFFF, 0, 0, 0, w, h
    )
    strf = b"strf" + struct.pack("<I", 40) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(dib), 0, 0, 0, 0
    )
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) + b"strl" + strh + strf
    hdrl_body = avih + strl
    hdrl = b"LIST" + struct.pack("<I", 4 + len(hdrl_body)) + b"hdrl" + hdrl_body
    frame = b"00db" + struct.pack("<I", len(dib)) + dib
    movi = b"LIST" + struct.pack("<I", 4 + len(frame)) + b"movi" + frame
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    info = probe_avi(avi)
    assert info == {"width": 2, "height": 2, "fps": 10, "n_frames": 1, "codec": "DIB "}
    _fps, back = decode_avi(avi)
    assert (back[0] == rgb).all()


def test_guards():
    with pytest.raises(ValueError):
        decode_avi(b"not an avi")
    with pytest.raises(ValueError):
        encode_avi([], fps=10)
    frames = _rng_frames(2, 4, 4)
    with pytest.raises(NotImplementedError):
        encode_avi(frames, codec="XVID")
    avi = bytearray(encode_avi(frames, codec="DIB "))
    # flip the strf biCompression fourcc to a codec we don't carry
    strf = bytes(avi).find(b"strf")
    struct.pack_into("<I", avi, strf + 8 + 16, struct.unpack("<I", b"cvid")[0])
    with pytest.raises(NotImplementedError):
        decode_avi(bytes(avi))
    with pytest.raises(ValueError):
        decode_avi(encode_avi(frames, codec="DIB "), indices=[5])


def test_video_stats_kernel_nulls_and_values(spark):
    """video_stats over a mixed batch: a good MJPEG AVI, a good DIB AVI,
    an unsupported-codec AVI, a corrupt payload, and a NULL — the honest
    NULL-guard contract shared with rgb_stats/pcm_stats."""
    frames = [_flat_quadrant_frame(2, f) for f in range(6)]
    good_mjpg = encode_avi(frames, fps=30, codec="MJPG", quality=95)
    dib_frames = _rng_frames(4, 8, 8, seed=3)
    good_dib = encode_avi(dib_frames, fps=12, codec="DIB ")
    alien = bytearray(good_dib)
    strf = bytes(alien).find(b"strf")
    struct.pack_into("<I", alien, strf + 8 + 16, struct.unpack("<I", b"cvid")[0])
    rows = [
        (1, bytearray(good_mjpg)),
        (2, bytearray(good_dib)),
        (3, alien),
        (4, bytearray(b"garbage")),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r.asDict() for r in video_stats(df, every_k=3).collect()}
    exp_mjpg = sum(
        int(_flat_quadrant_frame(2, f).astype(np.int64).sum()) for f in (0, 3)
    )
    assert out[1]["n_frames"] == 6 and out[1]["n_sampled"] == 2
    assert out[1]["sampled_px_sum"] == exp_mjpg
    assert out[1]["fps"] == 30 and out[1]["width"] == 16
    exp_dib = sum(int(dib_frames[f].astype(np.int64).sum()) for f in (0, 3))
    assert out[2]["sampled_px_sum"] == exp_dib
    for mid in (3, 4, 5):
        assert out[mid]["n_frames"] is None and out[mid]["sampled_px_sum"] is None


def test_extract_frames_rows(spark):
    """extract_frames: one row per sampled frame, pixels optional,
    undecodable payloads contribute zero rows."""
    from etl_for_dumdums_spark.operators.video import extract_frames

    frames = [_flat_quadrant_frame(4, f) for f in range(7)]
    avi = encode_avi(frames, fps=30, codec="MJPG", quality=95)
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"junk")), (3, None)],
        "media_id long, payload binary",
    )
    rows = extract_frames(df, every_k=2, emit_pixels=True).collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 2, 4, 6]
    assert {r["media_id"] for r in rows} == {1}
    for r in rows:
        exp = _flat_quadrant_frame(4, r["frame_idx"])
        assert r["px_sum"] == int(exp.astype(np.int64).sum())
        got = np.frombuffer(bytes(r["frame_rgb"]), dtype=np.uint8).reshape(16, 16, 3)
        assert (got == exp).all()
    thin = extract_frames(df, every_k=2).collect()
    assert all(t["frame_rgb"] is None for t in thin)
