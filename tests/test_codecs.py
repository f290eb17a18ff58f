"""Real PNG/WAV codec tests (operators/codecs.py) and their wiring into the
multimodal kernels. No external codec libs — PNG is zlib (stdlib) +
un-filtering, WAV is RIFF parsing; both are verified against independently
constructed byte streams, not just our own encoder's output."""

import struct
import zlib

import numpy as np
import pytest

from etl_for_dumdums_spark.operators.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    is_png,
    is_wav,
)


def _rng_image(h, w, ch, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


def test_png_roundtrip_rgb_and_rgba():
    for ch in (3, 4):
        img = _rng_image(13, 17, ch)
        back = decode_png(encode_png(img))
        assert back.shape == img.shape
        assert (back == img).all()


def _paeth_ref(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_scanline(ftype, raw_row, prev_row, ch):
    """Independent reference implementation of PNG scanline FILTERING (the
    encoder direction), so the decoder's un-filtering is checked against
    the spec, not against itself."""
    stride = len(raw_row)
    out = bytearray()
    for x in range(stride):
        left = raw_row[x - ch] if x >= ch else 0
        up = prev_row[x]
        ul = prev_row[x - ch] if x >= ch else 0
        if ftype == 0:
            v = raw_row[x]
        elif ftype == 1:
            v = raw_row[x] - left
        elif ftype == 2:
            v = raw_row[x] - up
        elif ftype == 3:
            v = raw_row[x] - (left + up) // 2
        else:
            v = raw_row[x] - _paeth_ref(left, up, ul)
        out.append(v % 256)
    return bytes(out)


def test_png_decodes_all_five_filter_types():
    """Build a PNG by hand whose five scanlines use filters 0..4 — the
    shape other encoders actually emit — and check the decode is exact."""
    img = _rng_image(5, 9, 3, seed=42)
    h, w, ch = img.shape
    raw = b""
    prev = bytes(w * ch)
    for y in range(h):
        row = img[y].tobytes()
        raw += bytes([y]) + _filter_scanline(y, row, prev, ch)
        prev = row

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    back = decode_png(payload)
    assert (back == img).all()


def test_png_multiple_idat_chunks():
    """Spec allows IDAT split anywhere in the zlib stream."""
    img = _rng_image(6, 6, 3, seed=3)
    full = encode_png(img)
    # re-split the single IDAT into two chunks
    sig, rest = full[:8], full[8:]
    (ihdr_len,) = struct.unpack_from(">I", rest, 0)
    ihdr = rest[: 12 + ihdr_len]
    (idat_len,) = struct.unpack_from(">I", rest, 12 + ihdr_len)
    idat_body = rest[12 + ihdr_len + 8 : 12 + ihdr_len + 8 + idat_len]
    half = len(idat_body) // 2

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    rebuilt = (
        sig
        + ihdr
        + chunk(b"IDAT", idat_body[:half])
        + chunk(b"IDAT", idat_body[half:])
        + chunk(b"IEND", b"")
    )
    assert (decode_png(rebuilt) == img).all()


def test_png_out_of_scope_gates():
    img = _rng_image(4, 4, 3)
    good = encode_png(img)
    with pytest.raises(ValueError):
        decode_png(b"JFIF" + good)
    # palette (3) now decodes, but a palette stream MISSING its PLTE is
    # malformed — ValueError, not a crash downstream
    pal = bytearray(good)
    # IHDR body starts at 8 (sig) + 8 (len+tag); color type is byte 9 of body
    pal[8 + 8 + 9] = 3
    with pytest.raises(ValueError):
        decode_png(bytes(pal))
    # sub-8-bit depths remain the honest out-of-scope gate (16-bit decodes now)
    deep = bytearray(good)
    deep[8 + 8 + 8] = 4  # bit depth byte
    with pytest.raises(NotImplementedError):
        decode_png(bytes(deep))
    assert is_png(good) and not is_png(b"nope")


def test_wav_roundtrip_mono_and_stereo():
    mono = np.array([0, 1000, -2000, 32767, -32768], dtype=np.int16)
    rate, ch, back = decode_wav(encode_wav(mono, 16000))
    assert (rate, ch) == (16000, 1)
    assert (back.reshape(-1) == mono).all()

    stereo = np.array([[100, -100], [2000, 4000], [-32768, 32767]], dtype=np.int16)
    rate, ch, back = decode_wav(encode_wav(stereo, 44100, channels=2))
    assert (rate, ch) == (44100, 2)
    assert (back == stereo).all()


def test_wav_out_of_scope_gates():
    payload = bytearray(encode_wav(np.zeros(4, dtype=np.int16), 8000))
    # fmt audio_format field (offset 20) → 0x55 (mp3-in-WAV): needs an
    # entropy decoder, gated (MS/IMA ADPCM now decode)
    struct.pack_into("<H", payload, 20, 0x55)
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(payload))
    # IEEE float decodes at 32/64-bit, but a float16 claim is out of scope
    struct.pack_into("<H", payload, 20, 3)
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(payload))
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    assert is_wav(encode_wav(np.zeros(2, dtype=np.int16), 8000))
    assert not is_wav(b"RIFFxxxxAVI ")


def test_audio_payload_to_pcm_mixdown():
    from etl_for_dumdums_spark.operators.multimodal import audio_payload_to_pcm

    stereo = np.array([[100, 200], [-501, 500], [32767, 32767]], dtype=np.int16)
    rate, mono = audio_payload_to_pcm(encode_wav(stereo, 22050, channels=2))
    assert rate == 22050
    # exact integer average with floor division: (-501+500)//2 == -1
    assert list(mono) == [150, -1, 32767]


def test_decode_image_real_feature_and_resize_png():
    from etl_for_dumdums_spark.operators.multimodal import (
        decode_image,
        resize_payload,
    )

    img = np.zeros((10, 20, 3), dtype=np.uint8)
    img[:, :, 0] = 255  # pure red
    feat = decode_image(encode_png(img))
    assert feat[0] == 1.0 and feat[1] == 0.0 and feat[2] == 0.0
    assert feat[3] == pytest.approx(255 / 3 / 255)

    resized = resize_payload(encode_png(img), 5, 4)
    assert is_png(resized)
    back = decode_png(resized)
    assert back.shape == (4, 5, 3)
    assert (back[:, :, 0] == 255).all() and (back[:, :, 1] == 0).all()


def test_rgb_and_pcm_stats_decode_real_codec_payloads(spark):
    from etl_for_dumdums_spark.operators.multimodal import (
        encode_rgb_raw,
        pcm_stats,
        rgb_stats,
    )

    img = _rng_image(8, 8, 3, seed=1)
    rows = [
        (1, "image", bytearray(encode_png(img))),
        (2, "image", bytearray(encode_rgb_raw(img))),
        (3, "image", bytearray(b"JPEG-ish-junk")),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {r["media_id"]: r for r in rgb_stats(df).collect()}
    # PNG and RGB8 raw of the SAME pixels must produce identical stats
    assert got[1]["dec_width"] == got[2]["dec_width"] == 8
    assert got[1]["mean_r"] == got[2]["mean_r"]
    assert got[1]["brightness"] == got[2]["brightness"]
    assert got[3]["dec_width"] is None

    stereo = np.array([[1000, 3000], [-2000, -4000], [0, 0]], dtype=np.int16)
    arows = [(10, "audio", bytearray(encode_wav(stereo, 8000, channels=2)))]
    adf = spark.createDataFrame(arows, "media_id long, kind string, payload binary")
    a = pcm_stats(adf).collect()[0]
    # mixdown: [2000, -3000, 0]; duration 3 frames @ 8 kHz
    assert a["n_samples"] == 3
    assert a["peak"] == 3000
    assert a["zero_cross"] == 1
    assert a["duration_ms"] == 3 * 1000 // 8000


def test_png_adam7_interlaced_decode():
    """Adam7: the test constructs the interlaced stream per the spec's
    pass grid (independent of the decoder's table) with filter-0 lines,
    for awkward sizes where passes go empty or 1-pixel, and checks
    decode == source pixels."""
    import struct
    import zlib

    PASSES = [
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ]

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    def interlaced_png(img):
        h, w, ch = img.shape
        color_type = {1: 0, 3: 2, 4: 6}[ch]
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1)
        raw = bytearray()
        for x0, y0, dx, dy in PASSES:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            for row in sub:
                raw += b"\x00" + row.tobytes()
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
        )

    rng = np.random.RandomState(3)
    for h, w, ch in [(8, 8, 3), (5, 7, 3), (3, 3, 1), (1, 1, 3), (2, 9, 4), (16, 5, 3)]:
        img = rng.randint(0, 256, (h, w, ch)).astype(np.uint8)
        got = decode_png(interlaced_png(img))
        if ch == 1:  # grayscale contract: replicated to RGB
            assert got.shape == (h, w, 3)
            assert (got == np.repeat(img, 3, axis=2)).all(), (h, w, ch)
        else:
            assert (got == img).all(), (h, w, ch)


def test_png_16bit_decode_msb():
    """16-bit PNGs decode by MSB (the standard 16->8 downsample), with
    byte-wise filters whose left-neighbor offset is the 16-bit bpp —
    exercised here with a filter-1 (Sub) scanline."""
    img16 = np.array(
        [[[0x1234, 0x5678, 0x9ABC], [0x1234 + 0x0100, 0x5678, 0x9ABC]]],
        dtype=np.uint16,
    )  # second pixel: R MSB +1 — a Sub filter stores the byte delta

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    row = img16[0].astype(">u2").tobytes()
    # filter 1 (Sub): first pixel raw, second stores byte-difference at bpp=6
    bpp = 6
    filtered = bytearray(row[:bpp])
    for i in range(bpp, len(row)):
        filtered.append((row[i] - row[i - bpp]) % 256)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x01" + bytes(filtered)))
        + chunk(b"IEND", b"")
    )
    got = decode_png(payload)
    assert got.shape == (1, 2, 3)
    assert got[0, 0].tolist() == [0x12, 0x56, 0x9A]
    assert got[0, 1].tolist() == [0x13, 0x56, 0x9A]


def test_png_trns_color_key_types_0_and_2():
    """A tRNS chunk on color types 0/2 is the spec's color key: pixels
    matching the key at FULL bit depth decode with alpha 0, the rest 255,
    and the image comes back RGBA (PNG spec 11.3.2.1)."""

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    # --- type 2 (RGB, 8-bit): key = (10, 20, 30); pixel 0 matches
    rows = b"\x00" + bytes([10, 20, 30, 10, 20, 31])  # filter 0, 2 pixels
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0))
        + chunk(b"tRNS", struct.pack(">HHH", 10, 20, 30))
        + chunk(b"IDAT", zlib.compress(rows))
        + chunk(b"IEND", b"")
    )
    got = decode_png(payload)
    assert got.shape == (1, 2, 4)
    assert got[0, 0].tolist() == [10, 20, 30, 0]
    assert got[0, 1].tolist() == [10, 20, 31, 255]

    # --- type 0 (gray, 8-bit): key = 77 → RGBA with gray replicated
    rows = b"\x00" + bytes([77, 78])
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0))
        + chunk(b"tRNS", struct.pack(">H", 77))
        + chunk(b"IDAT", zlib.compress(rows))
        + chunk(b"IEND", b"")
    )
    got = decode_png(payload)
    assert got.shape == (1, 2, 4)
    assert got[0, 0].tolist() == [77, 77, 77, 0]
    assert got[0, 1].tolist() == [78, 78, 78, 255]

    # --- FULL-bit-depth match: 16-bit gray, key 0x1234 — the MSB-equal
    # pixel 0x1235 must NOT match even though both downsample to 0x12
    row16 = np.array([0x1234, 0x1235], dtype=">u2").tobytes()
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 16, 0, 0, 0, 0))
        + chunk(b"tRNS", struct.pack(">H", 0x1234))
        + chunk(b"IDAT", zlib.compress(b"\x00" + row16))
        + chunk(b"IEND", b"")
    )
    got = decode_png(payload)
    assert got.shape == (1, 2, 4)
    assert got[0, 0, 3] == 0 and got[0, 1, 3] == 255
    assert got[0, 0, 0] == 0x12 and got[0, 1, 0] == 0x12

    # --- an 8-bit image with a key value > 255 legitimately never matches
    rows = b"\x00" + bytes([10, 20, 30])
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0))
        + chunk(b"tRNS", struct.pack(">HHH", 300, 20, 30))
        + chunk(b"IDAT", zlib.compress(rows))
        + chunk(b"IEND", b"")
    )
    got = decode_png(payload)
    assert got.shape == (1, 1, 4)
    assert got[0, 0, 3] == 255

    # --- malformed: wrong-length key chunk raises ValueError
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0))
        + chunk(b"tRNS", b"\x00\x01\x02")
        + chunk(b"IDAT", zlib.compress(b"\x00" + bytes([1, 2, 3])))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(payload)


# --- IMA ADPCM: independent scalar reference implementation, typed from the
# IMA spec's pseudo-code (NOT from the production decoder) to serve as the
# cross-check. Tables re-stated independently on purpose.
_REF_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767,
]
_REF_IMA_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ref_ima_step(nibble, pred, index):
    """One spec decode step: nibble + (pred, index) -> (pred', index')."""
    step = _REF_IMA_STEPS[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _REF_IMA_ADJ[nibble & 7]))
    return pred, index


def _ref_ima_encode_nibble(sample, pred, index):
    """Spec encoder: quantize (sample - pred) against the current step."""
    step = _REF_IMA_STEPS[index]
    diff = sample - pred
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    if diff >= step:
        nibble |= 4
        diff -= step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nibble |= 1
    return nibble


def _ima_encode_wav(signal, rate, channels, samples_per_block):
    """Independent IMA-ADPCM WAV writer: (n, channels) int16 -> RIFF bytes.
    Blocks hold `samples_per_block` frames (header frame + 8-aligned coded
    frames); the last block zero-pads and the fact chunk states the true
    frame count."""
    assert (samples_per_block - 1) % 8 == 0
    n = signal.shape[0]
    block_align = 4 * channels + ((samples_per_block - 1) // 2) * channels
    blocks = bytearray()
    expected = []  # the exact decoded frames the spec mandates
    for b0 in range(0, n, samples_per_block):
        frames = signal[b0 : b0 + samples_per_block]
        pad = samples_per_block - frames.shape[0]
        if pad:
            frames = np.vstack([frames, np.zeros((pad, channels), np.int16)])
        preds = [int(frames[0, c]) for c in range(channels)]
        idxs = []
        for c in range(channels):
            # header index: the step best matching the first coded delta
            d = abs(int(frames[1, c]) - preds[c]) if samples_per_block > 1 else 0
            idxs.append(
                max(i for i in range(89) if _REF_IMA_STEPS[i] <= max(d, 7))
                if d
                else 0
            )
            blocks += struct.pack("<hBB", preds[c], idxs[c], 0)
        expected.append([list(preds)])
        nibs = [[] for _ in range(channels)]
        for t in range(1, samples_per_block):
            row = []
            for c in range(channels):
                nib = _ref_ima_encode_nibble(int(frames[t, c]), preds[c], idxs[c])
                preds[c], idxs[c] = _ref_ima_step(nib, preds[c], idxs[c])
                nibs[c].append(nib)
                row.append(preds[c])
            expected[-1].append(row)
        # pack: per 8-sample group, channel-interleaved 4-byte words,
        # low nibble first within each byte
        for g in range(0, samples_per_block - 1, 8):
            for c in range(channels):
                for k in range(0, 8, 2):
                    blocks.append(nibs[c][g + k] | (nibs[c][g + k + 1] << 4))
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, channels, rate,
        rate * block_align // samples_per_block, block_align, 4, 2,
        samples_per_block,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)[:8]
        + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    )
    flat = [v for blk in expected for row in blk for v in row]
    return (
        b"RIFF" + struct.pack("<I", len(body)) + body,
        np.array(flat, dtype=np.int16).reshape(-1, channels),
    )


def test_wav_ima_adpcm_decodes_mono_and_stereo():
    """decode_wav(format 0x11) must match the spec's scalar recurrence
    EXACTLY (cross-checked against an independent reference decoder built
    from the IMA pseudo-code) and track the source signal closely."""
    rng = np.random.default_rng(11)
    t = np.arange(2000)
    for channels in (1, 2):
        sig = (
            8000 * np.sin(2 * np.pi * t / 37)[:, None]
            + rng.normal(0, 300, size=(t.size, 1))
        )
        sig = np.repeat(sig, channels, axis=1)
        if channels == 2:
            sig[:, 1] = -0.5 * sig[:, 0]  # distinct per-channel content
        sig = np.clip(sig, -32768, 32767).astype(np.int16)
        payload, expected = _ima_encode_wav(sig, 8000, channels, 505)
        rate, ch, got = decode_wav(payload)
        assert (rate, ch) == (8000, channels)
        # fact chunk trims the final block's padding
        assert got.shape == (sig.shape[0], channels)
        assert (got == expected[: sig.shape[0]]).all()
        # lossy but close: ADPCM tracks within a few steps of the signal
        err = (got.astype(np.int64) - sig.astype(np.int64))
        assert np.abs(err).mean() < 200.0
        assert np.abs(err).max() < 4000


def test_wav_ima_adpcm_gates_and_validation():
    # mp3-in-WAV (format 0x55) stays gated
    def _wav(fmt_code, ch, rate, bits, data, block_align=4):
        fmt = struct.pack("<HHIIHH", fmt_code, ch, rate, rate, block_align, bits)
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    with pytest.raises(NotImplementedError, match="0x55|format 85"):
        decode_wav(_wav(0x55, 1, 8000, 4, b"\x00" * 8))
    # MS-ADPCM with a bad predictor index / block align is malformed
    with pytest.raises(ValueError):
        decode_wav(_wav(2, 1, 8000, 4, b"\x00" * 8, block_align=4))
    # invalid block alignment is a malformed stream, not a gate
    with pytest.raises(ValueError):
        decode_wav(_wav(0x11, 1, 8000, 4, b"\x00" * 8, block_align=3))


# --- MS-ADPCM: independent scalar reference typed from the Microsoft ADPCM
# spec (NOT from the production decoder); tables re-stated on purpose.
_REF_MS_COEF = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0), (460, -208), (392, -232)]
_REF_MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230, 230, 230]


def _tdiv256(x):
    """C-style truncate-toward-zero division by 256."""
    return -((-x) >> 8) if x < 0 else x >> 8


def _ref_ms_step(nibble, s1, s2, delta, c1, c2):
    signed = nibble - 16 if nibble & 8 else nibble
    pred = _tdiv256(s1 * c1 + s2 * c2) + signed * delta
    pred = max(-32768, min(32767, pred))
    delta = max(16, _tdiv256(_REF_MS_ADAPT[nibble] * delta))
    return pred, delta


def _ms_encode_wav(signal, rate, channels, samples_per_block, coef_idx=0):
    """Independent MS-ADPCM WAV writer: (n, ch) int16 -> RIFF bytes plus
    the exact decoded frames the spec's recurrence produces."""
    assert samples_per_block > 2 and ((samples_per_block - 2) * channels) % 2 == 0
    c1, c2 = _REF_MS_COEF[coef_idx]
    n = signal.shape[0]
    block_align = 7 * channels + ((samples_per_block - 2) * channels) // 2
    blocks = bytearray()
    expected = []
    for b0 in range(0, n, samples_per_block):
        frames = signal[b0 : b0 + samples_per_block]
        pad = samples_per_block - frames.shape[0]
        if pad:
            frames = np.vstack([frames, np.zeros((pad, channels), np.int16)])
        s2 = [int(frames[0, c]) for c in range(channels)]  # older seed
        s1 = [int(frames[1, c]) for c in range(channels)]  # newer seed
        deltas = []
        for c in range(channels):
            d = max(16, abs(int(frames[2, c]) - s1[c]) // 4 or 16)
            deltas.append(d)
        blocks += bytes([coef_idx] * channels)
        for c in range(channels):
            blocks += struct.pack("<h", deltas[c])
        for c in range(channels):
            blocks += struct.pack("<h", s1[c])
        for c in range(channels):
            blocks += struct.pack("<h", s2[c])
        expected.append([list(s2), list(s1)])
        nibs = []
        for t in range(2, samples_per_block):
            row = []
            for c in range(channels):
                pred0 = _tdiv256(s1[c] * c1 + s2[c] * c2)
                want = (int(frames[t, c]) - pred0) / deltas[c]
                nib = max(-8, min(7, int(round(want)))) & 0xF
                newp, deltas[c] = _ref_ms_step(nib, s1[c], s2[c], deltas[c], c1, c2)
                s2[c], s1[c] = s1[c], newp
                nibs.append(nib)
                row.append(newp)
            expected[-1].append(row)
        for k in range(0, len(nibs), 2):
            blocks.append((nibs[k] << 4) | nibs[k + 1])
    fmt = struct.pack(
        "<HHIIHHHH", 2, channels, rate,
        rate * block_align // samples_per_block, block_align, 4, 32,
        samples_per_block,
    ) + struct.pack("<H", 7) + b"".join(
        struct.pack("<hh", a, b) for a, b in _REF_MS_COEF
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)[:8]
        + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    )
    flat = [v for blk in expected for row in blk for v in row]
    return (
        b"RIFF" + struct.pack("<I", len(body)) + body,
        np.array(flat, dtype=np.int16).reshape(-1, channels),
    )


def test_wav_ms_adpcm_decodes_mono_and_stereo():
    """decode_wav(format 2) must match the spec recurrence exactly
    (independent scalar reference) across coefficient pairs, and track the
    source within ADPCM's lossy bounds."""
    rng = np.random.default_rng(5)
    t = np.arange(1500)
    for channels, coef_idx in ((1, 0), (2, 1), (1, 5)):
        sig = (
            6000 * np.sin(2 * np.pi * t / 29)[:, None]
            + rng.normal(0, 250, size=(t.size, 1))
        )
        sig = np.repeat(sig, channels, axis=1)
        if channels == 2:
            sig[:, 1] = 0.7 * sig[:, 0] + 500
        sig = np.clip(sig, -32768, 32767).astype(np.int16)
        payload, expected = _ms_encode_wav(sig, 8000, channels, 500, coef_idx)
        rate, ch, got = decode_wav(payload)
        assert (rate, ch) == (8000, channels)
        assert got.shape == (sig.shape[0], channels)  # fact-chunk trim
        assert (got == expected[: sig.shape[0]]).all()
        err = got.astype(np.int64) - sig.astype(np.int64)
        assert np.abs(err).mean() < 300.0


def test_wav_ms_adpcm_validation():
    # predictor index beyond the 7 standard pairs: malformed, ValueError
    sig = np.zeros((10, 1), dtype=np.int16)
    payload, _ = _ms_encode_wav(sig, 8000, 1, 10)
    bad = bytearray(payload)
    # first data byte after headers: find 'data' chunk, predictor idx is byte 0
    di = bad.index(b"data") + 8
    bad[di] = 9
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))


def _chunk(tag, body):
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _png(w, h, depth, ctype, idat_raw, extra=b"", interlace=0):
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace))
        + extra
        + _chunk(b"IDAT", zlib.compress(idat_raw))
        + _chunk(b"IEND", b"")
    )


def test_png_sub8_grayscale_depths():
    """1/2/4-bit grayscale: MSB-first bit unpacking, exact max-value-ratio
    scaling (1-bit: 0/255; 2-bit: x*85; 4-bit: x*17), byte-packed rows with
    padding bits, and a filter-2 (Up) row to prove filters operate on the
    PACKED bytes."""
    # 1-bit, 10 px wide (2 bytes/row incl. 6 pad bits), 2 rows
    row0 = bytes([0b10110010, 0b01000000])
    # row1 filtered with Up: stored XOR-ish additions mod 256
    row1_plain = bytes([0b01101101, 0b10000000])
    row1_filt = bytes((row1_plain[i] - row0[i]) % 256 for i in range(2))
    raw = b"\x00" + row0 + b"\x02" + row1_filt
    got = decode_png(_png(10, 2, 1, 0, raw))
    assert got.shape == (2, 10, 3)
    exp0 = [1, 0, 1, 1, 0, 0, 1, 0, 0, 1]
    exp1 = [0, 1, 1, 0, 1, 1, 0, 1, 1, 0]
    assert got[0, :, 0].tolist() == [v * 255 for v in exp0]
    assert got[1, :, 0].tolist() == [v * 255 for v in exp1]
    assert (got[..., 0] == got[..., 1]).all() and (got[..., 0] == got[..., 2]).all()

    # 2-bit, 3 px (one byte/row, 2 pad bits)
    raw = b"\x00" + bytes([0b00_01_10_11 & 0xFF])
    got = decode_png(_png(3, 1, 2, 0, raw))
    assert got[0, :, 0].tolist() == [0 * 85, 1 * 85, 2 * 85]

    # 4-bit, 3 px (2 bytes/row, 4 pad bits)
    raw = b"\x00" + bytes([0xA5, 0xF0])
    got = decode_png(_png(3, 1, 4, 0, raw))
    assert got[0, :, 0].tolist() == [0xA * 17, 0x5 * 17, 0xF * 17]


def test_png_sub8_palette_and_trns():
    """4-bit palette resolves through PLTE; palette tRNS alpha applies; an
    index past the palette is malformed."""
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # 3 entries
    raw = b"\x00" + bytes([0x01, 0x20])  # indexes 0,1,2 + pad
    png = _png(3, 1, 4, 3, raw, extra=_chunk(b"PLTE", plte))
    got = decode_png(png)
    assert got.shape == (1, 3, 3)
    assert got[0].tolist() == [[255, 0, 0], [0, 255, 0], [0, 0, 255]]

    png = _png(
        3, 1, 4, 3, raw,
        extra=_chunk(b"PLTE", plte) + _chunk(b"tRNS", bytes([255, 128])),
    )
    got = decode_png(png)
    assert got.shape == (1, 3, 4)
    assert got[0, :, 3].tolist() == [255, 128, 255]

    bad = _png(3, 1, 4, 3, b"\x00" + bytes([0x0F, 0x00]), extra=_chunk(b"PLTE", plte))
    with pytest.raises(ValueError):
        decode_png(bad)


def test_png_sub8_adam7_and_color_key():
    """Sub-8-bit Adam7: each pass bit-packs its own scanlines; cross-check
    the scatter against the plain encoding of the same image. And the
    type-0 color key matches on RAW sub-8 sample values."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 2, size=(9, 9), dtype=np.uint8)  # 1-bit 9x9

    def pack_rows(a):
        out = b""
        for y in range(a.shape[0]):
            out += b"\x00" + np.packbits(a[y]).tobytes()
        return out

    plain = decode_png(_png(9, 9, 1, 0, pack_rows(img)))
    # build the interlaced stream pass by pass
    _ADAM7 = [
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ]
    raw = b""
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.size:
            raw += pack_rows(sub)
    inter = decode_png(_png(9, 9, 1, 0, raw, interlace=1))
    assert (inter == plain).all()

    # color key on raw values: key=1 → the '1' pixels go transparent
    keyed = decode_png(
        _png(9, 9, 1, 0, pack_rows(img), extra=_chunk(b"tRNS", struct.pack(">H", 1)))
    )
    assert keyed.shape == (9, 9, 4)
    assert (keyed[..., 3] == np.where(img == 1, 0, 255)).all()
    assert (keyed[..., 0] == img * 255).all()


def test_png_spec_illegal_shapes_stay_gated():
    # sub-8-bit RGB (type 2) and 16-bit palette are ILLEGAL per spec
    with pytest.raises(NotImplementedError):
        decode_png(_png(2, 1, 4, 2, b"\x00\x00\x00"))
    plte = _chunk(b"PLTE", bytes([0, 0, 0]))
    with pytest.raises(NotImplementedError):
        decode_png(_png(2, 1, 16, 3, b"\x00\x00\x00", extra=plte))
