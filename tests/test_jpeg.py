"""Baseline JPEG codec (operators/jpeg.py): analytic DCT properties,
self-roundtrip bounds, third-party interop against the libjpeg-encoded
photos the Spark distribution ships, and the Spark-side kernel wiring."""

import glob
import os

import numpy as np
import pytest

from etl_for_dumdums_spark.operators.jpeg import (
    _dct_matrix,
    _zigzag_order,
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
)

SPARK_IMAGES = sorted(
    glob.glob(
        "/opt/spark-*/data/mllib/images/origin/**/*.jpg",
        recursive=True,
    )
)


def test_zigzag_is_a_permutation_with_the_standard_prefix():
    zz = _zigzag_order()
    assert sorted(zz) == list(range(64))
    assert zz[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert zz[-3:] == [47, 55, 62, 63][-3:]


def test_dct_matrix_is_orthonormal():
    C = _dct_matrix()
    assert np.allclose(C @ C.T, np.eye(8), atol=1e-12)
    rng = np.random.RandomState(3)
    x = rng.rand(8, 8) * 255
    assert np.allclose(C.T @ (C @ x @ C.T) @ C, x, atol=1e-9)


def test_uniform_image_roundtrips_exactly():
    # a flat image is DC-only: quantization error is sub-half-step, so the
    # decoded value equals the input exactly
    for v in (0, 77, 130, 255):
        img = np.full((16, 24, 3), v, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, 90))
        assert out.shape == (16, 24, 3)
        assert int(np.abs(out.astype(int) - v).max()) == 0, v


def test_all_256_uniform_values_roundtrip_exactly_at_q95():
    """Backs mm_codec_roundtrip's analytic claim: at quality 95 the DC-only
    reconstruction error stays under half an intensity step through the
    YCbCr matrix for EVERY 8-bit value, so flat tiles roundtrip exactly."""
    for v in range(256):
        img = np.full((8, 8, 3), v, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, 95))
        assert (out == v).all(), v


def test_gradient_roundtrip_error_bounded():
    y, x = np.mgrid[0:64, 0:48]
    img = np.stack([(x * 5) % 256, (y * 3) % 256, (x + y) % 256], axis=-1).astype(
        np.uint8
    )
    dec = decode_jpeg(encode_jpeg(img, 95))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert int(err.max()) <= 4  # q95 luma quant steps are 1-4
    assert float(err.mean()) < 1.0


def test_noise_roundtrip_exercises_byte_stuffing():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (40, 40, 3)).astype(np.uint8)
    payload = encode_jpeg(img, 90)
    assert b"\xff\x00" in payload  # stuffing actually happened
    dec = decode_jpeg(payload)
    assert dec.shape == (40, 40, 3)


def test_grayscale_and_nonmultiple_of_8_dims():
    y, _ = np.mgrid[0:37, 0:29]
    g = (y * 6 % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, 92))
    assert dec.shape == (37, 29, 3)
    assert int(np.abs(dec[..., 0].astype(int) - g.astype(int)).max()) <= 3
    # all three channels identical for a grayscale stream
    assert (dec[..., 0] == dec[..., 1]).all() and (dec[..., 1] == dec[..., 2]).all()


def test_encode_is_deterministic():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    assert encode_jpeg(img, 85) == encode_jpeg(img, 85)


@pytest.mark.skipif(not SPARK_IMAGES, reason="Spark mllib sample images not on disk")
def test_decodes_real_libjpeg_photos_baseline_and_progressive():
    """Third-party interop: EVERY photo encoded by libjpeg in the Spark
    distribution — baseline 4:2:0 AND the progressive (SOF2) grayscale one
    — must decode to its SOF dimensions with plausible content."""
    decoded = 0
    for path in SPARK_IMAGES:
        data = open(path, "rb").read()
        assert is_jpeg(data)
        a = decode_jpeg(data)
        decoded += 1
        h, w, ch = a.shape
        assert ch == 3 and h > 8 and w > 8
        # plausible photo statistics: not blank, not saturated noise
        assert 10.0 < float(a.mean()) < 245.0
        assert float(a.std()) > 10.0
    assert decoded >= 5, "expected all sample photos (incl. progressive) to decode"


_PROG_FIXTURE = [p for p in SPARK_IMAGES if p.endswith("grayscale.jpg")]
_BASE_TWIN = [p for p in SPARK_IMAGES if p.endswith("chr30.4.184.jpg")]


@pytest.mark.skipif(
    not (_PROG_FIXTURE and _BASE_TWIN), reason="Spark mllib twin photos not on disk"
)
def test_progressive_interop_cross_file_ground_truth():
    """grayscale.jpg is a REAL libjpeg SOF2 stream (the 6-scan
    jpeg_simple_progression script: DC first+refine, AC first+refine with
    EOB runs) of the same 215x300 photo as the baseline chr30.4.184.jpg.
    Decoding it through the progressive path must match the luma of the
    independently decoded baseline file within compression noise — two
    different encoders' outputs of one source, two decode paths."""
    prog = decode_jpeg(open(_PROG_FIXTURE[0], "rb").read())
    base = decode_jpeg(open(_BASE_TWIN[0], "rb").read())
    assert prog.shape == base.shape == (215, 300, 3)
    luma = 0.299 * base[..., 0] + 0.587 * base[..., 1] + 0.114 * base[..., 2]
    diff = np.abs(prog[..., 0].astype(np.float64) - luma)
    # a decode defect shows up as ~50+ mean error; two lossy encodings of
    # the same photo differ by a few levels
    assert float(diff.mean()) < 5.0
    assert float(np.percentile(diff, 99)) < 20.0


def test_progressive_roundtrip_is_bit_identical_to_baseline():
    """encode_jpeg_progressive must carry EXACTLY the coefficients of
    encode_jpeg at the same quality — decode of both is pixel-identical.
    This pins every progressive entropy branch (DC first/refine, AC
    first/refine, ZRL, correction bits, per-band EOB) against the
    baseline path, for color and grayscale, across qualities."""
    from etl_for_dumdums_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.RandomState(42)
    yy, xx = np.mgrid[0:41, 0:67]
    img = np.stack(
        [(yy * 3 + xx * 2) % 256, (xx * 5) % 256, (yy * 7 + 30) % 256], axis=-1
    ).astype(np.uint8)
    img[10:20, 10:30] = [200, 30, 90]
    img = np.clip(
        img.astype(int) + rng.randint(-12, 12, img.shape), 0, 255
    ).astype(np.uint8)
    for q in (90, 60):
        want = decode_jpeg(encode_jpeg(img, q))
        got = decode_jpeg(encode_jpeg_progressive(img, q))
        assert np.array_equal(got, want)
    gray = img[..., 0]
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(gray, 80)),
        decode_jpeg(encode_jpeg(gray, 80)),
    )


def test_progressive_restart_markers_roundtrip():
    """DRI/RSTn inside progressive scans: per-segment DC-pred and EOB-run
    resets must reproduce the same pixels as the unrestarted stream."""
    from etl_for_dumdums_spark.operators.jpeg import encode_jpeg_progressive

    yy, xx = np.mgrid[0:24, 0:40]
    img = ((yy * 11 + xx * 3) % 256).astype(np.uint8)
    want = decode_jpeg(encode_jpeg(img, 75))
    for dri in (1, 3, 7):
        got = decode_jpeg(encode_jpeg_progressive(img, 75, restart_interval=dri))
        assert np.array_equal(got, want), f"restart_interval={dri}"


def test_out_of_scope_sof_still_gates_honestly():
    # SOF9 (arithmetic-coded) must raise the honest gate, not a wrong answer
    sof9 = b"\xff\xd8" + b"\xff\xc9" + (17).to_bytes(2, "big") + bytes(15)
    with pytest.raises(NotImplementedError):
        decode_jpeg(sof9)


def test_kernel_wiring_decode_and_rgb_stats(spark):
    """JPEG payloads flow through the same mapInPandas kernels as PNG/raw."""
    from etl_for_dumdums_spark.operators.multimodal import (
        decode_image,
        image_payload_to_array,
        resize_payload,
        rgb_stats,
    )

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (32, 16, 3)).astype(np.uint8)
    payload = encode_jpeg(img, 90)
    arr = image_payload_to_array(payload)
    assert arr.shape == (32, 16, 3)
    feats = decode_image(payload)
    assert len(feats) == 8 and 0.0 <= feats[3] <= 1.0
    resized = resize_payload(payload, 8, 8)
    assert is_jpeg(resized)
    assert image_payload_to_array(resized).shape == (8, 8, 3)

    from etl_for_dumdums_spark.operators.jpeg import encode_jpeg_progressive

    media = spark.createDataFrame(
        [
            (1, bytearray(payload)),
            (2, None),
            (3, bytearray(encode_jpeg_progressive(img, 90))),
        ],
        ["media_id", "payload"],
    )
    rows = {r.media_id: r for r in rgb_stats(media).collect()}
    assert rows[1].dec_width == 16 and rows[1].dec_height == 32
    assert rows[1].mean_r is not None
    assert rows[2].mean_r is None
    # the progressive twin decodes IN the kernel to the identical stats
    assert rows[3].dec_width == 16 and rows[3].mean_r == rows[1].mean_r
    assert rows[3].brightness == rows[1].brightness
