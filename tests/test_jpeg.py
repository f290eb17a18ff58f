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
def test_decodes_real_libjpeg_baseline_photos():
    """Third-party interop: photos encoded by libjpeg (4:2:0 subsampled,
    baseline) must decode to their SOF dimensions with plausible content.
    Progressive streams must hit the honest gate, not a wrong answer."""
    decoded = 0
    for path in SPARK_IMAGES:
        data = open(path, "rb").read()
        assert is_jpeg(data)
        try:
            a = decode_jpeg(data)
        except NotImplementedError as e:
            assert "SOF2" in str(e) or "out of scope" in str(e)
            continue
        decoded += 1
        h, w, ch = a.shape
        assert ch == 3 and h > 8 and w > 8
        # plausible photo statistics: not blank, not saturated noise
        assert 10.0 < float(a.mean()) < 245.0
        assert float(a.std()) > 10.0
    assert decoded >= 4, "expected at least 4 baseline sample photos to decode"


def test_progressive_gate_message_names_the_scope():
    # minimal SOI + SOF2 header → must raise the honest gate, not ValueError
    sof2 = b"\xff\xd8" + b"\xff\xc2" + (17).to_bytes(2, "big") + bytes(15)
    with pytest.raises(NotImplementedError):
        decode_jpeg(sof2)


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

    media = spark.createDataFrame(
        [(1, bytearray(payload)), (2, None)], ["media_id", "payload"]
    )
    rows = {r.media_id: r for r in rgb_stats(media).collect()}
    assert rows[1].dec_width == 16 and rows[1].dec_height == 32
    assert rows[1].mean_r is not None
    assert rows[2].mean_r is None
