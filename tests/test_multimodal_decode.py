"""Pure-numpy PPM decode path (multimodal.decode_image / image_features).

PPM P6 is raw RGB behind a text header — decodable with no codec library,
which turns the multimodal decode step from a declared stub into a real,
oracle-checkable pipeline for at least one image format.
"""

import numpy as np
import pytest

from graphriccicurvature_spark.operators.multimodal import (
    decode_image,
    encode_ppm,
    image_feature_vector,
    image_features,
    resize_nearest,
)


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_roundtrip_exact():
    img = _img(13, 7, seed=3)
    assert np.array_equal(decode_image(encode_ppm(img)), img)


def test_header_comments_and_whitespace():
    img = _img(2, 3, seed=1)
    payload = b"P6\n# a comment\n 3\t2\n# another\n255\n" + img.tobytes()
    assert np.array_equal(decode_image(payload), img)


def test_first_pixel_byte_can_be_whitespace_value():
    # pixel data starting with 0x0A (newline byte) must not be skipped:
    # exactly ONE whitespace byte follows maxval
    img = np.full((1, 2, 3), 10, dtype=np.uint8)  # 10 == ord('\n')
    assert np.array_equal(decode_image(encode_ppm(img)), img)


def test_foreign_and_corrupt_payloads():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(ValueError):
        decode_image(b"P6\n4 4\n255\nshort")
    with pytest.raises(ValueError):
        decode_image(b"P6\n2 2\n65535\n" + b"\x00" * 12)


def test_resize_nearest_shapes_and_determinism():
    img = _img(10, 20, seed=2)
    out = resize_nearest(img, 5, 4)
    assert out.shape == (5, 4, 3)
    # exact pixel provenance: nearest sample at floor(i*h/out_h)
    assert np.array_equal(out[0, 0], img[0, 0])
    assert np.array_equal(out[4, 3], img[8, 15])


def test_feature_vector_values():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[..., 0] = 255  # pure red
    f = image_feature_vector(img, hist_bins=8)
    assert f.shape == (11,)
    assert f[0] == pytest.approx(1.0) and f[1] == 0.0 and f[2] == 0.0
    # luma of pure red = 0.299*255 ≈ 76.2 -> bin 2 of 8 (width 31.875)
    assert f[3 + 2] == pytest.approx(1.0)


def test_image_features_spark_with_error_rows(spark):
    good = encode_ppm(_img(4, 6, seed=5))
    rows = [(0, bytearray(good)), (1, bytearray(b"GIF89a...")), (2, None)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r["id"]: r for r in image_features(df, "id", "payload").collect()}
    assert out[0]["width"] == 6 and out[0]["height"] == 4
    assert out[0]["decode_error"] is None and len(out[0]["features"]) == 11
    assert out[1]["features"] is None and "magic" in out[1]["decode_error"]
    assert out[2]["features"] is None
    # one bad payload never fails the stage — that's the 100 TB contract


def test_image_features_resize(spark):
    img = _img(16, 16, seed=7)
    df = spark.createDataFrame([(0, bytearray(encode_ppm(img)))], "id long, payload binary")
    r = image_features(df, "id", "payload", resize_to=(4, 4)).first()
    assert r["width"] == 4 and r["height"] == 4
    expect = image_feature_vector(resize_nearest(img, 4, 4))
    assert np.allclose(r["features"], expect, atol=1e-6)
