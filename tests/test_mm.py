"""Multimodal plumbing: sniff, real PPM/BMP decode/resize kernels,
frame-sample stub."""

import numpy as np

from rustac_spark.mm.binary_ops import (
    extract_image_features, resize_images, sample_video_frames,
    with_binary_meta,
)
from rustac_spark.mm.codecs import (
    bmp_decode, bmp_encode, decode_image, image_features, ppm_decode,
    ppm_encode, resize_nearest,
)


def test_binary_meta_sniff(spark):
    rows = [("a", bytearray(b"<html><body>x</body></html>")),
            ("b", bytearray(b"\x89PNG\r\n" + b"\x00" * 16)),
            ("c", bytearray(b"\xff\xd8\xff" + b"\x00" * 16)),
            ("d", bytearray(b"garbage"))]
    df = spark.createDataFrame(rows, ["url", "html"])
    out = {r["url"]: (r["content_type"], r["n_bytes"])
           for r in with_binary_meta(df).collect()}
    assert out["a"][0] == "text/html"
    assert out["b"][0] == "image/png"
    assert out["c"][0] == "image/jpeg"
    assert out["d"][0] == "application/octet-stream"
    assert out["d"][1] == 7


def _checker(h, w):
    arr = np.zeros((h, w, 3), dtype=np.uint8)
    arr[::2, ::2] = [250, 10, 30]
    arr[1::2, 1::2] = [0, 200, 90]
    return arr


def test_codec_roundtrips():
    arr = _checker(7, 5)
    assert np.array_equal(ppm_decode(ppm_encode(arr)), arr)
    assert np.array_equal(bmp_decode(bmp_encode(arr)), arr)
    # PPM header with comments parses
    withc = b"P6\n# a comment\n5 7\n255\n" + arr.tobytes()
    assert np.array_equal(ppm_decode(withc), arr)
    # magic dispatch
    assert np.array_equal(decode_image(bmp_encode(arr)), arr)
    feats = image_features(arr)
    assert len(feats) == 4 and all(0.0 <= f <= 1.0 for f in feats)


def test_resize_nearest_exact():
    arr = _checker(8, 8)
    half = resize_nearest(arr, 4, 4)
    assert half.shape == (4, 4, 3)
    # nearest with integer ratio picks every second pixel
    assert np.array_equal(half, arr[::2, ::2])
    up = resize_nearest(arr, 16, 16)
    assert np.array_equal(up[::2, ::2], arr)


def test_decode_resize_framesample_plumbing(spark):
    ppm = ppm_encode(_checker(6, 4))
    bmp = bmp_encode(np.full((3, 5, 3), 100, dtype=np.uint8))
    rows = [("ppm", bytearray(ppm)), ("bmp", bytearray(bmp)),
            ("png", bytearray(b"\x89PNG\r\n" + bytes(range(64)))),
            ("vid", bytearray(b"RIFF" + bytes(range(200)))),
            ("bad", bytearray(b"nope"))]
    df = spark.createDataFrame(rows, ["url", "payload"])

    feats = {r["url"]: r for r in extract_image_features(df).collect()}
    assert (feats["ppm"]["width"], feats["ppm"]["height"]) == (4, 6)
    assert (feats["bmp"]["width"], feats["bmp"]["height"]) == (5, 3)
    assert abs(feats["bmp"]["features"][3] - 100 / 255) < 1e-6
    assert feats["png"]["width"] is None  # honest stub: needs Pillow
    assert feats["bad"]["width"] is None  # graceful non-image handling

    res = {r["url"]: r for r in resize_images(df, 128, 96).collect()}
    assert res["ppm"]["width"] == 128 and res["ppm"]["resized"] is not None
    # resized output is a decodable PPM of the target size
    out = ppm_decode(bytes(res["ppm"]["resized"]))
    assert out.shape == (96, 128, 3)
    assert res["bad"]["resized"] is None

    frames = sample_video_frames(df).collect()
    by_url = {}
    for r in frames:
        by_url.setdefault(r["url"], []).append(r["frame_idx"])
    assert len(by_url["vid"]) >= 2
    assert by_url["vid"] == sorted(by_url["vid"])
