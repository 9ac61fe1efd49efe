"""Multimodal plumbing: sniff, decode/resize/frame-sample stubs."""

from rustac_spark.mm.binary_ops import (
    extract_image_features, resize_images, sample_video_frames,
    with_binary_meta,
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


def test_decode_resize_framesample_plumbing(spark):
    rows = [("img", bytearray(b"\x89PNG\r\n" + bytes(range(64)))),
            ("vid", bytearray(b"RIFF" + bytes(range(200)))),
            ("bad", bytearray(b"nope"))]
    df = spark.createDataFrame(rows, ["url", "payload"])

    feats = {r["url"]: r for r in extract_image_features(df).collect()}
    assert feats["img"]["width"] and len(feats["img"]["features"]) == 4
    assert feats["bad"]["width"] is None  # graceful non-image handling

    res = {r["url"]: r for r in resize_images(df, 128, 96).collect()}
    assert res["img"]["width"] == 128 and res["img"]["resized"] is not None
    assert res["bad"]["resized"] is None

    frames = sample_video_frames(df).collect()
    by_url = {}
    for r in frames:
        by_url.setdefault(r["url"], []).append(r["frame_idx"])
    assert len(by_url["vid"]) >= 2
    assert by_url["vid"] == sorted(by_url["vid"])
