"""Multimodal column plumbing (north-rule training-data operators).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The decode / feature-extract steps are STUBBED (Pillow/librosa are not
in this container) behind ``NotImplementedError`` or a deterministic
fake — but the Spark-side plumbing (schemas, Arrow batch shapes,
partitioning) is real and tested, so dropping in a real decoder is a
one-function change.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MAGIC = {
    b"<html>": "text/html",
    b"\x89PNG\r\n": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"GIF8": "image/gif",
    b"RIFF": "audio/wav",
}


def with_binary_meta(df: DataFrame, bin_col: str = "html") -> DataFrame:
    """Typed metadata for an opaque binary column — pure Column ops:
    byte length + magic-byte content sniff."""
    b = F.col(bin_col)
    sniff = F.lit("application/octet-stream")
    for magic, mime in MAGIC.items():
        cond = F.expr(
            f"substring({bin_col}, 1, {len(magic)})") == F.lit(bytearray(magic))
        sniff = F.when(cond, F.lit(mime)).otherwise(sniff)
    return (df.withColumn("n_bytes", F.length(b))
            .withColumn("content_type", sniff))


DECODE_SCHEMA = ("url string, width int, height int, channels int, "
                 "features array<float>")


def decode_image_stub(data: bytes) -> tuple[int, int, int, list[float]]:
    """STUB — deterministic fake decode (real impl: PIL.Image.open).
    Raises for non-image payloads like a real decoder would."""
    for magic, mime in MAGIC.items():
        if data.startswith(magic) and mime.startswith("image/"):
            h = sum(data[:16])
            return (64 + h % 512, 64 + (h * 7) % 512, 3,
                    [float((h >> i) & 0xFF) / 255.0 for i in range(0, 32, 8)])
    raise NotImplementedError(
        "real image decoding requires Pillow (not in this container); "
        "payload is not a recognized image format")


def extract_image_features(df: DataFrame, bin_col: str = "payload",
                           url_col: str = "url") -> DataFrame:
    """mapInPandas plumbing for batch image decode → (url, w, h, c,
    features). Batch shape and schema are production-real; the decode
    kernel is the stub above."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, data in zip(pdf[url_col], pdf[bin_col]):
                try:
                    w, h, c, feats = decode_image_stub(bytes(data))
                    rows.append((url, w, h, c, feats))
                except NotImplementedError:
                    rows.append((url, None, None, None, None))
            yield pd.DataFrame(rows, columns=[
                "url", "width", "height", "channels", "features"])

    return df.select(url_col, bin_col).mapInPandas(gen, schema=DECODE_SCHEMA)


def resize_image_stub(data: bytes, width: int, height: int) -> bytes:
    """STUB — deterministic fake resize (real impl: PIL thumbnail).
    Returns a synthetic payload carrying the target dims so the
    pipeline shape (binary→binary, metadata columns updated) is real."""
    for magic, mime in MAGIC.items():
        if data.startswith(magic) and mime.startswith("image/"):
            return magic + width.to_bytes(2, "big") + \
                height.to_bytes(2, "big") + data[:64]
    raise NotImplementedError("not an image payload")


def sample_frames_stub(data: bytes, every_n: int = 30,
                       max_frames: int = 8) -> list[bytes]:
    """STUB — deterministic fake video frame sampling (real impl:
    ffmpeg/pyav). Emits ≤max_frames chunks keyed off payload bytes."""
    n = min(max_frames, max(1, len(data) // max(1, every_n)))
    return [bytes([data[i % len(data)]]) * 4 for i in range(n)]


def resize_images(df: DataFrame, width: int = 256, height: int = 256,
                  bin_col: str = "payload", url_col: str = "url",
                  ) -> DataFrame:
    """Batch resize plumbing: binary→binary with typed size metadata."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, data in zip(pdf[url_col], pdf[bin_col]):
                try:
                    out = resize_image_stub(bytes(data), width, height)
                    rows.append((url, out, width, height))
                except NotImplementedError:
                    rows.append((url, None, None, None))
            yield pd.DataFrame(rows, columns=[
                "url", "resized", "width", "height"])

    return df.select(url_col, bin_col).mapInPandas(
        gen, schema="url string, resized binary, width int, height int")


def sample_video_frames(df: DataFrame, bin_col: str = "payload",
                        url_col: str = "url", every_n: int = 30,
                        ) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame
    (binary video column → exploded frame binaries + frame index)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, data in zip(pdf[url_col], pdf[bin_col]):
                for i, frame in enumerate(
                        sample_frames_stub(bytes(data), every_n)):
                    rows.append((url, i, frame))
            yield pd.DataFrame(rows, columns=["url", "frame_idx", "frame"])

    return df.select(url_col, bin_col).mapInPandas(
        gen, schema="url string, frame_idx int, frame binary")
