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
