"""Pure-numpy image codecs for uncompressed formats (PPM P6, 24-bit
BMP) — the REAL decode kernels behind mm.binary_ops.

Pillow/ffmpeg are not installable in this environment, so compressed
formats (PNG/JPEG/GIF) stay honestly stubbed in binary_ops; these two
formats need no external codec and make the decode → feature-extract →
resize pipeline real end-to-end: header parse, pixel-array decode,
vectorized nearest-neighbor resize, re-encode.
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------- PPM (P6)

def ppm_encode(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6, maxval 255)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("PPM P6 requires 3 channels")
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def ppm_decode(data: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8. Handles comment lines and
    arbitrary whitespace in the header, like a real reader."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    n = w * h * 3
    px = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    return px.reshape(h, w, 3).copy()


# --------------------------------------------------------- BMP (24-bit)

def bmp_encode(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BMP
    (BITMAPINFOHEADER, bottom-up, BGR, 4-byte row padding)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = bytearray()
    bgr = arr[::-1, :, ::-1]  # bottom-up rows, RGB→BGR
    for r in range(h):
        body += bgr[r].tobytes() + b"\x00" * pad
    size = 14 + 40 + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return header + info + bytes(body)


def bmp_decode(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → (h, w, 3) uint8 RGB."""
    if not data.startswith(b"BM"):
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    bottom_up = h > 0
    h = abs(h)
    row = w * 3
    stride = row + (4 - row % 4) % 4
    rows = []
    for r in range(h):
        off = offset + r * stride
        rows.append(np.frombuffer(data, dtype=np.uint8, count=row,
                                  offset=off).reshape(w, 3))
    arr = np.stack(rows)
    if bottom_up:
        arr = arr[::-1]
    return arr[:, :, ::-1].copy()  # BGR→RGB


# ------------------------------------------------------ shared kernels

def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes → (h, w, 3) uint8 RGB. Raises
    NotImplementedError for formats that need an external codec."""
    if data.startswith(b"P6"):
        return ppm_decode(data)
    if data.startswith(b"BM"):
        return bmp_decode(data)
    raise NotImplementedError(
        "only uncompressed PPM/BMP decode in this environment; "
        "PNG/JPEG/GIF need Pillow")


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Vectorized nearest-neighbor resize (the real kernel behind
    binary_ops.resize_images)."""
    h, w = arr.shape[:2]
    yi = np.minimum((np.arange(height) * h) // height, h - 1)
    xi = np.minimum((np.arange(width) * w) // width, w - 1)
    return arr[yi[:, None], xi[None, :]]


def image_features(arr: np.ndarray) -> list[float]:
    """[mean_r, mean_g, mean_b, mean_all] in [0, 1]."""
    means = arr.reshape(-1, 3).mean(axis=0) / 255.0
    return [float(means[0]), float(means[1]), float(means[2]),
            float(means.mean())]
