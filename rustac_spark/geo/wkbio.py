"""Minimal pure-Python/numpy WKB codec (Point, Polygon).

shapely is not installed in this environment (SURVEY.md §7 "offline
deps"), so geometry travels as WKB BinaryType columns encoded/decoded
here — mirroring the reference's WKB-first discipline
(crates/duckdb/src/client.rs:299-300, crates/core/src/geoarrow/mod.rs:388-403).
Installing shapely later is a drop-in: the column format is standard
little-endian ISO WKB.
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_POLYGON = 3


def point_wkb(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, WKB_POINT, x, y)


def polygon_wkb(ring) -> bytes:
    """ring: sequence of (x, y); caller closes the ring."""
    head = struct.pack("<BIII", 1, WKB_POLYGON, 1, len(ring))
    body = b"".join(struct.pack("<dd", x, y) for x, y in ring)
    return head + body


def bbox_polygon_wkb(xmin: float, ymin: float, xmax: float, ymax: float) -> bytes:
    """5-point closed ring, CCW from SW — mirrors Bbox::to_geometry
    (reference crates/core/src/bbox.rs:164-187)."""
    return polygon_wkb([
        (xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax), (xmin, ymin),
    ])


def parse_wkb(buf: bytes):
    """→ ("point", (x, y)) | ("polygon", ndarray[n,2] exterior ring).

    Only the two types the engine synthesizes; raises on others.
    """
    if buf is None:
        return None
    byteorder = "<" if buf[0] == 1 else ">"
    (gtype,) = struct.unpack_from(f"{byteorder}I", buf, 1)
    if gtype == WKB_POINT:
        x, y = struct.unpack_from(f"{byteorder}dd", buf, 5)
        return ("point", (x, y))
    if gtype == WKB_POLYGON:
        (nrings,) = struct.unpack_from(f"{byteorder}I", buf, 5)
        if nrings < 1:
            return ("polygon", np.zeros((0, 2)))
        (npts,) = struct.unpack_from(f"{byteorder}I", buf, 9)
        arr = np.frombuffer(buf, dtype=f"{byteorder}f8", count=2 * npts, offset=13)
        return ("polygon", arr.reshape(npts, 2).copy())
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def wkb_bounds(buf: bytes):
    """(xmin, ymin, xmax, ymax) of a point/polygon WKB."""
    kind, data = parse_wkb(buf)
    if kind == "point":
        x, y = data
        return (x, y, x, y)
    xs, ys = data[:, 0], data[:, 1]
    return (float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max()))
