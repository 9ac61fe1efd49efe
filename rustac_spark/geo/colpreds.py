"""Shared bbox-struct Column predicates — the single home for the
engine's pushdown-friendly spatial fast paths, used by both the
search planner (stac/search.py) and the CQL2 compiler (stac/cql2.py).

Every item table carries the bbox struct covering index
(crates/core/src/geoparquet.rs:397-435); these predicates compile
against it so Catalyst pushes them into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .predicates import is_axis_aligned_rect_ring


def bbox_overlap_col(qxmin, qymin, qxmax, qymax):
    """Inclusive rect-overlap vs the item bbox struct columns.
    NULL bbox ⇒ NULL ⇒ filtered (null-geometry-never-matches,
    crates/core/src/item.rs:461-467)."""
    return ((F.col("bbox.xmin") <= F.lit(qxmax))
            & (F.col("bbox.xmax") >= F.lit(qxmin))
            & (F.col("bbox.ymin") <= F.lit(qymax))
            & (F.col("bbox.ymax") >= F.lit(qymin)))


def point_in_bbox_col(x, y):
    return ((F.col("bbox.xmin") <= F.lit(x)) & (F.col("bbox.xmax") >= F.lit(x))
            & (F.col("bbox.ymin") <= F.lit(y)) & (F.col("bbox.ymax") >= F.lit(y)))


def pieces_column_pred(pieces: list):
    """Pure-Column fast path for an intersects geometry: OR of
    point-in-bbox / rect-overlap predicates over the geometry's
    pieces (wkbio.geometry_pieces output).

    Returns None when any piece needs the exact refine kernel
    (non-rectangular polygon or a line). An EMPTY piece list — a
    GeoJSON-legal empty GeometryCollection — intersects nothing and
    compiles to a constant false predicate."""
    if not pieces:
        return F.lit(False)
    cols = []
    for kind, data in pieces:
        if kind == "point":
            cols.append(point_in_bbox_col(*data))
        elif kind == "poly" and len(data) == 1 \
                and is_axis_aligned_rect_ring(data[0]):
            r = data[0]
            cols.append(bbox_overlap_col(float(r[:, 0].min()),
                                         float(r[:, 1].min()),
                                         float(r[:, 0].max()),
                                         float(r[:, 1].max())))
        else:
            return None
    out = cols[0]
    for c in cols[1:]:
        out = out | c
    return out
