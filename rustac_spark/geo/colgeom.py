"""Compile driver-captured geometry pieces to pure-Column predicates.

The spatial join's refine step evaluates exact rect x geometry
intersects for polygon-kind queries. The numpy kernels
(predicates.py) run Arrow-batched in mapInPandas — correct, but the
whole candidate stream then pays Arrow serialization + Python worker
time, which measures as the join stage's scaling ceiling at high
parallelism (the Column-only join runs ~3x faster at local[16] on the
bench input than the same join with the Arrow refine attached).

Since the broadcast-join path already captures every polygon's pieces
driver-side (geo/join.py:190-199), small geometries — the common STAC
search contract: a handful of query polygons with tens of vertices —
can instead be compiled into a boolean Column expression evaluated
inside WholeStageCodegen: zero Python, zero Arrow, short-circuited
per row. Geometries past the vertex budget return None and the caller
falls back to the Arrow kernel.

Exactness: every expression reproduces the corresponding numpy kernel
(points_in_polygon ray-cast with the 1e-12 on-edge epsilon,
Liang-Barsky segment clip, hole containment) with the same float64
operation ORDER, so accepted candidate sets are bit-identical to the
Arrow path — locked in by tests/test_colgeom.py property tests.

Reference behaviour compiled here: ST_Intersects residual semantics of
crates/duckdb/src/client.rs:343-359 / crates/core/src/item.rs:457-468.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, functions as F

EPS = 1e-12

# Per-query vertex budget: past this the compiled expression stops
# paying for itself (expression-tree size grows linearly per vertex;
# Janino must split the generated method) and the Arrow kernel is the
# right physical strategy. Tens of vertices is the common case for
# search geometries; continent-outline shapes fall back.
DEFAULT_VERTEX_BUDGET = 96


def _xor(a: Column, b: Column) -> Column:
    """Boolean XOR (both sides non-null by construction)."""
    return a != b


def _close_open(ring) -> list[tuple[float, float]]:
    """Mirror the kernels' ring normalization: drop the closing
    vertex when present; keep open rings as-is."""
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) > 1 and np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    return [(float(x), float(y)) for x, y in ring]


def point_in_ring_col(px: Column, py: Column, ring) -> Column:
    """Column twin of predicates.points_in_polygon for one ring.

    Same crossing rule (half-open), same on-edge epsilon, same float64
    op order: xint = (x2-x1)*(py-y1)/(y2-y1)+x1. When y1 == y2 the
    crossing condition is statically false (numpy evaluates inf/nan
    there but masks it out), so the term is omitted — this also keeps
    the Column expression NULL-free, which the XOR chain requires.
    """
    pts = _close_open(ring)
    n = len(pts)
    inside: Column = F.lit(False)
    on_edge: Column = F.lit(False)
    for i in range(n):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % n]
        if y1 != y2:
            cond = _xor(F.lit(y1) > py, F.lit(y2) > py)
            xint = (F.lit(x2 - x1) * (py - F.lit(y1))
                    / F.lit(y2 - y1) + F.lit(x1))
            inside = _xor(inside, cond & (px < xint))
        cross = (F.lit(x2 - x1) * (py - F.lit(y1))
                 - F.lit(y2 - y1) * (px - F.lit(x1)))
        within = ((F.lit(min(x1, x2) - EPS) <= px)
                  & (px <= F.lit(max(x1, x2) + EPS))
                  & (F.lit(min(y1, y2) - EPS) <= py)
                  & (py <= F.lit(max(y1, y2) + EPS)))
        on_edge = on_edge | ((F.abs(cross) < F.lit(EPS)) & within)
    return inside | on_edge


def segment_hits_rect_col(x1: float, y1: float, x2: float, y2: float,
                          rx0: Column, ry0: Column,
                          rx1: Column, ry1: Column) -> Column:
    """Column twin of predicates._segments_intersect_rects for one
    constant segment vs per-row rects (Liang-Barsky). The p==0 /
    p<0 / p>0 branching resolves at expression-build time because the
    segment is constant."""
    dx, dy = x2 - x1, y2 - y1
    qs = ((-dx, F.lit(x1) - rx0), (dx, rx1 - F.lit(x1)),
          (-dy, F.lit(y1) - ry0), (dy, ry1 - F.lit(y1)))
    ok: Column = F.lit(True)
    t0: Column = F.lit(0.0)
    t1: Column = F.lit(1.0)
    for p, q in qs:
        if p == 0:
            ok = ok & (q >= F.lit(0.0))
        elif p < 0:
            t0 = F.greatest(t0, q / F.lit(p))
        else:
            t1 = F.least(t1, q / F.lit(p))
    return ok & (t0 <= t1)


def _rect_touches_ring_edges(pts, rx0, ry0, rx1, ry1) -> Column:
    out: Column = F.lit(False)
    n = len(pts)
    for i in range(n):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % n]
        out = out | segment_hits_rect_col(x1, y1, x2, y2,
                                          rx0, ry0, rx1, ry1)
    return out


def rect_intersects_ring_col(ring, rx0, ry0, rx1, ry1) -> Column:
    """Column twin of predicates.rects_intersect_polygon: any polygon
    vertex inside the rect, OR any rect corner inside the polygon, OR
    any polygon edge crossing the rect (the numpy masking is a lazy-
    evaluation optimization, not a semantic: plain OR is identical)."""
    pts = _close_open(ring)
    vertex_in = F.lit(False)
    for vx, vy in pts:
        vertex_in = vertex_in | ((rx0 <= F.lit(vx)) & (F.lit(vx) <= rx1)
                                 & (ry0 <= F.lit(vy)) & (F.lit(vy) <= ry1))
    corner_in = F.lit(False)
    for cx, cy in ((rx0, ry0), (rx1, ry0), (rx1, ry1), (rx0, ry1)):
        corner_in = corner_in | point_in_ring_col(cx, cy, pts)
    return vertex_in | corner_in | _rect_touches_ring_edges(
        pts, rx0, ry0, rx1, ry1)


def rect_strictly_inside_ring_col(ring, rx0, ry0, rx1, ry1) -> Column:
    """Column twin of predicates._rect_strictly_inside_ring: all four
    corners inside (inclusive PIP) AND no ring edge touching the
    rect."""
    pts = _close_open(ring)
    inside: Column = F.lit(True)
    for cx, cy in ((rx0, ry0), (rx1, ry0), (rx1, ry1), (rx0, ry1)):
        inside = inside & point_in_ring_col(cx, cy, pts)
    return inside & ~_rect_touches_ring_edges(pts, rx0, ry0, rx1, ry1)


def _n_vertices(pieces) -> int:
    total = 0
    for kind, data in pieces:
        if kind == "point":
            total += 1
        elif kind == "line":
            total += len(data)
        else:
            total += sum(len(ring) for ring in data)
    return total


def compile_pieces_predicate(pieces, rx0: Column, ry0: Column,
                             rx1: Column, ry1: Column,
                             vertex_budget: int = DEFAULT_VERTEX_BUDGET,
                             ) -> Column | None:
    """Boolean Column: does the per-row rect intersect ANY piece —
    the Column twin of predicates.rects_intersect_pieces (union
    semantics of Multi*/GeometryCollection, search.rs:236-251).

    Returns None when the geometry exceeds ``vertex_budget`` vertices
    — the caller keeps the Arrow kernel for that query.
    """
    if _n_vertices(pieces) > vertex_budget:
        return None
    out: Column = F.lit(False)
    for kind, data in pieces:
        if kind == "point":
            x, y = float(data[0]), float(data[1])
            out = out | ((rx0 <= F.lit(x)) & (F.lit(x) <= rx1)
                         & (ry0 <= F.lit(y)) & (F.lit(y) <= ry1))
        elif kind == "line":
            pts = np.asarray(data, dtype=np.float64)
            if len(pts) == 1:
                x, y = float(pts[0][0]), float(pts[0][1])
                out = out | ((rx0 <= F.lit(x)) & (F.lit(x) <= rx1)
                             & (ry0 <= F.lit(y)) & (F.lit(y) <= ry1))
            for i in range(len(pts) - 1):
                out = out | segment_hits_rect_col(
                    float(pts[i][0]), float(pts[i][1]),
                    float(pts[i + 1][0]), float(pts[i + 1][1]),
                    rx0, ry0, rx1, ry1)
        else:  # poly: rings[0] exterior, rest holes
            rings = data
            poly = rect_intersects_ring_col(rings[0], rx0, ry0, rx1, ry1)
            for hole in rings[1:]:
                poly = poly & ~rect_strictly_inside_ring_col(
                    hole, rx0, ry0, rx1, ry1)
            out = out | poly
    return out


def compile_refine_predicate(pieces_by_qid: dict[int, list],
                             inner_by_qid: dict[int, tuple] | None,
                             qid: Column, kind: Column,
                             rx0: Column, ry0: Column,
                             rx1: Column, ry1: Column,
                             vertex_budget: int = DEFAULT_VERTEX_BUDGET,
                             ) -> Column | None:
    """The whole refine filter as one Column, or None if ANY query's
    geometry exceeds the budget (all-or-nothing: a partial compile
    would still drag the full stream through Arrow for the rest, so
    there is nothing to win).

    Matches _mixed_refine row semantics exactly: non-polygon kinds
    pass (rect overlap is already exact for them), polygon kinds take
    the compiled exact test, with the inscribed-rect containment
    accept short-circuiting ahead of it (geo/join.py:96-101).
    """
    case: Column | None = None
    for q, pieces in pieces_by_qid.items():
        expr = compile_pieces_predicate(pieces, rx0, ry0, rx1, ry1,
                                        vertex_budget)
        if expr is None:
            return None
        ir = (inner_by_qid or {}).get(q)
        if ir is not None:
            inside_ir = ((rx0 >= F.lit(float(ir[0])))
                         & (ry0 >= F.lit(float(ir[1])))
                         & (rx1 <= F.lit(float(ir[2])))
                         & (ry1 <= F.lit(float(ir[3]))))
            expr = inside_ir | expr
        case = (F.when(qid == F.lit(q), expr) if case is None
                else case.when(qid == F.lit(q), expr))
    polygon_ok = F.lit(False) if case is None else case.otherwise(
        F.lit(False))
    return (kind != F.lit("polygon")) | polygon_ok
