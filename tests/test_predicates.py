"""Pure-numpy geometric kernels."""

import numpy as np

from rustac_spark.geo.predicates import (
    is_axis_aligned_rect_ring, points_in_polygon, rects_intersect_polygon,
)
from rustac_spark.geo.wkbio import (
    bbox_polygon_wkb, parse_wkb, point_wkb, wkb_bounds,
)


def test_wkb_roundtrip():
    kind, (x, y) = parse_wkb(point_wkb(1.5, -2.5))
    assert kind == "point" and (x, y) == (1.5, -2.5)
    kind, ring = parse_wkb(bbox_polygon_wkb(0, 0, 2, 3))
    assert kind == "polygon" and ring.shape == (5, 2)
    assert wkb_bounds(bbox_polygon_wkb(0, 0, 2, 3)) == (0, 0, 2, 3)
    assert is_axis_aligned_rect_ring(ring)


def test_points_in_polygon_triangle():
    ring = np.array([[0, 0], [4, 0], [2, 4], [0, 0]])
    px = np.array([2.0, 2.0, 5.0, 0.0, 2.0])
    py = np.array([1.0, 3.9, 1.0, 0.0, 0.0])
    got = points_in_polygon(px, py, ring)
    # interior, near-apex interior, outside, vertex (boundary), edge (boundary)
    assert got.tolist() == [True, True, False, True, True]


def test_rects_intersect_polygon_cases():
    ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
    rx0 = np.array([2.0, -5.0, 20.0, -1.0, 4.0])
    ry0 = np.array([2.0, -5.0, 20.0, 4.0, -1.0])
    rx1 = np.array([3.0, 15.0, 21.0, 0.5, 5.0])
    ry1 = np.array([3.0, 15.0, 21.0, 5.0, 0.5])
    got = rects_intersect_polygon(rx0, ry0, rx1, ry1, ring)
    # inside, contains-polygon, disjoint, crosses-left-edge, crosses-bottom
    assert got.tolist() == [True, True, False, True, True]


def test_thin_polygon_through_rect_no_vertices_inside():
    # degenerate-ish sliver crossing a rect with no vertex containment
    ring = np.array([[-5, 4.9], [15, 4.9], [15, 5.1], [-5, 5.1], [-5, 4.9]])
    got = rects_intersect_polygon(
        np.array([0.0]), np.array([0.0]), np.array([10.0]), np.array([10.0]),
        ring)
    assert got.tolist() == [True]
