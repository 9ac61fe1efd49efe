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
    kind, rings = parse_wkb(bbox_polygon_wkb(0, 0, 2, 3))
    assert kind == "polygon" and len(rings) == 1 and rings[0].shape == (5, 2)
    assert wkb_bounds(bbox_polygon_wkb(0, 0, 2, 3)) == (0, 0, 2, 3)
    assert is_axis_aligned_rect_ring(rings[0])


def test_rects_intersect_polygon_holes():
    from rustac_spark.geo.predicates import rects_intersect_polygon_holes
    # unit donut: outer 0..10, hole 3..7
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole = np.array([[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]], float)
    rx0 = np.array([1.0, 4.0, 2.0, 11.0, 4.0])
    ry0 = np.array([1.0, 4.0, 2.0, 11.0, 4.0])
    rx1 = np.array([2.0, 6.0, 8.0, 12.0, 7.0])
    ry1 = np.array([2.0, 6.0, 8.0, 12.0, 7.0])
    got = rects_intersect_polygon_holes(rx0, ry0, rx1, ry1, [outer, hole])
    # in-ring, fully-in-hole, spans-hole, outside, touches hole boundary
    assert got.tolist() == [True, False, True, False, True]


def test_rects_intersect_pieces():
    from rustac_spark.geo.predicates import rects_intersect_pieces
    from rustac_spark.geo.wkbio import geometry_pieces, parse_wkb, \
        multipolygon_wkb, linestring_wkb, multipoint_wkb
    rx0 = np.array([0.0, 5.0, 20.0])
    ry0 = np.array([0.0, 5.0, 20.0])
    rx1 = np.array([1.0, 6.0, 21.0])
    ry1 = np.array([1.0, 6.0, 21.0])
    mp = multipolygon_wkb([
        [[(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]],
        [[(5, 5), (7, 5), (7, 7), (5, 7), (5, 5)]]])
    got = rects_intersect_pieces(rx0, ry0, rx1, ry1,
                                 geometry_pieces(parse_wkb(mp)))
    assert got.tolist() == [True, True, False]
    # diagonal line crosses only the first rect
    line = linestring_wkb([(-1, -1), (2, 2)])
    got = rects_intersect_pieces(rx0, ry0, rx1, ry1,
                                 geometry_pieces(parse_wkb(line)))
    assert got.tolist() == [True, False, False]
    pts = multipoint_wkb([(0.5, 0.5), (20.5, 20.5)])
    got = rects_intersect_pieces(rx0, ry0, rx1, ry1,
                                 geometry_pieces(parse_wkb(pts)))
    assert got.tolist() == [True, False, True]


def test_wkb_all_types_roundtrip():
    from rustac_spark.geo.wkbio import (
        geojson_to_wkb, geometry_pieces, parse_wkb, wkb_bounds)
    gj = {"type": "GeometryCollection", "geometries": [
        {"type": "Point", "coordinates": [1, 2]},
        {"type": "LineString", "coordinates": [[0, 0], [3, 4]]},
        {"type": "Polygon", "coordinates": [
            [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
            [[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]]]},
        {"type": "MultiPolygon", "coordinates": [
            [[[0, 0], [1, 0], [1, 1], [0, 0]]],
            [[[5, 5], [6, 5], [6, 6], [5, 5]]]]},
    ]}
    wkb = geojson_to_wkb(gj)
    kind, subs = parse_wkb(wkb)
    assert kind == "geometrycollection" and len(subs) == 4
    assert subs[2][0] == "polygon" and len(subs[2][1]) == 2  # holes kept
    pieces = geometry_pieces((kind, subs))
    assert [k for k, _ in pieces] == ["point", "line", "poly", "poly", "poly"]
    assert wkb_bounds(wkb) == (0.0, 0.0, 10.0, 10.0)


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
