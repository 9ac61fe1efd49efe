"""Property-based tests (hypothesis) for the pure kernels — robustness
beyond the fixture corpus (the reference has no property tests;
SURVEY.md §5 notes that gap)."""

import numpy as np
from hypothesis import assume, given, settings, strategies as st

from rustac_spark.geo.predicates import (
    points_in_polygon, rects_intersect_polygon,
)
from rustac_spark.geo.wkbio import bbox_polygon_wkb, parse_wkb, wkb_bounds
from rustac_spark.stac.datetime_parse import (
    DatetimeParseError, normalize, parse_interval,
)
from rustac_spark.textops.minhash import minhash_signature, shingles

lat = st.floats(min_value=-84.0, max_value=84.0, allow_nan=False)
lon = st.floats(min_value=-179.0, max_value=179.0, allow_nan=False)
size = st.floats(min_value=1e-6, max_value=2.0, allow_nan=False)


@given(lon, lat, size, size)
@settings(max_examples=200, deadline=None)
def test_wkb_bbox_roundtrip(x, y, w, h):
    wkb = bbox_polygon_wkb(x, y, x + w, y + h)
    assert wkb_bounds(wkb) == (x, y, x + w, y + h)
    kind, rings = parse_wkb(wkb)
    assert kind == "polygon" and len(rings) == 1 and rings[0].shape == (5, 2)


@given(lon, lat, size, size, lon, lat)
@settings(max_examples=200, deadline=None)
def test_rect_polygon_consistency(x, y, w, h, px, py):
    """A point inside a rect-ring ⇒ the degenerate rect at that point
    intersects the polygon, and PIP agrees."""
    # stay clear of the intentional 1e-12 boundary-touch tolerance
    # (ST_Intersects counts touching; kernels use an epsilon band)
    for edge in (x, x + w):
        assume(abs(px - edge) > 1e-9)
    for edge in (y, y + h):
        assume(abs(py - edge) > 1e-9)
    ring = np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h],
                     [x, y]])
    inside = bool(points_in_polygon(
        np.array([px]), np.array([py]), ring)[0])
    rect_hit = bool(rects_intersect_polygon(
        np.array([px]), np.array([py]), np.array([px]), np.array([py]),
        ring)[0])
    expected = (x <= px <= x + w) and (y <= py <= y + h)
    assert inside == expected == rect_hit


@given(st.integers(min_value=1583, max_value=9999),
       st.integers(min_value=1, max_value=12))
@settings(max_examples=100, deadline=None)
def test_datetime_partial_expansion_invariants(year, month):
    s, e = parse_interval(f"{year:04d}-{month:02d}")
    assert s.year == e.year == year and s.month == e.month == month
    assert s.day == 1 and (s.hour, s.minute, s.second) == (0, 0, 0)
    assert (e.hour, e.minute, e.second) == (23, 59, 59)
    assert s <= e
    # normalize is idempotent on its own output's halves
    n = normalize(f"{year:04d}-{month:02d}")
    a, b = n.split("/")
    assert normalize(a) == a and normalize(b) == b


@given(st.text(min_size=0, max_size=200))
@settings(max_examples=100, deadline=None)
def test_minhash_deterministic_and_bounded(text):
    s1 = minhash_signature(text)
    s2 = minhash_signature(text)
    assert (s1 == s2).all() and len(s1) == 64
    assert shingles(text) == shingles(text)


@given(st.text(alphabet="abc/.-:0123456789TZ ", max_size=30))
@settings(max_examples=200, deadline=None)
def test_parse_interval_never_crashes_unexpectedly(s):
    """Garbage either parses to a valid interval or raises the typed
    error — never an arbitrary exception."""
    try:
        start, end = parse_interval(s)
        if start is not None and end is not None:
            assert start <= end
    except DatetimeParseError:
        pass
