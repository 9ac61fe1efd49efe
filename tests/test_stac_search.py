"""Golden-count search tests — ports the reference's DuckDB client test
table 1:1 (crates/duckdb/src/client.rs:726-1036; expected values in
BASELINE.md) against our synthetic 100-item fixture."""

import pytest

from rustac_spark.geo.wkbio import point_wkb, polygon_wkb
from rustac_spark.stac.search import (
    QueryNotImplemented, Search, SearchValidationError, build_plan,
)


def run(df, **kw):
    return build_plan(df, Search(**kw))


def test_default_search_100(stac_items):
    assert run(stac_items).count() == 100


def test_ids(stac_items):
    out = run(stac_items, ids=["item-0042"]).collect()
    assert len(out) == 1 and out[0]["id"] == "item-0042"


def test_collections(stac_items):
    assert run(stac_items, collections=["collection-a"]).count() == 100
    assert run(stac_items, collections=["foobar"]).count() == 0


def test_bbox_50(stac_items):
    assert run(stac_items, bbox=[-106.1, 40.5, -106.0, 40.6]).count() == 50


def test_intersects_point_50(stac_items):
    assert run(stac_items, intersects=point_wkb(-106.0, 40.5)).count() == 50
    assert run(stac_items,
               intersects={"type": "Point", "coordinates": [-106.0, 40.5]}
               ).count() == 50


def test_intersects_nonrect_polygon(stac_items):
    # triangle around the 50-item cluster — exercises the refine kernel
    tri = polygon_wkb([(-107, 39.5), (-105, 39.5), (-106, 41.5), (-107, 39.5)])
    assert run(stac_items, intersects=tri).count() == 50


def test_intersects_multipolygon(stac_items):
    # country-outline shape: two disjoint rects, one over the cluster
    mp = {"type": "MultiPolygon", "coordinates": [
        [[[-106.1, 40.5], [-106.0, 40.5], [-106.0, 40.6],
          [-106.1, 40.6], [-106.1, 40.5]]],
        [[[10, 10], [11, 10], [11, 11], [10, 11], [10, 10]]],
    ]}
    assert run(stac_items, intersects=mp).count() == 50


def test_intersects_linestring(stac_items):
    # horizontal line through the cluster's latitude band
    ls = {"type": "LineString",
          "coordinates": [[-106.2, 40.5], [-105.9, 40.5]]}
    n = run(stac_items, intersects=ls).count()
    assert 0 < n <= 50
    far = {"type": "LineString", "coordinates": [[10, 10], [11, 11]]}
    assert run(stac_items, intersects=far).count() == 0


def test_intersects_geometrycollection(stac_items):
    gc = {"type": "GeometryCollection", "geometries": [
        {"type": "Point", "coordinates": [-106.0, 40.5]},
        {"type": "Polygon",
         "coordinates": [[[10, 10], [11, 10], [11, 11], [10, 10]]]},
    ]}
    assert run(stac_items, intersects=gc).count() == 50


def test_intersects_empty_geometrycollection(stac_items):
    # GeoJSON-legal empty collection intersects nothing (no crash)
    gc = {"type": "GeometryCollection", "geometries": []}
    assert run(stac_items, intersects=gc).count() == 0


def test_cql2_s_intersects_filter(stac_items):
    assert run(stac_items,
               filter="s_intersects(geometry, "
                      "BBOX(-106.1, 40.5, -106.0, 40.6))").count() == 50
    # non-rect polygon → prefilter + exact refine path
    assert run(stac_items,
               filter="s_intersects(geometry, POLYGON((-107 39.5, -105 39.5,"
                      " -106 41.5, -107 39.5)))").count() == 50
    # combined with an attribute predicate
    n = run(stac_items,
            filter="s_intersects(geometry, BBOX(-106.1, 40.5, -106.0, 40.6))"
                   " and eo:cloud_cover < 50").count()
    assert 0 < n < 50


def test_bbox_3d_z_validation(stac_items):
    assert run(stac_items,
               bbox=[-106.1, 40.5, 0.0, -106.0, 40.6, 100.0]).count() == 50
    with pytest.raises(SearchValidationError):
        Search(bbox=[-106.1, 40.5, 100.0, -106.0, 40.6, 0.0]).validate()


def test_datetime_open_ranges_1_99(stac_items):
    assert run(stac_items, datetime="2024-12-02T00:00:00Z/..").count() == 1
    assert run(stac_items, datetime="../2024-12-02T00:00:00Z").count() == 99


def test_datetime_interval_coalesce(stac_items_interval):
    out = run(stac_items_interval, datetime="2026-04-15T00:00:00Z").collect()
    assert len(out) == 1 and out[0]["id"] == "int-0000"


def test_datetime_partial_year(stac_items):
    assert run(stac_items, datetime="2024").count() == 100
    assert run(stac_items, datetime="2023").count() == 0


def test_limit_offset(stac_items):
    assert run(stac_items, limit=42).count() == 42
    out = run(stac_items, sortby="id", limit=1, offset=1).collect()
    assert out[0]["id"] == "item-0001"


def test_sortby_asc_desc(stac_items):
    asc = run(stac_items, sortby="datetime", limit=1).collect()
    assert asc[0]["id"] == "item-0000"
    desc = run(stac_items, sortby="-datetime", limit=1).collect()
    assert desc[0]["id"] == "item-0099"


def test_sortby_nulls_last_both_directions(spark):
    # DuckDB (the reference's engine) sorts NULLs last under ASC and
    # DESC alike (default_null_order) — parity check on a null-bearing
    # sort column
    df = spark.createDataFrame(
        [("a", 2.0), ("b", None), ("c", 1.0)], "id string, v double")
    asc = [r["id"] for r in run(df, sortby="v").collect()]
    assert asc == ["c", "a", "b"]
    desc = [r["id"] for r in run(df, sortby="-v").collect()]
    assert desc == ["a", "c", "b"]


def test_fields_single_column(stac_items):
    out = run(stac_items, fields="+id", limit=1)
    assert out.columns == ["id"]


def test_fields_exclude(stac_items):
    out = run(stac_items, fields="-geometry,-links")
    assert "geometry" not in out.columns and "id" in out.columns


def test_cql2_filter_49(stac_items):
    assert run(stac_items, filter="sat:relative_orbit = 98").count() == 49


def test_cql2_unknown_column_short_circuit(stac_items):
    df = run(stac_items, filter="foo:bar = 42")
    assert df.count() == 0
    # plan-time: optimized plan collapses to an empty LocalRelation scan
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in plan or "Filter false" in plan


def test_cql2_combined(stac_items):
    n = run(stac_items,
            filter="sat:relative_orbit = 98 and eo:cloud_cover < 50").count()
    assert 0 < n < 49


def test_validation_errors(stac_items):
    with pytest.raises(SearchValidationError):
        Search(bbox=[1, 2, 3]).validate()
    with pytest.raises(SearchValidationError):
        Search(bbox=[2, 0, 1, 1]).validate()
    with pytest.raises(SearchValidationError):
        Search(bbox=[0, 0, 1, 1],
               intersects=point_wkb(0, 0)).validate()
    with pytest.raises(QueryNotImplemented):
        Search(query={"eo:cloud_cover": {"lt": 10}}).validate()


def test_collections_extent_agg(stac_items):
    from pyspark.sql import functions as F
    agg = (stac_items.groupBy("collection")
           .agg(F.min("bbox.xmin").alias("xmin"),
                F.min("bbox.ymin").alias("ymin"),
                F.max("bbox.xmax").alias("xmax"),
                F.max("bbox.ymax").alias("ymax"),
                F.min(F.coalesce("start_datetime", "datetime")).alias("t0"),
                F.max(F.coalesce("end_datetime", "datetime")).alias("t1")))
    rows = agg.collect()
    assert len(rows) == 1 and rows[0]["collection"] == "collection-a"
