"""Validation + translate/migrate parity tests (reference test model:
spec-example roundtrips, crates/core/src/item.rs:837-855;
validator corpus, crates/validate/tests/examples.rs)."""

import json
import os

from pyspark.sql import functions as F

from rustac_spark.stac.translate import (
    flatten_items, migrate_1_0_to_1_1, migrate_item,
    read_stac_geoparquet_metadata, unflatten_items, write_stac_geoparquet,
)
from rustac_spark.stac.validate import validate_json_column, validate_value

GOOD_ITEM = {
    "type": "Feature", "stac_version": "1.1.0", "id": "x1",
    "geometry": {"type": "Point", "coordinates": [0, 0]},
    "bbox": [0, 0, 0, 0],
    "properties": {"datetime": "2024-01-01T00:00:00Z"},
    "links": [], "assets": {"data": {"href": "s3://b/k"}},
}

GOOD_CATALOG = {"type": "Catalog", "stac_version": "1.1.0", "id": "cat",
                "description": "d", "links": []}

GOOD_COLLECTION = {
    "type": "Collection", "stac_version": "1.1.0", "id": "c",
    "description": "d", "license": "other",
    "extent": {"spatial": {"bbox": [[0, 0, 1, 1]]},
               "temporal": {"interval": [[None, None]]}},
    "links": [],
}


def test_validate_good_values():
    assert validate_value(GOOD_ITEM) == []
    assert validate_value(GOOD_CATALOG) == []
    assert validate_value(GOOD_COLLECTION) == []


def test_validate_catches_errors():
    bad = dict(GOOD_ITEM, id="")
    assert validate_value(bad)
    # null datetime requires start/end (item-spec rule the reference
    # fixtures exercise via the sentinel-1 interval items)
    bad2 = json.loads(json.dumps(GOOD_ITEM))
    bad2["properties"] = {"datetime": None}
    assert validate_value(bad2)
    ok2 = json.loads(json.dumps(GOOD_ITEM))
    ok2["properties"] = {"datetime": None,
                         "start_datetime": "2024-01-01T00:00:00Z",
                         "end_datetime": "2024-02-01T00:00:00Z"}
    assert validate_value(ok2) == []
    # geometry without bbox
    bad3 = json.loads(json.dumps(GOOD_ITEM))
    del bad3["bbox"]
    assert validate_value(bad3)
    assert validate_value({"type": "Nope"})


def test_validate_common_metadata_and_extensions():
    base = json.loads(json.dumps(GOOD_ITEM))
    base["properties"]["gsd"] = -1.0
    assert any("gsd" in e or "-1" in e for e in validate_value(base))
    base = json.loads(json.dumps(GOOD_ITEM))
    base["properties"]["instruments"] = "oli"  # must be array<string>
    assert validate_value(base)
    base = json.loads(json.dumps(GOOD_ITEM))
    base["properties"]["bands"] = [{"name": ""}]
    assert validate_value(base)
    # extension schema: eo cloud cover out of range only flags when the
    # extension is declared (resolver semantics)
    bad_cc = json.loads(json.dumps(GOOD_ITEM))
    bad_cc["properties"]["eo:cloud_cover"] = 150
    assert validate_value(bad_cc) == []  # eo not declared → unchecked
    bad_cc["stac_extensions"] = [
        "https://stac-extensions.github.io/eo/v1.1.0/schema.json"]
    assert validate_value(bad_cc)
    bad_cc["properties"]["eo:cloud_cover"] = 50
    assert validate_value(bad_cc) == []
    # sat extension
    sat = json.loads(json.dumps(GOOD_ITEM))
    sat["stac_extensions"] = [
        "https://stac-extensions.github.io/sat/v1.0.0/schema.json"]
    sat["properties"]["sat:orbit_state"] = "sideways"
    assert validate_value(sat)
    # unknown extension URL: skipped, not an error
    unk = json.loads(json.dumps(GOOD_ITEM))
    unk["stac_extensions"] = ["https://example.com/custom/v9/schema.json"]
    assert validate_value(unk) == []


def test_validate_distributed(spark):
    rows = [("a", json.dumps(GOOD_ITEM)),
            ("b", json.dumps(dict(GOOD_ITEM, type="Wrong"))),
            ("c", "{not json")]
    df = spark.createDataFrame(rows, ["id", "item_json"])
    out = {r["id"]: r for r in validate_json_column(df).collect()}
    assert out["a"]["valid"] and not out["b"]["valid"]
    assert not out["c"]["valid"] and "invalid JSON" in out["c"]["errors"][0]


def test_flatten_unflatten_roundtrip(spark):
    df = spark.createDataFrame(
        [("Feature", "1.0.0", "i1", "c1",
          {"datetime": "2024-01-01T00:00:00Z", "eo:cloud_cover": "7",
           # property name colliding with reserved key is dropped
           "id": "SHOULD_BE_DROPPED"}),
         ],
        "type string, stac_version string, id string, collection string, "
        "properties map<string,string>")
    # map → struct for a deterministic schema
    df = df.withColumn("properties", F.struct(
        F.col("properties")["datetime"].alias("datetime"),
        F.col("properties")["eo:cloud_cover"].alias("eo:cloud_cover"),
        F.col("properties")["id"].alias("id")))
    flat = flatten_items(df)
    assert "datetime" in flat.columns and "eo:cloud_cover" in flat.columns
    assert flat.columns.count("id") == 1  # reserved-name conflict dropped
    nested = unflatten_items(flat)
    row = nested.collect()[0]
    assert row["properties"]["datetime"] == "2024-01-01T00:00:00Z"
    assert row["properties"]["eo:cloud_cover"] == "7"
    assert row["id"] == "i1"


def test_migrate(spark):
    df = spark.createDataFrame(
        [("1.0.0", "various", "b1"), ("1.0.0", "MIT", "b2")],
        "stac_version string, license string, `eo:bands` string")
    out = migrate_1_0_to_1_1(df).collect()
    assert all(r["stac_version"] == "1.1.0" for r in out)
    assert sorted(r["license"] for r in out) == ["MIT", "other"]
    assert "bands" in migrate_1_0_to_1_1(df).columns


def test_migrate_item_bands():
    # mirrors the reference's migrate_bands semantics
    # (crates/core/src/migrate.rs:122-213): eo/raster band merge with
    # key prefixing + common-value hoist to the asset
    item = {
        "type": "Feature", "stac_version": "1.0.0", "id": "m1",
        "properties": {"license": "proprietary"},
        "links": [{"rel": "self", "href": "/data/m1.json"},
                  {"rel": "root", "href": "/data/"}],
        "assets": {"data": {
            "href": "s3://b/k",
            "eo:bands": [
                {"name": "B1", "common_name": "blue",
                 "center_wavelength": 0.47},
                {"name": "B2", "common_name": "blue",
                 "center_wavelength": 0.56},
            ],
            "raster:bands": [
                {"data_type": "uint16", "scale": 0.0001},
                {"data_type": "uint16", "scale": 0.0001},
            ],
        }},
    }
    out = migrate_item(item)
    assert out["stac_version"] == "1.1.0"
    asset = out["assets"]["data"]
    assert "eo:bands" not in asset and "raster:bands" not in asset
    # common values hoisted to the asset...
    assert asset["eo:common_name"] == "blue"
    assert asset["data_type"] == "uint16"
    assert asset["raster:scale"] == 0.0001
    # ...distinct per-band values stay in bands, "name" unprefixed
    assert asset["bands"] == [
        {"name": "B1", "eo:center_wavelength": 0.47},
        {"name": "B2", "eo:center_wavelength": 0.56},
    ]
    # self link absolutized, other links untouched
    assert out["links"][0]["href"] == "file:///data/m1.json"
    assert out["links"][1]["href"] == "/data/"
    # license migrated inside properties for Features
    assert out["properties"]["license"] == "other"
    # input not mutated
    assert item["stac_version"] == "1.0.0"
    assert "eo:bands" in item["assets"]["data"]


def test_coerce_item_columns(spark):
    from rustac_spark.stac.translate import coerce_item_columns
    df = spark.createDataFrame(
        [(42, '["https://stac-extensions.github.io/eo/v1.1.0/schema.json"]',
          "NotFeature")],
        "id bigint, stac_extensions string, type string")
    out = coerce_item_columns(df).collect()[0]
    assert out["id"] == "42"
    assert list(out["stac_extensions"]) == [
        "https://stac-extensions.github.io/eo/v1.1.0/schema.json"]
    assert out["type"] == "Feature"
    # already-clean frame is untouched
    clean = spark.createDataFrame(
        [("a", ["x"], "Feature")],
        "id string, stac_extensions array<string>, type string")
    got = coerce_item_columns(clean).collect()[0]
    assert got["id"] == "a" and list(got["stac_extensions"]) == ["x"]


def test_migrate_item_no_version_skips():
    assert migrate_item({"type": "Feature", "id": "x"}) == {
        "type": "Feature", "id": "x"}


def test_stac_geoparquet_kv_metadata(spark, stac_items, tmp_path):
    path = str(tmp_path / "items_gpq")
    write_stac_geoparquet(stac_items, path)
    meta = read_stac_geoparquet_metadata(path)
    geo = meta["geo"]
    assert geo["primary_column"] == "geometry"
    assert geo["columns"]["geometry"]["encoding"] == "WKB"
    assert geo["columns"]["geometry"]["covering"]["bbox"]["xmin"] == \
        ["bbox", "xmin"]
    assert meta["stac-geoparquet"]["version"] == "1.0.0"
    assert "collections" not in meta["stac-geoparquet"]
    # roundtrip: re-read produces identical rows (geoparquet.rs:789-1038
    # roundtrip test model)
    back = spark.read.parquet(path)
    assert back.count() == stac_items.count()
    a = {r["id"] for r in stac_items.select("id").collect()}
    b = {r["id"] for r in back.select("id").collect()}
    assert a == b


def test_stac_geoparquet_row_groups_and_single_pass(spark, stac_items,
                                                    tmp_path):
    """Reference roundtrip model (geoparquet.rs:789-1038): 100 items
    at 25 rows/group → 4 row groups. The sink is a SINGLE distributed
    pass — every part file carries the KV footer as written (no
    driver-side rewrite), and every full row group is exactly
    row_group_rows."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "rg_gpq")
    write_stac_geoparquet(stac_items.repartition(1), path,
                          row_group_rows=25)
    parts = sorted(p for p in os.listdir(path) if p.endswith(".parquet"))
    assert len(parts) == 1
    f = pq.ParquetFile(f"{path}/{parts[0]}")
    assert f.metadata.num_row_groups == 4
    assert [f.metadata.row_group(i).num_rows for i in range(4)] == [25] * 4
    # KV footer present in the file the executor wrote — one pass
    meta = f.schema_arrow.metadata
    assert b"geo" in meta and b"stac-geoparquet" in meta
    assert os.path.exists(f"{path}/_SUCCESS")


def test_stac_geoparquet_file_scheme(spark, stac_items, tmp_path):
    """Scheme-qualified destinations go through pyarrow.fs (round-2
    ADVICE: glob-based stamping silently skipped non-local paths)."""
    path = f"file://{tmp_path}/scheme_gpq"
    write_stac_geoparquet(stac_items, path)
    meta = read_stac_geoparquet_metadata(path)
    assert meta["geo"]["primary_column"] == "geometry"
    assert spark.read.parquet(f"{tmp_path}/scheme_gpq").count() == 100
