"""Top-level read/write/search free functions (reference parity:
core/src/lib.rs:168 read, io format read/write, io/src/api.rs search)."""

import json

from pyspark.sql import functions as F

from rustac_spark import DATA_DIR, read, search, write


def test_read_geoparquet_and_search(spark, tmp_path):
    items = read(spark, f"{DATA_DIR}/stac_items.parquet")
    assert items.count() == 100
    hits = search(spark, f"{DATA_DIR}/stac_items.parquet",
                  bbox=[-106.1, 40.5, -106.0, 40.6], datetime="2024",
                  limit=5, sortby="id")
    assert hits.count() == 5


def test_write_read_roundtrip_all_formats(spark, tmp_path):
    items = read(spark, f"{DATA_DIR}/stac_items.parquet").limit(20)

    gp = str(tmp_path / "out.parquet")
    write(items, gp)
    assert read(spark, gp).count() == 20

    nd = str(tmp_path / "out.ndjson")
    write(items, nd)
    assert read(spark, nd).count() == 20

    js = str(tmp_path / "out.json")
    write(items, js)
    with open(js) as f:
        doc = json.load(f)
    assert doc["type"] == "FeatureCollection" and len(doc["features"]) == 20
    back = read(spark, js)
    assert back.count() == 20
    # normalized columns: WKB geometry + bbox struct survive the
    # JSON roundtrip through the item normalizer
    r = back.where(F.col("id") == doc["features"][0]["id"]).collect()[0]
    assert isinstance(r["geometry"], (bytes, bytearray))
    assert r["bbox"]["xmin"] is not None


def test_search_accepts_dataframe(spark):
    items = read(spark, f"{DATA_DIR}/stac_items.parquet")
    out = search(spark, items, ids=["item-0042"])
    assert [r["id"] for r in out.collect()] == ["item-0042"]
