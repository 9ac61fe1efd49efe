"""Transaction surface (crates/core/src/api/client.rs:103-122 parity):
add_item/add_items/add_collection over SnapshotTable storage —
roundtrip, time travel, upsert, delete, extent refresh."""

import pytest
from pyspark.sql import functions as F

from rustac_spark.stac.search import Search
from rustac_spark.stac.transactions import TransactionClient


@pytest.fixture()
def txn(spark, stac_items, tmp_path):
    t = TransactionClient(spark, str(tmp_path / "tbl"))
    t.add_items(stac_items)
    return t


def test_add_item_roundtrip_and_time_travel(txn):
    txn.add_item({
        "type": "Feature", "id": "item-9999",
        "collection": "collection-new",
        "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
        "properties": {"datetime": "2025-01-01T00:00:00Z",
                       "eo:cloud_cover": 12.5}})
    got = txn.search(Search(ids=["item-9999"])).collect()
    assert len(got) == 1
    r = got[0]
    assert r["collection"] == "collection-new"
    assert r["eo:cloud_cover"] == 12.5
    # bbox derived from the point geometry
    assert (r["bbox"]["xmin"], r["bbox"]["ymax"]) == (1.0, 2.0)
    assert str(r["datetime"]) == "2025-01-01 00:00:00"
    # time travel: snapshot 1 predates the add
    assert txn.read(snapshot_id=1).where("id = 'item-9999'").count() == 0
    # collection extent derived live for the new collection
    ext = {c["id"]: c for c in txn.collections()}["collection-new"]
    assert ext["extent"]["spatial"]["bbox"][0] == [1.0, 2.0, 1.0, 2.0]


def test_upsert_and_delete(txn):
    upd = (txn.read().where("id = 'item-0000'")
           .withColumn("eo:cloud_cover", F.lit(77.0)))
    txn.upsert_items(upd)
    assert txn.read().count() == 100  # replaced, not duplicated
    assert (txn.read().where("id = 'item-0000'")
            .collect()[0]["eo:cloud_cover"] == 77.0)
    txn.delete_item("collection-a", "item-0000")
    assert txn.read().count() == 99
    ops = [h["operation"] for h in txn.table.history()]
    assert ops[0] == "create" and "delete" in ops


def test_add_collection_registered_and_merged(txn):
    txn.add_collection({"id": "collection-empty",
                        "description": "registered, no items"})
    cols = {c["id"]: c for c in txn.collections()}
    assert "collection-empty" in cols       # registered, itemless
    assert "collection-a" in cols           # derived from items
    assert cols["collection-empty"]["description"] == \
        "registered, no items"


def test_schema_alignment_drops_unknown_props(txn):
    # a property the table schema doesn't know is dropped (documented
    # single-schema contract), not an error — and NULLs type-check
    txn.add_item({
        "type": "Feature", "id": "item-8888", "collection": "collection-a",
        "geometry": {"type": "Point", "coordinates": [0.0, 0.0]},
        "properties": {"datetime": "2025-02-01T00:00:00Z",
                       "brand:new_prop": "ignored"}})
    row = txn.search(Search(ids=["item-8888"])).collect()[0]
    assert "brand:new_prop" not in row.asDict()
    assert row["eo:cloud_cover"] is None


def test_add_item_json_integer_for_double_column(txn):
    """A JSON integer is a valid JSON number for a double-typed
    property column — ingest must cast, not crash."""
    txn.add_item({
        "type": "Feature", "id": "item-int", "collection": "collection-a",
        "geometry": {"type": "Point", "coordinates": [0.0, 0.0]},
        "properties": {"datetime": "2025-02-02T00:00:00Z",
                       "eo:cloud_cover": 50}})
    row = txn.search(Search(ids=["item-int"])).collect()[0]
    assert row["eo:cloud_cover"] == 50.0


def test_upsert_large_batch_flat_plan(txn):
    """upsert_items must stay a flat InSet predicate, not a chained
    OR — a several-hundred-key batch must plan and run."""
    batch = txn.read().limit(60)
    txn.upsert_items(batch)
    assert txn.read().count() == 100  # replaced in place


def test_upsert_null_collection_replaces_not_duplicates(spark, tmp_path):
    """Python-side keys and the Spark delete predicate must agree for
    NULL collections (round-4 advice: concat_ws skips NULLs, so the
    prior version of a collection-less item was never deleted)."""
    t = TransactionClient(spark, str(tmp_path / "nulltbl"))
    t.add_item({
        "type": "Feature", "id": "orphan",
        "geometry": {"type": "Point", "coordinates": [0.0, 0.0]},
        "properties": {"datetime": "2025-01-01T00:00:00Z",
                       "eo:cloud_cover": 1.0}})
    upd = (t.read().where("id = 'orphan'")
           .withColumn("eo:cloud_cover", F.lit(9.0)))
    t.upsert_items(upd)
    rows = t.read().where("id = 'orphan'").collect()
    assert len(rows) == 1                 # replaced, not duplicated
    assert rows[0]["eo:cloud_cover"] == 9.0


def test_batch_mixing_ints_and_floats_widens_to_double(spark, tmp_path):
    """A POST batch whose property values mix JSON ints and floats
    must infer DoubleType across the batch (round-4 advice: first-
    value inference built LongType and the strict verifier rejected
    the float row, failing the whole ingest)."""
    t = TransactionClient(spark, str(tmp_path / "mixtbl"))
    t.add_item_dicts([
        {"type": "Feature", "id": f"m-{i}",
         "collection": "c",
         "geometry": {"type": "Point", "coordinates": [0.0, 0.0]},
         "properties": {"datetime": "2025-01-01T00:00:00Z",
                        "eo:cloud_cover": v}}
        for i, v in enumerate([10, 10.5, 3])])
    got = {r["id"]: r["eo:cloud_cover"] for r in t.read().collect()}
    assert got == {"m-0": 10.0, "m-1": 10.5, "m-2": 3.0}


def test_collections_memoized_per_snapshot(spark, txn):
    """A second collections() listing between commits must run ZERO
    Spark jobs (round-4 verdict #4: GET /collections was a full
    item-table aggregation per request); any write invalidates."""
    first = txn.collections()
    sc = spark.sparkContext
    sc.setJobGroup("colls-cache-probe", "probe")
    try:
        second = txn.collections()
    finally:
        sc.setJobGroup(None, None)
    assert sc.statusTracker().getJobIdsForGroup("colls-cache-probe") == []
    assert second == first
    # a commit invalidates: the new item shows up in a fresh listing
    txn.add_item({
        "type": "Feature", "id": "item-cache", "collection": "c-cache",
        "geometry": {"type": "Point", "coordinates": [9.0, 9.0]},
        "properties": {"datetime": "2025-03-01T00:00:00Z"}})
    assert "c-cache" in {c["id"] for c in txn.collections()}
    # registration alone (no snapshot change) also invalidates
    txn.add_collection({"id": "c-reg", "description": "meta only"})
    assert "c-reg" in {c["id"] for c in txn.collections()}


def test_update_and_delete_collection(spark, txn):
    txn.add_collection({"id": "c-up", "description": "first"})
    txn.update_collection({"id": "c-up", "description": "second"})
    cols = {c["id"]: c for c in txn.collections()}
    assert cols["c-up"]["description"] == "second"
    # delete a derived (item-bearing) collection: registration gone,
    # items deleted in one COW commit, listing shows neither
    n_before = txn.read().count()
    n_a = txn.read().where("collection = 'collection-a'").count()
    assert n_a > 0
    txn.delete_collection("collection-a")
    assert txn.read().count() == n_before - n_a
    assert "collection-a" not in {c["id"] for c in txn.collections()}
    # deleting a registration-only collection touches no items
    txn.delete_collection("c-up")
    assert txn.read().count() == n_before - n_a
    assert "c-up" not in {c["id"] for c in txn.collections()}
