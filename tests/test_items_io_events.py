"""Item roundtrip / streaming FeatureCollection sink / sessionize /
exact n-gram jaccard."""

import json

from pyspark.sql import functions as F

from rustac_spark.events import sessionize
from rustac_spark.stac.items_io import (
    iter_items, row_to_item, write_feature_collection,
)
from rustac_spark.stac.validate import validate_value
from rustac_spark.textops.ngram import jaccard_pairs


def test_row_to_item_roundtrip_shape(stac_items):
    row = stac_items.orderBy("id").limit(1).collect()[0]
    item = row_to_item(row)
    assert item["type"] == "Feature" and item["id"] == "item-0000"
    assert isinstance(item["bbox"], list) and len(item["bbox"]) == 4
    assert item["geometry"]["type"] == "Polygon"
    assert "datetime" in item["properties"]
    assert "sat:relative_orbit" in item["properties"]
    # produced items pass our validator
    assert validate_value(item) == []


def test_write_feature_collection(stac_items, tmp_path):
    path = str(tmp_path / "fc.json")
    n = write_feature_collection(
        stac_items.orderBy("id").limit(7), path, matched=100)
    assert n == 7
    fc = json.load(open(path))
    assert fc["type"] == "FeatureCollection"
    assert fc["numberReturned"] == 7 and fc["numberMatched"] == 100
    assert len(fc["features"]) == 7
    assert fc["features"][0]["id"] == "item-0000"


def test_iter_items_streaming(stac_items):
    it = iter_items(stac_items.orderBy("id").limit(3))
    ids = [i["id"] for i in it]
    assert ids == ["item-0000", "item-0001", "item-0002"]


def test_sessionize_semantics(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1.0), (1, "2024-01-01 00:10:00", 2.0),
        (1, "2024-01-01 01:00:00", 3.0),   # 50 min gap → new session
        (2, "2024-01-01 00:00:00", 4.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"]) \
        .withColumn("ts", F.to_timestamp("ts"))
    out = {(r["user_id"], r["session_id"]): r["n_events"]
           for r in sessionize(df).collect()}
    assert out == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_ngram_jaccard_exact(spark):
    df = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "abcdefgh"), (3, "abcdefxx"), (4, "zzzzzz")],
        ["doc_id", "text"])
    out = {(r["a"], r["b"]): r["jaccard"]
           for r in jaccard_pairs(df, threshold=0.3).collect()}
    assert out[(1, 2)] == 1.0
    # docs 1 & 3 share shingles abc bcd cde def of 6+6 distinct → 4/8
    assert abs(out[(1, 3)] - 0.5) < 1e-9
    assert (1, 4) not in out


def test_ngram_jaccard_max_df_prunes(spark):
    df = spark.createDataFrame(
        [(i, "common" + str(i)) for i in range(10)], ["doc_id", "text"])
    # 'common' shingles appear in all 10 docs; cap at df<=5 kills them
    out = jaccard_pairs(df, threshold=0.1, max_df=5).count()
    assert out == 0


def test_asof_join_semantics(spark):
    """≤ tie matching, carry-forward across gaps, NULL before first
    right row, key isolation."""
    from rustac_spark.events import asof_join

    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00"), (2, 1, "2024-01-01 10:05:00"),
         (3, 1, "2024-01-01 09:00:00"), (4, 2, "2024-01-01 10:00:00")],
        "event_id long, user_id long, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 5.0),   # tie with left #1 → match
         (1, "2024-01-01 10:01:00", 7.0),
         (9, "2024-01-01 00:00:00", 99.0)],  # other key: never leaks
        "user_id long, ts string, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = {r["event_id"]: r["value_asof"]
           for r in asof_join(left, right, "user_id", "ts",
                              ["value"]).collect()}
    assert out[1] == 5.0      # equal timestamp matches (≤)
    assert out[2] == 7.0      # latest at-or-before 10:05
    assert out[3] is None     # before any right row
    assert out[4] is None     # user 2 has no right rows at all

def test_range_join_semantics(spark):
    """Inclusive ±Δ band, exactly-once pairs across bucket boundaries,
    key isolation — cross-checked against the naive theta-join."""
    from rustac_spark.events import range_join

    import random
    rng = random.Random(7)
    base = 1_700_000_000
    lrows = [(i, rng.randint(1, 3), base + rng.randint(0, 40_000))
             for i in range(40)]
    rrows = [(100 + i, rng.randint(1, 3), base + rng.randint(0, 40_000))
             for i in range(40)]
    left = spark.createDataFrame(
        [(i, u, t) for i, u, t in lrows],
        "event_id long, user_id long, epoch long") \
        .withColumn("ts", F.timestamp_seconds("epoch")).drop("epoch")
    right = spark.createDataFrame(
        [(i, u, t) for i, u, t in rrows],
        "rid long, user_id long, epoch long") \
        .withColumn("ts", F.timestamp_seconds("epoch")).drop("epoch")

    delta = 3600
    got = {(r["event_id"], r["rid_r"])
           for r in range_join(left, right, "user_id", "ts",
                               delta_seconds=delta,
                               right_cols=["rid"]).collect()}
    want = {(i, j) for i, u, t in lrows for j, v, s in rrows
            if u == v and abs(t - s) <= delta}
    assert got == want and len(got) > 0
    # exactly-once: the collect() into a set above would hide dupes
    n = range_join(left, right, "user_id", "ts", delta_seconds=delta,
                   right_cols=["rid"]).count()
    assert n == len(want)


def test_range_join_boundary_inclusive(spark):
    from rustac_spark.events import range_join
    left = spark.createDataFrame(
        [(1, 1, 10_000)], "event_id long, user_id long, epoch long") \
        .withColumn("ts", F.timestamp_seconds("epoch")).drop("epoch")
    right = spark.createDataFrame(
        [(1, 1, 10_000 + 3600),    # exactly +Δ → in
         (2, 1, 10_000 - 3600),    # exactly -Δ → in
         (3, 1, 10_000 + 3601),    # just out
         (4, 2, 10_000)],          # other key
        "rid long, user_id long, epoch long") \
        .withColumn("ts", F.timestamp_seconds("epoch")).drop("epoch")
    got = sorted(r["rid_r"] for r in range_join(
        left, right, "user_id", "ts", 3600, ["rid"]).collect())
    assert got == [1, 2]


def test_asof_join_null_value_not_backfilled(spark):
    """The attached columns must all come from the single as-of right
    row — a NULL value in that row stays NULL instead of being
    backfilled from an older right row (struct-carry regression)."""
    from rustac_spark.events import asof_join

    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:03:00")],
        "event_id long, user_id long, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 5.0),
         (1, "2024-01-01 10:02:00", None)],   # the true as-of row
        "user_id long, ts string, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    row = asof_join(left, right, "user_id", "ts", ["value"]).collect()[0]
    assert row["value_asof"] is None           # NOT backfilled to 5.0
    assert str(row["ts_asof"]) == "2024-01-01 10:02:00"
