"""Full official-schema validation (reference model:
crates/validate/tests/examples.rs:6-18 — every spec-example document
validates; mutations are rejected for reasons the hand-written subset
cannot see)."""

import copy
import glob
import json

from rustac_spark import DATA_DIR
from rustac_spark.stac.schema_validate import (
    schema_validate_json_column, validate_document,
)
from rustac_spark.stac.validate import validate_value

EXAMPLES = sorted(glob.glob(f"{DATA_DIR}/spec-examples/v1.*/**/*.json",
                            recursive=True))


def _load(path):
    with open(path) as f:
        return json.load(f)


def test_spec_examples_corpus_all_valid():
    assert len(EXAMPLES) == 20
    for p in EXAMPLES:
        errs = validate_document(_load(p))
        assert errs == [], (p, errs[:3])


def test_rejections_beyond_the_subset():
    """Violations outside the hand-written subset: the full schema
    catches them, the subset validates clean (exactly the round-2
    VERDICT gap)."""
    core = next(p for p in EXAMPLES if p.endswith("v1.1.0/core-item.json"))
    item = _load(core)

    # provider object with a non-string name
    bad = copy.deepcopy(item)
    bad["properties"]["providers"] = [{"name": 42}]
    assert validate_document(bad) != []
    assert validate_value(bad) == []  # subset can't see it

    # asset with non-string title
    bad = copy.deepcopy(item)
    key = next(iter(bad["assets"]))
    bad["assets"][key]["title"] = 42
    assert validate_document(bad) != []
    assert validate_value(bad) == []

    # collection missing required "extent"
    coll = next(p for p in EXAMPLES if p.endswith("v1.1.0/collection.json"))
    bad = _load(coll)
    del bad["extent"]
    assert validate_document(bad) != []

    # geometry violating the GeoJSON schema (ring with 2 positions)
    bad = copy.deepcopy(item)
    bad["geometry"] = {"type": "Polygon",
                       "coordinates": [[[0, 0], [1, 1]]]}
    assert validate_document(bad) != []
    assert validate_value(bad) == []


def test_version_and_type_dispatch():
    item = _load(next(p for p in EXAMPLES
                      if p.endswith("v1.0.0/core-item.json")))
    assert item["stac_version"] == "1.0.0"
    assert validate_document(item) == []
    item["stac_version"] = "0.9.0"
    assert any("unsupported stac_version" in e
               for e in validate_document(item))
    assert validate_document({"type": "Bogus"}) != []


def test_schema_validate_json_column(spark):
    docs = [_load(p) for p in EXAMPLES if "item" in p][:5]
    bad = copy.deepcopy(docs[0])
    bad["links"] = [{"href": "x"}]  # rel missing
    bad["id"] = "bad-item"
    rows = [(d["id"], json.dumps(d)) for d in docs + [bad]]
    df = spark.createDataFrame(rows, "id string, item_json string")
    out = {r["id"]: (r["valid"], r["errors"])
           for r in schema_validate_json_column(df).collect()}
    assert all(out[d["id"]][0] for d in docs)
    valid, errors = out["bad-item"]
    assert not valid and errors
