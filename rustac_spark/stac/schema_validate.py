"""Full official-spec STAC validation against the vendored schema set.

The reference bundles the complete v1.0.0/v1.1.0 core schemas and
validates the whole spec-examples corpus offline
(crates/validate/src/validator.rs:269-403;
crates/validate/tests/examples.rs:6-18). This module is the PySpark
twin: the same public schema documents (vendored verbatim under
``stac/schemas/`` — see its README for provenance) compiled with
``jsonschema`` draft-07, cross-document ``$ref`` URLs resolved to the
local files through a ``referencing.Registry`` instead of HTTP.

``validate.py`` keeps the fast hand-written subset (cheap, no $ref
chasing) — this module is the complete gate a release pipeline runs.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

SCHEMA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "schemas")

VERSIONS = ("1.0.0", "1.1.0")

# filename → the spec path segment its published URL uses
# (validator.rs:313-403 registers the same URL→document pairs)
_SPEC_DIR = {"catalog": "catalog-spec", "collection": "collection-spec"}

_EXTRA_RESOURCES = {
    "https://geojson.org/schema/Feature.json": "geojson/Feature.json",
    "https://geojson.org/schema/Geometry.json": "geojson/Geometry.json",
    "http://json-schema.org/draft-07/schema": "json-schema/draft-07.json",
}


def _schema_url(version: str, name: str) -> str:
    spec = _SPEC_DIR.get(name, "item-spec")
    return (f"https://schemas.stacspec.org/v{version}/{spec}/"
            f"json-schema/{name}.json")


def _load(relpath: str) -> dict:
    with open(os.path.join(SCHEMA_DIR, relpath)) as f:
        return json.load(f)


def _build_validators():
    """(type, version) → compiled Draft7Validator with a fully-local
    registry. Built once per process (driver or Python worker)."""
    from jsonschema import Draft7Validator
    from referencing import Registry, Resource
    from referencing.jsonschema import DRAFT7

    resources = []
    for version in VERSIONS:
        vdir = os.path.join(SCHEMA_DIR, f"v{version}")
        for fname in sorted(os.listdir(vdir)):
            if not fname.endswith(".json"):
                continue
            name = fname[:-len(".json")]
            doc = _load(f"v{version}/{fname}")
            # register under the RESOLVED url (relative $refs like
            # "bands.json" resolve against the item.json base), not
            # the document's own $id (one upstream $id has a typo:
            # v1.1.0 common.json says ".../commonjson")
            resources.append((_schema_url(version, name),
                              Resource(contents=doc,
                                       specification=DRAFT7)))
    for url, rel in _EXTRA_RESOURCES.items():
        resources.append((url, Resource(contents=_load(rel),
                                        specification=DRAFT7)))
    registry = Registry().with_resources(resources)

    out = {}
    for version in VERSIONS:
        for typ, name in (("Feature", "item"), ("Catalog", "catalog"),
                          ("Collection", "collection")):
            doc = _load(f"v{version}/{name}.json")
            out[(typ, version)] = Draft7Validator(doc, registry=registry)
    return out


_VALIDATORS: dict | None = None


def _validators():
    global _VALIDATORS
    if _VALIDATORS is None:
        _VALIDATORS = _build_validators()
    return _VALIDATORS


def validate_document(value: dict) -> list[str]:
    """Validate one STAC JSON document against the complete official
    schema for its (type, stac_version) → error-message list (empty =
    valid), the reference's Validate composition
    (validator.rs:66-164)."""
    t = value.get("type")
    if t not in ("Feature", "Catalog", "Collection"):
        return [f"unknown STAC type: {t!r}"]
    version = value.get("stac_version")
    if version not in VERSIONS:
        return [f"unsupported stac_version for offline validation: "
                f"{version!r} (vendored: {', '.join(VERSIONS)})"]
    v = _validators()[(t, version)]
    return [e.message for e in v.iter_errors(value)]


def schema_validate_json_column(df: DataFrame, json_col: str = "item_json",
                                id_col: str = "id") -> DataFrame:
    """Distributed full-schema validation of a JSON-string column →
    (id, valid, errors). Validators compile once per Python worker
    (process-level cache); rows stream through Arrow batches."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, valids, errs = [], [], []
            for i, s in zip(pdf[id_col], pdf[json_col]):
                try:
                    e = validate_document(json.loads(s))
                except (json.JSONDecodeError, AttributeError) as exc:
                    e = [f"invalid JSON: {exc}"]
                ids.append(i)
                valids.append(len(e) == 0)
                errs.append(e)
            yield pd.DataFrame({"id": ids, "valid": valids,
                                "errors": errs})

    return df.select(id_col, json_col).mapInPandas(
        gen, schema="id string, valid boolean, errors array<string>")
