"""Distributed STAC validation (reimplements the semantics of the
reference's validator, crates/validate/src/validator.rs:66-164: each
value is validated against its type+version schema; errors collected,
not raised).

The reference vendors the full spec schemas (validator.rs:269-403).
We bundle a minimal-but-faithful subset written from the public STAC
1.1 spec (required members + type constraints) — enough to catch the
error classes the reference's own tests exercise — and run `jsonschema`
batch-wise inside mapInPandas, one compiled validator per executor.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

ITEM_SCHEMA = {
    "type": "object",
    "required": ["type", "stac_version", "id", "geometry", "properties",
                 "links", "assets"],
    "properties": {
        "type": {"const": "Feature"},
        "stac_version": {"type": "string",
                         "pattern": r"^1\.\d+\.\d+(-.+)?$"},
        "id": {"type": "string", "minLength": 1},
        "geometry": {"type": ["object", "null"]},
        "bbox": {"type": "array", "minItems": 4, "maxItems": 6,
                 "items": {"type": "number"}},
        "properties": {
            "type": "object",
            "properties": {
                "datetime": {"type": ["string", "null"]},
                "start_datetime": {"type": "string"},
                "end_datetime": {"type": "string"},
            },
        },
        "links": {"type": "array", "items": {
            "type": "object", "required": ["href", "rel"]}},
        "assets": {"type": "object", "additionalProperties": {
            "type": "object", "required": ["href"]}},
        "collection": {"type": "string"},
        "stac_extensions": {"type": "array", "items": {"type": "string"}},
    },
    # item-spec: a null datetime requires start+end datetime
    "allOf": [{
        "if": {"properties": {"properties": {
            "properties": {"datetime": {"const": None}},
            "required": ["datetime"]}}},
        "then": {"properties": {"properties": {
            "required": ["start_datetime", "end_datetime"]}}},
    }],
    # geometry implies bbox (item-spec requirement)
    "anyOf": [
        {"properties": {"geometry": {"const": None}}},
        {"required": ["bbox"]},
    ],
}

CATALOG_SCHEMA = {
    "type": "object",
    "required": ["type", "stac_version", "id", "description", "links"],
    "properties": {
        "type": {"const": "Catalog"},
        "id": {"type": "string", "minLength": 1},
        "description": {"type": "string", "minLength": 1},
    },
}

COLLECTION_SCHEMA = {
    "type": "object",
    "required": ["type", "stac_version", "id", "description", "license",
                 "extent", "links"],
    "properties": {
        "type": {"const": "Collection"},
        "extent": {
            "type": "object",
            "required": ["spatial", "temporal"],
            "properties": {
                "spatial": {"type": "object", "required": ["bbox"]},
                "temporal": {"type": "object", "required": ["interval"]},
            },
        },
    },
}

_SCHEMAS = {"Feature": ITEM_SCHEMA, "Catalog": CATALOG_SCHEMA,
            "Collection": COLLECTION_SCHEMA}


def validate_value(value: dict) -> list[str]:
    """Driver-side single-value validation → error list (empty = valid)."""
    import jsonschema

    t = value.get("type")
    schema = _SCHEMAS.get(t)
    if schema is None:
        return [f"unknown STAC type: {t!r}"]
    v = jsonschema.Draft202012Validator(schema)
    return [e.message for e in v.iter_errors(value)]


def validate_json_column(df: DataFrame, json_col: str = "item_json",
                         id_col: str = "id") -> DataFrame:
    """Batch validation of a JSON-string column → (id, valid, errors).
    One compiled validator per Python worker; Arrow-batched."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import jsonschema

        compiled = {t: jsonschema.Draft202012Validator(s)
                    for t, s in _SCHEMAS.items()}
        for pdf in batches:
            ids, valids, errs = [], [], []
            for i, s in zip(pdf[id_col], pdf[json_col]):
                try:
                    value = json.loads(s)
                    t = value.get("type")
                    if t not in compiled:
                        e = [f"unknown STAC type: {t!r}"]
                    else:
                        e = [x.message for x in
                             compiled[t].iter_errors(value)]
                except (json.JSONDecodeError, AttributeError) as exc:
                    e = [f"invalid JSON: {exc}"]
                ids.append(i)
                valids.append(len(e) == 0)
                errs.append(e)
            yield pd.DataFrame({"id": ids, "valid": valids, "errors": errs})

    return df.select(id_col, json_col).mapInPandas(
        gen, schema="id string, valid boolean, errors array<string>")
