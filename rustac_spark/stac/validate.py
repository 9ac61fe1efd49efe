"""Distributed STAC validation (reimplements the semantics of the
reference's validator, crates/validate/src/validator.rs:66-164: each
value is validated against its type+version schema; errors collected,
not raised).

The reference vendors the full spec schemas and resolves extension
schemas by URL (validator.rs:269-403, 66-164). We follow the same
vendoring strategy offline: a faithful subset of the STAC 1.1 core
schemas (required members, type constraints, common metadata — gsd,
platform, instruments, bands) plus a registry of vendored extension
schemas keyed by schema-URL prefix (eo, sat, proj, view), applied to
every value whose `stac_extensions` lists them. Extension URLs with
no vendored schema are skipped (the offline analogue of the
reference's resolver cache miss). `jsonschema` runs batch-wise inside
mapInPandas, one compiled validator per executor.
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
                # common metadata (STAC 1.1 item spec)
                "created": {"type": "string"},
                "updated": {"type": "string"},
                "platform": {"type": "string"},
                "constellation": {"type": "string"},
                "mission": {"type": "string"},
                "instruments": {"type": "array",
                                "items": {"type": "string"}},
                "gsd": {"type": "number", "exclusiveMinimum": 0},
                # 1.1 bands construct (also valid per asset)
                "bands": {"type": "array", "items": {
                    "type": "object",
                    "properties": {"name": {"type": "string",
                                            "minLength": 1}},
                }},
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

# Vendored extension schemas, keyed by schema-URL prefix — the offline
# analogue of the reference's schema resolver (validator.rs:269-403).
# Each constrains the hoisted property namespace of its extension.
EXTENSION_SCHEMAS: dict[str, dict] = {
    "https://stac-extensions.github.io/eo/": {
        "properties": {"properties": {"type": "object", "properties": {
            "eo:cloud_cover": {"type": "number",
                               "minimum": 0, "maximum": 100},
            "eo:snow_cover": {"type": "number",
                              "minimum": 0, "maximum": 100},
        }}},
    },
    "https://stac-extensions.github.io/sat/": {
        "properties": {"properties": {"type": "object", "properties": {
            "sat:relative_orbit": {"type": "integer", "minimum": 1},
            "sat:absolute_orbit": {"type": "integer", "minimum": 1},
            "sat:orbit_state": {"enum": ["ascending", "descending",
                                         "geostationary"]},
        }}},
    },
    "https://stac-extensions.github.io/projection/": {
        "properties": {"properties": {"type": "object", "properties": {
            "proj:epsg": {"type": ["integer", "null"]},
            "proj:code": {"type": ["string", "null"]},
            "proj:shape": {"type": "array", "minItems": 2, "maxItems": 2,
                           "items": {"type": "integer"}},
        }}},
    },
    "https://stac-extensions.github.io/view/": {
        "properties": {"properties": {"type": "object", "properties": {
            "view:off_nadir": {"type": "number",
                               "minimum": 0, "maximum": 90},
            "view:sun_azimuth": {"type": "number",
                                 "minimum": 0, "maximum": 360},
        }}},
    },
}


def _extension_validators(value: dict, jsonschema, _cache={}):
    """Compiled validators for every listed extension we have a
    vendored schema for; unknown schema URLs are skipped."""
    out = []
    for url in value.get("stac_extensions") or []:
        if not isinstance(url, str):
            continue
        for prefix, schema in EXTENSION_SCHEMAS.items():
            if url.startswith(prefix):
                if prefix not in _cache:
                    _cache[prefix] = \
                        jsonschema.Draft202012Validator(schema)
                out.append(_cache[prefix])
    return out


def validate_value(value: dict) -> list[str]:
    """Driver-side single-value validation → error list (empty =
    valid). Core schema + every resolvable extension schema, the
    reference's validate-against-all composition
    (validator.rs:66-164)."""
    import jsonschema

    t = value.get("type")
    schema = _SCHEMAS.get(t)
    if schema is None:
        return [f"unknown STAC type: {t!r}"]
    v = jsonschema.Draft202012Validator(schema)
    errors = [e.message for e in v.iter_errors(value)]
    for ext in _extension_validators(value, jsonschema):
        errors.extend(e.message for e in ext.iter_errors(value))
    return errors


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
                        for ext in _extension_validators(value,
                                                         jsonschema):
                            e.extend(x.message
                                     for x in ext.iter_errors(value))
                except (json.JSONDecodeError, AttributeError) as exc:
                    e = [f"invalid JSON: {exc}"]
                ids.append(i)
                valids.append(len(e) == 0)
                errs.append(e)
            yield pd.DataFrame({"id": ids, "valid": valids, "errors": errs})

    return df.select(id_col, json_col).mapInPandas(
        gen, schema="id string, valid boolean, errors array<string>")
