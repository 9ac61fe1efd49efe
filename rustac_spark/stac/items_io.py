"""Item ↔ DataFrame round-trip + streaming JSON sink.

- rows → STAC item dicts (unflatten non-top-level columns into
  `properties`, bbox struct → 4-array, WKB → GeoJSON) — the read-side
  JSON path (reference crates/core/src/geoarrow/json.rs:509-625)
- item dicts → rows (flatten) — the write-side path (item.rs:571-606)
- streaming FeatureCollection sink: items emitted one page at a time
  through toLocalIterator, footer (counts) finalized after the drain
  (reference crates/io/src/stream.rs:40-100)
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame

from ..geo.wkbio import parse_wkb
from .translate import TOP_LEVEL_KEYS

_KNOWN_DT = {"datetime", "start_datetime", "end_datetime", "created",
             "updated", "expires", "published", "unpublished"}


def _geometry_to_geojson(wkb: bytes | None):
    if wkb is None:
        return None
    return _parsed_to_geojson(parse_wkb(bytes(wkb)))


def _parsed_to_geojson(parsed):
    """wkbio parsed form → GeoJSON dict, all 7 geometry types
    (mirror of the reference's geometry encode,
    crates/core/src/geoarrow/json.rs:460-499)."""
    kind, data = parsed

    def pts(arr):
        return [[float(x), float(y)] for x, y in arr]

    if kind == "point":
        return {"type": "Point", "coordinates": [float(data[0]),
                                                 float(data[1])]}
    if kind == "linestring":
        return {"type": "LineString", "coordinates": pts(data)}
    if kind == "polygon":
        return {"type": "Polygon", "coordinates": [pts(r) for r in data]}
    if kind == "multipoint":
        return {"type": "MultiPoint",
                "coordinates": [[float(x), float(y)] for x, y in data]}
    if kind == "multilinestring":
        return {"type": "MultiLineString",
                "coordinates": [pts(line) for line in data]}
    if kind == "multipolygon":
        return {"type": "MultiPolygon",
                "coordinates": [[pts(r) for r in rings] for rings in data]}
    if kind == "geometrycollection":
        return {"type": "GeometryCollection",
                "geometries": [_parsed_to_geojson(sub) for sub in data]}
    raise ValueError(f"unknown geometry kind {kind!r}")


def row_to_item(row) -> dict:
    """One flat row → a STAC item dict (FlatItem → Item)."""
    d = row.asDict(recursive=True)
    item = {"type": d.get("type", "Feature"),
            "stac_version": d.get("stac_version", "1.1.0")}
    props = {}
    for k, v in d.items():
        if k in ("type", "stac_version"):
            continue
        if k == "geometry":
            item["geometry"] = _geometry_to_geojson(v)
        elif k == "bbox" and isinstance(v, dict):
            item["bbox"] = [v["xmin"], v["ymin"], v["xmax"], v["ymax"]]
        elif k in TOP_LEVEL_KEYS:
            item[k] = v
        else:
            if k in _KNOWN_DT:
                if v is None:
                    # spec: start/end_datetime etc. must be strings when
                    # present — a null one is omitted, not emitted
                    # (only `datetime` itself is nullable)
                    if k != "datetime":
                        continue
                else:
                    v = v.isoformat() + "Z"
            props[k] = v
    item["properties"] = props
    item.setdefault("links", [])
    item.setdefault("assets", {})
    return item


def iter_items(df: DataFrame) -> Iterator[dict]:
    """Stream items driver-side without collecting the whole result
    (toLocalIterator ⇒ one partition in memory at a time)."""
    for row in df.toLocalIterator():
        yield row_to_item(row)


def write_feature_collection(df: DataFrame, path: str,
                             matched: int | None = None) -> int:
    """Incremental FeatureCollection JSON sink: stream items, then
    finalize the footer with numberReturned (+ numberMatched if given)
    after the drain — mirroring the reference's streaming sink."""
    n = 0
    with open(path, "w") as f:
        f.write('{"type":"FeatureCollection","features":[')
        for item in iter_items(df):
            if n:
                f.write(",")
            json.dump(item, f, separators=(",", ":"), default=str)
            n += 1
        f.write("]")
        f.write(f',"numberReturned":{n}')
        if matched is not None:
            f.write(f',"numberMatched":{matched}')
        f.write("}")
    return n
