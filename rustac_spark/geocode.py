"""Deterministic geocoder: url → (lat, lon) → square footprint.

Implements FIXTURES.md §1 "Derived" rules. Pages are geocoded by
domain (spatial clustering per domain ⇒ realistic hot-cell skew from
the zipf domain draw) with a per-url jitter, then given a square
footprint bbox. Everything is a pure function of the url via
``stable_hash`` (sha256), so any executor recomputes identical values
— this is what makes the pipeline resumable and the oracle checkable.

Exposed three ways:
- ``geocode_cols(url)`` — pure-Column twin (sha2 + conv + decimal
  mod), the default ingest path: whole-stage codegen, zero Python,
- ``geocode_pandas(urls) -> DataFrame`` — numpy batch kernel, kept as
  the independent reference for the bit-parity test,
- ``with_geocode(df) -> DataFrame`` — adds lat, lon, xmin, ymin,
  xmax, ymax (+ WKB geometry via the Arrow path) columns.

The reference models footprints as item geometry + bbox struct
covering index (crates/core/src/geoparquet.rs:415-435); here the bbox
struct columns ARE the covering index the spatial join uses.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from .hashing import stable_hash_batch
from .geo.wkbio import bbox_polygon_wkb

LAT_LIMIT = 84.9  # keep footprints inside web-mercator domain (±85.05113)
LON_LIMIT = 179.9

GEO_COLS = ["lat", "lon", "xmin", "ymin", "xmax", "ymax"]
GEO_SCHEMA = ("lat double, lon double, xmin double, ymin double, "
              "xmax double, ymax double")


def _domain_of(urls: pd.Series) -> pd.Series:
    # url shape: https://{domain}/{path}
    return urls.str.split("/", n=3).str[2]


_DOMAIN_CACHE: dict[str, tuple[int, int]] = {}


def _domain_hashes(domains: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Per-domain hash pair, memoized — domains are few (zipf over
    1000) while urls are billions, so hashing once per distinct domain
    removes 2 of the 5 sha256 calls per row on the ingest hot path."""
    uniq = [d for d in domains.unique() if d not in _DOMAIN_CACHE]
    if uniq:
        hs = stable_hash_batch(uniq)
        hxs = stable_hash_batch([d + "x" for d in uniq])
        for d, h, hx in zip(uniq, hs, hxs):
            _DOMAIN_CACHE[d] = (int(h), int(hx))
    pairs = domains.map(_DOMAIN_CACHE)
    hd = np.fromiter((p[0] for p in pairs), dtype=np.uint64, count=len(pairs))
    hdx = np.fromiter((p[1] for p in pairs), dtype=np.uint64, count=len(pairs))
    return hd, hdx


def geocode_pandas(urls: pd.Series) -> pd.DataFrame:
    """Batch kernel: urls → lat/lon/bbox columns (float64)."""
    domains = _domain_of(urls)
    # NOTE: integer modulo BEFORE any float cast — uint64 hashes exceed
    # float64's 53-bit mantissa, so mod-after-cast silently diverges
    # from the exact stable_hash(x) % m spec (FIXTURES.md §1).
    hd, hdx = _domain_hashes(domains)
    hu = stable_hash_batch(urls.tolist())
    hlat = stable_hash_batch((urls + ":lat").tolist())
    hlon = stable_hash_batch((urls + ":lon").tolist())

    lat_dom = (hd % 170_000).astype(np.float64) / 1000.0 - 85.0
    lon_dom = (hdx % 360_000).astype(np.float64) / 1000.0 - 180.0
    lat = lat_dom + ((hlat % 100_001).astype(np.float64) / 100_000.0 - 0.5) * 0.1
    lon = lon_dom + ((hlon % 100_001).astype(np.float64) / 100_000.0 - 0.5) * 0.1
    lat = np.clip(lat, -LAT_LIMIT, LAT_LIMIT)
    lon = np.clip(lon, -LON_LIMIT, LON_LIMIT)
    delta = 0.001 + (hu % 100).astype(np.float64) / 10000.0
    return pd.DataFrame({
        "lat": lat, "lon": lon,
        "xmin": lon - delta, "ymin": lat - delta,
        "xmax": lon + delta, "ymax": lat + delta,
    })


def _stable_hash_mod_col(col, m: int):
    """Column twin of ``int(hashing.stable_hash(x)) % m`` in pure LONG
    arithmetic (no DECIMAL). The uint64 value of the first 16 hex
    chars of sha256 is h = hi·2^32 + lo with hi, lo < 2^32 (each half
    parsed by conv() into a plain long), so

        h % m = ((hi % m)·(2^32 % m) + lo % m) % m

    exactly. Every intermediate is < m²·2 ≤ 2·360000² < 2^63, so the
    math never overflows a BIGINT. This replaced the round-1..6
    conv(16 hex)→DECIMAL(20,0)→decimal-mod chain: same residues
    bit-for-bit (tests/test_pipeline.py parity test), but the per-row
    cost is two small-int parses + three long mods instead of
    BigDecimal construction and division on the ingest hot path
    (optimization guide §1.2 "per-task work"; measured in
    OPTIMIZATION_r07.md)."""
    from pyspark.sql import functions as F
    h = F.sha2(col, 256)
    hi = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    c = (1 << 32) % m
    return ((hi % m) * F.lit(c) + lo % m) % m


def geocode_cols(url) -> dict:
    """Pure-Column twin of ``geocode_pandas`` — the full geocode in
    whole-stage codegen, zero Python. Expression trees mirror the
    numpy kernel op-for-op (same IEEE order ⇒ bit-identical doubles;
    tests assert exact equality on the committed fixtures). Each hash
    feeds exactly one modulus, so the hash columns are built directly
    as ``stable_hash(x) % m`` in long math (every residue < 2^19 ⇒
    the double cast is lossless)."""
    from pyspark.sql import functions as F

    domain = F.split(url, "/").getItem(2)
    hd = _stable_hash_mod_col(domain, 170_000)
    hdx = _stable_hash_mod_col(F.concat(domain, F.lit("x")), 360_000)
    hu = _stable_hash_mod_col(url, 100)
    hlat = _stable_hash_mod_col(F.concat(url, F.lit(":lat")), 100_001)
    hlon = _stable_hash_mod_col(F.concat(url, F.lit(":lon")), 100_001)

    lat_dom = hd.cast("double") / 1000.0 - 85.0
    lon_dom = hdx.cast("double") / 1000.0 - 180.0
    lat = lat_dom + (hlat.cast("double") / 100_000.0 - 0.5) * 0.1
    lon = lon_dom + (hlon.cast("double") / 100_000.0 - 0.5) * 0.1
    lat = F.least(F.greatest(lat, F.lit(-LAT_LIMIT)), F.lit(LAT_LIMIT))
    lon = F.least(F.greatest(lon, F.lit(-LON_LIMIT)), F.lit(LON_LIMIT))
    delta = F.lit(0.001) + hu.cast("double") / 10_000.0
    return {"lat": lat, "lon": lon,
            "xmin": lon - delta, "ymin": lat - delta,
            "xmax": lon + delta, "ymax": lat + delta}


def footprint_wkb_batch(g: pd.DataFrame) -> pd.Series:
    return pd.Series(
        [bbox_polygon_wkb(a, b, c, d)
         for a, b, c, d in zip(g["xmin"], g["ymin"], g["xmax"], g["ymax"])],
        index=g.index, dtype=object)


PREPARED_SCHEMA = ("url string, warc_ts timestamp, lang string, "
                   "text_ok boolean, " + GEO_SCHEMA)


def prepare_pages(df, url_col: str = "url", use_arrow: bool = False):
    """Single-pass ingest kernel: extract text from html (enforcing the
    byte-identical-per-url invariant inline), geocode, emit the
    prepared page table.

    Default path is PURE Column (extracted_text_column +
    geocode_cols): the whole ingest runs in whole-stage codegen with
    zero Python and zero Arrow round-trips. ``use_arrow=True`` keeps
    the original mapInPandas kernel — the independent reference the
    parity test (tests/test_pipeline.py) compares bit-for-bit."""
    from .extract import extract_text_batch, extracted_text_column
    from pyspark.sql import functions as F

    if not use_arrow:
        g = geocode_cols(F.col(url_col))
        ext = extracted_text_column(F.col("html"))
        return df.select(
            F.col(url_col).alias("url"), "warc_ts", "lang",
            (ext == F.col("text")).alias("text_ok"),
            *[c.alias(k) for k, c in g.items()])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            extracted = extract_text_batch(pdf["html"])
            g = geocode_pandas(pdf[url_col])
            out = pd.DataFrame({
                "url": pdf[url_col],
                "warc_ts": pdf["warc_ts"],
                "lang": pdf["lang"],
                "text_ok": (extracted == pdf["text"]).astype(bool),
            })
            yield pd.concat([out, g], axis=1)

    return df.mapInPandas(gen, schema=PREPARED_SCHEMA)


def with_geocode(df, url_col: str = "url", geometry: bool = False):
    """Add geocode columns to a pages DataFrame. Pure Column by
    default (geocode_cols, bit-identical to the numpy kernel); the
    geometry=True variant additionally needs per-row WKB bytes, which
    have no Column encoder, so that path stays Arrow-batched."""
    if not geometry:
        from pyspark.sql import functions as F
        g = geocode_cols(F.col(url_col))
        return df.select("*", *[c.alias(k) for k, c in g.items()])

    in_schema = df.schema
    out_fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                           for f in in_schema.fields)
    schema = f"{out_fields}, {GEO_SCHEMA}, geometry binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            g = geocode_pandas(pdf[url_col])
            out = pd.concat([pdf.reset_index(drop=True), g], axis=1)
            out["geometry"] = footprint_wkb_batch(g)
            yield out

    return df.mapInPandas(gen, schema=schema)
