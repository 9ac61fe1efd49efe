"""Format inference + href utilities (reimplements the reference's IO
surface: crates/io/src/format.rs, crates/core/src/href.rs).

Driver-side metadata helpers — no Spark cost. The object-store
connector story maps to Hadoop FS schemes configured via
``spark.hadoop.*`` (s3a://, abfss://, gs:// — reference
crates/io/src/store.rs:15-62 parses the same scheme set).
"""

from __future__ import annotations

import posixpath
import re
from dataclasses import dataclass
from urllib.parse import urlparse, urlunparse


@dataclass(frozen=True)
class Format:
    """json | ndjson | geoparquet, with pretty/compression options —
    mirrors io/src/format.rs:32-34,230-271."""
    kind: str                       # "json" | "ndjson" | "geoparquet"
    pretty: bool = False
    compression: str | None = None  # e.g. "zstd(15)"

    def __str__(self) -> str:
        if self.kind == "json":
            return "json-pretty" if self.pretty else "json"
        if self.kind == "geoparquet" and self.compression:
            return f"geoparquet[{self.compression}]"
        return self.kind


_GEOPARQUET_RE = re.compile(r"^(geo)?parquet(\[(?P<c>[^\]]+)\])?$")


def format_from_str(s: str) -> Format:
    t = s.strip().lower()
    if t in ("json", "geojson"):
        return Format("json")
    if t in ("json-pretty", "geojson-pretty"):
        return Format("json", pretty=True)
    if t in ("ndjson", "jsonl"):
        return Format("ndjson")
    m = _GEOPARQUET_RE.match(t)
    if m:
        return Format("geoparquet", compression=m.group("c"))
    raise ValueError(f"unknown format: {s!r}")


def infer_from_href(href: str) -> Format:
    """Extension → format (format.rs:32-34); default json."""
    ext = href.rsplit(".", 1)[-1].lower() if "." in href else ""
    if ext in ("parquet", "geoparquet"):
        return Format("geoparquet")
    if ext in ("ndjson", "jsonl"):
        return Format("ndjson")
    return Format("json")


# ------------------------------------------------------------- hrefs
# (crates/core/src/href.rs:88-172)

def is_absolute(href: str) -> bool:
    return bool(urlparse(href).scheme) or href.startswith("/")


def absolutize(href: str, base: str) -> str:
    """Resolve `href` relative to `base` (a file path or URL)."""
    if is_absolute(href):
        return href
    p = urlparse(base)
    if p.scheme:
        newpath = posixpath.normpath(posixpath.join(
            posixpath.dirname(p.path), href))
        return urlunparse((p.scheme, p.netloc, newpath, "", "", ""))
    return posixpath.normpath(posixpath.join(posixpath.dirname(base), href))


def relativize(href: str, base: str) -> str:
    """Make `href` relative to `base`'s directory when they share a
    scheme+authority; otherwise return unchanged."""
    hp, bp = urlparse(href), urlparse(base)
    if (hp.scheme, hp.netloc) != (bp.scheme, bp.netloc):
        return href
    rel = posixpath.relpath(hp.path or href,
                            posixpath.dirname(bp.path or base))
    return rel if rel.startswith(".") else f"./{rel}"
