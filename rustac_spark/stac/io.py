"""Format inference + href utilities (reimplements the reference's IO
surface: crates/io/src/format.rs, crates/core/src/href.rs).

Driver-side metadata helpers — no Spark cost. The object-store
connector story maps to Hadoop FS schemes configured via
``spark.hadoop.*`` (s3a://, abfss://, gs:// — reference
crates/io/src/store.rs:15-62 parses the same scheme set).
"""

from __future__ import annotations

import os
import posixpath
import re
from dataclasses import dataclass
from urllib.parse import urlparse, urlunparse

# object_store scheme → (Hadoop FS scheme, hadoop conf prefix); the
# same scheme set parse_href_opts dispatches on (store.rs:26-56)
_STORE_SCHEMES = {
    "s3": ("s3a", "fs.s3a"),
    "s3a": ("s3a", "fs.s3a"),
    "gs": ("gs", "fs.gs"),
    "az": ("abfss", "fs.azure"),
    "abfs": ("abfss", "fs.azure"),
    "abfss": ("abfss", "fs.azure"),
    "file": ("file", None),
    "": ("file", None),
}

# env vars the reference's from_env() builders honor → hadoop keys
_S3_ENV = {
    "AWS_ACCESS_KEY_ID": "fs.s3a.access.key",
    "AWS_SECRET_ACCESS_KEY": "fs.s3a.secret.key",
    "AWS_SESSION_TOKEN": "fs.s3a.session.token",
    "AWS_ENDPOINT_URL": "fs.s3a.endpoint",
    "AWS_REGION": "fs.s3a.endpoint.region",
}


def configure_object_store(spark, href: str, **options) -> str:
    """Configure the session's Hadoop FS for the href's scheme and
    return the href rewritten to the Hadoop scheme (s3://→s3a:// etc.)
    — the Spark twin of the reference's parse_href_opts
    (crates/io/src/store.rs:15-62): scheme dispatch, environment
    credentials, explicit options overriding env.

    Options use the store's native key names (dots allowed) or hadoop
    keys directly; unknown keys are passed through under the scheme's
    hadoop prefix.
    """
    u = urlparse(href)
    if u.scheme not in _STORE_SCHEMES:
        raise ValueError(f"unsupported object-store scheme: {u.scheme!r}")
    hadoop_scheme, prefix = _STORE_SCHEMES[u.scheme]
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    if prefix == "fs.s3a":
        for env, key in _S3_ENV.items():
            if os.environ.get(env):
                conf.set(key, os.environ[env])
    for key, value in options.items():
        if key.startswith("fs."):
            full = key
        elif prefix is None:
            raise ValueError(
                f"option {key!r} has no namespace for scheme "
                f"{u.scheme or 'file'!r}; pass a fully-qualified fs.* key")
        else:
            full = f"{prefix}.{key}"
        conf.set(full, str(value))
    if u.scheme != hadoop_scheme and u.scheme:
        href = href.replace(f"{u.scheme}://", f"{hadoop_scheme}://", 1)
    return href


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
