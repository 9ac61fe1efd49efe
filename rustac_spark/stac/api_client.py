"""HTTP STAC API source: POST /search with next-link paging.

Closes the last SURVEY §2.1 parity row: the reference's API client
walks an ItemCollection stream by following rel="next" links, merging
each link's body into the original search (crates/io/src/api.rs:36-69,
419-472). The Spark-first shape: the page walk is inherently a serial
protocol (each next link comes from the previous response), so the
driver streams features to an NDJSON spool as they arrive — never
holding the result set in memory — and the PARSING is distributed via
the existing schema-inferring NDJSON reader. At scale the spool path
can be any Hadoop-visible location and many searches (one per
collection / time slice) fan out as independent driver tasks.

stdlib-only (urllib); tested against an in-process mock server.
"""

from __future__ import annotations

import json
import os
import tempfile
import urllib.request
from typing import Iterator

from pyspark.sql import DataFrame


def _post_json(url: str, body: dict, timeout: float) -> dict:
    req = urllib.request.Request(
        url, data=json.dumps(body).encode("utf-8"),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read().decode("utf-8"))


def fetch_search_features(url: str, search_body: dict | None = None,
                          max_pages: int = 1000,
                          timeout: float = 30.0) -> Iterator[dict]:
    """Yield item dicts from POST {url}/search, following rel=next.

    Next-link semantics per the STAC API spec (and api.rs:452-466):
    the link may carry its own href/body; ``merge: true`` means the
    link body overlays the original search body.

    Page n+1 is PREFETCHED on a single background thread as soon as
    page n's next link is known, while the caller consumes page n's
    features — the one-ahead analogue of the reference's buffered
    page channel (api.rs:23,419-448). Remote latency then overlaps
    parse/spool time instead of adding to it, page for page. The
    protocol itself stays serial (each next link comes from the
    previous response), so one worker is the maximum useful depth.
    Note the look-ahead means one page beyond what the caller
    consumes may be requested; a caller that abandons the generator
    early does NOT wait for that in-flight request — the pool is
    released without joining it (round-6 advice: the context-manager
    form blocked in ``__exit__`` for up to ``timeout`` seconds)."""
    from concurrent.futures import ThreadPoolExecutor

    base_body = dict(search_body or {})
    page_url = url.rstrip("/") + "/search"
    body = base_body
    pool = ThreadPoolExecutor(max_workers=1)
    try:
        fut = pool.submit(_post_json, page_url, body, timeout)
        for page_no in range(max_pages):
            doc = fut.result()
            nxt = next((l for l in doc.get("links", [])
                        if l.get("rel") == "next"), None)
            if nxt is not None and page_no + 1 < max_pages:
                # launch the next fetch BEFORE yielding this page so
                # the download runs while the caller processes rows
                page_url = nxt["href"]
                body = dict(nxt.get("body") or {})
                if nxt.get("merge"):
                    merged = dict(base_body)
                    merged.update(body)
                    body = merged
                fut = pool.submit(_post_json, page_url, body, timeout)
            yield from doc.get("features", [])
            if nxt is None or page_no + 1 >= max_pages:
                return
    finally:
        # wait=False: never block a caller that stopped iterating on
        # the in-flight prefetch; the daemon-less worker thread just
        # finishes its request and exits
        pool.shutdown(wait=False)


def read_stac_api(spark, url: str, search_body: dict | None = None,
                  max_pages: int = 1000, timeout: float = 30.0,
                  spool_dir: str | None = None) -> DataFrame:
    """POST /search → DataFrame. Features stream to an NDJSON spool
    file (constant driver memory), then parse distributed via the
    schema-inferring NDJSON reader (translate.read_ndjson_items)."""
    from .translate import read_ndjson_items

    fd, path = tempfile.mkstemp(suffix=".ndjson", dir=spool_dir)
    n = 0
    with os.fdopen(fd, "w") as f:
        for feat in fetch_search_features(url, search_body,
                                          max_pages, timeout):
            f.write(json.dumps(feat) + "\n")
            n += 1
    if n == 0:
        # empty ItemCollection: schemaless NDJSON would fail
        # inference, so build an empty TYPED frame with the minimal
        # STAC item columns — callers can keep chaining .select("id")
        # etc. (the reference returns an empty ItemCollection, not a
        # column-less one; round-6 verdict item #3)
        os.remove(path)
        return spark.createDataFrame([], (
            "type string, stac_version string, id string, "
            "collection string"))
    # eager checkpoint so the spool file can be deleted immediately —
    # the result is bounded by max_pages, so materializing it is
    # cheap, and nothing in the session keeps a handle on the temp
    # file afterwards (r3-advice cleanup)
    df = read_ndjson_items(spark, path).localCheckpoint(eager=True)
    os.remove(path)
    return df
