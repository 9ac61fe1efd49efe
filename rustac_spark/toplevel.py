"""Top-level convenience API — the reference's free-function surface
(crates/core/src/lib.rs:168 ``read``, io/src/format.rs ``Format::
read/write``, io/src/api.rs ``search``) re-expressed over Spark, so a
user of the reference can switch with the same three verbs:

    from rustac_spark import read, write, search, search_api

    items = read(spark, "items.parquet")            # format inferred
    hits  = search(spark, "items.parquet",
                   bbox=[-106.1, 40.5, -106.0, 40.6],
                   datetime="2024", limit=10)
    write(hits, "out.ndjson")                        # format inferred
    remote = search_api(spark, "https://stac.example/api",
                        {"collections": ["c"]})      # HTTP source

Everything returns lazy DataFrames (except the JSON single-value
sink, which drains driver-side by design — io/src/format.rs json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .stac.io import Format, configure_object_store, infer_from_href


def _route_store(spark: SparkSession, href: str,
                 options: dict) -> str:
    """Route object-store schemes (s3://, gs://, abfs:// …) through
    the Hadoop connector config; leave Spark-native schemes
    (hdfs://, file://, plain paths) untouched — Spark reads those
    directly, and rejecting them here would break hrefs the lineage
    layer explicitly supports."""
    from .stac.io import _STORE_SCHEMES

    scheme = href.split("://", 1)[0] if "://" in href else ""
    if scheme in _STORE_SCHEMES:
        return configure_object_store(spark, href, **options)
    if options:
        raise ValueError(
            f"store options given but {scheme or 'local'!r} is not an "
            f"object-store scheme")
    return href


def read(spark: SparkSession, href: str,
         format: Format | str | None = None, **store_options
         ) -> DataFrame:
    """Read a STAC item table from geoparquet / ndjson / json, format
    inferred from the href when not given (format.rs
    ``infer_from_href``). Object-store hrefs (s3://, gs://, abfs://)
    are routed through the Hadoop connector config."""
    from .stac.io import format_from_str
    from .stac.translate import coerce_item_columns, read_ndjson_items

    href = _route_store(spark, href, store_options)
    fmt = (format_from_str(format) if isinstance(format, str)
           else format) or infer_from_href(href)
    if fmt.kind == "geoparquet":
        return coerce_item_columns(spark.read.parquet(href))
    if fmt.kind == "ndjson":
        return read_ndjson_items(spark, href)
    # single-value JSON: a FeatureCollection document
    return _read_feature_collection(spark, href)


def _read_feature_collection(spark: SparkSession, href: str) -> DataFrame:
    import json as _json

    from .stac.transactions import items_dataframe
    with open(href) as f:
        doc = _json.load(f)
    feats = (doc.get("features", []) if isinstance(doc, dict)
             else list(doc))
    # the transaction normalizer handles GeoJSON→WKB, bbox, datetimes
    return items_dataframe(spark, feats)


def write(df: DataFrame, href: str,
          format: Format | str | None = None, **store_options) -> None:
    """Write items as stac-geoparquet (ZSTD + geo footer metadata),
    NDJSON, or a single JSON FeatureCollection — format inferred from
    the href (format.rs ``Format::write``)."""
    from .stac.io import format_from_str
    from .stac.items_io import write_feature_collection
    from .stac.translate import write_ndjson_items, write_stac_geoparquet

    href = _route_store(df.sparkSession, href, store_options)
    fmt = (format_from_str(format) if isinstance(format, str)
           else format) or infer_from_href(href)
    if fmt.kind == "geoparquet":
        write_stac_geoparquet(df, href)
    elif fmt.kind == "ndjson":
        write_ndjson_items(df, href)
    else:
        write_feature_collection(df, href)


def search(spark: SparkSession, href_or_df, **kwargs) -> DataFrame:
    """One-call search over a table or href — the library twin of the
    CLI search subcommand and the reference's DuckDB search
    (duckdb/src/client.rs). kwargs are Search fields (ids,
    collections, bbox, intersects, datetime, filter, fields, sortby,
    limit, offset)."""
    from .stac.search import Search, build_plan

    df = (href_or_df if isinstance(href_or_df, DataFrame)
          else read(spark, href_or_df))
    return build_plan(df, Search(**kwargs))


def search_api(spark: SparkSession, url: str,
               search_body: dict | None = None, **kwargs) -> DataFrame:
    """POST {url}/search with next-link paging → DataFrame
    (io/src/api.rs ``search``)."""
    from .stac.api_client import read_stac_api

    return read_stac_api(spark, url, search_body, **kwargs)
