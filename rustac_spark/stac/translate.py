"""Format translation + migration (the `rustac translate` pipeline,
entry point C in SURVEY.md §3).

- flatten: nested STAC item rows → the stac-geoparquet FlatItem layout
  (properties hoisted to top-level columns; conflicts with the
  reserved top-level names are dropped — reference
  crates/core/src/item.rs:131-177, 571-606, reserved names at 16-25)
- unflatten: the reverse (non-top-level columns re-nested into a
  `properties` struct — geoarrow/json.rs:570-603, TOP_LEVEL_KEYS at
  json.rs:28-39)
- migrate v1.0.0 → v1.1.0: full port of the reference's migration
  (crates/core/src/migrate.rs:82-260): stac_version bump, per-asset
  band-field merge + common-value hoist (migrate_bands,
  migrate.rs:122-213), self-link href absolutization (migrate_links,
  migrate.rs:215-252), license "various"/"proprietary" → "other"
  (migrate_license, migrate.rs:254-267). `migrate_item` is the
  item-dict port; `migrate_1_0_to_1_1` is the column-level fast path
  for flat tables (no assets column → bands step is a no-op there).
- NDJSON in/out: Spark's native JSON source/sink
- stac-geoparquet sink: ZSTD + 150k row groups + the two KV footer
  metadata entries other implementations require: "geo" (GeoParquet
  1.1 metadata with the bbox `covering` declaration,
  crates/core/src/geoparquet.rs:410-435) and "stac-geoparquet"
  (version + collections, geoparquet.rs:28-35,240-248,516-542).

All pure select/struct transforms — a lazy single-pass pipeline,
mirroring how the reference streams item-by-item but letting Catalyst
fuse the whole translation into the scan.
"""

from __future__ import annotations

import json
from collections import Counter

from pyspark.sql import DataFrame, functions as F

# geoarrow/json.rs:28-39
TOP_LEVEL_KEYS = ["type", "stac_version", "stac_extensions", "id",
                  "geometry", "bbox", "links", "assets", "collection"]


def flatten_items(df: DataFrame,
                  properties_col: str = "properties") -> DataFrame:
    """Hoist properties.* to top-level columns (FlatItem layout).
    A property whose name collides with a reserved top-level key is
    dropped (reference behavior for the write path)."""
    top = [c for c in df.columns if c != properties_col]
    prop_fields = [f.name for f in df.schema[properties_col].dataType.fields]
    keep = [p for p in prop_fields if p not in TOP_LEVEL_KEYS]
    return df.select(
        *top, *[F.col(f"{properties_col}.`{p}`").alias(p) for p in keep])


def unflatten_items(df: DataFrame) -> DataFrame:
    """Re-nest every non-top-level column into a properties struct."""
    top = [c for c in df.columns if c in TOP_LEVEL_KEYS]
    rest = [c for c in df.columns if c not in TOP_LEVEL_KEYS]
    return df.select(
        *top, F.struct(*[F.col(f"`{c}`").alias(c) for c in rest])
        .alias("properties"))


def migrate_1_0_to_1_1(df: DataFrame) -> DataFrame:
    """Column-level port of the v1.0.0→v1.1.0 migration steps."""
    out = df
    if "stac_version" in out.columns:
        out = out.withColumn("stac_version", F.lit("1.1.0"))
    if "eo:bands" in out.columns and "bands" not in out.columns:
        out = out.withColumnRenamed("eo:bands", "bands")
    if "license" in out.columns:
        out = out.withColumn(
            "license",
            F.when(F.col("license").isin("various", "proprietary"),
                   F.lit("other")).otherwise(F.col("license")))
    return out


def _migrate_bands(asset: dict) -> None:
    """Per-asset band merge + common-value hoist — port of
    migrate_bands (crates/core/src/migrate.rs:122-213).

    eo:bands entries keep "name" and prefix everything else with
    "eo:"; raster:bands entries keep nodata/data_type/statistics/unit
    and prefix the rest with "raster:". A key whose most frequent
    value occurs in >1 bands is hoisted to the asset and removed from
    the bands that carry that value. (The reference's tie-break across
    equally-frequent values is HashMap-iteration-order nondeterministic;
    here ties break on the smaller JSON encoding, deterministically.)
    """
    bands: list[dict] = []
    eo = asset.pop("eo:bands", None)
    if isinstance(eo, list):
        bands = [{} for _ in eo]
        for eo_band, band in zip(eo, bands):
            if isinstance(eo_band, dict):
                for key, value in eo_band.items():
                    band[key if key == "name" else f"eo:{key}"] = value
    raster = asset.pop("raster:bands", None)
    if isinstance(raster, list):
        while len(bands) < len(raster):
            bands.append({})
        keep = {"nodata", "data_type", "statistics", "unit"}
        for raster_band, band in zip(raster, bands):
            if isinstance(raster_band, dict):
                for key, value in raster_band.items():
                    band[key if key in keep else f"raster:{key}"] = value

    counts: dict[str, Counter] = {}
    values: dict[str, object] = {}
    for band in bands:
        for key, value in band.items():
            enc = json.dumps(value, sort_keys=True)
            values.setdefault(enc, value)
            counts.setdefault(key, Counter())[enc] += 1
    for key, count in counts.items():
        n = max(count.values())
        enc = min(e for e, c in count.items() if c == n)
        if n > 1:
            value = values[enc]
            for band in bands:
                if key in band \
                        and json.dumps(band[key], sort_keys=True) == enc:
                    asset[key] = band.pop(key)
    if any(bands):
        asset["bands"] = bands


def _migrate_links(obj: dict) -> None:
    """Self-link href absolutization — port of migrate_links
    (migrate.rs:215-252). POSIX-absolute hrefs become file:// URLs."""
    for link in obj.get("links") or []:
        if not isinstance(link, dict) or link.get("rel") != "self":
            continue
        href = link.get("href")
        if isinstance(href, str) and href.startswith("/"):
            link["href"] = f"file://{href}"


def _migrate_license(obj: dict) -> None:
    if obj.get("license") in ("various", "proprietary"):
        obj["license"] = "other"


def migrate_item(item: dict, to: str = "1.1.0") -> dict:
    """Full v1.0.0 → v1.1.0 migration of one STAC object dict — the
    item-level port of Step::migrate (migrate.rs:82-120). Returns a
    new dict; the input is not mutated."""
    import copy
    obj = copy.deepcopy(item)
    if "stac_version" not in obj:
        return obj  # reference: warn + skip when version is absent
    assets = obj.get("assets")
    if isinstance(assets, dict):
        for asset in assets.values():
            if isinstance(asset, dict):
                _migrate_bands(asset)
    _migrate_links(obj)
    if obj.get("type") == "Feature":
        props = obj.setdefault("properties", {})
        _migrate_license(props)
    else:
        _migrate_license(obj)
    obj["stac_version"] = to
    return obj


def coerce_item_columns(df: DataFrame) -> DataFrame:
    """Dirty-parquet read-path coercions, the DataFrame twin of the
    reference's row fixups (crates/core/src/geoarrow/json.rs:539-563):

    - `type` forced to "Feature" when the column exists
    - non-string `id` cast to its string representation
    - a stringified `stac_extensions` (e.g. '["a","b"]') re-parsed
      into array<string>

    Pure Column ops — safe to leave in every read plan (each rule is a
    no-op when the column already has the right type)."""
    from pyspark.sql.types import ArrayType, StringType
    out = df
    if "type" in out.columns:
        out = out.withColumn("type", F.lit("Feature"))
    if "id" in out.columns and \
            not isinstance(out.schema["id"].dataType, StringType):
        out = out.withColumn("id", F.col("id").cast("string"))
    if "stac_extensions" in out.columns and \
            isinstance(out.schema["stac_extensions"].dataType, StringType):
        out = out.withColumn(
            "stac_extensions",
            F.from_json("stac_extensions", ArrayType(StringType())))
    return out


def read_ndjson_items(spark, path: str) -> DataFrame:
    """NDJSON source (Spark-native JSON reader, schema inferred —
    the analogue of infer_json_schema_from_iterator in
    geoarrow/mod.rs:182-198)."""
    return spark.read.json(path)


def write_ndjson_items(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


STAC_GEOPARQUET_VERSION = "1.0.0"  # geoparquet.rs:35
GEOPARQUET_VERSION = "1.1.0"


def geo_metadata(columns: list[str],
                 geometry_column: str = "geometry") -> dict:
    """The GeoParquet `geo` footer metadata dict, with the bbox
    `covering` declaration when a bbox struct column exists — mirror
    of bbox_covering + into_keyvalue (geoparquet.rs:397-435)."""
    col: dict = {"encoding": "WKB", "geometry_types": []}
    if "bbox" in columns:
        col["covering"] = {"bbox": {
            "xmin": ["bbox", "xmin"], "ymin": ["bbox", "ymin"],
            "xmax": ["bbox", "xmax"], "ymax": ["bbox", "ymax"],
        }}
    return {"version": GEOPARQUET_VERSION,
            "primary_column": geometry_column,
            "columns": {geometry_column: col}}


def stac_geoparquet_metadata(collections: dict | None = None) -> dict:
    """The `stac-geoparquet` footer metadata dict
    (geoparquet.rs:240-248; empty collections map omitted, matching
    serde's skip_serializing_if)."""
    out: dict = {"version": STAC_GEOPARQUET_VERSION}
    if collections:
        out["collections"] = collections
    return out


def _arrow_fs(path: str):
    """Resolve a destination to (pyarrow filesystem, fs-local path) —
    the executor-side twin of the reference's object-store dispatch
    (crates/io/src/store.rs:15-62): s3://, gs://, hdfs:// resolve via
    pyarrow.fs.FileSystem.from_uri; bare paths and file:// are local."""
    from pyarrow import fs as pafs
    if path.startswith("file://"):
        return pafs.LocalFileSystem(), path[len("file://"):]
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def write_stac_geoparquet(df: DataFrame, path: str,
                          row_group_rows: int = 150_000,
                          collections: dict | None = None) -> None:
    """Parquet sink with the reference writer's defaults — ZSTD,
    150k-row row groups (crates/core/src/geoparquet.rs:24-29) — plus
    the `geo` and `stac-geoparquet` KV footer metadata other
    stac-geoparquet implementations require (the reference appends
    them at finish(), geoparquet.rs:516-542,624-631).

    SINGLE distributed pass: Spark's parquet writer can't attach
    arbitrary footer KV, so each partition streams its Arrow batches
    through its own pyarrow ParquetWriter (mapInArrow — no pandas
    round-trip, no driver-side data movement) with the KV metadata in
    the schema at open. Batches are re-chunked so every full row group
    holds exactly `row_group_rows` rows. Part filenames are
    deterministic per partition id, so a task retry overwrites its own
    partial output. Destinations resolve through pyarrow.fs, covering
    s3://, gs://, hdfs:// as well as local paths (round-2 ADVICE: the
    old glob-based post-pass silently skipped non-local paths)."""
    import pyarrow as pa

    kv = {
        b"geo": json.dumps(geo_metadata(df.columns)).encode(),
        b"stac-geoparquet":
            json.dumps(stac_geoparquet_metadata(collections)).encode(),
    }

    fs, base = _arrow_fs(path)
    from pyarrow import fs as pafs
    fs.create_dir(base, recursive=True)
    # mode=overwrite: clear previous parts (and stale markers)
    for info in fs.get_file_info(pafs.FileSelector(base)):
        if info.type == pafs.FileType.File:
            fs.delete_file(info.path)

    def write_partition(batches):
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        wfs, wbase = _arrow_fs(path)
        out = f"{wbase}/part-{pid:05d}.parquet"
        writer = None
        acc: list[pa.Table] = []
        n = 0

        def flush(final: bool) -> None:
            nonlocal acc, n
            while n >= row_group_rows or (final and n > 0):
                t = pa.concat_tables(acc).combine_chunks()
                take = min(n, row_group_rows)
                writer.write_table(t.slice(0, take), row_group_size=take)
                rest = t.slice(take)
                acc = [rest] if rest.num_rows else []
                n = rest.num_rows

        total = 0
        for rb in batches:
            if rb.num_rows == 0:
                continue
            if writer is None:
                schema = rb.schema.with_metadata(kv)
                writer = pq.ParquetWriter(out, schema, filesystem=wfs,
                                          compression="zstd")
            acc.append(pa.Table.from_batches([rb]))
            n += rb.num_rows
            total += rb.num_rows
            flush(final=False)
        if writer is not None:
            flush(final=True)
            writer.close()
            yield pa.RecordBatch.from_pydict(
                {"file": [out], "rows": [total]})

    # the collect is one tiny (file, rows) row per partition — the
    # data itself never crosses the driver
    df.mapInArrow(write_partition, "file string, rows long").collect()
    with fs.open_output_stream(f"{base}/_SUCCESS") as f:
        f.write(b"")


def read_stac_geoparquet_metadata(path: str) -> dict:
    """Parse the `geo` + `stac-geoparquet` KV footer metadata of a
    stac-geoparquet dataset (first part file — all parts carry the
    same KVs). Resolves non-local paths through pyarrow.fs."""
    import pyarrow.parquet as pq
    from pyarrow import fs as pafs
    fs, base = _arrow_fs(path)
    info = fs.get_file_info(base)
    if info.type == pafs.FileType.Directory:
        parts = sorted(i.path for i in
                       fs.get_file_info(pafs.FileSelector(base))
                       if i.path.endswith(".parquet"))
        first = parts[0] if parts else base
    else:
        first = base
    meta = pq.read_schema(first, filesystem=fs).metadata or {}
    out = {}
    for key in (b"geo", b"stac-geoparquet"):
        if key in meta:
            out[key.decode()] = json.loads(meta[key])
    return out
