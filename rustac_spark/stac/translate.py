"""Format translation + migration (the `rustac translate` pipeline,
entry point C in SURVEY.md §3).

- flatten: nested STAC item rows → the stac-geoparquet FlatItem layout
  (properties hoisted to top-level columns; conflicts with the
  reserved top-level names are dropped — reference
  crates/core/src/item.rs:131-177, 571-606, reserved names at 16-25)
- unflatten: the reverse (non-top-level columns re-nested into a
  `properties` struct — geoarrow/json.rs:570-603, TOP_LEVEL_KEYS at
  json.rs:28-39)
- migrate v1.0.0 → v1.1.0: stac_version bump, `eo:bands` → `bands`,
  license "various"/"proprietary" → "other"
  (crates/core/src/migrate.rs:9-119)
- NDJSON in/out: Spark's native JSON source/sink

All pure select/struct transforms — a lazy single-pass pipeline,
mirroring how the reference streams item-by-item but letting Catalyst
fuse the whole translation into the scan.
"""

from __future__ import annotations

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


def read_ndjson_items(spark, path: str) -> DataFrame:
    """NDJSON source (Spark-native JSON reader, schema inferred —
    the analogue of infer_json_schema_from_iterator in
    geoarrow/mod.rs:182-198)."""
    return spark.read.json(path)


def write_ndjson_items(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_stac_geoparquet(df: DataFrame, path: str,
                          row_group_rows: int = 150_000) -> None:
    """Parquet sink with the reference writer's defaults: ZSTD,
    150k-row row groups (crates/core/src/geoparquet.rs:24-29)."""
    (df.write.mode("overwrite")
     .option("compression", "zstd")
     .option("parquet.block.size", str(row_group_rows * 256))
     .parquet(path))
