"""Structured Streaming extension: incremental ingest of new pages.

The reference has async page-streaming, not data-streaming semantics
(SURVEY.md §2.9) — nothing here is required for parity. This module is
the optional scale extension the survey names: new crawl files land in
a directory; a file-source stream prepares them (same single-pass
extract+geocode kernel as batch — identical semantics by construction)
and maintains tumbling-window per-language counts with a watermark for
late warc_ts arrivals.

Batch/stream parity: `prepare_pages` is the same function; the
windowed aggregation mirrors the batch `events_hourly` oracle shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (BinaryType, StringType, StructField,
                               StructType, TimestampType)

from .geocode import prepare_pages

PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])


def stream_pages(spark: SparkSession, input_dir: str,
                 max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream of raw pages parquet drops."""
    return (spark.readStream
            .schema(PAGES_SCHEMA)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(input_dir))


def prepared_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """Streaming ingest with the batch-identical prepare kernel."""
    return prepare_pages(stream_pages(spark, input_dir))


def windowed_lang_counts(prepared: DataFrame,
                         window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window per-language page counts with late-data
    watermark on warc_ts."""
    return (prepared
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("w"), "lang")
            .agg(F.count("*").alias("n_pages"))
            .select(F.col("w.start").alias("window_start"),
                    "lang", "n_pages"))


def run_to_sink(agg: DataFrame, out_dir: str, checkpoint_dir: str,
                once: bool = True):
    """Start the query (availableNow semantics for tests/backfills:
    process everything currently available, then stop)."""
    w = (agg.writeStream
         .outputMode("append")
         .option("checkpointLocation", checkpoint_dir)
         .format("parquet")
         .option("path", out_dir))
    if once:
        w = w.trigger(availableNow=True)
    return w.start()
