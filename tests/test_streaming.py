"""Structured Streaming ingest: batch/stream parity + incremental
processing via availableNow triggers.

Append-mode windowed aggregation only emits FINALIZED windows (those
the watermark has passed) — the tail windows stay in state when an
availableNow run stops. The parity assertions below encode exactly
that contract: stateless ingest is exact; windowed output is a correct
subset that matches batch on every emitted window.
"""

import os

from pyspark.sql import functions as F

from rustac_spark.geocode import prepare_pages
from rustac_spark.streaming import (
    prepared_stream, run_to_sink, windowed_lang_counts,
)
from rustac_spark.synth import gen_pages, pages_batch


def _write_drop(spark, indir, half):
    """Event-time-ordered drops (a crawl feed is roughly time-ordered;
    data later than the watermark would be legitimately discarded):
    half 0 = first half-year of warc_ts, half 1 = second."""
    import numpy as np
    pdf = pages_batch(np.arange(3000))
    mid = pdf["warc_ts"].quantile(0.5)
    part = pdf[pdf["warc_ts"] <= mid] if half == 0 else pdf[pdf["warc_ts"] > mid]
    spark.createDataFrame(part).write.mode("append").parquet(indir)


def test_streaming_ingest_and_windows(spark, tmp_path):
    indir = str(tmp_path / "in")
    raw_out = str(tmp_path / "raw_out")
    raw_ckpt = str(tmp_path / "raw_ckpt")
    agg_out = str(tmp_path / "agg_out")
    agg_ckpt = str(tmp_path / "agg_ckpt")
    os.makedirs(indir)

    _write_drop(spark, indir, 0)

    # stateless ingest parity: exact
    q = run_to_sink(prepared_stream(spark, indir), raw_out, raw_ckpt)
    q.awaitTermination(120)
    # windowed agg: append mode emits finalized windows only
    q = run_to_sink(windowed_lang_counts(prepared_stream(spark, indir)),
                    agg_out, agg_ckpt)
    q.awaitTermination(120)

    # incremental drop: only new files are processed (checkpoint)
    _write_drop(spark, indir, 1)
    q = run_to_sink(prepared_stream(spark, indir), raw_out, raw_ckpt)
    q.awaitTermination(120)
    q = run_to_sink(windowed_lang_counts(prepared_stream(spark, indir)),
                    agg_out, agg_ckpt)
    q.awaitTermination(120)

    batch_prep = prepare_pages(spark.read.parquet(indir))
    stream_prep = spark.read.parquet(raw_out)
    assert stream_prep.count() == 3000 == batch_prep.count()
    b = {(r["lang"], r["n"]) for r in batch_prep.groupBy("lang")
         .agg(F.count("*").alias("n")).collect()}
    g = {(r["lang"], r["n"]) for r in stream_prep.groupBy("lang")
         .agg(F.count("*").alias("n")).collect()}
    assert g == b and len(g) == 8

    # every emitted window matches the batch computation exactly
    emitted = {(r["window_start"], r["lang"]): r["n_pages"]
               for r in spark.read.parquet(agg_out).collect()}
    assert emitted, "watermark should have finalized most windows"
    batch_win = {(r["window_start"], r["lang"]): r["n_pages"]
                 for r in windowed_lang_counts(batch_prep).collect()}
    for k, v in emitted.items():
        assert batch_win[k] == v
    # and the un-emitted remainder is only the watermark tail
    max_ts = batch_prep.agg(F.max("warc_ts")).collect()[0][0]
    import datetime
    horizon = max_ts - datetime.timedelta(hours=2 + 1)
    for (ws, lang), v in batch_win.items():
        if ws < horizon:
            assert (ws, lang) in emitted
