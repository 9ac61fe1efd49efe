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
    PAGES_SCHEMA, prepared_stream, run_to_sink, windowed_lang_counts,
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


def test_sessionize_stream_stateful(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): gap
    sessionization with per-user GroupState + event-time timeout.
    Three ordered file drops -> closed sessions emit exactly once;
    the still-open tail stays in state (append contract)."""
    import time
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from rustac_spark.streaming import sessionize_stream

    indir = str(tmp_path / "ev_in")
    out = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ckpt")
    os.makedirs(indir)

    schema = pa.schema([("user_id", pa.int64()),
                        ("ts", pa.timestamp("us", tz="UTC")),
                        ("value", pa.float64())])

    def drop(name, rows, mtime):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"], utc=True)
        pq.write_table(pa.Table.from_pandas(pdf, schema=schema),
                       f"{indir}/{name}")
        os.utime(f"{indir}/{name}", (mtime, mtime))

    t0 = time.time() - 1000
    # session A: user 1, two events 5 min apart; user 2: one event
    drop("f1.parquet", [(1, "2024-01-01 10:00:00", 1.0),
                        (1, "2024-01-01 10:05:00", 2.0),
                        (2, "2024-01-01 10:00:00", 5.0)], t0)
    # 4h55 gap closes session A in-batch and opens session B
    drop("f2.parquet", [(1, "2024-01-01 15:00:00", 3.0)], t0 + 10)
    # far-future event advances the watermark past user 2's quiet
    # period -> its open session times out and emits
    drop("f3.parquet", [(99, "2024-01-02 09:00:00", 0.0)], t0 + 20)

    from pyspark.sql import functions as F  # noqa: F811
    events = (spark.readStream
              .schema("user_id long, ts timestamp, value double")
              .option("maxFilesPerTrigger", "1")
              .parquet(indir))
    sess = sessionize_stream(events, gap_minutes=30,
                             watermark="10 minutes")
    q = (sess.writeStream.outputMode("append")
         .option("checkpointLocation", ckpt)
         .format("parquet").option("path", out)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {(r["user_id"], str(r["session_start"]), str(r["session_end"]),
            r["n_events"], r["sum_value"])
           for r in spark.read.parquet(out).collect()}
    # exactly-once: session A closed by the in-batch gap; user 2 and
    # user 1's session B closed by event-time timeout once the f3
    # watermark passed their quiet periods; user 99 stays open in state
    assert got == {
        (1, "2024-01-01 10:00:00", "2024-01-01 10:05:00", 2, 3.0),
        (1, "2024-01-01 15:00:00", "2024-01-01 15:00:00", 1, 3.0),
        (2, "2024-01-01 10:00:00", "2024-01-01 10:00:00", 1, 5.0),
    }


def test_dedup_stream_drops_duplicates(spark, tmp_path):
    """Streaming exact dedup: first arrival per content hash survives,
    in-watermark duplicates are dropped, distinct texts all pass."""
    import time
    from rustac_spark.streaming import dedup_stream

    indir = str(tmp_path / "dd_in")
    out = str(tmp_path / "dd_out")
    ckpt = str(tmp_path / "dd_ckpt")
    os.makedirs(indir)

    import numpy as np
    pdf = pages_batch(np.arange(500))
    dup = pdf.copy()
    dup["url"] = dup["url"] + "?mirror=1"  # same text, different url
    t0 = time.time() - 100
    spark.createDataFrame(pdf).write.parquet(f"{indir}/d1")
    spark.createDataFrame(dup).write.parquet(f"{indir}/d2")
    for i, d in enumerate(("d1", "d2")):
        for f in os.listdir(f"{indir}/{d}"):
            os.utime(f"{indir}/{d}/{f}", (t0 + i, t0 + i))

    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(f"{indir}/*"))
    # watermark wider than the fixture's event-time span: the file
    # drops are NOT time-ordered here, so a tight watermark would
    # (correctly) discard late rows — this test isolates the dedup
    # semantics from late-data eviction
    q = (dedup_stream(stream, watermark="9000 hours")
         .writeStream.outputMode("append")
         .option("checkpointLocation", ckpt)
         .format("parquet").option("path", out)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = spark.read.parquet(out)
    # exactly one survivor per distinct text; none of the mirrors
    assert got.count() == 500
    assert got.select("text").distinct().count() == 500
    from pyspark.sql import functions as F2
    assert got.where(F2.col("url").contains("mirror")).count() == 0


def test_streaming_tile_counts_match_batch(spark, tmp_path):
    """Stream pages → Column prepare → tile explode → windowed counts
    equals the batch computation over the same files."""
    from rustac_spark import DATA_DIR
    from rustac_spark.geo.tiles import explode_tiles
    from rustac_spark.streaming import (
        prepared_stream, streaming_tile_counts)

    indir = str(tmp_path / "drops")
    pages = spark.read.parquet(f"{DATA_DIR}/pages_sf0.001.parquet")
    pages.limit(2000).repartition(4).write.parquet(indir)

    out = streaming_tile_counts(prepared_stream(spark, indir), zoom=4)
    q = (out.writeStream.format("memory").queryName("tile_stream")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["window_start"], r["tile_x"], r["tile_y"]): r["n_pages"]
           for r in spark.sql("select * from tile_stream").collect()}

    batch_prep = prepare_pages(spark.read.parquet(indir))
    batch = (explode_tiles(batch_prep.select(
                 "url", "warc_ts", "xmin", "ymin", "xmax", "ymax"), 4)
             .groupBy(F.window("warc_ts", "1 hour").alias("w"),
                      "tile_x", "tile_y")
             .agg(F.count("*").alias("n_pages"))
             .select(F.col("w.start").alias("ws"), "tile_x", "tile_y",
                     "n_pages"))
    want = {(r["ws"], r["tile_x"], r["tile_y"]): r["n_pages"]
            for r in batch.collect()}
    assert got == want and len(got) > 0


def test_near_dup_stream_flags_cross_batch(spark, tmp_path):
    """Stateful streaming near-dup: a doc arriving in a LATER file
    drop is flagged against a doc from an earlier drop (state carries
    across micro-batches via the checkpoint); unique docs are silent;
    the flagged pair agrees with the batch simhash distance."""
    from datetime import datetime

    from rustac_spark.streaming import (PAGES_SCHEMA, near_dup_stream,
                                        run_to_sink)
    from rustac_spark.textops.simhash import simhash64

    base = "the quick brown fox jumps over the lazy dog " * 6
    near = base.replace("lazy", "lazzy")  # may or may not be ≤3 bits
    dist = bin((simhash64(base) ^ simhash64(near))
               & ((1 << 64) - 1)).count("1")
    rows1 = [("u1", datetime(2024, 1, 1, 10, 0), b"", base, "en"),
             ("u2", datetime(2024, 1, 1, 10, 1), b"",
              "completely different content about something else "
              "entirely, with no shared phrasing at all", "en")]
    rows2 = [("u3", datetime(2024, 1, 1, 10, 30), b"", base, "en")]
    if dist <= 3:
        rows2.append(("u4", datetime(2024, 1, 1, 10, 31), b"",
                      near, "en"))
    indir, outdir, ck = (str(tmp_path / d) for d in
                         ("in", "out", "ck"))
    spark.createDataFrame(rows1, PAGES_SCHEMA).write.parquet(
        f"{indir}/d1")

    stream = lambda: near_dup_stream(
        spark.readStream.schema(PAGES_SCHEMA).parquet(f"{indir}/*"),
        watermark="2 hours")
    q = run_to_sink(stream(), outdir, ck)
    q.awaitTermination(120)
    spark.createDataFrame(rows2, PAGES_SCHEMA).write.parquet(
        f"{indir}/d2")
    q = run_to_sink(stream(), outdir, ck)
    q.awaitTermination(120)

    got = {(r["doc_id"], r["dup_of"], r["hamming"])
           for r in spark.read.parquet(outdir).collect()}
    docs_flagged = {d for d, _, _ in got}
    assert "u3" in docs_flagged            # exact dup across batches
    assert ("u3", "u1", 0) in got
    assert "u1" not in docs_flagged and "u2" not in docs_flagged
    if dist <= 3:
        assert any(d == "u4" and h == dist for d, _, h in got)
