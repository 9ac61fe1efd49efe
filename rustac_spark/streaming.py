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


SESSION_OUT_SCHEMA = ("user_id long, session_start timestamp, "
                      "session_end timestamp, n_events long, "
                      "sum_value double")
# open-session state: epoch-MICROsecond bounds + running count/sum
# (whole seconds would truncate sub-second timestamps and flip gap
# decisions at the threshold — must match events.sessionize exactly)
SESSION_STATE_SCHEMA = "start long, end long, n long, s double"


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      watermark: str = "1 hour",
                      user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization
    with applyInPandasWithState (the batch twin is events.sessionize —
    same gap rule, same aggregates).

    Per-user GroupState holds the open session (start, end, n, sum).
    Events extend it or close it (gap > gap_minutes); a closed session
    is emitted immediately, and the trailing open session is emitted
    by an event-time timeout once the watermark passes its end + gap —
    so every session is emitted exactly once, late events within the
    watermark merge correctly, and state is O(users), not O(events).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        user = key[0]
        closed = []
        if state.hasTimedOut:
            st, en, n, s = state.get
            closed.append((user, st, en, n, s))
            state.remove()
        else:
            parts = [pdf for pdf in pdfs if len(pdf)]
            if parts:
                df = pd.concat(parts).sort_values(ts_col)
                us = (df[ts_col].astype("int64") // 1_000).to_numpy()
                vals = df["value"].to_numpy()
                if state.exists:
                    st, en, n, s = state.get
                else:
                    st, en, n, s = None, 0, 0, 0.0
                for t, v in zip(us, vals):
                    t = int(t)
                    if st is None:
                        st, en, n, s = t, t, 1, float(v)
                    elif t - en > gap_us:
                        closed.append((user, st, en, n, s))
                        st, en, n, s = t, t, 1, float(v)
                    else:
                        # a late-but-in-watermark event may precede the
                        # open session's start — take min(st, t) so
                        # session_start matches the batch twin's min(ts)
                        st, en, n, s = (min(st, t), max(en, t),
                                        n + 1, s + float(v))
                state.update((st, en, n, float(s)))
                # emit the open session when the watermark passes its
                # quiet period (ms — GroupState event-time timeout unit)
                state.setTimeoutTimestamp((en + gap_us) // 1000)
        out = pd.DataFrame(
            closed, columns=["user_id", "_st", "_en", "n_events",
                             "sum_value"])
        out["session_start"] = pd.to_datetime(out["_st"], unit="us")
        out["session_end"] = pd.to_datetime(out["_en"], unit="us")
        yield out[["user_id", "session_start", "session_end",
                   "n_events", "sum_value"]]

    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(user_col)
            .applyInPandasWithState(
                fn, SESSION_OUT_SCHEMA, SESSION_STATE_SCHEMA,
                "append", GroupStateTimeout.EventTimeTimeout))


def dedup_stream(pages: DataFrame, watermark: str = "2 hours",
                 ts_col: str = "warc_ts",
                 text_col: str = "text") -> DataFrame:
    """Streaming exact dedup — the incremental twin of
    textops.basic.exact_dedup_groups: keep the first arrival per
    content hash, drop later duplicates. State is bounded by the
    watermark (dropDuplicatesWithinWatermark evicts hashes once the
    event-time horizon passes), so it runs forever at crawl scale —
    the content hash is computed JVM-side (sha2), no Python."""
    return (pages
            .withColumn("content_hash", F.sha2(F.col(text_col), 256))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["content_hash"]))


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


def streaming_tile_counts(prepared: DataFrame, zoom: int = 6,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Streaming raster↔vector rollup: per-window z/x/y tile page
    counts over the live ingest — the whole chain (Column geocode →
    tile explode → windowed agg) is the SAME code as batch, which is
    the point: the engine's operators are streaming-safe because the
    hot path is pure Column math."""
    from .geo.tiles import explode_tiles

    tiles = explode_tiles(
        prepared.select("url", "warc_ts", "xmin", "ymin", "xmax", "ymax"),
        zoom)
    return (tiles
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("w"),
                     "tile_x", "tile_y")
            .agg(F.count("*").alias("n_pages"))
            .select(F.col("w.start").alias("window_start"),
                    "tile_x", "tile_y", "n_pages"))


NEARDUP_OUT_SCHEMA = "doc_id string, dup_of string, hamming int"
NEARDUP_STATE_SCHEMA = "ids array<string>, sigs array<long>, last_us long"


def near_dup_stream(pages: DataFrame, watermark: str = "2 hours",
                    ts_col: str = "warc_ts", id_col: str = "url",
                    text_col: str = "text", max_distance: int = 3,
                    max_bucket: int = 1024) -> DataFrame:
    """Streaming NEAR-dup detection — the incremental twin of
    textops.simhash.near_dup_pairs_simhash: flag every arriving doc
    whose simhash is within `max_distance` Hamming bits of an
    earlier-seen doc.

    Shape: the simhash rides the same Arrow mapInPandas kernel as
    batch; each doc then lands in its four 16-bit chunk buckets
    (Manku-style pigeonhole — exact for Hamming ≤ 3), and a custom
    stateful operator (applyInPandasWithState) holds per-bucket
    capped (id, sig) rosters. State is bounded two ways: `max_bucket`
    entries per bucket, and event-time timeout eviction once the
    watermark passes a bucket's last arrival — so it runs forever at
    crawl scale. A doc matching in several buckets is reported once
    per matching bucket (≤4 rows); sinks dedup on doc_id.

    Output rows: (doc_id, dup_of, hamming) for detected near-dups
    only — unique docs produce no output (flag-stream semantics).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)


    # event-time horizon for state eviction, in µs
    num, unit = watermark.split()
    horizon_us = int(num) * {
        "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    }[unit] * 1_000_000

    # batch twin's with_simhash projects id+text only; this variant
    # carries ts through the same Arrow pass (one pass, no re-join)
    def sig_gen(batches):
        import numpy as np

        from .textops.simhash import simhash_batch
        for pdf in batches:
            s = simhash_batch(pdf[text_col]).astype(np.int64)
            yield pd.DataFrame({"doc_id": pdf[id_col],
                                ts_col: pdf[ts_col], "simhash": s})

    # watermark AFTER the Arrow pass: mapInPandas produces new output
    # attributes, so an upstream watermark column does not survive it
    sig = (pages
           .select(id_col, ts_col, text_col)
           .mapInPandas(sig_gen,
                        schema=f"doc_id string, {ts_col} timestamp, "
                               f"simhash long")
           .withWatermark(ts_col, watermark))
    chunked = sig.select(
        "doc_id", ts_col, "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("chunk"),
                     F.shiftrightunsigned("simhash", 16 * i)
                     .bitwiseAND(F.lit(0xFFFF)).alias("val"))
            for i in range(4)])).alias("ck"))

    mask = (1 << 64) - 1

    def fn(key, pdfs, state: GroupState):
        found = []
        if state.hasTimedOut:
            state.remove()
        else:
            parts = [p for p in pdfs if len(p)]
            if parts:
                df = pd.concat(parts).sort_values(ts_col)
                if state.exists:
                    ids, sigs, last = state.get
                    ids, sigs = list(ids), list(sigs)
                else:
                    ids, sigs, last = [], [], 0
                for did, sg, ts in zip(df["doc_id"], df["simhash"],
                                       df[ts_col]):
                    sg = int(sg)
                    best = None
                    for hid, hsig in zip(ids, sigs):
                        d = ((sg ^ int(hsig)) & mask).bit_count()
                        if d <= max_distance and (best is None
                                                  or d < best[1]):
                            best = (hid, d)
                    if best is not None:
                        found.append((did, best[0], best[1]))
                    if len(ids) < max_bucket:
                        ids.append(did)
                        sigs.append(sg)
                    last = max(last, int(ts.value) // 1000)
                state.update((ids, sigs, last))
                # last is epoch-µs; GroupState timeouts are epoch-ms
                state.setTimeoutTimestamp((last + horizon_us) // 1000)
        yield pd.DataFrame(found,
                           columns=["doc_id", "dup_of", "hamming"])

    return (chunked
            .groupBy("ck")
            .applyInPandasWithState(
                fn, NEARDUP_OUT_SCHEMA, NEARDUP_STATE_SCHEMA,
                "append", GroupStateTimeout.EventTimeTimeout))
