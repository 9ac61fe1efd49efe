"""Event-stream batch operators: sessionization + windowed rollups
(training-data pipeline adjuncts; exercised on the driver `events`
table with exact DuckDB oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, key_col: str,
              ts_col: str, right_cols: list[str],
              suffix: str = "_asof") -> DataFrame:
    """LEFT AS-OF JOIN: for each left row, attach the right row with
    the greatest right.ts ≤ left.ts within the same key (the operator
    Spark lacks natively; DuckDB spells it ASOF JOIN).

    Physical shape: tag both sides, UNION, one per-key sorted window,
    carry the last right row forward as a SINGLE struct
    (``last(struct, ignorenulls=True)``), keep left rows. ONE shuffle
    on the key, rows processed once — no per-key range explosion, no
    UDF; the shape that survives 10^12 events. On a timestamp tie the
    right row sorts first, so equal timestamps match (≤ semantics,
    matching DuckDB's ASOF).

    The struct carry is load-bearing for correctness: carrying each
    right column independently with last(col, ignorenulls=True) would
    backfill a NULL value in the as-of row from an OLDER right row,
    mixing columns of different rows. The struct is non-null whenever
    a right row exists, so all attached values always come from the
    one true as-of row — NULLs included.

    Unmatched left rows keep NULL right columns (left-join contract).
    """
    rrow = F.struct(
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(ts_col).alias(f"{ts_col}{suffix}"))
    r = right.select(F.col(key_col), F.col(ts_col),
                     rrow.alias("_rrow")).withColumn("_side", F.lit(0))
    lcols = left.columns
    l = (left
         .withColumn("_rrow",
                     F.lit(None).cast(r.schema["_rrow"].dataType))
         .withColumn("_side", F.lit(1)))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (Window.partitionBy(key_col)
         .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    u = u.withColumn("_rrow", F.last("_rrow", ignorenulls=True).over(w))
    out_cols = [f"{c}{suffix}" for c in right_cols + [ts_col]]
    return u.where(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_rrow.{c}").alias(c) for c in out_cols])


def range_join(left: DataFrame, right: DataFrame, key_col: str,
               ts_col: str, delta_seconds: float,
               right_cols: list[str], suffix: str = "_r") -> DataFrame:
    """Temporal RANGE join: every (left, right) pair with the same key
    and |left.ts − right.ts| ≤ Δ (inclusive both ends).

    The naive theta-join is quadratic per key; this is the 1-D twin of
    the engine's cell-indexed spatial join: the RIGHT side lands in
    exactly ONE Δ-wide time bucket, the LEFT side explodes to its ≤3
    candidate buckets, the join is equi on (key, bucket) and a pure
    Column residual keeps the exact band. Right-side single-bucket
    assignment makes every qualifying pair appear exactly once — no
    dedup shuffle."""
    us = int(delta_seconds * 1_000_000)
    lt = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    bucket = F.floor(lt / F.lit(us))
    r = right.select(
        F.col(key_col), bucket.alias("_b"),
        lt.alias("_rt"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(ts_col).alias(f"{ts_col}{suffix}"))
    l = left.withColumn("_lt", lt).withColumn(
        "_b", F.explode(F.sequence(bucket - 1, bucket + 1)))
    out = (l.join(r, [key_col, "_b"])
           .where(F.abs(F.col("_lt") - F.col("_rt")) <= us))
    keep = [c for c in left.columns] + \
        [f"{c}{suffix}" for c in right_cols + [ts_col]]
    return out.select(*keep)


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event of the same user exceeds `gap_minutes`.

    Classic two-window formulation (lag → boundary flag → running sum)
    — all JVM-side; the only shuffle is the per-user repartition the
    window requires, shared by both window functions.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    # microsecond-exact gap math: casting to whole epoch seconds would
    # truncate sub-second timestamps and flip boundaries right at the
    # threshold (a 1800.4 s gap must break the session; truncated it
    # reads 1800 and doesn't). Session TZ is pinned UTC so the ltz
    # interpretation of TIMESTAMP_NTZ input is well-defined.
    micros = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    gap = micros - F.lag(micros).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000),
                    1).otherwise(0)
    df = events.withColumn("_new", is_new)
    df = df.withColumn("session_id", F.sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    return (df.groupBy(user_col, "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.date_format(F.min(ts_col),
                               "yyyy-MM-dd HH:mm:ss").alias("t_start"),
                 F.date_format(F.max(ts_col),
                               "yyyy-MM-dd HH:mm:ss").alias("t_end"),
                 # exact decimal sum, emitted as a fixed-scale string so the
                 # output representation is engine-independent (Spark widens
                 # decimal sums to (28,6), DuckDB to (38,6); hashing the
                 # decimal repr differs — the string "x.xxxxxx" does not)
                 F.sum(F.col("value").cast("decimal(18,6)"))
                 .cast("decimal(18,6)").cast("string").alias("sum_value")))
