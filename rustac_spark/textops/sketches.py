"""Distributed cardinality sketch: from-scratch HyperLogLog in pure
Column math (the "novel sketch" class of custom operator — no UDF, no
Python in the hot path, mergeable by construction).

Row → (register, rank) is plain Column arithmetic on xxhash64:
14 low bits pick one of m=2^14 registers, the rank is the position of
the first set bit of the remaining 50 bits (via floor(log2) — doubles
hold 50-bit ints exactly). The aggregation is a map-side-combinable
``groupBy(register).agg(max(rank))`` — at 10^12 rows the shuffle
carries at most m·partitions tiny rows — followed by a 1-row final
aggregate computing the Flajolet et al. estimator with the standard
small-range correction. Register tables from disjoint data slices
merge with elementwise max, so sketches can be stored per partition /
per day and combined later (the property that makes HLL a TABLE
sketch, not just a query).

Standard error ≈ 1.04/sqrt(m) = 0.81% at m=2^14.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

P = 14                 # register-index bits
M = 1 << P             # 16384 registers
_ALPHA = 0.7213 / (1.0 + 1.079 / M)   # bias constant for m ≥ 128
_REM_BITS = 64 - P


def _register(h: Column) -> Column:
    return F.pmod(h, F.lit(M)).cast("int")


def _rank(h: Column) -> Column:
    """Leading-zero rank of the top 50 bits of the hash (+1)."""
    w = F.shiftrightunsigned(h, P)
    # w in [0, 2^50): rank = 50 - floor(log2(w)); all-zero ⇒ max rank
    return F.when(w == 0, F.lit(_REM_BITS + 1)) \
        .otherwise(F.lit(_REM_BITS) - F.floor(F.log2(w))) \
        .cast("int")


def hll_registers(df: DataFrame, col: str) -> DataFrame:
    """→ (register int, max_rank int): the sketch state, one row per
    populated register (≤ m rows), mergeable with elementwise max."""
    h = F.xxhash64(F.col(col))
    return (df.select(_register(h).alias("register"),
                      _rank(h).alias("rank"))
            .groupBy("register")
            .agg(F.max("rank").alias("max_rank")))


def merge_registers(*sketches: DataFrame) -> DataFrame:
    """Combine sketch states from disjoint data slices (union + max —
    exactly how per-day sketches roll up to a month)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("register").agg(
        F.max("max_rank").alias("max_rank"))


def hll_estimate(registers: DataFrame) -> float:
    """Registers → cardinality estimate (Flajolet et al. 2007, with
    the linear-counting small-range correction)."""
    row = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("s"),
        F.count("*").alias("present")).collect()[0]
    s = float(row["s"] or 0.0)
    present = int(row["present"])
    zeros = M - present
    s += float(zeros)  # empty registers contribute 2^-0
    raw = _ALPHA * M * M / s
    if raw <= 2.5 * M and zeros > 0:
        import math
        return M * math.log(M / zeros)
    return raw


def approx_distinct(df: DataFrame, col: str) -> float:
    """One-call estimate: ``hll_estimate(hll_registers(df, col))``."""
    return hll_estimate(hll_registers(df, col))


# --------------------------------------------------- Count-Min sketch

CMS_DEPTH = 4          # independent hash rows
CMS_WIDTH = 1 << 12    # 4096 buckets/row ⇒ ε = e/w ≈ 0.07% of N

def cms_table(df: DataFrame, col: str, depth: int = CMS_DEPTH,
              width: int = CMS_WIDTH) -> DataFrame:
    """Count-Min sketch state → (row int, bucket int, cnt long),
    ≤ depth·width rows. One narrow depth× explode, then a map-side-
    combinable count — the only shuffle carries the bounded table.
    Two states merge by summing cnt per (row, bucket); estimates are
    biased high by at most e·N/width with prob ≥ 1-e^-depth."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    e = df.select(F.col(col).alias("_v"), rows)
    bucket = F.pmod(F.xxhash64("_v", "row"), F.lit(width)).cast("int")
    return (e.select("row", bucket.alias("bucket"))
            .groupBy("row", "bucket")
            .agg(F.count("*").alias("cnt")))


def cms_merge(*tables: DataFrame) -> DataFrame:
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_lookup(table: DataFrame, items: DataFrame, col: str,
               depth: int = CMS_DEPTH, width: int = CMS_WIDTH,
               ) -> DataFrame:
    """Frequency estimates for an items column → (item, est_count):
    min over the depth counters — a broadcast of the (small) sketch
    against the (small) item list; never touches the raw data."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    probes = items.select(F.col(col).alias("item"), rows).withColumn(
        "bucket", F.pmod(F.xxhash64("item", "row"),
                         F.lit(width)).cast("int"))
    return (probes.join(F.broadcast(table), ["row", "bucket"], "left")
            .groupBy("item")
            .agg(F.min(F.coalesce("cnt", F.lit(0)))
                 .alias("est_count")))


def heavy_hitters(df: DataFrame, col: str, min_share: float = 0.001,
                  depth: int = CMS_DEPTH, width: int = CMS_WIDTH,
                  ) -> DataFrame:
    """Items whose estimated frequency ≥ min_share of all rows —
    the 100 TB hot-domain detector. Candidates come from one bounded
    sample-free pass: any true heavy hitter's bucket count in EVERY
    row is ≥ its frequency, so distinct values landing only in light
    buckets are pruned by the sketch itself; the final estimate runs
    through cms_lookup on the surviving candidates."""
    n = df.count()
    thresh = max(1, int(n * min_share))
    table = cms_table(df, col, depth, width).persist()
    # candidate pruning: keep values whose row-0 bucket is heavy
    heavy0 = table.where((F.col("row") == 0)
                         & (F.col("cnt") >= thresh)) \
        .select("bucket")
    cands = (df.select(F.col(col).alias("item"))
             .withColumn("bucket", F.pmod(
                 F.xxhash64("item", F.lit(0)), F.lit(width)).cast("int"))
             .join(F.broadcast(heavy0), "bucket")
             .select("item").distinct())
    out = cms_lookup(table, cands, "item", depth, width) \
        .where(F.col("est_count") >= thresh)
    return out
