"""SimHash near-duplicate fingerprinting (north-rule training-data
operator).

64-bit simhash over whitespace tokens (crc32-seeded per-token 64-bit
hash via two crc32 halves), vectorized per Arrow batch. Candidate
generation uses the pigeonhole block trick: split the 64-bit print
into 4×16-bit chunks — any pair within Hamming distance ≤3 shares at
least one exact chunk, so a 4-way chunk-equi-join finds all such pairs
without an O(n²) comparison. The final Hamming check runs on the
(small) candidate set.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _token_hash64(tok: str) -> int:
    b = tok.encode("utf-8")
    return (zlib.crc32(b) << 32) | zlib.crc32(b, 0x9E3779B9)


def simhash64(text: str) -> int:
    toks = text.lower().split()
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = _token_hash64(t)
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def with_simhash(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # int64 reinterpret (Spark LongType) — bit pattern preserved
            sh = [np.int64(np.uint64(simhash64(t or ""))) for t in pdf[text_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": sh})

    return df.select(id_col, text_col).mapInPandas(
        gen, schema=f"{id_col} long, simhash long")


def hamming(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def near_dup_pairs_simhash(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           max_distance: int = 3) -> DataFrame:
    """→ (a, b, hamming_dist) pairs with distance ≤ max_distance.
    Requires max_distance ≤ 3 for the 4-chunk pigeonhole to be exact."""
    assert max_distance <= 3
    sh = with_simhash(df, text_col, id_col)
    chunked = sh.select(
        F.col(id_col), F.col("simhash"),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("chunk"),
                     F.shiftrightunsigned("simhash", 16 * i)
                     .bitwiseAND(F.lit(0xFFFF)).alias("val"))
            for i in range(4)])).alias("ck"))
    l = chunked.select(F.col(id_col).alias("a"),
                       F.col("simhash").alias("sim_a"), "ck")
    r = chunked.select(F.col(id_col).alias("b"),
                       F.col("simhash").alias("sim_b"), "ck")
    return (l.join(r, "ck").where(F.col("a") < F.col("b"))
            .select("a", "b",
                    hamming(F.col("sim_a"), F.col("sim_b")).alias("dist"))
            .where(F.col("dist") <= max_distance)
            .distinct())
