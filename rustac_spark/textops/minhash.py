"""MinHash + LSH near-duplicate detection (north-rule training-data
operator; no reference counterpart).

Pipeline (the standard shingle → minhash → band → bucket-join shape):

1. signatures: char n-gram shingles → crc32 base hash → k permutation
   minima via (a·h + b) mod p, vectorized numpy inside mapInPandas
   (one Arrow batch = many docs; no per-row Python calls to hashlib);
2. banding: k=64 sig split into b bands × r rows; band key =
   xxhash64(band bytes) — Spark-side Column ops on the sig array;
3. candidates: self-equi-join on (band, key) with id< id to halve;
   at scale this is a hash-partitioned shuffle join on band keys —
   bucket skew (a viral shingle) is bounded because identical texts
   were already removed by exact dedup upstream;
4. verify: exact Jaccard over the shingle sets of candidate pairs
   (precision = 1 by construction; recall governed by (b, r)).

Determinism: crc32 + fixed (a, b) tables derived from sha256 of the
permutation index — stable across processes and partitionings.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..hashing import stable_hash

MERSENNE_P = (1 << 61) - 1


def _perm_tables(k: int) -> tuple[np.ndarray, np.ndarray]:
    # base hashes are crc32 (< 2^32); with a < 2^29 and b < 2^61-1 the
    # product a·h + b stays < 2^63, so (a·h + b) mod p is exact in
    # plain uint64 numpy — fully vectorized, no bignum loop.
    a = np.array([stable_hash(f"minhash:a:{i}") % ((1 << 29) - 1) + 1
                  for i in range(k)], dtype=np.uint64)
    b = np.array([stable_hash(f"minhash:b:{i}") % MERSENNE_P
                  for i in range(k)], dtype=np.uint64)
    return a, b


def shingles(text: str, n: int = 3) -> set[int]:
    t = " ".join(text.lower().split())
    if len(t) < n:
        return {zlib.crc32(t.encode("utf-8"))} if t else set()
    return {zlib.crc32(t[i:i + n].encode("utf-8")) for i in range(len(t) - n + 1)}


def minhash_signature(text: str, k: int = 64, n: int = 3,
                      _tables={}) -> np.ndarray:
    if k not in _tables:
        _tables[k] = _perm_tables(k)
    a, b = _tables[k]
    sh = shingles(text, n)
    if not sh:
        return np.full(k, MERSENNE_P, dtype=np.uint64)
    h = np.fromiter(sh, dtype=np.uint64, count=len(sh))
    m = (a[:, None] * h[None, :] + b[:, None]) % MERSENNE_P  # (k, |sh|)
    return m.min(axis=1)


def with_signatures(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 64,
                    n: int = 3) -> DataFrame:
    out_schema = f"{id_col} long, sig array<long>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = [minhash_signature(t or "", k, n).astype(np.int64).tolist()
                    for t in pdf[text_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "sig": sigs})

    return df.select(id_col, text_col).mapInPandas(gen, schema=out_schema)


def candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                    bands: int = 16, rows: int = 4) -> DataFrame:
    """LSH banding → distinct candidate (a, b) id pairs (a < b)."""
    banded = sigs.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.xxhash64(F.slice("sig", i * rows + 1, rows))
                     .alias("key"))
            for i in range(bands)])).alias("bk"))
    l = banded.select(F.col(id_col).alias("a"), "bk")
    r = banded.select(F.col(id_col).alias("b"), "bk")
    return (l.join(r, "bk").where(F.col("a") < F.col("b"))
            .select("a", "b").distinct())


def near_dup_pairs(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", threshold: float = 0.8,
                   k: int = 64, bands: int = 16, rows: int = 4,
                   n: int = 3) -> DataFrame:
    """Full pipeline → (a, b, jaccard) verified pairs ≥ threshold."""
    sigs = with_signatures(df, text_col, id_col, k, n)
    cands = candidate_pairs(sigs, id_col, bands, rows)
    texts = df.select(F.col(id_col), F.col(text_col))
    joined = (cands
              .join(texts.withColumnRenamed(id_col, "a")
                    .withColumnRenamed(text_col, "text_a"), "a")
              .join(texts.withColumnRenamed(id_col, "b")
                    .withColumnRenamed(text_col, "text_b"), "b"))

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            jac = []
            for ta, tb in zip(pdf["text_a"], pdf["text_b"]):
                sa, sb = shingles(ta or "", n), shingles(tb or "", n)
                u = len(sa | sb)
                jac.append(len(sa & sb) / u if u else 0.0)
            out = pdf[["a", "b"]].copy()
            out["jaccard"] = np.round(jac, 6)
            yield out[out["jaccard"] >= threshold]

    return joined.mapInPandas(verify, schema="a long, b long, jaccard double")
