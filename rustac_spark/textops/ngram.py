"""Exact character n-gram Jaccard similarity join — pure Column ops.

Unlike MinHash (probabilistic, textops/minhash.py), this computes
EXACT Jaccard over distinct char n-grams via the inverted-index join
pattern, entirely JVM-side:

    shingle-explode → (document-frequency cap) → self-equi-join on
    shingle → distinct candidate pairs → exact Jaccard from the two
    docs' full shingle arrays (array_intersect — still pure Column)

Scale posture: the self-join shuffles on shingle — a textbook
hash-partitioned join whose skew (stop-shingles shared by everyone)
is bounded by dropping shingles above a document-frequency cap from
CANDIDATE GENERATION ONLY, the standard prefix-filtering trick. The
Jaccard of every emitted pair is computed from the uncapped shingle
sets, so reported similarities are exact; the only approximation is
that a pair sharing exclusively >max_df stop-shingles is never
surfaced (at a real threshold such pairs are template noise). One
viral 3-gram otherwise yields a quadratic join bucket — at 10^12 docs
the cap is the difference between a shuffle and an outage; pass
``max_df=None`` to force the fully exhaustive join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_MAX_DF = 10_000


def shingle_col(text, n: int = 3):
    """Distinct char n-grams of a text column — pure Column
    (sequence + transform + substr; stays in codegen)."""
    return F.array_distinct(F.expr(
        f"transform(sequence(1, greatest(1, length({text}) - {n - 1})), "
        f"i -> substr({text}, i, {n}))"))


def jaccard_pairs(df: DataFrame, threshold: float = 0.8,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3,
                  max_df: int | None = DEFAULT_MAX_DF) -> DataFrame:
    """→ (a, b, jaccard) with a < b and jaccard ≥ threshold.

    Jaccard values are exact (computed from full shingle sets);
    max_df bounds only which pairs become candidates (see module
    docstring). The input text is scanned once into the compact
    (id, shingles) table that serves both the index and the verify.
    """
    docs = df.select(F.col(id_col).alias("_id"),
                     shingle_col(text_col, n).alias("_shs"))
    sh = docs.select("_id", F.explode("_shs").alias("sh"))
    if max_df is not None:
        freq = sh.groupBy("sh").agg(F.count("*").alias("_df"))
        sh = sh.join(freq.where(F.col("_df") <= max_df), "sh")
    a = sh.select(F.col("_id").alias("a"), "sh")
    b = sh.select(F.col("_id").alias("b"), "sh")
    cands = (a.join(b, "sh").where(F.col("a") < F.col("b"))
             .select("a", "b").distinct())
    sa = docs.select(F.col("_id").alias("a"), F.col("_shs").alias("_sha"))
    sb = docs.select(F.col("_id").alias("b"), F.col("_shs").alias("_shb"))
    inter = F.size(F.array_intersect("_sha", "_shb"))
    union = F.size("_sha") + F.size("_shb") - inter
    return (cands.join(sa, "a").join(sb, "b")
            .withColumn("jaccard", F.round(
                F.when(union > 0, inter / union).otherwise(F.lit(0.0)), 6))
            .where(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard"))
