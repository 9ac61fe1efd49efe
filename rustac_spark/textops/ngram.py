"""Exact character n-gram Jaccard similarity join — pure Column ops.

Unlike MinHash (probabilistic, textops/minhash.py), this computes
EXACT Jaccard over distinct char n-grams via the inverted-index join
pattern, entirely JVM-side:

    shingle-explode → self-equi-join on shingle → per-pair
    intersection counts → |A∪B| = |A|+|B|−|A∩B|

Scale posture: the self-join shuffles on shingle — a textbook
hash-partitioned join whose skew (stop-shingles shared by everyone)
is bounded by dropping shingles above a document-frequency cap, the
standard trick from the string-similarity-join literature (prefix
filtering); at 10^12 docs you'd run this only within LSH candidate
buckets, which is exactly what minhash.near_dup_pairs does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def shingle_col(text, n: int = 3):
    """Distinct char n-grams of a text column — pure Column
    (sequence + transform + substr; stays in codegen)."""
    return F.array_distinct(F.expr(
        f"transform(sequence(1, greatest(1, length({text}) - {n - 1})), "
        f"i -> substr({text}, i, {n}))"))


def jaccard_pairs(df: DataFrame, threshold: float = 0.8,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3, max_df: int | None = None) -> DataFrame:
    """→ (a, b, jaccard) with a < b and jaccard ≥ threshold. Exact."""
    sh = df.select(F.col(id_col).alias("_id"),
                   F.explode(shingle_col(text_col, n)).alias("sh"))
    if max_df is not None:
        freq = sh.groupBy("sh").agg(F.count("*").alias("_df"))
        sh = (sh.join(freq.where(F.col("_df") <= max_df), "sh"))
    sizes = sh.groupBy("_id").agg(F.count("*").alias("_n"))
    a = sh.select(F.col("_id").alias("a"), "sh")
    b = sh.select(F.col("_id").alias("b"), "sh")
    inter = (a.join(b, "sh").where(F.col("a") < F.col("b"))
             .groupBy("a", "b").agg(F.count("*").alias("_i")))
    na = sizes.withColumnRenamed("_id", "a").withColumnRenamed("_n", "_na")
    nb = sizes.withColumnRenamed("_id", "b").withColumnRenamed("_n", "_nb")
    return (inter.join(na, "a").join(nb, "b")
            .withColumn("jaccard", F.round(
                F.col("_i") / (F.col("_na") + F.col("_nb") - F.col("_i")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard"))
