"""TF-IDF top-terms per document — distributed term scoring for
webtext corpora (north-rule training-data-pipeline operator; no
reference counterpart in rustac).

Shape at 100 TB: one shuffle to (doc, term) counts with map-side
partial aggregation, one narrow re-aggregation to the document-
frequency table (grouped on term, so it reuses the term partitioning
where AQE allows), a join back on term (AQE picks broadcast when the
vocabulary fits, sort-merge otherwise — vocabularies follow Zipf so
the DF table is tiny relative to the corpus), and one per-document
window for the top-k cut. The corpus text itself is scanned exactly
once. N_docs rides in via a broadcast 1×1 aggregate, never a driver
collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from rustac_spark.textops.basic import tokens


def top_terms(df: DataFrame, k: int = 3, text_col: str = "text",
              id_col: str = "doc_id", persist: bool = True) -> DataFrame:
    """Top-k terms per document by tf·idf (idf = ln(N/df)), ties
    broken by term ascending. Returns (id, term, score, rk).

    ``persist`` pins the (doc, term, tf) table so the corpus text is
    tokenized ONCE: without it, column pruning specializes the tf and
    df branches into two different scans and Spark re-reads + re-
    explodes the full text for each (ReusedExchange never fires) —
    a double full-corpus pass at 100 TB. Locked by a plan-shape test."""
    toks = (df.select(id_col,
                      F.explode(tokens(F.col(text_col))).alias("term")))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    if persist:
        tf = tf.persist()
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    scored = (tf.join(dfreq, "term")
              .join(F.broadcast(n_docs))
              .withColumn("score",
                          F.col("tf") * F.log(F.col("n_docs")
                                              / F.col("df"))))
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select(id_col, "term",
                    F.round("score", 6).alias("score"), "rk"))
