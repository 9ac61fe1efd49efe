"""Near-dup CLUSTER formation: connected components over a pair graph.

Every dedup family in this engine (exact hash groups, MinHash/SimHash
banding, n-gram Jaccard, embedding cosine) emits PAIRS; a training-data
pipeline then needs the transitive closure — "keep one doc per
component" — which is a distributed connected-components problem, not
a groupBy. The reference has no such operator (single-node DuckDB);
this is a north-rule first-class addition like the pair generators.

Algorithm: iterative min-label propagation.

    label(u) ← min(label(u), min_{(u,v)∈E} label(v))

repeated to convergence — each round is one shuffle join + one
map-side-combined min-aggregation, both JVM-side. Rounds needed =
graph diameter; near-dup components are dense (banding emits
near-cliques), so diameter is tiny in practice — the classic
large-star/small-star contraction (Kiveris et al., "Connected
Components in MapReduce and Beyond") is the drop-in upgrade if a
pathological chain-shaped graph ever matters. Each round ends with an
eager `localCheckpoint`, which BOTH materializes the label table and
truncates its lineage — persist() alone caches data but leaves the
logical plan growing (the pointer-jump self-join doubles it per
round, overflowing Spark's 2 GiB plan-string cap at depth ~11 on
chain graphs); checkpointing keeps the per-round plan O(1). On a real
cluster swap `localCheckpoint` for `checkpoint` (HDFS-backed) so a
lost executor does not lose label blocks.

Convergence is detected with a cheap `changed == 0` probe (LIMIT 1
semantics via count on the persisted diff), driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(pairs: DataFrame, a_col: str = "a",
                         b_col: str = "b", max_iter: int = 25,
                         ) -> DataFrame:
    """(a, b) undirected pair rows → (doc_id, cluster_id), where
    cluster_id is the component's minimum doc id (deterministic,
    order-independent). Only ids that appear in ≥1 pair are emitted —
    singletons are their own trivial cluster and never shuffle."""
    e = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    edges = (e.union(e.select(F.col("v").alias("u"),
                              F.col("u").alias("v"))).distinct()
             .localCheckpoint(eager=True))
    labels = (edges.select("u").distinct()
              .withColumn("label", F.col("u"))
              .localCheckpoint(eager=True))

    converged = False
    for _ in range(max_iter):
        nbr_min = (edges
                   .join(labels.select(F.col("u").alias("v"),
                                       F.col("label").alias("vlabel")),
                         "v")
                   .groupBy("u")
                   .agg(F.min("vlabel").alias("nbr")))
        stepped = (labels.join(nbr_min, "u", "left")
                   .select("u", F.least("label", "nbr").alias("label")))
        # pointer jumping (path doubling): label(u) ← label(label(u)).
        # Plain neighbor-min needs diameter-many rounds — a 10^4-node
        # chain would exhaust max_iter and SILENTLY return wrong
        # labels; with the jump the round count is O(log diameter).
        # The eager localCheckpoint below is load-bearing: the
        # self-join nests `stepped`'s plan twice, so without lineage
        # truncation the plan doubles per round and overflows the
        # 2 GiB plan-string limit at depth ~11 (chain-shaped graphs).
        new_labels = (stepped.join(
            stepped.select(F.col("u").alias("label"),
                           F.col("label").alias("ll")),
            "label", "left")
            .select("u", F.least("label", "ll").alias("label"))
            .localCheckpoint(eager=True))
        changed = (new_labels.join(
            labels.select("u", F.col("label").alias("old")), "u")
            .where(F.col("label") != F.col("old")).count())
        # rebinding drops the only reference to the previous round's
        # checkpointed table; its blocks are reclaimed by Spark's
        # ContextCleaner once the Python/JVM refs collect. Worst-case
        # live generations are bounded by max_iter (labels are
        # non-singleton nodes only — small relative to the corpus);
        # swap in reliable checkpoint() on a cluster for both fault
        # tolerance and eager cleanup of old checkpoint dirs.
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"pointer-jumping rounds — raise max_iter (graph diameter "
            f"> 2^{max_iter})")
    return labels.select(F.col("u").alias("doc_id"),
                         F.col("label").alias("cluster_id"))


def dedup_cluster_assignments(docs: DataFrame, threshold: float = 0.3,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              max_df: int | None = ...) -> DataFrame:
    """End-to-end near-dup clustering on exact n-gram Jaccard pairs:
    (doc_id, cluster_id) for every doc in a non-trivial component.
    The canonical keep-rule is `doc_id == cluster_id` (keep the
    component minimum); callers drop the rest.

    ``max_df`` defaults to ngram.DEFAULT_MAX_DF: candidate generation
    prunes shingles shared by more than max_df docs (prefix
    filtering) — at 10^12 docs one viral shingle otherwise makes the
    inverted-index self-join a quadratic bucket (the ngram module
    docstring calls the cap "the difference between a shuffle and an
    outage"). Pass ``max_df=None`` explicitly for the fully
    exhaustive join (the correctness gate does, to match its
    recursive-CTE oracle at test scale)."""
    from .ngram import DEFAULT_MAX_DF, jaccard_pairs
    if max_df is ...:
        max_df = DEFAULT_MAX_DF
    pairs = jaccard_pairs(docs, threshold=threshold, id_col=id_col,
                          text_col=text_col, max_df=max_df)
    return connected_components(pairs)


def dedup_retain(docs: DataFrame, clusters: DataFrame,
                 id_col: str = "doc_id") -> DataFrame:
    """Apply the canonical keep-rule to the corpus: drop every cluster
    member except the component minimum (cluster_id), keep all
    singletons. A plain left_anti join against the non-representative
    member list: no forced broadcast — at web scale near-dup retention
    drops 20-50% of the corpus, so the drop side is billions of ids
    and broadcasting it would OOM every executor. AQE picks broadcast
    automatically when the drop list is in fact small (it usually is
    at test scale); otherwise this is one hash-partitioned anti-join
    on the id, which is the correct 100 TB plan."""
    drop = clusters.where(
        F.col(id_col) != F.col("cluster_id")).select(id_col)
    return docs.join(drop, id_col, "left_anti")
