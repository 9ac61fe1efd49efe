"""Connected-components cluster formation (textops/cluster):
multi-hop propagation, determinism, DuckDB recursive-CTE agreement."""

import duckdb
import pandas as pd

from rustac_spark.textops.cluster import (
    connected_components, dedup_cluster_assignments,
)


def _cc(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "a long, b long")
    return {(r["doc_id"], r["cluster_id"])
            for r in connected_components(df, **kw).collect()}


def test_chain_needs_multi_hop(spark):
    # 1-2-3-4-5 chain: labels must propagate 4 hops
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {(i, 1) for i in range(1, 6)}


def test_two_components_and_unsorted_input(spark):
    got = _cc(spark, [(9, 7), (7, 8), (2, 1), (20, 21)])
    assert got == {(7, 7), (8, 7), (9, 7),
                   (1, 1), (2, 1), (20, 20), (21, 20)}


def test_partitioning_invariance(spark):
    pairs = [(i, i + 1) for i in range(0, 40, 2)] + [(1, 3), (10, 30)]
    a = _cc(spark, pairs)
    df = spark.createDataFrame(pairs, "a long, b long").repartition(7)
    b = {(r["doc_id"], r["cluster_id"])
         for r in connected_components(df).collect()}
    assert a == b


def test_agrees_with_duckdb_recursive_closure(spark):
    pairs = [(1, 2), (2, 3), (5, 6), (8, 3), (10, 11), (11, 5)]
    got = _cc(spark, pairs)
    pdf = pd.DataFrame(pairs, columns=["a", "b"])
    con = duckdb.connect()
    con.register("p", pdf)
    exp = set(map(tuple, con.execute("""
        WITH RECURSIVE
        e AS (SELECT a u, b v FROM p UNION SELECT b, a FROM p),
        walk(u, v) AS (
          SELECT u, v FROM e
          UNION
          SELECT w.u, e2.v FROM walk w JOIN e e2 ON w.v = e2.u)
        SELECT u, least(u, min(v)) FROM walk GROUP BY u
    """).fetchall()))
    assert got == exp


def test_dedup_cluster_assignments_end_to_end(spark):
    docs = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "abcdefgh"), (3, "abcdefgi"),
         (4, "zzzzzzzz"), (5, "qqqqqqqq")],
        "doc_id long, text string")
    got = {(r["doc_id"], r["cluster_id"])
           for r in dedup_cluster_assignments(docs,
                                              threshold=0.5).collect()}
    # 1≡2 exactly; 3 near-dups with both; 4 and 5 are singletons
    assert got == {(1, 1), (2, 1), (3, 1)}
    # keep-rule: one survivor per component
    survivors = {d for d, c in got if d == c}
    assert survivors == {1}


def test_dedup_retain_keeps_representatives_and_singletons(spark):
    from rustac_spark.textops.cluster import dedup_retain

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(6)], ["doc_id", "text"])
    # components: {0,2,4} (min 0), {1,3} (min 1); 5 is a singleton
    clusters = spark.createDataFrame(
        [(0, 0), (2, 0), (4, 0), (1, 1), (3, 1)],
        ["doc_id", "cluster_id"])
    kept = sorted(r["doc_id"]
                  for r in dedup_retain(docs, clusters).collect())
    assert kept == [0, 1, 5]


def test_dedup_cluster_assignments_default_caps_viral_shingles(spark):
    """The production default prunes shingles whose document
    frequency exceeds max_df from CANDIDATE GENERATION (prefix
    filtering) — without the cap one viral shingle makes the
    inverted-index self-join quadratic at corpus scale. Docs sharing
    ONLY a >max_df shingle must produce no pairs under the default,
    while max_df=None (the gate-oracle mode) still surfaces them."""
    # 4 docs, all pairwise identical text → every shingle has df=4
    docs = spark.createDataFrame(
        [(i, "abcdefgh") for i in range(1, 5)],
        "doc_id long, text string")
    capped = dedup_cluster_assignments(docs, threshold=0.5, max_df=3)
    assert capped.count() == 0
    exhaustive = {(r["doc_id"], r["cluster_id"])
                  for r in dedup_cluster_assignments(
                      docs, threshold=0.5, max_df=None).collect()}
    assert exhaustive == {(i, 1) for i in range(1, 5)}
    # the no-argument default is the CAPPED mode (DEFAULT_MAX_DF),
    # not the exhaustive join
    import inspect

    from rustac_spark.textops.cluster import dedup_cluster_assignments as f
    assert inspect.signature(f).parameters["max_df"].default is ...


def test_connected_components_long_chain(spark):
    """A 2000-node path graph (diameter 1999) must converge via
    pointer jumping — plain min-propagation would need 1999 rounds
    and silently mislabel under max_iter=25."""
    from rustac_spark.textops.cluster import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1999)], ["a", "b"])
    out = connected_components(pairs).collect()
    assert len(out) == 2000
    assert {r["cluster_id"] for r in out} == {0}
