"""Plan-shape regression tests: the physical plans the engine promises
(SURVEY.md §4). These lock in pushdown, broadcast strategy, and
single-scan properties so a future change can't silently regress them."""

from pyspark.sql import functions as F

from rustac_spark.geo.join import spatial_join
from rustac_spark.geo.tiles import explode_tiles
from rustac_spark.stac.search import Search, build_plan


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_cql2_filter_pushed_to_scan(stac_items):
    df = build_plan(stac_items, Search(filter="sat:relative_orbit = 98",
                                       fields="+id"))
    plan = _physical(df)
    assert "PushedFilters" in plan
    assert "sat:relative_orbit" in plan.split("PushedFilters")[1][:200]
    # column pruning: scan reads only the 2 needed columns
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "id" in read and "sat:relative_orbit" in read
    assert "geometry" not in read and "links" not in read


def test_cql2_s_intersects_pushed_to_scan(stac_items):
    # the rect/point s_intersects path is pure Column math on the bbox
    # struct, so the whole spatial predicate reaches the parquet scan
    df = build_plan(stac_items, Search(
        filter="s_intersects(geometry, BBOX(-106.1, 40.5, -106.0, 40.6))",
        fields="+id"))
    plan = _physical(df)
    pushed = plan.split("PushedFilters")[1][:400]
    assert "bbox.xmin" in pushed and "bbox.ymax" in pushed
    assert "mapInPandas" not in plan.lower()  # no refine for rect literals


def test_intersects_multipolygon_rects_stay_column(stac_items):
    # multiple axis-aligned rings → OR of bbox overlaps, still no UDF
    mp = {"type": "MultiPolygon", "coordinates": [
        [[[-106.1, 40.5], [-106.0, 40.5], [-106.0, 40.6],
          [-106.1, 40.6], [-106.1, 40.5]]],
        [[[10, 10], [11, 10], [11, 11], [10, 11], [10, 10]]]]}
    df = build_plan(stac_items, Search(intersects=mp, fields="+id"))
    plan = _physical(df)
    assert "mapInPandas" not in plan.lower()


def test_datetime_filter_pushed_to_scan(stac_items):
    df = build_plan(stac_items,
                    Search(datetime="2024-12-02T00:00:00Z/.."))
    plan = _physical(df)
    assert "PushedFilters" not in plan.split("Scan parquet")[0]
    # coalesce(end, datetime) >= lit can't fully push, but the IsNotNull
    # guard and the scan should still prune columns; main assertion:
    # the filter exists and no shuffle is introduced
    assert "Exchange" not in plan


def test_spatial_join_is_broadcast_and_single_scan(spark, queries_df):
    from rustac_spark import DATA_DIR
    from rustac_spark.geocode import with_geocode
    pages = with_geocode(
        spark.read.parquet(f"{DATA_DIR}/pages_sf0.001.parquet"))
    out = spatial_join(pages, queries_df, page_cols=["url"])
    plan = _physical(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # round-7 default: the polygon residual is the COMPILED predicate
    # (a standalone Filter), so the big (pages) side is scanned
    # exactly once and there is no reject side at all
    assert plan.count("pages_sf0.001.parquet") == 1
    # no shuffle on the pages side: the only Exchanges are broadcasts
    assert "Exchange hashpartitioning" not in plan
    # the explicit memo fallback still lands its reject set as a
    # LocalRelation (collected driver-side at build; over-cap sets
    # ride as an InMemoryRelation whose toString embeds the pre-cache
    # subtree — count scans outside that description)
    memo = spatial_join(pages, queries_df, page_cols=["url"],
                        compile_polygons=False)
    mplan = _physical(memo)
    live = mplan.split("InMemoryRelation")[0]
    assert live.count("pages_sf0.001.parquet") == 1
    assert ("LocalTableScan" in mplan or "Scan ExistingRDD" in mplan
            or "InMemoryTableScan" in mplan)
    assert "Exchange hashpartitioning" not in live


def test_tiles_is_narrow_until_aggregation(spark):
    from rustac_spark import DATA_DIR
    geo = spark.read.parquet(f"{DATA_DIR}/pages_geo_sf0.001.parquet")
    out = (explode_tiles(geo.select("url", "xmin", "ymin",
                                    "xmax", "ymax"), 10)
           .groupBy("tile_x", "tile_y").agg(F.count("*").alias("n")))
    plan = _physical(out)
    # exactly one shuffle (the final aggregation), partial agg before it
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan or "HashAggregate" in plan


def test_empty_shortcircuit_is_plan_time(stac_items):
    df = build_plan(stac_items, Search(filter="nope:col = 1"))
    opt = _optimized(df)
    assert "LocalRelation" in opt or "Filter false" in opt
    assert "Scan" not in opt or "LocalRelation" in opt


def test_polygon_free_join_runs_zero_jobs(spark, queries_df):
    """has_polygons=False keeps plan CONSTRUCTION fully lazy: no
    eager probe action hides in spatial_join (round-2 VERDICT
    Next-round #7). Verified by job-group accounting."""
    from rustac_spark import DATA_DIR
    from rustac_spark.geocode import with_geocode
    sc = spark.sparkContext
    pages = with_geocode(
        spark.read.parquet(f"{DATA_DIR}/pages_sf0.001.parquet"))
    q = queries_df.where(F.col("kind") != "polygon")
    sc.setJobGroup("lazy-probe", "plan construction must run no jobs")
    out = spatial_join(pages, q, page_cols=["url"], has_polygons=False)
    assert sc.statusTracker().getJobIdsForGroup("lazy-probe") == []
    sc.setJobGroup("lazy-probe-act", "first action")
    assert out.count() > 0
    assert sc.statusTracker().getJobIdsForGroup("lazy-probe-act") != []
    sc.setJobGroup(None, None)


def test_sketches_single_shuffle_no_python(spark):
    """HLL/CMS state builds are one map-side-combined shuffle of the
    bounded register/bucket table — zero Python, zero extra passes."""
    from rustac_spark.textops.sketches import cms_table, hll_registers
    df = spark.range(1000).select(F.col("id").cast("string").alias("u"))
    for sketch in (hll_registers(df, "u"), cms_table(df, "u")):
        plan = _physical(sketch)
        assert plan.count("Exchange hashpartitioning") == 1
        assert "HashAggregate" in plan
        assert "Python" not in plan and "mapInPandas" not in plan


def test_hot_cell_membership_is_inset_not_literal_array(spark):
    """O(10^4) hot cells must compile to a single InSet lookup, not a
    10^4-element literal array scanned per row (round-2 VERDICT
    What's-wrong #5 / Next-round #6)."""
    from rustac_spark.geo.cells import DEFAULT_RES, encode_py
    from rustac_spark.pipeline.skew import subdivide_cover

    hot = {encode_py(DEFAULT_RES, x, y)
           for x in range(100) for y in range(100)}
    assert len(hot) == 10_000
    df = spark.range(100).select(
        (F.col("id") * 0.001 - 50).alias("xmin"),
        (F.col("id") * 0.001 - 20).alias("ymin"),
        (F.col("id") * 0.001 - 49.9).alias("xmax"),
        (F.col("id") * 0.001 - 19.9).alias("ymax"),
    ).withColumn("cell", F.lit(0).cast("long"))
    out = subdivide_cover(df, hot, DEFAULT_RES)
    plan = _physical(out)
    assert "array_contains" not in plan
    # the plan stays bounded: the 10^4 values live in one hash set,
    # not enumerated per-row in the expression tree
    assert len(plan) < 50_000, f"plan bloated to {len(plan)} chars"
    out.count()  # and it executes


def test_quality_rules_narrow_single_scan(spark):
    """Gopher + C4 signals are one narrow map: single scan, zero
    exchanges, zero Python nodes."""
    from rustac_spark import DATA_DIR
    from rustac_spark.textops.quality_rules import (
        with_c4_filters, with_quality_rules)
    d = spark.read.parquet(f"{DATA_DIR}/pages_sf0.001.parquet") \
        .selectExpr("url as doc_id", "text")
    plan = _physical(with_c4_filters(with_quality_rules(d)))
    assert plan.count("Scan parquet") == 1
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_tfidf_tokenizes_corpus_once(spark):
    """The (doc, term, tf) table is pinned so the text explode runs
    once; the only other corpus access is the pruned count(*) scan."""
    from rustac_spark import DATA_DIR
    from rustac_spark.textops.tfidf import top_terms
    d = spark.read.parquet(f"{DATA_DIR}/pages_sf0.001.parquet") \
        .selectExpr("url as doc_id", "text")
    plan = _physical(top_terms(d, k=2))
    assert "InMemoryRelation" in plan or \
        plan.count("Scan parquet") <= 2
    # the un-persisted form is the documented double-tokenize trap
    bad = _physical(top_terms(d, k=2, persist=False))
    assert bad.count("Scan parquet") >= 3


def test_dedup_retain_no_forced_broadcast(spark):
    """dedup_retain must NOT hint a broadcast of the drop list: at web
    scale retention drops a large fraction of the corpus, so the drop
    side is not broadcastable. With autoBroadcast disabled (simulating
    a drop side over the threshold) the anti-join must plan as a
    shuffle join, proving no explicit broadcast hint survives."""
    from rustac_spark.textops.cluster import dedup_retain

    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text"))
    clusters = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") - F.col("id") % 2).alias("cluster_id"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _physical(dedup_retain(docs, clusters))
        assert "BroadcastExchange" not in plan
        assert "LeftAnti" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_knn_bounded_redo_scan_pushes_lat_band(spark, tmp_path):
    """A mid-latitude query whose k-th candidate distance exceeds the
    ring's cos(lat)-scaled guarantee re-runs over a bounded lat/lon
    band. The band is a DRIVER literal, so the redo's pages scan must
    show it as PushedFilters (row-group pruning on lat stats at
    100 TB), and the returned plan re-scans pages exactly ONCE (the
    candidate top-k was already collected at plan build). Polar
    probes no longer reach this branch at all — they take lat-band
    candidate cells inside the single candidate join
    (test_spatial.test_knn_cells_polar_band_single_join)."""
    import pandas as pd

    from rustac_spark.geo.knn import LAST_STATS, knn_bruteforce, knn_cells

    # 5 pages ~55.7 km from the probe: inside the 4-ring (0.5 < 0.70
    # deg) so they fill the top-k, but beyond the cos(40.7)-scaled
    # safe radius (~29.6 km) so the query flags a bounded redo
    rows = [(f"n{i}", 40.5, 10.0 + 0.01 * i) for i in range(5)]
    rows += [(f"far{i}", 0.0, -100.0 + i) for i in range(20)]
    pdf = pd.DataFrame(rows, columns=["url", "lat", "lon"])
    path = str(tmp_path / "pages.parquet")
    spark.createDataFrame(pdf).write.parquet(path)
    pages = spark.read.parquet(path)
    q = spark.createDataFrame(
        [(1, 10.0, 40.0)], "query_id long, qxmin double, qymin double")
    out = knn_cells(pages, q, k=5)
    assert LAST_STATS["redo_bounded"] == 1
    assert LAST_STATS.get("redo_underflow", 0) == 0
    plan = _physical(out)
    # the redo branch exists and its parquet scan pushes the band
    fallback = plan.split("Union")[-1]
    assert "PushedFilters" in fallback
    pushed = fallback.split("PushedFilters")[1][:400]
    assert "lat" in pushed
    # exactly ONE pages re-scan in the returned plan (the redo); the
    # accepted branch is a local relation rebuilt from collected rows
    assert plan.count("Scan parquet") == 1
    # correctness: results equal the exact bruteforce
    exact = {(r["query_id"], r["rank"], r["url"])
             for r in knn_bruteforce(pages, q, k=5).collect()}
    got = {(r["query_id"], r["rank"], r["url"]) for r in out.collect()}
    assert got == exact


def test_canonical_url_dedup_no_python_single_shuffle_pair(spark):
    """canonical_url is a pure-Column regexp chain and the keep-min
    dedup is one map-side-combined groupBy + one semi join — zero
    Python anywhere in the plan."""
    from rustac_spark.textops.basic import dedup_by_canonical_url
    df = spark.range(100).select(
        F.concat(F.lit("https://h/p"), F.col("id").cast("string"))
        .alias("url"))
    plan = _physical(dedup_by_canonical_url(df))
    assert "Python" not in plan and "mapInPandas" not in plan
    assert "partial_min" in plan            # map-side-combined min
    assert plan.count("Exchange hashpartitioning") == 1
    assert "LeftSemi" in plan


def test_dup_span_fraction_no_python(spark):
    """Span detection + interval-merge coverage is windows and
    groupBys over hashed 8-byte keys — zero Python."""
    from rustac_spark.textops.ngram import with_dup_span_fraction
    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.lit("a b c d e f g h i j k l").alias("text"))
    plan = _physical(with_dup_span_fraction(df, n=10))
    assert "Python" not in plan and "mapInPandas" not in plan


def test_decontaminate_broadcasts_grams_no_corpus_shuffle(spark):
    """The benchmark gram set broadcasts; the corpus is scanned once
    and never hash-partitioned — only the (small) hit rows aggregate
    by doc id; the contaminated-id set broadcasts back (left_anti)."""
    from rustac_spark.textops.ngram import decontaminate
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), F.col("id").cast("string"),
                 F.lit(" a b c d e f g h i")).alias("text"))
    bench = docs.where(F.col("doc_id") % 10 == 0).select("text")
    plan = _physical(decontaminate(docs, bench, n=8))
    assert "Python" not in plan and "mapInPandas" not in plan
    assert plan.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan
    # the only hash exchange is the hit-row aggregation by doc_id
    assert plan.count("Exchange hashpartitioning") <= 1


def test_semdedup_no_python_capped_pairs(spark):
    """Cluster assignment and pair generation are pure Column; drops
    rejoin left_anti — zero Python, no sort-merge join."""
    from rustac_spark.ml.ann import semdedup
    vec = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") % 7 + i).cast("double")
                  for i in range(8)]).alias("embedding"),
        (F.col("id") % 5).cast("string").alias("label"))
    plan = _physical(semdedup(vec, threshold=0.99, block_col="label"))
    assert "Python" not in plan and "mapInPandas" not in plan
    assert "SortMergeJoin" not in plan


def test_memo_refine_leaves_no_persisted_rdds(spark, queries_df):
    """The reject set is collected driver-side and rebroadcast from a
    LocalRelation, so building (and running) the default polygon join
    must leave NO persisted RDD behind — a long-lived session (the
    HTTP server) would otherwise leak one cached frame per search."""
    from rustac_spark import DATA_DIR
    from rustac_spark.geocode import with_geocode
    spark.catalog.clearCache()
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    pages = with_geocode(
        spark.read.parquet(f"{DATA_DIR}/pages_sf0.001.parquet"))
    out = spatial_join(pages, queries_df, page_cols=["url"])
    assert out.count() > 0
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after == before
