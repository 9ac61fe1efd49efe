"""Column-compiled polygon refine (geo/colgeom.py): accept-set
equality vs the numpy kernels (exact closed-set SAT — identical
outside the kernels' 1e-12 on-edge shell, which random + exact-
boundary soups never probe), spatial_join path equivalence, budget
fallback, ear-clip triangulation, and the zero-Python plan shape the
compilation exists for."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rustac_spark import DATA_DIR
from rustac_spark.geo.colgeom import (DEFAULT_VERTEX_BUDGET,
                                      compile_pieces_predicate,
                                      compile_refine_predicate)
from rustac_spark.geo.join import spatial_join
from rustac_spark.geo.predicates import rects_intersect_pieces
from rustac_spark.geocode import with_geocode

RNG = np.random.default_rng(1234)

IRREGULAR = [("poly", [np.array(
    [(0.0, 0.0), (4.0, -1.0), (7.0, 2.0), (6.0, 5.5), (3.0, 7.0),
     (-1.0, 4.0), (-2.0, 1.5), (0.0, 0.0)])])]
WITH_HOLE = [("poly", [
    np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0),
              (0.0, 0.0)]),
    np.array([(3.0, 3.0), (7.0, 3.0), (7.0, 7.0), (3.0, 7.0),
              (3.0, 3.0)])])]
MULTI = [("poly", [np.array([(0.0, 0.0), (2.0, 0.0), (1.0, 2.0),
                             (0.0, 0.0)])]),
         ("poly", [np.array([(5.0, 5.0), (8.0, 5.0), (8.0, 8.0),
                             (5.0, 8.0), (5.0, 5.0)])])]
LINE = [("line", np.array([(0.0, 0.0), (3.0, 3.0), (6.0, 1.0)]))]
POINT = [("point", (2.5, 2.5))]
RECTILINEAR = [("poly", [np.array(  # axis-parallel edges: p == 0 paths
    [(0.0, 0.0), (6.0, 0.0), (6.0, 3.0), (3.0, 3.0), (3.0, 6.0),
     (0.0, 6.0), (0.0, 0.0)])])]

GEOMS = [IRREGULAR, WITH_HOLE, MULTI, LINE, POINT, RECTILINEAR]


def _random_rects(n=400):
    """Rect soup crossing every regime: interior, containing,
    touching-at-boundary, degenerate (zero-area), far away."""
    cx = RNG.uniform(-4, 12, n)
    cy = RNG.uniform(-4, 12, n)
    w = RNG.choice([0.0, 0.1, 0.5, 2.0, 15.0], n) * RNG.uniform(0.5, 1, n)
    h = RNG.choice([0.0, 0.1, 0.5, 2.0, 15.0], n) * RNG.uniform(0.5, 1, n)
    rx0, rx1 = cx - w / 2, cx + w / 2
    ry0, ry1 = cy - h / 2, cy + h / 2
    # exact-boundary cases: rects whose edge lies on a polygon vertex
    extra = np.array([[0.0, 0.0, 1.0, 1.0], [-3.0, -3.0, 0.0, 0.0],
                      [3.0, 3.0, 7.0, 7.0], [4.0, 4.0, 6.0, 6.0],
                      [2.5, 2.5, 2.5, 2.5], [10.0, 10.0, 12.0, 12.0]])
    rx0 = np.concatenate([rx0, extra[:, 0]])
    ry0 = np.concatenate([ry0, extra[:, 1]])
    rx1 = np.concatenate([rx1, extra[:, 2]])
    ry1 = np.concatenate([ry1, extra[:, 3]])
    return rx0, ry0, rx1, ry1


@pytest.fixture(scope="module")
def rects_df(spark):
    rx0, ry0, rx1, ry1 = _random_rects()
    rows = [(int(i), float(a), float(b), float(c), float(d))
            for i, (a, b, c, d) in enumerate(zip(rx0, ry0, rx1, ry1))]
    df = spark.createDataFrame(
        rows, "rid int, xmin double, ymin double, xmax double, ymax double")
    df.cache().count()
    return df, (rx0, ry0, rx1, ry1)


@pytest.mark.parametrize("gi", range(len(GEOMS)))
def test_compiled_predicate_bit_equals_numpy_kernel(rects_df, gi):
    df, (rx0, ry0, rx1, ry1) = rects_df
    pieces = GEOMS[gi]
    expected = rects_intersect_pieces(rx0, ry0, rx1, ry1, pieces)
    compiled = compile_pieces_predicate(
        pieces, F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"))
    assert compiled is not None
    expr, nodes = compiled
    assert nodes > 0
    got_rows = (df.withColumn("hit", expr)
                .orderBy("rid").select("hit").collect())
    got = np.array([r["hit"] for r in got_rows])
    assert np.array_equal(got, expected)


def test_vertex_budget_returns_none(spark):
    big_ring = np.column_stack([
        np.cos(np.linspace(0, 2 * np.pi, DEFAULT_VERTEX_BUDGET + 10)),
        np.sin(np.linspace(0, 2 * np.pi, DEFAULT_VERTEX_BUDGET + 10))])
    assert compile_pieces_predicate(
        [("poly", [big_ring])], F.lit(0.0), F.lit(0.0),
        F.lit(1.0), F.lit(1.0)) is None
    # refine compile is all-or-nothing: one over-budget query kills it
    assert compile_refine_predicate(
        {1: IRREGULAR, 2: [("poly", [big_ring])]}, None,
        F.lit(1), F.lit("polygon"), F.lit(0.0), F.lit(0.0),
        F.lit(1.0), F.lit(1.0)) is None


def test_node_budget_returns_none(spark):
    # many in-budget queries can still exceed the generated-code cap
    many = {q: IRREGULAR for q in range(200)}
    assert compile_refine_predicate(
        many, None, F.lit(1), F.lit("polygon"), F.lit(0.0),
        F.lit(0.0), F.lit(1.0), F.lit(1.0)) is None


def test_ear_clip_partitions_polygon():
    from rustac_spark.geo.colgeom import ear_clip
    ring = np.array([(0.0, 0.0), (6.0, 0.0), (6.0, 3.0), (3.0, 3.0),
                     (3.0, 6.0), (0.0, 6.0)])  # reflex L-shape
    tris = ear_clip(ring)
    assert tris is not None and len(tris) == 4  # n-2 triangles
    area = sum(abs((b[0] - a[0]) * (c[1] - a[1])
                   - (b[1] - a[1]) * (c[0] - a[0])) / 2
               for a, b, c in tris)
    assert abs(area - 27.0) < 1e-9  # tiles the L exactly
    # degenerate ring -> fallback
    assert ear_clip(np.array([(0.0, 0.0), (1.0, 1.0)])) is None


@pytest.fixture(scope="module")
def pages_geo(spark):
    df = with_geocode(
        spark.read.parquet(f"{DATA_DIR}/pages_sf0.001.parquet")
    ).drop("html", "text")
    df.cache().count()
    return df


def test_join_compiled_memo_arrow_paths_agree(spark, pages_geo,
                                              queries_df):
    compiled = spatial_join(pages_geo, queries_df, page_cols=["url"])
    arrow = spatial_join(pages_geo, queries_df, page_cols=["url"],
                         compile_polygons=False, refine_memo=False)
    memo = spatial_join(pages_geo, queries_df, page_cols=["url"],
                        compile_polygons=False)
    a = sorted(map(tuple, compiled.collect()))
    b = sorted(map(tuple, arrow.collect()))
    c = sorted(map(tuple, memo.collect()))
    assert a == b == c and len(a) > 0


def test_compiled_join_plan_has_no_python_stage(spark, pages_geo,
                                                queries_df):
    compiled = spatial_join(pages_geo, queries_df, page_cols=["url"],
                            compile_polygons=True)
    plan = compiled._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "Python" not in plan
    assert "BroadcastHashJoin" in plan
    # the compiled predicate must stay a standalone Filter (NOT get
    # merged into the join condition, where its size breaks codegen
    # for the whole stage) — locked by the join line staying small
    bhj = [l for l in plan.splitlines() if "BroadcastHashJoin" in l][0]
    assert "CASE WHEN" not in bhj
    # the round-7 DEFAULT path IS the compiled one: no Python stage
    # anywhere and no reject broadcast left join in the plan
    default = spatial_join(pages_geo, queries_df, page_cols=["url"])
    dplan = default._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in dplan
    # the explicit memo fallback still rides a broadcast LEFT join
    # over the stream, also Python-free (its reject verdicts run the
    # same compiled SAT predicate)
    memo = spatial_join(pages_geo, queries_df, page_cols=["url"],
                        compile_polygons=False)
    mplan = memo._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in mplan
    assert any("BroadcastHashJoin" in l and "LeftOuter" in l
               for l in mplan.splitlines())
    # the explicit Arrow path still drives the whole stream through it
    arrow = spatial_join(pages_geo, queries_df, page_cols=["url"],
                         compile_polygons=False, refine_memo=False)
    assert "MapInPandas" in (
        arrow._jdf.queryExecution().executedPlan().toString())


def test_reject_set_cached_across_calls(spark, pages_geo, queries_df):
    """Repeated spatial_join over the same pages plan + geometry set
    (the HTTP-server-per-request shape) reuses the memoized reject
    set: the second build runs no eager Spark job."""
    from rustac_spark.geo import join as join_mod
    join_mod._REJECT_CACHE.clear()
    first = spatial_join(pages_geo, queries_df, page_cols=["url"],
                         compile_polygons=False)
    assert len(join_mod._REJECT_CACHE) == 1
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    second = spatial_join(pages_geo, queries_df, page_cols=["url"],
                          has_polygons=True, compile_polygons=False)
    # plan build must be action-free on the cache hit (the polygon
    # WKB collect still runs; allow only that single bounded job)
    after = tracker.getJobIdsForGroup(None)
    assert len(after) - len(before) <= 1
    assert len(join_mod._REJECT_CACHE) == 1
    a = sorted(map(tuple, first.collect()))
    b = sorted(map(tuple, second.collect()))
    assert a == b and len(a) > 0


def test_reject_cache_not_stale_after_overwrite(spark, queries_df,
                                                tmp_path):
    """Overwriting the pages parquet at the SAME path must not replay
    the previous snapshot's memoized reject set (round-6 advisor
    finding: the analyzed plan's semanticHash is identical for a
    fresh read of the same path, so the key must carry a data
    version — the concrete part-file list)."""
    from rustac_spark.geo import join as join_mod

    path = str(tmp_path / "pages.parquet")
    base = spark.read.parquet(f"{DATA_DIR}/pages_sf0.001.parquet") \
        .select("url")
    join_mod._REJECT_CACHE.clear()

    base.limit(400).write.mode("overwrite").parquet(path)
    first_geo = with_geocode(spark.read.parquet(path))
    first = sorted(map(tuple, spatial_join(
        first_geo, queries_df, page_cols=["url"],
        compile_polygons=False).collect()))
    assert len(join_mod._REJECT_CACHE) == 1

    # same path, different data (and different part files)
    base.write.mode("overwrite").parquet(path)
    second_geo = with_geocode(spark.read.parquet(path))
    got = sorted(map(tuple, spatial_join(
        second_geo, queries_df, page_cols=["url"],
        compile_polygons=False).collect()))
    # fresh data must produce the fresh (memo-free) answer
    want = sorted(map(tuple, spatial_join(
        second_geo, queries_df, page_cols=["url"],
        compile_polygons=False, refine_memo=False).collect()))
    assert got == want
    assert len(got) > len(first)  # 1000 > 400 rows joined
    # and the overwrite produced a distinct cache entry, not a hit
    assert len(join_mod._REJECT_CACHE) == 2
