"""kNN: nearest pages per query point (north-rule operator; the
reference has no kNN — SURVEY.md §2.3).

Two physical strategies behind one semantic:

- ``knn_bruteforce`` — exact: broadcast the (small) query side,
  pure-Column haversine, per-query top-k via Window row_number.
  O(pages × queries); the correctness baseline and the right plan
  when |queries| is small (Catalyst keeps everything codegen'd,
  the only shuffle is the final per-query top-k, pre-shrunk by a
  per-partition top-k push-down).
- ``knn_cells`` — the 10^12-row scale path: candidates only from the
  query cell's expanding k-ring (h3.grid_disk-equivalent), distance
  re-rank on candidates. Ring radius chosen so the disk provably
  contains ≥k pages' anchors under a density floor; falls back to a
  wider ring when a query underflows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from .cells import DEFAULT_RES, cell_of_point, cell_size_deg, k_ring

EARTH_RADIUS_KM = 6371.0088

# Diagnostics from the most recent knn_cells plan build (driver-side
# only, no plan change): how many queries the ring disk satisfied
# outright, how many needed the bounded-band redo (dmax > safe), and
# how many underflowed (< k candidates → unbounded redo). bench.py
# prints this per pass so fallback-trigger cost is visible.
LAST_STATS: dict[str, int] = {}


def haversine_km(lat1, lon1, lat2, lon2):
    """Pure-Column haversine distance (km)."""
    dphi = F.radians(lat2 - lat1) / 2.0
    dlmb = F.radians(lon2 - lon1) / 2.0
    a = (F.sin(dphi) * F.sin(dphi)
         + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
         * F.sin(dlmb) * F.sin(dlmb))
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def _rank_topk(cand: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_km").asc(), F.col("url").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def knn_bruteforce(pages: DataFrame, queries: DataFrame, k: int = 5,
                   ) -> DataFrame:
    """Exact kNN. pages: url/lat/lon; queries: query_id/qxmin(=lon)/
    qymin(=lat) point rows. → (query_id, rank, url, dist_km)."""
    q = F.broadcast(queries.select(
        "query_id",
        F.col("qxmin").alias("qlon"), F.col("qymin").alias("qlat")))
    cand = (pages.select("url", "lat", "lon")
            .join(q)  # broadcast nested-loop: queries side is tiny
            .withColumn("dist_km", haversine_km(
                F.col("lat"), F.col("lon"), F.col("qlat"), F.col("qlon"))))
    return _rank_topk(cand, k).select("query_id", "rank", "url", "dist_km")


def knn_cells(pages: DataFrame, queries: DataFrame, k: int = 5,
              res: int = DEFAULT_RES, rings: int = 4) -> DataFrame:
    """Cell-pruned kNN (scale path): candidates = pages whose anchor
    cell lies within `rings` of the query's cell, then exact re-rank.

    Exactness bound: the disk of `rings` cells contains every page
    within (rings-1)·min_cell_edge degrees of the query, scaled per
    query by cos(lat) for longitude shrinkage; queries whose k-th
    neighbour might lie outside are re-run exactly over a bounded
    lat/lon band.

    Physical shape: the candidate top-k (≤ |queries|·k rows, tiny by
    the small-queries contract) is collected ONCE; the per-query
    verdict is decided driver-side from those rows and the ok branch
    is rebuilt with createDataFrame — so the expensive candidate join
    runs exactly once, with no persist to leak cached blocks into the
    session (a r3-advice fix: the earlier persist was never
    unpersisted). Eager like spatio_temporal_join's bound collection.
    """
    pc = pages.select("url", "lat", "lon").withColumn(
        "cell", cell_of_point(F.col("lon"), F.col("lat"), res))
    q = (queries.select(
            "query_id",
            F.col("qxmin").alias("qlon"), F.col("qymin").alias("qlat"))
         .withColumn("qcell", cell_of_point(F.col("qlon"), F.col("qlat"), res))
         .withColumn("cell", F.explode(k_ring(F.col("qcell"), rings, res))))
    cand = (pc.join(F.broadcast(q.drop("qcell")), "cell")
            .withColumn("dist_km", haversine_km(
                F.col("lat"), F.col("lon"), F.col("qlat"), F.col("qlon"))))
    spark = pages.sparkSession
    topk_df = _rank_topk(cand, k)
    topk_schema = topk_df.schema
    topk_rows = topk_df.collect()

    # safe radius: (rings) cells minus one diagonal. 1° of longitude is
    # 111·cos(lat) km, so the equatorial bound overstates coverage at
    # high latitude (a 39 km disk at 84° spans ~10 cells of longitude,
    # far outside the ring). Scale per query by the WORST latitude the
    # ring can reach (|qlat| + rings·dy, capped at the pole) — at the
    # pole the bound collapses to 0 and every query falls back to the
    # exact (bounded) brute-force path.
    dx, dy = cell_size_deg(res)
    base_km = rings * min(dx, dy) * 111.0 * 0.5
    stats: dict[int, tuple[int, float | None]] = {}
    for r in topk_rows:
        n, dmax = stats.get(r["query_id"], (0, None))
        d = r["dist_km"]
        stats[r["query_id"]] = (
            n + 1, d if dmax is None else max(dmax, d))
    flagged: dict[int, float | None] = {}
    bands: list[tuple[float, float, float]] = []  # (qlon, qlat, dmax)
    qrows = queries.select("query_id", F.col("qxmin").alias("qlon"),
                           F.col("qymin").alias("qlat")).collect()
    for r in qrows:
        n, dmax = stats.get(r["query_id"], (0, None))
        worst = min(90.0, abs(r["qlat"]) + rings * dy)
        safe = base_km * math.cos(math.radians(worst))
        if n < k:
            # underflow: dmax is only the n-th distance, no valid
            # bound — re-run unbounded
            flagged[r["query_id"]] = None
        elif dmax > safe:
            # full top-k: its k-th distance bounds the true k-th
            # (candidates ⊆ pages) — re-run over that band only
            flagged[r["query_id"]] = float(dmax)
            bands.append((r["qlon"], r["qlat"], float(dmax)))
    LAST_STATS.clear()
    LAST_STATS.update({
        "queries": len(qrows),
        "ok": len(qrows) - len(flagged),
        "redo_bounded": len(bands),
        "redo_unbounded": len(flagged) - len(bands),
    })
    out_cols = ["query_id", "rank", "url", "dist_km"]
    if not flagged:
        return (spark.createDataFrame(topk_rows, topk_schema)
                .select(*out_cols))
    ok = spark.createDataFrame(
        [r for r in topk_rows if r["query_id"] not in flagged],
        topk_schema)
    redo_pages = pages
    if len(bands) == len(flagged):
        # every flagged query is bounded and its band is a DRIVER
        # literal → OR of plain range predicates that push into the
        # parquet scan (row-group skipping on lat/lon stats). Same
        # formulas as knn_bruteforce_bounded, so this is a superset
        # of each query's exact band.
        preds = []
        for qlon, qlat, dmax in bands:
            dlat = dmax / 111.0
            band_lat = min(89.9999, abs(qlat) + dlat)
            dlon = min(360.0, dmax / (111.0 * math.cos(
                math.radians(band_lat))) * (math.pi / 2.0))
            p = (F.col("lat") >= qlat - dlat) & \
                (F.col("lat") <= qlat + dlat) & \
                (((F.col("lon") >= qlon - dlon)
                  & (F.col("lon") <= qlon + dlon))
                 | (F.col("lon") >= qlon + 360.0 - dlon)
                 | (F.col("lon") <= qlon - 360.0 + dlon))
            preds.append(p)
        pre = preds[0]
        for p in preds[1:]:
            pre = pre | p
        redo_pages = pages.where(pre)
    redo = queries.join(
        F.broadcast(spark.createDataFrame(
            list(flagged.items()), "query_id long, dmax double")),
        "query_id")
    redone = knn_bruteforce_bounded(redo_pages, redo, k)
    return ok.select(*out_cols).unionByName(redone)


def knn_bruteforce_bounded(pages: DataFrame, queries: DataFrame,
                           k: int = 5) -> DataFrame:
    """Exact kNN over a per-query search radius `dmax` km (nullable —
    null means unbounded). Same output contract as knn_bruteforce."""
    q = F.broadcast(queries.select(
        "query_id",
        F.col("qxmin").alias("qlon"), F.col("qymin").alias("qlat"),
        F.col("dmax")))
    # |Δlat| ≤ d/R exactly; 111.0 < 111.195 (spherical km/deg) keeps
    # the band conservatively wide
    dlat = F.col("dmax") / F.lit(111.0)
    # longitude width at the band's worst (most poleward) latitude.
    # From haversine: sin(|Δλ|/2) ≤ sin(d/2R)/cos(band_lat), and
    # 2·asin(x) ≤ π·x, so the linear estimate times π/2 is a PROVABLE
    # upper bound for every radius (it degrades to ≥180° exactly when
    # the radius stops constraining longitude at all). Cap at 360°.
    band_lat = F.least(F.lit(89.9999),
                       F.abs(F.col("qlat")) + dlat)
    dlon = F.least(F.lit(360.0),
                   F.col("dmax")
                   / (F.lit(111.0) * F.cos(F.radians(band_lat)))
                   * F.lit(math.pi / 2.0))
    in_band = (F.col("dmax").isNull()
               | ((F.abs(F.col("lat") - F.col("qlat")) <= dlat)
                  & ((F.abs(F.col("lon") - F.col("qlon")) <= dlon)
                     # antimeridian wrap
                     | (F.lit(360.0) - F.abs(F.col("lon") - F.col("qlon"))
                        <= dlon))))
    cand = (pages.select("url", "lat", "lon")
            .join(q)
            .where(in_band)
            .withColumn("dist_km", haversine_km(
                F.col("lat"), F.col("lon"), F.col("qlat"), F.col("qlon"))))
    return _rank_topk(cand, k).select("query_id", "rank", "url", "dist_km")
