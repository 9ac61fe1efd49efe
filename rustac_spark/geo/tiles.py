"""z/x/y web-mercator tiling — pure Column math (SURVEY.md §2.3
"tile assignment"; the reference only carries the metadata shell via
the projection/raster extensions, crates/extensions/src/projection.rs,
raster.rs — the actual tiler is a north-rule operator).

Standard slippy-map scheme:
    tx = floor((lon + 180) / 360 · 2^z)
    ty = floor((1 − asinh(tan(lat)) / π) / 2 · 2^z)

``explode_tiles`` assigns every footprint to ALL tiles it covers at
zoom z (raster↔vector assignment) via sequence × transform —
whole-stage-codegen, zero Python, no shuffle (narrow transformation).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

MERCATOR_LAT_LIMIT = 85.05112878


def _clamp_lat(lat: Column) -> Column:
    return F.greatest(F.lit(-MERCATOR_LAT_LIMIT),
                      F.least(F.lit(MERCATOR_LAT_LIMIT), lat))


def tile_x(lon: Column, z: int) -> Column:
    n = 1 << z
    i = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), i.cast("long")))


def tile_y(lat: Column, z: int) -> Column:
    n = 1 << z
    phi = F.radians(_clamp_lat(lat))
    merc = (F.lit(1.0)
            - F.log(F.tan(phi) + F.lit(1.0) / F.cos(phi)) / F.lit(math.pi)
            ) / F.lit(2.0)
    i = F.floor(merc * F.lit(float(n)))
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), i.cast("long")))


def explode_tiles(df: DataFrame, z: int,
                  xmin="xmin", ymin="ymin", xmax="xmax", ymax="ymax",
                  ) -> DataFrame:
    """Footprint bbox → one row per covered (tile_z, tile_x, tile_y).

    Note ty grows southward: the y-range of a bbox is
    [tile_y(ymax), tile_y(ymin)].
    """
    tx0, tx1 = tile_x(F.col(xmin), z), tile_x(F.col(xmax), z)
    ty0, ty1 = tile_y(F.col(ymax), z), tile_y(F.col(ymin), z)
    tiles = F.flatten(F.transform(
        F.sequence(tx0, tx1),
        lambda x: F.transform(F.sequence(ty0, ty1),
                              lambda y: F.struct(x.alias("x"), y.alias("y")))))
    return (df
            .withColumn("_tile", F.explode(tiles))
            .withColumn("tile_z", F.lit(z))
            .withColumn("tile_x", F.col("_tile.x"))
            .withColumn("tile_y", F.col("_tile.y"))
            .drop("_tile"))
