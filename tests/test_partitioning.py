"""Hive-partitioned spatial layout: partition pruning evidence."""

import pytest
from pyspark.sql import functions as F

from rustac_spark import DATA_DIR
from rustac_spark.geocode import with_geocode
from rustac_spark.pipeline.layout import (
    partition_pruned_read, write_partitioned,
)


@pytest.fixture(scope="module")
def part_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "pages_part")
    geo = with_geocode(
        spark.read.parquet(f"{DATA_DIR}/pages_sf0.001.parquet")
    ).drop("html", "text")
    write_partitioned(geo, path)
    return path


def test_partition_pruning_in_plan(spark, part_path):
    df = partition_pruned_read(spark, part_path, 147.0, 31.0, 149.0, 33.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = plan.split("Scan parquet")[1]
    # PartitionFilters carry the pcell predicate — directories are
    # pruned before file listing
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "pcell" in pf and pf.strip() != "[]"


def test_pruned_read_correctness(spark, part_path):
    # pruned read + exact bbox filter == full-scan + exact bbox filter
    q = (147.0, 31.0, 149.0, 33.0)
    pred = ((F.col("xmin") <= q[2]) & (F.col("xmax") >= q[0])
            & (F.col("ymin") <= q[3]) & (F.col("ymax") >= q[1]))
    pruned = {r["url"] for r in partition_pruned_read(
        spark, part_path, *q).where(pred).collect()}
    full = {r["url"] for r in spark.read.parquet(part_path)
            .where(pred).collect()}
    assert pruned == full and len(full) > 0


def test_partition_count_bounded(spark, part_path):
    import os
    parts = [d for d in os.listdir(part_path) if d.startswith("pcell=")]
    assert 1 < len(parts) <= 256


def test_zorder_key_matches_python_twin(spark):
    from rustac_spark.pipeline.layout import zorder_key, zorder_key_py

    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 255, 1023, 65535)
         for y in (0, 2, 7, 512, 65535)], ["xi", "yi"])
    out = df.select("xi", "yi",
                    zorder_key(F.col("xi"), F.col("yi")).alias("z")) \
        .collect()
    for r in out:
        assert r["z"] == zorder_key_py(r["xi"], r["yi"])
    # interleave property: (x=1,y=0) -> 1, (x=0,y=1) -> 2, (1,1) -> 3
    assert zorder_key_py(1, 0) == 1
    assert zorder_key_py(0, 1) == 2
    assert zorder_key_py(1, 1) == 3


def test_zorder_files_are_2d_local(spark, tmp_path):
    """Evidence: Morton clustering yields tighter per-file bboxes than
    row-major cell clustering for the same file count — the property
    that makes square queries touch fewer files at 10^12 rows."""
    import itertools
    from rustac_spark.pipeline.layout import (
        with_anchor_cell, with_zorder_key)

    # uniform 64×64 grid of points over a square region
    pts = [(i, -10 + 20 * (i % 64) / 63.0, -10 + 20 * (i // 64) / 63.0)
           for i in range(64 * 64)]
    df = spark.createDataFrame(pts, ["id", "lon", "lat"])

    def file_boxes(df_sorted, key):
        files = (df_sorted.repartitionByRange(64, key)
                 .sortWithinPartitions(key))
        return [(r["x0"], r["x1"], r["y0"], r["y1"]) for r in
                (files.groupBy(F.spark_partition_id().alias("p"))
                 .agg(F.min("lon").alias("x0"), F.max("lon").alias("x1"),
                      F.min("lat").alias("y0"), F.max("lat").alias("y1"))
                 ).collect()]

    # files touched by small square queries — the min/max-skipping
    # metric that decides scan cost at 10^12 rows
    queries = [(qx, qx + 2, qy, qy + 2)
               for qx in (-9.0, -4.0, 1.0, 6.0)
               for qy in (-9.0, -4.0, 1.0, 6.0)]

    def touches(boxes):
        n = 0
        for qx0, qx1, qy0, qy1 in queries:
            n += sum(1 for x0, x1, y0, y1 in boxes
                     if x0 <= qx1 and x1 >= qx0
                     and y0 <= qy1 and y1 >= qy0)
        return n

    z = touches(file_boxes(with_zorder_key(df, res=12), "zkey"))
    rm = touches(file_boxes(with_anchor_cell(df, res=12), "cell"))
    assert z < rm * 0.7, f"zorder touches {z} not < 0.7 × row-major {rm}"
