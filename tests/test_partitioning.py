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
