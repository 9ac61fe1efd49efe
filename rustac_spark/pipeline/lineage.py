"""Per-stage lineage + metrics + checkpoint-resume (north-rule
requirement; SURVEY.md §4 "custom needed — lineage/metrics/resume").

Iceberg-style semantics without the Iceberg runtime jar (not installed
— SURVEY.md §7 "offline deps"): each pipeline stage materializes its
output as parquet, appends per-partition lineage rows (stage,
output_file, row_count, bytes) plus stage wall-time to a metrics
table, and writes an atomic commit marker (write-temp + rename). On
restart, committed stages are skipped and their outputs reused —
resume-from-last-committed-checkpoint. Swapping this layer for real
Iceberg snapshots is confined to this module.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class Pipeline:
    def __init__(self, spark: SparkSession, run_dir: str,
                 run_id: str | None = None):
        self.spark = spark
        self.run_dir = run_dir
        self.run_id = run_id or uuid.uuid4().hex[:12]
        os.makedirs(f"{run_dir}/commits", exist_ok=True)
        os.makedirs(f"{run_dir}/metrics", exist_ok=True)
        self.stage_seconds: dict[str, float] = {}

    # ------------------------------------------------------------ state
    def _marker(self, stage: str) -> str:
        return f"{self.run_dir}/commits/{stage}.json"

    def is_committed(self, stage: str) -> bool:
        return os.path.exists(self._marker(stage))

    def _commit(self, stage: str, info: dict) -> None:
        tmp = self._marker(stage) + f".tmp.{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            json.dump(info, f)
        os.rename(tmp, self._marker(stage))  # atomic on POSIX

    def committed_info(self, stage: str) -> dict:
        with open(self._marker(stage)) as f:
            return json.load(f)

    # ---------------------------------------------------------- metrics
    def _write_lineage(self, stage: str, out_path: str,
                       wall_s: float) -> int:
        """Per-partition lineage: one row per output file (file ≙ write
        partition) with row count + bytes, read from parquet footers —
        no second Spark job per stage (pure metadata, O(files))."""
        import pyarrow.parquet as pq

        recs = []
        for fn in sorted(os.listdir(out_path)):
            if not fn.endswith(".parquet"):
                continue
            full = os.path.join(out_path, fn)
            meta = pq.ParquetFile(full).metadata
            recs.append((self.run_id, stage, full, meta.num_rows,
                         os.path.getsize(full), float(wall_s)))
        lineage = self.spark.createDataFrame(
            recs, "run_id string, stage string, output_file string, "
            "row_count long, bytes long, stage_wall_s double")
        (lineage.coalesce(1).write.mode("append")
         .parquet(f"{self.run_dir}/metrics"))
        return sum(r[3] for r in recs)

    # ------------------------------------------------------------ stage
    def stage(self, name: str, build, out_name: str | None = None,
              ) -> DataFrame:
        """Run (or resume) a stage. `build()` returns the stage's
        DataFrame; it is materialized to parquet, lineage is recorded,
        and a commit marker makes the stage skippable on restart."""
        out_path = f"{self.run_dir}/{out_name or name}.parquet"
        if self.is_committed(name):
            self.stage_seconds[name] = 0.0
            return self.spark.read.parquet(out_path)
        t0 = time.time()
        df = build()
        df.write.mode("overwrite").parquet(out_path)
        wall = time.time() - t0
        total = self._write_lineage(name, out_path, wall)
        self._commit(name, {"stage": name, "run_id": self.run_id,
                            "output": out_path, "rows": total,
                            "wall_s": wall, "ts": time.time()})
        self.stage_seconds[name] = wall
        return self.spark.read.parquet(out_path)

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.run_dir}/metrics")
