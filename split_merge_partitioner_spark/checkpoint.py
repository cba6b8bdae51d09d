"""Per-superstep checkpoint/lineage tables for resumable iterative runs
(north_rule: "resumable from checkpoint with per-partition lineage + metrics").

Layout (parquet-with-manifest; Iceberg-compatible table shapes, used without
the Iceberg jar since the sandbox has none — the writer is format-agnostic):

  <base>/<run_id>/state/superstep=<N>/   vertex-state snapshot (atomic: dir
                                          rename-free, validity = manifest row)
  <base>/<run_id>/metrics/               append-only per-(superstep,partition)
                                          metric rows (FIXTURES.md F8 schema)
  <base>/<run_id>/manifest.json          run config + lineage (input snapshot
                                          id + partitioner config hash) +
                                          last complete superstep

Resume = read manifest -> load state at last complete superstep -> continue.
A superstep is "complete" only after its state write AND the manifest update
succeed, in that order, so a crash mid-write resumes from the previous one.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_SCHEMA = (
    "run_id string, superstep int, partition_id int, n_edges long, "
    "n_replicas long, delta_max double, edges_per_sec double, lineage string"
)


def config_hash(cfg: dict) -> str:
    return hashlib.sha256(json.dumps(cfg, sort_keys=True).encode()).hexdigest()[:16]


class CheckpointManager:
    def __init__(self, base_dir: str, run_id: str, lineage: str) -> None:
        self.base = os.path.join(base_dir, run_id)
        self.run_id = run_id
        self.lineage = lineage
        os.makedirs(self.base, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.base, "manifest.json")

    def read_manifest(self) -> dict | None:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _write_manifest(self, superstep: int, extra: dict | None = None) -> None:
        doc = {
            "run_id": self.run_id,
            "lineage": self.lineage,
            "last_complete_superstep": superstep,
            "written_at": time.time(),
        }
        if extra:
            doc.update(extra)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, self._manifest_path())  # atomic

    # -- state + metrics ---------------------------------------------------
    def save_superstep(
        self,
        superstep: int,
        state: DataFrame,
        per_partition: DataFrame | None,
        delta_max: float | None,
        edges_per_sec: float | None,
    ) -> None:
        spark = state.sparkSession
        state.write.mode("overwrite").parquet(
            os.path.join(self.base, "state", f"superstep={superstep}")
        )
        if per_partition is not None:
            rows = per_partition.select(
                F.lit(self.run_id).alias("run_id"),
                F.lit(superstep).cast("int").alias("superstep"),
                F.col("bucket").cast("int").alias("partition_id"),
                F.col("n_edges").cast("long"),
                F.col("n_replicas").cast("long"),
                F.lit(delta_max).cast("double").alias("delta_max"),
                F.lit(edges_per_sec).cast("double").alias("edges_per_sec"),
                F.lit(self.lineage).alias("lineage"),
            )
        else:
            rows = spark.createDataFrame(
                [(self.run_id, superstep, -1, None, None, delta_max, edges_per_sec, self.lineage)],
                METRICS_SCHEMA,
            )
        rows.write.mode("append").parquet(os.path.join(self.base, "metrics"))
        self._write_manifest(superstep)

    def latest_superstep(self) -> int | None:
        m = self.read_manifest()
        return None if m is None else int(m["last_complete_superstep"])

    def load_state(self, spark: SparkSession, superstep: int) -> DataFrame:
        return spark.read.parquet(
            os.path.join(self.base, "state", f"superstep={superstep}")
        )

    def metrics(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.base, "metrics"))
