"""Stage runner: checkpointed parquet sinks, per-partition lineage, resume.

Replaces the reference's incremental JSON memo-caches (cache.py:46-51 —
save after every key so an interrupted run resumes) with the Spark-native
equivalent: each stage writes its output parquet once, commits a marker
file, and a re-run skips straight to reading the committed output.

Lineage is fused into the write job itself — no extra Spark jobs:
  * the row count comes from an ``Observation`` attached to the written
    DataFrame (computed inside the write job, like Iceberg's snapshot
    summary metrics);
  * the per-partition rows come from the written parquet file footers,
    read driver-side with pyarrow (a pure metadata operation — the exact
    information an Iceberg manifest carries per data file, so on a real
    cluster this becomes a manifest read, not a scan).
Each stage's lineage lives in its own overwrite-mode file stamped with a
per-run id, so a force=True rerun or a crash-then-resume can never double
count rows (previously lineage was append-mode and rows_out summed stale
runs).

No Iceberg catalog exists in this sandbox; the sink abstraction writes
partitioned parquet with the same layout contract (atomic commit marker =
Iceberg snapshot commit stand-in). On a real cluster, swap ``_write`` for
``df.writeTo(table).createOrReplace()``.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageResult:
    name: str
    df: DataFrame
    resumed: bool
    rows_out: int
    wall_s: float


def _footer_lineage(out: str) -> list[tuple[int, int]]:
    """(partition_id, rows) per written data file, from parquet footers
    only — no Spark job, no data scan. partition_id is the writer task id
    parsed from the part-NNNNN filename."""
    import pyarrow.parquet as pq

    rows = []
    for root, _dirs, files in os.walk(out):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            pid = int(fn.split("-")[1]) if fn.startswith("part-") else len(rows)
            n = pq.ParquetFile(os.path.join(root, fn)).metadata.num_rows
            rows.append((pid, n))
    return sorted(rows)


@dataclass
class PipelineContext:
    spark: SparkSession
    workdir: str
    force: bool = False
    ran: list[StageResult] = field(default_factory=list)
    run_id: str = field(default_factory=lambda: uuid.uuid4().hex[:12])

    def _paths(self, name: str) -> tuple[str, str]:
        out = os.path.join(self.workdir, name)
        return out, os.path.join(self.workdir, f"_{name}.COMMITTED")

    def stage(
        self,
        name: str,
        fn,
        *,
        partition_by: list[str] | None = None,
        repartition: tuple[int, list[str]] | None = None,
    ) -> DataFrame:
        """Run (or resume) one stage. ``fn() -> DataFrame``.

        repartition=(n, cols): explicit pre-sink repartition — the north
        rule requires it after extraction and before components so the
        downstream shuffle layout is chosen deliberately, not inherited.
        """
        out, marker = self._paths(name)
        if not self.force and os.path.exists(marker):
            df = self.spark.read.parquet(out)
            with open(marker) as f:
                rows = json.load(f)["rows_out"]
            self.ran.append(StageResult(name, df, True, rows, 0.0))
            return df

        t0 = time.time()
        df = fn()
        if repartition:
            n, cols = repartition
            df = df.repartition(n, *[F.col(c) for c in cols])
        obs = Observation(f"lineage_{name}_{self.run_id}")
        df = df.observe(obs, F.count(F.lit(1)).alias("rows_out"))
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out)
        rows = int(obs.get["rows_out"])  # computed inside the write job

        # per-partition lineage from footers — metadata-only, zero jobs
        import pyarrow as pa
        import pyarrow.parquet as pq

        per_part = _footer_lineage(out)
        lin_dir = os.path.join(self.workdir, "_lineage")
        os.makedirs(lin_dir, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "partition_id": pa.array([p for p, _ in per_part], pa.int32()),
                    "rows_out": pa.array([n for _, n in per_part], pa.int64()),
                    "stage": pa.array([name] * len(per_part)),
                    "run_id": pa.array([self.run_id] * len(per_part)),
                }
            ),
            os.path.join(lin_dir, f"{name}.parquet"),  # overwrite per stage
        )

        wall = time.time() - t0
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"stage": name, "rows_out": rows, "wall_s": wall, "run_id": self.run_id},
                f,
            )
        os.replace(tmp, marker)  # atomic commit — resume boundary
        committed = self.spark.read.parquet(out)
        self.ran.append(StageResult(name, committed, False, rows, wall))
        return committed

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.workdir, "_lineage"))
