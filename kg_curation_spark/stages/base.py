"""Stage runner: checkpointed parquet sinks, per-partition lineage, resume.

Replaces the reference's incremental JSON memo-caches (cache.py:46-51 —
save after every key so an interrupted run resumes) with the Spark-native
equivalent: each stage writes its output parquet once, commits a marker
file, and a re-run skips straight to reading the committed output. Lineage
is a per-partition row (stage, partition_id, rows_out, wall concept at the
stage level) appended to ``<workdir>/_lineage`` — the north rule's
"per-partition lineage rows".

No Iceberg catalog exists in this sandbox; the sink abstraction writes
partitioned parquet with the same layout contract (atomic commit marker =
Iceberg snapshot commit stand-in). On a real cluster, swap ``_write`` for
``df.writeTo(table).createOrReplace()``.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageResult:
    name: str
    df: DataFrame
    resumed: bool
    rows_out: int
    wall_s: float


@dataclass
class PipelineContext:
    spark: SparkSession
    workdir: str
    force: bool = False
    ran: list[StageResult] = field(default_factory=list)

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
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out)

        committed = self.spark.read.parquet(out)
        lineage = committed.groupBy(
            F.spark_partition_id().alias("partition_id")
        ).agg(F.count(F.lit(1)).alias("rows_out")).withColumn(
            "stage", F.lit(name)
        )
        lineage.write.mode("append").parquet(os.path.join(self.workdir, "_lineage"))
        # stage rows == sum of its lineage rows — no second scan
        rows = (
            self.spark.read.parquet(os.path.join(self.workdir, "_lineage"))
            .filter(F.col("stage") == name)
            .agg(F.sum("rows_out"))
            .first()[0]
            or 0
        )
        wall = time.time() - t0
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"stage": name, "rows_out": rows, "wall_s": wall}, f)
        os.replace(tmp, marker)  # atomic commit — resume boundary
        self.ran.append(StageResult(name, committed, False, rows, wall))
        return committed

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.workdir, "_lineage"))
