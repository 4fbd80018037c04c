"""Per-stage checkpoint/resume + metrics (SURVEY.md §2.9 / §4).

The reference's ctrl-c graceful abort with partial results
(/root/reference/src/utils/running.rs:6-49) maps to *resumability*: every
pipeline stage can persist its output table plus a metrics row; a rerun
skips stages whose checkpoint is complete. On a cluster these writes are
Iceberg tables with snapshot tags; in this sandbox the same contract is
implemented over parquet directories with an atomic _SUCCESS marker
(written by Spark's committer) and a sidecar metrics JSON.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class StageRunner:
    spark: SparkSession
    root: str | None = None  # checkpoint dir; None disables persistence
    metrics: list[dict] = field(default_factory=list)
    # lazy=True skips per-stage materialization + row counts for stages
    # whose output feeds exactly one consumer — used by the bench path
    # where stage barriers cost more than they observe. Stages marked
    # reused=True still cut lineage.
    lazy: bool = False

    def _path(self, stage: str) -> str:
        assert self.root
        return os.path.join(self.root, stage)

    def _complete(self, stage: str) -> bool:
        return self.root is not None and os.path.exists(
            os.path.join(self._path(stage), "_SUCCESS")
        )

    def run(self, stage: str, build, reused: bool = False) -> DataFrame:
        """Materialize `build()` under `stage`, or resume from checkpoint.

        With no checkpoint root the stage still runs and records metrics
        (row counts force evaluation, keeping stage boundaries real) —
        unless lazy mode is on and the stage isn't `reused`.
        """
        t0 = time.monotonic()
        if self._complete(stage):
            df = self.spark.read.parquet(self._path(stage))
            self.metrics.append(
                {"stage": stage, "rows": df.count(), "partitions": df.rdd.getNumPartitions(),
                 "wall_sec": round(time.monotonic() - t0, 3), "extra": "resumed"}
            )
            return df
        df = build()
        if self.root is not None:
            df.write.mode("overwrite").parquet(self._path(stage))
            out = self.spark.read.parquet(self._path(stage))
        elif self.lazy and not reused:
            self.metrics.append(
                {"stage": stage, "rows": -1, "partitions": -1,
                 "wall_sec": round(time.monotonic() - t0, 3), "extra": "lazy"}
            )
            return df
        else:
            # no persistent checkpoint: still cut lineage eagerly so later
            # stages never recompute this one (each stage runs exactly once)
            out = df.localCheckpoint(eager=True)
        rows = out.count()
        self.metrics.append(
            {"stage": stage, "rows": rows, "partitions": out.rdd.getNumPartitions(),
             "wall_sec": round(time.monotonic() - t0, 3), "extra": None}
        )
        return out

    def write_metrics(self) -> None:
        if self.root is None:
            return
        os.makedirs(self.root, exist_ok=True)
        with open(os.path.join(self.root, "metrics.json"), "w") as fh:
            json.dump(self.metrics, fh, indent=2)
