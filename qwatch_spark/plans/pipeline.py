"""PipelineSpec — the declared sources→filters→sinks DAG, activated.

The reference scaffolds an explicit dataflow DAG (AddInput/AddFilter/
AddOutput, /root/reference/utils/dag.go:9-78) but never enables it
(wiring commented at server/server.go:22, 44, 62-64, 70, 90); its real
topology is hardcoded goroutines. Here the spec is first-class: validate
at construction (unknown plugin names are errors, not nil-interface
panics like server/server.go:42-58), then compile to DataFrame lineage —
Spark's DAG is the execution plan.

Cadence: each source carries a `tick_modulo` — it contributes to epoch k
only when ``k % tick_modulo == 0`` (epoch 0 always runs), realizing the
reference's per-endpoint tick gate (inputs/docker-api.go:62-64,
resources/qwatch.yml:9-19). The event tail runs every epoch; a snapshot
reconciliation source every Nth.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from qwatch_spark.config import PipelineConfig
from qwatch_spark.operators.apply import ApplyStats, apply_changes
from qwatch_spark.plans.snapshot_table import SnapshotTable

# a source yields a change-set DataFrame for an epoch (or None to skip)
SourceFn = Callable[[SparkSession, int], "DataFrame | None"]


@dataclasses.dataclass(frozen=True)
class SourceSpec:
    name: str
    fn: SourceFn
    tick_modulo: int = 1  # run every Nth epoch; 1 = every epoch

    def due(self, epoch_id: int) -> bool:
        # epoch 0 always runs, like tick 0 (inputs/docker-api.go:62-64)
        return epoch_id == 0 or epoch_id % self.tick_modulo == 0


class PipelineSpec:
    """sources → filter rules (cfg.rules order) → SnapshotTable sink."""

    def __init__(self, cfg: PipelineConfig, table_path: str):
        self.cfg = cfg
        self.table_path = table_path
        self.sources: list[SourceSpec] = []

    def add_source(self, name: str, fn: SourceFn, tick_modulo: int = 1) -> "PipelineSpec":
        if tick_modulo < 1:
            raise ValueError(f"source {name!r}: tick_modulo must be >= 1")
        if any(s.name == name for s in self.sources):
            raise ValueError(f"duplicate source name {name!r}")
        self.sources.append(SourceSpec(name, fn, tick_modulo))
        return self

    def run_epoch(self, spark: SparkSession, epoch_id: int) -> list[ApplyStats]:
        """Gather due sources, union their change sets, apply once.
        Skipped sources simply don't contribute (their cadence isn't due)."""
        due = [s for s in self.sources if s.due(epoch_id)]
        frames = []
        for s in due:
            df = s.fn(spark, epoch_id)
            if df is not None:
                frames.append(df)
        if not frames:
            return []
        batch = frames[0]
        for df in frames[1:]:
            batch = batch.unionByName(df, allowMissingColumns=True)
        table = SnapshotTable(self.table_path)
        return [apply_changes(spark, batch, table, epoch_id, self.cfg)]
