"""Structured Streaming runner — the daemon loop, Spark-first.

The reference's driver loop broadcasts a tick every interval and exits
after `ticks` (/root/reference/server/server.go:98-111); delivery is
at-most-once with no offsets or checkpoints (the "1s sleep and hope"
startup barrier, server/server.go:85-88). Here the trigger IS the tick,
offsets are checkpointed, and the sink is the idempotent epoch-tagged
`apply_changes` — together: exactly-once end-to-end.

- `Trigger.AvailableNow` = the reference's bounded `ticks` run
  (cmd/server.go:18-22): drain everything currently in the feed, stop.
- `processingTime` trigger = the ticker (`ticker.interval`,
  cmd/server.go:33-37).
- resume: a restart with the same checkpointLocation replays the last
  uncommitted micro-batch with the SAME epoch id; the manifest marks
  applied epochs, so the replay is a no-op commit — duplicate delivery
  converges (the reference's MERGE-idempotence contract,
  outputs/neo4j.go:259-262, now actually transactional).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from qwatch_spark.config import PipelineConfig
from qwatch_spark.operators.apply import ApplyStats, apply_changes
from qwatch_spark.plans.snapshot_table import SnapshotTable
from qwatch_spark.sources.feed import read_feed_stream, split_dead_letter


def run_stream(
    spark: SparkSession,
    feed_dir: str,
    table_path: str,
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    available_now: bool = True,
    processing_time: str | None = None,
    timeout_sec: float | None = None,
) -> list[ApplyStats]:
    """Tail the feed dir and apply each micro-batch. Returns per-epoch
    stats (driver-side list; the durable record is the commit_log)."""
    cfg = cfg or PipelineConfig()
    stats: list[ApplyStats] = []

    def _apply(batch_df, epoch_id: int) -> None:
        table = SnapshotTable(table_path)  # reload manifest each epoch
        valid, dead = split_dead_letter(batch_df)
        # dead-letter side output (the reference turns decode errors into
        # events, inputs/docker-events.go:49-55; we keep them queryable)
        dead.withColumn("_dead_epoch", F.lit(int(epoch_id))).write.mode(
            "append"
        ).parquet(os.path.join(table_path, "dead_letter"))
        stats.append(apply_changes(spark, valid, table, epoch_id, cfg))

    stream = read_feed_stream(
        spark, feed_dir, max_files_per_trigger=cfg.max_files_per_trigger
    )
    writer = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    query = writer.start()
    try:
        query.awaitTermination(timeout_sec) if timeout_sec else query.awaitTermination()
    finally:
        if query.isActive:
            query.stop()
    return stats
