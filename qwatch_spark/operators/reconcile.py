"""Snapshot reconciliation — the inventory path (SURVEY.md §3.3).

The reference's docker-api input polls full listings on a tick cadence
and re-MERGEs every row, stamping ``last_seen``
(/root/reference/inputs/docker-api.go:34-58 → outputs/neo4j.go §2.8 K4).
The lakehouse equivalent: a periodic batch job that treats an
authoritative full snapshot as a change set against the target —
full-load + incremental through ONE apply operator:

- present in snapshot            → upsert ('U') stamped with the
                                   snapshot's observation time;
- present in target, absent from
  snapshot (and live)            → delete ('D') tombstone, iff
                                   `delete_missing` (the reference never
                                   deletes on inventory; we make it opt-in).

Reuses apply_changes verbatim, so reconciliation inherits exactly-once,
evolution, lineage, and idempotence for free — the same reuse the
reference gets by funnelling both streams into the same MERGE handlers
(outputs/neo4j.go:474-506).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qwatch_spark.config import PipelineConfig
from qwatch_spark.operators.apply import ApplyStats, apply_changes
from qwatch_spark.plans.snapshot_table import SnapshotTable


def snapshot_to_changes(
    snapshot: DataFrame,
    table: SnapshotTable,
    spark: SparkSession,
    observed_at: dt.datetime,
    delete_missing: bool = False,
    seq_base: int = 0,
) -> DataFrame:
    """Build a change feed from a full snapshot (url + payload columns).

    seq is synthesized deterministically above `seq_base` so the
    (warc_ts, seq) total order stays authoritative vs the event stream.
    """
    ts = F.lit(observed_at).cast("timestamp")
    upserts = snapshot.select(
        (F.lit(seq_base) + F.pmod(F.xxhash64("url"), F.lit(1_000_000_000)) + 1_000_000_000).alias("seq"),
        F.lit("U").alias("op"),
        "url",
        ts.alias("warc_ts"),
        *[c for c in snapshot.columns if c not in ("url", "warc_ts", "seq", "op")],
    )
    if not delete_missing:
        return upserts

    live = table.read(spark).select("url")
    missing = live.join(snapshot.select("url"), "url", "left_anti")
    payload_cols = [c for c in upserts.columns if c not in ("seq", "op", "url", "warc_ts")]
    deletes = missing.select(
        (F.lit(seq_base) + F.pmod(F.xxhash64("url"), F.lit(1_000_000_000)) + 1_000_000_000).alias("seq"),
        F.lit("D").alias("op"),
        "url",
        ts.alias("warc_ts"),
        *[F.lit(None).alias(c) for c in payload_cols],
    )
    return upserts.unionByName(deletes)


def reconcile_snapshot(
    spark: SparkSession,
    snapshot: DataFrame,
    table: SnapshotTable,
    epoch_id: int,
    cfg: PipelineConfig | None = None,
    observed_at: dt.datetime | None = None,
    delete_missing: bool = False,
) -> ApplyStats:
    observed_at = observed_at or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    changes = snapshot_to_changes(
        snapshot, table, spark, observed_at, delete_missing
    )
    return apply_changes(spark, changes, table, epoch_id, cfg)
