"""IcebergTable — optional pass-through adapter (SURVEY.md §4.3 item 1).

When an Iceberg catalog is configured on the session (requires the
iceberg-spark-runtime jars, NOT present in this sandbox), MERGE/commit
semantics delegate to real `MERGE INTO` SQL; otherwise constructing the
adapter raises with a clear message and the pure-Spark SnapshotTable
backend (snapshot_table.py) is the default.

Semantics mirror SnapshotTable exactly:

- deletes are TOMBSTONES (`is_deleted = true`), never physical DELETEs —
  a physical delete would let a later-arriving OLDER update re-insert
  the key via WHEN NOT MATCHED, resurrecting the delete;
- a 'D' for an absent key inserts a tombstone row (the delete must be
  remembered even if the insert never arrived);
- the latest-wins guard `(s.warc_ts, s.seq) >= (t.warc_ts, t.seq)` makes
  the MERGE idempotent and order-insensitive.

Commit protocol (honest caveat): Iceberg cannot atomically commit two
tables from one Spark action, so the MERGE and the applied-epochs INSERT
are two commits. Order is merge-then-record: a crash between them
replays the epoch, and the replayed MERGE is a no-op by the latest-wins
guard — convergent (effectively-once), not single-commit atomic like
SnapshotTable's manifest swap. A single-commit variant needs Iceberg's
WAP/branch API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: SLF001
        return True
    except Exception:
        return False


class IcebergTable:
    """Thin MERGE INTO adapter over a catalog table. Epoch idempotence is
    kept in an `applied_epochs` side table in the same catalog."""

    def __init__(self, spark: SparkSession, identifier: str):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime jars not on the classpath; use "
                "qwatch_spark.plans.SnapshotTable (the default backend) instead"
            )
        self.spark = spark
        self.identifier = identifier
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {identifier}_epochs (epoch_id BIGINT) USING iceberg"
        )

    def has_epoch(self, epoch_id: int) -> bool:
        n = self.spark.sql(
            f"SELECT 1 FROM {self.identifier}_epochs WHERE epoch_id = {int(epoch_id)} LIMIT 1"
        ).count()
        return n > 0

    def merge_epoch(self, updates: DataFrame, epoch_id: int) -> None:
        """Latest-wins MERGE with tombstone semantics (see module doc for
        the two-commit caveat). `updates` carries payload + (op, warc_ts,
        seq), deduped to one row per url."""
        if self.has_epoch(epoch_id):
            return
        payload = [c for c in updates.columns if c != "op"]
        set_cols = ", ".join(f"t.{c} = s.{c}" for c in payload)
        ins_cols = ", ".join([*payload, "is_deleted"])
        ins_vals = ", ".join([*(f"s.{c}" for c in payload), "(s.op = 'D')"])
        updates.createOrReplaceTempView("_qwatch_updates")
        self.spark.sql(
            f"""
            MERGE INTO {self.identifier} t
            USING _qwatch_updates s
            ON t.url = s.url
            WHEN MATCHED AND (s.warc_ts, s.seq) >= (t.warc_ts, t.seq)
                 THEN UPDATE SET {set_cols}, t.is_deleted = (s.op = 'D')
            WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})
            """
        )
        self.spark.sql(
            f"INSERT INTO {self.identifier}_epochs VALUES ({int(epoch_id)})"
        )
