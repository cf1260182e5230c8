"""qwatch_spark — a PySpark-native CDC / incremental-ingest engine.

Brand-new engine with the query/data-processing capabilities of
qnib/qwatch (a Go collector→filter→output CDC apply pipeline; see
SURVEY.md), re-expressed Spark-first:

- change feed (binlog/WAL-style insert/update/delete events keyed by
  ``url``) → vectorized filter rules → dedup-to-latest → exactly-once
  MERGE into a bucketed snapshot lake table (Iceberg-style manifest
  commits, no external jars required);
- schema evolution resolved at apply time;
- skew-aware salted aggregation before the key-partitioned upsert;
- per-epoch, per-bucket lineage + throughput metrics;
- Structured Streaming runner with checkpointed resume.
"""

__version__ = "0.1.0"
