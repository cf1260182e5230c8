"""SnapshotTable — an Iceberg-style keyed lake table in pure Spark + JSON
manifests (no Delta/Iceberg jars in this environment; SURVEY.md §4.3 item 1).

Semantics it provides (the reference gets these from Neo4j MERGE +
unique constraints, /root/reference/outputs/neo4j.go:256-295, 342-343 —
but at-most-once and one network round-trip per event):

- **keyed upsert**: exactly one current row per ``url``;
- **exactly-once**: commits are epoch-tagged; re-applying an epoch is a
  no-op (idempotence, the contract of outputs/neo4j.go:259-262, made
  transactional);
- **atomicity**: data files are written to a new immutable version
  directory first, then a single ``manifest.json`` is swapped via
  write-tmp + ``os.replace`` (atomic on POSIX). A crash mid-write
  leaves orphan data files and an unchanged manifest — state intact.

Physical layout (scale design):

- rows are hash-bucketed by ``pmod(xxhash64(url), n_buckets)``; an epoch
  rewrites ONLY the buckets its keys touch (partition-level copy-on-write),
  so apply cost scales with the batch's key spread, not table size. At
  100 TB you'd set n_buckets so a bucket is ~0.5-1 GB (~100k buckets);
  the manifest (bucket → version int) stays tiny.
- the bucket column is derived from ``url`` (never stored), so readers
  can prune to buckets of interest and co-partition merges without extra
  storage.
- old version directories are immutable → time-travel-able until
  ``vacuum()``.

Layout on disk::

    table/
      manifest.json                 # {version, n_buckets, schema,
                                    #  applied_epochs, buckets: {b: v}}
      data/v=<version>/b=<bucket>/  # parquet, written via partitionBy("b")
      metrics/                      # per-epoch per-bucket lineage (append)
      commit_log/                   # one row per committed epoch (append)
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qwatch_spark.schema import PAGE_SCHEMA, schema_from_json

MANIFEST = "manifest.json"

# engine bookkeeping columns stored alongside the payload in every file
BOOKKEEPING_FIELDS = [
    T.StructField("seq", T.LongType(), True),
    T.StructField("is_deleted", T.BooleanType(), True),
    T.StructField("last_op", T.StringType(), True),
    T.StructField("last_epoch", T.LongType(), True),
]


def bucket_expr(n_buckets: int, url_col: str = "url") -> Column:
    return F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_buckets)).cast("int")


def full_schema(payload: T.StructType) -> T.StructType:
    return T.StructType(list(payload.fields) + BOOKKEEPING_FIELDS)


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path
        self._manifest = self._load_manifest()

    # ---------- creation / manifest ----------

    @classmethod
    def create(
        cls,
        path: str,
        payload_schema: T.StructType | None = None,
        n_buckets: int = 64,
        overwrite: bool = False,
    ) -> "SnapshotTable":
        payload_schema = payload_schema or PAGE_SCHEMA
        if os.path.exists(os.path.join(path, MANIFEST)):
            if not overwrite:
                return cls(path)
            shutil.rmtree(path)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        manifest = {
            "version": 0,
            "n_buckets": n_buckets,
            "schema": payload_schema.json(),
            "applied_epochs": [],
            "buckets": {},
        }
        cls._write_manifest(path, manifest)
        return cls(path)

    def _load_manifest(self) -> dict:
        with open(os.path.join(self.path, MANIFEST)) as fh:
            return json.load(fh)

    @staticmethod
    def _write_manifest(path: str, manifest: dict) -> None:
        tmp = os.path.join(path, MANIFEST + ".tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(path, MANIFEST))  # atomic commit point

    # ---------- properties ----------

    @property
    def n_buckets(self) -> int:
        return self._manifest["n_buckets"]

    @property
    def payload_schema(self) -> T.StructType:
        return schema_from_json(self._manifest["schema"])

    @property
    def version(self) -> int:
        return self._manifest["version"]

    def has_epoch(self, epoch_id: int) -> bool:
        return int(epoch_id) in set(self._manifest["applied_epochs"])

    # ---------- reads ----------

    def _bucket_paths(self, buckets: list[int] | None = None) -> list[str]:
        mapping = self._manifest["buckets"]
        items = (
            mapping.items()
            if buckets is None
            else ((str(b), mapping[str(b)]) for b in buckets if str(b) in mapping)
        )
        return [
            os.path.join(self.path, "data", f"v={v}", f"b={b}") for b, v in items
        ]

    def read_buckets(
        self,
        spark: SparkSession,
        buckets: list[int] | None = None,
        payload_schema: T.StructType | None = None,
        include_deleted: bool = True,
    ) -> DataFrame:
        """Read current state of given buckets (all if None) with the given
        payload schema — old files missing newly-evolved columns are
        null-filled by the parquet reader (schema evolution without
        rewriting history)."""
        schema = full_schema(payload_schema or self.payload_schema)
        paths = self._bucket_paths(buckets)
        if not paths:
            df = spark.createDataFrame([], schema)
        else:
            df = spark.read.schema(schema).parquet(*paths)
        if not include_deleted:
            df = df.filter(~F.col("is_deleted"))
        return df

    def read(self, spark: SparkSession, include_deleted: bool = False) -> DataFrame:
        """Current table state (live rows, payload columns only)."""
        df = self.read_buckets(spark, include_deleted=include_deleted)
        return df.select(*[f.name for f in self.payload_schema.fields])

    # ---------- commit ----------

    def commit_epoch(
        self,
        merged: DataFrame,
        touched_buckets: list[int],
        epoch_id: int,
        evolved_payload: T.StructType,
    ) -> int:
        """Write merged rows of the touched buckets as a new version dir,
        then atomically swap the manifest. Returns the new version."""
        if self.has_epoch(epoch_id):
            return self.version  # duplicate delivery → no-op
        new_version = self.version + 1
        out = os.path.join(self.path, "data", f"v={new_version}")
        cols = [f.name for f in full_schema(evolved_payload).fields]
        (
            merged.withColumn("b", bucket_expr(self.n_buckets))
            .select("b", *cols)
            # co-locate each bucket in one task → exactly one file per
            # bucket per version (bucket size is governed by n_buckets,
            # chosen so a bucket ≈ one healthy parquet file at target SF)
            .repartition(max(len(touched_buckets), 1), "b")
            .write.mode("overwrite")
            .partitionBy("b")
            .parquet(out)
        )
        manifest = dict(self._manifest)
        manifest["version"] = new_version
        manifest["schema"] = evolved_payload.json()
        manifest["applied_epochs"] = sorted(
            set(manifest["applied_epochs"]) | {int(epoch_id)}
        )
        buckets = dict(manifest["buckets"])
        for b in touched_buckets:
            buckets[str(int(b))] = new_version
        manifest["buckets"] = buckets
        self._write_manifest(self.path, manifest)
        self._manifest = manifest
        return new_version

    def commit_empty_epoch(self, epoch_id: int) -> None:
        """Record an epoch that produced no changes (all rows gated) —
        manifest-only: no version bump, no data files."""
        if self.has_epoch(epoch_id):
            return
        manifest = dict(self._manifest)
        manifest["applied_epochs"] = sorted(
            set(manifest["applied_epochs"]) | {int(epoch_id)}
        )
        self._write_manifest(self.path, manifest)
        self._manifest = manifest

    # ---------- lineage / metrics ----------

    def append_metrics(self, metrics_df: DataFrame) -> None:
        metrics_df.write.mode("append").parquet(os.path.join(self.path, "metrics"))

    def append_commit_log(self, spark: SparkSession, row: dict) -> None:
        from qwatch_spark.schema import COMMIT_LOG_SCHEMA

        spark.createDataFrame([row], COMMIT_LOG_SCHEMA).write.mode("append").parquet(
            os.path.join(self.path, "commit_log")
        )

    def read_metrics(self, spark: SparkSession) -> DataFrame:
        from qwatch_spark.schema import METRICS_SCHEMA

        p = os.path.join(self.path, "metrics")
        if not os.path.exists(p):
            return spark.createDataFrame([], METRICS_SCHEMA)
        return spark.read.parquet(p)

    def read_commit_log(self, spark: SparkSession) -> DataFrame:
        from qwatch_spark.schema import COMMIT_LOG_SCHEMA

        p = os.path.join(self.path, "commit_log")
        if not os.path.exists(p):
            return spark.createDataFrame([], COMMIT_LOG_SCHEMA)
        return spark.read.parquet(p)

    # ---------- maintenance ----------

    def vacuum(self) -> list[str]:
        """Delete version dirs no longer referenced by any bucket pointer.
        Safe because the manifest swap is the only commit point."""
        live = {int(v) for v in self._manifest["buckets"].values()}
        removed = []
        data = os.path.join(self.path, "data")
        for entry in os.listdir(data):
            if not entry.startswith("v="):
                continue
            v = int(entry[2:])
            if v not in live:
                shutil.rmtree(os.path.join(data, entry))
                removed.append(entry)
        return removed
