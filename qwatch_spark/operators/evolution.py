"""Schema-evolution resolver — SURVEY.md §4.3 item 3.

The reference silently drops unknown incoming fields (json.Unmarshal at
/root/reference/inputs/docker-gelf.go:55) and can never evolve its
compile-time structs. north_rule requires the opposite: added / renamed
columns in the change feed are resolved against the target table schema
at apply time.

Policy:
- renamed columns: explicit rename map in pipeline config
  ({feed_name: canonical_name}) applied first — rename intent is not
  inferable from data, so it must be declared;
- added columns (in feed, not in target): widen the target schema; old
  snapshot files are read with the widened schema, so existing rows get
  NULLs (parquet fills missing columns) — no rewrite of old data;
- missing columns (in target, not in feed): filled with NULL in the
  batch; latest-wins merge then overwrites the row, which is the correct
  CDC semantic (the feed is the truth for the row's new version).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# envelope columns are not part of the payload schema
ENVELOPE_COLS = ("seq", "op", "url", "warc_ts", "source", "epoch_hint")
# payload columns the engine itself manages
MANAGED_COLS = ("url", "warc_ts", "seq")


def resolve_schema(
    batch: DataFrame,
    target_payload: T.StructType,
    rename_map: dict[str, str] | None = None,
) -> tuple[DataFrame, T.StructType]:
    """Returns (batch with canonical columns, evolved payload schema)."""
    for feed_name, canon in (rename_map or {}).items():
        if feed_name in batch.columns:
            if canon in batch.columns:
                raise ValueError(
                    f"rename {feed_name!r}->{canon!r} collides: both present in feed"
                )
            batch = batch.withColumnRenamed(feed_name, canon)

    target_names = [f.name for f in target_payload.fields]
    batch_payload_names = [
        c for c in batch.columns if c not in ENVELOPE_COLS or c in ("url", "warc_ts")
    ]

    evolved_fields = list(target_payload.fields)
    batch_schema = {f.name: f for f in batch.schema.fields}
    for name in batch_payload_names:
        if name not in target_names:
            f = batch_schema[name]
            evolved_fields.append(T.StructField(f.name, f.dataType, True))

    for f in evolved_fields:
        if f.name not in batch.columns:
            batch = batch.withColumn(f.name, F.lit(None).cast(f.dataType))

    return batch, T.StructType(evolved_fields)
