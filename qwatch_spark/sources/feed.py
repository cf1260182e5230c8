"""Change-feed sources — the collector stage (SURVEY.md §2.1).

The reference tails push feeds (UDP GELF datagrams,
/root/reference/inputs/docker-gelf.go:28-70; Docker engine events,
inputs/docker-events.go:32-56) with a fixed compile-time schema. Our
collector is a file-tailing source over an append-only WAL directory of
parquet segments — the lake-native equivalent — read with an explicit
schema (never inferred), batch or streaming.

Bad-record handling: the reference turns decode errors into events too
(inputs/docker-events.go:49-55). Parquet segments can't half-decode, but
semantically-invalid rows (null key, unknown op) are split into a
dead-letter DataFrame rather than dropped silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qwatch_spark.schema import EVENT_SCHEMA

VALID_OPS = ("I", "U", "D")


def read_feed(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    return spark.read.schema(schema or EVENT_SCHEMA).parquet(path)


def read_feed_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(schema or EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def split_dead_letter(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, dead_letter): rows with a null key or unknown opcode go to
    the dead-letter side instead of silently vanishing.

    op IS NULL is listed explicitly: `~op.isin(...)` evaluates to NULL
    for a null op, which would fail BOTH filters and drop the row — the
    exact silent loss dead-lettering exists to prevent (parquet reads do
    not enforce schema nullability)."""
    bad = (
        F.col("url").isNull()
        | F.col("op").isNull()
        | ~F.col("op").isin(*VALID_OPS)
    )
    return df.filter(~bad), df.filter(bad)
