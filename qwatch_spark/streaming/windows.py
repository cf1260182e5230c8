"""Watermarked windowed streaming aggregation — §2.9 late-data semantics.

The reference has no windows and no late-data story (events applied on
arrival; a late event regresses last_seen via time.Now(),
/root/reference/outputs/neo4j.go:268). Here: event-time tumbling windows
with a watermark bound the aggregation state; late events inside the
watermark still land in their window, older ones are dropped — the
standard Structured Streaming contract, used for the engine's
throughput/ops metrics stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qwatch_spark.sources.feed import read_feed_stream


def windowed_op_counts(
    events: DataFrame,
    window_size: str = "15 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Per-window, per-op event counts with a watermark (streamable)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_size).alias("w"), "op")
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("url").alias("n_urls_approx"),
        )
        .select(F.col("w.start").alias("w_start"), "op", "n_events", "n_urls_approx")
    )


def run_metrics_stream(
    spark: SparkSession,
    feed_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_size: str = "15 minutes",
    watermark: str = "30 minutes",
) -> None:
    """Tail the feed, emit windowed op-count metrics to parquet
    (append mode: a window is emitted once its watermark passes;
    availableNow drains and finalizes what it can)."""
    stream = read_feed_stream(spark, feed_dir)
    agg = windowed_op_counts(stream, window_size, watermark)
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
