"""Watermarked windowed aggregation + applyInPandasWithState operator."""

import os

from pyspark.sql import functions as F

from qwatch_spark.datagen import gen_feed_rows, write_feed_files
from qwatch_spark.sources.feed import read_feed_stream
from qwatch_spark.streaming.stateful import track_url_changes
from qwatch_spark.streaming.windows import run_metrics_stream, windowed_op_counts

N = 1500


def test_windowed_metrics_stream_matches_batch(spark, tmp_path):
    feed_dir = str(tmp_path / "feed")
    write_feed_files(spark, feed_dir, N, files=3)
    out = str(tmp_path / "metrics")
    run_metrics_stream(
        spark, feed_dir, out, str(tmp_path / "ckpt"),
        window_size="15 minutes", watermark="0 seconds",
    )
    got = {
        (r["w_start"], r["op"]): r["n_events"]
        for r in spark.read.parquet(out).collect()
    }
    assert got, "no finalized windows emitted"
    # batch recomputation over the same data must agree on emitted windows
    from qwatch_spark.sources.feed import read_feed

    batch = read_feed(spark, feed_dir)
    want = {
        (r["w_start"], r["op"]): r["n_events"]
        for r in windowed_op_counts(batch.withWatermark("warc_ts", "0 seconds"))
        .collect()
    }
    for k, v in got.items():
        assert want[k] == v
    # append mode may hold back the last open window(s), never emit wrong ones
    assert set(got) <= set(want)


def test_stateful_tracker_accumulates_across_batches(spark, tmp_path):
    feed_dir = str(tmp_path / "feed")
    write_feed_files(spark, feed_dir, N, files=3)
    out = str(tmp_path / "state_out")
    stream = read_feed_stream(spark, feed_dir, max_files_per_trigger=1)
    q = (
        track_url_changes(stream)
        .writeStream.outputMode("update")
        .foreachBatch(
            lambda df, eid: df.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last emitted row per url = cumulative totals
    rows = spark.read.parquet(out)
    final = {
        r["url"]: (r["n_changes"], r["n_deletes"], r["last_seq"])
        for r in rows.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("url").orderBy(F.desc("n_changes"))
            ),
        ).filter(F.col("rn") == 1).collect()
    }
    want: dict[str, list] = {}
    for row in gen_feed_rows(N):
        w = want.setdefault(row["url"], [0, 0, -1])
        w[0] += 1
        w[1] += row["op"] == "D"
        w[2] = max(w[2], row["seq"])
    assert len(final) == len(want)
    for url, (nc, nd, ls) in final.items():
        assert (nc, nd, ls) == tuple(want[url]), url


def test_dead_letter_written_by_runner(spark, tmp_path):
    """Runner persists dead-letter rows alongside the table."""
    import datetime as dt

    import pyspark.sql.types as T

    from qwatch_spark.config import PipelineConfig
    from qwatch_spark.plans.snapshot_table import SnapshotTable
    from qwatch_spark.schema import EVENT_SCHEMA
    from qwatch_spark.streaming.runner import run_stream

    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    nullable = T.StructType([T.StructField(f.name, f.dataType, True) for f in EVENT_SCHEMA.fields])
    rows = [
        (1, "I", "https://ok.com/1", dt.datetime(2024, 1, 1), b"<p>x</p>", "en", "s", 0),
        (2, "X", "https://bad-op.com/1", dt.datetime(2024, 1, 1), b"", "en", "s", 0),
    ]
    spark.createDataFrame(rows, nullable).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "seg")
    )
    import glob as g
    import shutil

    shutil.move(g.glob(str(tmp_path / "seg" / "part-*.parquet"))[0], f"{feed_dir}/f0.parquet")
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=4)
    run_stream(spark, feed_dir, table.path, str(tmp_path / "ckpt"), PipelineConfig(n_buckets=4))
    dead = spark.read.parquet(os.path.join(table.path, "dead_letter")).collect()
    assert [r["op"] for r in dead] == ["X"]
    table = SnapshotTable(table.path)  # reload manifest committed by the runner
    assert {r["url"] for r in table.read(spark).collect()} == {"https://ok.com/1"}


def test_json_feed_format_end_to_end_with_decode_dead_letter(spark, tmp_path):
    """A JSONL feed (the reference's GELF push events are JSON) streams
    to the same final state as the identical events in parquet; binary
    html rides as base64; malformed lines and invalid ops land in the
    dead-letter sink, the decode failures carrying their raw line."""
    import datetime as dt
    import os

    from pyspark.sql import types as T

    from qwatch_spark.config import PipelineConfig
    from qwatch_spark.plans.snapshot_table import SnapshotTable
    from qwatch_spark.schema import EVENT_SCHEMA
    from qwatch_spark.streaming import run_stream

    nullable = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in EVENT_SCHEMA.fields]
    )
    rows = [
        (1, "I", "https://ok.com/1", dt.datetime(2024, 1, 1), b"<p>one</p>", "en", "s", 0),
        (2, "U", "https://ok.com/2", dt.datetime(2024, 1, 2), b"<p>two</p>", "en", "s", 0),
        (3, "U", "https://ok.com/1", dt.datetime(2024, 1, 3), b"<p>one v2</p>", "en", "s", 0),
        (4, "X", "https://ok.com/3", dt.datetime(2024, 1, 4), b"<p>bad op</p>", "en", "s", 0),
        (5, "D", "https://ok.com/2", dt.datetime(2024, 1, 5), None, "en", "s", 0),
    ]
    df = spark.createDataFrame(rows, nullable).drop("epoch_hint").coalesce(1)

    jdir, pdir = str(tmp_path / "jfeed"), str(tmp_path / "pfeed")
    df.write.json(jdir)  # binary -> base64
    df.write.parquet(pdir)
    # a malformed line in its own segment file
    with open(os.path.join(jdir, "part-corrupt.json"), "w") as fh:
        fh.write('{"seq": 6, "op": "U", "url": "https://ok.com/4", not json\n')

    cfg = PipelineConfig(n_buckets=4, feed_format="json")
    jt = SnapshotTable.create(str(tmp_path / "jt"), n_buckets=4)
    run_stream(spark, jdir, jt.path, str(tmp_path / "jckpt"), cfg)
    pt = SnapshotTable.create(str(tmp_path / "pt"), n_buckets=4)
    run_stream(spark, pdir, pt.path, str(tmp_path / "pckpt"), PipelineConfig(n_buckets=4))

    def snap(t):
        return sorted(
            (r["url"], r["warc_ts"], r["seq"], r["is_deleted"], bytes(r["html"] or b""))
            for r in SnapshotTable(t.path).read_buckets(
                spark, include_deleted=True
            ).collect()
        )

    assert snap(jt) == snap(pt)  # byte-identical incl. base64'd html
    dead = spark.read.parquet(os.path.join(jt.path, "dead_letter")).collect()
    ops = sorted((r["op"] or "?") for r in dead)
    assert ops == ["?", "X"]  # decode failure (null op) + invalid op
    raw = [r["_corrupt"] for r in dead if r["_corrupt"] is not None]
    assert len(raw) == 1 and "not json" in raw[0]

    with __import__("pytest").raises(ValueError, match="feed_format"):
        PipelineConfig(feed_format="csv")
