"""Streaming runner: exactly-once end-to-end (SURVEY.md §5.2 items 3-4) —
availableNow drain, resume-from-checkpoint mid-stream, and duplicate
delivery via a fresh checkpoint all converge to the oracle state."""

import pytest

from qwatch_spark.config import PipelineConfig
from qwatch_spark.datagen import gen_feed_rows, write_feed_files
from qwatch_spark.plans.snapshot_table import SnapshotTable
from qwatch_spark.streaming.runner import run_stream
from tests.oracle import oracle_final_pages

N = 2000
CFG = PipelineConfig(n_buckets=8, max_files_per_trigger=2)


def engine_state(spark, table):
    return {
        r["url"]: (
            r["warc_ts"],
            bytes(r["html"]) if r["html"] is not None else None,
            r["text"],
            r["lang"],
        )
        for r in table.read(spark).collect()
    }


@pytest.fixture()
def want():
    return oracle_final_pages(gen_feed_rows(N), CFG)


def test_stream_available_now_matches_oracle(spark, tmp_path, want):
    feed_dir = str(tmp_path / "feed")
    write_feed_files(spark, feed_dir, N, files=8)
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    stats = run_stream(
        spark, feed_dir, table.path, str(tmp_path / "ckpt"), CFG
    )
    assert len(stats) >= 2  # multiple micro-batches actually ran
    table = SnapshotTable(table.path)
    assert engine_state(spark, table) == want


def test_resume_from_checkpoint_mid_stream(spark, tmp_path, want):
    feed_dir = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    paths = write_feed_files(spark, feed_dir, N, files=8)
    # phase 1: only half the WAL segments exist
    import os

    held_back = paths[4:]
    stash = str(tmp_path / "stash")
    os.makedirs(stash)
    moved = []
    for p in held_back:
        dst = os.path.join(stash, os.path.basename(p))
        os.rename(p, dst)
        moved.append((dst, p))
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    run_stream(spark, feed_dir, table.path, ckpt, CFG)
    partial = engine_state(spark, SnapshotTable(table.path))
    assert partial != want  # genuinely mid-stream

    # phase 2: segments arrive; resume with the SAME checkpoint
    for src, dst in moved:
        os.rename(src, dst)
    run_stream(spark, feed_dir, table.path, ckpt, CFG)
    assert engine_state(spark, SnapshotTable(table.path)) == want


def test_duplicate_delivery_fresh_checkpoint_is_idempotent(spark, tmp_path, want):
    """Re-running the whole feed with a FRESH checkpoint re-delivers every
    epoch id; the manifest's applied-epoch set makes each a no-op."""
    feed_dir = str(tmp_path / "feed")
    write_feed_files(spark, feed_dir, N, files=8)
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    run_stream(spark, feed_dir, table.path, str(tmp_path / "ckpt1"), CFG)
    v = SnapshotTable(table.path).version
    stats2 = run_stream(spark, feed_dir, table.path, str(tmp_path / "ckpt2"), CFG)
    assert all(s.skipped for s in stats2)
    table = SnapshotTable(table.path)
    assert table.version == v  # no new commits
    assert engine_state(spark, table) == want
