"""Change-data-feed reads: keys whose state changed after a version,
including tombstones — verified against the dict-replay oracle."""

from qwatch_spark.config import PipelineConfig
from qwatch_spark.datagen import gen_feed_df, gen_feed_rows
from qwatch_spark.operators.apply import replay_feed
from qwatch_spark.plans.snapshot_table import SnapshotTable
from tests.oracle import oracle_state

N = 2400
CFG = PipelineConfig(n_buckets=8)


def test_read_changes_matches_oracle_diff(spark, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    replay_feed(spark, gen_feed_df(spark, N, epoch_size=800), table, CFG)
    table = SnapshotTable(table.path)
    assert table.versions() == [0, 1, 2, 3]

    rows = gen_feed_rows(N, epoch_size=800)
    # oracle: winning event per url over all epochs vs over epoch 0 only
    full = oracle_state(rows, CFG)
    v1 = oracle_state([r for r in rows if r["epoch_hint"] == 0], CFG)
    want_changed = {
        url
        for url, row in full.items()
        if url not in v1 or v1[url]["seq"] != row["seq"]
    }

    changed = table.read_changes(spark, since_version=1)
    got = {r["url"]: r for r in changed.collect()}
    assert set(got) == want_changed
    # tombstones are visible in the feed; live values match the oracle
    for url, r in got.items():
        assert r["is_deleted"] == (full[url]["op"] == "D")
        assert r["seq"] == full[url]["seq"]

    # changes since the latest version: empty
    assert table.read_changes(spark, since_version=3).count() == 0
    # changes since creation: every key in the table
    assert table.read_changes(spark, since_version=0).count() == len(full)
