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


def test_read_changes_prunes_untouched_buckets(spark, tmp_path):
    """CDF reads must scan only buckets whose manifest pointers changed
    since the base version — cost scales with the touched key-spread."""
    import datetime as dt

    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    replay_feed(spark, gen_feed_df(spark, N, epoch_size=800), table, CFG)
    table = SnapshotTable(table.path)
    base_version = table.version

    # one more epoch touching a single key → a single bucket
    one = spark.createDataFrame(
        [(10**9, "U", "https://solo.ex/x", dt.datetime(2030, 1, 1), b"<p>z</p>", "en", "s")],
        "seq long, op string, url string, warc_ts timestamp, html binary, lang string, source string",
    )
    from qwatch_spark.operators.apply import apply_changes

    apply_changes(spark, one, table, 9999, CFG)

    changed = table.read_changes(spark, since_version=base_version)
    rows = changed.collect()
    assert [r["url"] for r in rows] == ["https://solo.ex/x"]
    # physical pruning: the scan reads at most one bucket directory
    buckets_read = {f.split("/b=")[1].split("/")[0] for f in changed.inputFiles()}
    assert len(buckets_read) <= 1
