"""Schema evolution at apply time (SURVEY.md §5.2 item 5): added columns
widen the table (old rows null-filled, no rewrite); renamed feed columns
resolve via the declared rename map."""

from pyspark.sql import functions as F

from qwatch_spark.config import PipelineConfig
from qwatch_spark.datagen import gen_feed_df, gen_feed_rows
from qwatch_spark.operators.apply import apply_changes
from qwatch_spark.plans.snapshot_table import SnapshotTable
from tests.oracle import oracle_final_pages

N = 1200
CFG = PipelineConfig(n_buckets=8)


def test_added_column_widens_schema(spark, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    # epoch 0: base schema
    base = gen_feed_df(spark, N // 2).drop("epoch_hint")
    apply_changes(spark, base, table, 0, CFG)
    assert "title" not in [f.name for f in table.payload_schema.fields]

    # epoch 1: feed gains `title`
    titled = (
        gen_feed_df(spark, N, add_title=True)
        .filter(F.col("seq") >= N // 2)
        .drop("epoch_hint")
    )
    apply_changes(spark, titled, table, 1, CFG)
    names = [f.name for f in table.payload_schema.fields]
    assert "title" in names

    out = table.read(spark)
    assert "title" in out.columns
    rows = {r["url"]: r for r in out.collect()}
    # keys last written by epoch-0 events read back as NULL title
    # (old files null-filled); keys won by titled events carry it
    assert any(r["title"] is not None for r in rows.values())
    assert any(r["title"] is None for r in rows.values())
    # title content is the deterministic generator value where present
    for r in rows.values():
        if r["title"] is not None:
            assert r["title"].startswith("Page ")


def test_renamed_column_resolved_by_rename_map(spark, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    cfg = PipelineConfig(n_buckets=8, rename_map={"language": "lang"})
    feed = gen_feed_df(spark, N, rename_lang=True).drop("epoch_hint")
    apply_changes(spark, feed, table, 0, cfg)
    got = {
        r["url"]: (r["warc_ts"], bytes(r["html"]), r["text"], r["lang"])
        for r in table.read(spark).collect()
    }
    # identical to replaying the un-renamed feed with default config
    want = oracle_final_pages(gen_feed_rows(N), PipelineConfig(n_buckets=8))
    assert got == want
    # and `language` did NOT leak into the schema as an added column
    assert "language" not in [f.name for f in table.payload_schema.fields]


def test_unmapped_rename_without_map_is_treated_as_add(spark, tmp_path):
    """Without a rename map the engine must not guess: `language` becomes a
    new column and `lang` is null — visible, not silent."""
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    cfg = PipelineConfig(n_buckets=8, rules=("valid_url", "extract_text"))
    feed = gen_feed_df(spark, 200, rename_lang=True).drop("epoch_hint")
    apply_changes(spark, feed, table, 0, cfg)
    names = [f.name for f in table.payload_schema.fields]
    assert "language" in names
    live = table.read(spark)
    assert live.filter(F.col("lang").isNotNull()).count() == 0


def test_evolution_is_replay_invariant(spark, tmp_path):
    """Schema evolution mid-replay: whichever epoch first carries the new
    column, and however events are partitioned around it, the final table
    equals applying everything in one epoch with the widened schema."""
    from qwatch_spark.config import PipelineConfig
    from qwatch_spark.datagen import gen_feed_df
    from qwatch_spark.operators.apply import apply_changes
    from qwatch_spark.plans.snapshot_table import SnapshotTable
    from pyspark.sql import functions as F

    cfg = PipelineConfig(n_buckets=4)
    base = gen_feed_df(spark, 300).drop("epoch_hint")
    widened = base.withColumn(
        "title", F.when(F.col("seq") % 3 == 0, F.concat(F.lit("t"), F.col("seq")))
    )

    def final_state(table):
        return sorted(
            (r["url"], r["warc_ts"], r["text"], r["title"])
            for r in table.read(spark).collect()
        )

    # baseline: one epoch, already-widened feed
    t0 = SnapshotTable.create(str(tmp_path / "one"), n_buckets=4)
    apply_changes(spark, widened, t0, 0, cfg)
    want = final_state(t0)

    # replay: narrow epoch first (schema evolves on the SECOND epoch),
    # split by seq parity so updates for one url cross the boundary
    t1 = SnapshotTable.create(str(tmp_path / "multi"), n_buckets=4)
    apply_changes(spark, base.filter(F.col("seq") % 2 == 0), t1, 0, cfg)
    assert "title" not in [f.name for f in t1.payload_schema.fields]
    apply_changes(
        spark, widened.filter(F.col("seq") % 2 == 1), t1, 1, cfg
    )
    t1 = SnapshotTable(t1.path)
    assert "title" in [f.name for f in t1.payload_schema.fields]
    got = final_state(t1)
    # rows whose winner came from the narrow epoch have NULL title in the
    # replayed table but a value in the widened baseline — the feed is
    # the truth for each row's version, so compare modulo that: every
    # (url, warc_ts, text) matches, and titles match wherever the winning
    # event carried the column (odd seq)
    assert [(u, w, x) for u, w, x, _ in got] == [(u, w, x) for u, w, x, _ in want]
    got_t = {u: t for u, _, _, t in got}
    for u, w, x, t in want:
        r = got_t[u]
        if r is not None:
            assert r == t
