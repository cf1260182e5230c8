"""Three-way equivalence of the delta commit's per-bucket stats
harvest (r7 verdict #8): `task` (observe() metrics fused into the
write job — zero post-write I/O), `footer` (driver-side parquet-footer
metadata through the datafs seam), and `job` (one narrow aggregate over
the written files — the always-correct fallback). All three must yield
byte-identical commits: same zone maps, same lineage metrics, same
rows estimate, same final table state — stats are an optimization
axis, never a semantics axis."""

import pytest

from qwatch_spark.config import PipelineConfig
from qwatch_spark.datagen import gen_feed_df
from qwatch_spark.operators import apply as apply_mod
from qwatch_spark.operators.apply import apply_changes
from qwatch_spark.plans.snapshot_table import SnapshotTable

N = 1200
N_EPOCHS = 3
MODES = ("task", "footer", "job")


def _apply_all(spark, tmp_path, mode, feed, epochs, counter, **cfg_kw):
    cfg = PipelineConfig(
        n_buckets=8, write_mode="delta", commit_stats_mode=mode, **cfg_kw
    )
    path = str(tmp_path / f"t_{mode}")
    table = SnapshotTable.create(path, n_buckets=8)
    for e in epochs:
        batch = feed.filter(feed.epoch_hint == e).drop("epoch_hint")
        apply_changes(spark, batch, table, e, cfg)
    return SnapshotTable(path), counter["footer"]


def _state(spark, table):
    return sorted(
        (r["url"], r["warc_ts"], r["text"])
        for r in table.read(spark).collect()
    )


def _metrics(spark, table):
    return sorted(
        tuple(r)
        for r in table.read_metrics(spark)
        .select("epoch_id", "bucket", "n_insert", "n_update", "n_delete",
                "min_seq", "max_seq")
        .collect()
    )


def _zmaps(table):
    """Per-bucket zone-map ranges in DELTA ORDER — version tokens are
    writer-unique random strings, so equivalence is over each bucket's
    ordered chain of ranges, not the token names."""
    m = table._manifest
    out = {}
    for b, e in table._buckets_of(m).items():
        ent = table._bucket_entry(e)
        z = ent["z"]
        out[b] = [z.get(tok) for tok in ent["deltas"]]
    return out, m.get("rows_est")


def test_task_footer_job_stats_equivalence(spark, tmp_path, monkeypatch):
    feed = gen_feed_df(spark, N, epoch_size=N // N_EPOCHS)
    epochs = sorted(
        r[0] for r in feed.select("epoch_hint").distinct().collect()
    )
    counter = {"footer": 0}
    real_footer = apply_mod._delta_footer_stats

    def counting_footer(*a, **kw):
        counter["footer"] += 1
        return real_footer(*a, **kw)

    monkeypatch.setattr(apply_mod, "_delta_footer_stats", counting_footer)

    results = {}
    for mode in MODES:
        counter["footer"] = 0
        table, footer_calls = _apply_all(
            spark, tmp_path, mode, feed, epochs, counter
        )
        results[mode] = (table, footer_calls)

    # harvest-path accounting: task and job modes never touch footers;
    # footer mode reads them once per epoch
    assert results["task"][1] == 0, "task mode read footers"
    assert results["job"][1] == 0, "job mode read footers"
    assert results["footer"][1] == len(epochs)

    # equivalence: state, lineage metrics, zone maps, rows estimate
    base = results["task"][0]
    want_state = _state(spark, base)
    want_metrics = _metrics(spark, base)
    want_z, want_rows = _zmaps(base)
    assert want_metrics, "no lineage recorded"
    assert any(z for z in want_z.values()), "no zone maps recorded"
    for mode in ("footer", "job"):
        t = results[mode][0]
        assert _state(spark, t) == want_state, mode
        assert _metrics(spark, t) == want_metrics, mode
        z, rows = _zmaps(t)
        assert z == want_z, mode
        assert rows == want_rows, mode


def test_auto_mode_is_footer_never_task(spark, tmp_path, monkeypatch):
    """auto = footer: the task-side observe harvest was built, proven
    equivalent, and MEASURED SLOWER in every regime (its cost scales
    rows × buckets; footers scale with files — bench_commit_stats task
    arm), so the default must never pick it."""
    feed = gen_feed_df(spark, 400, epoch_size=400)
    counter = {"footer": 0}
    real_footer = apply_mod._delta_footer_stats

    def counting_footer(*a, **kw):
        counter["footer"] += 1
        return real_footer(*a, **kw)

    monkeypatch.setattr(apply_mod, "_delta_footer_stats", counting_footer)

    _t, calls = _apply_all(spark, tmp_path, "auto", feed, [0], counter)
    assert calls == 1, "auto must harvest from footers"


def test_commit_stats_mode_validated():
    with pytest.raises(ValueError, match="commit_stats_mode"):
        PipelineConfig(commit_stats_mode="psychic")
