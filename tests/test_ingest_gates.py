"""Training-data gates wired into the CDC ingest path: planted exact
duplicates and low-quality pages must never reach the table, the lang
fallback must fill missing language tags, and the gates must preserve
CDC semantics (deletes pass, dedup still latest-wins)."""

import datetime as dt

from pyspark.sql import functions as F

from qwatch_spark.config import PipelineConfig
from qwatch_spark.operators.apply import apply_changes
from qwatch_spark.plans.snapshot_table import SnapshotTable

TS = lambda d: dt.datetime(2024, 1, d)  # noqa: E731

GOOD = (
    b"<html><body>"
    + b"the quick brown fox jumps over the lazy dog and runs far away " * 4
    + b"</body></html>"
)
GOOD2 = (
    b"<html><body>"
    + b"a different page of words and the finest content of the web " * 4
    + b"</body></html>"
)
LOWQ = b"<html><body>!!! ### $$$ %%% ^^^ &&& *** ((( ))) @@@</body></html>"

FEED = "seq long, op string, url string, warc_ts timestamp, html binary, lang string, source string"

CFG = PipelineConfig(
    n_buckets=4,
    rules=(
        "valid_url",
        "lang_gate",
        "extract_text",
        "lang_fallback",
        "exact_dup_gate",
        "quality_gate",
    ),
)


def apply(spark, table, rows, epoch=0):
    df = spark.createDataFrame(rows, FEED)
    return apply_changes(spark, df, table, epoch, CFG)


def test_exact_dup_gate_keeps_one_canonical_copy(spark, tmp_path):
    t = SnapshotTable.create(str(tmp_path / "t"), n_buckets=4)
    rows = [
        (1, "I", "https://a.ex/1", TS(1), GOOD, "en", "s"),
        (2, "I", "https://a.ex/2", TS(2), GOOD, "en", "s"),  # exact dup
        (3, "I", "https://a.ex/3", TS(3), GOOD2, "en", "s"),
    ]
    apply(spark, t, rows)
    live = t.read(spark).collect()
    assert sorted(r["url"] for r in live) == ["https://a.ex/1", "https://a.ex/3"]
    # canonical = earliest (warc_ts, seq, url)
    assert {r["url"]: r["warc_ts"] for r in live}["https://a.ex/1"] == TS(1)


def test_exact_dup_gate_dedups_across_epochs(spark, tmp_path):
    """The table-aware gate: identical content arriving in a LATER epoch
    is anti-joined against the table's persisted fingerprints — the
    per-batch gate alone could never catch this."""
    t = SnapshotTable.create(str(tmp_path / "t"), n_buckets=4)
    apply(spark, t, [(1, "I", "https://a.ex/1", TS(1), GOOD, "en", "s")], 0)
    apply(spark, t, [(2, "I", "https://a.ex/2", TS(2), GOOD, "en", "s")], 1)
    apply(spark, t, [(3, "I", "https://a.ex/3", TS(3), GOOD2, "en", "s")], 2)
    live = sorted(r["url"] for r in t.read(spark).collect())
    assert live == ["https://a.ex/1", "https://a.ex/3"]


def test_exact_dup_gate_replay_invariant_for_inorder_feed(spark, tmp_path):
    """An in-order feed (warc_ts agrees with seq) replayed under three
    different epochings must converge to the identical final table."""
    rows = [
        (1, "I", "https://a.ex/1", TS(1), GOOD, "en", "s"),
        (2, "I", "https://a.ex/2", TS(2), GOOD, "en", "s"),   # dup of 1
        (3, "I", "https://a.ex/3", TS(3), GOOD2, "en", "s"),
        (4, "U", "https://a.ex/3", TS(4), GOOD2, "en", "s"),  # self-refresh
        (5, "I", "https://a.ex/4", TS(5), GOOD, "en", "s"),   # dup of 1
        (6, "D", "https://a.ex/2", TS(6), None, None, "s"),
    ]

    def replay(splits):
        t = SnapshotTable.create(
            str(tmp_path / f"t{len(splits)}_{splits[0]}"), n_buckets=4
        )
        lo = 0
        for e, hi in enumerate(splits):
            apply(spark, t, rows[lo:hi], e)
            lo = hi
        return sorted(
            (r["url"], r["warc_ts"]) for r in t.read(spark).collect()
        )

    one = replay([6])
    twos = replay([3, 6])
    each = replay([1, 2, 3, 4, 5, 6])
    assert one == twos == each


def test_exact_dup_gate_live_fingerprints_unique_under_jitter(spark, tmp_path):
    """Out-of-order arrivals: the canonical copy may differ by epoching
    (documented), but the hard invariant holds at every commit point —
    at most one LIVE row per content fingerprint."""
    from pyspark.sql import functions as F

    rows = [  # warc_ts deliberately disagrees with seq order
        (1, "I", "https://a.ex/1", TS(9), GOOD, "en", "s"),
        (2, "I", "https://a.ex/2", TS(2), GOOD, "en", "s"),
        (3, "I", "https://a.ex/3", TS(7), GOOD2, "en", "s"),
        (4, "I", "https://a.ex/4", TS(1), GOOD, "en", "s"),
        (5, "U", "https://a.ex/3", TS(3), GOOD2, "en", "s"),
    ]
    t = SnapshotTable.create(str(tmp_path / "t"), n_buckets=4)
    for e, row in enumerate(rows):
        apply(spark, t, [row], e)
        live = t.read_buckets(spark, include_deleted=False)
        fps = live.groupBy("_fp").count().filter(F.col("count") > 1).count()
        assert fps == 0, f"duplicate live fingerprints after epoch {e}"
    assert t.read(spark).count() == 2  # one row per distinct content


def test_quality_gate_excludes_low_quality_pages(spark, tmp_path):
    t = SnapshotTable.create(str(tmp_path / "t"), n_buckets=4)
    rows = [
        (1, "I", "https://a.ex/good", TS(1), GOOD, "en", "s"),
        (2, "I", "https://a.ex/junk", TS(1), LOWQ, "en", "s"),
    ]
    apply(spark, t, rows)
    assert [r["url"] for r in t.read(spark).collect()] == ["https://a.ex/good"]


def test_quality_gate_skips_update_but_keeps_prior_state(spark, tmp_path):
    t = SnapshotTable.create(str(tmp_path / "t"), n_buckets=4)
    apply(spark, t, [(1, "I", "https://a.ex/p", TS(1), GOOD, "en", "s")], 0)
    # later low-quality version is rejected; the good version survives
    apply(spark, t, [(2, "U", "https://a.ex/p", TS(5), LOWQ, "en", "s")], 1)
    live = t.read(spark).collect()
    assert len(live) == 1 and live[0]["warc_ts"] == TS(1)
    # a delete still passes every content gate
    apply(spark, t, [(3, "D", "https://a.ex/p", TS(6), None, None, "s")], 2)
    assert t.read(spark).count() == 0


def test_lang_fallback_fills_missing_tags(spark, tmp_path):
    t = SnapshotTable.create(str(tmp_path / "t"), n_buckets=4)
    cfg = PipelineConfig(
        n_buckets=4, rules=("extract_text", "lang_fallback"), keep_langs=("en",)
    )
    rows = [
        (1, "I", "https://a.ex/1", TS(1), GOOD, None, "s"),  # en markers
        (2, "I", "https://a.ex/2", TS(1), GOOD2, "und", "s"),
        (3, "I", "https://a.ex/3", TS(1), GOOD, "de", "s"),  # explicit wins
    ]
    df = spark.createDataFrame(rows, FEED)
    apply_changes(spark, df, t, 0, cfg)
    langs = {r["url"]: r["lang"] for r in t.read(spark).collect()}
    assert langs == {
        "https://a.ex/1": "en",
        "https://a.ex/2": "en",
        "https://a.ex/3": "de",
    }


def test_gates_are_idempotent_across_redelivery(spark, tmp_path):
    t = SnapshotTable.create(str(tmp_path / "t"), n_buckets=4)
    rows = [
        (1, "I", "https://a.ex/1", TS(1), GOOD, "en", "s"),
        (2, "I", "https://a.ex/2", TS(2), GOOD, "en", "s"),
    ]
    apply(spark, t, rows, 0)
    state1 = sorted((r["url"], r["warc_ts"]) for r in t.read(spark).collect())
    st = apply(spark, t, rows, 0)
    assert st.skipped
    state2 = sorted((r["url"], r["warc_ts"]) for r in t.read(spark).collect())
    assert state1 == state2


def test_post_gates_run_after_dedup_once_per_key(spark, tmp_path):
    """Plan shape: the exact-dup fingerprint agg must consume the deduped
    per-key rows (one max_by agg upstream), not the raw feed."""
    from qwatch_spark.operators.dedup import latest_wins
    from qwatch_spark.operators.rules import apply_rules

    rows = [
        (1, "I", "https://a.ex/1", TS(1), GOOD, "en", "s"),
        (2, "U", "https://a.ex/1", TS(2), GOOD, "en", "s"),
        (3, "I", "https://a.ex/2", TS(1), GOOD2, "en", "s"),
    ]
    df = spark.createDataFrame(rows, FEED)
    deduped = latest_wins(df, key="url", order=("warc_ts", "seq"))
    projected = apply_rules(deduped, CFG, kind="project")
    gated = apply_rules(projected, CFG, kind="post_gate")
    out = gated.collect()
    assert sorted(r["url"] for r in out) == ["https://a.ex/1", "https://a.ex/2"]
    assert all(r["lang"] == "en" for r in out)
