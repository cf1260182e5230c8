"""Training-data mixing & packing (operators/sampling.py): the
stratified sampler must hit its per-stratum rates deterministically and
nest under rate increases; the distributed prefix sum must agree with a
driver-side reference on adversarial inputs and never plan a
single-partition global sort."""

import pytest
from pyspark.sql import functions as F

from qwatch_spark.operators.sampling import (
    global_prefix_sum,
    pack_sequences,
    rate_hex_threshold,
    stratified_sample,
)


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_rate_thresholds_are_exact_and_monotone():
    assert rate_hex_threshold(0.0) == ""
    assert rate_hex_threshold(1.0) == "zzzzzzzz"
    assert rate_hex_threshold(0.5) == "80000000"
    prev = ""
    for r in (0.1, 0.25, 0.5, 0.75, 0.999):
        cur = rate_hex_threshold(r)
        assert cur > prev
        prev = cur


def test_stratified_sample_rates_and_determinism(spark):
    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("g"),
    )
    picked = stratified_sample(
        df, strata_col="g", rates={"a": 0.5, "b": 0.1}, key_col="k"
    )
    counts = {
        r["g"]: r["n"]
        for r in picked.groupBy("g").agg(F.count("*").alias("n")).collect()
    }
    assert abs(counts["a"] / (n / 2) - 0.5) < 0.03
    assert abs(counts["b"] / (n / 2) - 0.1) < 0.03
    assert picked.count() == picked.count()  # same coin flips every run


def test_stratified_sample_nests_when_rate_increases(spark):
    df = spark.range(5_000).select(
        F.col("id").alias("k"), F.lit("a").alias("g")
    )
    small = {
        r["k"]
        for r in stratified_sample(
            df, "g", {"a": 0.2}, key_col="k"
        ).collect()
    }
    big = {
        r["k"]
        for r in stratified_sample(
            df, "g", {"a": 0.6}, key_col="k"
        ).collect()
    }
    assert small <= big, "upweighting must only ADD rows"


def test_stratified_sample_plans_no_shuffle(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"), F.lit("a").alias("g")
    )
    p = plan(stratified_sample(df, "g", {"a": 0.5}, key_col="k"))
    assert "Exchange" not in p, p


def test_global_prefix_sum_matches_reference(spark):
    import random

    rnd = random.Random(11)
    # sparse, shuffled, duplicate-valued ids with gaps — exercises empty
    # range buckets and uneven bucket occupancy
    ids = rnd.sample(range(0, 100_000), 3_000)
    rows = [(i, rnd.randint(0, 50)) for i in ids]
    df = spark.createDataFrame(rows, "oid long, v long").repartition(16)
    got = {
        r["oid"]: r["ps"]
        for r in global_prefix_sum(df, "v", "oid", out_col="ps").collect()
    }
    run = 0
    for oid, v in sorted(rows):
        assert got[oid] == run, (oid, got[oid], run)
        run += v
    assert len(got) == len(rows)


def test_global_prefix_sum_empty_and_single(spark):
    empty = spark.createDataFrame([], "oid long, v long")
    assert global_prefix_sum(empty, "v", "oid").count() == 0
    one = spark.createDataFrame([(7, 42)], "oid long, v long")
    assert global_prefix_sum(one, "v", "oid").first()["prefix_sum"] == 0


def test_prefix_sum_never_plans_single_partition_sort(spark):
    """The whole point vs `ORDER BY ... ROWS UNBOUNDED PRECEDING`: no
    SinglePartition exchange anywhere in the plan."""
    df = spark.range(1000).select(
        F.col("id").alias("oid"), (F.col("id") % 7).alias("v")
    )
    p = plan(global_prefix_sum(df, "v", "oid"))
    assert "SinglePartition" not in p, p


def test_pack_sequences_layout_invariants(spark):
    docs = spark.createDataFrame(
        [(i, "tok " * (i % 700)) for i in range(1, 200)],
        "doc_id long, text string",
    )
    out = pack_sequences(docs, seq_len=512).collect()
    by_id = sorted(out, key=lambda r: r["doc_id"])
    run = 0
    for r in by_id:
        assert r["start_tok"] == run
        assert r["pack_first"] == r["start_tok"] // 512
        last = max(r["start_tok"], r["start_tok"] + r["n_tok"] - 1)
        assert r["pack_last"] == last // 512
        assert r["pack_offset"] == r["start_tok"] % 512
        assert r["pack_last"] >= r["pack_first"]
        run += r["n_tok"]
    # total stream length = sum of doc lengths (no padding, no gaps)
    assert run == sum(r["n_tok"] for r in out)
    # long docs must straddle chunk boundaries
    assert any(r["pack_last"] > r["pack_first"] for r in out)


def test_pack_chunk_spans_partition_invariants(spark):
    from qwatch_spark.operators.sampling import pack_chunk_spans

    docs = spark.createDataFrame(
        [(i, "tok " * (i * 37 % 900)) for i in range(1, 120)],
        "doc_id long, text string",
    )
    placed = pack_sequences(docs, seq_len=256)
    spans = pack_chunk_spans(placed, seq_len=256).collect()
    total_tok = sum(r["n_tok"] for r in placed.collect())
    last_chunk = (total_tok - 1) // 256

    by_chunk: dict[int, list] = {}
    by_doc: dict[int, list] = {}
    for r in spans:
        by_chunk.setdefault(r["chunk_id"], []).append(r)
        by_doc.setdefault(r["doc_id"], []).append(r)

    # every chunk except the last is exactly full and gap-free
    for cid, rows in by_chunk.items():
        rows.sort(key=lambda r: r["offset_in_chunk"])
        pos = 0
        for r in rows:
            assert r["offset_in_chunk"] == pos, (cid, pos, r)
            pos += r["n_tok_in_chunk"]
        assert pos == (256 if cid < last_chunk else total_tok - 256 * last_chunk)

    # each doc's spans partition [0, n_tok) in order
    n_tok_of = {r["doc_id"]: r["n_tok"] for r in placed.collect()}
    for did, rows in by_doc.items():
        rows.sort(key=lambda r: r["tok_start"])
        pos = 0
        for r in rows:
            assert r["tok_start"] == pos
            pos += r["n_tok_in_chunk"]
        assert pos == n_tok_of[did]


def test_global_prefix_sum_rejects_duplicate_order_values(spark):
    """Duplicate order_col values would give tied rows arbitrary
    relative prefix sums run to run — the module's determinism contract
    says fail loudly instead (ADVICE r4). The guard rides the window's
    own per-range sort (lag == order, zero extra shuffle — ADVICE r5
    flagged the old countDistinct's hidden full-data exchange), so it
    fires at execution time of the first action over the result."""
    import pytest

    from qwatch_spark.operators.sampling import global_prefix_sum

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (2, 30), (5, 40)], "ord long, v long"
    )
    with pytest.raises(Exception, match="duplicate"):
        global_prefix_sum(df, "v", "ord").collect()
    ok = global_prefix_sum(
        spark.createDataFrame([(1, 10), (2, 20), (5, 40)], "ord long, v long"),
        "v",
        "ord",
    )
    got = {r["ord"]: r["prefix_sum"] for r in ok.collect()}
    assert got == {1: 0, 2: 10, 5: 30}


def test_global_prefix_sum_eager_tie_check_fails_at_call_time(spark):
    """ADVICE r6: the lazy raise_error guard never fires if out_col is
    pruned before evaluation — callers needing the pre-r6 fail-fast
    contract opt into eager_tie_check, which raises AT CALL TIME even
    when the guarded column would be dropped."""
    import pytest

    from qwatch_spark.operators.sampling import global_prefix_sum

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (2, 30), (5, 40)], "ord long, v long"
    )
    # lazy default: pruning out_col silences the guard (documented gap)
    lazy = global_prefix_sum(df, "v", "ord").drop("prefix_sum")
    assert lazy.count() == 4
    with pytest.raises(ValueError, match="duplicate"):
        global_prefix_sum(df, "v", "ord", eager_tie_check=True)
    # eager on clean input: same result as lazy
    clean = spark.createDataFrame(
        [(1, 10), (2, 20), (5, 40)], "ord long, v long"
    )
    got = {
        r["ord"]: r["prefix_sum"]
        for r in global_prefix_sum(
            clean, "v", "ord", eager_tie_check=True
        ).collect()
    }
    assert got == {1: 0, 2: 10, 5: 30}


def test_dense_rank_remap_is_global_sort_position(spark):
    """Ranks must equal each unique value's 0-based global sort
    position, for a pathologically skewed value distribution (zipfian
    gaps + a dense hotspot) that fixed-width ranges would collapse."""
    from qwatch_spark.operators.sampling import dense_rank_remap

    vals = sorted(
        {2**i for i in range(40)} | {10_000 + j for j in range(500)}
    )
    import random

    shuffled = list(vals)
    random.Random(7).shuffle(shuffled)
    df = spark.createDataFrame([(v,) for v in shuffled], "k long")
    got = {
        r["k"]: r["order_rank"]
        for r in dense_rank_remap(df, "k", n_parts=8).collect()
    }
    assert got == {v: i for i, v in enumerate(vals)}
    # empty frame stays valid
    empty = spark.createDataFrame([], "k long")
    assert dense_rank_remap(empty, "k").count() == 0


@pytest.mark.parametrize("spill", [False, True])
def test_pack_sequences_via_rank_remap_on_zipfian_key(spark, tmp_path, spill):
    """The paved path for skewed order keys: remap → pack on the rank.
    Same chunk-full/gap-free invariants as the dense-id layout test,
    and the token stream is laid out in ORIGINAL key order (rank
    preserves it). The `spill=True` arm (r6 verdict #6) routes the
    remap's pin through a parquet `work_dir` round-trip instead of
    localCheckpoint and asserts NOTHING is pinned in executor block
    storage — the 100-TB shape, where checkpointing the whole ranked
    frame to executor memory/disk is the wrong primitive."""
    from qwatch_spark.operators.sampling import dense_rank_remap

    # zipfian-gapped doc ids: huge value gaps, dense hotspot
    ids = sorted({3**i for i in range(1, 25)} | {10**6 + j for j in range(150)})
    docs = spark.createDataFrame(
        [(i, "tok " * (1 + i % 400)) for i in ids], "doc_id long, text string"
    )
    if spill:
        jsc = spark.sparkContext._jsc.sc()
        # snapshot the pinned RDD id SET, not the count: an EARLIER
        # test's localCheckpoint can be unpersisted asynchronously by
        # ContextCleaner mid-test (observed in full-suite order: 5→4),
        # so count-equality is flaky — the property under test is that
        # the spill pins nothing NEW, i.e. no new ids appear
        before_ids = {i.id() for i in jsc.getRDDStorageInfo()}
        remapped = dense_rank_remap(
            docs, "doc_id", out_col="rk", work_dir=str(tmp_path / "spill")
        )
        remapped.count()  # materialize through the spilled path
        after_ids = {i.id() for i in jsc.getRDDStorageInfo()}
        assert not (after_ids - before_ids), (
            "work_dir spill must not pin anything NEW in executor "
            f"storage (new rdd ids: {sorted(after_ids - before_ids)})"
        )
    else:
        remapped = dense_rank_remap(docs, "doc_id", out_col="rk")
    out = pack_sequences(remapped, seq_len=256, order_col="rk").collect()
    assert len(out) == len(ids)
    by_rank = sorted(out, key=lambda r: r["rk"])
    run = 0
    for r in by_rank:
        assert r["start_tok"] == run  # gap-free token stream
        assert r["pack_first"] == r["start_tok"] // 256
        last = max(r["start_tok"], r["start_tok"] + r["n_tok"] - 1)
        assert r["pack_last"] == last // 256
        assert r["pack_offset"] == r["start_tok"] % 256
        run += r["n_tok"]
    # rank order == original key order: the packing layout is the one a
    # direct sort on doc_id would produce (pack output projects to the
    # order column, so check the remap mapping itself)
    mapping = {
        r["rk"]: r["doc_id"]
        for r in remapped.select("doc_id", "rk").collect()
    }
    assert [mapping[r["rk"]] for r in by_rank] == ids
