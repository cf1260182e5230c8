"""Training-data sampling & sequence packing — the two set-level
operations a pretraining pipeline runs after dedup/quality gating:
pick a deterministic weighted subset (data mixing), then pack the
survivors into fixed-length token sequences (concat-then-chunk, the
standard LLM pretraining layout).

Beyond-reference scope: qwatch routes every event to its sink
unconditionally (no sampling story, server/server.go:46-64); these
operators are part of the training-data brief, not a port.

Everything here is deterministic and engine-independent by
construction — sampling decisions come from md5 of the row key (so a
DuckDB oracle reproduces them bit-for-bit, and a re-run over re-shuffled
partitions picks the identical subset), and the packing prefix-sum is
exact integer arithmetic, no floats anywhere near row placement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rate_hex_threshold(rate: float) -> str:
    """The 8-hex-digit threshold a uniform md5 prefix is compared
    against: P(substr(md5(x),1,8) < threshold) == rate, exactly
    floor(rate*2^32)/2^32. Shared by the Column builder and the SQL
    oracle generator so both engines decide identically. Hex digits all
    sort below 'z', so 'zzzzzzzz' is the accept-everything sentinel and
    the empty string rejects everything."""
    if rate >= 1.0:
        return "zzzzzzzz"
    if rate <= 0.0:
        return ""
    return "%08x" % int(rate * (1 << 32))


def _hash8(key_col: str, seed: str) -> Column:
    return F.substring(
        F.md5(F.concat_ws("|", F.col(key_col).cast("string"), F.lit(seed))), 1, 8
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    seed: str = "s0",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, decided by a
    deterministic per-key coin: substr(md5(key|seed),1,8) < threshold.

    Scale shape: a pure narrow filter — no shuffle, no sampling RNG
    state, pushdown-friendly. Changing `seed` redraws every coin;
    changing one stratum's rate UPWARD keeps the previous subset and
    only adds rows (thresholds are nested), which is exactly what you
    want when re-mixing a 100 TB corpus incrementally."""
    thr: Column = F.lit(rate_hex_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = (
            F.when(F.col(strata_col) == value, F.lit(rate_hex_threshold(rate)))
            .otherwise(thr)
        )
    return df.filter(_hash8(key_col, seed) < thr)


def stratified_sample_sql(
    table: str,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    seed: str = "s0",
    default_rate: float = 0.0,
    select: str = "*",
) -> str:
    """The ANSI-SQL twin of `stratified_sample` (same thresholds via
    `rate_hex_threshold`), for DuckDB oracle checks."""
    cases = " ".join(
        f"WHEN '{v}' THEN '{rate_hex_threshold(r)}'"
        for v, r in sorted(rates.items())
    )
    return (
        f"SELECT {select} FROM {table} "
        f"WHERE substr(md5(concat(CAST({key_col} AS VARCHAR), '|', '{seed}')), 1, 8) "
        f"< CASE {strata_col} {cases} ELSE '{rate_hex_threshold(default_rate)}' END"
    )


def global_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    out_col: str = "prefix_sum",
    n_parts: int | None = None,
    eager_tie_check: bool = False,
) -> DataFrame:
    """EXCLUSIVE prefix sum of `value_col` in `order_col` order, without
    ever collapsing the data to one partition.

    The naive window (`ORDER BY order_col ROWS UNBOUNDED PRECEDING`
    with no PARTITION BY) plans a single-partition sort — the classic
    100×-scale-up killer. This is the textbook two-phase distributed
    scan instead:

    1. derive a DETERMINISTIC contiguous range id `_pid` from the order
       value itself (fixed-width buckets between min and max — one cheap
       agg job; no RangePartitioner sampling, so re-runs and the
       totals/placement jobs can never disagree about boundaries);
    2. one small map-side-combined aggregation gets each range's total;
       the driver folds the P totals into exclusive offsets (P = a few
       hundred numbers, not data);
    3. each range computes its LOCAL running sum in parallel (window
       partitioned by `_pid`) and adds its broadcast offset.

    One data shuffle total (the per-range window), exact integer
    arithmetic throughout. `order_col` must be NUMERIC (cast timestamps
    to epoch seconds first). Skew caveat: ranges are equal-width in the
    order VALUE, so a dense hotspot in `order_col` concentrates rows —
    ideal for dense ids (doc_id), fine for epoch times, wrong for
    zipfian keys (re-map those with `dense_rank_remap` first: one extra
    count-balanced exchange, then the ranks are dense and safe here).

    Tie guard semantics: `order_col` must be unique, and the duplicate
    guard fires at EXECUTION time, not call time — it is a
    `raise_error` expression embedded in `out_col`, so a plan that
    prunes `out_col` (or never materializes the tied rows) evaluates
    without error. Only the tied rows' own prefixes are
    nondeterministic, and those do raise whenever computed, so lazy
    firing is sound — but callers that relied on the pre-r6 fail-fast
    call-time behavior should pass `eager_tie_check=True`, which runs
    one extra aggregation job up front and raises ValueError on any
    duplicate regardless of what downstream materializes."""
    from pyspark.sql import Window

    spark = df.sparkSession
    n_parts = n_parts or spark.sparkContext.defaultParallelism * 2
    if eager_tie_check:
        dup = (
            df.groupBy(order_col)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"global_prefix_sum: order_col {order_col!r} has a "
                f"duplicate value ({dup[0][order_col]}); the global "
                "order (hence every prefix sum) would be "
                "nondeterministic. Provide a unique order column or "
                "disambiguate ties upstream."
            )
    lo, hi = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).first()
    if lo is None:
        return df.withColumn(out_col, F.lit(0).cast("long"))
    width = max(1, (int(hi) - int(lo)) // n_parts + 1)
    pid = ((F.col(order_col) - F.lit(int(lo))) / F.lit(width)).cast("long")
    with_pid = df.withColumn("_pid", pid)
    totals = sorted(
        with_pid.groupBy("_pid")
        .agg(F.sum(F.col(value_col).cast("long")).alias("_tot"))
        .collect(),
        key=lambda r: r["_pid"],
    )
    offsets, running = [], 0
    for r in totals:
        offsets.append((int(r["_pid"]), running))
        running += int(r["_tot"])
    off_df = spark.createDataFrame(offsets, "_pid long, _off long")
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(F.col(value_col).cast("long")).over(w), F.lit(0))
    # order_col must be UNIQUE: with ties the per-range window assigns
    # tied rows arbitrary relative prefix sums run to run, breaking this
    # module's determinism/oracle-reproducibility contract. The guard
    # rides the window's OWN sort (a lag over the identical window spec
    # — same exchange, same sort, zero extra jobs or shuffled bytes;
    # the countDistinct it replaces re-shuffled one row per distinct
    # order value, ~the whole dataset, through a second exchange) and
    # fires at execution time: any duplicate is adjacent in sort order,
    # so lag(order) == order catches every tie exactly.
    prev = F.lag(F.col(order_col)).over(Window.partitionBy("_pid").orderBy(order_col))
    tie = F.coalesce(prev == F.col(order_col), F.lit(False))
    prefix = (local + F.col("_off")).cast("long")
    guarded = F.when(~tie, prefix).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"global_prefix_sum: order_col {order_col!r} has a "
                    "duplicate value ("
                ),
                F.col(order_col).cast("string"),
                F.lit(
                    "); the global order (hence every prefix sum) would "
                    "be nondeterministic. Provide a unique order column "
                    "(e.g. a doc_id) or disambiguate ties upstream."
                ),
            )
        ).cast("long")
    )
    return (
        with_pid.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, guarded)
        .drop("_pid", "_off")
    )


def dense_rank_remap(
    df: DataFrame,
    order_col: str,
    out_col: str = "order_rank",
    n_parts: int | None = None,
    work_dir: str | None = None,
) -> DataFrame:
    """Remap a UNIQUE but arbitrarily-distributed order key (zipfian
    values, huge gaps, hotspots) to its dense global sort position
    0..n-1 — the paved path for keys whose VALUE distribution defeats
    `global_prefix_sum`'s fixed-width ranges (its documented caveat).
    Feed the returned `out_col` to pack_sequences/global_prefix_sum as
    the order column: ranks are dense integers, so fixed-width ranges
    over them are perfectly balanced.

    Plan shape: ONE extra data exchange (repartitionByRange, balanced
    by ROW COUNT via sampling, exactly the skew case fixed-width
    bucketing loses) + a partition-local sort; the rank itself is
    monotonically_increasing_id's (partition, position) encoding plus
    driver-folded per-partition offsets — no window, no second data
    shuffle, never a single-partition sort. The ranked frame must be
    pinned so the offset-count action and the returned rows read the
    SAME physical partitioning — a re-executed range sampler choosing
    different boundaries could otherwise misalign the offsets. HOW it
    is pinned is the `work_dir` choice: by default `localCheckpoint`
    (fine for one-shot local use, but it materializes the WHOLE ranked
    frame into executor block storage — the wrong shape at 100 TB);
    with `work_dir` set, the frame spills to a parquet round-trip
    instead (the same pattern `connected_components` uses), so nothing
    is pinned to executor memory and the scratch lives on shared
    storage every executor can read. The spill files must outlive the
    RETURNED DataFrame (it scans them lazily) — the caller owns
    cleanup, e.g. a TTL'd scratch prefix, same contract as
    `connected_components`' work_dir. Re-runs still reproduce
    identical ranks regardless of sampling: a unique value's global
    sort position does not depend on where the partition boundaries
    fell.

    PRECONDITION: `order_col` values are unique. With ties, the tied
    rows' relative ranks are sampling-order-arbitrary AND the remap
    would mask global_prefix_sum's duplicate guard downstream (ranks
    are unique by construction) — the determinism contract is then
    silently void, so deduplicate or disambiguate first."""
    spark = df.sparkSession
    n_parts = n_parts or spark.sparkContext.defaultParallelism * 2
    ranked = (
        df.repartitionByRange(n_parts, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    if work_dir is None:
        # single-use pin: sampling + ids frozen in executor storage
        base = ranked.localCheckpoint()
    else:
        import uuid

        p = f"{work_dir.rstrip('/')}/rank-{uuid.uuid4().hex}"
        ranked.write.parquet(p)
        base = spark.read.parquet(p)
    base = base.withColumn("_p", F.shiftright("_mid", 33))
    counts = sorted(
        base.groupBy("_p").count().collect(), key=lambda r: r["_p"]
    )
    offsets, running = [], 0
    for r in counts:
        offsets.append((int(r["_p"]), running))
        running += int(r["count"])
    if not offsets:
        return df.withColumn(out_col, F.lit(0).cast("long"))
    off_df = spark.createDataFrame(offsets, "_p long, _off long")
    pos = F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1))
    return (
        base.join(F.broadcast(off_df), "_p")
        .withColumn(out_col, (F.col("_off") + pos).cast("long"))
        .drop("_p", "_mid", "_off")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    order_col: str = "doc_id",
    token_count_col: Column | None = None,
    n_parts: int | None = None,
) -> DataFrame:
    """Concat-then-chunk packing: lay every document's tokens end to end
    in `order_col` order and cut the stream every `seq_len` tokens —
    each doc learns which packed sequences it lands in and at what
    offset. (The standard GPT-style pretraining layout: no padding
    waste, docs may straddle chunk boundaries; attention masking at the
    boundaries is the trainer's concern, placement is ours.)

    Built on `global_prefix_sum`, so the only data shuffle is the
    per-range window; all chunk math is integer DIV/MOD on longs —
    exact past 2^53 tokens, where double arithmetic would misplace
    documents."""
    tok = (
        token_count_col
        if token_count_col is not None
        else F.size(F.split(F.trim(F.col("text")), "\\s+"))
    )
    base = docs.select(F.col(order_col), tok.cast("long").alias("n_tok"))
    placed = global_prefix_sum(
        base, "n_tok", order_col, out_col="start_tok", n_parts=n_parts
    )
    s = int(seq_len)
    return placed.select(
        order_col,
        "n_tok",
        "start_tok",
        F.expr(f"start_tok DIV {s}").alias("pack_first"),
        F.expr(f"greatest(start_tok, start_tok + n_tok - 1) DIV {s}").alias(
            "pack_last"
        ),
        (F.col("start_tok") % F.lit(s)).alias("pack_offset"),
    )


def pack_chunk_spans(
    placed: DataFrame, seq_len: int, order_col: str = "doc_id"
) -> DataFrame:
    """Explode `pack_sequences` placements into the per-(doc, chunk)
    span table a data loader consumes directly: for every chunk a doc
    touches, where in the chunk the doc's tokens land and which slice
    of the doc they are.

        chunk_id        — the packed sequence index
        <order_col>     — the contributing document
        offset_in_chunk — first filled position within the chunk
        tok_start       — index of that token within the DOC
        n_tok_in_chunk  — span length

    Invariants (tested): every non-final chunk sums to exactly seq_len
    with contiguous offsets (concat-then-chunk leaves no padding), and
    each doc's spans partition [0, n_tok). Scale shape: `sequence()` +
    explode emits ~(total_tokens / seq_len + n_docs) rows — linear,
    chunk-local, no shuffle beyond the placement's own."""
    s = int(seq_len)
    spans = placed.filter(F.col("n_tok") > 0).select(
        order_col,
        "n_tok",
        "start_tok",
        F.explode(F.sequence("pack_first", "pack_last")).alias("chunk_id"),
    )
    chunk_start = F.col("chunk_id") * F.lit(s)
    begin = F.greatest(chunk_start, F.col("start_tok"))
    end = F.least(chunk_start + F.lit(s), F.col("start_tok") + F.col("n_tok"))
    return spans.select(
        "chunk_id",
        order_col,
        (begin - chunk_start).alias("offset_in_chunk"),
        (begin - F.col("start_tok")).alias("tok_start"),
        (end - begin).alias("n_tok_in_chunk"),
    )
