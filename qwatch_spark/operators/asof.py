"""As-of join and sessionization — time-ordered operators Spark lacks
natively (SURVEY.md §2.4 notes the reference has neither; both are
required stream-analytics idioms for a CDC engine's consumers).

as-of join (left rows get the most recent right row ≤ their timestamp,
per key) is implemented WITHOUT a range join explosion: union both
sides tagged, one window `last_value(ignoreNulls)` over the merged
event-time order per key, then keep left rows. One shuffle on the key —
the same cost as a plain equi-join, versus the O(n·m) naive theta join.

sessionization: gap-based session ids via lag + running count of gap
breaks — one window, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: columns of the latest right row with
    right.ts <= left.ts on the same key (NULL if none)."""
    right_cols = right_cols or [c for c in right.columns if c not in (key, ts)]
    l_tag = left.withColumn("_side", F.lit(1)).withColumn("_rord", F.lit(1))
    r_tag = (
        right.select(key, ts, *right_cols)
        .withColumn("_side", F.lit(0))
        .withColumn("_rord", F.lit(0))
    )
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # order: by event time, right rows first on ties (a right row AT the
    # left timestamp is visible to it); _rord gives that tiebreak
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_rord")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = merged.select(
        "*",
        *[
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(c + suffix)
            for c in right_cols
        ],
    )
    keep = [c for c in left.columns] + [c + suffix for c in right_cols]
    return filled.filter(F.col("_side") == 1).select(*keep)


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the previous event of the same key exceeds the gap."""
    order = [ts] + ([order_tiebreak] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(ts).over(w)
    # microsecond-exact gap arithmetic (timestamps are µs; second-level
    # truncation would disagree with any exact oracle on sub-second gaps)
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # NTZ-safe under UTC session
    is_new = (
        prev.isNull()
        | (us(F.col(ts)) - us(prev) > gap_minutes * 60_000_000)
    ).cast("int")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    return events.withColumn("session_id", F.sum(is_new).over(wrun))


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
    order_tiebreak: str | None = None,
) -> DataFrame:
    s = sessionize(events, key, ts, gap_minutes, order_tiebreak)
    return s.groupBy(key, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (
            F.unix_micros(F.max(ts).cast("timestamp"))
            - F.unix_micros(F.min(ts).cast("timestamp"))
        ).alias("duration_us"),
    )
