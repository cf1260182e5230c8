"""Dedup-to-latest per key — SURVEY.md §2.6 W1.

Reference analog: `MERGE ... ON MATCH SET last_seen` keeps exactly one
node per id (/root/reference/outputs/neo4j.go:259-262), applied one
event at a time. Set-oriented version: keep, per key, the row with the
max (warc_ts, seq) — a total order, so late/out-of-order delivery cannot
regress state (fixes the reference's time.Now() regression at
outputs/neo4j.go:268).

Physical strategy (scale notes):

- Default path uses `max_by(struct(*), struct(order))` — a declarative
  aggregate with map-side partial aggregation, so a hot url collapses to
  one row per map task BEFORE the shuffle; skew in the key distribution
  is largely absorbed without salting, and it needs one shuffle (vs the
  window/row_number formulation, which sorts every partition and cannot
  partially aggregate).
- `n_salt > 0` adds an explicit two-phase salted variant (north_rule's
  explicit skew handling) for inputs where even per-map-task volumes of
  one key are extreme: phase 1 reduces (key, salt) groups, phase 2
  reduces the ≤ n_salt survivors per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qwatch_spark.functions.urls import salt_column


def latest_wins(
    df: DataFrame,
    key: str = "url",
    order: Sequence[str] = ("warc_ts", "seq"),
    n_salt: int = 0,
) -> DataFrame:
    """One row per `key`: the row with max lexicographic `order` tuple."""
    payload = [c for c in df.columns if c != key]
    row_struct = F.struct(*[F.col(c) for c in payload])
    ord_struct = F.struct(*[F.col(c) for c in order])

    if n_salt and n_salt > 1:
        salted = df.withColumn("_salt", salt_column(F.col(order[-1]), n_salt))
        phase1 = salted.groupBy(key, "_salt").agg(
            F.max_by(row_struct, ord_struct).alias("_row")
        )
        phase2 = (
            phase1.select(
                key,
                *[F.col(f"_row.{c}").alias(c) for c in payload],
            )
            .groupBy(key)
            .agg(F.max_by(row_struct, ord_struct).alias("_row"))
        )
        top = phase2
    else:
        top = df.groupBy(key).agg(F.max_by(row_struct, ord_struct).alias("_row"))

    return top.select(key, *[F.col(f"_row.{c}").alias(c) for c in payload])
