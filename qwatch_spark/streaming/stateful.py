"""Custom stateful streaming operator via applyInPandasWithState.

The engine's core philosophy keeps state in the lake table (the target
IS the state store, like the reference's Neo4j). This module covers the
cases that genuinely need in-flight per-key state: a per-url change
tracker that maintains (n_changes, last_seq, last_ts) across
micro-batches and emits one updated row per url per batch — the
`applyInPandasWithState` surface SURVEY.md §2.10 names.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_changes", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("last_seq", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("n_changes", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("last_seq", T.LongType()),
    ]
)


def _track(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n_changes, n_deletes, last_seq = (
        state.get if state.exists else (0, 0, -1)
    )
    for pdf in pdfs:
        n_changes += len(pdf)
        n_deletes += int((pdf["op"] == "D").sum())
        last_seq = max(last_seq, int(pdf["seq"].max()))
    state.update((n_changes, n_deletes, last_seq))
    yield pd.DataFrame(
        [(key[0], n_changes, n_deletes, last_seq)],
        columns=["url", "n_changes", "n_deletes", "last_seq"],
    )


def track_url_changes(events: DataFrame) -> DataFrame:
    """Streaming per-url change counters (update mode); works on a
    static DataFrame too only via groupBy fallback in tests."""
    return (
        events.select("url", "op", "seq")
        .groupBy("url")
        .applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
