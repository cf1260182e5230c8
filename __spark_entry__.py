"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship CDC query on sf0.001; `queries()` /
`oracle_sql()` expose the operator registry in qwatch_spark/queries.py —
one entry per implemented operator from SURVEY.md §2, each paired with a
DuckDB-runnable ANSI-SQL oracle (identical column aliases both sides).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from qwatch_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC final-state (dedup-to-latest + delete opcode) on the
    sf0.001 events table — the engine's W1+K4 semantics in one query."""
    return _q.q03_cdc_final_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
