"""Filter-rule registry — the stage qwatch declared but never built.

The reference scaffolds a filters plugin stage (string-keyed registry
switch like /root/reference/server/server.go:46-56, DAG hooks at
utils/dag.go:59-68) but ships it empty (filters/filters_test.go:1 is a
package stub; wiring commented at server/server.go:60-64). This module
realizes it: a name→rule registry, composed in declared order between
source and sink, every rule a pure DataFrame→DataFrame transform built
from Column expressions or Arrow-vectorized pandas UDFs — never
row-at-a-time Python.

Delete events ('D') always pass content gates: a delete carries no
payload (html/lang are null) but must still reach the MERGE so the key
is tombstoned — mirroring how the reference's destroy handler runs
regardless of payload (outputs/neo4j.go:231-248).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qwatch_spark.config import PipelineConfig
from qwatch_spark.functions.text import extract_text_udf
from qwatch_spark.functions.urls import is_valid_url

Rule = Callable[[DataFrame, PipelineConfig], DataFrame]

def _is_delete():
    return F.col("op") == "D"


def rule_valid_url(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    return df.filter(is_valid_url(F.col("url")))


def rule_lang_gate(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    return df.filter(_is_delete() | F.col("lang").isin(*cfg.keep_langs))


def rule_min_html_bytes(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    return df.filter(_is_delete() | (F.length("html") >= cfg.min_html_bytes))


def rule_extract_text(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    return df.withColumn("text", extract_text_udf(F.col("html")))


RULE_REGISTRY: dict[str, Rule] = {
    "valid_url": rule_valid_url,
    "lang_gate": rule_lang_gate,
    "min_html_bytes": rule_min_html_bytes,
    "extract_text": rule_extract_text,
}

# Rule classification drives a plan rewrite in apply_changes: gates
# (row-dropping filters) run BEFORE dedup so losers are cheap to discard;
# projections (column-producing transforms like HTML→text) are DEFERRED
# to after dedup, so expensive extraction runs once per surviving key
# instead of once per raw event — the same final state, ~(batch/keys)×
# less UDF work. Relative order within each kind is preserved.
RULE_KIND: dict[str, str] = {
    "valid_url": "gate",
    "lang_gate": "gate",
    "min_html_bytes": "gate",
    "extract_text": "project",
}


def apply_rules(df: DataFrame, cfg: PipelineConfig, kind: str | None = None) -> DataFrame:
    """Chain cfg.rules in declared order (the DAG the reference never ran).
    With `kind`, apply only that phase ('gate' or 'project')."""
    for name in cfg.rules:
        try:
            rule = RULE_REGISTRY[name]
        except KeyError:  # strict, unlike the reference's nil-interface panic
            raise ValueError(f"unknown filter rule {name!r}") from None
        if kind is not None and RULE_KIND[name] != kind:
            continue
        df = rule(df, cfg)
    return df
