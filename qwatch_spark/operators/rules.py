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


def rule_lang_fallback(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Fill missing/'und' lang from the marker-word language heuristic on
    the extracted text (requires extract_text earlier in the rule list)."""
    from qwatch_spark.operators.textstats import lang_pred_expr

    keep = F.col("lang").isNotNull() & (F.col("lang") != "und")
    return df.withColumn(
        "lang", F.when(_is_delete() | keep, F.col("lang")).otherwise(lang_pred_expr())
    )


def rule_quality_gate(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Drop page versions scoring below cfg.min_quality on the
    length/punct/stopword heuristic (training-data hygiene; requires
    extracted text, so it runs in the post-dedup phase)."""
    from qwatch_spark.operators.textstats import quality_exprs

    q = quality_exprs()["quality"]
    return df.filter(_is_delete() | (q >= cfg.min_quality))


def rule_exact_dup_gate(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Exact-content dedup at ingest: one surviving row per normalized-text
    fingerprint (md5 of case-folded, whitespace-collapsed text) — the
    canonical copy is the earliest (warc_ts, seq, url). One extra shuffle
    on the fingerprint digest, map-side combinable and skew-proof (hash
    keys don't skew); deletes pass through untouched."""
    live = df.filter(~_is_delete())
    dels = df.filter(_is_delete())
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "\\s+", " "))
    cols = df.columns
    row = F.struct(*[F.col(c) for c in cols])
    order = F.struct(F.col("warc_ts"), F.col("seq"), F.col("url"))
    kept = (
        live.withColumn("_fp", F.md5(norm))
        .groupBy("_fp")
        .agg(F.min_by(row, order).alias("_row"))
        .select(*[F.col(f"_row.{c}").alias(c) for c in cols])
    )
    return kept.unionByName(dels)


RULE_REGISTRY: dict[str, Rule] = {
    "valid_url": rule_valid_url,
    "lang_gate": rule_lang_gate,
    "min_html_bytes": rule_min_html_bytes,
    "extract_text": rule_extract_text,
    "lang_fallback": rule_lang_fallback,
    "quality_gate": rule_quality_gate,
    "exact_dup_gate": rule_exact_dup_gate,
}

# Rule classification drives a plan rewrite in apply_changes: gates
# (row-dropping filters) run BEFORE dedup so losers are cheap to discard;
# projections (column-producing transforms like HTML→text) are DEFERRED
# to after dedup, so expensive extraction runs once per surviving key
# instead of once per raw event — the same final state, ~(batch/keys)×
# less UDF work. post_gates are content gates that NEED the projected
# columns (extracted text), so they run after the project phase, still
# once per surviving key. Relative order within each kind is preserved.
RULE_KIND: dict[str, str] = {
    "valid_url": "gate",
    "lang_gate": "gate",
    "min_html_bytes": "gate",
    "extract_text": "project",
    "lang_fallback": "project",
    "quality_gate": "post_gate",
    "exact_dup_gate": "post_gate",
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
