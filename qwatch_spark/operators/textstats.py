"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting (SURVEY.md training-data pipeline ops).

All pure Column expressions over built-in functions (regexp_extract_all,
split, md5) — portable 1:1 to a SQL oracle, JVM-side at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# marker-word tables for the n-gram language heuristic: tiny dimension
# data, compiled into the plan as literals (no join needed)
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "et", "les"),
    "es": ("el", "y", "los"),
}


def _marker_count(lang: str, text_col: str = "text") -> F.Column:
    pat = "\\b(" + "|".join(LANG_MARKERS[lang]) + ")\\b"
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))


def lang_pred_expr(text_col: str = "text") -> F.Column:
    """Argmax-of-marker-counts language prediction as one Column
    (reused by the lang_id operator and the lang_fallback ingest rule)."""
    counts = [_marker_count(lg, text_col) for lg in LANG_MARKERS]
    best = F.greatest(*counts)
    pred = F.when(best == 0, F.lit("und"))
    for lg, cnt in zip(LANG_MARKERS, counts):  # first language at max wins
        pred = pred.when(cnt == best, F.lit(lg))
    return pred


def lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic language ID: argmax of marker-word counts; 'und' when no
    marker hits. Ties break by fixed language order (en,de,fr,es)."""
    scored = docs.select(
        "doc_id", *[_marker_count(lg).alias(f"n_{lg}") for lg in LANG_MARKERS]
    )
    best = F.greatest(*[F.col(f"n_{lg}") for lg in LANG_MARKERS])
    pred = F.when(best == 0, F.lit("und"))
    for lg in LANG_MARKERS:  # first language reaching the max wins
        pred = pred.when(F.col(f"n_{lg}") == best, F.lit(lg))
    return scored.select("doc_id", pred.alias("pred_lang"), best.alias("marker_hits"))


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish regex token count (letter runs,
    digit runs, single punctuation marks)."""
    ws = F.size(F.split(F.trim(F.col("text")), "\\s+"))
    bpe = F.size(
        F.regexp_extract_all(
            F.col("text"), F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), 0
        )
    )
    return docs.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_obs"),
    )


STOPWORDS = ("the", "a", "of", "and")


def quality_exprs(
    stopwords: tuple[str, ...] = STOPWORDS, text_col: str = "text"
) -> dict[str, F.Column]:
    """The quality heuristic's component Columns (shared by the
    quality_score operator and the quality_gate ingest rule)."""
    n_chars = F.length(text_col)
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), "\\s+"))
    n_punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit("[^A-Za-z0-9\\s]"), 0)
    )
    stop_pat = "\\b(" + "|".join(stopwords) + ")\\b"
    n_stop = F.size(F.regexp_extract_all(F.col(text_col), F.lit(stop_pat), 0))
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6)
    len_score = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    quality = F.round(
        F.lit(0.5) * len_score + F.lit(0.3) * stop_ratio + F.lit(0.2) * (1 - punct_ratio),
        6,
    )
    return {
        "n_tokens": n_tokens,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality": quality,
    }


def quality_score(docs: DataFrame, stopwords: tuple[str, ...] = STOPWORDS) -> DataFrame:
    """Length / punctuation / stopword-ratio quality heuristic, scaled to
    integer basis points then rounded — deterministic across engines."""
    ex = quality_exprs(stopwords)
    return docs.select(
        "doc_id",
        ex["n_tokens"].alias("n_tokens"),
        ex["punct_ratio"].alias("punct_ratio"),
        ex["stopword_ratio"].alias("stopword_ratio"),
        ex["quality"].alias("quality"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Deterministic document fingerprint: md5 of case-folded,
    whitespace-collapsed text (the rolling-hash analog with an exact
    cross-engine definition)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "\\s+", " "))
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))


def winnow_fingerprints(
    docs: DataFrame, k: int = 5, w: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    scheme): hash every k-gram, slide a w-gram window, keep each
    window's minimum hash, dedup — guarantees any match of length
    ≥ w + k - 1 shares a fingerprint, with ~2/(w+1) selection density.

    Plan shape: one explode (positions), one shuffle on doc_id for the
    positional window, distinct — per-doc work is O(len); docs are
    bounded, so partitions stay balanced at corpus scale. md5-based so
    any SQL engine reproduces it exactly."""
    from pyspark.sql import Window as W

    from qwatch_spark.operators.dedup_text import _spread_small_input

    n = (F.length("text") - (k - 1)).alias("n")
    idx = F.explode(F.sequence(F.lit(1), F.length("text") - (k - 1))).alias("i")
    # spread an under-split scan before the per-position explode + md5
    # (same lever as doc_words — the k-gram hashing is ~len(text)× the
    # input and otherwise runs in the scan's 1-2 partitions)
    grams = _spread_small_input(docs).select(id_col, F.col("text"), n, idx).select(
        id_col,
        "n",
        F.col("i"),
        F.md5(F.col("text").substr(F.col("i"), F.lit(k))).alias("h"),
    )
    win = W.partitionBy(id_col).orderBy("i").rowsBetween(0, w - 1)
    return (
        grams.select(
            id_col, "n", "i", F.min("h").over(win).alias("fp")
        )
        .filter(F.col("i") <= F.col("n") - (w - 1))  # full windows only
        .select(id_col, "fp")
        .distinct()
    )
