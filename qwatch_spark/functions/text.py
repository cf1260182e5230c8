"""HTML→text extraction — the pinned, byte-identical-per-url contract.

BASELINE.json input_hint requires extracted ``text`` to be byte-identical
per url versus the reference extractor. There is no environment-dependent
parser here: the extractor is a pure deterministic bytes→str function
(regex tag strip + whitespace collapse), defined ONCE (`extract_text_bytes`)
and exposed two ways:

- `extract_text_bytes` — plain Python, used by the single-threaded oracle
  replay in tests;
- `extract_text_udf` — Arrow-vectorized pandas UDF using the *same*
  compiled regexes via pandas str ops (same `re` engine ⇒ identical
  bytes), used in the Spark pipeline. No per-row Python UDFs
  (input_hint), unlike the reference's row-at-a-time handling
  (/root/reference/outputs/neo4j.go:38-54).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# Pinned extraction spec (order matters; inline flags keep the spec
# self-contained so pandas and plain-Python paths share byte semantics):
_SCRIPT_STYLE = r"(?is)<(script|style)\b.*?</\1\s*>"
_TAG = r"(?s)<[^>]*>"
_WS = r"\s+"

_SCRIPT_STYLE_RE = re.compile(_SCRIPT_STYLE)
_TAG_RE = re.compile(_TAG)
_WS_RE = re.compile(_WS)


def extract_text_bytes(html: bytes | None) -> str | None:
    """Pure reference implementation (oracle side)."""
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace")
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _WS_RE.sub(" ", s).strip()
    return s


def _extract_series(html: pd.Series) -> pd.Series:
    decoded = html.str.decode("utf-8", errors="replace")
    stripped = (
        decoded.str.replace(_SCRIPT_STYLE_RE, " ", regex=True)
        .str.replace(_TAG_RE, " ", regex=True)
        .str.replace(_WS_RE, " ", regex=True)
        .str.strip()
    )
    return stripped


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Vectorized Spark-side extractor; byte-identical to the oracle."""
    return _extract_series(html)
