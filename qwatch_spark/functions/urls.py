"""URL column functions — the ParseImageName analog.

The reference splits ``registry/repo/name:tag@sha256:x`` into parts with
a default tag (/root/reference/utils/utils.go:32-56, tested at
utils/utils_test.go:11-33). Our key space is urls, so the analog is
url → (scheme, domain, path) parsing, used for hot-domain skew salting
(north_rule) and metrics roll-ups. All pure Column expressions —
JVM-side, whole-stage-codegen'd, zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

URL_RE = r"^(https?)://([^/]+)(/.*)?$"


def url_scheme(url: Column | str) -> Column:
    return F.regexp_extract(url, URL_RE, 1)


def url_domain(url: Column | str) -> Column:
    return F.regexp_extract(url, URL_RE, 2)


def url_path(url: Column | str) -> Column:
    # default "/" mirrors ParseImageName's default tag=latest
    # (utils/utils.go:48-52): absent part gets a canonical value.
    p = F.regexp_extract(url, URL_RE, 3)
    return F.when(p == "", F.lit("/")).otherwise(p)


def is_valid_url(url: Column | str) -> Column:
    return F.col(url).rlike(URL_RE) if isinstance(url, str) else url.rlike(URL_RE)


def salt_column(col: Column, n_salt: int) -> Column:
    """Deterministic salt in [0, n_salt) for two-phase skew-safe aggs."""
    return F.pmod(F.xxhash64(col), F.lit(n_salt)).cast("int")
