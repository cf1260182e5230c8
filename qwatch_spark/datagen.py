"""Deterministic synthetic change feed (FIXTURES.md §2) — no external data.

Every field is a pure function of ``seq`` via a fixed LCG-style mixer, so
the SAME feed is generated two ways that agree row-for-row:

- `gen_feed_df(spark, n)` — distributed, pure Column expressions
  (spark.range → select), JVM-side; used for benches at 10^7+ events.
- `gen_feed_rows(n)` — plain Python; used by the single-threaded oracle
  replay and for writing small parquet fixtures.

Skew: ~30% of events hit domain 0 (hot-domain fixture per FIXTURES.md
variant (e)). Out-of-order: warc_ts gets a ±10 min jitter so events
within a key arrive out of order (variant (b)). Deletes ~10% (variant
(d) late-update-after-delete arises naturally from the jitter).
Schema evolution variants (f): `add_title=True` adds a ``title`` column;
`rename_lang=True` ships the lang column under the name ``language``.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qwatch_spark.schema import EVENT_SCHEMA

# Fixed mixer constants (glibc LCG multiplier; modulus 2^31 keeps every
# intermediate < 2^63 for exact parity between Python ints and Spark LONGs).
_A = 1103515245
_B = 12345
_C = 2531011
_M = 2147483648

BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z
LANGS = ("en", "de", "fr", "es", "zz", "pt")
DEFAULT_N_DOMAINS = 50
DEFAULT_PAGES_PER_DOMAIN = 200
HOT_PCT = 30  # % of events on domain 0 (hot-domain skew)
EPOCH_SIZE = 1000


def _mix_py(seq: int, k: int) -> int:
    return (seq * _A + k * (_B + _C)) % _M


def _mix_col(seq, k: int):
    return F.pmod(seq * F.lit(_A) + F.lit(k * (_B + _C)), F.lit(_M))


def _domain_page_py(seq: int, n_domains: int, pages: int) -> tuple[int, int]:
    h1 = _mix_py(seq, 1)
    domain = 0 if h1 % 100 < HOT_PCT else 1 + (h1 // 100) % (n_domains - 1)
    page = _mix_py(seq, 2) % pages
    return domain, page


def _html_py(domain: int, page: int, seq: int) -> bytes:
    url = _url_py(domain, page)
    return (
        f"<html><head><title>Page {page} of d{domain}</title>"
        f"<style>p{{margin:0}}</style></head>"
        f"<body><h1>d{domain}/{page}</h1>"
        f"<p>Content rev {seq} for {url}.</p>"
        f"<script>var rev={seq};</script></body></html>"
    ).encode("utf-8")


def _url_py(domain: int, page: int) -> str:
    return f"https://d{domain}.example.com/p/{page}"


def gen_feed_rows(
    n: int,
    n_domains: int = DEFAULT_N_DOMAINS,
    pages_per_domain: int = DEFAULT_PAGES_PER_DOMAIN,
    epoch_size: int = EPOCH_SIZE,
    add_title: bool = False,
    rename_lang: bool = False,
) -> list[dict]:
    rows = []
    for seq in range(n):
        domain, page = _domain_page_py(seq, n_domains, pages_per_domain)
        h3 = _mix_py(seq, 3)
        op = "D" if h3 % 10 == 0 else ("I" if h3 % 10 <= 4 else "U")
        jitter = _mix_py(seq, 4) % 1201 - 600
        ts = dt.datetime.fromtimestamp(
            BASE_EPOCH + seq + jitter, tz=dt.timezone.utc
        ).replace(tzinfo=None)
        lang = None if op == "D" else LANGS[_mix_py(seq, 5) % len(LANGS)]
        html = None if op == "D" else _html_py(domain, page, seq)
        row = {
            "seq": seq,
            "op": op,
            "url": _url_py(domain, page),
            "warc_ts": ts,
            "html": html,
            "lang": lang,
            "source": f"feed-{seq % 4}",
            "epoch_hint": seq // epoch_size,
        }
        if rename_lang:
            row["language"] = row.pop("lang")
        if add_title:
            row["title"] = None if op == "D" else f"Page {page} of d{domain}"
        rows.append(row)
    return rows


def gen_feed_df(
    spark: SparkSession,
    n: int,
    n_domains: int = DEFAULT_N_DOMAINS,
    pages_per_domain: int = DEFAULT_PAGES_PER_DOMAIN,
    epoch_size: int = EPOCH_SIZE,
    add_title: bool = False,
    rename_lang: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed generator; row-for-row equal to `gen_feed_rows`."""
    seq = F.col("id")
    h1 = _mix_col(seq, 1)
    domain = F.when(h1 % 100 < HOT_PCT, F.lit(0)).otherwise(
        1 + F.pmod(F.floor(h1 / 100), F.lit(n_domains - 1))
    )
    page = _mix_col(seq, 2) % pages_per_domain
    h3 = _mix_col(seq, 3) % 10
    op = (
        F.when(h3 == 0, F.lit("D"))
        .when(h3 <= 4, F.lit("I"))
        .otherwise(F.lit("U"))
    )
    jitter = _mix_col(seq, 4) % 1201 - 600
    url = F.concat(
        F.lit("https://d"), domain, F.lit(".example.com/p/"), page
    )
    html_str = F.concat(
        F.lit("<html><head><title>Page "), page, F.lit(" of d"), domain,
        F.lit("</title><style>p{margin:0}</style></head><body><h1>d"),
        domain, F.lit("/"), page,
        F.lit("</h1><p>Content rev "), seq, F.lit(" for "), url,
        F.lit(".</p><script>var rev="), seq,
        F.lit(";</script></body></html>"),
    )
    lang = F.element_at(
        F.array(*[F.lit(lg) for lg in LANGS]),
        (_mix_col(seq, 5) % len(LANGS) + 1).cast("int"),
    )
    is_del = op == "D"
    base = spark.range(0, n, 1, num_partitions) if num_partitions else spark.range(n)
    cols = [
        seq.alias("seq"),
        op.alias("op"),
        url.alias("url"),
        F.timestamp_seconds(F.lit(BASE_EPOCH) + seq + jitter).alias("warc_ts"),
        F.when(is_del, F.lit(None).cast("binary"))
        .otherwise(F.encode(html_str, "UTF-8"))
        .alias("html"),
        F.when(is_del, F.lit(None).cast("string")).otherwise(lang).alias(
            "language" if rename_lang else "lang"
        ),
        F.concat(F.lit("feed-"), seq % 4).alias("source"),
        (seq / epoch_size).cast("int").alias("epoch_hint"),
    ]
    if add_title:
        cols.append(
            F.when(is_del, F.lit(None).cast("string"))
            .otherwise(F.concat(F.lit("Page "), page, F.lit(" of d"), domain))
            .alias("title")
        )
    df = base.select(*cols)
    if not rename_lang and not add_title:
        # pin exact field order/nullability to the declared envelope
        df = df.select([F.col(f.name) for f in EVENT_SCHEMA.fields])
    return df


def gen_entity_feed_df(
    spark: SparkSession,
    n: int,
    n_domains: int = DEFAULT_N_DOMAINS,
    pages_per_domain: int = DEFAULT_PAGES_PER_DOMAIN,
    epoch_size: int = EPOCH_SIZE,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic discriminated multi-entity feed (page + domain) for
    the q51-shaped pipeline at bench scale: every 11th event is a domain
    event, the rest are page events carrying a domain FK; same mixer,
    same hot-domain skew, and ops derived like `gen_feed_df` so the
    entity bench exercises the identical write distribution."""
    seq = F.col("id")
    h1 = _mix_col(seq, 1)
    domain = F.when(h1 % 100 < HOT_PCT, F.lit(0)).otherwise(
        1 + F.pmod(F.floor(h1 / 100), F.lit(n_domains - 1))
    )
    page = _mix_col(seq, 2) % pages_per_domain
    h3 = _mix_col(seq, 3) % 10
    op = (
        F.when(h3 == 0, F.lit("D"))
        .when(h3 <= 4, F.lit("I"))
        .otherwise(F.lit("U"))
    )
    jitter = _mix_col(seq, 4) % 1201 - 600
    dom = F.concat(F.lit("d"), domain, F.lit(".example.com"))
    url = F.concat(F.lit("https://"), dom, F.lit("/p/"), page)
    is_dom = (seq % 11) == 0
    base = spark.range(0, n, 1, num_partitions) if num_partitions else spark.range(n)
    return base.select(
        F.when(is_dom, F.lit("domain")).otherwise(F.lit("page")).alias("entity_type"),
        op.alias("op"),
        seq.alias("seq"),
        F.timestamp_seconds(F.lit(BASE_EPOCH) + seq + jitter).alias("warc_ts"),
        url.alias("url"),
        dom.alias("dom"),
        F.concat(F.lit("r"), _mix_col(seq, 6) % 5).alias("registrar"),
        (seq / epoch_size).cast("int").alias("epoch_hint"),
    )


def write_feed_files(
    spark: SparkSession, out_dir: str, n: int, files: int, **kwargs
) -> list[str]:
    """Write the feed as `files` flat parquet files (one per seq range) so
    a file-tailing readStream sees an append-only WAL directory — the
    analog of the reference's GELF/event tail (SURVEY.md §2.1 S1/S2)."""
    return _write_ranged_files(spark, gen_feed_df, out_dir, n, files, **kwargs)


def write_entity_feed_files(
    spark: SparkSession, out_dir: str, n: int, files: int, **kwargs
) -> list[str]:
    """`write_feed_files` for the discriminated multi-entity feed —
    feeds `run_entity_stream` the same append-only WAL shape."""
    return _write_ranged_files(
        spark, gen_entity_feed_df, out_dir, n, files, **kwargs
    )


def _write_ranged_files(
    spark: SparkSession, gen, out_dir: str, n: int, files: int, **kwargs
) -> list[str]:
    import glob as _glob
    import os
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    per = max(1, n // files)
    paths = []
    for i in range(files):
        lo, hi = i * per, ((i + 1) * per if i < files - 1 else n)
        if lo >= n:
            break
        part = gen(spark, hi, **kwargs).filter(F.col("seq") >= lo)
        tmp = os.path.join(out_dir, f"_tmp-{i:05d}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(out_dir, f"feed-{i:05d}.parquet")
        shutil.move(src, dst)
        shutil.rmtree(tmp)
        paths.append(dst)
    return paths
