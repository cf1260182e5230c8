"""Operator-coverage query registry (SURVEY.md §2) with DuckDB oracles.

Each entry pairs a Spark DataFrame query (the engine-side implementation,
demonstrating the operator Spark-first) with an ANSI-SQL oracle string
that DuckDB runs on the same parquet tables. Column names are aliased
identically on both sides; float reductions go through DECIMAL so the
result is order-independent and bit-stable across engines.

Naming: qNN_<operator>; the SURVEY.md §2 row it covers is cited in each
docstring/comment.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qwatch_spark.operators.dedup import latest_wins
from qwatch_spark.operators.dedup_text import (
    exact_duplicates,
    lsh_candidate_pairs,
    near_dup_pairs,
    minhash_signatures,
    minhash_signatures_char,
    simhash,
    tfidf,
)
from qwatch_spark.operators.similarity import (
    ann_topk_lsh,
    cosine_near_dup_pairs,
    cosine_topk,
    cosine_topk_fast,
    ivf_topk,
)
from qwatch_spark.operators.textstats import (
    LANG_MARKERS,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    winnow_fingerprints,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


def ld(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec_rev(price: str, disc: str) -> F.Column:
    """Order-independent revenue sum: product → DECIMAL → exact sum."""
    prod = (F.col(price) * (1 - F.col(disc))).cast("decimal(18,6)")
    return F.round(F.sum(prod).cast("double"), 4)


# --------------------------------------------------------------------------
# §2.5/2.6 dedup & CDC state (W1, K4/K5 SQL-expressible form)
# --------------------------------------------------------------------------

def q01_dedup_latest(spark, sf_dir):
    ev = ld(spark, sf_dir, "events")
    out = latest_wins(ev, key="user_id", order=("ts", "event_id"))
    return out.select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    )


SQL_DEDUP_LATEST = """
SELECT user_id, ts AS last_ts, event_type AS last_type, value AS last_value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
WHERE rn = 1
"""


def q02_dedup_latest_salted(spark, sf_dir):
    """Same result via the explicit two-phase salted path (skew handling)."""
    ev = ld(spark, sf_dir, "events")
    out = latest_wins(ev, key="user_id", order=("ts", "event_id"), n_salt=8)
    return out.select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    )


def q03_cdc_final_state(spark, sf_dir):
    """CDC apply in SQL-expressible form: latest event per key wins,
    'error' acts as the delete opcode (K4/K5 semantics)."""
    ev = ld(spark, sf_dir, "events")
    latest = latest_wins(ev, key="user_id", order=("ts", "event_id"))
    return latest.filter(F.col("event_type") != "error").select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("value").alias("last_value"),
    )


SQL_CDC_FINAL_STATE = """
SELECT user_id, ts AS last_ts, value AS last_value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
WHERE rn = 1 AND event_type <> 'error'
"""


# --------------------------------------------------------------------------
# §2.2/2.3 projections & filters (P1-P8, F1)
# --------------------------------------------------------------------------

def q04_filter_router(spark, sf_dir):
    ev = ld(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


SQL_FILTER_ROUTER = """
SELECT event_type, count(*) AS n FROM events
WHERE event_type IN ('click', 'view') GROUP BY event_type
"""


def q05_project_envelope(spark, sf_dir):
    """P1: concat type.action into msg + timestamp formatting (P7)."""
    ev = ld(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") < 100).select(
        "event_id",
        F.concat_ws(".", F.lit("event"), F.col("event_type")).alias("msg"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    )


SQL_PROJECT_ENVELOPE = """
SELECT event_id, 'event' || '.' || event_type AS msg,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
FROM events WHERE event_id < 100
"""


def q06_json_attr_extract(spark, sf_dir):
    """P2: attribute-map access (Actor.Attributes analog) from the props
    JSON payload, then a grouped rollup."""
    ev = ld(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), '"k": (\\d+)', 1).cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("k_sum"),
            F.count("*").alias("n"),
            F.round(F.sum("k") / F.count("*"), 6).alias("k_avg"),
        )
    )


SQL_JSON_ATTR_EXTRACT = """
SELECT event_type,
       CAST(SUM(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT))
            AS BIGINT) AS k_sum,
       count(*) AS n,
       ROUND(CAST(SUM(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT))
                  AS BIGINT) * 1.0 / count(*), 6) AS k_avg
FROM events GROUP BY event_type
"""


def q07_nested_struct_roundtrip(spark, sf_dir):
    """P3: flat→nested→flat re-projection (GELF envelope analog)."""
    ev = ld(spark, sf_dir, "events")
    nested = ev.filter(F.col("event_id") < 50).select(
        "event_id",
        F.struct(
            F.col("user_id").alias("uid"), F.col("event_type").alias("etype")
        ).alias("envelope"),
    )
    return nested.select(
        "event_id",
        F.col("envelope.uid").alias("uid"),
        F.col("envelope.etype").alias("etype"),
    )


SQL_NESTED_STRUCT = """
SELECT event_id, user_id AS uid, event_type AS etype
FROM events WHERE event_id < 50
"""


def q08_parse_parts(spark, sf_dir):
    """P4 ParseImageName analog: split a composite name into parts."""
    part = ld(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return part.select(
        "p_partkey",
        F.element_at(toks, 1).alias("first_word"),
        F.element_at(toks, F.size(toks)).alias("last_word"),
        F.size(toks).alias("n_words"),
    )


SQL_PARSE_PARTS = """
SELECT p_partkey,
       string_split(p_name, ' ')[1] AS first_word,
       list_extract(string_split(p_name, ' '), len(string_split(p_name, ' '))) AS last_word,
       len(string_split(p_name, ' ')) AS n_words
FROM part
"""


def q09_scalar_string_funcs(spark, sf_dir):
    """P5/P6/P8 in one query (registry consolidation, round 4): sentinel
    filter (the '<none>:<none>' analog), regexp name trim, and
    Sprintf-style padded formatting + rtrim — the scalar string-function
    family the reference spreads over String()/Sprintf/TrimSpace
    (/root/reference/inputs/gelf.go:83-101, outputs/neo4j.go:198-205)."""
    docs = ld(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("source") != "src0")
        .groupBy(F.regexp_replace("source", "^src", "").alias("source_id"))
        .agg(F.count("*").alias("n_docs"))
        .select(
            "source_id",
            F.rtrim(F.format_string("src %-8s", F.col("source_id"))).alias("label"),
            "n_docs",
        )
    )


SQL_SCALAR_STRING = """
SELECT source_id, rtrim(printf('src %-8s', source_id)) AS label, n_docs
FROM (
  SELECT regexp_replace(source, '^src', '') AS source_id, count(*) AS n_docs
  FROM documents WHERE source <> 'src0' GROUP BY 1
) t
"""


# --------------------------------------------------------------------------
# §2.4 joins (J1-J5)
# --------------------------------------------------------------------------

def q11_fk_broadcast_join(spark, sf_dir):
    """J1: FK equi-join to a small dimension — broadcast, but DECIDED BY
    AQE, not a hint: `part` grows linearly with scale factor, so a forced
    broadcast is a driver OOM at 100×. AQE broadcasts while it fits and
    degrades to a shuffle join when it doesn't (plan-asserted at test
    scale); only constant-size dims (nation/region) carry explicit
    hints anywhere in this module."""
    li = ld(spark, sf_dir, "lineitem")
    part = ld(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            _dec_rev("l_extendedprice", "l_discount").alias("revenue"),
        )
    )


SQL_FK_BROADCAST_JOIN = """
SELECT p_brand, count(*) AS n_items,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                  AS DOUBLE), 4) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q12_join_chain(spark, sf_dir):
    """J2/J3: multi-hop dimension chain customer→nation→region."""
    c = ld(spark, sf_dir, "customer")
    n = ld(spark, sf_dir, "nation")
    r = ld(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double"), 2
            ).alias("total_bal"),
        )
    )


SQL_JOIN_CHAIN = """
SELECT r_name, n_name, count(*) AS n_cust,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q13_two_key_pair_join(spark, sf_dir):
    """J4: equi-join on BOTH keys (container↔network connect analog):
    co-typed event pairs per user."""
    ev = ld(spark, sf_dir, "events").select("user_id", "event_type", "event_id")
    e1, e2 = ev.alias("e1"), ev.alias("e2")
    return (
        e1.join(
            e2,
            (F.col("e1.user_id") == F.col("e2.user_id"))
            & (F.col("e1.event_type") == F.col("e2.event_type"))
            & (F.col("e1.event_id") < F.col("e2.event_id")),
        )
        .groupBy(F.col("e1.event_type").alias("event_type"))
        .agg(F.count("*").alias("n_pairs"))
    )


SQL_TWO_KEY_PAIR_JOIN = """
SELECT e1.event_type AS event_type, count(*) AS n_pairs
FROM events e1 JOIN events e2
  ON e1.user_id = e2.user_id AND e1.event_type = e2.event_type
 AND e1.event_id < e2.event_id
GROUP BY e1.event_type
"""


def q14_anti_join_new_keys(spark, sf_dir):
    """J5/K4 create-if-absent analog: keys NOT present in the target."""
    c = ld(spark, sf_dir, "customer")
    o = ld(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_cust"))
    )


SQL_ANTI_JOIN = """
SELECT c_mktsegment, count(*) AS n_cust FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
GROUP BY c_mktsegment
"""


def q15_semi_join(spark, sf_dir):
    c = ld(spark, sf_dir, "customer")
    o = ld(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_cust"))
    )


SQL_SEMI_JOIN = """
SELECT c_mktsegment, count(*) AS n_cust FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# §2.5 aggregations / metrics rollups
# --------------------------------------------------------------------------

def q16_hourly_rollup(spark, sf_dir):
    """Metrics rollup (north_rule lineage analog): per hour."""
    ev = ld(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
    )


SQL_HOURLY_ROLLUP = """
SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
       count(DISTINCT user_id) AS n_users,
       min(event_id) AS min_id, max(event_id) AS max_id
FROM events GROUP BY 1
"""


def q17_opcode_counts(spark, sf_dir):
    """F3: per-action opcode derivation (I/U/D) + count_if rollup."""
    ev = ld(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "error", "D")
        .when(F.col("event_type").isin("click", "purchase"), "U")
        .otherwise("I")
    )
    return ev.select(op.alias("op")).agg(
        F.count_if(F.col("op") == "I").alias("n_insert"),
        F.count_if(F.col("op") == "U").alias("n_update"),
        F.count_if(F.col("op") == "D").alias("n_delete"),
    )


SQL_OPCODE_COUNTS = """
SELECT count(*) FILTER (WHERE op = 'I') AS n_insert,
       count(*) FILTER (WHERE op = 'U') AS n_update,
       count(*) FILTER (WHERE op = 'D') AS n_delete
FROM (SELECT CASE WHEN event_type = 'error' THEN 'D'
                  WHEN event_type IN ('click', 'purchase') THEN 'U'
                  ELSE 'I' END AS op
      FROM events) t
"""


# --------------------------------------------------------------------------
# §2.6 window functions (W1/W2)
# --------------------------------------------------------------------------

def q18_scd2_intervals(spark, sf_dir):
    """W2: SCD2 validity intervals via lead()."""
    from pyspark.sql import Window as W

    ev = ld(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )


SQL_SCD2 = """
SELECT event_id, user_id, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
FROM events WHERE user_id < 5
"""


def q19_topk_per_group(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = ld(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = W.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "value", "rn")
    )


SQL_TOPK_PER_GROUP = """
SELECT user_id, event_id, value, rn
FROM (SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn
      FROM events WHERE user_id < 20) t
WHERE rn <= 3
"""


def q20_running_sum(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = ld(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    running = F.sum(F.col("value").cast("decimal(18,6)")).over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.round(running.cast("double"), 4).alias("running_value"),
    )


SQL_RUNNING_SUM = """
SELECT event_id, user_id,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE), 4) AS running_value
FROM events WHERE user_id < 10
"""


# --------------------------------------------------------------------------
# §2.7 sorts / limits / set ops
# --------------------------------------------------------------------------

def q21_sort_limit(spark, sf_dir):
    o = ld(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .limit(20)
    )


SQL_SORT_LIMIT = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


def q22_except_keys(spark, sf_dir):
    """§2.7: set difference — clicked users minus errored users."""
    ev = ld(spark, sf_dir, "events")
    clicked = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    errored = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    return clicked.exceptAll(errored)


SQL_EXCEPT_KEYS = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
"""


def q23_union_branches(spark, sf_dir):
    """§2.7: per-branch apply sets reunited (insert/update/delete union)."""
    ev = ld(spark, sf_dir, "events")

    def branch(t):
        return (
            ev.filter(F.col("event_type") == t)
            .agg(F.count("*").alias("n"))
            .select(F.lit(t).alias("branch"), "n")
        )

    return branch("click").unionByName(branch("error")).unionByName(branch("view"))


SQL_UNION_BRANCHES = """
SELECT 'click' AS branch, count(*) AS n FROM events WHERE event_type = 'click'
UNION ALL
SELECT 'error' AS branch, count(*) AS n FROM events WHERE event_type = 'error'
UNION ALL
SELECT 'view' AS branch, count(*) AS n FROM events WHERE event_type = 'view'
"""


# --------------------------------------------------------------------------
# §2.8/2.9 explode (K6) + tumbling window
# --------------------------------------------------------------------------

def q24_explode_wordcount(spark, sf_dir):
    """K6: array-valued attribute explode (RepoTags analog) + rollup."""
    docs = ld(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


SQL_EXPLODE_WORDCOUNT = """
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
WHERE word <> '' GROUP BY word ORDER BY n DESC, word LIMIT 20
"""


def q25_tumbling_window(spark, sf_dir):
    """§2.9: tumbling event-time window (metrics cadence)."""
    ev = ld(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("n_users"))
        .select(F.col("w.start").alias("w_start"), "n", "n_users")
    )


SQL_TUMBLING_WINDOW = """
SELECT CAST(to_timestamp(floor(epoch(ts) / 900) * 900) AS TIMESTAMP) AS w_start,
       count(*) AS n, count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""


# --------------------------------------------------------------------------
# training-data ops: dedup family
# --------------------------------------------------------------------------

def q26_exact_dup_groups(spark, sf_dir):
    return exact_duplicates(ld(spark, sf_dir, "documents"))


SQL_EXACT_DUP = """
SELECT md5(text) AS digest, min(doc_id) AS canonical_doc, count(*) AS n_docs
FROM documents GROUP BY md5(text) HAVING count(*) > 1
"""

_WORDS_CTE = """
WITH words AS (
  SELECT DISTINCT doc_id, word
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) t
  WHERE word <> ''
)
"""


def q27_minhash_signatures(spark, sf_dir):
    return minhash_signatures(ld(spark, sf_dir, "documents"), n_hashes=4)


SQL_MINHASH = _WORDS_CTE + """
SELECT doc_id,
       min(md5('0|' || word)) AS mh0, min(md5('1|' || word)) AS mh1,
       min(md5('2|' || word)) AS mh2, min(md5('3|' || word)) AS mh3
FROM words GROUP BY doc_id
"""


def _lsh_cand_cte(n_hashes: int, band_size: int) -> str:
    """sig → bands → cand CTEs matching lsh_candidate_pairs(n_hashes,
    band_size) exactly (same md5 hash family, same band bucketing)."""
    mins = ",\n         ".join(
        f"min(md5('{i}|' || word)) AS mh{i}" for i in range(n_hashes)
    )
    bands = []
    for b in range(n_hashes // band_size):
        cols = " || '|' || ".join(
            f"mh{b * band_size + j}" for j in range(band_size)
        )
        bands.append(f"  SELECT doc_id, {b} AS band, md5({cols}) AS bucket FROM sig")
    return (
        f", sig AS (\n  SELECT doc_id,\n         {mins}\n"
        "  FROM words GROUP BY doc_id\n), bands AS (\n"
        + "\n  UNION ALL\n".join(bands)
        + "\n), cand AS (\n"
        "  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b\n"
        "  FROM bands l JOIN bands r\n"
        "    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id\n)"
    )


def q28_lsh_candidate_pairs(spark, sf_dir):
    return lsh_candidate_pairs(
        ld(spark, sf_dir, "documents"), n_hashes=16, band_size=4
    )


SQL_LSH_PAIRS = (
    _WORDS_CTE + _lsh_cand_cte(16, 4) + "\nSELECT doc_a, doc_b FROM cand"
)


def _simhash_sql(n_bits: int = 16) -> str:
    votes = ",\n".join(
        "SUM(CASE WHEN substring(md5(word), {p}, 1) IN "
        "('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS v{j}".format(
            p=j + 1, j=j
        )
        for j in range(n_bits)
    )
    bits = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << (n_bits - 1 - j)} ELSE 0 END)"
        for j in range(n_bits)
    )
    return (
        _WORDS_CTE
        + f", agg AS (SELECT doc_id, {votes} FROM words GROUP BY doc_id)\n"
        + f"SELECT doc_id, CAST({bits} AS INT) AS simhash FROM agg"
    )


def q29_simhash(spark, sf_dir):
    return simhash(ld(spark, sf_dir, "documents"), n_bits=16)


SQL_SIMHASH = _simhash_sql(16)


def q30_near_dup_pairs(spark, sf_dir):
    """Composed LSH→Jaccard near-dup: candidates from the 16×4 sieve,
    exact Jaccard refined on candidates only (the scale plan — the old
    exhaustive word↔word self-join is retired to a small-n test helper)."""
    return near_dup_pairs(
        ld(spark, sf_dir, "documents"), n_hashes=16, band_size=4, threshold=0.5
    )


SQL_NEAR_DUP_PAIRS = _WORDS_CTE + _lsh_cand_cte(16, 4) + """
, sizes AS (SELECT doc_id, count(*) AS n_words FROM words GROUP BY doc_id),
common AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN words w1 ON w1.doc_id = c.doc_a
  JOIN words w2 ON w2.doc_id = c.doc_b AND w2.word = w1.word
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(n_common * 1.0 / (s1.n_words + s2.n_words - n_common), 6) AS jaccard
FROM common
JOIN sizes s1 ON s1.doc_id = doc_a
JOIN sizes s2 ON s2.doc_id = doc_b
WHERE ROUND(n_common * 1.0 / (s1.n_words + s2.n_words - n_common), 6) >= 0.5
"""


def q46_minhash_char_shingles(spark, sf_dir):
    """Char-trigram shingle MinHash (docs < 50 — shingle explosion is
    length(text)× rows; at scale you'd sample or hash-prefilter)."""
    docs = ld(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return minhash_signatures_char(docs, n=3, n_hashes=4)


SQL_MINHASH_CHAR = """
WITH idx AS (SELECT CAST(i AS INT) AS i FROM range(1, 100000) t(i)),
shingles AS (
  SELECT DISTINCT doc_id, substr(text, i, 3) AS word
  FROM documents JOIN idx ON i <= length(text) - 2
  WHERE doc_id < 50
)
SELECT doc_id,
       min(md5('0|' || word)) AS mh0, min(md5('1|' || word)) AS mh1,
       min(md5('2|' || word)) AS mh2, min(md5('3|' || word)) AS mh3
FROM shingles GROUP BY doc_id
"""


def q47_tfidf(spark, sf_dir):
    docs = ld(spark, sf_dir, "documents")
    return tfidf(docs).filter(F.col("doc_id") < 20)


SQL_TFIDF = """
WITH words AS (
  SELECT doc_id, word
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) t
  WHERE word <> ''
), tf AS (
  SELECT doc_id, word, count(*) AS tf FROM words GROUP BY doc_id, word
), dfc AS (
  SELECT word, count(*) AS df
  FROM (SELECT DISTINCT doc_id, word FROM words) d GROUP BY word
)
SELECT tf.doc_id, tf.word, tf.tf, dfc.df,
       ROUND(tf.tf * ln((SELECT count(*) FROM documents) * 1.0 / dfc.df), 6) AS tfidf
FROM tf JOIN dfc USING (word)
WHERE tf.doc_id < 20
"""


# --------------------------------------------------------------------------
# training-data ops: similarity search
# --------------------------------------------------------------------------

_EMB_CTE = """
WITH e AS (
  SELECT vec_id, CAST(x AS DOUBLE) AS xd, i
  FROM (SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings) t
),
norms AS (
  SELECT vec_id,
         CAST(SUM(CAST(xd * xd AS DECIMAL(30,15))) AS DOUBLE) AS nsq
  FROM e GROUP BY vec_id
)
"""


def q31_cosine_topk(spark, sf_dir):
    return cosine_topk(ld(spark, sf_dir, "embeddings"), query_id=0, k=10)


SQL_COSINE_TOPK = _EMB_CTE + """
, q AS (SELECT i, xd AS qx FROM e WHERE vec_id = 0),
dots AS (
  SELECT e.vec_id,
         CAST(SUM(CAST(e.xd * q.qx AS DECIMAL(30,15))) AS DOUBLE) AS dot
  FROM e JOIN q ON e.i = q.i
  WHERE e.vec_id <> 0 GROUP BY e.vec_id
)
SELECT d.vec_id AS vec_id,
       ROUND(d.dot / (sqrt(n.nsq) * sqrt(nq.nsq)), 9) AS cosine
FROM dots d
JOIN norms n ON n.vec_id = d.vec_id
CROSS JOIN (SELECT nsq FROM norms WHERE vec_id = 0) nq
ORDER BY cosine DESC, vec_id LIMIT 10
"""


def _rand_planes_cte(n_planes: int = 16, n_bands: int = 2, dim: int = 64, seed: int = 7) -> str:
    """planes → per-plane decimal dots → banded sign buckets, matching
    lsh_rand_buckets(n_planes, n_bands, dim, seed) exactly (same seeded
    integer coefficient matrix, inlined as a VALUES literal)."""
    from qwatch_spark.operators.similarity import plane_coeffs

    coeffs = plane_coeffs(n_planes, dim, seed)
    bpb = n_planes // n_bands
    vals = ", ".join(
        f"({p}, {j + 1}, {coeffs[p][j]})"
        for p in range(n_planes)
        for j in range(dim)
    )
    wvals = ", ".join(
        f"({p}, {p // bpb}, {1 << (bpb - 1 - p % bpb)})" for p in range(n_planes)
    )
    return f"""
, planes(p, i, c) AS (VALUES {vals}),
pw(p, band, w) AS (VALUES {wvals}),
pdots AS (
  SELECT e.vec_id, pl.p,
         CAST(SUM(CAST(e.xd * pl.c AS DECIMAL(30,15))) AS DOUBLE) AS d
  FROM e JOIN planes pl ON pl.i = e.i
  GROUP BY e.vec_id, pl.p
),
b AS (
  SELECT pd.vec_id, pw.band,
         CAST(SUM(CASE WHEN pd.d >= 0 THEN pw.w ELSE 0 END) AS INT) AS bucket
  FROM pdots pd JOIN pw ON pw.p = pd.p
  GROUP BY pd.vec_id, pw.band
)"""


def q32_ann_lsh_topk(spark, sf_dir):
    return ann_topk_lsh(
        ld(spark, sf_dir, "embeddings"), query_id=0, k=10, n_planes=16, n_bands=8
    )


SQL_ANN_LSH_TOPK = _EMB_CTE + _rand_planes_cte(16, 8) + """
, qb AS (SELECT band, bucket FROM b WHERE vec_id = 0),
cand AS (SELECT DISTINCT b.vec_id
         FROM b JOIN qb ON b.band = qb.band AND b.bucket = qb.bucket
         WHERE b.vec_id <> 0),
q AS (SELECT i, xd AS qx FROM e WHERE vec_id = 0),
dots AS (
  SELECT e.vec_id,
         CAST(SUM(CAST(e.xd * q.qx AS DECIMAL(30,15))) AS DOUBLE) AS dot
  FROM e JOIN q ON e.i = q.i
  WHERE e.vec_id IN (SELECT vec_id FROM cand)
  GROUP BY e.vec_id
)
SELECT d.vec_id AS vec_id,
       ROUND(d.dot / (sqrt(n.nsq) * sqrt(nq.nsq)), 9) AS cosine
FROM dots d
JOIN norms n ON n.vec_id = d.vec_id
CROSS JOIN (SELECT nsq FROM norms WHERE vec_id = 0) nq
ORDER BY cosine DESC, vec_id LIMIT 10
"""


def q33_embedding_near_dups(spark, sf_dir):
    return cosine_near_dup_pairs(
        ld(spark, sf_dir, "embeddings"), threshold=0.25, n_planes=16, n_bands=4
    )


SQL_NEAR_DUPS = _EMB_CTE + _rand_planes_cte(16, 4) + """
, pairs AS (
  SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
  FROM b l JOIN b r
    ON l.band = r.band AND l.bucket = r.bucket AND l.vec_id < r.vec_id
),
dots AS (
  SELECT p.id_a, p.id_b,
         CAST(SUM(CAST(ea.xd * eb.xd AS DECIMAL(30,15))) AS DOUBLE) AS dot
  FROM pairs p
  JOIN e ea ON ea.vec_id = p.id_a
  JOIN e eb ON eb.vec_id = p.id_b AND eb.i = ea.i
  GROUP BY p.id_a, p.id_b
)
SELECT d.id_a, d.id_b,
       ROUND(d.dot / (sqrt(na.nsq) * sqrt(nb.nsq)), 9) AS cosine
FROM dots d
JOIN norms na ON na.vec_id = d.id_a
JOIN norms nb ON nb.vec_id = d.id_b
WHERE ROUND(d.dot / (sqrt(na.nsq) * sqrt(nb.nsq)), 9) >= 0.25
"""


def q52_ivf_topk(spark, sf_dir):
    """IVF-style ANN: deterministic medoid coarse quantizer (seeds =
    lowest vec_ids), probe the 2 nearest of 8 cells, exact cosine top-k
    on the probed cells only — the inverted-file scale path."""
    return ivf_topk(
        ld(spark, sf_dir, "embeddings"), query_id=0, k=10, n_cells=8, n_probe=2
    )


SQL_IVF_TOPK = _EMB_CTE + """
, sim AS (
  SELECT a.vec_id, b.vec_id AS cell,
         ROUND(CAST(SUM(CAST(a.xd * b.xd AS DECIMAL(30,15))) AS DOUBLE)
               / (sqrt(na.nsq) * sqrt(nb.nsq)), 9) AS sim
  FROM e a JOIN e b ON b.i = a.i AND b.vec_id < 8
  JOIN norms na ON na.vec_id = a.vec_id
  JOIN norms nb ON nb.vec_id = b.vec_id
  GROUP BY a.vec_id, b.vec_id, na.nsq, nb.nsq
),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell ASC) AS rn
    FROM sim
  ) t WHERE rn = 1
),
probe AS (SELECT cell FROM sim WHERE vec_id = 0 ORDER BY sim DESC, cell LIMIT 2),
cand AS (
  SELECT a.vec_id FROM assigned a JOIN probe p ON a.cell = p.cell
  WHERE a.vec_id <> 0
),
q AS (SELECT i, xd AS qx FROM e WHERE vec_id = 0),
dots AS (
  SELECT e.vec_id,
         CAST(SUM(CAST(e.xd * q.qx AS DECIMAL(30,15))) AS DOUBLE) AS dot
  FROM e JOIN q ON e.i = q.i
  WHERE e.vec_id IN (SELECT vec_id FROM cand)
  GROUP BY e.vec_id
)
SELECT d.vec_id AS vec_id,
       ROUND(d.dot / (sqrt(n.nsq) * sqrt(nq.nsq)), 9) AS cosine
FROM dots d
JOIN norms n ON n.vec_id = d.vec_id
CROSS JOIN (SELECT nsq FROM norms WHERE vec_id = 0) nq
ORDER BY cosine DESC, vec_id LIMIT 10
"""


# --------------------------------------------------------------------------
# training-data ops: text analysis
# --------------------------------------------------------------------------

def q34_lang_id(spark, sf_dir):
    return lang_id(ld(spark, sf_dir, "documents"))


def _lang_sql() -> str:
    counts = ",\n".join(
        "len(regexp_extract_all(text, '\\b({alts})\\b')) AS n_{lg}".format(
            alts="|".join(words), lg=lg
        )
        for lg, words in LANG_MARKERS.items()
    )
    langs = list(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"n_{lg}" for lg in langs) + ")"
    case = "CASE WHEN {b} = 0 THEN 'und' ".format(b=best) + " ".join(
        f"WHEN n_{lg} = {best} THEN '{lg}'" for lg in langs
    ) + " END"
    return (
        f"WITH scored AS (SELECT doc_id, {counts} FROM documents)\n"
        f"SELECT doc_id, {case} AS pred_lang, {best} AS marker_hits FROM scored"
    )


SQL_LANG_ID = _lang_sql()


def q35_token_count(spark, sf_dir):
    return token_count(ld(spark, sf_dir, "documents"))


SQL_TOKEN_COUNT = """
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
       length(text) AS n_chars_obs
FROM documents
"""


def q36_quality_score(spark, sf_dir):
    return quality_score(ld(spark, sf_dir, "documents"))


SQL_QUALITY = """
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       ROUND(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0
             / greatest(length(text), 1), 6) AS punct_ratio,
       ROUND(len(regexp_extract_all(text, '\\b(the|a|of|and)\\b')) * 1.0
             / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6)
         AS stopword_ratio,
       ROUND(0.5 * least(len(string_split_regex(trim(text), '\\s+')) / 100.0, 1.0)
             + 0.3 * ROUND(len(regexp_extract_all(text, '\\b(the|a|of|and)\\b')) * 1.0
                           / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6)
             + 0.2 * (1 - ROUND(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0
                                / greatest(length(text), 1), 6)), 6) AS quality
FROM documents
"""


def q37_fingerprint(spark, sf_dir):
    return fingerprint(ld(spark, sf_dir, "documents"))


SQL_FINGERPRINT = """
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""


def q53_winnow_fingerprints(spark, sf_dir):
    """Winnowing (MOSS) fingerprints: min-hash of each sliding w-window
    of k-gram hashes, per doc (docs < 50 — k-gram explosion is
    length(text)× rows, same caveat as q46)."""
    docs = ld(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return winnow_fingerprints(docs, k=5, w=4)


SQL_WINNOW = """
WITH idx AS (SELECT CAST(i AS INT) AS i FROM range(1, 100000) t(i)),
grams AS (
  SELECT doc_id, i, md5(substr(text, i, 5)) AS h, length(text) - 4 AS n
  FROM documents JOIN idx ON i <= length(text) - 4
  WHERE doc_id < 50
),
wins AS (
  SELECT doc_id, i, n,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM grams
)
SELECT DISTINCT doc_id, fp FROM wins WHERE i <= n - 3
"""


# --------------------------------------------------------------------------
# classic analytics (agg strength) + time-ordered operators
# --------------------------------------------------------------------------

def q39_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary (decimal-exact sums)."""
    li = ld(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "1998-09-02"
    )
    dec = lambda c: F.col(c).cast("decimal(18,6)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")).cast("double"), 4).alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")).cast("double"), 4).alias("sum_base"),
            _dec_rev("l_extendedprice", "l_discount").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_base,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                  AS DOUBLE), 4) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus ORDER BY 1, 2
"""


def q40_asof_join(spark, sf_dir):
    """As-of join: each click sees the latest signup value ≤ its ts."""
    from qwatch_spark.operators.asof import asof_join
    from qwatch_spark.operators.dedup import latest_wins

    ev = ld(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", "value"
    )
    # deterministic right side: one row per (user, ts)
    signups = latest_wins(
        signups.withColumn("_k", F.concat_ws("|", "user_id", "ts")),
        key="_k",
        order=("value",),
    ).drop("_k")
    out = asof_join(clicks, signups, key="user_id", ts="ts")
    return out.select(
        "event_id", "user_id", "ts", F.col("value_asof").alias("signup_value")
    )


SQL_ASOF_JOIN = """
WITH signups AS (
  SELECT user_id, ts, max(value) AS value FROM events
  WHERE event_type = 'signup' GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id, c.ts,
       (SELECT s.value FROM signups s
        WHERE s.user_id = c.user_id AND s.ts <= c.ts
        ORDER BY s.ts DESC LIMIT 1) AS signup_value
FROM events c WHERE c.event_type = 'click'
"""


def q41_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) + per-session stats."""
    from qwatch_spark.operators.asof import session_stats

    ev = ld(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    return session_stats(ev, gap_minutes=30, order_tiebreak="event_id")


SQL_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM events WHERE user_id < 30
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
FROM sess GROUP BY user_id, session_id
"""


def q42_cube_rollup(spark, sf_dir):
    li = ld(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double"), 4
        ).alias("sum_qty"),
    )


SQL_CUBE_ROLLUP = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q43_pivot(spark, sf_dir):
    ev = ld(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "view", "error"])
    )


SQL_PIVOT = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS click,
       count(*) FILTER (WHERE event_type = 'view') AS view,
       count(*) FILTER (WHERE event_type = 'error') AS error
FROM events WHERE user_id < 10 GROUP BY user_id
"""


def q44_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group."""
    ev = ld(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
    )


SQL_PERCENTILES = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.9), 6) AS p90
FROM events GROUP BY event_type
"""


def q45_top_revenue_orders(spark, sf_dir):
    """TPC-H Q3-shaped: top-10 BUILDING-segment orders by revenue.
    `customer` scales linearly, so no broadcast hint — the segment filter
    is pushed to its scan and AQE broadcasts the filtered side only while
    it actually fits."""
    c = ld(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = ld(spark, sf_dir, "orders")
    li = ld(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(_dec_rev("l_extendedprice", "l_discount").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


SQL_TOP_REVENUE = """
SELECT o_orderkey, o_orderdate,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                  AS DOUBLE), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


def q54_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5-shaped: 6-table join (region→nation→customer/supplier→
    orders→lineitem) with the local-supplier condition
    (c_nationkey = s_nationkey). The join-reordering showcase: three tiny
    dims broadcast, the fact-side joins shuffle on their keys, the date
    filter pushes into the orders scan."""
    r = ld(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = ld(spark, sf_dir, "nation")
    c = ld(spark, sf_dir, "customer")
    s = ld(spark, sf_dir, "supplier")
    o = ld(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = ld(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_dec_rev("l_extendedprice", "l_discount").alias("revenue"))
    )


SQL_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                  AS DOUBLE), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def q48_intersect_keys(spark, sf_dir):
    """§2.7 set ops: users who both clicked and purchased."""
    ev = ld(spark, sf_dir, "events")
    clicked = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    bought = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return clicked.intersect(bought)


SQL_INTERSECT_KEYS = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
"""


def q49_rollup(spark, sf_dir):
    """ROLLUP hierarchy (region → nation) with subtotal rows."""
    c = ld(spark, sf_dir, "customer")
    n = ld(spark, sf_dir, "nation")
    r = ld(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(F.count("*").alias("n_cust"))


SQL_ROLLUP = """
SELECT r_name, n_name, count(*) AS n_cust
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q38_cosine_topk_fast(spark, sf_dir):
    """numpy/Arrow throughput variant of q31, oracle-checked against the
    SAME decimal-exact SQL as q31: both sides round cosine to 9 decimals,
    and at sf0.01 no pair sits within float64 error of a rounding
    boundary, so the hash comparison is exact (pytest additionally gates
    q38 ≈ q31 at 1e-9 as the tie-proof backstop)."""
    return cosine_topk_fast(ld(spark, sf_dir, "embeddings"), query_id=0, k=10)


# --------------------------------------------------------------------------
# engine-native ops (non-SQL-expressible → rows-only check)
# --------------------------------------------------------------------------

def q50_cdc_apply_e2e(spark, sf_dir):
    """Full engine path: generated change feed → rules → dedup → MERGE into
    a SnapshotTable → final live state, replayed over 2 epochs through the
    exactly-once commit protocol. ORACLE-CHECKED (hash-exact): the final
    state is replay-invariant (latest (warc_ts, seq) per url wins, 'D'
    tombstones, gates drop before merge), the feed generator is a pure
    LCG over seq (datagen._mix_py — every intermediate < 2^63), and
    extract_text on the generated html reduces to a deterministic string
    template — so SQL_CDC_APPLY_E2E rebuilds feed, gates, text, and
    final state entirely in DuckDB. The non-SQL parts (epoch commits,
    idempotence, crash replay) are pytest-covered against the dict-replay
    oracle (tests/oracle.py)."""
    import tempfile

    from qwatch_spark.config import PipelineConfig
    from qwatch_spark.datagen import gen_feed_df
    from qwatch_spark.operators.apply import replay_feed
    from qwatch_spark.plans.snapshot_table import SnapshotTable

    cfg = PipelineConfig(n_buckets=8)
    tmp = tempfile.mkdtemp(prefix="qwatch_cdc_e2e_")
    table = SnapshotTable.create(f"{tmp}/table", n_buckets=8)
    feed = gen_feed_df(spark, 2000)
    replay_feed(spark, feed, table, cfg)
    return table.read(spark).select("url", "warc_ts", "text", "lang")


# DuckDB twin of the WHOLE q50 pipeline. Mirrors, in order:
# datagen.gen_feed_df(n=2000) — mixer (seq*A + k*(B+C)) % 2^31 with
#   A=1103515245, B+C=2543356 (all intermediates < 2^63, so plain BIGINT
#   arithmetic is exact on both engines);
# rules valid_url (a no-op on generated urls — every url matches the
#   https?:// pattern), lang_gate (deletes always pass), extract_text
#   (the generated html strips to a fixed template — verified against
#   functions.text.extract_text_bytes);
# final state = latest (warc_ts, seq) per url, tombstones dropped —
#   replay-invariant, so the epoch split is irrelevant to the oracle.
SQL_CDC_APPLY_E2E = """
WITH raw AS (SELECT range AS seq FROM range(0, 2000)),
mixed AS (
  SELECT seq,
    (seq * 1103515245 + 1 * 2543356) % 2147483648 AS h1,
    (seq * 1103515245 + 2 * 2543356) % 2147483648 AS h2,
    ((seq * 1103515245 + 3 * 2543356) % 2147483648) % 10 AS h3,
    ((seq * 1103515245 + 4 * 2543356) % 2147483648) % 1201 - 600 AS jit,
    ((seq * 1103515245 + 5 * 2543356) % 2147483648) % 6 AS h5
  FROM raw),
feed AS (
  SELECT seq,
    CASE WHEN h3 = 0 THEN 'D' WHEN h3 <= 4 THEN 'I' ELSE 'U' END AS op,
    CASE WHEN h1 % 100 < 30 THEN 0 ELSE 1 + (h1 // 100) % 49 END AS dom,
    h2 % 200 AS pg,
    to_timestamp(1704067200 + seq + jit)::TIMESTAMP AS warc_ts,
    (['en','de','fr','es','zz','pt'])[h5 + 1] AS raw_lang
  FROM mixed),
ev AS (
  SELECT seq, op, warc_ts,
    concat('https://d', dom, '.example.com/p/', pg) AS url,
    CASE WHEN op = 'D' THEN NULL ELSE raw_lang END AS lang,
    CASE WHEN op = 'D' THEN NULL ELSE
      concat('Page ', pg, ' of d', dom, ' d', dom, '/', pg,
             ' Content rev ', seq, ' for https://d', dom,
             '.example.com/p/', pg, '.')
    END AS text
  FROM feed),
gated AS (
  SELECT * FROM ev WHERE op = 'D' OR lang IN ('en','de','fr','es')),
latest AS (
  SELECT *, row_number() OVER (
      PARTITION BY url ORDER BY warc_ts DESC, seq DESC) AS rn
  FROM gated)
SELECT url, warc_ts, text, lang FROM latest WHERE rn = 1 AND op <> 'D'
"""


def entity_feed_from_events(ev):
    """Deterministic page/domain entity feed derived from the events
    fixture (pure Column transforms — the SQL oracle derives the same
    feed): every 11th event is a domain event, the rest are page events
    carrying a domain FK."""
    uid, eid = F.col("user_id"), F.col("event_id")
    dom = F.concat(F.lit("d"), (uid % 20).cast("string"), F.lit(".ex"))
    is_dom = (eid % 11) == 0
    op = (
        F.when(F.col("event_type") == "error", "D")
        .when(F.col("event_type").isin("click", "purchase"), "U")
        .otherwise("I")
    )
    return ev.select(
        F.when(is_dom, F.lit("domain")).otherwise(F.lit("page")).alias("entity_type"),
        op.alias("op"),
        eid.cast("long").alias("seq"),
        F.col("ts").alias("warc_ts"),
        F.concat(F.lit("https://"), dom, F.lit("/p"), (eid % 150).cast("string")).alias(
            "url"
        ),
        dom.alias("dom"),
        F.concat(F.lit("r"), (uid % 5).cast("string")).alias("registrar"),
        (eid % 4).cast("int").alias("epoch_hint"),
    )


def entity_graph_specs():
    """page --dom--> domain graph + explicit page_domain link table
    (reference: the 8-type inventory switch at outputs/neo4j.go:484-504
    with container→image USE links at 287-294)."""
    from pyspark.sql import types as T

    from qwatch_spark.operators.entities import EntitySpec, LinkSpec

    page = EntitySpec(
        name="page",
        key_col="url",
        payload_schema=T.StructType(
            [
                T.StructField("url", T.StringType(), False),
                T.StructField("dom", T.StringType(), True),
                T.StructField("warc_ts", T.TimestampType(), True),
            ]
        ),
        fks=(("dom", "domain"),),
    )
    domain = EntitySpec(
        name="domain",
        key_col="dom",
        payload_schema=T.StructType(
            [
                T.StructField("dom", T.StringType(), False),
                T.StructField("registrar", T.StringType(), True),
                T.StructField("warc_ts", T.TimestampType(), True),
            ]
        ),
    )
    return [page, domain], [LinkSpec("page_domain", "page", "dom")]


def q51_multi_entity_apply(spark, sf_dir):
    """Multi-entity CDC apply: one discriminated feed routed to page +
    domain SnapshotTables with create-if-absent FK parents and an
    explicit link table, replayed over 4 epochs; result joins the two
    final states. Oracle-checked: the final state is replay-invariant,
    so plain SQL over the same derived feed reproduces it exactly."""
    import tempfile

    from qwatch_spark.operators.entities import (
        apply_entity_changes,
        create_entity_tables,
    )

    specs, links = entity_graph_specs()
    tmp = tempfile.mkdtemp(prefix="qwatch_entities_")
    tables = create_entity_tables(tmp, specs, links, n_buckets=8)
    feed = entity_feed_from_events(ld(spark, sf_dir, "events"))
    for e in range(4):
        batch = feed.filter(F.col("epoch_hint") == e).drop("epoch_hint")
        apply_entity_changes(spark, batch, specs, tables, e, links=links)

    pages = tables["page"].read(spark).alias("p")
    doms = tables["domain"].read(spark).alias("d")
    link_counts = (
        tables["page_domain"]
        .read(spark)
        .groupBy(F.col("dst").alias("dom"))
        .agg(F.countDistinct("src").alias("n_linked"))
        .alias("l")
    )
    return (
        doms.join(pages, F.col("p.dom") == F.col("d.dom"), "left")
        .groupBy(F.col("d.dom").alias("domain"), F.col("d.registrar").alias("registrar"))
        .agg(F.count(F.col("p.url")).alias("n_live_pages"))
        .join(link_counts, F.col("domain") == F.col("l.dom"), "left")
        .select(
            "domain",
            "registrar",
            "n_live_pages",
            F.coalesce(F.col("n_linked"), F.lit(0)).alias("n_linked_pages"),
        )
    )


SQL_MULTI_ENTITY = """
WITH feed AS (
  SELECT CASE WHEN event_id % 11 = 0 THEN 'domain' ELSE 'page' END AS entity_type,
         CASE WHEN event_type = 'error' THEN 'D'
              WHEN event_type IN ('click', 'purchase') THEN 'U'
              ELSE 'I' END AS op,
         event_id AS seq, ts AS warc_ts,
         'd' || (user_id % 20) || '.ex' AS dom,
         'https://d' || (user_id % 20) || '.ex/p' || (event_id % 150) AS url,
         'r' || (user_id % 5) AS registrar
  FROM events
),
page_ev AS (SELECT * FROM feed WHERE entity_type = 'page'),
dom_ev  AS (SELECT * FROM feed WHERE entity_type = 'domain'),
page_latest AS (
  SELECT url, dom, op,
         row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, seq DESC) AS rn
  FROM page_ev
),
page_final AS (SELECT url, dom FROM page_latest WHERE rn = 1 AND op <> 'D'),
dom_latest AS (
  SELECT dom, registrar, op,
         row_number() OVER (PARTITION BY dom ORDER BY warc_ts DESC, seq DESC) AS rn
  FROM dom_ev
),
dom_own AS (SELECT dom, registrar FROM dom_latest WHERE rn = 1 AND op <> 'D'),
dom_skel AS (
  SELECT DISTINCT p.dom FROM page_ev p
  WHERE p.op <> 'D' AND p.dom NOT IN (SELECT dom FROM dom_latest)
),
dom_final AS (
  SELECT dom, registrar FROM dom_own
  UNION ALL
  SELECT dom, NULL AS registrar FROM dom_skel
),
links AS (
  SELECT dom, CAST(count(DISTINCT url) AS BIGINT) AS n_linked_pages
  FROM page_ev WHERE op <> 'D' GROUP BY dom
)
SELECT d.dom AS domain, d.registrar AS registrar,
       CAST(count(p.url) AS BIGINT) AS n_live_pages,
       COALESCE(l.n_linked_pages, 0) AS n_linked_pages
FROM dom_final d
LEFT JOIN page_final p ON p.dom = d.dom
LEFT JOIN links l ON l.dom = d.dom
GROUP BY d.dom, d.registrar, l.n_linked_pages
"""


# --------------------------------------------------------------------------
# training-data mixing & packing (operators/sampling.py)
# --------------------------------------------------------------------------

SAMPLE_RATES = {"en": 0.5, "de": 0.25, "zh": 1.0}
SAMPLE_SEED = "mix-v1"
SAMPLE_DEFAULT = 0.1


def q55_stratified_sample(spark, sf_dir):
    """Deterministic per-stratum data mixing: keep each document with
    its language's probability, decided by md5(doc_id|seed) — a pure
    narrow filter (no shuffle, no RNG state), reproduced bit-for-bit by
    the SQL oracle because both engines compare the same md5 prefix to
    the same thresholds. Upweighting a stratum later only ADDS rows
    (nested thresholds), the property incremental corpus re-mixes need."""
    from qwatch_spark.operators.sampling import stratified_sample

    return stratified_sample(
        ld(spark, sf_dir, "documents"),
        strata_col="lang",
        rates=SAMPLE_RATES,
        key_col="doc_id",
        seed=SAMPLE_SEED,
        default_rate=SAMPLE_DEFAULT,
    ).select("doc_id", "lang", "source")


def _sample_sql() -> str:
    from qwatch_spark.operators.sampling import stratified_sample_sql

    return stratified_sample_sql(
        "documents",
        strata_col="lang",
        rates=SAMPLE_RATES,
        key_col="doc_id",
        seed=SAMPLE_SEED,
        default_rate=SAMPLE_DEFAULT,
        select="doc_id, lang, source",
    )


SQL_STRATIFIED_SAMPLE = _sample_sql()

PACK_SEQ_LEN = 512


def q56_pack_sequences(spark, sf_dir):
    """Concat-then-chunk sequence packing (GPT-style pretraining
    layout): every document's placement in the packed token stream —
    start offset, first/last chunk, offset within its first chunk.
    The global exclusive prefix sum underneath is the two-phase
    distributed scan (deterministic range ids from the order value, one
    small totals agg, per-range windows + broadcast offsets) — never a
    single-partition global window; chunk math is integer DIV/MOD on
    longs, exact past 2^53 tokens."""
    from qwatch_spark.operators.sampling import pack_sequences

    return pack_sequences(
        ld(spark, sf_dir, "documents"), seq_len=PACK_SEQ_LEN, order_col="doc_id"
    )


SQL_PACK_SEQUENCES = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
  FROM documents
),
placed AS (
  SELECT doc_id, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_tok
  FROM toks
)
SELECT doc_id, n_tok, start_tok,
       start_tok // {PACK_SEQ_LEN} AS pack_first,
       greatest(start_tok, start_tok + n_tok - 1) // {PACK_SEQ_LEN} AS pack_last,
       start_tok % {PACK_SEQ_LEN} AS pack_offset
FROM placed
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {
    "q01_dedup_latest": (q01_dedup_latest, SQL_DEDUP_LATEST),
    "q03_cdc_final_state": (q03_cdc_final_state, SQL_CDC_FINAL_STATE),
    "q04_filter_router": (q04_filter_router, SQL_FILTER_ROUTER),
    "q05_project_envelope": (q05_project_envelope, SQL_PROJECT_ENVELOPE),
    "q06_json_attr_extract": (q06_json_attr_extract, SQL_JSON_ATTR_EXTRACT),
    "q07_nested_struct_roundtrip": (q07_nested_struct_roundtrip, SQL_NESTED_STRUCT),
    "q08_parse_parts": (q08_parse_parts, SQL_PARSE_PARTS),
    "q09_scalar_string_funcs": (q09_scalar_string_funcs, SQL_SCALAR_STRING),
    "q11_fk_broadcast_join": (q11_fk_broadcast_join, SQL_FK_BROADCAST_JOIN),
    "q12_join_chain": (q12_join_chain, SQL_JOIN_CHAIN),
    "q13_two_key_pair_join": (q13_two_key_pair_join, SQL_TWO_KEY_PAIR_JOIN),
    "q14_anti_join_new_keys": (q14_anti_join_new_keys, SQL_ANTI_JOIN),
    "q15_semi_join": (q15_semi_join, SQL_SEMI_JOIN),
    "q16_hourly_rollup": (q16_hourly_rollup, SQL_HOURLY_ROLLUP),
    "q17_opcode_counts": (q17_opcode_counts, SQL_OPCODE_COUNTS),
    "q18_scd2_intervals": (q18_scd2_intervals, SQL_SCD2),
    "q19_topk_per_group": (q19_topk_per_group, SQL_TOPK_PER_GROUP),
    "q20_running_sum": (q20_running_sum, SQL_RUNNING_SUM),
    "q22_except_keys": (q22_except_keys, SQL_EXCEPT_KEYS),
    "q23_union_branches": (q23_union_branches, SQL_UNION_BRANCHES),
    "q24_explode_wordcount": (q24_explode_wordcount, SQL_EXPLODE_WORDCOUNT),
    "q25_tumbling_window": (q25_tumbling_window, SQL_TUMBLING_WINDOW),
    "q26_exact_dup_groups": (q26_exact_dup_groups, SQL_EXACT_DUP),
    "q27_minhash_signatures": (q27_minhash_signatures, SQL_MINHASH),
    "q28_lsh_candidate_pairs": (q28_lsh_candidate_pairs, SQL_LSH_PAIRS),
    "q29_simhash": (q29_simhash, SQL_SIMHASH),
    "q30_near_dup_pairs": (q30_near_dup_pairs, SQL_NEAR_DUP_PAIRS),
    "q31_cosine_topk": (q31_cosine_topk, SQL_COSINE_TOPK),
    "q32_ann_lsh_topk": (q32_ann_lsh_topk, SQL_ANN_LSH_TOPK),
    "q33_embedding_near_dups": (q33_embedding_near_dups, SQL_NEAR_DUPS),
    "q34_lang_id": (q34_lang_id, SQL_LANG_ID),
    "q35_token_count": (q35_token_count, SQL_TOKEN_COUNT),
    "q36_quality_score": (q36_quality_score, SQL_QUALITY),
    "q37_fingerprint": (q37_fingerprint, SQL_FINGERPRINT),
    "q38_cosine_topk_fast": (q38_cosine_topk_fast, SQL_COSINE_TOPK),
    "q39_pricing_summary": (q39_pricing_summary, SQL_PRICING_SUMMARY),
    "q40_asof_join": (q40_asof_join, SQL_ASOF_JOIN),
    "q41_sessionize": (q41_sessionize, SQL_SESSIONIZE),
    "q42_cube_rollup": (q42_cube_rollup, SQL_CUBE_ROLLUP),
    "q43_pivot": (q43_pivot, SQL_PIVOT),
    "q44_percentiles": (q44_percentiles, SQL_PERCENTILES),
    "q45_top_revenue_orders": (q45_top_revenue_orders, SQL_TOP_REVENUE),
    "q47_tfidf": (q47_tfidf, SQL_TFIDF),
    "q50_cdc_apply_e2e": (q50_cdc_apply_e2e, SQL_CDC_APPLY_E2E),
    "q51_multi_entity_apply": (q51_multi_entity_apply, SQL_MULTI_ENTITY),
    "q52_ivf_topk": (q52_ivf_topk, SQL_IVF_TOPK),
    "q53_winnow_fingerprints": (q53_winnow_fingerprints, SQL_WINNOW),
    "q54_local_supplier_volume": (q54_local_supplier_volume, SQL_LOCAL_SUPPLIER_VOLUME),
    "q55_stratified_sample": (q55_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "q56_pack_sequences": (q56_pack_sequences, SQL_PACK_SEQUENCES),
}


# Registry consolidation (round 4): the driver's correctness gate windows
# the FIRST 50 entries, so REGISTRY is capped at 50 — one slot per distinct
# operator family. Redundant variants live here instead: still implemented,
# still value-checked against their DuckDB oracles every pytest run
# (tests/test_entry_queries.py parametrizes over RETIRED_REGISTRY), just
# not spending driver-window slots a flagship operator needs.
RETIRED_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {
    # q01 via the explicit two-phase salted path (skew handling) — same
    # oracle as q01 by construction
    "q02_dedup_latest_salted": (q02_dedup_latest_salted, SQL_DEDUP_LATEST),
    # q27 with character trigram shingles instead of words
    "q46_minhash_char_shingles": (q46_minhash_char_shingles, SQL_MINHASH_CHAR),
    # grouping-sets family already driver-covered by q42's CUBE
    "q49_rollup": (q49_rollup, SQL_ROLLUP),
    # §2.7 sort/limit — semantics also exercised in-window by q19
    # (top-k per group) and q45 (ordered top-revenue); slot freed for
    # q55 stratified sampling
    "q21_sort_limit": (q21_sort_limit, SQL_SORT_LIMIT),
    # §2.7 set ops — EXCEPT stays in-window (q22); INTERSECT freed the
    # slot for q56 sequence packing
    "q48_intersect_keys": (q48_intersect_keys, SQL_INTERSECT_KEYS),
}

assert len(REGISTRY) <= 50, f"driver window is 50; registry has {len(REGISTRY)}"


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
