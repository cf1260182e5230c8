"""Local stand-in for the driver's Spark-vs-DuckDB correctness gate.

Runs every `queries()` entry at sf0.01 and its `oracle_sql()` twin in
DuckDB over the same parquet tables, then compares row counts, schemas
(column names) and VALUES (columns sorted by name, rows sorted, cells
canonicalized) — the same shape of check CORRECTNESS_r{N}.json records.

Usage:
    python scripts/check_oracle.py [query_name ...]   # default: all
"""

from __future__ import annotations

import json
import math
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v):
    """Canonical, engine-neutral cell representation."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and print shortest round-trip repr
        return repr(v + 0.0)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    try:  # Decimal → float repr for cross-engine parity
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except Exception:
        pass
    return str(v)


def rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


BATCH_QIDS = [0, 3, 7, 11, 19, 42, 64, 101]


def _batch_lsh_sql(qids: list[int]) -> str:
    from qwatch_spark.queries import _EMB_CTE, _rand_planes_cte

    return _EMB_CTE + _rand_planes_cte(16, 8) + f"""
, qs AS (SELECT UNNEST(ARRAY{qids}) AS qid)
, qb AS (SELECT qs.qid, b.band, b.bucket FROM b JOIN qs ON b.vec_id = qs.qid)
, cand AS (SELECT DISTINCT qb.qid, b.vec_id
           FROM b JOIN qb ON b.band = qb.band AND b.bucket = qb.bucket
           WHERE b.vec_id <> qb.qid)
, q AS (SELECT qs.qid, e.i, e.xd AS qx FROM e JOIN qs ON e.vec_id = qs.qid)
, dots AS (
    SELECT c.qid, c.vec_id,
           CAST(SUM(CAST(e.xd * q.qx AS DECIMAL(30,15))) AS DOUBLE) AS dot
    FROM cand c JOIN e ON e.vec_id = c.vec_id
    JOIN q ON q.qid = c.qid AND q.i = e.i
    GROUP BY c.qid, c.vec_id)
, scored AS (
    SELECT d.qid AS query_id, d.vec_id,
           ROUND(d.dot / (sqrt(n.nsq) * sqrt(nq.nsq)), 9) AS cosine,
           row_number() OVER (PARTITION BY d.qid
             ORDER BY ROUND(d.dot / (sqrt(n.nsq) * sqrt(nq.nsq)), 9) DESC,
                      d.vec_id) AS rn
    FROM dots d
    JOIN norms n ON n.vec_id = d.vec_id
    JOIN norms nq ON nq.vec_id = d.qid)
SELECT query_id, vec_id, cosine FROM scored WHERE rn <= 10
"""


def _batch_ivf_sql(qids: list[int]) -> str:
    from qwatch_spark.queries import _EMB_CTE

    return _EMB_CTE + f"""
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
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cell ASC) AS rn
    FROM sim
  ) t WHERE rn = 1
),
qs AS (SELECT UNNEST(ARRAY{qids}) AS qid),
probe AS (
  SELECT qid, cell FROM (
    SELECT qs.qid, s.cell,
           row_number() OVER (PARTITION BY qs.qid
                              ORDER BY s.sim DESC, s.cell) AS rn
    FROM sim s JOIN qs ON s.vec_id = qs.qid
  ) t WHERE rn <= 2
),
cand AS (
  SELECT DISTINCT p.qid, a.vec_id
  FROM assigned a JOIN probe p ON a.cell = p.cell
  WHERE a.vec_id <> p.qid
),
q AS (SELECT qs.qid, e.i, e.xd AS qx FROM e JOIN qs ON e.vec_id = qs.qid),
dots AS (
  SELECT c.qid, c.vec_id,
         CAST(SUM(CAST(e.xd * q.qx AS DECIMAL(30,15))) AS DOUBLE) AS dot
  FROM cand c JOIN e ON e.vec_id = c.vec_id
  JOIN q ON q.qid = c.qid AND q.i = e.i
  GROUP BY c.qid, c.vec_id),
scored AS (
  SELECT d.qid AS query_id, d.vec_id,
         ROUND(d.dot / (sqrt(n.nsq) * sqrt(nq.nsq)), 9) AS cosine,
         row_number() OVER (PARTITION BY d.qid
           ORDER BY ROUND(d.dot / (sqrt(n.nsq) * sqrt(nq.nsq)), 9) DESC,
                    d.vec_id) AS rn
  FROM dots d
  JOIN norms n ON n.vec_id = d.vec_id
  JOIN norms nq ON nq.vec_id = d.qid)
SELECT query_id, vec_id, cosine FROM scored WHERE rn <= 10
"""


def batch_probe_dfs(spark):
    """Both serving indexes built from the sf embeddings at temp paths,
    probed with ONE batch job each — the engine side of the r6 verdict
    #7 rows. The oracle SQL twins parameterize q32/q52's CTEs over the
    same query set; since the index probe reads exactly the queries'
    (band,bucket)/cell members, the batch results must be row-identical
    to the SQL's per-query top-10 without any index in the oracle."""
    import tempfile

    from pyspark.sql import functions as F

    from qwatch_spark.operators.similarity import (
        ivf_build_index,
        ivf_probe_topk_batch,
        lsh_build_index,
        lsh_probe_topk_batch,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id").isin(BATCH_QIDS)).collect()
    ]
    work = tempfile.mkdtemp(prefix="check_oracle_idx_")
    lsh_build_index(emb, f"{work}/lsh", n_planes=16, n_bands=8)
    ivf_build_index(emb, f"{work}/ivf", n_cells=8)
    return {
        "xq32_lsh_probe_batch": (
            lsh_probe_topk_batch(
                spark, f"{work}/lsh", queries, k=10, exclude_query_id=True
            ),
            _batch_lsh_sql(BATCH_QIDS),
        ),
        "xq52_ivf_probe_batch": (
            ivf_probe_topk_batch(
                spark, f"{work}/ivf", queries, k=10, n_probe=2,
                exclude_query_id=True,
            ),
            _batch_ivf_sql(BATCH_QIDS),
        ),
    }


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .appName("check_oracle")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = set(sys.argv[1:])
    report = {}
    n_bad = 0
    work: list[tuple[str, object, str | None]] = [
        (name, fn, oracles.get(name))
        for name, fn in qs.items()
        if not only or name in only
    ]
    if not only or any(n.startswith("x") for n in only):
        for name, (df, sql) in batch_probe_dfs(spark).items():
            if not only or name in only:
                work.append((name, df, sql))
    for name, fn, oracle in work:
        rec = {"rows_match": None, "schema_match": None, "hash_match": None}
        try:
            sdf = fn(spark, SF_DIR) if callable(fn) else fn
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
            if oracle is None:
                rec.update(spark_rows=len(s_rows), err="no_oracle")
                report[name] = rec
                print(f"{name:36s} rows={len(s_rows):>7} (no oracle)")
                continue
            cur = con.execute(oracle)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
            rec["spark_rows"] = len(s_rows)
            rec["oracle_rows"] = len(o_rows)
            rec["rows_match"] = len(s_rows) == len(o_rows)
            rec["schema_match"] = sorted(s_cols) == sorted(o_cols)
            if rec["rows_match"] and rec["schema_match"]:
                _, sc = rows_canon(s_cols, s_rows)
                _, oc = rows_canon(o_cols, o_rows)
                rec["hash_match"] = sc == oc
                if not rec["hash_match"]:
                    for i, (a, b) in enumerate(zip(sc, oc)):
                        if a != b:
                            rec["first_diff"] = {
                                "row": i,
                                "spark": list(a),
                                "oracle": list(b),
                            }
                            break
            rec["err"] = None
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
        ok = rec.get("hash_match")
        flag = "OK " if ok else ("--- " if rec.get("err") == "no_oracle" else "FAIL")
        if ok is not True and rec.get("err") != "no_oracle":
            n_bad += 1
            print(f"{name:36s} {flag} {json.dumps(rec)[:400]}")
        else:
            print(f"{name:36s} {flag} rows={rec.get('spark_rows')}")
        report[name] = rec
    with open(os.path.join(REPO, "CORRECTNESS_local.json"), "w") as f:
        json.dump(report, f, indent=1, default=str)
    print(f"\n{len(report) - n_bad}/{len(report)} green")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
