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
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {"rows_match": None, "schema_match": None, "hash_match": None}
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                rec.update(spark_rows=len(s_rows), err="no_oracle")
                report[name] = rec
                print(f"{name:36s} rows={len(s_rows):>7} (no oracle)")
                continue
            cur = con.execute(oracles[name])
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
