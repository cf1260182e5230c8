"""Dump .explain('formatted') for named bench queries/operators into
plans/r09/<name>_<tag>.txt — the optimization round's plan evidence
(guide §1: capture the plan shape before and after every change).

Usage: python scripts/dump_plans.py <tag> [name ...]
Names default to the full set below.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qwatch_spark import queries as q  # noqa: E402
from qwatch_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r09")


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def _near_dup(spark):
    from pyspark.sql import functions as F

    from qwatch_spark.operators.dedup_text import near_dup_pairs

    docs = q.ld(spark, SF, "documents").filter(F.col("doc_id") < 500)
    return near_dup_pairs(docs, n_hashes=16, band_size=4, threshold=0.5)


def _cdc_updates(spark):
    """The apply hot path's pre-write plan: gates -> dedup -> bucket
    placement (the delta write's input), over a generated 1M-event epoch."""
    from pyspark.sql import functions as F

    from qwatch_spark.config import PipelineConfig
    from qwatch_spark.datagen import gen_feed_df
    from qwatch_spark.operators import apply as A
    from qwatch_spark.operators.evolution import resolve_schema
    from qwatch_spark.operators.rules import apply_rules
    from qwatch_spark.plans.snapshot_table import bucket_expr
    from qwatch_spark.schema import PAGE_SCHEMA

    cfg = PipelineConfig(n_buckets=32, write_mode="auto")
    feed = gen_feed_df(
        spark, 1_000_000, n_domains=2000, pages_per_domain=5000,
        epoch_size=1_000_000, num_partitions=64,
    ).drop("epoch_hint")
    batch, payload = resolve_schema(feed, PAGE_SCHEMA, cfg.rename_map)
    batch = apply_rules(batch, cfg, kind="gate")
    payload_cols = [f.name for f in payload.fields]
    batch = batch.select(*dict.fromkeys(payload_cols + ["op", "seq"]))
    k = min(32, max(8, spark.sparkContext.defaultParallelism * 3))
    if hasattr(A, "_dedup_to_buckets"):
        snap = A._dedup_to_buckets(batch, "url", cfg, 32, k)
    else:
        # round-start shape: salted two-phase dedup + bucket repartition
        from qwatch_spark.operators.dedup import latest_wins

        updates = latest_wins(
            batch, key="url", order=("warc_ts", "seq"), n_salt=cfg.n_salt
        )
        updates = apply_rules(updates, cfg, kind="project")
        updates = updates.withColumn("_b", bucket_expr(32, "url"))
        snap = updates.drop("_b").withColumn(
            "b", bucket_expr(32, "url")
        ).repartition(k, "b")
    return snap


def _lsh_probe_batch(spark):
    import tempfile

    from pyspark.sql import functions as F

    from qwatch_spark.operators.similarity import (
        lsh_build_index,
        lsh_probe_topk_batch,
    )

    emb = q.ld(spark, SF, "embeddings")
    path = tempfile.mkdtemp(prefix="dump_lsh_")
    lsh_build_index(emb, path, n_planes=16, n_bands=8)
    rows = emb.filter(F.col("vec_id") < 8).collect()
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows
    ]
    return lsh_probe_topk_batch(spark, path, queries, k=10, exclude_query_id=True)


def _ivf_probe_batch(spark):
    import tempfile

    from pyspark.sql import functions as F

    from qwatch_spark.operators.similarity import (
        ivf_build_index,
        ivf_probe_topk_batch,
    )

    emb = q.ld(spark, SF, "embeddings")
    path = tempfile.mkdtemp(prefix="dump_ivf_")
    ivf_build_index(emb, path, n_cells=8)
    rows = emb.filter(F.col("vec_id") < 8).collect()
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows
    ]
    return ivf_probe_topk_batch(
        spark, path, queries, k=10, n_probe=2, exclude_query_id=True
    )


NAMED = {
    "q28_lsh_candidate_pairs": lambda s: q.q28_lsh_candidate_pairs(s, SF),
    "q27_minhash_signatures": lambda s: q.q27_minhash_signatures(s, SF),
    "near_dup_refine_500docs": _near_dup,
    "cdc_updates": _cdc_updates,
    "q29_simhash": lambda s: q.q29_simhash(s, SF),
    "q33_embedding_near_dups": lambda s: q.q33_embedding_near_dups(s, SF),
    "q47_tfidf": lambda s: q.q47_tfidf(s, SF),
    "q53_winnow_fingerprints": lambda s: q.q53_winnow_fingerprints(s, SF),
    "lsh_probe_batch": _lsh_probe_batch,
    "ivf_probe_batch": _ivf_probe_batch,
}


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or list(NAMED)
    spark = get_spark(app_name="dump_plans", master="local[8]", shuffle_partitions=8)
    os.makedirs(OUT, exist_ok=True)
    for n in names:
        df = NAMED[n](spark)
        with open(os.path.join(OUT, f"{n}_{tag}.txt"), "w") as fh:
            fh.write(plan(df))
        print("wrote", n, tag)
    spark.stop()


if __name__ == "__main__":
    main()
