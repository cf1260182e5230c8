"""Plan-quality gates: the physical plans must keep the properties the
engine is designed around — filter/column pushdown into the parquet scan,
broadcast joins for small dimensions, partial (map-side) aggregation for
the dedup, and no Python row-at-a-time UDFs in JVM-expressible paths.
These are executable .explain() assertions, not eyeball checks.
"""

import pytest
from pyspark.sql import functions as F

from qwatch_spark import queries as q

SF = "/root/testdata/sf0.001"


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark):
    df = q.ld(spark, SF, "events").filter(F.col("event_id") < 100).select("event_id")
    p = plan(df)
    assert "PushedFilters: [IsNotNull(event_id), LessThan(event_id,100)]" in p


def test_column_pruning_reaches_scan(spark):
    df = q.ld(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    p = plan(df)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in p


def test_dimension_join_is_broadcast(spark):
    p = plan(q.q11_fk_broadcast_join(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_dedup_uses_partial_aggregation(spark):
    """max_by dedup must partially aggregate map-side (skew absorption):
    two aggregate nodes around one Exchange — a hot key collapses to one
    row per map task BEFORE the shuffle. (Spark picks SortAggregate for
    struct-valued buffers; partial+final is what matters.) The
    row_number/Window formulation would shuffle every raw row."""
    p = plan(q.q01_dedup_latest(spark, SF))
    n_aggs = p.count("HashAggregate") + p.count("ObjectHashAggregate") + p.count(
        "SortAggregate"
    )
    assert n_aggs >= 2 and "Exchange" in p
    assert "Window" not in p


def test_gates_push_into_feed_scan(spark, tmp_path):
    """Pipeline gates (valid_url/lang) must reach the change-feed scan as
    pushed filters — rules are Column exprs, not opaque UDFs."""
    from qwatch_spark.config import PipelineConfig
    from qwatch_spark.datagen import write_feed_files
    from qwatch_spark.operators.rules import apply_rules
    from qwatch_spark.sources.feed import read_feed

    write_feed_files(spark, str(tmp_path / "feed"), 500, files=1)
    feed = read_feed(spark, str(tmp_path / "feed"))
    gated = apply_rules(feed, PipelineConfig(), kind="gate")
    p = plan(gated.select("url", "lang", "op"))
    assert "PushedFilters" in p and "In(lang" in p


def test_whole_stage_codegen_covers_projections(spark):
    """In formatted explain, `*`-prefixed nodes are inside a
    WholeStageCodegen span — projection and filter must both be."""
    p = plan(q.q05_project_envelope(spark, SF))
    assert "* Project" in p and "* Filter" in p
    assert "BatchEvalPython" not in p  # no row-at-a-time Python


def test_no_unbounded_broadcast_hints(spark):
    """Relations that grow with the corpus (vocab df counts, per-doc size
    tables) must NOT carry explicit broadcast hints — an explicit hint on
    an unbounded relation is a driver OOM at scale. AQE may still
    broadcast at runtime when a side actually fits; what we assert is
    that the *logical* plan carries no forced broadcast on these paths."""
    from qwatch_spark.operators.dedup_text import jaccard_pairs, near_dup_pairs, tfidf

    docs = q.ld(spark, SF, "documents")
    for df in (jaccard_pairs(docs), near_dup_pairs(docs)):
        logical = df._jdf.queryExecution().analyzed().toString()  # noqa: SLF001
        assert "UnresolvedHint" not in logical
        assert "hints=[broadcast]" not in logical.replace(" ", "").lower()
    # tfidf's ONLY hint is the 1-row global count(N) aggregate (bounded
    # by construction); the vocabulary df_counts side must stay unhinted
    subs = list(_hint_subtrees(tfidf(docs)))
    assert len(subs) == 1 and "count(1)" in subs[0], subs


def _hint_subtrees(df):
    """Yield the analyzed-plan subtree (list of lines) under every
    broadcast ResolvedHint node, by tree-drawing indentation."""
    lines = df._jdf.queryExecution().analyzed().toString().split("\n")  # noqa: SLF001

    def content_start(ln: str) -> int:
        return len(ln) - len(ln.lstrip(" :+-"))

    for i, ln in enumerate(lines):
        if "ResolvedHint (strategy=broadcast)" not in ln:
            continue
        h = content_start(ln)
        sub = []
        for nxt in lines[i + 1 :]:
            if not nxt.strip() or content_start(nxt) <= h:
                break
            sub.append(nxt)
        yield "\n".join(sub)


# a broadcast hint is legitimate only on relations whose size is bounded
# by construction: the constant-size TPC-H dims (nation: 25 rows,
# region: 5) or a derived side capped by a literal key filter / LIMIT
# (1-row query vectors, per-band query buckets, n_probe probe cells)
_BOUNDED_PATTERNS = (
    r"n_nationkey",
    r"r_regionkey",
    r"Filter \(vec_id#\d+L? = ",  # single query vector by literal id
    r"GlobalLimit",
    # driver-materialized rows (createDataFrame): already resident on the
    # driver, cardinality fixed by a config knob — e.g. the per-range
    # offset table (n_parts rows) in global_prefix_sum
    r"LocalRelation",
    r"LogicalRDD \[_pid#\d+L, _off#\d+L\]",
    # a global (no grouping keys) count aggregate is 1 row by
    # construction — tfidf's in-plan corpus size N
    r"Aggregate \[cast\(count\(1\)",
)


def test_no_unbounded_broadcast_hints_any_registry_query(spark):
    """Every registered query: a forced broadcast on a relation that
    grows with scale factor (customer, part, orders, documents, ...) is
    a driver OOM at 100× — only constant-size dims and literal-capped
    sides may carry hints. AQE handles everything else at runtime."""
    import re

    for name, (fn, _sql) in q.REGISTRY.items():
        for sub in _hint_subtrees(fn(spark, SF)):
            assert any(re.search(p, sub) for p in _BOUNDED_PATTERNS), (
                f"{name}: broadcast hint on an unbounded relation:\n{sub}"
            )


def test_near_dup_has_no_global_word_self_join(spark):
    """q30's plan must generate pairs only from LSH buckets: the word
    lists may be joined against the candidate set, but never word↔word
    against themselves (the quadratic stopword blowup). Detectable as:
    no join condition on w1.word = w2.word with a doc_id inequality."""
    from qwatch_spark.operators.dedup_text import near_dup_pairs

    docs = q.ld(spark, SF, "documents")
    p = plan(near_dup_pairs(docs))
    # The unbucketed form shows a non-equi join predicate (doc_id < doc_id)
    # in a SortMergeJoin/BroadcastHashJoin condition alongside word=word.
    # In the composed plan the only inequality join is the LSH bucket
    # self-join keyed on (band, bucket) — word joins are pure equi-joins
    # on (doc_id, word).
    import re

    for m in re.finditer(r"Join condition:.*", p):
        cond = m.group(0)
        if "word" in cond:
            assert "<" not in cond, f"global word self-join present: {cond}"


def test_ivf_assign_is_shuffle_free(spark):
    """Cell assignment must be a per-row argmax over the inlined seed
    list — one narrow projection over the corpus scan, no Exchange: the
    fattest column (the embeddings) never travels."""
    from qwatch_spark.operators.similarity import ivf_assign

    vecs = q.ld(spark, SF, "embeddings")
    p = plan(ivf_assign(vecs, n_cells=4))
    assert "Exchange" not in p, f"ivf_assign introduced a shuffle:\n{p}"
    assert "Join" not in p


def test_no_python_udf_in_jvm_paths(spark):
    """Every oracle-checked query except none should stay JVM-side."""
    for name, (fn, sql) in q.REGISTRY.items():
        if sql is None:
            continue
        p = plan(fn(spark, SF))
        assert "BatchEvalPython" not in p, f"{name} uses row-at-a-time Python"


def test_ivf_pandas_fallback_is_shuffle_free(spark):
    """Above max_literals the assignment runs as an Arrow-batched pandas
    UDF over a broadcast seed matrix — still one narrow projection, no
    Exchange, no Join; ArrowEvalPython (vectorized), never
    BatchEvalPython (row-at-a-time)."""
    from qwatch_spark.operators.similarity import ivf_assign

    vecs = q.ld(spark, SF, "embeddings")
    p = plan(ivf_assign(vecs, n_cells=4, max_literals=1))
    assert "Exchange" not in p, f"pandas ivf_assign introduced a shuffle:\n{p}"
    assert "Join" not in p
    assert "ArrowEvalPython" in p and "BatchEvalPython" not in p
