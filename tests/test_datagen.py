"""The distributed and pure-Python feed generators must agree row-for-row
— this is what lets the dict-replay oracle grade the Spark engine."""

from qwatch_spark.datagen import gen_feed_df, gen_feed_rows


def _normalize(row: dict) -> tuple:
    return (
        row["seq"],
        row["op"],
        row["url"],
        row["warc_ts"],
        bytes(row["html"]) if row["html"] is not None else None,
        row.get("lang"),
        row["source"],
        row["epoch_hint"],
    )


def test_spark_and_python_generators_agree(spark):
    n = 500
    py_rows = gen_feed_rows(n)
    sp_rows = [r.asDict() for r in gen_feed_df(spark, n).orderBy("seq").collect()]
    assert len(sp_rows) == n
    for py, sp in zip(py_rows, sp_rows):
        assert _normalize(py) == _normalize(sp), f"mismatch at seq={py['seq']}"


def test_feed_has_all_ops_and_skew(spark):
    rows = gen_feed_rows(2000)
    ops = {r["op"] for r in rows}
    assert ops == {"I", "U", "D"}
    hot = sum(1 for r in rows if r["url"].startswith("https://d0."))
    assert 0.25 < hot / len(rows) < 0.35  # hot-domain skew fixture


def test_evolution_variants():
    titled = gen_feed_rows(50, add_title=True)
    assert "title" in titled[0]
    renamed = gen_feed_rows(50, rename_lang=True)
    assert "language" in renamed[0] and "lang" not in renamed[0]


def test_out_of_order_within_key():
    rows = gen_feed_rows(5000)
    by_url: dict[str, list] = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r["warc_ts"])
    inversions = sum(
        1
        for ts_list in by_url.values()
        for a, b in zip(ts_list, ts_list[1:])
        if a > b
    )
    assert inversions > 0  # arrival order != event-time order
