"""Multi-entity apply semantics: discriminator routing, create-if-absent
FK parents (skeletons), tombstone no-resurrection, link maintenance,
idempotent re-delivery — the reference's entity-graph behaviors
(outputs/neo4j.go:484-504, 287-294) on planted scenarios."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qwatch_spark.operators.entities import (
    EntitySpec,
    LinkSpec,
    apply_entity_changes,
    create_entity_tables,
)

TS = lambda d: dt.datetime(2024, 1, d)  # noqa: E731

PAGE = EntitySpec(
    "page",
    "url",
    T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("dom", T.StringType(), True),
            T.StructField("warc_ts", T.TimestampType(), True),
        ]
    ),
    fks=(("dom", "domain"),),
)
DOMAIN = EntitySpec(
    "domain",
    "dom",
    T.StructType(
        [
            T.StructField("dom", T.StringType(), False),
            T.StructField("registrar", T.StringType(), True),
            T.StructField("warc_ts", T.TimestampType(), True),
        ]
    ),
)
LINKS = [LinkSpec("page_domain", "page", "dom")]

FEED_SCHEMA = (
    "entity_type string, op string, seq long, warc_ts timestamp, "
    "url string, dom string, registrar string"
)


def feed(spark, rows):
    return spark.createDataFrame(rows, FEED_SCHEMA)


@pytest.fixture()
def tables(tmp_path):
    return create_entity_tables(str(tmp_path), [PAGE, DOMAIN], LINKS, n_buckets=4)


def apply(spark, tables, rows, epoch):
    return apply_entity_changes(
        spark, feed(spark, rows), [PAGE, DOMAIN], tables, epoch, links=LINKS
    )


def test_routing_and_skeleton_parents(spark, tables):
    rows = [
        ("page", "I", 1, TS(1), "u1", "d1", None),
        ("page", "I", 2, TS(1), "u2", "d2", None),
        ("domain", "I", 3, TS(2), None, "d1", "reg-A"),
    ]
    apply(spark, tables, rows, 0)
    doms = {r["dom"]: r["registrar"] for r in tables["domain"].read(spark).collect()}
    # d1 has an own event → real payload; d2 only referenced → skeleton
    assert doms == {"d1": "reg-A", "d2": None}
    pages = {r["url"]: r["dom"] for r in tables["page"].read(spark).collect()}
    assert pages == {"u1": "d1", "u2": "d2"}


def test_skeleton_never_overwrites_real_parent(spark, tables):
    apply(spark, tables, [("domain", "I", 1, TS(1), None, "d1", "reg-A")], 0)
    # later epoch: page references d1 — the skeleton must NOT clobber reg-A
    apply(spark, tables, [("page", "I", 2, TS(5), "u1", "d1", None)], 1)
    row = tables["domain"].read(spark).collect()[0]
    assert (row["dom"], row["registrar"]) == ("d1", "reg-A")
    assert row["warc_ts"] == TS(1)  # payload version untouched by skeleton


def test_real_parent_event_beats_earlier_skeleton(spark, tables):
    apply(spark, tables, [("page", "I", 1, TS(1), "u1", "d1", None)], 0)
    assert tables["domain"].read(spark).collect()[0]["registrar"] is None
    apply(spark, tables, [("domain", "U", 2, TS(2), None, "d1", "reg-B")], 1)
    assert tables["domain"].read(spark).collect()[0]["registrar"] == "reg-B"


def test_skeleton_does_not_resurrect_deleted_parent(spark, tables):
    apply(spark, tables, [("domain", "I", 1, TS(1), None, "d1", "reg-A")], 0)
    apply(spark, tables, [("domain", "D", 2, TS(3), None, "d1", None)], 1)
    assert tables["domain"].read(spark).count() == 0
    # later page reference creates a skeleton attempt at (1970, -1) — loses
    apply(spark, tables, [("page", "I", 3, TS(5), "u1", "d1", None)], 2)
    assert tables["domain"].read(spark).count() == 0
    assert tables["domain"].read_buckets(spark).collect()[0]["is_deleted"]


def test_link_table_maintained_and_never_deleted(spark, tables):
    apply(spark, tables, [("page", "I", 1, TS(1), "u1", "d1", None)], 0)
    links = tables["page_domain"].read(spark).collect()
    assert [(r["src"], r["dst"]) for r in links] == [("u1", "d1")]
    assert links[0]["warc_ts"] == TS(1)
    # re-observation bumps last_seen order; delete does not remove the edge
    apply(spark, tables, [("page", "U", 2, TS(4), "u1", "d1", None)], 1)
    apply(spark, tables, [("page", "D", 3, TS(6), "u1", None, None)], 2)
    links = tables["page_domain"].read(spark).collect()
    assert len(links) == 1 and links[0]["warc_ts"] == TS(4)
    assert tables["page"].read(spark).count() == 0  # page itself tombstoned


def test_duplicate_epoch_is_noop_per_entity(spark, tables):
    rows = [
        ("page", "I", 1, TS(1), "u1", "d1", None),
        ("domain", "I", 2, TS(1), None, "d2", "reg-X"),
    ]
    s1 = apply(spark, tables, rows, 0)
    assert not any(st.skipped for st in s1.values())
    s2 = apply(spark, tables, rows, 0)
    assert all(st.skipped for st in s2.values())
    assert tables["domain"].read(spark).count() == 2  # d2 real + d1 skeleton


def test_entity_tables_key_on_their_own_columns(spark, tables):
    assert tables["page"].key_col == "url"
    assert tables["domain"].key_col == "dom"
    assert tables["page_domain"].key_col == "link_id"


def test_entity_stream_end_to_end(spark, tmp_path):
    """Streaming multi-entity ingest: checkpointed file feed routed to
    page/domain/link tables with dead-lettering and exactly-once across
    a full re-delivery (fresh checkpoint)."""
    import os

    from pyspark.sql import types as T

    from qwatch_spark.config import PipelineConfig
    from qwatch_spark.streaming import run_entity_stream

    schema = T.StructType(
        [
            T.StructField("entity_type", T.StringType(), True),
            T.StructField("op", T.StringType(), True),
            T.StructField("seq", T.LongType(), True),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("url", T.StringType(), True),
            T.StructField("dom", T.StringType(), True),
            T.StructField("registrar", T.StringType(), True),
        ]
    )
    rows = [
        ("page", "I", 1, TS(1), "u1", "d1", None),
        ("page", "I", 2, TS(2), "u2", "d1", None),
        ("domain", "I", 3, TS(1), None, "d2", "reg-X"),
        ("page", "X", 4, TS(1), "u3", "d1", None),      # bad op
        ("widget", "I", 5, TS(1), "u4", "d1", None),    # unknown entity
        ("page", "I", 6, TS(1), None, "d1", None),      # null key for page
    ]
    feed_dir = str(tmp_path / "feed")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(feed_dir)

    base = str(tmp_path / "tables")
    cfg = PipelineConfig(rules=(), n_buckets=4)
    run_entity_stream(
        spark, feed_dir, base, str(tmp_path / "ck1"),
        [PAGE, DOMAIN], LINKS, cfg, feed_schema=schema,
    )
    from qwatch_spark.plans.snapshot_table import SnapshotTable

    pages = SnapshotTable(f"{base}/page").read(spark)
    doms = SnapshotTable(f"{base}/domain").read(spark)
    links = SnapshotTable(f"{base}/page_domain").read(spark)
    assert {r["url"] for r in pages.collect()} == {"u1", "u2"}
    assert {r["dom"]: r["registrar"] for r in doms.collect()} == {
        "d1": None,   # skeleton from page FKs
        "d2": "reg-X",
    }
    assert {(r["src"], r["dst"]) for r in links.collect()} == {
        ("u1", "d1"), ("u2", "d1"),
    }
    dead = spark.read.parquet(os.path.join(base, "dead_letter"))
    assert dead.count() == 3

    # full re-delivery with a fresh checkpoint: everything skips
    run_entity_stream(
        spark, feed_dir, base, str(tmp_path / "ck2"),
        [PAGE, DOMAIN], LINKS, cfg, feed_schema=schema,
    )
    assert SnapshotTable(f"{base}/page").read(spark).count() == 2
    assert spark.read.parquet(os.path.join(base, "dead_letter")).count() == 3


def test_entity_specs_from_yaml_and_cli_job(spark, tmp_path):
    """Declarative entity graph (yml) → specs → full CLI run."""
    import json
    import os
    import sys

    import pytest as _pytest

    from qwatch_spark.operators.entities import load_entity_specs

    yml = tmp_path / "graph.yml"
    yml.write_text(
        "entities:\n"
        "  - name: page\n"
        "    key: url\n"
        "    payload: {url: string, dom: string, warc_ts: timestamp}\n"
        "    fks: {dom: domain}\n"
        "  - name: domain\n"
        "    key: dom\n"
        "    payload: {dom: string, registrar: string, warc_ts: timestamp}\n"
        "links:\n"
        "  - {name: page_domain, src: page, fk: dom}\n"
    )
    specs, links = load_entity_specs(str(yml))
    assert [s.name for s in specs] == ["page", "domain"]
    assert specs[0].fks == (("dom", "domain"),)
    assert links[0].name == "page_domain"

    bad = tmp_path / "bad.yml"
    bad.write_text(
        "entities:\n  - name: a\n    key: k\n    payload: {k: string}\n"
        "    fks: {k: nowhere}\n"
    )
    with _pytest.raises(ValueError, match="undeclared entity"):
        load_entity_specs(str(bad))

    # end-to-end through the CLI job
    rows = [
        ("page", "I", 1, TS(1), "u1", "d1", None),
        ("domain", "I", 2, TS(1), None, "d2", "reg-X"),
    ]
    feed_dir = str(tmp_path / "feed")
    feed(spark, rows).coalesce(1).write.parquet(feed_dir)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    import entity_job

    rc = entity_job.main(
        [
            "--feed-dir", feed_dir,
            "--base", str(tmp_path / "tables"),
            "--checkpoint", str(tmp_path / "ck"),
            "--entities", str(yml),
            "--n-buckets", "4",
            "--once",
        ]
    )
    assert rc == 0
    from qwatch_spark.plans.snapshot_table import SnapshotTable

    doms = SnapshotTable(str(tmp_path / "tables" / "domain")).read(spark)
    assert {r["dom"]: r["registrar"] for r in doms.collect()} == {
        "d1": None, "d2": "reg-X",
    }
    assert json.load(
        open(os.path.join(tmp_path, "tables", "page", "manifest.json"))
    )["key_col"] == "url"


def test_entity_schema_evolution_mid_stream(spark, tables):
    """north_rule: added feed columns resolve against the target at apply
    time — per entity. A 'title' column appearing on page events widens
    the page table (old rows null-filled); the domain table is untouched."""
    apply(spark, tables, [("page", "I", 1, TS(1), "u1", "d1", None)], 0)
    widened = spark.createDataFrame(
        [("page", "U", 2, TS(2), "u2", "d1", None, "Hello")],
        FEED_SCHEMA + ", title string",
    )
    apply_entity_changes(
        spark, widened, [PAGE, DOMAIN], tables, 1, links=LINKS
    )
    page_t = tables["page"]
    assert "title" in [f.name for f in page_t.payload_schema.fields]
    rows = {r["url"]: r["title"] for r in page_t.read(spark).collect()}
    assert rows == {"u1": None, "u2": "Hello"}
    assert "title" not in [
        f.name for f in tables["domain"].payload_schema.fields
    ]


def test_entity_tables_time_travel(spark, tables):
    """Per-entity time travel: every entity table keeps its own manifest
    history, so any committed version is reconstructable."""
    apply(spark, tables, [("domain", "I", 1, TS(1), None, "d1", "reg-A")], 0)
    v1 = tables["domain"].version
    apply(spark, tables, [("domain", "U", 2, TS(2), None, "d1", "reg-B")], 1)
    t = tables["domain"]
    assert {r["registrar"] for r in t.read(spark).collect()} == {"reg-B"}
    old = t.read_version(spark, v1)
    assert {r["registrar"] for r in old.collect()} == {"reg-A"}


def test_entity_stream_json_feed(spark, tmp_path):
    """The entity stream speaks JSONL too: same routing/skeleton/link
    results as the parquet form, decode failures dead-lettered with
    their raw line and never routed into a table."""
    import os

    from pyspark.sql import types as T

    from qwatch_spark.config import PipelineConfig
    from qwatch_spark.plans.snapshot_table import SnapshotTable
    from qwatch_spark.streaming import run_entity_stream

    schema = T.StructType(
        [
            T.StructField("entity_type", T.StringType(), True),
            T.StructField("op", T.StringType(), True),
            T.StructField("seq", T.LongType(), True),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("url", T.StringType(), True),
            T.StructField("dom", T.StringType(), True),
            T.StructField("registrar", T.StringType(), True),
        ]
    )
    rows = [
        ("page", "I", 1, TS(1), "u1", "d1", None),
        ("domain", "I", 2, TS(1), None, "d2", "reg-X"),
        ("page", "X", 3, TS(1), "u3", "d1", None),  # bad op
    ]
    feed_dir = str(tmp_path / "jfeed")
    spark.createDataFrame(rows, schema).coalesce(1).write.json(feed_dir)
    with open(os.path.join(feed_dir, "part-corrupt.json"), "w") as fh:
        fh.write('{"entity_type": "page", "op": "I", broken\n')

    base = str(tmp_path / "tables")
    cfg = PipelineConfig(rules=(), n_buckets=4, feed_format="json")
    run_entity_stream(
        spark, feed_dir, base, str(tmp_path / "ck"),
        [PAGE, DOMAIN], LINKS, cfg, feed_schema=schema,
    )
    pages = SnapshotTable(f"{base}/page").read(spark)
    assert {r["url"] for r in pages.collect()} == {"u1"}
    doms = SnapshotTable(f"{base}/domain").read(spark)
    assert {r["dom"] for r in doms.collect()} == {"d1", "d2"}
    # no _corrupt column leaked into any entity table
    assert "_corrupt" not in pages.columns
    dead = spark.read.parquet(os.path.join(base, "dead_letter")).collect()
    assert len(dead) == 2  # bad op + decode failure
    raw = [r["_corrupt"] for r in dead if r["_corrupt"] is not None]
    assert len(raw) == 1 and "broken" in raw[0]


def test_feed_schema_envelope_collision_raises():
    """A spec payload column named op/seq/entity_type at a non-envelope
    type must raise, not silently overwrite the envelope StructField
    (which would corrupt feed decode for every entity)."""
    from qwatch_spark.operators.entities import derive_feed_schema

    bad = EntitySpec(
        "gadget",
        "gid",
        T.StructType(
            [
                T.StructField("gid", T.StringType(), False),
                T.StructField("seq", T.StringType(), True),  # envelope seq is long
            ]
        ),
    )
    with pytest.raises(ValueError, match="'<envelope>'"):
        derive_feed_schema([PAGE, bad])
    # same-typed shared names remain fine (no-op against the envelope)
    ok = EntitySpec(
        "widget",
        "wid",
        T.StructType(
            [
                T.StructField("wid", T.StringType(), False),
                T.StructField("seq", T.LongType(), True),
            ]
        ),
    )
    s = derive_feed_schema([PAGE, ok])
    assert s["seq"].dataType == T.LongType()


def test_entity_stream_from_generated_feed_files_matches_batch(spark, tmp_path):
    """write_entity_feed_files -> run_entity_stream equals the same feed
    applied in batch. Also pins the schema-subset contract: the files
    carry extra columns (epoch_hint) that the derived feed schema omits,
    and the streaming read must project the declared subset, not fail or
    route bookkeeping columns into tables."""
    from qwatch_spark.config import PipelineConfig
    from qwatch_spark.datagen import gen_entity_feed_df, write_entity_feed_files
    from qwatch_spark.operators.entities import (
        apply_entity_changes,
        create_entity_tables,
    )
    from qwatch_spark.plans.snapshot_table import SnapshotTable
    from qwatch_spark.queries import entity_graph_specs
    from qwatch_spark.streaming import run_entity_stream

    specs, links = entity_graph_specs()
    cfg = PipelineConfig(rules=(), n_buckets=4, max_files_per_trigger=2)
    n = 3000

    write_entity_feed_files(spark, str(tmp_path / "feed"), n, files=4)
    sbase = str(tmp_path / "stream_tables")
    stats = run_entity_stream(
        spark, str(tmp_path / "feed"), sbase, str(tmp_path / "ck"),
        specs, links, cfg,
    )
    assert len(stats) == 2  # 4 files / trigger cap 2

    bbase = str(tmp_path / "batch_tables")
    btables = create_entity_tables(bbase, specs, links, n_buckets=4)
    batch = gen_entity_feed_df(spark, n).drop("epoch_hint")
    apply_entity_changes(spark, batch, specs, btables, 0, links=links, cfg=cfg)

    for name in ("page", "domain", "page_domain"):
        key = {"page": "url", "domain": "dom", "page_domain": "src"}[name]
        cols = [c for c in SnapshotTable(f"{sbase}/{name}").read(spark).columns]
        assert "epoch_hint" not in cols  # bookkeeping never routed
        s_rows = sorted(
            tuple(r) for r in SnapshotTable(f"{sbase}/{name}")
            .read(spark).select(*sorted(cols)).collect()
        )
        b_rows = sorted(
            tuple(r) for r in SnapshotTable(f"{bbase}/{name}")
            .read(spark).select(*sorted(cols)).collect()
        )
        assert s_rows == b_rows, name
