"""Property-based replay invariance for the MULTI-ENTITY apply: for any
epoch partitioning and arrival order of the same discriminated event
set, every entity table (page, domain incl. create-if-absent skeletons,
link table) converges to the single-epoch baseline state.

This is the multi-table extension of tests/test_property_replay.py —
it additionally pins the skeleton semantics: parents created by child
references must be identical no matter WHICH epoch first referenced
them, and deleted parents must stay deleted under any interleaving.
"""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qwatch_spark.operators.entities import (
    apply_entity_changes,
    create_entity_tables,
)
from tests.test_entities import DOMAIN, FEED_SCHEMA, LINKS, PAGE


def _mk_rows():
    """A small fixed event set exercising every interaction: page
    upserts/deletes, domain upserts/deletes, skeleton-only domains,
    delete-then-reference, reference-then-own-event."""
    T = lambda k: dt.datetime(2024, 1, 1 + k // 4, k % 4 * 6)  # noqa: E731
    rows = []
    seq = 0
    for k in range(28):
        seq += 1
        if k % 7 == 3:  # domain own event
            op = "D" if k % 14 == 10 else ("U" if k % 2 else "I")
            rows.append(
                ("domain", op, seq, T(k), None, f"d{k % 5}",
                 None if op == "D" else f"reg{k % 3}")
            )
        else:  # page event referencing a rotating domain
            op = "D" if k % 9 == 8 else ("U" if k % 3 else "I")
            rows.append(
                ("page", op, seq, T(k), f"https://d{k % 5}.ex/p{k % 6}",
                 None if op == "D" else f"d{k % 5}", None)
            )
    return rows


ROWS = _mk_rows()


def snapshot(spark, tables):
    out = {}
    for name in ("page", "domain", "page_domain"):
        df = tables[name].read(spark)
        out[name] = sorted(tuple(r) for r in df.collect())
    return out


def _apply_all(spark, base, epochs):
    tables = create_entity_tables(str(base), [PAGE, DOMAIN], LINKS, n_buckets=4)
    feed_epochs = [e for e in epochs if e]
    for i, batch_rows in enumerate(feed_epochs):
        df = spark.createDataFrame(batch_rows, FEED_SCHEMA)
        apply_entity_changes(spark, df, [PAGE, DOMAIN], tables, i, links=LINKS)
    return snapshot(spark, tables)


_BASELINE = {}


def baseline(spark, tmp_path_factory):
    if "s" not in _BASELINE:
        _BASELINE["s"] = _apply_all(
            spark, tmp_path_factory.mktemp("ent_base"), [ROWS]
        )
    return _BASELINE["s"]


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 2**31 - 1), n_cuts=st.integers(0, 4))
def test_entity_graph_replay_invariance(spark, tmp_path_factory, seed, n_cuts):
    import random

    rng = random.Random(seed)
    rows = list(ROWS)
    rng.shuffle(rows)
    cuts = sorted(rng.sample(range(1, len(rows)), n_cuts)) if n_cuts else []
    epochs, prev = [], 0
    for c in [*cuts, len(rows)]:
        epochs.append(rows[prev:c])
        prev = c

    got = _apply_all(
        spark, tmp_path_factory.mktemp(f"ent_{seed}_{n_cuts}"), epochs
    )
    assert got == baseline(spark, tmp_path_factory)
