"""Quantify the fingerprint bloom index: the marginal cost ONE small
epoch pays for the cross-epoch exact-dup gate against an
already-populated table — fp_index off vs on.

Protocol (noise-robust): build a table of `build_epochs × build_rows`
pages once, clone it, enable the index on one clone (rebuild timed
separately — that is the maintenance-cadence cost the off path pays
per epoch instead), then apply small all-new epochs to the two clones
INTERLEAVED best-of-N. The off path scans + dedup-shuffles the whole
table every epoch; the on path bloom-probes the batch and stops —
the gap is the O(table)-per-epoch term the index removes.

Usage:
    python scripts/bench_fp_gate.py [build_rows] [probe_rows] [trials]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from qwatch_spark.config import PipelineConfig  # noqa: E402
from qwatch_spark.operators.apply import apply_changes  # noqa: E402
from qwatch_spark.plans.fp_bloom import FpBloomIndex  # noqa: E402
from qwatch_spark.plans.snapshot_table import SnapshotTable  # noqa: E402
from qwatch_spark.session import get_spark  # noqa: E402

RULES = ("valid_url", "lang_gate", "extract_text", "exact_dup_gate")
BUILD_EPOCHS = 4


def feed(spark, tag: int, n: int):
    """All-new pages for epoch `tag` (urls and content globally unique)."""
    base = tag * n
    return spark.range(n).select(
        (F.col("id") + base).alias("seq"),
        F.lit("I").alias("op"),
        F.concat(F.lit("https://p.ex/"), (F.col("id") + base)).alias("url"),
        F.to_timestamp(F.lit("2024-01-01")).alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<html><body>page words of substance number "),
                (F.col("id") + base),
                F.lit(" and more filler text for the extractor to chew "),
            ),
            "utf-8",
        ).alias("html"),
        F.lit("en").alias("lang"),
        F.lit("bench").alias("source"),
    )


def main():
    build_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    probe_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    # smoke-test hook: lower the auto threshold so tiny runs exercise
    # the request→maintenance-bootstrap flow (default: engine crossover)
    auto_rows = int(os.environ.get("QWATCH_FP_AUTO_ROWS", "0")) or None
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    tmp = tempfile.mkdtemp(prefix="qwatch_fp_bench_", dir="/dev/shm")
    try:
        cfg_off = PipelineConfig(n_buckets=64, rules=RULES, write_mode="delta")
        cfg_on = PipelineConfig(
            n_buckets=64, rules=RULES, write_mode="delta", fp_index=True
        )
        # the 100 TB default: let the engine pick a side from the
        # manifest's live-row estimate vs the measured ~1M crossover
        auto_kw = {"fp_auto_rows": auto_rows} if auto_rows else {}
        cfg_auto = PipelineConfig(
            n_buckets=64, rules=RULES, write_mode="delta", fp_index="auto",
            **auto_kw,
        )
        base = SnapshotTable.create(os.path.join(tmp, "base"), n_buckets=64)
        for e in range(BUILD_EPOCHS):
            apply_changes(
                spark, feed(spark, e, build_rows // BUILD_EPOCHS), base, e, cfg_off
            )
        off_path, on_path = os.path.join(tmp, "off"), os.path.join(tmp, "on")
        auto_path = os.path.join(tmp, "auto")
        shutil.copytree(base.path, off_path)
        shutil.copytree(base.path, on_path)
        shutil.copytree(base.path, auto_path)
        t0 = time.time()
        FpBloomIndex(on_path).rebuild(spark, SnapshotTable(on_path))
        rebuild_wall = round(time.time() - t0, 3)

        walls: dict[str, list[float]] = {"off": [], "on": [], "auto": []}
        tables = {"off": (SnapshotTable(off_path), cfg_off),
                  "on": (SnapshotTable(on_path), cfg_on),
                  "auto": (SnapshotTable(auto_path), cfg_auto)}
        tag = 1000  # far above build tags: all-new content
        auto_bootstrap_wall = None
        auto_requested_first = False
        for trial in range(trials):
            for mode in ("off", "on", "auto"):
                t, cfg = tables[mode]
                df = feed(spark, tag, probe_rows)
                t0 = time.time()
                apply_changes(spark, df, t, BUILD_EPOCHS + tag, cfg)
                walls[mode].append(round(time.time() - t0, 3))
                tag += 1
            if trial == 0:
                # deferred-bootstrap protocol: a flipping auto epoch only
                # MARKS the request (its own wall stays an off-path wall,
                # no O(table) spike); the rebuild runs here, at
                # maintenance cadence, timed as its own number — the same
                # cost the explicit-on arm pays in index_rebuild_wall_sec
                idx = FpBloomIndex(auto_path)
                auto_requested_first = idx.requested()
                if auto_requested_first:
                    from qwatch_spark.plans.maintenance import maintain_once

                    t0 = time.time()
                    maintain_once(spark, auto_path, vacuum_enabled=False)
                    auto_bootstrap_wall = round(time.time() - t0, 3)
                    tables["auto"] = (SnapshotTable(auto_path), cfg_auto)
        n_off = SnapshotTable(off_path).read(spark).count()
        n_on = SnapshotTable(on_path).read(spark).count()
        n_auto = SnapshotTable(auto_path).read(spark).count()
        assert n_off == n_on == n_auto, (n_off, n_on, n_auto)
        auto_enabled = FpBloomIndex(auto_path).enabled()
        print(
            json.dumps(
                {
                    "metric": "fp_gate_probe_epoch_wall_sec",
                    "table_rows": n_off - trials * probe_rows,
                    "probe_rows": probe_rows,
                    "trials": trials,
                    "off_walls": walls["off"],
                    "on_walls": walls["on"],
                    # auto epochs NEVER carry the bootstrap (it's
                    # deferred to maintenance) — trial 0 is an off-path
                    # wall, later trials ride the index
                    "auto_walls": walls["auto"],
                    "off_best": min(walls["off"]),
                    "on_best": min(walls["on"]),
                    "auto_best": min(walls["auto"]),
                    "auto_enabled_index": auto_enabled,
                    "auto_requested_after_first": auto_requested_first,
                    "auto_bootstrap_wall_sec": auto_bootstrap_wall,
                    "auto_rows_threshold": cfg_auto.fp_auto_rows,
                    "index_rebuild_wall_sec": rebuild_wall,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
