"""Isolated apply-path bench for the optimization loop: replicates
bench.py's CdcBench/EntityBench protocol (same feed, same warmup, same
config) but runs only the requested arms with a configurable trial
count — so one change can be measured in ~1 minute instead of a full
bench.py run. Numbers quoted in OPTIMIZATION_r09.md cite this script
for iteration and bench.py for the final before/after."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qwatch_spark.session import get_spark  # noqa: E402


def main() -> None:
    arms = sys.argv[1:] or ["cdc"]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("QWATCH_BENCH_TRIALS", "2"))
    extra = {"spark.ui.showConsoleProgress": "false", "spark.ui.enabled": "false"}
    if os.access("/dev/shm", os.W_OK):
        extra["spark.local.dir"] = "/dev/shm/qwatch_bench_iso_spill"
    spark = get_spark(
        app_name="bench_apply_iso",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf=extra,
    )
    import bench as B

    benches = []
    if "cdc" in arms:
        benches.append(B.CdcBench(spark, int(os.environ.get("QWATCH_BENCH_EVENTS", "2000000")), cpus))
    if "stream" in arms:
        benches.append(B.StreamBench(spark, 500_000, cpus))
    if "entity" in arms:
        benches.append(B.EntityBench(spark, 1_000_000, cpus))
    if "estream" in arms:
        benches.append(B.EntityStreamBench(spark, 1_000_000, cpus))
    for i in range(trials):
        for b in benches:
            b.run(i)
    for b in benches:
        out = b.finish()
        compact = {
            k: v
            for k, v in out.items()
            if k.endswith(("wall_sec", "wall_sec_trials", "events_per_sec", "phases"))
        }
        print(b.name, compact)
    spark.stop()


if __name__ == "__main__":
    main()
