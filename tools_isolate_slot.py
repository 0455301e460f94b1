#!/usr/bin/env python3
"""Isolated per-slot timing (guide §1.4): construct ONE bench slot's plan,
run one untimed warm noop write, then N timed noop writes — so a change
can be A/B-measured without the full bench's 80-slot noise floor.

Usage: python tools_isolate_slot.py <slot> [<slot> ...] [--runs N] [--cold]
Prints one JSON line per slot: {"slot": ..., "times": [...], "median": ...}.

``--cold`` rebuilds the plan for every timed run and times
construction + first execution together (after one warm build+run pair
for JIT). This is the honest protocol for slots whose construction
runs probes or materializes checkpoints: the default steady-state
protocol re-times a constructed plan, so anything persisted at
construction or during the warm pass (localCheckpoint blocks) is read,
not recomputed — matching bench.py's methodology but overstating
single-shot speed for checkpoint-bearing plans.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    # accept both '--runs N' and '--runs=N' (ADVICE r11: the bare-N form
    # used to be swallowed as a slot name and died in a raw KeyError)
    argv = sys.argv[1:]
    args: list[str] = []
    n_runs = 5
    cold = False
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--runs="):
            n_runs = int(a.split("=", 1)[1])
        elif a == "--runs":
            i += 1
            n_runs = int(argv[i])
        elif a == "--cold":
            cold = True
        else:
            args.append(a)
        i += 1
    from tally_database_loader_spark.plans import gate
    from tally_database_loader_spark.plans.bench_plans import BENCH_PLANS
    from tally_database_loader_spark.session import get_spark

    plans = dict(gate.QUERIES)
    plans.update(BENCH_PLANS)
    spark = get_spark("isolate")
    # same warmup as bench.py so first-slot numbers aren't JIT noise
    gate.QUERIES["version_probe"](spark, SF_DIR).collect()
    from tally_database_loader_spark.sources.catalog import load_table
    for tbl in ("region", "nation", "customer", "supplier", "part", "orders",
                "lineitem", "events", "documents", "embeddings"):
        load_table(spark, SF_DIR, tbl).count()
    from tally_database_loader_spark.plans.report_gate import tally_catalog
    for df in tally_catalog(spark, SF_DIR).values():
        df.count()

    unknown = [s for s in args if s not in plans]
    if unknown:
        sys.exit(f"unknown slot(s): {', '.join(unknown)}\navailable: "
                 + ", ".join(sorted(plans)))
    for slot in args:
        spark.sparkContext.setJobDescription(f"isolate:{slot}:warm")
        df = plans[slot](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        times = []
        for i in range(n_runs):
            spark.sparkContext.setJobDescription(f"isolate:{slot}:{i}")
            t0 = time.perf_counter()
            if cold:
                df = plans[slot](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({"slot": slot, "cold": cold, "times": times,
                          "median": round(statistics.median(times), 3)}))
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
