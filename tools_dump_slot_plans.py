#!/usr/bin/env python3
"""Dump `.explain('formatted')` for named slots into plans/<tag>/
<slot>_<suffix>.txt — the before/after evidence pair the optimization
rounds commit (VERDICT r11 #7).

Usage: python tools_dump_slot_plans.py <tag> <suffix> <slot> [<slot>...]
e.g.   python tools_dump_slot_plans.py r12 before lm_score_suite
Plan ids are normalized (#\\d+ -> #N) so before/after diffs are clean.
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix, *slots = sys.argv[1:]
    from tally_database_loader_spark.plans import gate
    from tally_database_loader_spark.plans.bench_plans import BENCH_PLANS
    from tally_database_loader_spark.session import get_spark
    plans = dict(gate.QUERIES)
    plans.update(BENCH_PLANS)
    unknown = [s for s in slots if s not in plans]
    if unknown:
        sys.exit(f"unknown slot(s): {', '.join(unknown)}")
    spark = get_spark("plandump")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    for slot in slots:
        df = plans[slot](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(mode)
        plan = re.sub(r"#\d+", "#N", plan)
        # session-dependent ids that would otherwise make two dumps of
        # an IDENTICAL plan diff non-empty: plan_id, RDD numbers, and
        # the localCheckpoint call-site frame
        plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
        plan = re.sub(r"RDD\[\d+\]", "RDD[N]", plan)
        plan = re.sub(r"at localCheckpoint at [^,]*,",
                      "at localCheckpoint at <site>,", plan)
        path = os.path.join(out_dir, f"{slot}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan.strip() + "\n")
        print(path)
    spark.stop()


if __name__ == "__main__":
    main()
