#!/usr/bin/env python3
"""Replay registered gate queries against their DuckDB oracles at an
arbitrary scale factor (default sf0.1 — 10× the driver's correctness
scale). This is the scale-determinism evidence SCALE.md cites: the
decimal-money, integer-sketch, fixed-point-ln and fold-ordering
contracts must hold as data grows, not just at the gate's SF.

Usage: python tools_replay_sf.py [sf_dir] [--window] [--from=NAME]
  --window: only the driver's 50-query window (faster); default all.
  --from=NAME: resume the sorted sweep at NAME (inclusive) — lets a
    timed-out run continue into a second log instead of repaying the
    slow recursive-CTE oracles it already passed.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    import duckdb

    from tally_database_loader_spark.plans import gate
    from tally_database_loader_spark.session import get_spark
    from tests.oracle_utils import compare_spark_duckdb

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = sorted(gate.QUERIES)
    if "--window" in sys.argv:
        from tally_database_loader_spark import plans
        names = list(plans.QUERIES)[:50]
    for a in sys.argv[1:]:
        if a.startswith("--from="):
            start = a[len("--from="):]
            if start not in names:
                print(f"--from={start}: not a registered query")
                return 1
            names = names[names.index(start):]

    spark = get_spark("replay")
    duck = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        duck.sql(f"CREATE VIEW {t} AS "
                 f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    t0 = time.time()
    for i, name in enumerate(names):
        df = gate.QUERIES[name](spark, sf_dir)
        if name not in gate.ORACLES:
            n = df.count()
            print(f"[{i:3d}] {name:32s} rows={n:7d} (rows-only)")
            continue
        try:
            ok, msg = compare_spark_duckdb(df, duck, gate.ORACLES[name])
        except Exception as ex:  # noqa: BLE001 - record and continue
            ok, msg = False, f"exception: {ex}"
        print(f"[{i:3d}] {name:32s} {'OK' if ok else 'FAIL ' + str(msg)[:120]}")
        if not ok:
            failures.append((name, msg))
    print(f"\n{len(names)} queries at {sf_dir} in {time.time() - t0:.0f}s; "
          f"{len(failures)} failures")
    for name, msg in failures:
        print(f"  FAIL {name}: {str(msg)[:300]}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
