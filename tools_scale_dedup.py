#!/usr/bin/env python3
"""Scale evidence for the guarded dedup paths (VERDICT r5 "Next round"
#7): measure the SemDeDup pair-stage row count with and without the
hot-cluster guard at two scale factors, assert the capped count stays
under the cap-derived bound, and value-hash the two flagship gates
(``semantic_dedup_capped``, ``two_tier_dedup``) against their DuckDB
oracles at BOTH scales. The printed table is what SCALE.md §14 cites.

Usage: python tools_scale_dedup.py [sf_small] [sf_big]
       (defaults /root/testdata/sf0.01 /root/testdata/sf0.1)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def pair_count(spark, sf_dir: str, cell_cap: int | None) -> tuple[int, int]:
    """(corpus rows, pair-stage rows) of the semantic_dedup pair join at
    the gate's exact parameters (n_lists=8, iters=2)."""
    from pyspark.sql import functions as F

    from tally_database_loader_spark.llm.similarity import semantic_cells
    from tally_database_loader_spark.sources.catalog import load_table
    e = load_table(spark, sf_dir, "embeddings")
    assigned, key = semantic_cells(e, n_lists=8, iters=2, cell_cap=cell_cap)
    a = assigned.select(F.col("n_id").alias("a_id"), *key)
    b = assigned.select(F.col("n_id").alias("b_id"), *key)
    pairs = a.join(b, key).filter(F.col("a_id") < F.col("b_id")).count()
    return e.count(), pairs


def main() -> int:
    import duckdb

    from tally_database_loader_spark.plans import gate
    from tally_database_loader_spark.plans.llm_gate import _DD_SD_CAP
    from tally_database_loader_spark.session import get_spark
    from tests.oracle_utils import compare_spark_duckdb

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dirs = args or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark("scale-dedup")
    failures = 0
    print(f"| sf_dir | rows | pairs uncapped | pairs cap={_DD_SD_CAP} | "
          "bound rows*cap | semantic_dedup_capped | two_tier_dedup |")
    print("|---|---|---|---|---|---|---|")
    for sf_dir in sf_dirs:
        n, p_raw = pair_count(spark, sf_dir, None)
        _, p_cap = pair_count(spark, sf_dir, _DD_SD_CAP)
        bound = n * _DD_SD_CAP
        if p_cap > bound:
            failures += 1
        duck = duckdb.connect()
        for t in TABLES:
            duck.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                     f"read_parquet('{sf_dir}/{t}.parquet')")
        cells = []
        for name in ("semantic_dedup_capped", "two_tier_dedup"):
            t0 = time.perf_counter()
            ok, msg = compare_spark_duckdb(
                gate.QUERIES[name](spark, sf_dir), duck, gate.ORACLES[name])
            dt = time.perf_counter() - t0
            cells.append(f"{'HASH-OK' if ok else 'FAIL ' + msg} "
                         f"({dt:.1f}s)")
            if not ok:
                failures += 1
        duck.close()
        print(f"| {sf_dir} | {n} | {p_raw} | {p_cap} "
              f"| {bound} {'OK' if p_cap <= bound else 'EXCEEDED'} "
              f"| {cells[0]} | {cells[1]} |")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
