"""Unit tests for gap fill / LOCF (operators/gapfill.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tally_database_loader_spark.operators.gapfill import gap_fill


def _series(spark):
    # numeric "timestamps": one key with gaps, one key observed once
    return spark.createDataFrame(
        [("a", 10, 1.0, 100),
         ("a", 12, None, 101),   # observed row with NULL value
         ("a", 12, 2.0, 99),     # same cell, lower tiebreak -> loses
         ("a", 31, 3.0, 102),
         ("b", 25, 9.0, 103)],
        "k string, t long, v double, tb long")


def test_gap_fill_locf_semantics(spark):
    out = gap_fill(_series(spark), ["k"], "t", ["v", "tb"],
                   start=0, end=39, step=10, tiebreak="tb")
    rows = {(r["k"], r["cell_ts"]): r for r in out.collect()}
    # dense: 2 keys x 4 cells
    assert len(rows) == 8
    a0, a1, a2, a3 = (rows[("a", c)] for c in (0, 10, 20, 30))
    assert a0["v"] is None and not a0["observed"]          # before first obs
    # t=10 (tb=100) and t=12 (tb=101/99) share cell 1; max (ts, tiebreak)
    # elects (12, 101), whose v is NULL — and row-level LOCF must NOT
    # splice v=1.0 from the losing rows: the whole elected row wins
    assert a1["tb"] == 101 and a1["v"] is None and a1["observed"]
    # the gap cell carries the elected row forward unchanged
    assert a2["tb"] == 101 and a2["v"] is None and not a2["observed"]
    assert a3["v"] == 3.0 and a3["tb"] == 102 and a3["observed"]
    b2 = rows[("b", 20)]
    assert b2["v"] == 9.0 and b2["observed"]
    assert rows[("b", 0)]["v"] is None and rows[("b", 30)]["v"] == 9.0


def test_gap_fill_final_cell_not_truncated(spark):
    # end=39 lies mid-cell 3; an observation at t=39 (after floor(end/step)
    # boundary semantics) must still be elected into cell 3
    df = spark.createDataFrame([("a", 39, 5.0, 1)],
                               "k string, t long, v double, tb long")
    out = gap_fill(df, ["k"], "t", ["v"], start=0, end=30, step=10,
                   tiebreak="tb")
    rows = {r["cell_ts"]: r for r in out.collect()}
    assert rows[30]["v"] == 5.0 and rows[30]["observed"]


def test_gap_fill_rejects_bad_args(spark):
    df = _series(spark)
    with pytest.raises(ValueError):
        gap_fill(df, ["k"], "t", ["v"], start=0, end=10, step=0)
    with pytest.raises(ValueError):
        gap_fill(df, ["k"], "t", ["v"], start=10, end=0, step=5)


def test_gap_fill_timestamp_output_type(spark):
    df = spark.createDataFrame([("a",)], "k string").select(
        "k", F.timestamp_seconds(F.lit(100)).alias("ts"),
        F.lit(1.5).alias("v"))
    out = gap_fill(df, ["k"], "ts", ["v"], start=0, end=200_000_000,
                   step=100_000_000)
    assert dict(out.dtypes)["cell_ts"] == "timestamp"
    assert out.count() == 3
