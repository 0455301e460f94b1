"""Unit tests for the bucketed range join (operators/range_join.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tally_database_loader_spark.operators.range_join import range_join


def _data(spark):
    # points at integer positions 0..49; intervals of assorted lengths,
    # including touching boundaries, zero-length, and inverted (dropped)
    points = spark.createDataFrame(
        [(i, i) for i in range(50)], "pid int, x int")
    intervals = spark.createDataFrame(
        [(100, 0, 0),     # zero-length: matches exactly x=0
         (101, 5, 9),     # inclusive both ends: 5..9
         (102, 9, 20),    # overlaps 101 at x=9
         (103, 49, 60),   # runs past the point range
         (104, 30, 25)],  # inverted -> matches nothing
        "iid int, s int, e int")
    return points, intervals


def _naive(points, intervals):
    return (points.join(intervals,
                        (intervals["s"] <= points["x"])
                        & (points["x"] <= intervals["e"]))
                  .select("pid", "x", "iid", "s", "e"))


@pytest.mark.parametrize("width", [1, 3, 7, 100])
def test_range_join_matches_naive_any_bucket_width(spark, width):
    points, intervals = _data(spark)
    got = range_join(points, intervals, "x", "s", "e", bucket_width=width)
    exp = _naive(points, intervals)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))
    rows = {(r["pid"], r["iid"]) for r in got.collect()}
    assert (0, 100) in rows          # zero-length interval, boundary hit
    assert (5, 101) in rows and (9, 101) in rows   # inclusive ends
    assert (9, 102) in rows          # overlapping intervals both match
    assert not any(i == 104 for _, i in rows)      # inverted dropped


def test_range_join_with_equality_keys(spark):
    points = spark.createDataFrame(
        [("a", 5), ("b", 5)], "k string, x int")
    intervals = spark.createDataFrame(
        [("a", 0, 10, 1)], "k string, s int, e int, iid int")
    got = range_join(points, intervals, "x", "s", "e", keys=["k"],
                     bucket_width=4)
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["k"] == "a" and rows[0]["iid"] == 1


def test_range_join_timestamps_and_plan_shape(spark):
    e = spark.range(2000).select(
        F.col("id").alias("pid"),
        F.timestamp_seconds(F.col("id") * 13 % 86400).alias("ts"))
    iv = spark.range(40).select(
        F.col("id").alias("iid"),
        F.timestamp_seconds(F.col("id") * 1000).alias("s"),
        F.timestamp_seconds(F.col("id") * 1000 + 600).alias("e"))
    out = range_join(e, iv, "ts", "s", "e", bucket_width=600_000_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    # equivalence against the inequality join
    exp = (e.join(iv, (iv["s"] <= e["ts"]) & (e["ts"] <= iv["e"]))
            .select("pid", "ts", "iid", "s", "e"))
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, exp.collect()))


def test_range_join_rejects_bad_inputs(spark):
    points, intervals = _data(spark)
    with pytest.raises(ValueError):
        range_join(points, intervals, "x", "s", "e", bucket_width=0)
    with pytest.raises(ValueError):
        range_join(points, points.withColumnRenamed("pid", "s")
                                 .withColumnRenamed("x", "e")
                                 .withColumn("x", F.lit(1)),
                   "x", "s", "e", bucket_width=1)


def test_range_join_max_cells_fails_fast(spark):
    from py4j.protocol import Py4JJavaError
    points = spark.createDataFrame([(1,)], "x long")
    intervals = spark.createDataFrame([(0, 10_000_000, 1)], "s long, e long, iid int")
    with pytest.raises(Exception) as ei:
        range_join(points, intervals, "x", "s", "e", bucket_width=1,
                   max_cells=100).collect()
    assert "range_join" in str(ei.value)
