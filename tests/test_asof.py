"""Unit tests for the as-of join operator (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tally_database_loader_spark.operators.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def _naive_asof(left, right, key, lts, rts, value_cols, tiebreak):
    """Reference semantics: inequality join + keep latest (ts, tiebreak)."""
    r = right.select(
        F.col(key).alias("__k"), F.col(rts).alias("__rts"),
        *[F.col(c) for c in value_cols], F.col(tiebreak).alias("__tb"))
    j = left.join(r, (left[key] == F.col("__k")) & (F.col("__rts") <= left[lts]),
                  "left")
    w = (W.partitionBy(*[left[c] for c in left.columns])
          .orderBy(F.col("__rts").desc_nulls_last(), F.col("__tb").desc_nulls_last()))
    return (j.withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") == 1)
             .select(*left.columns, *value_cols))


def test_asof_matches_naive_with_ties_and_missing(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), "a"), (1, _ts(0), "b"), (2, _ts(10), "c"),
         (3, _ts(7), "d"),  # key with no right rows at all
         (1, _ts(2), "e")],
        "k int, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts(2), 10, 1.0),   # equal to a left ts -> <= must include it
         (1, _ts(2), 11, 2.0),   # tie on (k, ts): larger rid must win
         (1, _ts(4), 12, 3.0),
         (2, _ts(11), 13, 4.0)],  # after the only left row for k=2 -> null
        "k int, ts timestamp, rid int, val double")
    got = asof_join(left, right, ["k"], "ts", "ts", ["rid", "val"],
                    tiebreak="rid")
    exp = _naive_asof(left, right, "k", "ts", "ts", ["rid", "val"], "rid")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))
    by_tag = {r["tag"]: r for r in got.collect()}
    assert by_tag["e"]["rid"] == 11          # tie resolved to max tiebreak
    assert by_tag["a"]["rid"] == 12          # latest at-or-before wins
    assert by_tag["b"]["rid"] is None        # nothing at-or-before
    assert by_tag["c"]["rid"] is None        # right row is strictly later
    assert by_tag["d"]["rid"] is None        # key absent from right


def test_asof_null_payload_not_spliced(spark):
    """A NULL inside the matched right row must surface as NULL, not be
    backfilled from an older right row (struct payload, not per-column)."""
    left = spark.createDataFrame([(1, _ts(9))], "k int, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(1), 1, 1.5), (1, _ts(5), 2, None)],
        "k int, ts timestamp, rid int, val double")
    row = asof_join(left, right, ["k"], "ts", "ts", ["rid", "val"],
                    tiebreak="rid").collect()[0]
    assert row["rid"] == 2 and row["val"] is None


def test_asof_single_shuffle_plan(spark):
    """The whole as-of join must cost one Exchange (the key shuffle feeding
    the window) — no join operator, no inequality explosion."""
    left = spark.range(100).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"))
    right = spark.range(100).select(
        (F.col("id") % 10).alias("k"),
        F.timestamp_seconds(F.col("id") * 30).alias("ts"),
        F.col("id").alias("rid"))
    plan = asof_join(left, right, ["k"], "ts", "ts", ["rid"],
                     tiebreak="rid")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_asof_rejects_colliding_columns(spark):
    import pytest
    left = spark.createDataFrame([(1, _ts(1), 5)], "k int, ts timestamp, rid int")
    right = spark.createDataFrame([(1, _ts(0), 6)], "k int, ts timestamp, rid int")
    with pytest.raises(ValueError):
        asof_join(left, right, ["k"], "ts", "ts", ["rid"])


def test_null_right_ts_never_backfills(spark):
    """A NULL right timestamp satisfies no `right_ts <= left_ts`; it must
    not win the as-of window (NULLS FIRST would have made it everyone's
    oldest match)."""
    from tally_database_loader_spark.operators.asof import asof_join
    left = spark.createDataFrame([("K", 5)], "k string, lts int")
    right = spark.createDataFrame([("K", None, "ghost"), ("K", 9, "late")],
                                  "k string, rts int, payload string")
    out = asof_join(left, right, ["k"], "lts", "rts", ["payload"]).collect()
    assert len(out) == 1 and out[0]["payload"] is None
