"""Salted-aggregation / salted-join equivalence (operators/skew.py).

The invariant: salting changes the physical distribution only — every
salted result must equal its unsalted counterpart exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tally_database_loader_spark.operators.skew import (
    salted_aggregate, salted_join)
from tests.conftest import SF_CORRECTNESS


def _events(spark):
    from tally_database_loader_spark.sources.catalog import load_table
    return load_table(spark, SF_CORRECTNESS, "events")


def test_salted_aggregate_equals_direct_groupby(spark):
    e = _events(spark)
    salted = salted_aggregate(
        e, keys=["event_type"],
        aggs={"n": ("count", "event_id"),
              "lo": ("min", "value"),
              "hi": ("max", "value"),
              "users": ("count_distinct", "user_id")},
        distinct_on="event_id", n_salt=16)
    direct = e.groupBy("event_type").agg(
        F.count("event_id").alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.countDistinct("user_id").cast("int").alias("users"))
    assert salted.exceptAll(direct).isEmpty()
    assert direct.exceptAll(salted).isEmpty()


def test_salted_collect_set_equals_direct(spark):
    e = _events(spark).limit(500)
    salted = salted_aggregate(
        e, keys=["event_type"], aggs={"u": ("collect_set", "user_id")},
        distinct_on="event_id", n_salt=8) \
        .select("event_type", F.sort_array("u").alias("u"))
    direct = (e.groupBy("event_type").agg(F.collect_set("user_id").alias("u"))
               .select("event_type", F.sort_array("u").alias("u")))
    assert salted.exceptAll(direct).isEmpty()
    assert direct.exceptAll(salted).isEmpty()


def test_salted_aggregate_spreads_hot_key(spark):
    """Phase 1 must group on (key, salt): the hot key's rows occupy
    n_salt groups, not one."""
    e = _events(spark)
    from tally_database_loader_spark.operators.skew import salt_column
    n_groups = (e.withColumn("_salt", salt_column("event_id", 16))
                 .groupBy("event_type", "_salt").count()
                 .filter(F.col("event_type") == "click").count())
    assert n_groups == 16


def test_salted_join_equals_plain_join(spark):
    e = _events(spark)
    dim = e.select("event_type").distinct() \
           .withColumn("label", F.upper("event_type"))
    salted = salted_join(e, dim, on=["event_type"],
                         distinct_on="event_id", n_salt=4)
    plain = e.join(dim, "event_type")
    cols = sorted(plain.columns)
    assert salted.select(*cols).exceptAll(plain.select(*cols)).isEmpty()
    assert plain.select(*cols).exceptAll(salted.select(*cols)).isEmpty()


def test_non_decomposable_aggregate_rejected(spark):
    e = _events(spark)
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_aggregate(e, keys=["event_type"],
                         aggs={"m": ("median", "value")},
                         distinct_on="event_id")


def test_salted_join_rejects_small_side_preserving_types(spark):
    """right/full outer would emit n_salt null-extended copies of every
    unmatched small-side row — rejected with a clear error."""
    import pytest
    from tally_database_loader_spark.operators.skew import salted_join
    big = spark.createDataFrame([(1, "a")], "k int, v string")
    small = spark.createDataFrame([(2, "b")], "k int, w string")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, ["k"], "k", n_salt=4, how=how)
    # left outer keeps exactly one copy of each big row — unaffected
    got = salted_join(big, small, ["k"], "k", n_salt=4, how="left").collect()
    assert len(got) == 1 and got[0]["w"] is None
