"""fan_out sizing tests (round 12): the widening repartition must be
sized by input bytes, not core count (guide §2.6 — sizing to cores made
kilobyte inputs fan into one near-empty task per core, so the same
query ran slower on 32 cores than on 8 at bench SF)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tally_database_loader_spark.sources import catalog as C

SF = "/root/testdata/sf0.01"


def _n_part(df):
    return df.rdd.getNumPartitions()


def test_fan_out_is_data_derived_not_core_count(spark):
    docs = C.load_table(spark, SF, "documents")
    widened = C.fan_out(docs)
    cap = spark.sparkContext.defaultParallelism
    size = int(docs._jdf.queryExecution().optimizedPlan().stats()
               .sizeInBytes())
    expect = min(cap, max(1, -(-size // C._FANOUT_TASK_BYTES)))
    assert _n_part(widened) == expect
    # the 64 KiB documents.parquet at sf0.01 must NOT fan to one task
    # per core on a wide driver (the r11 32c>8c inversion)
    if cap >= 8:
        assert _n_part(widened) < cap


def test_fan_out_keyed_variant_same_target(spark):
    docs = C.load_table(spark, SF, "documents")
    plain = C.fan_out(docs)
    keyed = C.fan_out(docs, "doc_id")
    assert _n_part(plain) == _n_part(keyed)


def test_fan_out_unknown_stats_falls_back_to_cap(spark):
    # RDD-backed inputs have no size stats -> pre-round-12 behavior
    # (widen to the core-count cap), never a crash
    df = spark.createDataFrame(
        spark.sparkContext.parallelize([(i, "x") for i in range(10)], 2),
        "doc_id long, text string")
    assert (_n_part(C.fan_out(df))
            == spark.sparkContext.defaultParallelism)


def test_fan_out_never_exceeds_default_parallelism(spark):
    # a task-bytes override far below the input size must still cap at
    # the cluster width (the 100 TB guard: ceil(bytes/task) >> cores)
    old = C._FANOUT_TASK_BYTES
    C._FANOUT_TASK_BYTES = 1
    try:
        docs = C.load_table(spark, SF, "documents")
        assert (_n_part(C.fan_out(docs))
                <= spark.sparkContext.defaultParallelism)
    finally:
        C._FANOUT_TASK_BYTES = old
