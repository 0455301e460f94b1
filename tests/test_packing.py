"""Invariants for sequence packing, domain capping, and int8 quantization
(llm/packing.py, llm/similarity.py quantized path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECTNESS
from tally_database_loader_spark.llm.packing import domain_cap, pack_sequences
from tally_database_loader_spark.llm.similarity import cosine_topk, quantized_topk
from tally_database_loader_spark.sources.catalog import load_table


def test_pack_sequences_tiles_stream_exactly(spark):
    d = load_table(spark, SF_CORRECTNESS, "documents")
    L = 512
    packed = pack_sequences(d, "source", "doc_id", "n_chars", seq_len=L)
    packed = packed.localCheckpoint(eager=True)

    # per-doc slices cover [0, n) without gaps or overlap
    per_doc = (packed.groupBy("shard", "doc_id")
               .agg(F.sum(F.col("tok_to") - F.col("tok_from")).alias("covered"),
                    F.min("tok_from").alias("mn"), F.max("tok_to").alias("mx")))
    docs = d.filter(F.col("n_chars") > 0).select(
        F.col("source").alias("shard"), "doc_id",
        F.col("n_chars").cast("long").alias("n"))
    bad_docs = (per_doc.join(docs, ["shard", "doc_id"])
                .filter((F.col("covered") != F.col("n")) | (F.col("mn") != 0)
                        | (F.col("mx") != F.col("n"))))
    assert bad_docs.count() == 0

    # every sequence except the last per shard holds exactly L tokens
    per_seq = (packed.groupBy("shard", "seq_idx")
               .agg(F.sum(F.col("tok_to") - F.col("tok_from")).alias("filled")))
    last = per_seq.groupBy("shard").agg(F.max("seq_idx").alias("last_idx"))
    bad_seqs = (per_seq.join(last, "shard")
                .filter((F.col("seq_idx") != F.col("last_idx"))
                        & (F.col("filled") != L)))
    assert bad_seqs.count() == 0

    # slice starts inside the sequence are consistent: seq_pos + (tok_to -
    # tok_from) never exceeds L
    assert packed.filter(
        F.col("seq_pos") + F.col("tok_to") - F.col("tok_from") > L).count() == 0


def test_pack_sequences_rejects_bad_seq_len(spark):
    import pytest
    d = load_table(spark, SF_CORRECTNESS, "documents")
    with pytest.raises(ValueError):
        pack_sequences(d, "source", "doc_id", "n_chars", seq_len=0)


def test_weighted_sample_biased_deterministic_and_guarded(spark):
    from tally_database_loader_spark.llm.packing import weighted_sample
    import pytest
    # 100 heavy rows (w=100) among 1000; a 100-draw A-ES sample should be
    # dominated by them (heavy mass = 100*100 / (100*100 + 900) ≈ 92%)
    rows = [(i, 100 if i < 100 else 1) for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_sample(docs, "w", k=100).collect()
    assert len(got) == 100
    heavy = sum(1 for r in got if r["doc_id"] < 100)
    assert heavy >= 70, f"weighting not biasing the draw: {heavy}/100 heavy"
    # deterministic: identical set + priorities on re-run
    again = weighted_sample(docs, "w", k=100).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    # zero/NULL weights are excluded, never sampled
    mixed = spark.createDataFrame(
        [(1, 5), (2, 0), (3, None), (4, 5)], "doc_id long, w long")
    ids = {r["doc_id"] for r in weighted_sample(mixed, "w", k=10).collect()}
    assert ids == {1, 4}
    with pytest.raises(ValueError):
        weighted_sample(docs, "w", k=0)


def test_domain_cap_bounds_and_determinism(spark):
    d = load_table(spark, SF_CORRECTNESS, "documents")
    capped = domain_cap(d, "source", "doc_id", k=10)
    sizes = capped.groupBy("grp").count()
    assert sizes.filter(F.col("count") > 10).count() == 0
    # deterministic: two runs pick identical sets
    a = {tuple(r) for r in capped.collect()}
    b = {tuple(r) for r in domain_cap(d, "source", "doc_id", k=10).collect()}
    assert a == b
    # groups smaller than k keep everything
    group_sizes = dict(d.groupBy("source").count().collect())
    kept = dict(sizes.collect())
    for g, n in group_sizes.items():
        assert kept[g] == min(n, 10)


def test_quantized_topk_recall_vs_exact(spark):
    e = load_table(spark, SF_CORRECTNESS, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    exact = cosine_topk(e, q, k=5)
    quant = quantized_topk(e, q, k=5)
    ex = {(r.q_id, r.neighbor_id) for r in exact.collect()}
    qz = {(r.q_id, r.neighbor_id) for r in quant.collect()}
    # int8 with per-vector scale keeps ranking nearly intact: ≥80% of the
    # exact top-5 pairs survive quantization
    assert len(ex & qz) / len(ex) >= 0.8


def test_pack_sequences_duplicate_doc_ids_still_tile(spark):
    """Regression: with the RANGE-frame default, duplicate doc_ids within a
    shard shared one running sum and produced overlapping __start offsets.
    The ROWS frame gives each row its own offset, so the tiling invariant
    must hold even with every doc_id duplicated."""
    from tally_database_loader_spark.llm.packing import pack_sequences
    import pyspark.sql.functions as F

    rows = [("s", f"d-{i % 3}", 7) for i in range(6)]  # ids d-0..d-2, twice each
    docs = spark.createDataFrame(rows, "shard string, doc_id string, n long")
    out = pack_sequences(docs, "shard", "doc_id", "n", seq_len=10).collect()
    # total stream = 42 tokens -> sequences 0..4; every slice non-empty
    assert all(r.tok_to > r.tok_from for r in out)
    # tiling: per sequence, slice lengths sum to seq_len (last partial)
    per_seq = {}
    for r in out:
        per_seq.setdefault(r.seq_idx, 0)
        per_seq[r.seq_idx] += r.tok_to - r.tok_from
    assert per_seq == {0: 10, 1: 10, 2: 10, 3: 10, 4: 2}
    # per-row coverage: each physical row contributes exactly its n tokens
    total = sum(r.tok_to - r.tok_from for r in out)
    assert total == 42


def test_length_bucketed_batches_shape_and_waste(spark):
    """Batches are full except the last per shard; lengths are
    non-decreasing across batch boundaries within a shard; and the
    length-sorted layout never pads worse than the same batching over
    hash order (the unsorted loader baseline)."""
    from pyspark.sql import functions as F

    from tally_database_loader_spark.llm.packing import (
        batch_padding_stats, hash_order, length_bucketed_batches)
    from tally_database_loader_spark.sources.catalog import load_table

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    B, S = 16, 4
    b = length_bucketed_batches(d, "doc_id", "n_chars", B, S).cache()
    stats = batch_padding_stats(b).collect()
    per_shard = {}
    for r in stats:
        per_shard.setdefault(r.shard, []).append(r)
    for shard, rows in per_shard.items():
        rows.sort(key=lambda r: r.batch_idx)
        assert [r.batch_idx for r in rows] == list(range(len(rows)))
        assert all(r.n_docs == B for r in rows[:-1])
        assert 1 <= rows[-1].n_docs <= B
    # monotone boundaries: max of batch k <= max of batch k+1
    for rows in per_shard.values():
        ms = [r.tok_max for r in sorted(rows, key=lambda r: r.batch_idx)]
        assert ms == sorted(ms)
    sorted_waste = sum(r.pad_waste for r in stats)
    # baseline: same shards, batches cut in hash order (loader without
    # group_by_length)
    w = (__import__("pyspark.sql.window", fromlist=["Window"]).Window
         .partitionBy("shard").orderBy("hk"))
    base = (d.select(F.pmod(hash_order(F.col("doc_id")), F.lit(S))
                      .cast("int").alias("shard"),
                     hash_order(F.concat(F.lit("o:"),
                                         F.col("doc_id").cast("string")))
                     .alias("hk"),
                     F.col("n_chars").cast("long").alias("n_tokens"))
              .withColumn("batch_idx",
                          ((F.row_number().over(w) - 1) / B).cast("int")))
    naive = (base.groupBy("shard", "batch_idx")
                 .agg((F.count(F.lit(1)) * F.max("n_tokens")
                       - F.sum("n_tokens")).alias("waste"))
                 .agg(F.sum("waste")).first()[0])
    assert sorted_waste <= naive
    assert sorted_waste < naive * 0.5  # and decisively so on real lengths
