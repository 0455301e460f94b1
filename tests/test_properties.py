"""Property-based tests (hypothesis) for the custom operators whose
invariants must hold on arbitrary inputs, not just the bench shapes."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(deadline=None, max_examples=12,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


@settings(**_SETTINGS)
@given(
    lens=st.lists(st.integers(min_value=0, max_value=37), min_size=1, max_size=24),
    seq_len=st.integers(min_value=1, max_value=19),
    dup_every=st.integers(min_value=2, max_value=5),
)
def test_pack_sequences_invariants(spark, lens, seq_len, dup_every):
    """For ANY doc-length multiset (zero lengths, duplicate ids) and any
    seq_len: slices tile each sequence exactly; per-row coverage equals
    the row's length; offsets never overlap."""
    from tally_database_loader_spark.llm.packing import pack_sequences
    rows = [("s", f"d-{i // dup_every}", n) for i, n in enumerate(lens)]
    docs = spark.createDataFrame(rows, "shard string, doc_id string, n long")
    out = pack_sequences(docs, "shard", "doc_id", "n", seq_len=seq_len).collect()
    total = sum(n for n in lens)
    # per-sequence tiling
    per_seq = {}
    for r in out:
        assert 0 <= r.seq_pos < seq_len
        assert 0 <= r.tok_from < r.tok_to
        per_seq[r.seq_idx] = per_seq.get(r.seq_idx, 0) + (r.tok_to - r.tok_from)
    if total == 0:
        assert out == []
        return
    n_seqs = (total + seq_len - 1) // seq_len
    assert set(per_seq) == set(range(n_seqs))
    for s in range(n_seqs - 1):
        assert per_seq[s] == seq_len
    assert per_seq[n_seqs - 1] == total - (n_seqs - 1) * seq_len
    # total coverage
    assert sum(r.tok_to - r.tok_from for r in out) == total


@settings(**_SETTINGS)
@given(
    events=st.lists(st.tuples(st.integers(0, 50), st.integers(0, 9)),
                    min_size=0, max_size=30),
    queries=st.lists(st.tuples(st.integers(0, 50), st.integers(0, 9)),
                     min_size=1, max_size=15),
)
def test_asof_join_matches_naive(spark, events, queries):
    """asof_join == the naive per-query max-ts-not-after lookup for ANY
    event/query multiset (ties included)."""
    from tally_database_loader_spark.operators.asof import asof_join
    ev = spark.createDataFrame(
        [(k, t, f"v{t}@{k}#{i}") for i, (t, k) in enumerate(events)],
        "key int, ts int, payload string")
    qr = spark.createDataFrame(
        [(k, t, i) for i, (t, k) in enumerate(queries)],
        "key int, ts int, qid int")
    got = {r.qid: r.payload
           for r in asof_join(qr, ev, keys=["key"], left_ts="ts",
                              right_ts="ts", value_cols=["payload"],
                              tiebreak="payload").collect()}
    for i, (t, k) in enumerate(queries):
        cands = [(et, p) for j, (et, ek) in enumerate(events)
                 for p in [f"v{et}@{ek}#{j}"] if ek == k and et <= t]
        expect = max(cands)[1] if cands else None
        assert got.get(i) == expect, (i, t, k, got.get(i), expect)


@settings(**_SETTINGS)
@given(
    points=st.lists(st.integers(0, 60), min_size=0, max_size=25),
    ivals=st.lists(st.tuples(st.integers(0, 60), st.integers(0, 20)),
                   min_size=0, max_size=15),
    width=st.integers(1, 25),
)
def test_range_join_matches_naive(spark, points, ivals, width):
    """Grid-cell range join == the naive theta join for ANY point set,
    interval set (incl. empty/degenerate) and bucket width."""
    from tally_database_loader_spark.operators.range_join import range_join
    pts = spark.createDataFrame([(i, p) for i, p in enumerate(points)],
                                "pid int, x int")
    iv = spark.createDataFrame(
        [(j, s, s + d) for j, (s, d) in enumerate(ivals)],
        "iid int, lo int, hi int")
    got = sorted((r.pid, r.iid) for r in
                 range_join(pts, iv, "x", "lo", "hi",
                            bucket_width=width).collect())
    expect = sorted((i, j) for i, p in enumerate(points)
                    for j, (s, d) in enumerate(ivals) if s <= p <= s + d)
    assert got == expect
