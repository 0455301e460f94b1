"""Custom stateful streaming operator (SURVEY §2.I4 surface).

The reference keeps its only cross-poll state driver-side (the cached
last-AlterId pair, reference src/index.mts:60-71). For operators whose
state must live *per key at data scale* — running balances, lifetime
counters — Structured Streaming's ``applyInPandasWithState`` is the
escape hatch: user state per group key, Arrow-batched, checkpointed with
the query, spilling to the state store rather than the driver.

``running_totals`` is the accounting-native example: per-ledger lifetime
(count, sum) maintained across micro-batches — the streaming form of a
cumulative trial-balance feed. State is two scalars per key, so a year of
100 TB/day events stores gigabytes, not the stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "key bigint, n_events bigint, total double"
_STATE_SCHEMA = "n bigint, total double"


def running_totals(events: DataFrame, *, key_col: str = "user_id",
                   val_col: str = "value") -> DataFrame:
    """Per-key lifetime (n_events, total) maintained in keyed state.

    Each micro-batch folds its rows into the key's (n, total) pair and
    emits the updated pair — ``update`` output mode semantics. Restarting
    from the checkpoint resumes the totals (asserted in
    tests/test_streaming.py)."""

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[val_col].sum())
        state.update((n, total))
        yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total": [total]})

    return (events.groupBy(key_col)
            .applyInPandasWithState(update, _OUT_SCHEMA, _STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))


_DEDUP_OUT = "fingerprint string, doc_id bigint, dup_count bigint"
_DEDUP_STATE = "keeper bigint, dups bigint"


def streaming_dedup(docs: DataFrame, *, key_col: str = "fingerprint",
                    id_col: str = "doc_id") -> DataFrame:
    """Streaming exact dedup: first document per fingerprint wins, forever.

    The streaming form of ``llm/dedup.exact_duplicates`` for continuous
    corpus ingestion: keyed state stores (keeper_id, dup_count) per
    fingerprint — two scalars, so state size is bounded by distinct
    content, not stream length — and each micro-batch emits one row per
    fingerprint it touched with the stable keeper and the updated
    duplicate count (``update`` semantics: downstream keeps rows where
    doc_id == keeper and reads dup_count for stats). The keeper is the
    MIN doc_id of the earliest micro-batch that saw the fingerprint —
    row order inside a batch is shuffle-dependent, so "first row wins"
    would be nondeterministic; min-wins matches the batch operator's
    keep_id = min(doc_id) convention and is retry-stable. Checkpoint
    recovery resumes the seen-set (asserted in tests/test_streaming.py),
    which is what makes ingestion restarts idempotent."""

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        keeper, dups = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            batch_min = int(pdf[id_col].min())
            if keeper is None:
                keeper = batch_min
                dups += len(pdf) - 1
            else:
                dups += len(pdf)
        state.update((keeper, dups))
        yield pd.DataFrame({"fingerprint": [key[0]], "doc_id": [keeper],
                            "dup_count": [dups]})

    return (docs.groupBy(key_col)
            .applyInPandasWithState(update, _DEDUP_OUT, _DEDUP_STATE,
                                    "update", GroupStateTimeout.NoTimeout))
