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
