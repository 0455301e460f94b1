"""As-of (temporal backward) join — an operator Spark lacks natively.

For each left row, attach the most recent right row with the same key and
``right_ts <= left_ts``. The naive formulation (inequality join + latest-
per-group) is a near-cross-product per key; at 100 TB it explodes. This
implementation is the canonical single-shuffle union trick:

1. tag both sides and union them on (key, ts) — one dataset, no join;
2. one window per key ordered by (ts, side, tiebreak) carrying the right
   side's payload forward with ``last(..., ignorenulls=True)``;
3. keep only left rows — each now holds the latest right payload at-or-
   before its timestamp.

Cost: ONE shuffle of |L|+|R| rows on the key — the same price as a plain
equi-join, independent of how many right rows precede each left row. The
window is per-key, so skew mitigations (salting by coarse time bucket)
compose if a single key dominates.

The right payload travels as ONE struct column, so a NULL inside a value
column never causes the window to splice fields from different right rows
— null-ness is decided at the row level, not per column.

Reference parity note: the reference has no as-of operator (its streaming
model is change-polling, SURVEY §2.H); this is a charter extension for
event/feature pipelines (point-in-time-correct feature lookup).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["asof_join"]

_SIDE = "__asof_side"
_TS = "__asof_ts"
_PAY = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join (``right_ts <= left_ts``, latest wins).

    ``value_cols`` are the right-side payload columns to attach; they must
    not collide with left column names. Ties on ``right_ts`` are broken by
    ``tiebreak`` (largest wins) so the result is deterministic under
    retries/speculation; when several right rows share (key, ts) exactly,
    the one with the greatest tiebreak value is attached. Left rows with
    no preceding right row get NULL payload (left-outer semantics).
    """
    keys = list(keys)
    value_cols = list(value_cols)
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")

    tie = F.col(tiebreak) if tiebreak else F.lit(0)
    # a NULL right_ts satisfies no `right_ts <= left_ts` predicate, but
    # would sort FIRST in the ascending window (NULLS FIRST) and backfill
    # left rows that should get the left-outer NULL — drop such rows
    r = right.filter(F.col(right_ts).isNotNull()).select(
        *keys,
        F.col(right_ts).alias(_TS),
        tie.alias("__asof_tie"),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in value_cols]).alias(_PAY),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias(_TS),
        F.lit(None).cast(r.schema["__asof_tie"].dataType).alias("__asof_tie"),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAY].dataType).alias(_PAY),
    )
    # Right rows sort before left rows at the same timestamp (side 0 < 1)
    # giving <= semantics; among equal-ts right rows the largest tiebreak
    # sorts last, so last(ignorenulls) picks it.
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (W.partitionBy(*keys)
          .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc(),
                   F.col("__asof_tie").asc_nulls_first())
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    filled = unioned.withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w))
    return (filled.filter(F.col(_SIDE) == 1)
                  .select(*left.columns,
                          *[F.col(f"{_PAY}.{c}").alias(c) for c in value_cols]))
