"""Range join (point-in-interval / interval-overlap) — a join shape Spark
plans badly when there is no equality key.

``points ⋈ intervals ON start <= ts <= end`` with no equi-key gives
Catalyst nothing to hash on: it falls back to BroadcastNestedLoopJoin
(fine only while one side is broadcastable) or a cartesian product —
O(|P|·|I|) comparisons, which at 100 TB is not a plan, it's an outage.

This implementation buckets time into fixed-width cells and turns the
inequality into an equi-join:

1. every interval explodes into the cells it overlaps
   (``floor(start/w) .. floor(end/w)`` — ``ceil(len/w)+1`` rows, so pick
   ``w`` at or above the typical interval length to keep the blow-up ≤ 2×);
2. every point maps to exactly ONE cell (``floor(ts/w)``);
3. equi-join on (keys…, cell) — a plain shuffled hash/sort-merge join
   that partitions, spills, and scales like any other — then the exact
   predicate ``start <= ts <= end`` filters the cell-collision false
   positives.

Correctness does not depend on ``w``: a (point, interval) pair meets in
exactly the point's own cell, so there are no duplicates to dedup and no
misses (the interval covers every cell it overlaps). Only the cost
depends on ``w`` — the classic grid-partitioning trade-off: small ``w``
inflates the interval side, huge ``w`` degrades the residual-filter
selectivity toward the cross product.

Skew note: one pathological interval spanning the whole timeline would
explode into timeline/w rows on a single key-less cell chain — bound
``max_cells`` to fail fast instead of silently materializing it.

Reference parity note: the reference has no range operator (its reports
are equi-join stars, SURVEY §2.F); this is a charter extension for event
pipelines (error-window attribution, validity-interval lookups).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["range_join"]

_CELL = "__range_cell"


def _as_num(df: DataFrame, col: str) -> Column:
    """Timestamps compare as epoch micros; numerics pass through.
    NTZ handled like gapfill._as_num — the session tz is UTC
    (session.py) so the LTZ cast is instant-preserving."""
    dt = df.schema[col].dataType
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(F.col(col))
    if isinstance(dt, T.TimestampNTZType):
        return F.unix_micros(F.col(col).cast("timestamp"))
    return F.col(col)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    keys: Sequence[str] = (),
    bucket_width: int | float = 0,
    max_cells: int = 10_000,
) -> DataFrame:
    """Join each point row to every interval row containing it
    (``start <= point <= end``, inclusive both ends), plus optional
    equality ``keys`` present on both sides.

    ``bucket_width`` is in the column's native units (epoch micros for
    timestamps) and must be > 0. Interval columns are carried into the
    output; names colliding with point columns must be renamed first.
    ``max_cells`` bounds the per-interval explosion (fail fast on a
    timeline-spanning interval instead of materializing it).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be > 0")
    keys = list(keys)
    overlap = (set(intervals.columns) - set(keys)) & set(points.columns)
    if overlap:
        raise ValueError(f"interval columns collide with point columns: {sorted(overlap)}")

    w = F.lit(bucket_width)
    p_ts = _as_num(points, point_col)
    i_start = _as_num(intervals, start_col)
    i_end = _as_num(intervals, end_col)

    first = F.floor(i_start / w).cast("long")
    last = F.floor(i_end / w).cast("long")
    n_cells = last - first + 1
    err = F.concat(
        F.lit(f"range_join: interval spans more than {max_cells} cells "
              f"of width {bucket_width}; raise bucket_width or max_cells "
              f"(interval start="), i_start.cast("string"), F.lit(")"))
    cells = F.when(n_cells > F.lit(max_cells),
                   F.raise_error(err).cast("array<long>")
                   ).otherwise(F.sequence(first, last))
    i = (intervals.filter(i_end >= i_start)
                  .withColumn(_CELL, F.explode(cells)))
    p = points.withColumn(_CELL, F.floor(p_ts / w).cast("long"))

    j = p.join(i, [*keys, _CELL])
    # residual predicate by NAME on the joined frame — pre-join Column
    # objects may not resolve against the join's output attributes
    jp, js, je = (_as_num(j, c) for c in (point_col, start_col, end_col))
    out_cols = points.columns + [c for c in intervals.columns
                                 if c not in keys and c not in points.columns]
    return j.filter((js <= jp) & (jp <= je)).select(*out_cols)
