"""Time-series gap fill with last-observation-carried-forward (LOCF).

Turns an irregular observation stream into a dense, fixed-step series per
key — the "hypertable rollup / gap-fill" shape of time-series stores,
which Spark has no native operator for. The plan is built from three
scalable pieces, none of which depends on per-key data volume:

1. **Bucket election** — observations land in ``floor(ts/step)`` cells;
   one aggregation elects the latest observation per (key, cell) via
   ``max(struct(ts, tiebreak, payload))`` — partial-agg friendly, so a
   hot key's millions of raw observations collapse map-side before the
   shuffle.
2. **Spine** — the dense (key × cell) grid is generated closed-form with
   ``sequence()`` + ``explode`` (SURVEY §2.F11: the BigQuery
   ``generate_date_array`` formulation, never a recursive CTE). Spine
   width = distinct keys × cells — independent of observation count.
3. **Carry-forward** — one window per key ordered by cell, filling the
   whole elected row as a single struct with ``last(ignorenulls)``
   (row-level LOCF: a NULL *inside* an observed row stays NULL rather
   than being spliced from an older row — same discipline as
   ``operators/asof.py``).

Total cost: one groupBy shuffle + one join shuffle + one window shuffle,
all on the key — AQE can coalesce them; none is sized by the raw stream.

Reference parity note: the reference's calendar-spine reports
(``reports/mssql/daily-cash-movement.sql:8-13``) left-join a generated
date series against aggregates but never carry values forward; LOCF is
the charter extension (training-data feature tables need
point-in-time-dense features).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["gap_fill"]

_CELL = "__gf_cell"
_ELECT = "__gf_elect"
_PAY = "__gf_payload"


def _as_num(df: DataFrame, col: str) -> Column:
    dt = df.schema[col].dataType
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(F.col(col))
    if isinstance(dt, T.TimestampNTZType):
        # session tz is UTC (session.py) so the LTZ cast is instant-preserving
        return F.unix_micros(F.col(col).cast("timestamp"))
    return F.col(col)


def gap_fill(
    obs: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    start: int,
    end: int,
    step: int,
    tiebreak: str | None = None,
    out_ts: str = "cell_ts",
) -> DataFrame:
    """Dense fixed-``step`` series over ``[start, end]`` (numeric units of
    ``ts_col``; epoch micros for timestamps) for every distinct key with
    at least one observation INSIDE the window, with the latest
    observation in each cell carried forward across empty cells. Keys
    whose observations all fall outside ``[start, end]`` get no rows —
    LOCF never carries in from outside the window, so their series would
    be all-NULL (the classic SQL spine formulation, which the
    ``gap_fill_locf`` oracle replays, scopes keys the same way).

    Within a cell the kept observation is the one with the greatest
    ``(ts, tiebreak)`` — pass a unique ``tiebreak`` column to make
    results deterministic when timestamps can collide. Output:
    ``keys…, out_ts`` (numeric cell start; timestamp if ``ts_col`` is),
    ``value_cols…`` (LOCF-filled, NULL before the first observation) and
    ``observed`` (this cell had its own observation).
    """
    if step <= 0 or end < start:
        raise ValueError("need step > 0 and end >= start")
    keys = list(keys)
    value_cols = list(value_cols)
    ts_num = _as_num(obs, ts_col)
    is_ts = isinstance(obs.schema[ts_col].dataType,
                       (T.TimestampType, T.TimestampNTZType))

    b0, b1 = int(start // step), int(end // step)
    # cell-aligned bounds: every observation belonging to a spine cell
    # participates, including those after `end` inside the final cell
    lo, hi = b0 * step, (b1 + 1) * step
    tie = F.col(tiebreak) if tiebreak else F.lit(0)
    obs_w = obs.filter((ts_num >= F.lit(lo)) & (ts_num < F.lit(hi)))
    elected = (obs_w
                  .groupBy(*keys, F.floor(ts_num / F.lit(step)).cast("long").alias(_CELL))
                  .agg(F.max(F.struct(ts_num.alias("__ts"), tie.alias("__tie"),
                                      F.struct(*value_cols).alias(_PAY)))
                        .alias(_ELECT))
                  .select(*keys, _CELL, F.col(f"{_ELECT}.{_PAY}").alias(_PAY)))

    # spine keys = keys with at least one observation IN the window (the
    # classic SQL formulation the oracle replays); keys that went quiet
    # before `start` get no series — LOCF never carries in from outside
    # the window, so their rows would be all-NULL noise
    spine = (obs_w.select(*keys).distinct()
                .withColumn(_CELL, F.explode(F.sequence(F.lit(b0), F.lit(b1)))))

    w = (W.partitionBy(*keys).orderBy(_CELL)
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    filled = (spine.join(elected, [*keys, _CELL], "left")
                   .withColumn("observed", F.col(_PAY).isNotNull())
                   .withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w)))

    cell_start = F.col(_CELL) * F.lit(step)
    if is_ts:
        out = F.timestamp_micros(cell_start)
        # preserve the input's type family: timestamp_micros emits LTZ, so an
        # NTZ ts_col must be cast back or gap_fill silently changes the schema
        if isinstance(obs.schema[ts_col].dataType, T.TimestampNTZType):
            out = out.cast("timestamp_ntz")
    else:
        out = cell_start
    return filled.select(
        *keys,
        out.alias(out_ts),
        *[F.col(f"{_PAY}.{c}").alias(c) for c in value_cols],
        "observed")
