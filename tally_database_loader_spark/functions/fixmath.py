"""Cross-engine-exact fixed-point transcendental math.

The engine's determinism contract (ORACLES.md) is that every value the
driver hash-checks is reproducible bit-for-bit by a SQL oracle. Integer
arithmetic and IEEE ``+ - * /`` are — every engine rounds them
identically — but ``ln`` is NOT: libm, the JVM and DuckDB may differ by
1 ulp, and a 1-ulp flip at a ``floor`` boundary breaks a strict value
hash (ADVICE r2: weighted_sample's ``floor(ln(u)/w·1e9)`` and
HyperLogLog's linear-counting ``m·ln(m/V)`` both carried that residual
risk).

``ln_fixed`` removes the transcendental entirely: for an integer
``v ∈ [1, 2^20]`` it computes ``round-ish(ln(v)·2^30)`` with PURE int64
arithmetic —

1. normalize: ``e = bit_length(v)-1`` via a comparison fold (the
   llm/sketch.py rho trick), ``M = v·2^(20-e)`` so ``m = M/2^20 ∈ [1,2)``;
2. ``z = (m-1)/(m+1) ∈ [0, 1/3)`` in scale-2^30 fixed point;
3. ``ln m = 2·atanh z ≈ 2(z + z³/3 + z⁵/5 + z⁷/7 + z⁹/9)`` with every
   product truncated back to scale 2^30 (``div`` — non-negative
   operands, so Spark's truncating div and DuckDB's ``//`` agree);
4. ``ln v = ln m + e·LN2_F`` with ``LN2_F = floor(ln 2 · 2^30)``.

Every step is integer, so Spark, DuckDB and the Python reference below
produce the IDENTICAL int64 (asserted exhaustively in
tests/test_properties.py). Absolute error vs true ln is < 2e-6 (series
tail (1/3)^11/11 plus a few truncation ulps at 2^-30) — irrelevant for
sampling/sketch quality, which only need a monotone-ish deterministic
log — and the value is the SAME everywhere, which is what the hash gate
needs.

The three renderings (Column / SQL / Python) are generated from the one
term schedule in ``_SERIES`` so they cannot drift.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["LN_SCALE", "LN2_F", "ln_fixed", "ln_fixed_staged",
           "ln_fixed_py", "dd_ln_fixed"]

MAX_BITS = 20          # domain: v in [1, 2^20]
LN_SCALE = 1 << 30     # fixed-point scale of the result
_K = 1 << MAX_BITS     # normalization scale of M
LN2_F = 744261117      # floor(ln 2 · 2^30) — shared by all renderings
_SERIES = (3, 5, 7, 9)  # atanh denominators after the leading z term


def ln_fixed(v: Column) -> Column:
    """``ln(v)·2^30`` as exact int64 for integer ``v ∈ [1, 2^20]``.

    Map-side codegen only (a comparison fold, one variable-amount
    shift via ``shiftleft``, and a handful of int64 mul/div) — no
    shuffle, no UDF."""
    v = v.cast("long")
    e = reduce(add, [(v >= F.lit(1 << k)).cast("int")
                     for k in range(1, MAX_BITS + 1)])

    def _div(a: Column, b: Column) -> Column:
        return F.call_function("div", a, b)

    m_ = _div(v * F.lit(_K),
              F.call_function("shiftleft", F.lit(1).cast("long"), e))
    z = _div((m_ - F.lit(_K)) * F.lit(LN_SCALE), m_ + F.lit(_K))
    z2 = _div(z * z, F.lit(LN_SCALE))
    terms, t = z, z
    for d in _SERIES:
        t = _div(t * z2, F.lit(LN_SCALE))
        terms = terms + _div(t, F.lit(d))
    return (F.lit(2) * terms + e.cast("long") * F.lit(LN2_F)).cast("long")


def ln_fixed_staged(df, v: Column, out: str):
    """``ln_fixed`` as STAGED projections: each intermediate (e, M, z,
    z², series terms) lands in its own column, so every level references
    an attribute instead of re-embedding the whole subtree.

    The inline ``ln_fixed`` Column is correct but its expression tree is
    multiplicative — z² embeds z twice, every series term embeds the
    previous term, and z itself embeds the 20-comparison bit-length fold
    — ~2,500 nodes that Catalyst re-analyzes on EVERY action (a
    DataFrameWriter re-plans per save). Measured at sf0.1: the
    weighted_sample projection dropped 0.44s → 0.11s per noop run with
    the staged form, bits identical (CollapseProject declines to
    re-inline multiply-referenced non-trivial expressions, so the plan
    keeps the layered shape). Same integer schedule, same int64s —
    generated from the same ``_SERIES`` table.

    Adds column ``out`` to ``df``; the ``__lnf_*`` scratch columns are
    dropped before return."""
    scratch = ["__lnf_v", "__lnf_e", "__lnf_m", "__lnf_z", "__lnf_z2"] + \
        [f"__lnf_t{d}" for d in _SERIES]
    df = df.withColumn("__lnf_v", v.cast("long"))
    df = df.withColumn("__lnf_e", reduce(add, [
        (F.col("__lnf_v") >= F.lit(1 << k)).cast("int")
        for k in range(1, MAX_BITS + 1)]))

    def _div(a: Column, b: Column) -> Column:
        return F.call_function("div", a, b)

    df = df.withColumn("__lnf_m", _div(
        F.col("__lnf_v") * F.lit(_K),
        F.call_function("shiftleft", F.lit(1).cast("long"),
                        F.col("__lnf_e"))))
    df = df.withColumn("__lnf_z", _div(
        (F.col("__lnf_m") - F.lit(_K)) * F.lit(LN_SCALE),
        F.col("__lnf_m") + F.lit(_K)))
    df = df.withColumn("__lnf_z2", _div(
        F.col("__lnf_z") * F.col("__lnf_z"), F.lit(LN_SCALE)))
    terms, prev = F.col("__lnf_z"), "__lnf_z"
    for d in _SERIES:
        df = df.withColumn(f"__lnf_t{d}", _div(
            F.col(prev) * F.col("__lnf_z2"), F.lit(LN_SCALE)))
        terms = terms + _div(F.col(f"__lnf_t{d}"), F.lit(d))
        prev = f"__lnf_t{d}"
    df = df.withColumn(out, (F.lit(2) * terms
                             + F.col("__lnf_e").cast("long")
                             * F.lit(LN2_F)).cast("long"))
    return df.drop(*scratch)


def ln_fixed_py(v: int) -> int:
    """Python reference of ``ln_fixed`` — same integer schedule."""
    if not 1 <= v <= _K:
        raise ValueError(f"v out of domain [1, 2^{MAX_BITS}]: {v}")
    e = v.bit_length() - 1
    m_ = (v * _K) // (1 << e)
    z = ((m_ - _K) * LN_SCALE) // (m_ + _K)
    z2 = (z * z) // LN_SCALE
    terms, t = z, z
    for d in _SERIES:
        t = (t * z2) // LN_SCALE
        terms += t // d
    return 2 * terms + e * LN2_F


def dd_ln_fixed(inner: str, v: str = "v", out: str = "lnf") -> str:
    """DuckDB rendering: wraps subquery ``inner`` (which must expose an
    integer column ``v`` in [1, 2^20]) in layered SELECTs that add
    column ``out`` = ``ln(v)·2^30`` with the identical int64 schedule.
    All other columns of ``inner`` pass through."""
    bl = " + ".join(
        f"(CASE WHEN CAST({v} AS BIGINT) >= {1 << k} THEN 1 ELSE 0 END)"
        for k in range(1, MAX_BITS + 1))
    sql = f"SELECT *, CAST(({bl}) AS BIGINT) AS __e FROM ({inner})"
    sql = (f"SELECT *, (CAST({v} AS BIGINT) * {_K})"
           f" // (CAST(1 AS BIGINT) << __e) AS __m FROM ({sql})")
    sql = (f"SELECT *, ((__m - {_K}) * CAST({LN_SCALE} AS BIGINT))"
           f" // (__m + {_K}) AS __z FROM ({sql})")
    sql = f"SELECT *, (__z * __z) // {LN_SCALE} AS __z2 FROM ({sql})"
    prev = "__z"
    for d in _SERIES:
        sql = (f"SELECT *, ({prev} * __z2) // {LN_SCALE} AS __t{d}"
               f" FROM ({sql})")
        prev = f"__t{d}"
    series = " + ".join(f"__t{d} // {d}" for d in _SERIES)
    return (f"SELECT * EXCLUDE (__e, __m, __z, __z2, "
            + ", ".join(f"__t{d}" for d in _SERIES)
            + f"), CAST(2 * (__z + {series}) + __e * {LN2_F} AS BIGINT)"
            f" AS {out} FROM ({sql})")
