"""Similarity search over embedding columns (array<float>).

Two paths:

- ``cosine_topk`` — brute-force exact top-k: queries broadcast against the
  corpus, dot products evaluated with higher-order functions inside
  codegen. O(queries × corpus); the right answer for small query sets and
  the correctness baseline for the ANN path.
- ``lsh_topk`` — sign-random-projection LSH: every vector gets a B-bit
  bucket (sign of B fixed pseudo-random hyperplane projections); search
  compares only same-bucket vectors. At 100 TB the bucket join replaces
  the full cross product; recall is tunable via B (fewer bits → bigger
  buckets → higher recall, more compute).

All arithmetic is double-precision and sequential (zip_with → aggregate
left fold), which a SQL oracle reproduces bit-for-bit — see
plans/llm_gate.py.

Execution note (round 3): Spark evaluates higher-order functions as
CodegenFallback, so every fold/argmin here carries an Arrow-vectorized
numpy twin producing the IDENTICAL bits (sequential dimension-at-a-time
accumulation for floats; exact int64 matrix math for the k-means/PQ/int8
paths), dispatched via ``VECTORIZED_FOLD`` / ``VECTORIZED_ASSIGN``. The
relational forms remain the semantic reference the oracles replay and
the fallback; bitwise equality of both paths is test-asserted.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] in double, left-to-right (float→double is exact, so the
    only rounding is the adds — deterministic and oracle-reproducible).

    Like the k-means argmin, this relational fold is the SEMANTIC
    definition (what the SQL oracles replay) but evaluates as
    CodegenFallback — interpreted, boxed, per element. The vectorized
    twin reproduces the left-to-right fold BIT-FOR-BIT by accumulating
    one dimension at a time across the whole Arrow batch
    (``acc += P[:, i]`` — per ROW that is exactly init + x₀ + x₁ + …,
    the same IEEE adds in the same order; numpy's own ``sum`` would
    pairwise-sum and change the bits). Dispatch via ``VECTORIZED_FOLD``;
    equality of both paths is asserted in tests."""
    if VECTORIZED_FOLD:
        return _fold_vec("dot")(a, b)
    return _dot_rel(a, b)


def _dot_rel(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """dot/(‖a‖·‖b‖) with every operand derived by the same fold rules;
    vectorized as ONE Arrow exchange (three sequential folds + sqrt +
    divide in numpy, each op correctly-rounded IEEE like the JVM)."""
    if VECTORIZED_FOLD:
        return _fold_vec("cosine")(a, b)
    return _cosine_rel(a, b)


def _cosine_rel(a: Column, b: Column) -> Column:
    # zero-norm pin: cosine with a zero denominator is NULL — Spark 4's
    # default ANSI mode would otherwise raise DIVIDE_BY_ZERO here while
    # the vectorized twin produced a float, and DuckDB's double x/0 is
    # NULL anyway, so NULL is the one value all three agree on. A NaN
    # denominator is NOT zero (Spark orders NaN above everything, so
    # `!= 0` holds) and propagates NaN, same as numpy/Python.
    num = _dot_rel(a, b)
    den = F.sqrt(_dot_rel(a, a)) * F.sqrt(_dot_rel(b, b))
    return F.when(den != F.lit(0.0), num / den)


# Arrow-vectorized float folds on by default; the relational twins stay
# the oracle-checked definitions and the fallback.
VECTORIZED_FOLD = True

# Grouped per-cell pair stage for semantic_dedup on by default (round
# 12): ships each (id, vector) to Python ONCE PER CELL instead of once
# per PAIR. The relational self-join + per-pair fold stays the semantic
# reference and the fallback; bit-identity of the pair decisions is
# test-asserted (tests/test_semantic_pair_kernel.py).
VECTORIZED_PAIR_STAGE = True


def _seq_fold(prod: "pd.DataFrame | object") -> "object":
    """Left-to-right accumulation across columns: per row this is
    0.0 + p₀ + p₁ + … — the exact add order of the relational fold."""
    acc = np.zeros(prod.shape[0], dtype=np.float64)
    for i in range(prod.shape[1]):
        acc = acc + prod[:, i]
    return acc


def _fold_vec(kind: str):
    """Build the pandas_udf for a float fold family (``dot`` /
    ``cosine`` / ``l2``). Null vectors and RAGGED pairs degrade to a
    per-row Python-float fold (Python float IS IEEE double, so results
    match); the fast path stacks the batch and folds dimension-at-a-time.

    Edge parity with the relational twins (ADVICE r3):

    - null VECTOR → NULL (both paths).
    - ragged lengths (within a pair, or mixed dims across the batch) →
      the relational ``zip_with`` pads with nulls, so the fold is NULL;
      the twins detect the mismatch and NULL-propagate identically
      instead of raising in ``np.stack``.
    - NaN elements → NaN results, identical IEEE arithmetic both paths.
    - zero-norm cosine → NULL in both twins (and in DuckDB oracles,
      where double x/0 is NULL) — Spark 4's default ANSI mode would
      raise DIVIDE_BY_ZERO in the relational form otherwise, and a NaN
      result would poison similarity thresholds (NaN orders above every
      τ in Spark AND DuckDB).
    - null ELEMENTS are the one unbridgeable case: Arrow transfers
      ``array<double>`` nulls as NaN, so inside any pandas_udf a null
      element is INDISTINGUISHABLE from a genuine NaN — the engine pins
      the semantics to "null element ≡ NaN" under ``VECTORIZED_FOLD``
      (the relational path would NULL-propagate). Feed pre-cleaned
      embeddings, or flip ``VECTORIZED_FOLD`` off for strict SQL
      semantics at CodegenFallback speed."""

    def _rowwise(x, y):
        if x is None or y is None or len(x) != len(y):
            # len mismatch: zip_with pads the short side with nulls →
            # null product → the whole fold is NULL
            return None
        if kind == "dot":
            acc = 0.0
            for xi, yi in zip(x, y):
                acc += float(xi) * float(yi)
            return acc
        if kind == "l2":
            acc = 0.0
            for xi, yi in zip(x, y):
                d = float(xi) - float(yi)
                acc += d * d
            return acc
        num = 0.0
        na = 0.0
        nb = 0.0
        for xi, yi in zip(x, y):
            xf, yf = float(xi), float(yi)
            num += xf * yf
            na += xf * xf
            nb += yf * yf
        import math
        den = math.sqrt(na) * math.sqrt(nb)
        if den == 0.0:  # zero-norm pin: NULL (see _cosine_rel)
            return None
        return num / den

    def _ret(vals, mask=None):
        # NaN is a VALUE here (an IEEE arithmetic result), never a null —
        # but a plain float64 Series NULLS every NaN at the Arrow return
        # boundary. A masked FloatingArray keeps the distinction: mask
        # marks true NULLs, values carry NaN through bit-intact.
        v = np.asarray(vals, dtype=np.float64)
        m = np.zeros(len(v), dtype=bool) if mask is None \
            else np.asarray(mask, dtype=bool)
        return pd.Series(pd.arrays.FloatingArray(v, m))

    def _slow(xs, ys):
        out = [_rowwise(x, y) for x, y in zip(xs, ys)]
        return _ret([0.0 if v is None else v for v in out],
                    [v is None for v in out])

    @F.pandas_udf("double")
    def fold(xs: pd.Series, ys: pd.Series) -> pd.Series:
        if len(xs) == 0:
            return pd.Series([], dtype="float64")
        if xs.isna().any() or ys.isna().any():
            return _slow(xs, ys)
        try:
            # clean batches pay no ragged-detection pass: np.array over the
            # row list raises ValueError on mixed dims, which routes the
            # (rare) ragged batch through the bit-equal rowwise path.
            # np.array(list) iterates in C — ~5× faster per batch than the
            # former np.stack([np.asarray(v) ...]) Python-level loop
            # (guide §4.2: the boundary cost you control is per-row work);
            # the produced float64 matrix is bit-identical.
            A = np.array(list(xs), dtype=np.float64)
            B = np.array(list(ys), dtype=np.float64)
        except ValueError:
            return _slow(xs, ys)
        if A.shape[1] != B.shape[1]:
            return _slow(xs, ys)
        if kind == "dot":
            return _ret(_seq_fold(A * B))
        if kind == "l2":
            d = A - B
            return _ret(_seq_fold(d * d))
        num = _seq_fold(A * B)
        den = np.sqrt(_seq_fold(A * A)) * np.sqrt(_seq_fold(B * B))
        with np.errstate(divide="ignore", invalid="ignore"):
            # zero-norm pin: NULL where den == 0 (see _cosine_rel); a NaN
            # den fails the == and propagates NaN like the JVM
            return _ret(num / den, den == 0.0)

    return fold


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` (small) is broadcast; the corpus is scanned once. The
    ranking window partitions by query id — the shuffle is O(queries ×
    corpus) rows but each post-filter partition is tiny. Ties break on
    neighbor id for determinism."""
    q = F.broadcast(queries.select(F.col(id_col).alias("q_id"),
                                   F.col(vec_col).alias("q_vec")))
    c = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    scored = (c.join(q, F.col("n_id") != F.col("q_id"))
               .select("q_id", "n_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("cos")))
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("q_id", F.col("n_id").alias("neighbor_id"),
                          F.col("rank").cast("int").alias("rank"), "cos"))


# ---------------------------------------------------------------------------
# int8 quantization (scalar quantization, per-vector scale)
# ---------------------------------------------------------------------------

def quantize_int8(vec: Column) -> Column:
    """Per-vector symmetric int8 quantization: ``struct(scale, q)`` with
    ``scale = max|x|/127`` and ``q[i] = floor(x[i]/scale + 0.5)`` (zero
    vectors quantize to all-zero, scale 0).

    floor(x+0.5) is used instead of round() because its IEEE semantics are
    identical across engines (Spark HALF_UP vs DuckDB's round differ at
    ties). At scale this is the memory lever for ANN: 4× smaller vectors,
    and the dot product becomes *exact integer* arithmetic — associative,
    so partial aggregation and AQE reordering cannot perturb it.

    Dispatches like ``dot``: every step (abs-max, divide, floor) is an
    elementwise correctly-rounded IEEE op, so the numpy twin is
    bit-identical with no fold-order care needed."""
    if VECTORIZED_FOLD:
        return _quantize_int8_vec(vec)
    return _quantize_int8_rel(vec)


def _quantize_int8_vec(vec: Column) -> Column:
    @F.pandas_udf("struct<scale: double, q: array<tinyint>>")
    def quant(xs: pd.Series) -> pd.DataFrame:
        scales: list = []
        qs: list = []
        for v in xs:
            if v is None:
                scales.append(None)
                qs.append(None)
                continue
            a = np.asarray(v, dtype=np.float64)
            if np.isnan(a).any():
                # NaN-component pin: NULL in both twins — numpy's
                # floor(NaN).astype(int8) is platform garbage and the
                # relational ANSI cast of NaN to tinyint raises
                scales.append(None)
                qs.append(None)
                continue
            amax = np.abs(a).max() if a.size else 0.0
            if amax == 0.0:
                scales.append(0.0)
                qs.append(np.zeros(a.size, dtype=np.int8))
            else:
                scale = amax / 127.0
                scales.append(scale)
                qs.append(np.floor(a / scale + 0.5).astype(np.int8))
        return pd.DataFrame({"scale": scales, "q": qs})

    return quant(vec)


def _quantize_int8_rel(vec: Column) -> Column:
    xd = F.transform(vec, lambda x: x.cast("double"))
    amax = F.array_max(F.transform(xd, F.abs))
    scale = amax / F.lit(127.0)
    # Stored as array<tinyint> — values are in [-127, 127] by construction,
    # so the materialized column really is 1 byte/component (the claimed
    # 4-8× memory reduction); int_dot widens before multiplying.
    q = F.when(amax == 0.0, F.transform(xd, lambda x: F.lit(0).cast("tinyint"))) \
         .otherwise(F.transform(
             xd, lambda x: F.floor(x / scale + F.lit(0.5)).cast("tinyint")))
    # NaN-component pin (matches the vectorized twin): a struct with NULL
    # fields — the ANSI cast of NaN to tinyint would otherwise abort the
    # query. Fields-null (not a top-level NULL struct) because a
    # pandas_udf's returned all-None row materializes as exactly that
    # shape, and the twins must agree bit-for-bit.
    nan_in = F.coalesce(F.exists(xd, F.isnan), F.lit(False))
    return F.struct(
        F.when(~nan_in, scale).alias("scale"),
        F.when(~nan_in, q).alias("q"))


def int_dot(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] over int64 — exact, order-independent. Inputs may be
    stored narrow (tinyint); each component is widened to long *before*
    the multiply so tinyint×tinyint can never wrap. Integer addition is
    associative, so the vectorized twin may sum in any order — no
    fold-order ceremony needed."""
    if VECTORIZED_FOLD:
        return _int_dot_vec(a, b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def _int_dot_vec(a: Column, b: Column) -> Column:
    @F.pandas_udf("long")
    def idot(xs: pd.Series, ys: pd.Series) -> pd.Series:
        def _has_nan(v):
            # null ELEMENTS of an int array arrive as NaN through Arrow
            # (ints can't carry null, so the batch comes as float64) —
            # and np.asarray(<nan>, int64) does NOT reliably raise: some
            # numpy versions silently wrap NaN to INT64_MIN, which would
            # make the fast path return a confidently wrong finite dot.
            # Real int-dtype arrays skip the scan entirely.
            a = np.asarray(v)
            return a.dtype.kind == "f" and np.isnan(a).any()

        def _slow():
            # ragged pair / null element → NULL (zip_with pads with
            # nulls and the fold NULL-propagates in the relational twin)
            # — same edge contract as _fold_vec
            return pd.Series([
                None if x is None or y is None or len(x) != len(y)
                or _has_nan(x) or _has_nan(y)
                else sum(int(xi) * int(yi) for xi, yi in zip(x, y))
                for x, y in zip(xs, ys)])

        if len(xs) == 0:
            return pd.Series([], dtype="int64")
        if xs.isna().any() or ys.isna().any() \
                or any(_has_nan(v) for v in xs) \
                or any(_has_nan(v) for v in ys):
            return _slow()
        try:
            # C-level row-list ingestion (see _fold_vec) — NaN inputs never
            # reach this cast: the _has_nan pre-scan above routed them slow
            A = np.array(list(xs), dtype=np.int64)
            B = np.array(list(ys), dtype=np.int64)
        except ValueError:  # mixed dims across the batch
            return _slow()
        if A.shape[1] != B.shape[1]:
            return _slow()
        return pd.Series((A * B).sum(axis=1))

    return idot(a, b)


def quantized_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Top-k by quantized dot product: ``score = int_dot(qa, qb) · sa · sb``
    — the int8 rescoring path. The integer dot is exact; only the two
    final double multiplies round, deterministically, so a SQL oracle
    matches bit-for-bit. Recall vs the float path is asserted in tests."""
    q = F.broadcast(queries.select(F.col(id_col).alias("q_id"),
                                   quantize_int8(F.col(vec_col)).alias("qq")))
    c = corpus.select(F.col(id_col).alias("n_id"),
                      quantize_int8(F.col(vec_col)).alias("nq"))
    score = (F.col("qq.scale") * F.col("nq.scale")
             * int_dot(F.col("qq.q"), F.col("nq.q")).cast("double"))
    scored = (c.join(q, F.col("n_id") != F.col("q_id"))
               .select("q_id", "n_id", score.alias("score")))
    w = W.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("q_id", F.col("n_id").alias("neighbor_id"),
                          F.col("rank").cast("int").alias("rank"), "score"))


# ---------------------------------------------------------------------------
# sign-random-projection LSH
# ---------------------------------------------------------------------------

def _planes(n_bits: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5 parity — no RNG state, so every
    executor (and any re-run) derives identical planes."""
    out = []
    for p in range(n_bits):
        row = []
        for j in range(dim):
            h = hashlib.md5(f"plane:{p}:{j}".encode()).digest()[0]
            row.append(1.0 if h % 2 == 0 else -1.0)
        out.append(row)
    return out


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """B-bit bucket id: bit p = sign(vec · plane_p). Dispatches like
    ``dot``: the relational per-plane folds are the oracle definition;
    the vectorized twin runs the same left-to-right projections batched
    (n_bits sequential folds over the Arrow batch).

    Edge parity (ADVICE r3): the bit test is ``NOT (proj <= 0)`` in both
    twins, because Spark SQL orders NaN above every number (``NaN > 0``
    is TRUE) while IEEE/numpy comparisons on NaN are all false — a NaN
    projection sets the bit under both paths. A NULL vector, or one
    whose length differs from the plane dimension, buckets to 0 (null
    projection → the ``otherwise(0)`` branch), reproduced in the twin.
    Null ELEMENTS arrive as NaN through Arrow (see ``_fold_vec``)."""
    if VECTORIZED_FOLD:
        return _srp_bucket_vec(vec, planes)
    return _srp_bucket_rel(vec, planes)


def _srp_bucket_rel(vec: Column, planes: list[list[float]]) -> Column:
    bits = []
    for p, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(w) for w in plane]),
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def _srp_bucket_vec(vec: Column, planes: list[list[float]]) -> Column:
    pl = np.asarray(planes, dtype=np.float64)      # n_bits × dim
    weights = np.array([1 << p for p in range(len(planes))], dtype=np.int64)

    dim = pl.shape[1]

    @F.pandas_udf("long")
    def bucket(xs: pd.Series) -> pd.Series:
        if len(xs) == 0:
            return pd.Series([], dtype="int64")
        if xs.isna().any() or any(len(v) != dim for v in xs):
            out = []
            for v in xs:
                if v is None or len(v) != dim:
                    # null vector / ragged: zip_with and the fold yield a
                    # null projection, and when(null > 0) falls through
                    # to otherwise(0) — the relational bucket is 0
                    out.append(0)
                    continue
                acc = 0
                for p, plane in enumerate(planes):
                    proj = 0.0
                    for xi, w in zip(v, plane):
                        proj += float(xi) * w
                    if not proj <= 0:   # Spark NaN ordering: NaN > 0
                        acc += 1 << p
                out.append(acc)
            return pd.Series(out)
        A = np.array(list(xs), dtype=np.float64)
        projs = np.stack([_seq_fold(A * pl[p]) for p in range(pl.shape[0])],
                         axis=1)                   # n × n_bits
        return pd.Series((~(projs <= 0) @ weights).astype("int64"))

    return bucket(vec)


def embedding_near_duplicates(corpus: DataFrame, threshold: float = 0.95,
                              n_bits: int = 4, dim: int = 64,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (d1 < d2, cos ≥ threshold) —
    the fifth dedup modality (exact / Jaccard / MinHash / SimHash / and
    this): two documents whose embeddings nearly coincide are duplicates
    even when their surface text diverges.

    Scale path: SRP-bucket self-join (same buckets as ``lsh_topk``) so the
    pairwise cosine is evaluated only inside buckets — expected
    n²/2^n_bits pairs instead of n². Near-identical vectors agree on every
    hyperplane sign with probability ≈ 1-ε, so recall at dedup-grade
    thresholds (≥0.9) is effectively total; raise n_bits to shrink buckets
    on bigger corpora."""
    planes = _planes(n_bits, dim)
    if VECTORIZED_PAIR_STAGE:
        # grouped per-bucket pair stage (round 12 — the semantic_dedup
        # _cell_drops rationale: ship each vector once per BUCKET, not
        # once per pair): the bucket projection runs once (single
        # consumer, so the old both-sides checkpoint is gone too) and
        # one numpy task per bucket emits the (d1, d2, cos) pairs with
        # the exact left-fold bits. Bit-identity with the join form is
        # asserted by tests/test_semantic_pair_kernel.py.
        b = corpus.select(F.col(id_col).alias("n_id"),
                          F.col(vec_col).alias("n_vec"),
                          srp_bucket(F.col(vec_col), planes).alias("bucket"))
        return _bucket_pairs(b, ["bucket"], float(threshold))
    # norms computed once per vector (not per pair) — bit-identical values,
    # ~3× fewer double folds inside the bucket join. Checkpointed because
    # both self-join sides consume it: the SRP projection is n_bits × dim
    # interpreted folds per row, the priciest expression in the plan, and
    # without the checkpoint it runs twice.
    b = corpus.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"),
                      srp_bucket(F.col(vec_col), planes).alias("bucket"),
                      F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("nrm")) \
              .localCheckpoint(eager=True)
    a = b.select(F.col("vid").alias("d1"), F.col("vec").alias("v1"),
                 F.col("nrm").alias("n1"), "bucket")
    c = b.select(F.col("vid").alias("d2"), F.col("vec").alias("v2"),
                 F.col("nrm").alias("n2"), "bucket")
    # zero-norm pin (see _cosine_rel): NULL, not an ANSI DIVIDE_BY_ZERO —
    # a zero-norm vector is near-duplicate of nothing and the NULL fails
    # the >= threshold filter
    den = F.col("n1") * F.col("n2")
    cos = F.when(den != F.lit(0.0),
                 dot(F.col("v1"), F.col("v2")) / den)
    return (a.join(c, "bucket")
             .filter(F.col("d1") < F.col("d2"))
             .select("d1", "d2", cos.alias("cos"))
             .filter(F.col("cos") >= threshold))


_CQ = 1 << 14  # component quantization for centroid arithmetic


def centroid_cosine(corpus: DataFrame, id_col: str = "vec_id",
                    label_col: str = "label",
                    vec_col: str = "embedding") -> DataFrame:
    """Cosine of every vector to its group's centroid — the embedding-
    space quality filter (SemDeDup / data-pruning style): vectors far
    from their cluster centroid are outliers (mislabeled, noise, or
    off-distribution) and are the ones a curation pass drops first.

    Exact-arithmetic design: cosine to the MEAN vector equals cosine to
    the per-position SUM vector (the 1/n scale cancels), so the centroid
    is kept as an integer sum of quantized components
    (``floor(v·2^14 + 0.5)``) and every aggregation — per-position sums,
    dot products, squared norms — is associative integer math in
    DECIMAL(38,0). Partition order, AQE re-plans and retries cannot
    perturb a single bit, and a SQL engine reproduces the doubles
    exactly; the only roundings are the final cast and one sqrt/divide.

    Scale shape: one posexplode scan → groupBy (label, pos) partial-agg
    (labels × dim rows — dimension-sized); the scoring join broadcasts
    that table back onto the exploded stream and re-aggregates by vector
    id map-side. Two shuffles total, both on uniform keys.

    Output: ``vec_id, label, cos_centroid`` (vectors with zero norm are
    dropped — cosine undefined).
    """
    _d = "decimal(38,0)"
    qv = F.floor(F.col("v").cast("double") * F.lit(float(_CQ))
                 + F.lit(0.5)).cast("long")
    e = (corpus.select(F.col(id_col).alias("vid"),
                       F.col(label_col).alias("label"),
                       F.posexplode(F.col(vec_col)).alias("pos", "v"))
               .select("vid", "label", "pos", qv.alias("qv")))
    s = e.groupBy("label", "pos").agg(F.sum("qv").alias("sq"))
    cn = s.groupBy("label").agg(
        F.sum((F.col("sq").cast(_d) * F.col("sq").cast(_d))).alias("cn2"))
    scored = (e.join(F.broadcast(s), ["label", "pos"])
               .groupBy("vid", "label")
               .agg(F.sum(F.col("qv").cast(_d) * F.col("sq").cast(_d))
                     .alias("dotq"),
                    F.sum(F.col("qv").cast(_d) * F.col("qv").cast(_d))
                     .alias("vn2"))
               .join(F.broadcast(cn), "label")
               .filter((F.col("vn2") > 0) & (F.col("cn2") > 0)))
    cos = (F.col("dotq").cast("double")
           / (F.sqrt(F.col("vn2").cast("double"))
              * F.sqrt(F.col("cn2").cast("double"))))
    return scored.select(F.col("vid").alias("vec_id"), "label",
                         cos.alias("cos_centroid"))


_KQ = 1 << 14  # component quantization for exact k-means arithmetic


def _kmeans_uq(vec: Column) -> Column:
    """Non-negative integer quantization for exact k-means distances:
    ``u[i] = clamp(floor(v[i]·2^14 + 0.5), ±2^14) + 2^14`` ∈ [0, 2^15].

    The +2^14 offset makes every value (hence every per-cell component
    sum) non-negative, so integer division truncates identically in every
    engine (Spark ``div``, DuckDB ``//``, Python ``//`` all agree on
    non-negative operands). Distances are differences, so the common
    offset cancels — cluster geometry is unchanged. The clamp bounds the
    domain for unnormalized vectors (components beyond ±1 saturate)."""
    return F.transform(vec, lambda x: (
        F.least(F.greatest(F.floor(x.cast("double") * F.lit(float(_KQ))
                                   + F.lit(0.5)),
                           F.lit(-_KQ)), F.lit(_KQ)) + F.lit(_KQ)).cast("long"))


def _sql_array2(rows: list[list[int]]) -> Column:
    """k×d integer codebook as ONE parsed SQL array literal. ``F.lit`` of
    a nested Python list round-trips every element through py4j (~2s per
    4096-element codebook, per expression); the SQL parser ingests the
    same text in milliseconds."""
    return F.expr("array(" + ",".join(
        "array(" + ",".join(f"{int(v)}L" for v in row) + ")"
        for row in rows) + ")")


def _hash_head(df: DataFrame, id_col: str, n: int) -> DataFrame:
    """First ``n`` rows by keyed-md5 order (ties → id) — the shared
    deterministic-sample idiom (kmeans/PQ seeding, IVF fit bound): a
    pure function of the data, so the selected set is identical across
    retries, repartitioning and AQE re-plans, yet hash-uniform like a
    random sample."""
    return (df.withColumn("__h", F.md5(F.col(id_col).cast("string")))
              .orderBy("__h", id_col).limit(n).drop("__h"))


def _dist_table(u: Column, cents: list[list[int]]) -> Column:
    """Array of exact integer squared distances from a u-quantized
    vector (scale 2^14, offset +2^14 — multiplied by 64 here to reach
    the centroid scale 2^20) to EVERY centroid. The codebook is one
    nested-array literal and the loop is a single ``transform`` fold, so
    the expression tree is O(1) in codebook size — per-centroid literal
    arrays blow the plan (and task binaries) up ~100× at k=64. Max
    magnitude: dim·(2^21)² ≤ 2^48 for dim ≤ 64 — comfortably int64."""
    cb = _sql_array2(cents)
    return F.transform(cb, lambda c: F.aggregate(
        F.zip_with(u, c, lambda x, y: (x * F.lit(64) - y)
                   * (x * F.lit(64) - y)),
        F.lit(0).cast("long"), lambda acc, d: acc + d))


def _argmin_cell(u: Column, cents: list[list[int]]) -> Column:
    """Index of the nearest centroid by exact integer squared distance;
    ``array_position`` returns the FIRST minimum, so ties break on the
    lower cell id. Map-side only — no join, no shuffle.

    This relational form is the SEMANTIC definition (it is what the SQL
    oracles replay), but Spark evaluates higher-order functions
    (transform/aggregate/zip_with) as CodegenFallback — the projection
    drops out of whole-stage codegen and runs interpreted, ~1.3 ms per
    vector at k=64 (measured). The hot paths therefore dispatch through
    ``_assign_cell``, whose Arrow-vectorized twin computes the SAME
    int64 integers in numpy; tests assert the two paths agree row-for-
    row, and every k-means family gate still hash-matches its oracle."""
    d = _dist_table(u, cents)
    return (F.array_position(d, F.array_min(d)) - 1).cast("int")


# Arrow-vectorized assignment on by default; the relational twin stays the
# oracle-checked definition and the fallback (flip for A/B in tests).
VECTORIZED_ASSIGN = True


def _argmin_cell_vec(u: Column, cents: list[list[int]]) -> Column:
    """Arrow-vectorized twin of ``_argmin_cell``: batch argmin over the
    codebook in numpy int64. Exactness: ``(64u-c)² = (64u)² - 2·64u·c +
    c²`` — every product ≤ 2^42 and every sum ≤ dim·2^42 ≤ 2^48, so
    int64 matrix ops are exact (no float, no overflow), and
    ``np.argmin`` returns the FIRST minimum — the same lower-cell tie
    rule as ``array_position``. The assignment is the k-means hot loop
    (corpus × k × dim integer ops per pass); vectorized it runs at
    numpy/BLAS speed instead of interpreted-expression speed, ~100×
    (FAISS makes the same choice: quantizer assignment is vectorized
    native code). Contract: non-null fixed-dim vectors with non-null
    elements (the ``kmeans_cells`` id/vector requirement); corrupt rows
    raise rather than silently diverge."""
    cb = np.asarray(cents, dtype=np.int64)          # k × d
    cb2 = (cb * cb).sum(axis=1)                     # k

    @F.pandas_udf("int")
    def enc(us: pd.Series) -> pd.Series:
        if len(us) == 0:
            return pd.Series([], dtype="int32")
        mat = np.array(list(us), dtype=np.int64) * 64
        d = ((mat * mat).sum(axis=1, keepdims=True)
             - 2 * (mat @ cb.T) + cb2)              # n × k, exact int64
        return pd.Series(np.argmin(d, axis=1).astype("int32"))

    return enc(u)


def _assign_cell(u: Column, cents: list[list[int]]) -> Column:
    """Nearest-centroid assignment: vectorized by default, relational
    twin as the semantic reference/fallback."""
    if VECTORIZED_ASSIGN:
        return _argmin_cell_vec(u, cents)
    return _argmin_cell(u, cents)


def _argmin_cell_tagged(codebooks: list[list[list[int]]]) -> Column:
    """Relational argmin for the PQ training loop's tagged-subspace rows
    (columns ``s``, ``su``): each row selects its subspace codebook from
    one triple-nested literal. Same HOF/CodegenFallback caveat as
    ``_argmin_cell`` — kept as the semantic reference."""
    cb = F.expr("array(" + ",".join(
        "array(" + ",".join(
            "array(" + ",".join(f"{int(v)}L" for v in cent) + ")"
            for cent in codebooks[s]) + ")"
        for s in range(len(codebooks))) + ")")
    d = F.transform(F.element_at(cb, F.col("s") + 1),
                    lambda c: F.aggregate(
                        F.zip_with(F.col("su"), c,
                                   lambda x, y: (x * F.lit(64) - y)
                                   * (x * F.lit(64) - y)),
                        F.lit(0).cast("long"), lambda acc, dd: acc + dd))
    return (F.array_position(d, F.array_min(d)) - 1).cast("int")


def _assign_cell_tagged(s: Column, su: Column,
                        codebooks: list[list[list[int]]]) -> Column:
    """Vectorized twin of ``_argmin_cell_tagged``: one Arrow batch holds
    rows of every subspace; the batch is partitioned by the tag and each
    group runs the exact-int64 matrix argmin against its own codebook."""
    cbs = [np.asarray(cb, dtype=np.int64) for cb in codebooks]
    cb2s = [(cb * cb).sum(axis=1) for cb in cbs]

    @F.pandas_udf("int")
    def enc(tags: pd.Series, us: pd.Series) -> pd.Series:
        n = len(tags)
        if n == 0:
            return pd.Series([], dtype="int32")
        out = np.empty(n, dtype=np.int32)
        tv = tags.to_numpy()
        mat = np.array(list(us), dtype=np.int64) * 64
        m2 = (mat * mat).sum(axis=1)
        for si, (cb, cb2) in enumerate(zip(cbs, cb2s)):
            mask = tv == si
            if mask.any():
                d = m2[mask, None] - 2 * (mat[mask] @ cb.T) + cb2
                out[mask] = np.argmin(d, axis=1).astype(np.int32)
        return pd.Series(out)

    return enc(s, su)


def kmeans_cells(corpus: DataFrame, n_lists: int = 8, iters: int = 2,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 ) -> tuple[DataFrame, list[list[int]]]:
    """Deterministic distributed Lloyd k-means in exact integer
    arithmetic — a coarse quantizer whose every step a SQL engine can
    replay bit-for-bit (unlike MLlib's ``KMeans``, whose float reductions
    are partition-order-dependent).

    - **Init**: the ``n_lists`` vectors with the smallest
      ``md5(cast(id as string))`` (hash order ≈ uniform sample, stable
      under retries/repartition — the same keyed-hash trick as
      ``hash_sample``/``domain_cap``).
    - **Iterate** (fixed ``iters`` rounds): assignment is an ``array_min``
      over exact integer squared distances (map-side, zero shuffle);
      the update is one posexplode → groupBy(cell, pos) partial-agg
      (n_lists × dim groups) whose sums are exact int64; new centroid
      components are ``(64·sum) div count`` — non-negative integer
      division, identical in Spark/DuckDB/Python. Cells that lose all
      vectors keep their previous centroid.
    - **Scale**: the corpus is scanned once per iteration with a
      dimension-sized shuffle (n_lists·dim rows); centroids live as plan
      literals (n_lists × dim ints ≤ a few KB — the same
      probe-then-parameterize pattern as the BM25 corpus scalars), so
      lineage does NOT grow with iterations and no checkpoint is needed.

    ``id_col`` must be non-null: the keyed-hash ordering of NULL ids is
    engine-specific (Spark sorts NULLS FIRST, DuckDB LAST), which would
    desynchronize the seed selection from the oracle.

    Returns ``(assignments, centroids)``: the corpus with a ``cell``
    column, and the final scale-2^20 integer centroid components."""
    base = corpus.select(F.col(id_col).alias("vid"),
                         _kmeans_uq(F.col(vec_col)).alias("u"))
    seed_rows = _hash_head(base, "vid", n_lists).collect()
    if not seed_rows:
        # without this, cents=[] builds the malformed literal `array()`
        # downstream and fails analysis with an opaque parser error
        raise ValueError("kmeans_cells: empty corpus (no seed vectors)")
    cents = [[64 * int(x) for x in r["u"]] for r in seed_rows]
    n_lists = len(cents)
    dim = len(cents[0]) if cents else 0
    for _ in range(iters):
        # NB: the argmin projection and the posexplode must be separate
        # selects — a generator in the same projection as a getField
        # expression breaks struct-field resolution (Spark 4 analyzer).
        sums = (base
                .select(_assign_cell(F.col("u"), cents).alias("cell"), "u")
                .select("cell", F.posexplode("u").alias("pos", "uv"))
                .groupBy("cell", "pos")
                .agg(F.sum("uv").alias("s"), F.count(F.lit(1)).alias("cnt"))
                .collect())
        new = {(r["cell"], r["pos"]): (64 * r["s"]) // r["cnt"] for r in sums}
        cents = [[new.get((j, p), cents[j][p]) for p in range(dim)]
                 for j in range(n_lists)]
    # coalesce(-1) marks the column non-nullable (the UDF never returns
    # null for contract-valid vectors, so -1 is unreachable): without it,
    # every equi-join on `cell` injects IsNotNull(cell), and the optimizer
    # evaluates the assignment UDF TWICE per join side — once under the
    # pushed filter, once in the projection (guide §4.4). The plans for
    # semantic_dedup went from 4 `enc` ArrowEvalPython nodes to 2.
    # The inner when/raise_error makes a NULL input vector fail LOUDLY on
    # BOTH assignment paths (ADVICE r11): the vectorized UDF raises on
    # its own, but the relational fallback (VECTORIZED_ASSIGN=False)
    # returned NULL — which the -1 sentinel would have silently merged
    # into one shared pair cell instead of the old never-equi-joins
    # behavior. raise_error sits only on the contract-violating branch,
    # so valid rows pay one isNotNull test.
    assigned = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"),
        F.coalesce(
            F.when(F.col(vec_col).isNotNull(),
                   _assign_cell(_kmeans_uq(F.col(vec_col)), cents))
             .otherwise(F.raise_error(F.lit(
                 "kmeans_cells: NULL vector violates the non-null "
                 "vector contract"))),
            F.lit(-1)).alias("cell"))
    return assigned, cents


def ivf_kmeans_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    n_lists: int = 8, iters: int = 2, nprobe: int = 2,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    fitted: tuple | None = None) -> DataFrame:
    """IVF ANN whose coarse quantizer is the exact-integer ``kmeans_cells``
    — end-to-end deterministic AND SQL-replayable, closing the one gap the
    MLlib-backed ``ivf_topk`` leaves (its float k-means cannot be
    oracle-checked; this one is hash-matched by the driver).

    Search mirrors ``ivf_topk``: each query ranks cells by the same
    integer distance (ties → lower cell id), probes its ``nprobe``
    nearest, and scores candidates with the deterministic double-fold
    cosine. Queries are broadcast; the cell join replaces the cross
    product. ``fitted`` takes a precomputed ``kmeans_cells(corpus, ...)``
    result so several operators over the same corpus share ONE Lloyd fit
    (each fit scans the corpus ``iters`` times)."""
    assigned, cents = fitted if fitted is not None else kmeans_cells(
        corpus, n_lists=n_lists, iters=iters, id_col=id_col, vec_col=vec_col)

    def _cell_rank(u: Column) -> Column:
        d = _dist_table(u, cents)
        idx = F.sequence(F.lit(0), F.lit(len(cents) - 1))
        structs = F.zip_with(d, idx, lambda dd, i: F.struct(
            dd.alias("dist"), i.alias("cell")))
        return F.transform(F.slice(F.array_sort(structs), 1, nprobe),
                           lambda s: s.getField("cell"))

    q = (queries.select(F.col(id_col).alias("q_id"),
                        F.col(vec_col).alias("q_vec"))
         .withColumn("cell",
                     F.explode(_cell_rank(_kmeans_uq(F.col("q_vec"))))))
    scored = (assigned.join(F.broadcast(q), "cell")
              .filter(F.col("n_id") != F.col("q_id"))
              .select("q_id", "n_id",
                      cosine(F.col("q_vec"), F.col("n_vec")).alias("cos")))
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("q_id", F.col("n_id").alias("neighbor_id"),
                          F.col("rank").cast("int").alias("rank"), "cos"))


def cluster_balanced_sample(corpus: DataFrame, per_cluster: int = 50,
                            n_clusters: int = 8, iters: int = 2,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            fitted: tuple | None = None) -> DataFrame:
    """Cluster-balanced corpus selection (the DataComp/SemDeDup curation
    move): learn ``n_clusters`` embedding clusters with the
    deterministic ``kmeans_cells``, then keep at most ``per_cluster``
    documents per cluster — capping over-represented semantic regions
    (boilerplate, near-identical templates) the way ``domain_cap`` caps
    over-represented sources, but by *learned* structure instead of a
    metadata column.

    Selection within a cluster is keyed-md5 hash order (ties → id) —
    deterministic under retries/repartition where ``rand()`` is not, and
    uniform within each cluster. Shape: the assignment is map-side
    (codebook literals); the only shuffle is the per-cluster ranking
    window on uniform cell keys. Output: ``vec_id, cell, rk`` for the
    kept rows. ``fitted`` shares a precomputed ``kmeans_cells`` result
    (see ``ivf_kmeans_topk``)."""
    assigned, _ = fitted if fitted is not None else kmeans_cells(
        corpus, n_lists=n_clusters, iters=iters,
        id_col=id_col, vec_col=vec_col)
    w = W.partitionBy("cell").orderBy(
        F.md5(F.col("n_id").cast("string")), F.col("n_id"))
    return (assigned
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= per_cluster)
            .select(F.col("n_id").alias(id_col),
                    F.col("cell").cast("int").alias("cell"),
                    F.col("rk").cast("int").alias("rk")))


def semantic_dedup(corpus: DataFrame, threshold: float = 0.3,
                   n_lists: int | None = 8, iters: int = 2,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   cell_cap: int | None = None) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): learn
    embedding clusters with the deterministic exact-integer
    ``kmeans_cells``, then WITHIN each cluster drop every document that
    has a more-preferred (lower-id) ε-neighbor — pairwise cosine is
    computed only inside a cluster, never across the corpus. This is the
    semantic complement to ``embedding_near_duplicates`` (SRP-LSH
    buckets): LSH buckets catch near-copies; learned clusters scope the
    comparison to semantic regions, which is how SemDeDup prunes
    redundant-but-not-identical training text.

    Keeper rule: a row survives unless some SAME-CLUSTER row with a
    smaller id is ``> threshold`` cosine-similar — deterministic, one
    representative per similar group (a chain a~b, b~c keeps only ``a``
    — the aggressive end of SemDeDup's policy; raise the threshold for
    gentler pruning).

    Scale shape: assignment is map-side (codebook literals); the
    pairwise stage is a self-equi-join ON CELL — with ``n_lists``
    scaled so clusters stay O(corpus/n_lists), the pair count is
    corpus²/n_lists, the SemDeDup trade, and the join is a plain
    shuffle-hash on uniform cell keys (never a cartesian). The drop set
    anti-joins back on id.

    Hot-cluster guard (round-5): pass ``n_lists=None`` to auto-scale
    the cluster count from a corpus count probe (SemDeDup at web scale
    uses ~50k clusters, not 8), and/or ``cell_cap`` to bound the pair
    stage BY CONSTRUCTION — any cell past the cap is split into
    ``ceil(cell_size / cell_cap)`` keyed-md5 hash sub-buckets ('sd:'
    salt, the per-operator hash-stream convention) and pairs are joined
    on ``(cell, sub)``. Expected sub-bucket size ≤ ``cell_cap``
    regardless of embedding skew (an id-hash splits even a cell of
    IDENTICAL vectors, where ``srp_bucket`` would co-bucket them all),
    so pair rows per cell fall from quadratic to ~``cell_size ·
    cell_cap / 2``. Recall trade, documented: a similar group straddling
    s sub-buckets keeps ≤ s representatives instead of 1 — the bounded
    end of the SemDeDup policy. Both knobs are deterministic functions
    of the corpus (count probes are bounded: one scalar / n_lists
    rows), so the operator stays retry-stable and SQL-replayable.

    Output: ``vec_id, cell`` of the SURVIVORS (cell int, id-ordered
    semantics; no dependence on join or partition order)."""
    assigned, key = semantic_cells(corpus, n_lists=n_lists, iters=iters,
                                   id_col=id_col, vec_col=vec_col,
                                   cell_cap=cell_cap)
    if VECTORIZED_PAIR_STAGE:
        drops = _cell_drops(assigned, key, float(threshold))
    else:
        drops = _cell_drops_join(assigned, key, float(threshold))
    return (assigned.join(drops,
                          assigned["n_id"] == drops["drop_id"], "left_anti")
                    .select(F.col("n_id").alias(id_col),
                            F.col("cell").cast("int").alias("cell")))


def _cell_drops_join(assigned: DataFrame, key: list[str],
                     threshold: float) -> DataFrame:
    """The relational pair stage — the semantic reference the SQL
    oracles replay, and the ``VECTORIZED_PAIR_STAGE=False`` fallback.

    Per-VECTOR norms computed once before the pair join (the
    embedding_near_duplicates factoring): cosine(a,b) =
    dot(a,b)/(sqrt(dot(a,a))·sqrt(dot(b,b))) — sqrt and · are single
    correctly-rounded IEEE ops, so n1·n2 here produces bit-for-bit the
    same double as the fused 3-fold cosine (and the same algebra the
    DuckDB oracle spells out). Moves 2 of the 3 per-PAIR folds to
    per-ROW: at corpus²/n_lists pairs that is ~3× less Python-side
    arithmetic in the hot stage (guide §4.1 — fewer bytes of work per
    boundary row). Zero-norm pin unchanged: den == 0 → NULL → fails
    the > threshold filter."""
    an = assigned.withColumn(
        "__nrm", F.sqrt(dot(F.col("n_vec"), F.col("n_vec"))))
    a = an.select(F.col("n_id").alias("a_id"), *key,
                  F.col("n_vec").alias("a_vec"), F.col("__nrm").alias("n1"))
    b = an.select(F.col("n_id").alias("b_id"), *key,
                  F.col("n_vec").alias("b_vec"), F.col("__nrm").alias("n2"))
    den = F.col("n1") * F.col("n2")
    pair_cos = F.when(den != F.lit(0.0),
                      dot(F.col("a_vec"), F.col("b_vec")) / den)
    return (a.join(b, key)
              .filter(F.col("a_id") < F.col("b_id"))
              .filter(pair_cos > F.lit(float(threshold)))
              .select(F.col("b_id").alias("drop_id"))
              .distinct())


# columns of the pairwise block a kernel task holds at once: bounds the
# per-task accumulator at cell_size × _PAIR_BLOCK doubles (a 20k-row
# capped cell at block 2048 holds ~330 MB ÷ 8 = 40 MB extra) — env knob
# for bigger executors
_PAIR_BLOCK = max(64, int(os.environ.get("SPARK_GRAFT_PAIR_BLOCK", "2048")))


def _cell_drops(assigned: DataFrame, key: list[str],
                threshold: float) -> DataFrame:
    """(drop_id) — grouped per-cell pair stage (round 12, guide §2.3
    "shuffle keys and metadata instead of payloads" + §4.2).

    The relational form above ships BOTH embedding vectors across the
    Arrow boundary once per PAIR — corpus²/n_lists × 2·dim doubles; at
    bench SF that is ~400 MB of Arrow traffic per execution and it
    grows quadratically in cell size. This kernel groups by the same
    pair key and ships each (id, vector) once per CELL, computing the
    pairwise decisions inside one numpy task per cell.

    Bit-identity with the relational/vectorized fold (oracle-checked):

    - products and adds in float64 after an exact float32→float64
      upcast, accumulated DIMENSION-AT-A-TIME (``S += outer(A[:,k],
      A[:,k])`` — per pair exactly ``0.0 + p₀ + p₁ + …``, the
      relational left fold, same trick as ``_seq_fold``);
    - norms via the same per-row fold + one correctly-rounded sqrt;
    - ``den == 0`` → NULL cosine → never similar (the zero-norm pin);
    - NaN cosine (NaN element, or NaN den) → SIMILAR, because Spark
      orders NaN above every threshold — ``(cos > τ) | isnan(cos)``;
    - ragged dims inside a cell → ``zip_with`` pads → NULL fold → never
      similar: pairs are computed only within same-length groups;
    - a NULL vector cannot reach here (the kmeans assignment raises),
      but a defensive skip keeps the relational NULL-fold semantics.

    ``a_id < b_id`` becomes the strict upper triangle after an id sort
    (ids are unique by contract). Per-cell memory is bounded by
    ``_PAIR_BLOCK`` accumulator columns at a time, so a ``cell_cap``'d
    cell never materializes a full n×n matrix."""
    schema = "drop_id long"
    tau = float(threshold)
    blk = _PAIR_BLOCK

    def kern(pdf: "pd.DataFrame") -> "pd.DataFrame":
        out = np.array([], dtype=np.int64)
        ids = pdf["n_id"].to_numpy()
        n = len(ids)
        if n >= 2:
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            vecs = pdf["n_vec"].to_numpy()[order]
            lens = np.fromiter(
                ((-1 if v is None else len(v)) for v in vecs),
                dtype=np.int64, count=n)
            dropped = np.zeros(n, dtype=bool)
            for L in np.unique(lens):
                idx = np.flatnonzero(lens == L)
                if L <= 0 or len(idx) < 2:
                    # null vector (guarded upstream) or dim-0 (zero norm
                    # → NULL cosine): never similar, skip — and a
                    # singleton length-group has no same-dim partner
                    continue
                A = np.array(list(vecs[idx]), dtype=np.float64)
                m = len(idx)
                acc = np.zeros(m)
                for k in range(L):
                    acc = acc + A[:, k] * A[:, k]
                nrm = np.sqrt(acc)
                for j0 in range(0, m, blk):
                    j1 = min(j0 + blk, m)
                    S = np.zeros((m, j1 - j0))
                    for k in range(L):
                        S += np.outer(A[:, k], A[j0:j1, k])
                    den = nrm[:, None] * nrm[None, j0:j1]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        cos = S / den
                    sim = np.where(den == 0.0, False,
                                   (cos > tau) | np.isnan(cos))
                    # strict upper triangle in GLOBAL sorted-id order:
                    # row i similar to column j drops j iff i < j
                    gi = np.arange(m)[:, None]
                    gj = np.arange(j0, j1)[None, :]
                    sim &= gi < gj
                    hit = sim.any(axis=0)
                    dropped[idx[j0:j1][hit]] = True
            out = ids[dropped]
        return pd.DataFrame({"drop_id": pd.array(out, dtype="int64")})

    return (assigned.select("n_id", "n_vec", *key)
                    .groupBy(*key)
                    .applyInPandas(kern, schema))


def _bucket_pairs(b: DataFrame, key: list[str],
                  threshold: float) -> DataFrame:
    """(d1, d2, cos) — grouped per-bucket pair LISTING (the
    embedding_near_duplicates output shape; `_cell_drops` emits only the
    losers). Same bit-identity rules as `_cell_drops`, plus:

    - the filter is ``>=`` (near-duplicate grade), and a NaN cosine
      passes it (Spark orders NaN above every threshold) with the NaN
      VALUE in the output — carried through the Arrow return boundary
      by a masked FloatingArray exactly like ``_fold_vec._ret`` (a
      plain float64 Series would null it);
    - ``den == 0`` → NULL cosine → the pair is filtered out."""
    tau = float(threshold)
    blk = _PAIR_BLOCK
    schema = "d1 long, d2 long, cos double"

    def kern(pdf: "pd.DataFrame") -> "pd.DataFrame":
        d1s: list[np.ndarray] = []
        d2s: list[np.ndarray] = []
        coss: list[np.ndarray] = []
        ids = pdf["n_id"].to_numpy()
        n = len(ids)
        if n >= 2:
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            vecs = pdf["n_vec"].to_numpy()[order]
            lens = np.fromiter(
                ((-1 if v is None else len(v)) for v in vecs),
                dtype=np.int64, count=n)
            for L in np.unique(lens):
                idx = np.flatnonzero(lens == L)
                if L <= 0 or len(idx) < 2:
                    continue
                A = np.array(list(vecs[idx]), dtype=np.float64)
                m = len(idx)
                acc = np.zeros(m)
                for k in range(L):
                    acc = acc + A[:, k] * A[:, k]
                nrm = np.sqrt(acc)
                gids = ids[idx]
                for j0 in range(0, m, blk):
                    j1 = min(j0 + blk, m)
                    S = np.zeros((m, j1 - j0))
                    for k in range(L):
                        S += np.outer(A[:, k], A[j0:j1, k])
                    den = nrm[:, None] * nrm[None, j0:j1]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        cos = S / den
                    keep = np.where(den == 0.0, False,
                                    (cos >= tau) | np.isnan(cos))
                    gi = np.arange(m)[:, None]
                    gj = np.arange(j0, j1)[None, :]
                    keep &= gi < gj
                    ii, jj = np.nonzero(keep)
                    if len(ii):
                        d1s.append(gids[ii])
                        d2s.append(gids[jj + j0])
                        coss.append(cos[ii, jj])
        if d1s:
            d1 = np.concatenate(d1s)
            d2 = np.concatenate(d2s)
            cv = np.concatenate(coss)
        else:
            d1 = d2 = np.array([], dtype=np.int64)
            cv = np.array([], dtype=np.float64)
        return pd.DataFrame({
            "d1": pd.array(d1, dtype="int64"),
            "d2": pd.array(d2, dtype="int64"),
            # masked FloatingArray: mask all-false, values carry NaN
            # bit-intact through Arrow (see _fold_vec._ret)
            "cos": pd.Series(pd.arrays.FloatingArray(
                np.asarray(cv, dtype=np.float64),
                np.zeros(len(cv), dtype=bool))),
        })

    return b.groupBy(*key).applyInPandas(kern, schema)


def semantic_cells(corpus: DataFrame, n_lists: int | None = 8,
                   iters: int = 2, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   cell_cap: int | None = None,
                   ) -> tuple[DataFrame, list[str]]:
    """The assignment stage of ``semantic_dedup``, exposed so tests (and
    composed pipelines) can measure the pair-join fan-out directly:
    returns ``(assigned, key)`` where ``assigned`` has
    ``n_id, n_vec, cell`` (plus ``__sub`` when the hot-cluster guard
    split a cell) and ``key`` is the pair-join key list. The pair stage
    is exactly ``assigned ⋈ assigned ON key`` filtered to ``a_id <
    b_id`` — its row count is what ``cell_cap`` bounds."""
    from .packing import hash_order
    if cell_cap is not None and cell_cap < 1:
        raise ValueError("cell_cap must be positive")
    if n_lists is None:
        n = corpus.count()
        n_lists = max(8, min(65536, -(-n // (cell_cap or 20_000))))
    assigned, _ = kmeans_cells(corpus, n_lists=n_lists, iters=iters,
                               id_col=id_col, vec_col=vec_col)
    # NOT checkpointed (round 12, measured): every semantic_dedup
    # execution reads `assigned` three times (both pair sides + the
    # anti-join base), but materializing it means writing/reading the
    # full embedding vectors (n_vec rides every consumer) — cold-run
    # A/B at bench SF put the localCheckpoint variant ~15% SLOWER than
    # re-running the Arrow-batched assignment UDF per consumer
    # (tools_isolate_slot.py --cold; OPTIMIZATION_r12.md). The cheap
    # model table inside kmeans_cells stays checkpointed — it is
    # centroid-sized; this table is corpus-sized.
    key = ["cell"]
    if cell_cap is not None:
        sizes = (assigned.groupBy("cell")
                 .agg(F.count(F.lit(1)).alias("c")).collect())
        n_subs = {int(r["cell"]): -(-int(r["c"]) // cell_cap)
                  for r in sizes}
        if any(v > 1 for v in n_subs.values()):
            # (cell, n_subs) is a ≤ n_lists-row dimension — broadcast
            # it rather than folding literals into a when-chain (the
            # temperature_resample lesson, review r4 #1).
            subs_df = corpus.sparkSession.createDataFrame(
                sorted(n_subs.items()), "cell int, __n_subs long")
            assigned = (assigned
                        .join(F.broadcast(subs_df), "cell")
                        .withColumn("__sub", F.pmod(
                            hash_order(F.concat(
                                F.lit("sd:"),
                                F.col("n_id").cast("string"))),
                            F.col("__n_subs")))
                        .drop("__n_subs"))
            key = ["cell", "__sub"]
    return assigned, key


def pq_encode(corpus: DataFrame, m: int = 4, n_codes: int = 16,
              iters: int = 2, dim: int | None = None,
              id_col: str = "vec_id", vec_col: str = "embedding",
              ) -> tuple[DataFrame, list[list[list[int]]]]:
    """Product quantization (the FAISS memory lever): split each vector
    into ``m`` subvectors, run the exact-integer ``kmeans_cells`` per
    subspace, store each subvector as its nearest-centroid code — a
    dim-doubles vector compresses to ``m`` small ints (dim·8 bytes →
    m·1, 64× at dim=64/m=4/k≤256), which is what lets a 100 TB embedding
    corpus live in executor memory for candidate scanning.

    Every step is the deterministic integer Lloyd math of
    ``kmeans_cells``, so encoding is bit-reproducible and SQL-replayable
    (plans/llm_gate.py unrolls the per-subspace chains).

    Returns ``(encoded, codebooks)``: ``encoded`` has ``n_id`` plus
    ``code_0..code_{m-1}`` (one map-side projection — the m argmins
    evaluate in a single corpus pass), and ``codebooks[s]`` is subspace
    s's centroid components at scale 2^20.

    ``dim`` is required (review r4 #4 retired the ``None``→LIMIT-1
    probe fallback: every caller knows its embedding width, and the
    probe cost an extra analyzer job per call)."""
    if dim is None:
        raise ValueError(
            "pq_encode: pass dim explicitly (the embedding width, e.g. "
            "dim=64) — the implicit LIMIT-1 probe was retired")
    if dim == 0 or dim % m != 0:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    sub_len = dim // m

    # Joint Lloyd over all m subspaces at once: each vector explodes into
    # its m tagged subvectors and one (s, cell, pos) partial-agg serves
    # every codebook — the per-round cost is ONE corpus scan + one
    # m·k·sub_len-group shuffle, not m sequential k-means jobs. The
    # per-subspace math is exactly kmeans_cells', so the SQL oracle can
    # still replay each subspace independently.
    base = corpus.select(F.col(id_col).alias("vid"),
                         _kmeans_uq(F.col(vec_col)).alias("u"))
    seed_rows = _hash_head(base, "vid", n_codes).collect()
    if not seed_rows:
        raise ValueError("pq_encode: empty corpus (no seed vectors)")
    codebooks = [[[64 * int(x) for x in r["u"][s * sub_len:(s + 1) * sub_len]]
                  for r in seed_rows] for s in range(m)]
    n_codes = len(seed_rows)
    subs = base.select(
        "vid",
        F.explode(F.array(*[
            F.struct(F.lit(s).alias("s"),
                     F.slice("u", s * sub_len + 1, sub_len).alias("su"))
            for s in range(m)])).alias("e")) \
        .select("vid", "e.s", "e.su")
    for _ in range(iters):
        cell = _assign_cell_tagged(F.col("s"), F.col("su"), codebooks) \
            if VECTORIZED_ASSIGN else _argmin_cell_tagged(codebooks)
        sums = (subs
                .select("s", cell.alias("cell"), "su")
                .select("s", "cell", F.posexplode("su").alias("pos", "uv"))
                .groupBy("s", "cell", "pos")
                .agg(F.sum("uv").alias("sm"), F.count(F.lit(1)).alias("cnt"))
                .collect())
        new = {(r["s"], r["cell"], r["pos"]): (64 * r["sm"]) // r["cnt"]
               for r in sums}
        codebooks = [[[new.get((s, j, p), codebooks[s][j][p])
                       for p in range(sub_len)]
                      for j in range(n_codes)] for s in range(m)]
    encoded = corpus.select(
        F.col(id_col).alias("n_id"),
        *[_assign_cell(
            _kmeans_uq(F.slice(F.col(vec_col), s * sub_len + 1, sub_len)),
            codebooks[s]).alias(f"code_{s}")
          for s in range(m)])
    return encoded, codebooks


def l2_dist(a: Column, b: Column) -> Column:
    """Σ (a[i]-b[i])² in double, left-to-right — same fold discipline
    (and same vectorized-twin dispatch) as ``dot``, so a SQL oracle
    reproduces it bit-for-bit."""
    if VECTORIZED_FOLD:
        return _fold_vec("l2")(a, b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0), lambda acc, x: acc + x)


def pq_adc_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                m: int = 4, n_codes: int = 64, iters: int = 2,
                refine: int = 50, dim: int | None = None,
                n_salt: int = 8, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Asymmetric-distance (ADC) candidate scan over PQ codes with exact
    re-ranking — the FAISS search pattern. Each query precomputes one
    integer distance table per subspace (its subvector vs all
    ``n_codes`` centroids — a per-query projection, NOT per pair); every
    candidate's approximate distance is ``m`` array lookups summed
    (``Σ_s qd_s[code_s]`` — pure int64, associative, AQE/retry-stable).
    The ``refine`` nearest candidates per query (ties → lower id) are
    then re-ranked by exact double L2 on the original vectors — PQ
    prunes the corpus, the refine step restores metric fidelity (recall
    vs the exact scan is asserted in tests; the oracle replays both
    stages exactly).

    Scale shape: the table-carrying queries broadcast onto the encoded
    corpus (m ints per candidate in memory — the 64× compression is
    what makes a 100 TB corpus scannable); the candidate cut is a salted
    two-phase top-``refine`` (per-(q_id, salt) local heaps, then a
    refine×n_salt-row re-rank per query — no corpus-sized
    single-partition sort); the refine set (queries × refine rows)
    broadcasts back onto the corpus for one vector-fetch pass.
    Output: ``q_id, neighbor_id, rank, l2_dist``."""
    if dim is None:
        raise ValueError(
            "pq_adc_topk: pass dim explicitly (the embedding width, "
            "e.g. dim=64) — the implicit LIMIT-1 probe was retired")
    encoded, codebooks = pq_encode(corpus, m=m, n_codes=n_codes,
                                   iters=iters, dim=dim, id_col=id_col,
                                   vec_col=vec_col)
    sub_len = dim // m
    q = queries.select(
        F.col(id_col).alias("q_id"),
        *[_dist_table(
            _kmeans_uq(F.slice(F.col(vec_col), s * sub_len + 1, sub_len)),
            codebooks[s]).alias(f"qd_{s}")
          for s in range(m)])
    total = None
    for s in range(m):
        term = F.element_at(F.col(f"qd_{s}"), F.col(f"code_{s}") + 1)
        total = term if total is None else total + term
    scored = (encoded.crossJoin(F.broadcast(q))
              .filter(F.col("n_id") != F.col("q_id"))
              .select("q_id", "n_id", total.alias("pq_dist")))
    # Two-phase top-`refine`: a single partitionBy(q_id) window would
    # sort the ENTIRE corpus inside one partition per query — terabytes
    # through single tasks at 10^11 docs. Phase 1 keeps refine rows per
    # (q_id, salt) — partitions are corpus/n_salt-sized and spread over
    # the cluster; phase 2 re-ranks the surviving refine×n_salt rows per
    # query. The global top-refine set (total order: pq_dist, n_id) is
    # contained in the union of per-salt top-refine sets, so the result —
    # and therefore the SQL oracle, which replays the single-window form —
    # is IDENTICAL; only the physical shape changes. The salt never leaves
    # the plan, so it needs no cross-engine hash, just determinism.
    salt = F.pmod(F.xxhash64(F.col("n_id")), F.lit(n_salt))
    wl = W.partitionBy("q_id", "salt").orderBy(F.col("pq_dist").asc(),
                                               F.col("n_id"))
    local = (scored.withColumn("salt", salt)
                   .withColumn("lrn", F.row_number().over(wl))
                   .filter(F.col("lrn") <= refine)
                   .select("q_id", "n_id", "pq_dist"))
    wc = W.partitionBy("q_id").orderBy(F.col("pq_dist").asc(), F.col("n_id"))
    cand = (local.withColumn("crn", F.row_number().over(wc))
                 .filter(F.col("crn") <= refine)
                 .select("q_id", "n_id"))
    cvec = corpus.select(F.col(id_col).alias("n_id"),
                         F.col(vec_col).alias("n_vec"))
    qvec = queries.select(F.col(id_col).alias("q_id"),
                          F.col(vec_col).alias("q_vec"))
    ref = (cvec.join(F.broadcast(cand), "n_id")
               .join(F.broadcast(qvec), "q_id")
               .select("q_id", "n_id",
                       l2_dist(F.col("q_vec"), F.col("n_vec"))
                       .alias("l2_dist")))
    w = W.partitionBy("q_id").orderBy(F.col("l2_dist").asc(), F.col("n_id"))
    return (ref.withColumn("rank", F.row_number().over(w))
               .filter(F.col("rank") <= k)
               .select("q_id", F.col("n_id").alias("neighbor_id"),
                       F.col("rank").cast("int").alias("rank"), "l2_dist"))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_lists: int = 16, nprobe: int = 2, seed: int = 7,
             id_col: str = "vec_id", vec_col: str = "embedding",
             fit_sample: int = 100_000) -> DataFrame:
    """IVF (inverted-file) approximate NN: k-means partitions the corpus
    into ``n_lists`` cells; each query searches only its ``nprobe``
    nearest cells.

    The coarse quantizer is Spark MLlib KMeans (fixed seed) fit on a
    **keyed-hash bounded sample** of at most ``fit_sample`` vectors: the
    ``fit_sample`` smallest ``md5(id)`` rows — a pure function of the
    data, so the training set (hence the centroids) is identical across
    retries, repartitioning and AQE re-plans, where ``sample().limit()``
    would keep whichever rows the first-finishing partitions supplied.
    The iterative MLlib job never touches the full corpus, which is what
    keeps the fit O(sample) at 100 TB, exactly as FAISS trains IVF on a
    slice. Assignment and
    search are DataFrame joins: the centroid table is broadcast (n_lists ×
    dim doubles) and the cell join replaces the cross product. No SQL
    oracle can replay the k-means fit, so the driver applies its rows-only
    check; recall vs the exact path is asserted in tests/test_llm.py."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dense = corpus.select(F.col(id_col).alias("n_id"),
                          F.col(vec_col).alias("n_vec"),
                          array_to_vector(F.col(vec_col).cast("array<double>"))
                          .alias("features"))
    # unconditional: _hash_head IS the bound — when the corpus holds
    # fewer than fit_sample rows it returns all of them, so the former
    # `dense.count() > fit_sample` gate only added a full corpus scan
    feats = _hash_head(dense, "n_id", fit_sample).select("features")
    km = KMeans(k=n_lists, seed=seed, maxIter=10).fit(feats)
    assigned = km.transform(dense).select(
        "n_id", "n_vec", F.col("prediction").alias("cell"))

    centroids = [list(map(float, c)) for c in km.clusterCenters()]

    def _cell_rank(vec: Column) -> Column:
        """Array of cell ids sorted by centroid distance (nearest first).
        n_lists is small, so this is a flat codegen expression."""
        dists = F.array(*[
            F.struct(
                F.sqrt(F.aggregate(
                    F.zip_with(vec, F.array(*[F.lit(x) for x in c]),
                               lambda a_, b_: (a_.cast("double") - b_)
                               * (a_.cast("double") - b_)),
                    F.lit(0.0), lambda acc, x: acc + x)).alias("dist"),
                F.lit(i).alias("cell"))
            for i, c in enumerate(centroids)])
        return F.transform(F.slice(F.array_sort(dists), 1, nprobe),
                           lambda s: s.getField("cell"))

    q = (queries.select(F.col(id_col).alias("q_id"),
                        F.col(vec_col).alias("q_vec"))
         .withColumn("cell", F.explode(_cell_rank(F.col("q_vec")))))
    scored = (assigned.join(F.broadcast(q), "cell")
              .filter(F.col("n_id") != F.col("q_id"))
              .select("q_id", "n_id",
                      cosine(F.col("q_vec"), F.col("n_vec")).alias("cos")))
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("q_id", F.col("n_id").alias("neighbor_id"),
                          F.col("rank").cast("int").alias("rank"), "cos"))


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5, n_bits: int = 4,
             dim: int = 64, id_col: str = "vec_id", vec_col: str = "embedding",
             multiprobe: int = 0) -> DataFrame:
    """Approximate top-k: compare only vectors sharing the SRP bucket.

    2^n_bits buckets ⇒ expected corpus/2^B candidates per query.
    ``multiprobe=1`` additionally probes every bucket at Hamming distance 1
    from the query's bucket (n_bits+1 probes) — the standard recall lever
    when vectors near a hyperplane land on opposite sides. Recall is
    verified against cosine_topk in tests (tests/test_llm.py)."""
    planes = _planes(n_bits, dim)
    qb = queries.select(F.col(id_col).alias("q_id"),
                        F.col(vec_col).alias("q_vec"),
                        srp_bucket(F.col(vec_col), planes).alias("bucket"))
    if multiprobe >= 1:
        probes = F.array(F.col("bucket"),
                         *[F.col("bucket").bitwiseXOR(F.lit(1 << i).cast("long"))
                           for i in range(n_bits)])
        qb = qb.select("q_id", "q_vec", F.explode(probes).alias("bucket"))
    q = F.broadcast(qb)
    c = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"),
                      srp_bucket(F.col(vec_col), planes).alias("bucket"))
    scored = (c.join(q, "bucket")
               .filter(F.col("n_id") != F.col("q_id"))
               .select("q_id", "n_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("cos")))
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("q_id", F.col("n_id").alias("neighbor_id"),
                          F.col("rank").cast("int").alias("rank"), "cos"))
