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
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] in double, left-to-right (float→double is exact, so the
    only rounding is the adds — deterministic and oracle-reproducible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


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
    """B-bit bucket id: bit p = sign(vec · plane_p)."""
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
