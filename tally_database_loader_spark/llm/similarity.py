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
    so partial aggregation and AQE reordering cannot perturb it."""
    xd = F.transform(vec, lambda x: x.cast("double"))
    amax = F.array_max(F.transform(xd, F.abs))
    scale = amax / F.lit(127.0)
    # Stored as array<tinyint> — values are in [-127, 127] by construction,
    # so the materialized column really is 1 byte/component (the claimed
    # 4-8× memory reduction); int_dot widens before multiplying.
    q = F.when(amax == 0.0, F.transform(xd, lambda x: F.lit(0).cast("tinyint"))) \
         .otherwise(F.transform(
             xd, lambda x: F.floor(x / scale + F.lit(0.5)).cast("tinyint")))
    return F.struct(scale.alias("scale"), q.alias("q"))


def int_dot(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] over int64 — exact, order-independent. Inputs may be
    stored narrow (tinyint); each component is widened to long *before*
    the multiply so tinyint×tinyint can never wrap."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


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
    cos = dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))
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


def _argmin_cell(u: Column, cents: list[list[int]]) -> Column:
    """Index of the nearest centroid by exact integer squared distance
    (vector components at scale 2^14·2^6 = 2^20, centroids already at
    2^20); ties break on the lower cell id. Flat codegen expression —
    n_lists structs, no join, no shuffle. Max magnitude: dim·(2^21)² ≤
    2^48 for dim ≤ 64 — comfortably int64."""
    dists = F.array(*[
        F.struct(
            F.aggregate(
                F.zip_with(u, F.array(*[F.lit(int(c)).cast("long") for c in cent]),
                           lambda x, y: (x * F.lit(64) - y) * (x * F.lit(64) - y)),
                F.lit(0).cast("long"), lambda acc, d: acc + d).alias("dist"),
            F.lit(j).alias("cell"))
        for j, cent in enumerate(cents)])
    return F.array_min(dists).getField("cell")


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

    Returns ``(assignments, centroids)``: the corpus with a ``cell``
    column, and the final scale-2^20 integer centroid components."""
    base = corpus.select(F.col(id_col).alias("vid"),
                         _kmeans_uq(F.col(vec_col)).alias("u"))
    seed_rows = (base
                 .withColumn("h", F.md5(F.col("vid").cast("string")))
                 .orderBy("h", "vid").limit(n_lists).collect())
    cents = [[64 * int(x) for x in r["u"]] for r in seed_rows]
    n_lists = len(cents)
    dim = len(cents[0]) if cents else 0
    for _ in range(iters):
        # NB: the argmin projection and the posexplode must be separate
        # selects — a generator in the same projection as a getField
        # expression breaks struct-field resolution (Spark 4 analyzer).
        sums = (base
                .select(_argmin_cell(F.col("u"), cents).alias("cell"), "u")
                .select("cell", F.posexplode("u").alias("pos", "uv"))
                .groupBy("cell", "pos")
                .agg(F.sum("uv").alias("s"), F.count(F.lit(1)).alias("cnt"))
                .collect())
        new = {(r["cell"], r["pos"]): (64 * r["s"]) // r["cnt"] for r in sums}
        cents = [[new.get((j, p), cents[j][p]) for p in range(dim)]
                 for j in range(n_lists)]
    assigned = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"),
        _argmin_cell(_kmeans_uq(F.col(vec_col)), cents).alias("cell"))
    return assigned, cents


def ivf_kmeans_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    n_lists: int = 8, iters: int = 2, nprobe: int = 2,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """IVF ANN whose coarse quantizer is the exact-integer ``kmeans_cells``
    — end-to-end deterministic AND SQL-replayable, closing the one gap the
    MLlib-backed ``ivf_topk`` leaves (its float k-means cannot be
    oracle-checked; this one is hash-matched by the driver).

    Search mirrors ``ivf_topk``: each query ranks cells by the same
    integer distance (ties → lower cell id), probes its ``nprobe``
    nearest, and scores candidates with the deterministic double-fold
    cosine. Queries are broadcast; the cell join replaces the cross
    product."""
    assigned, cents = kmeans_cells(corpus, n_lists=n_lists, iters=iters,
                                   id_col=id_col, vec_col=vec_col)

    def _cell_rank(u: Column) -> Column:
        dists = F.array(*[
            F.struct(
                F.aggregate(
                    F.zip_with(u, F.array(*[F.lit(int(c)).cast("long")
                                            for c in cent]),
                               lambda x, y: (x * F.lit(64) - y)
                               * (x * F.lit(64) - y)),
                    F.lit(0).cast("long"), lambda acc, d: acc + d).alias("dist"),
                F.lit(j).alias("cell"))
            for j, cent in enumerate(cents)])
        return F.transform(F.slice(F.array_sort(dists), 1, nprobe),
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


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_lists: int = 16, nprobe: int = 2, seed: int = 7,
             id_col: str = "vec_id", vec_col: str = "embedding",
             fit_sample: int = 100_000) -> DataFrame:
    """IVF (inverted-file) approximate NN: k-means partitions the corpus
    into ``n_lists`` cells; each query searches only its ``nprobe``
    nearest cells.

    The coarse quantizer is Spark MLlib KMeans (fixed seed → deterministic
    centroids) fit on a **seeded bounded sample** of at most ``fit_sample``
    vectors (one slim count + one sampled scan — the iterative MLlib job
    never touches the full corpus, which is what keeps the fit O(sample)
    at 100 TB, exactly as FAISS trains IVF on a slice). Assignment and
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
    feats = dense.select("features")
    n_vecs = feats.count()
    if n_vecs > fit_sample:
        feats = feats.sample(fraction=min(1.0, 1.05 * fit_sample / n_vecs),
                             seed=seed).limit(fit_sample)
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
