"""kmeans_cells NULL-vector contract guard (ADVICE r11): a NULL vector
must fail loudly on BOTH assignment paths — the vectorized UDF raised on
its own, but the relational fallback returned NULL, which the -1
non-nullability sentinel would have silently merged into one shared
pair cell."""

from __future__ import annotations

import pytest

from tally_database_loader_spark.llm import similarity as S


def _corpus(spark, with_null: bool):
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0]),
            (4, [2.0, 0.0])]
    if with_null:
        rows.append((5, None))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


@pytest.mark.parametrize("vectorized", [True, False])
def test_kmeans_null_vector_raises_on_both_paths(spark, vectorized):
    old = S.VECTORIZED_ASSIGN
    S.VECTORIZED_ASSIGN = vectorized
    try:
        # the failure may surface at fit time (seed probe / Lloyd pass)
        # or at assignment collection — either way it must be LOUD,
        # never a silent shared -1 cell
        with pytest.raises(Exception):
            assigned, _ = S.kmeans_cells(_corpus(spark, True), n_lists=2,
                                         iters=1)
            assigned.collect()
    finally:
        S.VECTORIZED_ASSIGN = old


@pytest.mark.parametrize("vectorized", [True, False])
def test_kmeans_valid_vectors_unaffected_by_guard(spark, vectorized):
    old = S.VECTORIZED_ASSIGN
    S.VECTORIZED_ASSIGN = vectorized
    try:
        assigned, _ = S.kmeans_cells(_corpus(spark, False), n_lists=2,
                                     iters=1)
        rows = assigned.collect()
        assert len(rows) == 4
        assert all(r["cell"] is not None and r["cell"] >= 0 for r in rows)
        # the non-nullability marking survives the guard: equi-joins on
        # cell must not re-inject IsNotNull (the r11 UDF-duplication fix)
        assert not assigned.schema["cell"].nullable
    finally:
        S.VECTORIZED_ASSIGN = old
