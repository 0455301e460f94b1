"""Model-based random walk over the manifest ParquetStore: a seeded
sequence of write / write_scoped / compact / vacuum operations is
mirrored against a plain in-memory dict model; after every step the
store's latest snapshot must equal the model, retained historical
versions must replay their recorded states, and no manifest may
reference a missing file. This is the durability argument for the
round-3 snapshot mechanics (manifest carry-forward + reference-counted
vacuum) beyond the handwritten scenarios."""

from __future__ import annotations

import os
import random

from pyspark.sql import functions as F

from tally_database_loader_spark.operators.incremental import ParquetStore


def _df(spark, rows: dict[str, int]):
    if not rows:
        return spark.createDataFrame([], "guid string, val long")
    return spark.createDataFrame(sorted(rows.items()), "guid string, val long")


def _read(spark, store, version=None):
    return {r.guid: r.val
            for r in store.read(spark, "t", version=version).collect()}


def test_store_random_walk_matches_model(spark, tmp_path):
    rng = random.Random(20260814)
    store = ParquetStore(str(tmp_path / "walk"), n_buckets=4)
    keys = [f"g-{i}" for i in range(40)]

    model: dict[str, int] = {k: i for i, k in enumerate(keys)}
    store.write(_df(spark, model), "t")
    history: dict[int, dict[str, int]] = {1: dict(model)}

    for step in range(12):
        op = rng.choice(["scoped", "scoped", "scoped", "write",
                         "compact", "vacuum"])
        if op == "scoped":
            touched = rng.sample(keys, rng.randint(1, 6))
            for k in touched:
                if rng.random() < 0.3 and k in model:
                    del model[k]              # delete
                else:
                    model[k] = rng.randint(0, 10_000)  # upsert
            merged = _df(spark, model)
            tk = spark.createDataFrame([(k,) for k in touched],
                                       "guid string")
            store.write_scoped(merged, "t", tk)
        elif op == "write":
            for k in rng.sample(keys, 5):
                model[k] = rng.randint(0, 10_000)
            store.write(_df(spark, model), "t")
        elif op == "compact":
            v = store.compact(spark, "t", sort_col="guid")
            manifest = store._read_manifest("t", v)
            assert all(len(f) == 1 for f in manifest.values())
        else:
            keep = rng.randint(1, 3)
            dropped = store.vacuum("t", keep_last=keep)
            for v in dropped:
                history.pop(v, None)
        history[store.history("t")[-1]] = dict(model)

        # latest snapshot == model
        assert _read(spark, store) == model, f"diverged at step {step} ({op})"
        # every retained version still replays its recorded state
        for v in store.history("t"):
            if v in history:
                assert _read(spark, store, version=v) == history[v], \
                    f"version {v} corrupted at step {step}"
        # no manifest references a missing file
        troot = os.path.join(store.root, "t")
        for v in store.history("t"):
            for files in store._read_manifest("t", v).values():
                for rel in files:
                    assert os.path.isfile(os.path.join(troot, rel)), \
                        f"dangling manifest ref {rel} at step {step}"
