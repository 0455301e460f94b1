#!/usr/bin/env python3
"""BPE tokenizer-training cost curve vs merge count k (VERDICT r6 #6).

``bpe_train`` is inherently iterative (like Lloyd): each merge step is
one O(vocabulary) Spark job plus a 1-row driver probe. That is the
right shape at gate scale (k ≤ 8), but a production tokenizer runs
k ≈ 30k–50k merges — tens of thousands of SEQUENTIAL jobs whose
per-iteration driver latency, not data volume, sets the wall clock.
This tool measures the real curve so SCALE.md states the production
envelope from numbers, not prose:

- a deterministic wide-vocabulary corpus (hash-derived words — the
  bench documents' vocabulary is ~40 words, far too small to sustain
  256 merges) of ``n_docs`` documents over ``n_vocab`` distinct words;
- ``bpe_train`` timed at k = 3 / 32 / 256 on the SAME corpus,
  reporting executed steps, total seconds and sec/step;
- ``bpe_encode`` timed applying each learned table (fold depth grows
  with k — the encode-side cost of a big tokenizer);
- ``bpe_train_batched`` at the same ~256-merge budget, round-7
  single-class vs round-8 conflict-graph coloring (VERDICT r7 #3),
  plus the adoption-rate-vs-alphabet table for both.

Usage: python tools_bpe_scale.py [n_docs] [n_vocab]
       (defaults 50000 10000)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def synth_corpus(spark, n_docs: int, n_vocab: int):
    """Deterministic corpus: doc i holds 20 words, each word the first
    8 md5 hex chars of its (doc, position) slot folded into an
    ``n_vocab``-sized vocabulary — wide vocab, Zipf-free worst case
    (every pair count is low, so merges keep finding fresh winners)."""
    from pyspark.sql import functions as F

    ids = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    word = lambda j: F.substring(  # noqa: E731
        F.md5(F.concat_ws(":", F.lit("w"),
                          ((F.col("doc_id") * 20 + j) % n_vocab)
                          .cast("string"))), 1, 8)
    return ids.select(
        "doc_id",
        F.concat_ws(" ", *[word(j) for j in range(20)]).alias("text"))


def main() -> int:
    from tally_database_loader_spark.llm.lm import bpe_encode, bpe_train
    from tally_database_loader_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    spark = get_spark("bpe-scale")
    corpus = synth_corpus(spark, n_docs, n_vocab).cache()
    n = corpus.count()
    print(f"corpus: {n} docs, {n_vocab} vocab slots, loadavg "
          f"{os.getloadavg()}")
    print("\n| k | steps executed | train total s | train s/step | "
          "encode s | encode s/step |")
    print("|---|---|---|---|---|---|")
    for k in (3, 32, 256):
        t0 = time.perf_counter()
        merge_rows = bpe_train(corpus, "text", k=k, min_count=1) \
            .orderBy("step").collect()
        t_train = time.perf_counter() - t0
        steps = len(merge_rows)
        merges = [(r["lhs"], r["rhs"]) for r in merge_rows]
        t0 = time.perf_counter()
        bpe_encode(corpus, merges).count()
        t_enc = time.perf_counter() - t0
        print(f"| {k} | {steps} | {t_train:.1f} | {t_train / max(steps, 1):.2f}"
              f" | {t_enc:.1f} | {t_enc / max(steps, 1):.3f} |")

    from tally_database_loader_spark.llm.lm import bpe_train_batched
    print("\nbatched trainer at the same ~256-merge budget — round-7 "
          "single-class (max_classes=1) vs round-8 conflict-graph "
          "coloring (max_classes=4):\n")
    print("| rounds × batch | classes | merges adopted | total s "
          "| s/merge |")
    print("|---|---|---|---|---|")
    # (rounds, batch, max_classes, scan_mult): the last config shows
    # the two levers composing — when 4 classes exhaust the default
    # scan window (the 4×64/mc=4 row stalls at ~half budget), scanning
    # deeper + more classes fills it
    for rounds, batch, mc, sm in ((32, 8, 1, 4), (32, 8, 4, 4),
                                  (8, 32, 1, 4), (8, 32, 4, 4),
                                  (4, 64, 1, 4), (4, 64, 4, 4),
                                  (4, 64, 8, 16)):
        t0 = time.perf_counter()
        n_m = bpe_train_batched(corpus, "text", rounds=rounds,
                                batch=batch, min_count=1,
                                max_classes=mc, scan_mult=sm).count()
        dt = time.perf_counter() - t0
        print(f"| {rounds} × {batch} | {mc} (scan_mult={sm}) | {n_m} "
              f"| {dt:.1f} | {dt / max(n_m, 1):.3f} |")

    # adoption rate vs SYMBOL-alphabet width: the md5-hex corpus has a
    # 16-char base alphabet, so single-class symbol-disjointness caps
    # adoption per round hard; coloring should fill the budget on both
    # alphabets (VERDICT r7 #3 bar: ≥50% of batch=32 on 52 chars) —
    # measured, not prose
    import hashlib
    print("\nadoption rate vs base alphabet (rounds=8, batch=32, "
          "same doc/vocab counts):\n")
    print("| base alphabet | classes | merges adopted of 256 "
          "| adopted/round |")
    print("|---|---|---|---|")
    for alpha in (16, 52):
        vocab_words = []
        for i in range(n_vocab):
            h = hashlib.md5(f"w:{i}:{alpha}".encode()).digest()
            vocab_words.append("".join(
                (chr((97 if b % alpha < 26 else 65 - 26) + b % alpha)
                 if alpha == 52 else format(b % 16, "x"))
                for b in h[:8]))
        rows = [(i, " ".join(vocab_words[(i * 20 + j) % n_vocab]
                             for j in range(20)))
                for i in range(min(n_docs, 10_000))]
        wide = spark.createDataFrame(rows, "doc_id bigint, text string")
        for mc in (1, 4):
            n_m = bpe_train_batched(wide, "text", rounds=8, batch=32,
                                    min_count=1, max_classes=mc).count()
            print(f"| {alpha} chars | {mc} | {n_m} | {n_m / 8:.1f} |")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
