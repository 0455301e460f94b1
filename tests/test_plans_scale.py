"""Physical-plan audits: the properties that decide 100 TB behavior must
hold structurally, not incidentally — filter pushdown reaching the parquet
scan, column pruning, broadcast (not sort-merge) dimension joins, map-side
partial aggregation, and no accidental cartesian products."""

from __future__ import annotations

import pytest

from tally_database_loader_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = _plan(spark, "pricing_summary")
    # the date filter must reach the scan, not run post-scan
    assert "DataFilters: [isnotnull(l_shipdate" in plan
    # column pruning: the 16-column lineitem scan reads only the 7 needed
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "l_comment" not in scan and "l_partkey" not in scan
    # partial + final aggregation (map-side combine before the shuffle)
    assert plan.count("HashAggregate") >= 2
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize("name,min_broadcasts", [
    ("trial_balance", 2),
    ("sales_register", 4),
    ("daily_cash_movement", 1),
    ("stock_summary_brands", 1),
])
def test_star_joins_broadcast(spark, name, min_broadcasts):
    plan = _plan(spark, name)
    assert plan.count("BroadcastHashJoin") >= min_broadcasts, name
    assert "SortMergeJoin" not in plan, \
        f"{name}: dimension join fell back to sort-merge"
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("name", [
    "workflow_dedup", "minhash_lsh_dedup", "hierarchy_closure",
    "event_sessions", "upsert_merge",
])
def test_no_cartesian_products(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan or name == "minhash_lsh_dedup", name


def test_salted_agg_two_phase_plan(spark):
    """The salted aggregation must plan as two grouping levels — phase 1
    on (key, salt) spreading the hot key, phase 2 on the key alone — with
    partial aggregation around each exchange and no extra shuffle beyond
    the two groupings."""
    plan = _plan(spark, "salted_agg")
    assert "_salt" in plan, "salt column missing from the physical plan"
    # two logical groupings × (partial + final) = ≥4 HashAggregate nodes
    assert plan.count("HashAggregate") + plan.count("ObjectHashAggregate") >= 4
    assert "CartesianProduct" not in plan


def test_curation_ops_plan_shapes(spark):
    # chunking/repetition must stay map-side: no aggregation exchange.
    # (repetition's single Exchange is the deliberate fan_out repartition
    # that widens the byte-small text scan; chunking has none at all.)
    assert _plan(spark, "chunk_windows").count("Exchange") == 0
    rep = _plan(spark, "repetition_scores")
    assert rep.count("Exchange") <= 1 and "HashAggregate" not in rep
    # sampling is a pure filter over the scan
    samp = _plan(spark, "hash_sample")
    assert "Exchange" not in samp and "HashAggregate" not in samp
    # vocab top-k: per-partition heaps + driver merge, never a global sort
    # of the full vocabulary through a single partition
    vocab = _plan(spark, "vocab_topk")
    assert "TakeOrderedAndProject" in vocab
    assert "Exchange SinglePartition" not in vocab


def test_renumber_window_is_partitioned(spark):
    """The renumbering series window must partition by the series key:
    a global-window row_number funnels the whole table through one
    partition (the r1 scale soft spot)."""
    plan = _plan(spark, "renumber_join_update")
    assert "Window" in plan
    assert "Exchange SinglePartition" not in plan, \
        "renumber window still funnels through a single partition"


def test_hierarchy_closure_both_join_modes(spark):
    """transitive_closure must produce identical closures whether the edge
    set is broadcast (dimension-sized trees) or shuffle-joined (fact-sized
    edge tables at 100x), and the shuffle mode must not silently broadcast."""
    from tally_database_loader_spark.operators.hierarchy import transitive_closure

    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c"), ("e", "a"), ("f", "e")],
        "child string, parent string")
    bc = transitive_closure(edges, broadcast_edges=True)
    sh = transitive_closure(edges, broadcast_edges=False)
    assert sorted(map(tuple, bc.collect())) == sorted(map(tuple, sh.collect()))
    sh_plan = sh._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in sh_plan or "SortMergeJoin" in sh_plan


def test_new_gate_plan_shapes(spark):
    """Round-2 gates keep the shapes that scale: the merged text profile
    and the temperature resample are zero-shuffle map passes; the LM
    scorer joins its vocabulary-sized count table broadcast; nothing
    funnels through a single partition."""
    tp = _plan(spark, "text_profile")
    # at most one Exchange: the deliberate fan_out round-robin that widens
    # the byte-small, compute-dense text scan (SCALE.md §9) — still no
    # join and no aggregation shuffle in the profile itself. Since round
    # 12 fan_out is DATA-derived (guide §2.6): at this test SF the one-
    # split documents scan already meets the byte-derived width, so the
    # widening exchange legitimately disappears.
    nx = tp.count("Exchange")
    assert nx == 0 or (nx == 1 and "roundrobin" in tp.lower())
    assert "Join" not in tp
    tr = _plan(spark, "temperature_resample")
    # r5: per-group keep-thresholds enter as a broadcast-joined (grp,
    # thr) dimension — a 10k-domain corpus must not build a 10k-deep
    # CASE (review r4 #1). r6: the threshold COMPUTATION moved in-plan
    # (review r5 #3), so the plan legitimately carries the group-count
    # aggregation shuffle (bounded by group cardinality, partial-agg'd)
    # and the 1-row (N, W) totals fold — a SinglePartition exchange
    # over GROUP-level rows, the benign scalar shape — but the
    # CORPUS-level side still only broadcast-joins, never shuffles.
    assert "BroadcastHashJoin" in tr and "SortMergeJoin" not in tr
    assert "CaseWhen" not in tr
    assert tr.count("HashAggregate") >= 4   # partial+final counts+totals
    # the corpus scan feeds the broadcast join directly: no
    # hashpartitioning exchange keyed on doc_id anywhere
    assert "hashpartitioning(doc_id" not in tr
    lm = _plan(spark, "unigram_lm_score")
    # the vocabulary-sized model table joins broadcast; the final
    # docs ⟕ per-doc-scores join is corpus × corpus and may legitimately
    # sort-merge (both sides scale with the data)
    assert "BroadcastHashJoin" in lm
    assert "Exchange SinglePartition" not in lm
    suite = _plan(spark, "similarity_topk_suite")
    assert "CartesianProduct" not in suite
    assert "Exchange SinglePartition" not in suite


def test_ann_kmeans_plan_shapes(spark):
    """The deterministic-k-means ANN paths keep scale shapes: codebooks
    are plan literals, so PQ encoding is map-side; the ADC scan
    broadcasts the per-query lookup tables over the encoded corpus (a
    deliberate BroadcastNestedLoop — each candidate costs m integer
    array lookups, no shuffle of the corpus); the refine set and IVF
    probe cells broadcast; nothing sort-merges or funnels through one
    partition."""
    pq = _plan(spark, "pq_adc_topk")
    assert "CartesianProduct" not in pq
    assert "SortMergeJoin" not in pq
    assert "Exchange SinglePartition" not in pq
    # two-phase candidate cut (VERDICT r2 #2): a window spec partitioned
    # by (q_id, salt) must exist — phase 1 bounds every window partition
    # at corpus/n_salt rows, and the q_id-only re-rank sees at most
    # refine×n_salt rows per query, never the whole corpus
    import re as _re
    assert _re.search(r"windowspecdefinition\(q_id#\w+L?, salt#\w+", pq), \
        "salted phase-1 window missing from the PQ plan"
    ivf = _plan(spark, "ivf_kmeans_topk")
    assert "CartesianProduct" not in ivf
    assert "SortMergeJoin" not in ivf
    assert "BroadcastHashJoin" in ivf
    assert "Exchange SinglePartition" not in ivf


def test_sketch_and_sampling_plan_shapes(spark):
    """HLL's only data shuffle is the 2^b-group register aggregation
    (partial-agg'd map-side); weighted sampling plans as
    TakeOrderedAndProject (per-partition heaps, no global sort); the
    curation pipeline never sort-merges or funnels one partition."""
    hll = _plan(spark, "hll_token_distinct")
    assert "TakeOrderedAndProject" not in hll  # no sort anywhere
    assert hll.count("HashAggregate") >= 2     # partial + final registers
    ws = _plan(spark, "weighted_sample")
    assert "TakeOrderedAndProject" in ws
    assert "Exchange SinglePartition" not in ws
    cp = _plan(spark, "curation_pipeline")
    assert "CartesianProduct" not in cp
    assert "Exchange SinglePartition" not in cp


def test_round2_suite_plan_shapes(spark):
    """The round-2 merged suites and layout gates keep scale-correct
    shapes: selection's corpus-level side only broadcast-joins (the
    per-group threshold table computes in-plan since r6 — its 1-row
    totals fold is the benign group-level SinglePartition, like the
    sketch scalar folds), the batch layout's only exchange partitions
    by shard (never a single partition), the token-stats top-k plans as
    TakeOrderedAndProject, and the bigram LM joins its model
    broadcast."""
    sel = _plan(spark, "selection_suite")
    assert "SortMergeJoin" not in sel
    assert "CartesianProduct" not in sel
    assert "CaseWhen" not in sel
    # the only SinglePartition folds are the resample's (N, W) totals
    # over GROUP-level rows — never a corpus-level funnel
    for seg in sel.split("Exchange SinglePartition")[1:]:
        assert "partial_sum(__tr_n" in seg[:600], \
            "SinglePartition fold over something other than the " \
            "group-level resample totals"
    assert "BroadcastHashJoin" in sel
    bl = _plan(spark, "batch_layout")
    assert "Exchange SinglePartition" not in bl
    assert "Join" not in bl
    ts = _plan(spark, "token_stats_suite")
    assert "TakeOrderedAndProject" in ts
    assert "CartesianProduct" not in ts
    lm2 = _plan(spark, "bigram_lm_score")
    # model broadcast required; the corpus-sized docs ⟕ scores join may
    # sort-merge (see test_new_gate_plan_shapes)
    assert "BroadcastHashJoin" in lm2
    url = _plan(spark, "url_normalize")
    assert url.count("Exchange") == 0 and "Join" not in url


def test_round3_merged_suite_plan_shapes(spark):
    """The round-3 driver-window suites are unions of already-audited
    plans and must not introduce a funnel: no single-partition exchange
    anywhere, no cartesian product, and the multimodal union stays a
    pure map-side pass (its only exchanges are the deliberate fan_out
    round-robins that widen the byte-small document scan)."""
    # sketch_suite: SinglePartition exchanges DO appear — but only to fold
    # the 2^b-row HLL register table (and its 1-row estimate crossJoin)
    # into the final scalar, i.e. over sketch-bounded inputs that never
    # grow with the corpus. The corpus-sized stages must stay partial-
    # agg'd and the weighted-sample arm must plan per-partition heaps.
    sk = _plan(spark, "sketch_suite")
    assert "CartesianProduct" not in sk
    assert "TakeOrderedAndProject" in sk      # weighted-sample arm
    assert sk.count("HashAggregate") >= 4     # partial+final CMS + HLL
    mm = _plan(spark, "multimodal_suite")
    assert "Exchange SinglePartition" not in mm
    assert "Join" not in mm and "CartesianProduct" not in mm
    for ex in mm.split("Exchange")[1:]:
        assert ex.lstrip().lower().startswith("roundrobin"), \
            "multimodal union should shuffle only via fan_out round-robin"
    sim = _plan(spark, "similarity_topk_suite")
    assert "CartesianProduct" not in sim
    assert "Exchange SinglePartition" not in sim


def test_bnlj_inventory_whitelisted(spark):
    """Review r4 #5, as a checked invariant instead of verdict prose:
    across EVERY headline plan there is no CartesianProduct, and every
    BroadcastNestedLoopJoin's build side is one of the two adjudicated
    benign shapes — (a) a 1-row scalar cross-join (the exact
    side-by-side verification values in hll_token_distinct /
    sketch_suite: benign at any scale) or (b) the explicit |Q|=8
    query-set broadcast in the brute-force exact-kNN arms of
    similarity_topk_suite / pq_adc_topk (linear in corpus,
    embarrassingly parallel, the documented exact baseline beside the
    LSH/IVF/PQ arms). Any new BNLJ — in a new query or a regressed plan
    — fails here and must be either fixed or adjudicated into the
    whitelist explicitly."""
    import re
    from bench import HEADLINE
    from tally_database_loader_spark.plans.bench_plans import BENCH_PLANS
    # selection_suite joined the scalar whitelist in round 6: the in-plan
    # temperature_resample threshold computation (review r5 #3) re-enters
    # its 1-row (N, W) totals via a broadcast cross-join onto the
    # GROUP-level table — bounded by group cardinality at any corpus size.
    # The sketch gate twins keep their audited slots even though bench.py
    # now times the production-only *_prod plans (review r5 #8), which
    # must themselves stay BNLJ-free (no exact verification arms).
    BENIGN_SCALAR = {"hll_token_distinct": 1, "sketch_suite": 1,
                     "selection_suite": 1, "temperature_resample": 1}
    BENIGN_QUERYSET = {"similarity_topk_suite": 3, "pq_adc_topk": 1}
    found = {}
    audit = list(HEADLINE) + ["sketch_suite", "hll_token_distinct",
                              "temperature_resample"]
    for name in audit:
        if name in QUERIES:
            df = QUERIES[name](spark, SF)
        elif name in BENCH_PLANS:
            df = BENCH_PLANS[name](spark, SF)
        else:
            continue
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        n = plan.count("BroadcastNestedLoopJoin")
        if n:
            found[name] = (n, plan)
    unexpected = sorted(set(found) - set(BENIGN_SCALAR) - set(BENIGN_QUERYSET))
    assert not unexpected, \
        f"BroadcastNestedLoopJoin outside the adjudicated whitelist: " \
        f"{unexpected} — fix the plan or adjudicate it here"
    for name, cap in BENIGN_QUERYSET.items():
        if name not in found:
            continue
        n, plan = found[name]
        assert n <= cap, f"{name}: {n} BNLJ nodes (adjudicated {cap})"
        # the build side really is the explicit query set: its pushed
        # vec_id < 8 filter must appear in the same plan
        assert re.search(r"vec_id#\d+L? < 8", plan), \
            f"{name}: BNLJ present but no |Q|=8 query-set filter"
    for name, cap in BENIGN_SCALAR.items():
        if name not in found:
            continue
        n, plan = found[name]
        assert n <= cap, f"{name}: {n} BNLJ nodes (adjudicated {cap})"
        # scalar verification cross-join: no join condition (Cross)
        assert "BroadcastNestedLoopJoin BuildRight, Cross" in plan \
            or "BroadcastNestedLoopJoin BuildLeft, Cross" in plan, \
            f"{name}: BNLJ is not the adjudicated scalar cross shape"


@pytest.mark.parametrize("name", ["workflow_dedup",
                                  "latest_order_per_customer"])
def test_keep_one_election_sorts_behind_the_exchange(spark, name):
    """Round 12: keep-one-per-key slots elect via min/max(STRUCT) behind
    an explicit key repartition. A struct aggregate always plans as
    SortAggregate; the repartition must be the ONLY exchange and must
    sit BELOW both SortAggregates, so every sort runs post-shuffle at
    full parallelism instead of single-threaded on the one-split scan
    (the pre-rewrite shape sorted the whole input map-side)."""
    plan = _plan(spark, name)
    assert plan.count("Exchange") == 1, plan
    assert "REPARTITION_BY_COL" in plan
    # no window machinery left, and the aggregate pair is adjacent
    # post-shuffle (no partial aggregate below the exchange)
    assert "WindowGroupLimit" not in plan and "RunningWindowFunction" not in plan
    ex = plan.index("Exchange")
    assert "SortAggregate" in plan[:ex], \
        "SortAggregates should print above (execute after) the exchange"
    assert "SortAggregate" not in plan[ex:], \
        "partial SortAggregate leaked below the exchange (map-side sort)"
