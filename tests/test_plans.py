"""Physical-plan regression tests: the scale claims, asserted.

Each headline claim in README.md §scale-design is checked against the
actual executed plan string, so a refactor that silently introduces a
shuffle, loses parquet pushdown, or drops a broadcast fails CI — plan
shape is part of correctness for a 100 TB engine.
"""

from __future__ import annotations

import re

import pytest

from pantasia_db_sync_spark.plans import QUERIES


def plan_of(spark, sf_dir, name: str) -> str:
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def n_shuffles(plan: str) -> int:
    return len(re.findall(r"Exchange (hash|range)partitioning", plan))


def test_flagship_single_shuffle(spark, sf_dir):
    """Flagship: every dim join broadcast; the only shuffle is the
    decorrelated-metadata window."""
    plan = plan_of(spark, sf_dir, "flagship_extraction")
    assert n_shuffles(plan) == 1, plan
    assert plan.count("BroadcastHashJoin") >= 4, plan


def test_flagship_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "flagship_extraction")
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in plan, plan


def test_broadcast_dims_no_join_shuffle(spark, sf_dir):
    """All four dim joins broadcast; the only shuffle is the final
    aggregation's (partial → final), never a SortMergeJoin."""
    plan = plan_of(spark, sf_dir, "join_broadcast_dims")
    assert n_shuffles(plan) <= 1, plan
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "SortMergeJoin" not in plan, plan


@pytest.mark.parametrize(
    "name", ["window_latest_state", "latest_owner_update", "join_asof"]
)
def test_window_ops_single_shuffle(spark, sf_dir, name):
    """Argmax/as-of plans: one shuffle on the partition key, no more."""
    assert n_shuffles(plan_of(spark, sf_dir, name)) == 1


def test_scan_prunes_columns(spark, sf_dir):
    """Column pruning reaches the parquet reader: unused lineitem
    columns never appear in the FileScan output."""
    plan = plan_of(spark, sf_dir, "scan_project_filter")
    assert "FileScan parquet" in plan, plan
    for unused in ("l_partkey", "l_suppkey", "l_tax", "l_returnflag"):
        assert unused not in plan, unused


@pytest.mark.parametrize(
    "name",
    [
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_embedding_cosine",
        "ann_ivf_topk",
        "ann_lsh_topk",
    ],
)
def test_dedup_family_no_quadratic_join(spark, sf_dir, name):
    """Every dedup/ANN path generates candidates with equi-joins —
    never a BroadcastNestedLoopJoin or CartesianProduct, which are the
    O(n²) plans that die at 100 TB. (ann_bruteforce_topk is the one
    deliberate exception: an exact small-query-set baseline.)"""
    plan = plan_of(spark, sf_dir, name)
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "CartesianProduct" not in plan, name


def test_traindata_plan_shapes(spark, sf_dir):
    """The training-data ops keep their scale shapes: the split is a
    pure map (0 shuffles), packing shuffles once on the source shard
    (never a global single-partition window), top-k n-grams is one
    combinable count + TakeOrdered (no global sort), centroids one
    partial→final aggregate."""
    p = plan_of(spark, sf_dir, "split_train_valid_test")
    assert n_shuffles(p) == 0 and "SinglePartition" not in p, p
    p = plan_of(spark, sf_dir, "pack_token_budget")
    assert n_shuffles(p) == 1 and "SinglePartition" not in p, p
    p = plan_of(spark, sf_dir, "text_topk_ngrams")
    assert n_shuffles(p) == 1 and "TakeOrdered" in p, p
    p = plan_of(spark, sf_dir, "embedding_centroids")
    assert n_shuffles(p) == 1 and "SinglePartition" not in p, p
    # composite cleaner: lang filter reaches the parquet scan, unused
    # columns pruned, one shuffle (the dedup window)
    p = plan_of(spark, sf_dir, "corpus_clean")
    assert n_shuffles(p) == 1, p
    assert "EqualTo(lang,en)" in p, p
    assert "source" not in p.split("ReadSchema")[1][:200], p


# Deliberate exceptions to the no-quadratic-plan rule, each justified:
_ALLOWED_NESTED_LOOP = {
    "ann_bruteforce_topk",  # exact baseline: broadcast small-query-set cross join
    # recall@5 report: contains the same whitelisted brute-force leg —
    # the exact baseline exists precisely to measure the LSH index
    "ann_recall_report",
    "join_cross",           # the cross-join operator itself (tiny dims)
    # one-row broadcast aggregate crossed onto the data (the in-plan
    # scalar pattern — no driver collect): n-node count / grid bounds
    "events_gapfill",
    "graph_pagerank",
    # exact directed phase over a 300-vector subset (broadcast cross,
    # same rationale as ann_bruteforce_topk); the 100 TB path is the
    # cell-local variant (knn_graph_mutual cell_col=...), property-
    # tested and measured in scripts/scale_experiment.py --r7b
    "embedding_knn_graph",
    # uncorrelated scalar subquery (positive-balance average): one-row
    # broadcast aggregate crossed onto the customer pool — the same
    # in-plan scalar pattern as events_gapfill
    "tpch_q22_global_sales_opportunity",
    # one-row vocabulary-size aggregate crossed onto the bigram scoring
    # frame — the events_gapfill in-plan scalar pattern
    "text_bigram_lm_score",
    # uncorrelated scalar subqueries (grand-total / global-max) crossed
    # onto per-key frames — the q22 in-plan scalar pattern
    "tpch_q11_important_stock",
    "tpch_q15_top_supplier",
    # grid bounds + 5-row user dim crossed in-plan, exactly the
    # events_gapfill pattern (this is its interpolate() twin)
    "events_interpolate_linear",
    # one-row totals aggregate (n1, n2) broadcast-crossed onto the
    # cumulative-counts frame and the one-row KS max — in-plan scalars
    "stats_ks_two_sample",
    # same shape: the one-row doubled-rank-sum × one-row totals cross
    "stats_mann_whitney",
    # one-row (n_total, tot_u) aggregate crossed onto the per-language
    # frame — the events_gapfill in-plan scalar pattern
    "corpus_temperature_mix",
    # one-row m_edges aggregate crossed onto the per-community frame —
    # the events_gapfill in-plan scalar pattern (round 11)
    "graph_modularity",
    # pairwise-slope join over the DAILY AGGREGATE frame (D points for
    # D days — calendar-bounded, D(D-1)/2 pairs over ~30 rows here),
    # plus the one-row median-slope aggregate crossed back on: the
    # fact table contributes only one combinable groupBy pass
    "stats_theil_sen",
    # benchmark-set broadcast cross (eval suites are small by nature —
    # the ann_bruteforce_topk rationale; the too-big-to-broadcast trade
    # is corpus_semantic_dedup's cell-bucketed variant)
    "corpus_decontaminate_semantic",
    # binary quantization IS the cheap full scan (popcount-of-XOR per
    # candidate, 32x less memory traffic than the float dot) — the
    # ann_bruteforce_topk rationale; indexed paths are the IVF/LSH
    # query family
    "ann_binary_quantized_topk",
    # the one-row (nr, nt) totals aggregate crossed onto the 256-row
    # bucket-delta frame — the events_gapfill in-plan scalar pattern
    "corpus_dsir_sample",
    # the one-row n_users total crossed onto the calendar-bounded
    # per-day frame — the events_gapfill in-plan scalar pattern
    "events_kaplan_meier",
    # the one-row p5/p95 percentile aggregate crossed onto the fact
    # table — the events_gapfill in-plan scalar pattern
    "stats_winsorized_mean",
    # the one-row cohort-totals aggregate crossed onto the per-token
    # df frame — the corpus_temperature_mix scalar pattern
    "text_vocab_drift",
    # one-row grand-mean / totals / threshold aggregates crossed onto
    # the k-row per-group moments frame — the events_gapfill in-plan
    # scalar pattern; the fact table contributes one combinable pass
    "stats_anova_f",
    "stats_fdr_bh",
    # the one-row full-mean aggregate crossed onto the B=20 resample-
    # means frame — the events_gapfill in-plan scalar pattern
    "stats_bootstrap_ci",
    # the one-row pooled-theta aggregate crossed onto the 2-row cohort
    # moments frame — the events_gapfill in-plan scalar pattern
    "events_ab_cuped",
    # one-row normalization sums crossed onto the per-node score frames
    # each HITS half-round — the events_gapfill in-plan scalar pattern
    "graph_hits_micro",
    # the one-row total-pairs aggregate crossed onto the (rounds+1)-row
    # neighborhood-function frame — the events_gapfill in-plan scalar
    # pattern (round 14)
    "graph_hyperanf_diameter",
}
# Single-partition exchanges: verified STRUCTURALLY (round-14 change,
# VERDICT r13 item 4). The old gate was a 51-name whitelist with
# hand-written justifications -- a list that rots: a future fact-table
# sort could hide behind an old entry. Now every single-partition
# exchange in EVERY query's plan must prove from the plan tree itself
# that its input is metadata-scale: walking down from the exchange,
# every path must hit an AGGREGATE (partial aggregates emit <=
# #partitions rows; final aggregates re-shuffled to one partition are
# the scalar/k-group finishes) or a LIMIT/TakeOrdered before reaching
# any scan. Pass-through operators (Project/Filter/Window/joins of
# bounded inputs/...) propagate the requirement to their children, so
# a whitelisted-by-name query whose exchange ever starts receiving raw
# fact rows FAILS the gate the moment the plan changes.
_PLAN_TREE_ART = " :+-"

# subtree heads that PROVE bounded output (aggregation or limit
# happened, or the rows are literals / a previously-gated exchange)
_BOUNDED_HEADS = (
    "HashAggregate", "SortAggregate", "ObjectHashAggregate",
    "TakeOrderedAndProject", "GlobalLimit", "LocalLimit", "CollectLimit",
    "LocalTableScan", "ReusedExchange", "Subquery", "ReusedSubquery",
)
# row-count-preserving operators: bounded iff ALL children are bounded.
# Row-MULTIPLYING heads are deliberately NOT here (round-15 hardening,
# VERDICT r14 ADVICE): an explode (Generate) of a bounded aggregate's
# array column can be arbitrarily larger than its input, so treating
# it as pass-through would let a single-partition exchange above one
# be "proved" metadata-scale when it is not — Generate is now simply
# unbounded. Cross joins (CartesianProduct /
# BroadcastNestedLoopJoin) get a SHARPER structural rule instead
# (_cross_join_bounded): bounded iff all children are bounded AND one
# side provably emits exactly ONE row (a keys=[] aggregate under pure
# pass-throughs) — the in-plan scalar-cross pattern (events_gapfill /
# events_kaplan_meier / stats_fdr_bh) multiplies by exactly 1, while a
# genuine k x m cross of two bounded frames stays unbounded. Equi-joins
# stay pass-through: their output is bounded by the matching keys of
# two bounded inputs — the k-group-scale finishes this gate exists to
# admit. Anything else must take a _SINGLE_PARTITION_STATIC_EXCEPTIONS
# entry with a written justification.
_PASSTHROUGH_HEADS = (
    "Project", "Filter", "Sort", "Window", "WindowGroupLimit", "Expand",
    "SerializeFromObject", "DeserializeToObject", "Coalesce",
    "InputAdapter", "WholeStageCodegen", "Exchange", "AQEShuffleRead",
    "ShuffleQueryStage", "BroadcastExchange", "Union", "BroadcastHashJoin",
    "SortMergeJoin", "ShuffledHashJoin",
    "AdaptiveSparkPlan", "ResultQueryStage",
    "ColumnarToRow", "ArrowEvalPython", "BatchEvalPython", "MapInPandas",
    "FlatMapGroupsInPandas",
)

# TRUE exceptions the plan tree cannot prove: justification is a
# runtime invariant, documented per entry
_SINGLE_PARTITION_STATIC_EXCEPTIONS = {
    # adaptive small-input collapse: full data passes through a single
    # partition ONLY when parquet footer row counts prove the input is
    # below _TARGET_ROWS_PER_BUCKET (operators/surrogate.py); bigger
    # inputs fan out. The footer check is a runtime gate, invisible to
    # the static plan -- property-pinned in test_properties.py instead.
    "window_dense_ids",
}


def _parse_plan_tree(plan: str) -> list:
    """(indent, head) per operator line of a Spark plan string; tree
    art stripped, AQE section headers ('== Initial Plan ==') skipped."""
    lines = []
    for raw in plan.splitlines():
        if not raw.strip() or raw.lstrip().startswith("=="):
            continue
        i = 0
        while i < len(raw) and raw[i] in _PLAN_TREE_ART:
            i += 1
        if i < len(raw):
            lines.append((i, raw[i:]))
    return lines


def _tree_children(lines: list, i: int) -> list:
    """Indices of the IMMEDIATE children of node i (the minimal-indent
    lines inside its subtree)."""
    ind = lines[i][0]
    sub = []
    j = i + 1
    while j < len(lines) and lines[j][0] > ind:
        sub.append(j)
        j += 1
    if not sub:
        return []
    m = min(lines[j][0] for j in sub)
    return [j for j in sub if lines[j][0] == m]


_CROSS_JOIN_HEADS = ("BroadcastNestedLoopJoin", "CartesianProduct")

# pure single-child wrappers a scalar proof may descend through
_SCALAR_WRAPPERS = (
    "Project", "Filter", "BroadcastExchange", "Exchange", "AQEShuffleRead",
    "ShuffleQueryStage", "WholeStageCodegen", "InputAdapter",
    "ColumnarToRow", "AdaptiveSparkPlan", "ResultQueryStage", "Subquery",
    "ReusedExchange", "Coalesce", "Sort",
)


def _subtree_is_scalar(lines: list, i: int, depth: int = 0) -> bool:
    """True iff the subtree at line i provably emits EXACTLY ONE row:
    a grand aggregate (keys=[]) reached through pure single-child
    wrappers."""
    if depth > 80:
        return False
    raw = lines[i][1]
    head = raw.lstrip("*(0123456789) ")
    if head.startswith(
        ("HashAggregate", "SortAggregate", "ObjectHashAggregate")
    ) and "keys=[]" in raw:
        return True
    if head.startswith(_SCALAR_WRAPPERS):
        ch = _tree_children(lines, i)
        return len(ch) == 1 and _subtree_is_scalar(lines, ch[0], depth + 1)
    return False


def _subtree_bounded(lines: list, i: int, depth: int = 0) -> bool:
    """True iff the subtree rooted at line i provably emits
    metadata-scale rows (every path from the root hits an aggregate or
    limit before any scan; cross joins additionally prove a one-row
    side)."""
    if depth > 80:
        return False
    head = lines[i][1].lstrip("*(0123456789) ")
    if head.startswith(_BOUNDED_HEADS):
        return True
    if head.startswith(_CROSS_JOIN_HEADS):
        ch = _tree_children(lines, i)
        return (
            bool(ch)
            and all(_subtree_bounded(lines, c, depth + 1) for c in ch)
            and any(_subtree_is_scalar(lines, c) for c in ch)
        )
    if head.startswith(_PASSTHROUGH_HEADS):
        ch = _tree_children(lines, i)
        return bool(ch) and all(
            _subtree_bounded(lines, c, depth + 1) for c in ch
        )
    return False  # a scan (or unknown operator) reached the exchange


def _unbounded_single_partition_inputs(plan: str) -> list:
    """The inputs of every single-partition exchange that the plan tree
    cannot prove bounded -- empty for a scale-clean plan."""
    lines = _parse_plan_tree(plan)
    bad = []
    for i, (_ind, head) in enumerate(lines):
        if "Exchange SinglePartition" in head:
            ch = _tree_children(lines, i)
            if not ch:
                bad.append("exchange with no visible child")
            elif not all(_subtree_bounded(lines, c) for c in ch):
                bad.append(lines[ch[0]][1][:100])
    return bad


def test_every_query_plan_free_of_scale_smells(spark, sf_dir):
    """Blanket gate over the ENTIRE registry: no query may plan a
    BroadcastNestedLoopJoin / CartesianProduct unless it is on the
    justified whitelist above, and EVERY single-partition exchange —
    in every query, whitelist or not — must prove STRUCTURALLY from
    the plan tree that its input is metadata-scale (an aggregate or
    limit on every path above any scan; see
    _unbounded_single_partition_inputs). Catches any future query that
    quietly introduces an O(n²) join or a global funnel, and —
    round-14 hardening — a previously-fine query whose single-
    partition exchange starts receiving raw fact rows after a plan
    change, which the old name whitelist could not see.

    Known blind spot: operators that eagerly localCheckpoint
    (with_dense_ids strategy="checkpoint", connected_components,
    bfs_distances / shortest_paths' per-round distance frames)
    truncate the inspected plan to a checkpoint scan, so THEIR upstream
    lineage is not visible here — covered instead by dedicated property
    tests and the pipeline e2e suite. with_dense_ids strategy="sample"
    (the window_dense_ids registry query) has no such truncation: its
    whole plan is inspected here; it is the one STATIC exception (its
    small-input collapse is gated by parquet footer row counts at
    runtime, invisible to the plan tree)."""
    from concurrent.futures import ThreadPoolExecutor

    from pantasia_db_sync_spark.plans import QUERIES

    # build + plan the 350+ queries on a driver thread pool: the wall
    # here is per-query fixed cost (plan compile, and the handful of
    # build-time-eager queries: fit loops, tempdir stores), all of
    # which Spark's driver handles concurrently — 8 threads cut this
    # gate from ~205s to well under a minute without changing what is
    # asserted. Builders are independent (tempfile dirs, no shared
    # session state beyond the thread-safe catalog).
    def plan_of_query(item):
        name, fn = item
        return name, fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()

    with ThreadPoolExecutor(max_workers=16) as pool:
        plans = dict(pool.map(plan_of_query, sorted(QUERIES.items())))

    offenders = {}
    for name in sorted(plans):
        plan = plans[name]
        smells = []
        if "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan:
            if name not in _ALLOWED_NESTED_LOOP:
                smells.append("nested-loop/cartesian join")
        if (
            "Exchange SinglePartition" in plan
            and name not in _SINGLE_PARTITION_STATIC_EXCEPTIONS
        ):
            bad = _unbounded_single_partition_inputs(plan)
            if bad:
                smells.append(f"unbounded single-partition input: {bad}")
        if smells:
            offenders[name] = smells
    assert not offenders, offenders


def test_no_python_udf_in_builtin_paths(spark, sf_dir):
    """Hot-path queries stay JVM-side (no Python eval nodes)."""
    for name in ["agg_pricing_summary", "text_quality_score", "func_hex_roundtrip"]:
        plan = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
