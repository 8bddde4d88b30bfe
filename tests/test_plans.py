"""Plan-regression guardrails: the load-bearing physical-plan properties
that make the engine scale (pushdown, pruning, broadcast choice, salt
fan-out) are asserted here so a refactor that silently loses one fails CI
instead of surfacing as a 100x regression on a cluster.

These inspect the *initial* executed plan string (pre-AQE), where the
static choices — pushed filters, read schema, join strategy hints — live.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark):
    qs = entry.queries()
    return {name: _plan(qs[name](spark, SF)) for name in (
        "silver_clean", "decode_join", "merge_upsert", "monthly_summary",
        "asof_last_error", "range_join_incidents", "top_revenue_orders",
        "inactive_customers", "urgent_customers", "salted_skew_join",
        "embedding_topk",
    )}


def test_silver_clean_pushdown_and_pruning(plans):
    plan = plans["silver_clean"]
    # the P7 domain IN-filter must reach the parquet scan
    assert "PushedFilters: [In(l_linestatus" in plan
    # column pruning: the scan must not read columns silver never touches
    assert "l_comment" not in plan


def test_dim_and_merge_joins_are_broadcast(plans):
    # J3 decode lookup: 25-row dim joins broadcast, never shuffled
    assert "BroadcastHashJoin" in plans["decode_join"]
    # S8 merge: the delta key anti-join broadcasts the (small) delta side
    assert "BroadcastHashJoin" in plans["merge_upsert"]
    for name in ("decode_join", "merge_upsert"):
        assert "SortMergeJoin" not in plans[name]


def test_no_nested_loop_anywhere(plans):
    """No BroadcastNestedLoopJoin or CartesianProduct in any headline plan.
    Round 3 removed the last sanctioned BNLJ: the brute-force cosine
    baseline (embedding_topk) now scores via a cogrouped Arrow stage
    (FlatMapCoGroupsInPandas), not a crossJoin."""
    assert "FlatMapCoGroupsInPandas" in plans["embedding_topk"]
    for name in ("silver_clean", "decode_join", "merge_upsert",
                 "monthly_summary", "asof_last_error", "range_join_incidents",
                 "top_revenue_orders", "inactive_customers",
                 "urgent_customers", "salted_skew_join", "embedding_topk"):
        assert "BroadcastNestedLoopJoin" not in plans[name], name
        assert "CartesianProduct" not in plans[name], name


def test_aggregates_are_partial_final(plans):
    # map-side combine: every groupBy compiles to partial+final HashAggregate
    assert plans["monthly_summary"].count("HashAggregate") >= 2


def test_salted_join_fans_out_salt(plans):
    plan = plans["salted_skew_join"]
    # the small side explodes over the salt replicas...
    assert "Generate explode" in plan
    # ...and the join key includes the salt column, splitting the hot key
    assert "__salt" in plan


def test_new_joins_stay_hash_based(spark):
    """The round-2 join-bearing queries must never plan nested loops or
    cartesian products (fuzzy_match's variant join, scd2's windows,
    triangle_count's two-hop enumeration, the stats join of
    value_outliers, cohort_retention's cohort join).

    triangle_count is special-cased: its DATA joins (wedge + closing
    semi-join) must be hash joins, but the final combine of three 1-row
    aggregates is a legitimate constant-cost BroadcastNestedLoopJoin."""
    for name in ("fuzzy_match", "scd2_history", "value_outliers",
                 "cohort_retention", "sql_gold_priority"):
        plan = _plan(entry.queries()[name](spark, SF))
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
    tri = _plan(entry.queries()["triangle_count"](spark, SF))
    assert "CartesianProduct" not in tri
    # the two-hop enumeration and the closing semi-join are hash joins
    assert tri.count("BroadcastHashJoin") + tri.count("SortMergeJoin") >= 2
    # BNLJ appears only as the 1-row x 1-row scalar combine (2 of them)
    assert tri.count("BroadcastNestedLoopJoin") <= 2


def test_prefix_sum_is_narrow_single_exchange(spark):
    """The distributed prefix sum behind sequence_pack/corpus_shuffle moves
    the data through exactly ONE exchange (the range partitioning, inside
    the materialized phase-1 job); the final plan is a narrow
    scan -> MapInPandas chain — no Window at all, and in particular never
    an empty-partitionBy global window (whose Exchange SinglePartition
    serializes the corpus through one task).  Guards the core scale
    property of extensions/packing.py."""
    for name in ("sequence_pack", "corpus_shuffle"):
        plan = _plan(entry.queries()[name](spark, SF))
        assert "MapInPandas" in plan, name
        assert "Window" not in plan, name
        assert "Exchange" not in plan, name  # data moved in phase 1 only


def test_price_quartiles_has_no_global_window(spark):
    """price_quartiles' NTILE(4) is computed from the two-phase distributed
    prefix-sum rank (global_rank), not Window.orderBy with no partition key:
    the post-phase-1 plan is scan -> MapInPandas -> closed-form bucket
    arithmetic -> partial/final agg.  No Window operator, and the only
    exchange is the 4-row aggregation shuffle — the data itself moved in
    the materialized phase-1 range partitioning."""
    plan = _plan(entry.queries()["price_quartiles"](spark, SF))
    assert "MapInPandas" in plan
    assert "Window" not in plan
    # quartile rows only (the 4-group agg); never an Exchange SinglePartition
    # over the full input
    assert "Exchange SinglePartition" not in plan.split("TakeOrdered")[0]


def test_round6_addition_plan_shapes(spark):
    """Round-6 queries hold their scale-critical plan properties:

    - exact_quantiles / curriculum_order: no Window (rank comes from the
      materialized prefix-sum phase), and exact_quantiles' point lookup
      is a broadcast join;
    - knn_predict: no CartesianProduct (queries replicate to hash blocks
      in-plan, scoring is cogrouped Arrow);
    - lm_coverage: the bigram assembly is a doc-keyed window + one
      bigram-keyed join — all hash joins, no nested loop;
    - decayed_engagement: the scalar reference timestamp broadcasts (the
      only BNLJ is that 1-row combine), and the decay shift stays in
      codegen (no Python UDF).
    """
    qs = entry.queries()
    eq = _plan(qs["exact_quantiles"](spark, SF))
    assert "Window" not in eq and "BroadcastHashJoin" in eq
    co = _plan(qs["curriculum_order"](spark, SF))
    assert "Window" not in co and "MapInPandas" in co
    knn = _plan(qs["knn_predict"](spark, SF))
    assert "CartesianProduct" not in knn
    assert "FlatMapCoGroupsInPandas" in knn or "FlatMapGroupsInPandas" in knn
    lm = _plan(qs["lm_coverage"](spark, SF))
    assert "CartesianProduct" not in lm
    assert "BroadcastNestedLoopJoin" not in lm
    de = _plan(qs["decayed_engagement"](spark, SF))
    assert "BatchEvalPython" not in de and "ArrowEvalPython" not in de
    assert de.count("BroadcastNestedLoopJoin") <= 1  # the 1-row ref combine
    # attribution: the as-of is ONE union+window pass, never an
    # inequality nested-loop join
    at = _plan(qs["last_touch_attribution"](spark, SF))
    assert "CartesianProduct" not in at
    assert "BroadcastNestedLoopJoin" not in at
    assert at.count("Window") == 1
    # co-occurrence: vocabulary joins broadcast (df table is tiny by the
    # band construction); the top-k is a per-partition heap
    cl = _plan(qs["cooccurrence_lift"](spark, SF))
    assert "TakeOrderedAndProject" in cl
    assert "CartesianProduct" not in cl
    # winnowing match/probe: pure hash joins over the persisted index
    for name in ("winnow_match", "winnow_probe"):
        p = _plan(qs[name](spark, SF))
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name
    # quantization error: array-local codegen, no exchange at all
    qe = _plan(qs["quantization_error"](spark, SF))
    assert "Exchange" not in qe and "BatchEvalPython" not in qe


def test_posting_family_served_from_posting_table(spark):
    """r14: the token-statistics family (cooccurrence_lift, tfidf_terms,
    token_drift) reads the persisted unigram posting table
    (``_posting_table`` — tokenize once per warehouse) instead of
    re-exploding the raw corpus per consumer subtree: their r13 plans
    re-scanned ``documents`` 4–14x with a regex split in every scan.
    Guard: the posting scan is present and NO tokenizing split() remains
    anywhere in the plan (cooccurrence's surviving documents scans are
    count-only for the 1-row corpus total)."""
    qs = entry.queries()
    for name in ("cooccurrence_lift", "tfidf_terms", "token_drift"):
        plan = _plan(qs[name](spark, SF))
        assert "tok_postings" in plan, name
        assert "split(" not in plan, name


def test_median_price_streams_the_group_sort(spark):
    """Exact per-group percentiles run as a PARTITIONED window row_number
    (streaming sort, bounded memory at any group size) — never the
    `percentile` aggregate, whose buffer holds a whole group's values in
    one task."""
    plan = _plan(entry.queries()["median_price"](spark, SF))
    assert "percentile" not in plan.lower()
    assert "Window" in plan


def test_round4_retrieval_and_mixture_plans(spark):
    """Round-4 query shapes hold their scale-critical plan properties:

    - bm25_search (r14: served from the persisted inverted index — the
      same probe plan as bm25_vs_index): the only nested-loop joins are
      the TWO provably-1-row broadcasts (corpus stats, pivoted per-term
      df), and the top-k is a TakeOrdered (per-partition heaps), never a
      global Sort+Limit;
    - mixture_sample: exactly one data exchange (the source-partitioned
      running-sum window), no global window;
    - substring_dedup: served from the persisted df-banded gram profile —
      a BUCKETED scan (the doc-keyed aggregation is bucket-local, no gram
      exchange in the per-query plan at all; the gram window was paid once
      at build time), plus the member-expansion equi-join.
    """
    bm25 = _plan(entry.queries()["bm25_search"](spark, SF))
    assert "TakeOrderedAndProject" in bm25
    # 1-row stats + 1-row df pivot only (the registry-wide invariant
    # proves both build sides <=1-row post-aggregate)
    assert bm25.count("BroadcastNestedLoopJoin") <= 2
    assert "CartesianProduct" not in bm25
    # probe form: no corpus scan, no re-tokenization — the only scans are
    # the term-bucketed postings, the 1-row stats, and the member map
    assert "tok_postings" not in bm25  # unigram posting table is NOT this
    assert "bm25_idx" in bm25
    assert "split(" not in bm25

    mix = _plan(entry.queries()["mixture_sample"](spark, SF))
    assert mix.count("Exchange") - mix.count("BroadcastExchange") == 1
    assert "Window" in mix and "hashpartitioning(source" in mix

    sub = _plan(entry.queries()["substring_dedup"](spark, SF))
    assert "CartesianProduct" not in sub
    assert "BroadcastNestedLoopJoin" not in sub
    # the gram-keyed exchange moved into the build-once profile: the
    # per-query plan reads the doc-bucketed profile table (bucket pruning
    # visible as SelectedBucketsCount) and never shuffles on the gram
    assert "hashpartitioning(gram" not in sub
    assert "SelectedBucketsCount" in sub


def test_semantic_and_pagerank_plans(spark):
    """semantic_dedup: the index assignment is a NARROW mapInPandas, the
    pair scan is one grouped Arrow stage over DISTINCT vectors, and the
    only joins are the multiplicity-collapse member expansions — all
    equi-joins, never nested-loop or cartesian.  pagerank: per-iteration
    rank joins broadcast (dimension-sized node set), never nested-loop
    or cartesian."""
    sem = _plan(entry.queries()["semantic_dedup"](spark, SF))
    assert "FlatMapGroupsInPandas" in sem
    assert "CartesianProduct" not in sem
    assert "BroadcastNestedLoopJoin" not in sem

    pr = _plan(entry.queries()["pagerank"](spark, SF))
    assert "BroadcastHashJoin" in pr
    assert "CartesianProduct" not in pr
    assert "BroadcastNestedLoopJoin" not in pr


def test_session_round4_additions_plan_shapes(spark):
    """Round-4 session additions: the load-bearing plan properties of the
    new operators — keyed windows, broadcast relabel/threshold joins,
    codegen-only text scrubbing, no data-path nested loops (the only BNLJ
    allowed is a 1-row stat combine; hard_negatives' former label-dim
    inequality join became a literal label explode in round 11)."""
    qs = entry.queries()
    # value_anomalies: keyed window (never a global sort), no NL joins
    p = _plan(qs["value_anomalies"](spark, SF))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # markup_strip: pure projection chain — no exchange, no join, no agg
    p = _plan(qs["markup_strip"](spark, SF))
    assert "Exchange" not in p and "Join" not in p
    assert "HashAggregate" not in p
    # zorder_key: pure projection — expression-only, no exchange
    p = _plan(qs["zorder_key"](spark, SF))
    assert "Exchange" not in p and "HashAggregate" not in p
    # adaptive_quality_filter: the per-source threshold joins BROADCAST
    p = _plan(qs["adaptive_quality_filter"](spark, SF))
    assert "BroadcastHashJoin" in p and "CartesianProduct" not in p
    # oov_rate: vocab joins broadcast (dimension-sized by construction)
    p = _plan(qs["oov_rate"](spark, SF))
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    # split_leakage_audit / cross_source_dupes: hash equi-joins only
    for name in ("split_leakage_audit", "cross_source_dupes"):
        p = _plan(qs[name](spark, SF))
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name
    # image_resize: Arrow mapInPandas end-to-end, no exchange
    p = _plan(qs["image_resize"](spark, SF))
    assert "MapInPandas" in p and "Exchange" not in p


def test_cluster_safe_split_is_leakage_free(spark):
    """The invariant the operator exists for: NO near-dup pair straddles
    the split (cluster-atomic assignment), and every document gets
    exactly one side.  The id-hash split this replaces fails exactly
    this check whenever a cluster's members hash to different sides."""
    qs = entry.queries()
    split = qs["cluster_safe_split"](spark, SF)
    sides = split.select("doc_id", "split")
    pairs = qs["ngram_jaccard_dedup"](spark, SF)
    leaks = (
        pairs
        .join(sides.selectExpr("doc_id as id_a", "split as split_a"), "id_a")
        .join(sides.selectExpr("doc_id as id_b", "split as split_b"), "id_b")
        .filter("split_a <> split_b")
        .count()
    )
    assert leaks == 0
    docs = split.count()
    assert split.select("doc_id").distinct().count() == docs
    assert split.filter("split not in ('train','test')").count() == 0


def test_source_quality_cap_plan_is_windowed_topk(spark):
    """The per-source quality cap must run as partial+final
    WindowGroupLimit (map-side top-N heaps before the one source-keyed
    exchange) — never a global sort, never a second exchange for the
    rank filter."""
    plan = _plan(entry.queries()["source_quality_cap"](spark, SF))
    assert plan.count("WindowGroupLimit") == 2  # Partial + Final
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_privacy_ladder_is_single_pass_no_join(spark):
    """generalization_ladder audits every width in ONE aggregate pass over
    the widths-expansion (Generate/explode), never per-width scans or a
    widths CROSS JOIN: no join operator of any kind in the plan, exactly
    one parquet scan, and a partial/final HashAggregate pair so the
    exchange carries group cardinality, not |rows| x |widths|."""
    plan = _plan(entry.queries()["generalization_ladder"](spark, SF))
    assert "Generate explode" in plan
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin",
                "SortMergeJoin", "BroadcastHashJoin"):
        assert bad not in plan
    assert plan.count("Scan parquet") == 1
    assert "partial_count(distinct" in plan or "HashAggregate" in plan


def test_hll_distinct_plan_aggs_only_no_join(spark):
    """hll_distinct is three cascaded hash aggregates (value distinct ->
    per-register MAX -> per-group sum) over ONE scan — no join, no
    window, no generator.  The shuffle after the register agg carries at
    most m rows per group, so any join/window here would be a scale
    smell."""
    plan = _plan(entry.queries()["hll_distinct"](spark, SF))
    assert plan.count("Scan parquet") == 1
    for bad in ("Join", "Window", "Generate", "CartesianProduct"):
        assert bad not in plan
    assert plan.count("HashAggregate") >= 4  # 2 per partial/final stage


def test_privacy_audits_aggregate_before_filter(spark):
    """k-anonymity / l-diversity gates are post-aggregation HAVINGs over
    ONE hash aggregate keyed on the QI tuple — a single scan each, no
    joins, no window (the output is bounded by rare-combo count, so any
    join/window here would be a scale smell)."""
    for key in ("k_anonymity_audit", "l_diversity_audit"):
        plan = _plan(entry.queries()[key](spark, SF))
        assert plan.count("Scan parquet") == 1
        assert "Join" not in plan and "Window" not in plan


def test_kcenter_round_plan_is_take_ordered_no_shuffle(spark):
    """Each greedy k-center round must compile to ONE
    TakeOrderedAndProject over the corpus scan — per-partition top-1 with
    an O(partitions) driver merge, never a global Sort+Exchange (which
    would shuffle the full corpus k times) and never any join.  The
    distance min-chain is map-side codegen."""
    from pyspark.sql import functions as F

    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.similarity import (
        _sq_dist_to,
        _to_double,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pts = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id", _to_double(F.col("embedding")).alias("__v"))
    dmin = F.least(_sq_dist_to(F.col("__v"), [0.0] * 64),
                   _sq_dist_to(F.col("__v"), [1.0] * 64))
    cand = (pts.filter(~F.col("vec_id").isin([0, 1]))
            .select("vec_id", dmin.alias("__d"))
            .orderBy(F.desc("__d"), F.asc("vec_id")).limit(1))
    plan = _plan(cand)
    assert "TakeOrderedAndProject" in plan
    for bad in ("Exchange", "CartesianProduct", "Join", "Window"):
        assert bad not in plan
    assert plan.count("Scan parquet") == 1


def test_kcenter_materialized_round_plan_no_shuffle(spark):
    """The materialize=True round (the k>4 default) must stay
    shuffle-free too: the argmax is ONE TakeOrderedAndProject over the
    checkpointed running-min frame, and the __dmin update is a map-side
    filter+project over that same scan — no Exchange, no Join, no
    re-derivation of earlier centers (exactly one distance fold against
    the newest center)."""
    from pyspark.sql import functions as F

    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.similarity import (
        _sq_dist_to,
        _to_double,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cur = (emb.filter(F.col("embedding").isNotNull())
           .select("vec_id", _to_double(F.col("embedding")).alias("__v"),
                   _sq_dist_to(_to_double(F.col("embedding")),
                               [0.0] * 64).alias("__dmin"))
           .localCheckpoint(eager=True))
    cand = cur.orderBy(F.desc("__dmin"), F.asc("vec_id")).limit(1)
    plan = _plan(cand)
    assert "TakeOrderedAndProject" in plan
    for bad in ("Exchange", "CartesianProduct", "Join", "Window"):
        assert bad not in plan
    upd = (cur.filter(F.col("vec_id") != F.lit(0))
           .select("vec_id", "__v",
                   F.least(F.col("__dmin"),
                           _sq_dist_to(F.col("__v"),
                                       [1.0] * 64)).alias("__dmin")))
    plan = _plan(upd)
    for bad in ("Exchange", "CartesianProduct", "Join", "Window",
                "TakeOrderedAndProject", "Sort"):
        assert bad not in plan
    cur.unpersist()


def test_embedding_covariance_plan_single_exchange_no_join(spark):
    """The covariance matrix must come from the Arrow GEMM stage
    (MapInPandas int64 X^T X partials) over ONE parquet scan into a
    partial+final aggregate — no self-join and no per-row d^2 generator
    expansion (measured ~8x slower at 10x volume), and exactly one
    exchange, whose width is the d^2/2 group count, not corpus size."""
    plan = _plan(entry.queries()["embedding_covariance"](spark, SF))
    assert plan.count("Scan parquet") == 1
    assert "MapInPandas" in plan
    assert "Generate" not in plan
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") == 2  # partial + final


def test_jl_projection_plan_is_shuffle_free(spark):
    """rademacher_project is a pure per-row fold: scan -> project ->
    posexplode.  The sign matrix is plan literals, so there is NO
    exchange, NO join, NO aggregate — any of those appearing means the
    projection stopped being embarrassingly parallel."""
    plan = _plan(entry.queries()["jl_projection"](spark, SF))
    assert plan.count("Scan parquet") == 1
    assert "Generate" in plan  # the posexplode to long format
    for bad in ("Exchange", "Join", "HashAggregate", "Window",
                "CartesianProduct"):
        assert bad not in plan


def test_dsir_weights_plan_broadcasts_bucket_stats(spark):
    """dsir_weights: the corpus token explode is paid ONCE — the
    materialized per-(doc, bucket) aggregate serves both the global
    bucket stats and the scoring join, so the final plan reads the
    checkpoint (Scan ExistingRDD), never parquet.  The bucket table
    reaches the per-doc side as a BROADCAST hash join, the corpus totals
    are a window over the post-aggregate bucket rows (bounded input),
    and nothing shuffles a sort-merge join."""
    plan = _plan(entry.queries()["dsir_weights"](spark, SF))
    assert plan.count("Scan parquet") == 0  # corpus read in the one
    assert plan.count("Scan ExistingRDD") == 2  # materialization job
    assert "BroadcastHashJoin" in plan
    assert "Window" in plan  # the bounded totals window
    for bad in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct",
                "BroadcastNestedLoopJoin"):
        assert bad not in plan


def test_dialog_assembly_plan_single_agg_no_window(spark):
    """assemble_dialogs is ONE partial/final aggregate keyed on the user
    (collect_list -> row-local array_sort/slice/join) — a window or join
    here would mean the per-user ordering escaped to a shuffle."""
    plan = _plan(entry.queries()["dialog_assembly"](spark, SF))
    assert plan.count("Scan parquet") == 1
    for bad in ("Window", "Join", "CartesianProduct"):
        assert bad not in plan


def test_snapshot_diff_plan_is_single_key_join(spark):
    """snapshot_diff is one full-outer equi-join on the key — hash or
    sort-merge are both legitimate for two churn-scale snapshots, but a
    nested loop / cartesian means the null-safe compare leaked into the
    join condition."""
    plan = _plan(entry.queries()["snapshot_diff"](spark, SF))
    assert "FullOuter" in plan
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan


def _iter_physical_nodes(node):
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from _iter_physical_nodes(ch.apply(i))


# unary nodes that cannot grow a <=1-row input
_ROW_PRESERVING = {"Project", "Filter", "Sort", "Coalesce", "GlobalLimit",
                   "LocalLimit", "Exchange", "BroadcastExchange",
                   "ShuffleExchange", "ColumnarToRow", "InputAdapter",
                   "WholeStageCodegen"}


def _is_scalar_subplan(node) -> bool:
    """True when the physical subtree provably produces <=1 row: a GLOBAL
    aggregate (empty grouping keys) at the root, possibly under
    row-preserving unary nodes."""
    name = node.nodeName()
    first = node.toString().split("\n", 1)[0]
    if "Aggregate" in name and "keys=[]" in first:
        return True
    base = name.split(" ")[0].split("(")[0]
    if base in _ROW_PRESERVING and node.children().size() == 1:
        return _is_scalar_subplan(node.children().apply(0))
    return False


def _subtree_is_bounded(node) -> bool:
    """True when the subtree's row count is provably SUB-INPUT bounded:
    an aggregate (|groups| rows), a global/take-ordered limit, or a
    window-group limit appears somewhere below — the inputs on which a
    single-partition sort is metadata-sized by construction."""
    for n in _iter_physical_nodes(node):
        name = n.nodeName()
        if ("Aggregate" in name or "TakeOrderedAndProject" in name
                or "GlobalLimit" in name or "WindowGroupLimit" in name):
            return True
    return False


def test_whole_registry_nested_loop_and_global_window_invariants(spark):
    """Global invariants over ALL registry queries (the full driver-gate
    surface, not a named subset), one plan compile per query:

    1. no plan may contain a CartesianProduct, ever — and any
       BroadcastNestedLoopJoin must broadcast a provably <=1-row
       POST-AGGREGATE build side (the scalar-broadcast pattern used by
       bm25_search / triangle_count / decayed_engagement / collocations /
       hard_negatives / skew_profile / lsh_recall: a global aggregate's
       single row joined onto every row — constant cost by construction);
    2. every PARTITION-LESS Window (WindowExec moves ALL rows to one
       partition) must sit above a bounded subtree — an aggregate,
       TakeOrdered, or limit — so its input is |groups|/k rows, never
       the raw table (the revenue_growth / fulfillment_concurrency /
       moving_avg cumsum-over-post-aggregate pattern; round-11 verdict
       task 6).  A future edit that slides a global window onto raw data
       fails here in CI, not in the 100 TB postmortem.

    Compiling a plan is cheap; this closes the gap between per-round
    scale-smoke plan-flip checks by failing the moment a query regresses
    to an unbounded nested loop or an unbounded single-partition sort."""
    entry.warm_persisted(spark, SF)  # build-once artifacts out of the loop
    qs = entry.queries()
    offenders = []
    for name, fn in qs.items():
        try:
            plan = fn(spark, SF)._jdf.queryExecution().sparkPlan()
        except Exception as exc:  # surface compile breakage by name
            offenders.append(f"{name}: failed to compile ({exc})")
            continue
        for node in _iter_physical_nodes(plan):
            nn = node.nodeName()
            if nn == "CartesianProduct":
                offenders.append(f"{name}: CartesianProduct")
            elif nn == "BroadcastNestedLoopJoin":
                build = node.children().apply(
                    0 if node.buildSide().toString() == "BuildLeft" else 1)
                if not _is_scalar_subplan(build):
                    offenders.append(
                        f"{name}: BNLJ build side not a <=1-row aggregate "
                        f"({build.toString().splitlines()[0][:100]})")
            elif nn == "Window" and node.partitionSpec().size() == 0:
                child = node.children().apply(0)
                if not _subtree_is_bounded(child):
                    offenders.append(
                        f"{name}: partition-less Window over an unbounded "
                        f"input ({child.toString().splitlines()[0][:100]})")
    assert not offenders, offenders


def test_range_window_and_unpivot_plan_shapes(spark):
    """range_window_revenue: ONE supplier-keyed exchange feeds both the
    daily aggregate and the RANGE-frame window (same key, Catalyst
    reuses the distribution) — no join, no extra shuffle.
    unpivot_metrics: the stack() melt runs row-locally after the one
    aggregate — no join, no window, single scan."""
    rw = _plan(entry.queries()["range_window_revenue"](spark, SF))
    assert rw.count("Scan parquet") == 1
    assert "Window" in rw and "Join" not in rw
    up = _plan(entry.queries()["unpivot_metrics"](spark, SF))
    assert up.count("Scan parquet") == 1
    for bad in ("Join", "Window", "CartesianProduct"):
        assert bad not in up


def test_round11_addition_plan_shapes(spark):
    """Round-11 additions hold their scale-critical plan properties:

    - gopher_rules: pure per-row codegen — no exchange, no join, no
      aggregate (the same scan-local shape as quality_scores);
    - temporal_split: the max(ts) anchor is the sanctioned 1-row scalar
      broadcast; the classifier aggregates in one partial/final pass —
      no window;
    - kmv_set_ops: bottom-k is TakeOrdered (per-partition heaps), never
      an Exchange SinglePartition of input rows before the sketch cut;
    - revenue_growth: the LAG window runs on the POST-AGGREGATE month
      table (aggregate below the window in the plan), one parquet scan.
    """
    qs = entry.queries()
    g = _plan(qs["gopher_rules"](spark, SF))
    assert "Exchange" not in g and "Join" not in g
    assert "HashAggregate" not in g and "Window" not in g

    ts = _plan(qs["temporal_split"](spark, SF))
    assert "Window" not in ts and "CartesianProduct" not in ts
    assert ts.count("BroadcastNestedLoopJoin") <= 1  # the 1-row max anchor

    kv = _plan(qs["kmv_set_ops"](spark, SF))
    assert "TakeOrderedAndProject" in kv
    assert "CartesianProduct" not in kv

    rg = _plan(qs["revenue_growth"](spark, SF))
    assert rg.count("Scan parquet") == 1 and "Window" in rg
    # the aggregate must appear BELOW the window: the window sorts the
    # |months| aggregate output, never the raw orders
    assert rg.index("HashAggregate") > rg.index("Window")

    # fulfillment_concurrency: the sweep line joins hash-wise, explodes
    # deltas row-locally, and the cumulative window runs BELOW-aggregate
    # (on the |days| net table, never the raw interval rows)
    fc = _plan(qs["fulfillment_concurrency"](spark, SF))
    assert "CartesianProduct" not in fc
    assert "BroadcastNestedLoopJoin" not in fc
    assert "Generate explode" in fc and "Window" in fc
    assert fc.index("HashAggregate") > fc.index("Window")

    # rfm_features: one per-user aggregate + the 1-row anchor broadcast
    rfm = _plan(qs["rfm_features"](spark, SF))
    assert rfm.count("BroadcastNestedLoopJoin") <= 1  # the scalar anchor
    assert "CartesianProduct" not in rfm and "Window" not in rfm

    # substring_removal: gram-keyed window (the audit's exchange shape) +
    # hash joins; the HOF rebuild stays in codegen — no Python eval, no
    # nested loops
    sr = _plan(qs["substring_removal"](spark, SF))
    assert "Window" in sr and "CartesianProduct" not in sr
    assert "BroadcastNestedLoopJoin" not in sr
    assert "BatchEvalPython" not in sr and "ArrowEvalPython" not in sr


def test_round12_addition_plan_shapes(spark):
    """Round-12 additions hold their scale-critical plan properties:

    - winsorized_stats: the |groups|-row bounds table reaches the fact
      scan as a BROADCAST hash join; the percentile window is
      PARTITIONED by the group (streaming sort, never single-partition);
      no nested loops;
    - revenue_gini / zipf_slope: the global value/frequency rank is the
      two-phase range prefix sum (MapInPandas over the materialized
      range layout — Scan ExistingRDD) with NO Window anywhere: ranking
      the entity/vocabulary table must never serialize into one task.
    """
    qs = entry.queries()
    ws = _plan(qs["winsorized_stats"](spark, SF))
    assert "BroadcastHashJoin" in ws and "Window" in ws
    assert "CartesianProduct" not in ws
    assert "BroadcastNestedLoopJoin" not in ws

    for name in ("revenue_gini", "zipf_slope"):
        p = _plan(qs[name](spark, SF))
        assert "Window" not in p, name
        assert "MapInPandas" in p and "Scan ExistingRDD" in p, name
        for bad in ("CartesianProduct", "BroadcastNestedLoopJoin",
                    "SortMergeJoin"):
            assert bad not in p, name

    # quality_percentile: the skew-safe GROUPED rank — same MapInPandas
    # shape, and critically NO Window.partitionBy(source) (a 40%-of-corpus
    # source would serialize through one task's sort)
    qp = _plan(qs["quality_percentile"](spark, SF))
    assert "Window" not in qp and "MapInPandas" in qp
    assert "CartesianProduct" not in qp
    assert "BroadcastNestedLoopJoin" not in qp

    # source_entropy: two chained aggregates (term counts -> per-source
    # entropy), no window, no join — pure shuffle-then-reduce
    se = _plan(qs["source_entropy"](spark, SF))
    assert "Join" not in se and "Window" not in se
    assert se.count("Scan parquet") == 1

    # kfold_assign: the share window runs on the POST-AGGREGATE
    # |langs x K| table (aggregate below the window), one scan
    kf = _plan(qs["kfold_assign"](spark, SF))
    assert kf.count("Scan parquet") == 1 and "Window" in kf
    assert kf.index("HashAggregate") > kf.index("Window")
    assert "Join" not in kf

    # transition_entropy: user-keyed lead window + two chained
    # aggregates — no join, no nested loop
    te = _plan(qs["transition_entropy"](spark, SF))
    assert "Join" not in te and "CartesianProduct" not in te
    assert "Window" in te  # the per-user lead, keyed

    # source_vocab_overlap: term-keyed equi self-join (hash or SMJ both
    # fine), sizes arrive broadcast — and NEVER a nested loop (the
    # src_a < src_b inequality must ride the term equi-key, not become
    # the join itself)
    so = _plan(qs["source_vocab_overlap"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in so
    assert "CartesianProduct" not in so
    assert "BroadcastHashJoin" in so  # the two size lookups

    # revenue_lorenz: cumsum/total windows run on the POST-AGGREGATE
    # 10-row decile table; the customer rank is the MapInPandas prefix
    # sum, never an unpartitioned window over entities
    lz = _plan(qs["revenue_lorenz"](spark, SF))
    assert "MapInPandas" in lz and "Window" in lz
    assert lz.index("HashAggregate") > lz.index("Window")
    assert "CartesianProduct" not in lz

    # image_histogram: fully narrow — one scan feeding chained Arrow
    # stages (synth + histogram), no exchange/join/window anywhere
    ih = _plan(qs["image_histogram"](spark, SF))
    assert ih.count("Scan parquet") == 1 and "MapInPandas" in ih
    for bad in ("Exchange", "Join", "Window", "HashAggregate"):
        assert bad not in ih

    # mutual_knn: the k*N directed top-k list is checkpoint-materialized
    # ONCE (r13: it feeds both sides of the reciprocity join, which used
    # to recompute the full cogrouped scoring per side), so the final
    # plan is a pair-keyed EQUI self-join over the checkpointed RDD —
    # never a nested loop over vectors.  The cogrouped Arrow scoring
    # shape itself is asserted on embedding_topk (same cosine_topk).
    mk = _plan(qs["mutual_knn"](spark, SF))
    assert "Scan ExistingRDD" in mk  # the materialized top-k list
    assert "Join" in mk
    assert "CartesianProduct" not in mk
    assert "BroadcastNestedLoopJoin" not in mk

    # quality_threshold_sweep: ONE 1-row conditional aggregate, curve
    # exploded post-aggregate — no join, no window, single scan
    qt = _plan(qs["quality_threshold_sweep"](spark, SF))
    assert qt.count("Scan parquet") == 1
    assert "Generate explode" in qt
    for bad in ("Join", "Window", "CartesianProduct"):
        assert bad not in qt


def test_quality_family_staged_single_tokenize(spark):
    """r13 OPT: the quality/lang-id/gopher family stages its text
    primitives (trim/split/HOF) into narrow projections, so the regex
    tokenizer appears a FIXED small number of times in each plan.  The
    inline expression form re-evaluated split() at every lambda-HOF
    reference (Catalyst does not CSE across lambda bodies): lang_id
    carried 20 splits per row, quality_threshold_sweep 72, filter_funnel
    28, gopher_rules 52 — measured 1.2-2.3x per query at sf0.1 when
    staged (plans/r13/*_before|after.txt)."""
    qs = entry.queries()
    expected = {
        "lang_id": 1,
        "langid_confusion": 1,
        "quality_scores": 1,
        "text_stats": 1,
        "quality_threshold_sweep": 1,
        "gopher_rules": 2,   # token split + line split
        "filter_funnel": 3,  # length-stage split + inline quality chain
    }
    for name, n in expected.items():
        plan = _plan(qs[name](spark, SF))
        got = plan.count("split(")
        assert got == n, f"{name}: {got} split() evaluations, expected {n}"
