"""Physical-plan audit: the scale posture is part of the contract.

These tests pin the plan shapes that matter at 100 TB: filters reach
the parquet scan, scans are column-pruned, dimension joins broadcast,
and aggregates partial-combine before the exchange. A regression here
is a performance bug even when results stay correct.
"""

from __future__ import annotations

from retail_sales_etl_spark.operators.modeling import build_sales_fact
from retail_sales_etl_spark.catalog import load_table
from retail_sales_etl_spark.plans.analytics import (
    q_pricing_summary,
    q_revenue_by_nation,
    q_star_flagship,
)


def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_star_flagship_broadcasts_all_dims(spark, sf_dir):
    plan = _formatted_plan(q_star_flagship(spark, sf_dir))
    # customer, nation, region broadcast (orders too at this scale)
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    # partial agg before the exchange
    assert "HashAggregate" in plan and "Exchange" in plan


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    plan = _formatted_plan(q_pricing_summary(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q1_scan_is_column_pruned(spark, sf_dir):
    plan = _formatted_plan(q_pricing_summary(spark, sf_dir))
    # 7 of 11 lineitem columns are needed; the scan must not read keys
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_revenue_by_nation_pushes_date_filter(spark, sf_dir):
    plan = _formatted_plan(q_revenue_by_nation(spark, sf_dir))
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "EqualTo(r_name,ASIA)" in plan


def test_sales_fact_prunes_unused_columns(spark, sf_dir):
    plan = _formatted_plan(build_sales_fact(load_table(spark, sf_dir, "lineitem")))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_returnflag" not in read_schema
    assert "l_linestatus" not in read_schema


def test_whole_stage_codegen_and_aqe_active(spark, sf_dir):
    df = q_pricing_summary(spark, sf_dir)
    df.collect()  # AQE finalizes the plan at execution
    final = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "isFinalPlan=true" in final
    # '*(n)' marks whole-stage-codegen'd subtrees in the final plan
    assert "*(" in final
    # AQE coalesced the over-provisioned shuffle partitions at this SF
    assert "AQEShuffleRead" in final


def test_bucketed_fact_join_has_no_join_shuffle(spark, sf_dir):
    """The co-bucketed layout must eliminate the fact-fact Exchange:
    with broadcast disabled, the raw join of the two bucketed tables
    plans as SortMergeJoin over bucketed scans with ZERO Exchange."""
    from pyspark.sql import functions as F

    from retail_sales_etl_spark.plans.etl_queries import q_bucketed_fact_join

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q_bucketed_fact_join(spark, sf_dir)  # writes the bucketed layout
        j = spark.table("li_bucketed").join(
            spark.table("orders_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _formatted_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert plan.count("Bucketed: true") == 2
        # the full rollup may shuffle for the final agg, but never on
        # the join key alone
        full = _formatted_plan(q_bucketed_fact_join(spark, sf_dir))
        assert "hashpartitioning(l_orderkey" not in full
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_interval_join_is_hash_join_not_nested_loop(spark, sf_dir):
    """The time band must ride as a join FILTER on the user_id equi-key;
    a BroadcastNestedLoopJoin here means the planner saw no equi-key
    and the query is quadratic at scale."""
    from retail_sales_etl_spark.plans.advanced import q_events_interval_join

    plan = _formatted_plan(q_events_interval_join(spark, sf_dir))
    assert "NestedLoop" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_sampling_and_chunking_are_shuffle_free(spark, sf_dir):
    """Rate sampling and chunking are map-side-only: zero Exchange."""
    from retail_sales_etl_spark.operators.sampling import q_sample_stratified
    from retail_sales_etl_spark.operators.text import q_chunk_documents

    assert "Exchange" not in _formatted_plan(q_sample_stratified(spark, sf_dir))
    assert "Exchange" not in _formatted_plan(q_chunk_documents(spark, sf_dir))


def test_prepare_corpus_gate_pushed_to_scan(spark, sf_dir):
    """The quality gate must prune the corpus AT THE SCAN so every
    downstream dedup stage reads gated survivors only."""
    from retail_sales_etl_spark.operators.dedup import q_prepare_corpus

    plan = _formatted_plan(q_prepare_corpus(spark, sf_dir))
    # the word-count gate is a derived expression (not scan-pushable),
    # but it must sit directly on the scans, before any join/window
    assert "Filter" in plan
    # no CartesianProduct anywhere in the composed pipeline
    assert "Cartesian" not in plan


def test_decontaminate_never_shuffles_on_gram(spark, sf_dir):
    """Per-doc gram dedup is map-side (array_distinct before explode)
    and the eval side broadcasts: the training grid must never hash-
    partition on the gram key — that shuffle is the 100 TB killer."""
    from retail_sales_etl_spark.operators.text import q_decontaminate_ngram

    plan = _formatted_plan(q_decontaminate_ngram(spark, sf_dir))
    # exactly ONE gram-keyed exchange: the eval side's DISTINCT, whose
    # input is bounded by the benchmark corpus. The training grid adding
    # a second one would be the scale killer.
    assert plan.count("hashpartitioning(gram") == 1
    assert "BroadcastHashJoin" in plan
    assert "Cartesian" not in plan


def test_semantic_dedup_blocks_stay_in_cell(spark, sf_dir):
    """dedup_semantic's quadratic kernel must be keyed by cell (one
    FlatMapGroupsInPandas over the cell partition), never a self-join."""
    from retail_sales_etl_spark.operators.dedup import q_dedup_semantic

    import re

    plan = _formatted_plan(q_dedup_semantic(spark, sf_dir))
    assert "Cartesian" not in plan
    # exactly one pandas kernel (assignment is pure Catalyst); formatted
    # explain prints every node twice (tree + detail), so count detail
    # headers only
    kernels = re.findall(r"^\(\d+\) FlatMapGroupsInPandas", plan, re.MULTILINE)
    assert len(kernels) == 1


def test_nation_trade_flows_broadcasts_all_dims(spark, sf_dir):
    """Q7 shape: four broadcast joins (customer, supplier, 2x nation);
    the only shuffle-partitioned join is lineitem x orders."""
    from retail_sales_etl_spark.plans.analytics import q_nation_trade_flows

    plan = _formatted_plan(q_nation_trade_flows(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    # the fact join may SortMerge or shuffle-hash, but only on orderkey
    assert "hashpartitioning(c_custkey" not in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Runtime bloom-filter join pruning: with a selective dimension
    filter and a non-broadcast join, the optimizer injects a
    might_contain() predicate on the fact side so the big scan drops
    non-joining rows BEFORE the shuffle — the row-group-skipping path
    that matters when the fact is 100 TB and the filtered dim is not.
    """
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
    }
    saved = {}
    for k in confs:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            "o_orderpriority = '1-URGENT'"
        )
        plan = _formatted_plan(
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bloom_probe_filters_fact_before_join(spark, sf_dir):
    """The bloom membership predicate must sit on the fact side BELOW
    the semi-join — that's the entire point (prune before exchange)."""
    from retail_sales_etl_spark.operators.joins import q_bloom_pruned_revenue

    plan = _formatted_plan(q_bloom_pruned_revenue(spark, sf_dir))
    # the probe expression (map element_at & bit test) is present...
    assert "element_at" in plan and "shiftleft" in plan
    # ...and a semi-join still performs the exact check
    assert "LeftSemi" in plan


def test_session_native_has_no_window_sort(spark, sf_dir):
    """Native session_window is an aggregate, not a window function:
    no Window operator (whose per-user sort partition the
    window-function variant needs)."""
    from retail_sales_etl_spark.operators.events import q_events_session_native

    plan = _formatted_plan(q_events_session_native(spark, sf_dir))
    assert "session_window" in plan.lower()
    assert "RunningWindowFunction" not in plan and "Window\n" not in plan


def test_scale_percentile_paths_use_fixed_memory_sketches(spark, sf_dir):
    """approx=True is the 100x path for every query whose default uses
    an exact percentile over fact-sized input: the plan must carry ONLY
    approx_percentile (fixed-size GK sketch, map-side combinable) — a
    single bare percentile() there buffers the whole group on one
    reducer and is the OOM the scale mode exists to remove."""
    from retail_sales_etl_spark.operators.events import q_events_anomaly_mad
    from retail_sales_etl_spark.plans.advanced import (
        q_equidepth_order_values,
        q_order_value_percentiles,
    )

    for q in (
        q_equidepth_order_values,
        q_order_value_percentiles,
        q_events_anomaly_mad,
    ):
        plan = _formatted_plan(q(spark, sf_dir, approx=True))
        assert "approx_percentile" in plan, q.__name__
        assert plan.count("percentile(") == plan.count(
            "approx_percentile("
        ), f"{q.__name__} scale path still has an exact percentile"


def test_approx_percentile_paths_track_exact(spark, sf_dir):
    """Sketch-mode results stay close to the exact (oracle) form and
    keep its schema — the scale path is the same query, cheaper."""
    from retail_sales_etl_spark.operators.events import q_events_anomaly_mad
    from retail_sales_etl_spark.plans.advanced import (
        q_equidepth_order_values,
        q_order_value_percentiles,
    )

    exact = {
        r["order_priority"]: r
        for r in q_order_value_percentiles(spark, sf_dir).collect()
    }
    approx = q_order_value_percentiles(spark, sf_dir, approx=True)
    assert approx.columns == ["order_priority", "p50", "p90", "p99", "n_orders"]
    for r in approx.collect():
        e = exact[r["order_priority"]]
        assert r["n_orders"] == e["n_orders"]
        for c in ("p50", "p90", "p99"):
            assert abs(r[c] - e[c]) <= 0.05 * e[c], (r["order_priority"], c)

    eq_exact = q_equidepth_order_values(spark, sf_dir)
    eq_approx = q_equidepth_order_values(spark, sf_dir, approx=True)
    assert eq_approx.columns == eq_exact.columns
    n = sum(r["n_orders"] for r in eq_exact.collect())
    counts = [r["n_orders"] for r in eq_approx.collect()]
    assert sum(counts) == n  # every order lands in exactly one bucket
    # near-equi-depth: no bucket more than 2x its fair share off
    assert max(counts) <= 2 * (n / len(counts) + 1)

    mad_exact = q_events_anomaly_mad(spark, sf_dir)
    mad_approx = q_events_anomaly_mad(spark, sf_dir, approx=True)
    assert mad_approx.columns == mad_exact.columns
    em = {r["event_type"]: r for r in mad_exact.collect()}
    for r in mad_approx.collect():
        e = em[r["event_type"]]
        assert r["n_events"] == e["n_events"]
        assert abs(r["median_value"] - e["median_value"]) <= max(
            0.05 * abs(e["median_value"]), 1e-6
        )


def test_bm25_topk_is_take_ordered_and_filters_before_agg(spark, sf_dir):
    """BM25's final top-k must plan as a distributed TakeOrdered (no
    global sort of the scored set), and the query-term filter must land
    before the (doc, term) grid aggregates."""
    from retail_sales_etl_spark.operators.text import q_bm25_retrieval

    plan = _formatted_plan(q_bm25_retrieval(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.split("TakeOrderedAndProject")[0]


def test_round8_operators_broadcast_their_small_sides(spark, sf_dir):
    """The round-8 operators' small sides must broadcast: containment's
    eval gram set, top-p's bucket verdict, and PQ's codebook/ADC table —
    a SortMergeJoin on any of them would shuffle the corpus on a key it
    never needs to shuffle on."""
    from retail_sales_etl_spark.operators.sampling import q_mix_top_p_quality
    from retail_sales_etl_spark.operators.similarity import q_ann_pq_topk
    from retail_sales_etl_spark.operators.text import (
        q_decontaminate_containment,
    )

    plan = _formatted_plan(q_decontaminate_containment(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    plan = _formatted_plan(q_mix_top_p_quality(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    plan = _formatted_plan(q_ann_pq_topk(spark, sf_dir))
    # ADC lookup table and codebook joins broadcast; the final top-k is
    # a TakeOrdered, not a global sort
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_pq_codebook_init_is_takeordered_not_corpus_window_sort(spark, sf_dir):
    """The PQ seed codebook must come from a distributed TakeOrdered
    over the corpus (orderBy vec_id + limit K), NOT a row_number window
    partitioned by subspace over the full exploded (vec_id x sub) grid
    — that shape sorts the whole corpus inside each of the M window
    partitions before training even starts."""
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.similarity import (
        _as_double_array,
        _pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double_array("embedding").alias("v")
    )
    codebook, _ = _pq_train(emb)
    plan = _formatted_plan(codebook)
    assert "TakeOrderedAndProject" in plan
    # the only window left ranks the K seed rows (post-limit, K=16),
    # never a partition-by-subspace pass over the exploded corpus
    assert "partitionBy=[sub" not in plan.replace(" ", "")


def test_dsir_bucket_table_broadcasts_and_cut_is_takeordered(spark, sf_dir):
    """dsir_select's scale posture: the DSIR_BUCKETS-row count/log-ratio
    tables join back onto the gram grid as broadcasts (never a
    SortMergeJoin of the corpus against metadata), and the final top-k
    cut is a distributed TakeOrdered, not a global sort."""
    from retail_sales_etl_spark.operators.sampling import q_dsir_select

    plan = _formatted_plan(q_dsir_select(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_ppm_pipeline_is_shuffle_free_and_column_pruned(spark, sf_dir):
    """The synthesize->decode PPM pipeline is two chained mapInPandas
    over the scan — zero Exchange — and the scan reads ONLY doc_id (the
    payload is generated, not carried)."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_ppm_resize,
        q_multimodal_ppm_stats,
    )

    for q in (q_multimodal_ppm_stats, q_multimodal_ppm_resize):
        plan = _formatted_plan(q(spark, sf_dir))
        assert "Exchange" not in plan, q.__name__
        assert "ReadSchema: struct<doc_id:bigint>" in plan, q.__name__


def test_hard_negatives_routes_broadcast_foreign_cells(spark, sf_dir):
    """hard_negatives keeps the batch-IVF shape: centroid routing and
    the probe set join as broadcasts (one cell-keyed corpus join, no
    SortMergeJoin anywhere)."""
    from retail_sales_etl_spark.operators.similarity import q_hard_negatives

    plan = _formatted_plan(q_hard_negatives(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_rp_project_is_shuffle_free(spark, sf_dir):
    """embedding_rp_project is a pure scan-transform: 512 +- terms in
    whole-stage codegen, ZERO Exchange anywhere in the plan."""
    from retail_sales_etl_spark.operators.similarity import (
        q_embedding_rp_project,
    )

    plan = _formatted_plan(q_embedding_rp_project(spark, sf_dir))
    assert "Exchange" not in plan
    # formatted mode marks codegen stages with a '*' prefix
    assert "* Project" in plan


def test_dedup_spans_no_window_no_cartesian(spark, sf_dir):
    """dedup_spans must never global-sort or pair up the token grid:
    no Window operator (the gram grid is built map-side from
    sequence+slice), no cartesian/nested-loop join (the dup-hash set
    joins by key), and the rebuild collapses to doc grain."""
    from retail_sales_etl_spark.operators.text import q_dedup_spans

    plan = _formatted_plan(q_dedup_spans(spark, sf_dir))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ewma_window_join_is_on_daily_grid_not_raw_events(spark, sf_dir):
    """events_ewma's weighted range join runs over the (type, day)
    grid: the raw-event aggregate must appear BELOW the self-join in
    the plan (i.e. the join inputs are HashAggregate outputs), and
    the only Window is the row_number over the daily grid."""
    from retail_sales_etl_spark.operators.events import q_events_ewma

    plan = _formatted_plan(q_events_ewma(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # BOTH join inputs must be aggregate outputs: in the formatted
    # tree, at least two HashAggregate nodes print BELOW the first
    # Join line (the root-side final aggregate prints above it, so a
    # raw-event join would leave at most one below).
    tree = plan.split("(1) Scan")[0]
    join_pos = tree.index("Join")
    assert tree[join_pos:].count("HashAggregate") >= 2, tree


def test_shard_serpentine_window_is_bucket_partitioned(spark, sf_dir):
    """The only doc-side window must be PARTITIONED by the length
    bucket (the two-phase global rank); an unpartitioned window over
    documents would be the single-partition global sort the operator
    exists to avoid. The grid-side cumulative window is unpartitioned
    by design but runs over the bounded bucket grid."""
    from retail_sales_etl_spark.operators.sampling import q_shard_serpentine

    plan = _formatted_plan(q_shard_serpentine(spark, sf_dir))
    import re

    # every row_number window spec carries a partition key
    for m in re.finditer(r"row_number\(\)[^\n]*", plan):
        assert "n_chars" in m.group(0), m.group(0)
    # the offsets grid joins back via broadcast, not a shuffled join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_vocab_oov_and_bpe_broadcast_their_tiny_sides(spark, sf_dir):
    """The constant-size vocab (OOV) and the 1-row best-pair (BPE)
    must broadcast; a shuffled join against them would move the whole
    word grid per round."""
    from retail_sales_etl_spark.operators.text import (
        q_bpe_merge_rounds,
        q_vocab_oov_rate,
    )

    plan = _formatted_plan(q_vocab_oov_rate(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    plan = _formatted_plan(q_bpe_merge_rounds(spark, sf_dir))
    # 3 rounds -> 3 broadcast merges of the 1-row best pair
    assert plan.count("BroadcastNestedLoopJoin") >= 3
    assert "SortMergeJoin" not in plan
    # the argmax is a TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_source_minhash_sketch_is_partial_aggregated(spark, sf_dir):
    """The per-source min-sketch must partial-combine map-side (the
    mergeability claim): a HashAggregate appears below the exchange,
    and the pair join runs on the tiny sketch grid (broadcast)."""
    from retail_sales_etl_spark.operators.dedup import (
        q_source_minhash_jaccard,
    )

    plan = _formatted_plan(q_source_minhash_jaccard(spark, sf_dir))
    assert "partial_min" in plan or plan.count("HashAggregate") >= 2
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_part_abc_prefix_sum_windows_are_band_partitioned(spark, sf_dir):
    """The part-side running-sum window must be PARTITIONED by the
    revenue band (two-phase prefix-sum); only the bounded band grid
    may see an unpartitioned window. The offsets join back broadcast."""
    import re

    from retail_sales_etl_spark.plans.analytics import q_part_abc_classes

    plan = _formatted_plan(q_part_abc_classes(spark, sf_dir))
    # every part-grain running-sum window carries the band key;
    # windowspecs appear as "windowspecdefinition(band, ...)" or
    # "windowspecdefinition(... band#N ...)"
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs, "expected window specs in plan"
    part_windows = [s for s in specs if "rev" in s]
    assert all("band" in s for s in part_windows), part_windows
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_customer_rfm_no_global_ntile_ranks_are_band_partitioned(spark, sf_dir):
    """RFM quartiles must come from the two-phase banded rank, never a
    global ntile: no ntile in the plan, every row_number window spec
    carries the band partition key (only the bounded band grids may
    see an unpartitioned cumulative window), and the offsets grids
    join back broadcast."""
    import re

    from retail_sales_etl_spark.plans.behavioral import q_customer_rfm

    plan = _formatted_plan(q_customer_rfm(spark, sf_dir))
    assert "ntile" not in plan, "global ntile window reappeared"
    specs = [s for s in re.findall(r"row_number\(\)[^\n]*", plan)]
    assert specs, "expected row_number window specs in plan"
    assert all("band" in s for s in specs), specs
    assert "BroadcastHashJoin" in plan
    # single-fact-pass shape (r12): orders is scanned ONCE — the
    # banded customer aggregate persists and every grid/rank branch
    # reads the cache, not a re-aggregated fact
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "InMemoryTableScan" in plan


def test_graph_assortativity_broadcasts_degree_table(spark, sf_dir):
    """Both endpoint-degree joins onto the directed edge list must be
    map-side broadcasts (deg is |V| rows, bounded by distinct parts);
    a shuffled join would move the edge list twice."""
    from retail_sales_etl_spark.operators.graph import q_graph_assortativity

    plan = _formatted_plan(q_graph_assortativity(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2


def test_doc_length_lorenz_rank_is_band_partitioned(spark, sf_dir):
    """The Lorenz rank must be the two-phase banded form: every
    row_number window spec carries the band key (no global sort over
    documents), offsets and totals join back broadcast."""
    import re

    from retail_sales_etl_spark.operators.profiling import q_doc_length_lorenz

    plan = _formatted_plan(q_doc_length_lorenz(spark, sf_dir))
    specs = re.findall(r"row_number\(\)[^\n]*", plan)
    assert specs, "expected row_number window specs"
    assert all("band" in s for s in specs), specs
    assert "BroadcastHashJoin" in plan


def test_new_grid_operators_have_no_global_windows(spark, sf_dir):
    """events_autocorr and embedding_matryoshka_qc reduce via joins +
    map-combinable aggregates only — no window operator (a global
    window over events or pairs would be the single-partition sort
    these shapes avoid), no cartesian product."""
    from retail_sales_etl_spark.operators.events import q_events_autocorr
    from retail_sales_etl_spark.operators.similarity import (
        q_embedding_matryoshka_qc,
    )

    for q in (q_events_autocorr, q_embedding_matryoshka_qc):
        plan = _formatted_plan(q(spark, sf_dir))
        assert "Window" not in plan, q.__name__
        assert "CartesianProduct" not in plan, q.__name__


def test_pack_efficiency_windows_are_shard_partitioned(spark, sf_dir):
    """The only windows are the packer's per-source cumsums — every
    window spec must carry the source shard key."""
    import re

    from retail_sales_etl_spark.operators.text import q_pack_efficiency_report

    plan = _formatted_plan(q_pack_efficiency_report(spark, sf_dir))
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs, "expected the packer's cumsum window"
    assert all("source" in s for s in specs), specs


def test_attribution_and_markov_eval_windows_are_bounded(spark, sf_dir):
    """attribution_position's only windows partition by purchase id
    (fan-out bounded by the 30-min window); markov_next_event_eval's
    only window partitions by user (the pair emit) and its prediction
    table joins back broadcast — no global window, no cartesian."""
    import re

    from retail_sales_etl_spark.operators.events import (
        q_attribution_position,
        q_markov_next_event_eval,
    )

    plan = _formatted_plan(q_attribution_position(spark, sf_dir))
    assert "CartesianProduct" not in plan
    for spec in re.findall(r"windowspecdefinition\([^)]*\)", plan):
        assert "p_id" in spec, spec

    plan = _formatted_plan(q_markov_next_event_eval(spark, sf_dir))
    assert "CartesianProduct" not in plan
    for spec in re.findall(r"windowspecdefinition\([^)]*\)", plan):
        assert "user_id" in spec, spec
    assert "BroadcastHashJoin" in plan


def test_phash_hamming_counts_on_grid_not_doc_pairs(spark, sf_dir):
    """The Hamming-1 pair census must never join at document grain:
    the only join is the bit-direction probe between two copies of the
    <= 4096-row (phash, n) bucket grid — both sides AGGREGATES, the
    partner side broadcast. A doc-grain probe join (the r11 shape)
    materializes C(n,2) rows per bucket and dies at 100x."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_phash_hamming,
    )

    import re

    plan = _formatted_plan(q_multimodal_phash_hamming(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 1
    # the census collapses docs to the hash grid BEFORE the join, and
    # the grid persists: ONE corpus scan feeds the cache, both join
    # inputs read InMemoryTableScan (a shuffle-side and a broadcast-
    # side exchange can't be unified by ReuseExchange otherwise)
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 4
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "InMemoryTableScan" in plan
    # the join keys are hash-grid keys, never document ids
    keys = re.search(r"Left keys \[1\]: \[(\w+)", plan)
    assert keys and keys.group(1).startswith("partner"), plan[:2000]


def test_changepoint_window_runs_on_day_grid_only(spark, sf_dir):
    """revenue_changepoint's prefix-sum window must consume the
    day-grid AGGREGATE, never order-grain rows: exactly one parquet
    scan (the grid persists; the totals side reads the cache), a
    HashAggregate below the window, and a TakeOrdered (never a global
    Sort) for the argmax."""
    import re

    from retail_sales_etl_spark.operators.profiling import (
        q_revenue_changepoint,
    )

    plan = _formatted_plan(q_revenue_changepoint(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "InMemoryTableScan" in plan
    # the day-grid aggregate (partial+final) sits below the window
    assert "Window" in plan
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 2
    # orders scan is pruned to the two needed columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderdate" in read_schema and "o_totalprice" in read_schema
    assert "o_custkey" not in read_schema


def test_brand_elasticity_broadcasts_dim_and_single_agg_pass(spark, sf_dir):
    """brand_price_elasticity: part dim broadcast (2-column pruned),
    no SortMergeJoin, and the whole regression is ONE aggregation pass
    (partial+final HashAggregate pair) over the joined fact."""
    import re

    from retail_sales_etl_spark.plans.analytics import (
        q_brand_price_elasticity,
    )

    plan = _formatted_plan(q_brand_price_elasticity(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    part_scan = [
        seg.splitlines()[0]
        for seg in plan.split("ReadSchema:")[1:]
        if "p_brand" in seg.splitlines()[0]
    ]
    assert part_scan and all("p_retailprice" not in s for s in part_scan)
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) == 2


def test_mix_source_reliability_corpus_never_shuffles(spark, sf_dir):
    """mix_source_reliability: the doc-grain keep decision is a
    map-side filter after a BROADCAST join of the tiny source-rate
    grid — the corpus itself must not hash-partition (the only
    exchanges feed the source-grid aggregates and broadcasts)."""
    from retail_sales_etl_spark.operators.sampling import (
        q_mix_source_reliability,
    )

    import re

    plan = _formatted_plan(q_mix_source_reliability(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    # every hashpartitioning exchange keys on source (grid aggs), never
    # doc_id — formatted mode prints the keys in the node's Arguments
    keys = re.findall(r"hashpartitioning\((\w+)", plan)
    assert keys, plan  # the source-grid aggregate must shuffle once
    assert all(k.startswith("source") for k in keys), keys


def test_wav_frames_pipeline_is_shuffle_free_and_column_pruned(spark, sf_dir):
    """The synthesize->parse->frame WAV chain is chained mapInPandas
    over the scan — zero Exchange, payload bytes never shuffle — and
    the scan reads ONLY doc_id (the payload is generated in-executor,
    not carried)."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_wav_frames,
    )

    plan = _formatted_plan(q_multimodal_wav_frames(spark, sf_dir))
    assert "Exchange" not in plan
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_cohort_ltv_single_scan_customer_partitioned_windows(spark, sf_dir):
    """cohort_ltv: exactly one orders scan pruned to the three needed
    columns; the cohort-month window partitions by customer (never a
    global window over the fact) and the cumulative/size windows
    partition by cohort over the tiny grid; no join anywhere."""
    import re

    from retail_sales_etl_spark.plans.behavioral import q_cohort_ltv

    plan = _formatted_plan(q_cohort_ltv(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_custkey" in read_schema and "o_orderdate" in read_schema
    assert "o_totalprice" in read_schema and "o_orderkey" not in read_schema
    # every window partitions: cohort assignment by customer, the
    # cumulative/size windows by cohort — no unpartitioned window
    specs = re.findall(r"windowspecdefinition\((\w+)", plan)
    assert specs, plan
    assert all(s.startswith(("o_custkey", "cohort_m")) for s in specs), specs
    # the fact-grain aggregate keeps its map-side partial combine
    # below the first exchange (whale customers collapse to their
    # months BEFORE any shuffle): detail blocks are numbered leaf-up,
    # so the partial HashAggregate must sit at number n with its
    # Exchange at exactly n+1, and that exchange must key on the
    # (customer, month) grain
    agg_nums = {int(m) for m in re.findall(r"\((\d+)\) HashAggregate", plan)}
    exch = {
        int(m.group(1)): m.group(2)
        for m in re.finditer(r"\((\d+)\) Exchange[\s\S]*?Arguments: ([^\n]*)", plan)
    }
    fact_exchanges = [
        n for n, args in exch.items()
        if "o_custkey" in args and "mkey" in args
    ]
    assert fact_exchanges, exch
    assert all(n - 1 in agg_nums for n in fact_exchanges), (
        agg_nums,
        fact_exchanges,
    )


def test_runs_test_windows_on_day_grid_only(spark, sf_dir):
    """revenue_runs_test: one pruned orders scan (the persisted day
    grid feeds both the median and the flip window), the lag window
    consumes the grid aggregate, and the median side re-reads the
    cache instead of re-scanning."""
    import re

    from retail_sales_etl_spark.operators.profiling import (
        q_revenue_runs_test,
    )

    plan = _formatted_plan(q_revenue_runs_test(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "InMemoryTableScan" in plan
    assert "Window" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderdate" in read_schema and "o_totalprice" in read_schema
    assert "o_custkey" not in read_schema


def test_ivf_balance_qc_broadcast_centroids_no_smj(spark, sf_dir):
    """embedding_ivf_balance_qc must keep the production assignment
    shape: centroid table broadcast into the argmax (never a
    SortMergeJoin), census aggregated map-side to the cell grid."""
    import re

    from retail_sales_etl_spark.operators.similarity import (
        q_embedding_ivf_balance_qc,
    )

    plan = _formatted_plan(q_embedding_ivf_balance_qc(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 4


def test_dedup_sink_probe_joins_broadcast_batch_side(spark):
    """The incremental dedup sinks' index-probe joins must PIN the
    batch side as the broadcast build side: at ingest scale the
    maintained index holds rows for every doc ever ingested, and an
    optimizer falling back to SortMergeJoin would re-shuffle that
    full index EVERY micro-batch. Both sinks' partner-pair plans must
    be BroadcastHashJoins building on the batch frame (the left
    input — so BuildRight must never appear) with ZERO shuffle
    Exchange anywhere (BroadcastExchange only)."""
    import re

    from retail_sales_etl_spark.streaming.events import (
        _lsh_partner_pairs,
        _phash_partner_pairs,
    )

    bands = spark.createDataFrame(
        [(10, 0, "k0"), (10, 1, "k1")],
        "doc_id long, band_idx int, band_key string",
    )
    seen_bands = spark.createDataFrame(
        [(1, 0, "k0")], "doc_id long, band_idx int, band_key string"
    )
    hashed = spark.createDataFrame([(10, 5)], "doc_id long, phash long")
    probes = spark.createDataFrame(
        [(10, 5), (10, 4)], "doc_id long, probe long"
    )
    seen_hashes = spark.createDataFrame([(1, 5)], "doc_id long, phash long")
    for pairs in (
        _lsh_partner_pairs(bands, seen_bands),
        _phash_partner_pairs(probes, hashed, seen_hashes),
    ):
        plan = _formatted_plan(pairs)
        assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 2
        assert "SortMergeJoin" not in plan
        assert "BuildRight" not in plan  # index side never builds
        assert not re.search(r"\(\d+\) Exchange\b", plan)  # no shuffle


def test_profile_orders_approx_has_no_expand(spark, sf_dir):
    """profile_orders' scale mode must swap the nine exact
    count_distincts — which plan an Expand replicating every fact row
    once per distinct-counted column into the shuffle (~10x) — for
    HLL++ sketches: no Expand node, schema unchanged, null counts
    exact, distinct counts within sketch tolerance. The exact form
    keeps its Expand and stays the oracle-parity default."""
    from retail_sales_etl_spark.plans.etl_queries import q_profile_orders

    exact = q_profile_orders(spark, sf_dir)
    approx = q_profile_orders(spark, sf_dir, approx=True)
    assert "Expand" in _formatted_plan(exact)
    assert "Expand" not in _formatted_plan(approx)
    assert approx.schema == exact.schema
    e = {r["column_name"]: r for r in exact.collect()}
    a = {r["column_name"]: r for r in approx.collect()}
    assert set(a) == set(e)
    for col, er in e.items():
        assert a[col]["n_nulls"] == er["n_nulls"]
        assert a[col]["n_rows"] == er["n_rows"]
        # HLL++ default relative error is 5%; allow slack on tiny sets
        assert abs(a[col]["n_distinct"] - er["n_distinct"]) <= max(
            3, 0.1 * er["n_distinct"]
        )


def test_heaps_fit_windows_are_banded_not_global(spark, sf_dir):
    """The Heaps-fit cumulative sums must run banded: the per-doc
    running-sum window is PARTITIONED by band (never a corpus-wide
    unpartitioned ordering over the doc grain), the band-offset window
    runs on the tiny band grid behind a broadcast join, and the final
    OLS is one partial-aggregating pass."""
    from retail_sales_etl_spark.operators.text import q_text_heaps_fit

    import re

    plan = _formatted_plan(q_text_heaps_fit(spark, sf_dir))
    # the doc-grain running sum is PARTITIONED by the band key (the
    # physical Window node's partition list), never a corpus-wide
    # unpartitioned ordering over doc_id
    assert re.search(
        r"windowspecdefinition\(band#\d+L, doc_id#\d+L ASC", plan
    ), plan[:2000]
    # the only other windows are the band-grid offset cumsums —
    # ordered over the bounded band grid, nothing else
    specs = re.findall(r"windowspecdefinition\((\w+)", plan)
    assert specs and all(s == "band" for s in specs), specs
    # the band offsets reach the doc grain via a broadcast join
    assert plan.count("BroadcastHashJoin") >= 1
    assert "HashAggregate" in plan


def test_rake_topk_is_take_ordered_and_doc_windows(spark, sf_dir):
    """RAKE's final cut must be a distributed TakeOrdered (orderBy +
    limit), never a global Sort; the run-segmentation window is
    per-document (partitioned), never corpus-wide."""
    import re

    from retail_sales_etl_spark.operators.text import q_rake_keywords

    plan = _formatted_plan(q_rake_keywords(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert not re.search(r"Window.*partitionBy=\[\]", plan), (
        "corpus-wide unpartitioned window in RAKE plan"
    )


def test_wav_resample_pipeline_is_shuffle_free_and_column_pruned(spark, sf_dir):
    """The resample chain (synthesize -> decode -> decimate -> stats)
    must stay one zero-Exchange mapInPandas pipeline reading only
    doc_id — payload bytes never shuffle (the codec-family contract)."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_wav_resample,
    )

    plan = _formatted_plan(q_multimodal_wav_resample(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_theil_sen_approx_partial_combines_no_exact_percentile(spark, sf_dir):
    """revenue_theil_sen approx=True: both medians must be the
    partial-combining approx_percentile sketch (no exact percentile
    buffering the 2.9M-slope set on one reducer); schema identical to
    the exact form; slope within the sketch tolerance of exact."""
    from retail_sales_etl_spark.operators.profiling import (
        q_revenue_theil_sen,
    )

    exact_df = q_revenue_theil_sen(spark, sf_dir)
    approx_df = q_revenue_theil_sen(spark, sf_dir, approx=True)
    assert exact_df.schema == approx_df.schema
    exact_plan = _formatted_plan(exact_df)
    approx_plan = _formatted_plan(approx_df)
    assert "approx_percentile" not in exact_plan
    assert "percentile" in exact_plan
    assert "approx_percentile" in approx_plan
    assert "percentile(" not in approx_plan.replace("approx_percentile(", "")
    e, a = exact_df.first(), approx_df.first()
    assert (e.n_days, e.n_pairs) == (a.n_days, a.n_pairs)
    assert abs(e.slope_cents_per_day - a.slope_cents_per_day) <= max(
        1.0, abs(e.slope_cents_per_day) * 0.05
    )


def test_png_pipeline_is_shuffle_free_and_column_pruned(spark, sf_dir):
    """The PNG chain (synthesize -> inflate -> unfilter -> stats) must
    stay one zero-Exchange mapInPandas pipeline reading only doc_id —
    payload bytes never shuffle (the codec-family contract)."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_png_stats,
    )

    plan = _formatted_plan(q_multimodal_png_stats(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_png_resize_pipeline_is_shuffle_free_and_column_pruned(spark, sf_dir):
    """The PNG resize chain (synthesize -> inflate -> unfilter -> NN
    kernel) must stay one zero-Exchange mapInPandas pipeline reading
    only doc_id — payload bytes never shuffle (the codec-family
    contract)."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_png_resize,
    )

    plan = _formatted_plan(q_multimodal_png_resize(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_gif_pipeline_is_shuffle_free_and_column_pruned(spark, sf_dir):
    """The GIF chain (synthesize -> LZW decode -> palette sums) must
    stay one zero-Exchange mapInPandas pipeline reading only doc_id —
    payload bytes never shuffle (the codec-family contract)."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_gif_stats,
    )

    plan = _formatted_plan(q_multimodal_gif_stats(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_rake_by_source_windows_partitioned_and_pruned(spark, sf_dir):
    """Per-source RAKE: the run-segmentation window is per-document
    and the top-k window per-source — no unpartitioned window anywhere
    (both grids are bounded); the documents scan reads only the three
    needed columns."""
    import re

    from retail_sales_etl_spark.operators.text import (
        q_rake_keywords_by_source,
    )

    plan = _formatted_plan(q_rake_keywords_by_source(spark, sf_dir))
    assert not re.search(r"Window.*partitionBy=\[\]", plan), (
        "unpartitioned window in per-source RAKE plan"
    )
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema and "n_chars" not in read_schema


def test_periodogram_grid_bounded_and_column_pruned(spark, sf_dir):
    """The periodogram folds the CALENDAR-BOUNDED day grid (the only
    window is the rank over the <=29-row period spectrum, after two
    partial-combining aggregates); the orders scan reads only the two
    needed columns and the fact is aggregated to the day grid before
    the explode fans it out 29x."""
    from retail_sales_etl_spark.operators.profiling import (
        q_revenue_periodogram,
    )

    plan = _formatted_plan(q_revenue_periodogram(spark, sf_dir))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderdate" in read_schema and "o_totalprice" in read_schema
    assert "o_comment" not in read_schema
    # one partial-combining agg per stage: day grid, fold, spectrum
    assert plan.count("HashAggregate") >= 4
    # the 29-row rank window is the plan's only Window node (each node
    # prints once in the tree and once in the detail section)
    assert plan.count(") Window") == 1


def test_burstiness_window_per_user_and_pruned(spark, sf_dir):
    """Burstiness: the lag window is per-user (bounded by one user's
    activity), the aggregate partial-combines, and the events scan
    reads only (ts, user_id)."""
    import re

    from retail_sales_etl_spark.operators.events import (
        q_events_burstiness,
    )

    plan = _formatted_plan(q_events_burstiness(spark, sf_dir))
    assert not re.search(r"Window.*partitionBy=\[\]", plan)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "user_id" in read_schema
    assert "props" not in read_schema and "value" not in read_schema
    assert "HashAggregate" in plan


def test_mattr_windows_bounded_and_pruned(spark, sf_dir):
    """MATTR: both windows (per-(doc, token) lag; per-doc max) are
    partitioned — never corpus-wide — and the documents scan reads
    only (doc_id, text); the tokens x windows pair grid is never
    materialized (no join in the plan — the contribution is
    closed-form per token)."""
    import re

    from retail_sales_etl_spark.operators.text import q_text_mattr

    plan = _formatted_plan(q_text_mattr(spark, sf_dir))
    assert not re.search(r"Window.*partitionBy=\[\]", plan)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "source" not in read_schema
    assert "Join" not in plan


def test_gif_resize_pipeline_is_shuffle_free_and_column_pruned(spark, sf_dir):
    """The GIF resize chain must stay one zero-Exchange mapInPandas
    pipeline reading only doc_id (the codec-family contract)."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_gif_resize,
    )

    plan = _formatted_plan(q_multimodal_gif_resize(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_gap_memory_windows_per_user_and_pruned(spark, sf_dir):
    """Gap memory: both lag windows are per-user, the aggregate
    partial-combines, the events scan reads only (ts, user_id)."""
    import re

    from retail_sales_etl_spark.operators.events import (
        q_events_gap_memory,
    )

    plan = _formatted_plan(q_events_gap_memory(spark, sf_dir))
    assert not re.search(r"Window.*partitionBy=\[\]", plan)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "user_id" in read_schema and "props" not in read_schema
    assert "HashAggregate" in plan


def test_tga_pipeline_is_shuffle_free_and_column_pruned(spark, sf_dir):
    """The TGA chain (synthesize -> RLE decode -> channel sums) must
    stay one zero-Exchange mapInPandas pipeline reading only doc_id —
    payload bytes never shuffle (the codec-family contract)."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_tga_stats,
    )

    plan = _formatted_plan(q_multimodal_tga_stats(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_leadtime_profile_broadcasts_dim_and_prunes_scans(spark, sf_dir):
    """supplier_leadtime_profile: the supplier dim joins BROADCAST
    (never a shuffle of the per-supplier grid), the lineitem scan
    reads only the 3 needed columns, and the per-supplier aggregate
    exists (exact percentile buffers are per-group, not global)."""
    from retail_sales_etl_spark.plans.analytics import (
        q_supplier_leadtime_profile,
    )

    plan = _formatted_plan(q_supplier_leadtime_profile(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    li_schema = next(
        seg.splitlines()[0]
        for seg in plan.split("ReadSchema:")[1:]
        if "l_suppkey" in seg.splitlines()[0]
    )
    assert "l_quantity" not in li_schema and "l_extendedprice" not in li_schema
    assert "SortAggregate" in plan or "ObjectHashAggregate" in plan


def test_user_gaps_partial_window_per_user_and_combines(spark):
    """The streaming gap-moment partial: the lag window is per-user
    (bounded by one user's batch activity — never an unpartitioned
    window), and the per-user moments partial-combine map-side."""
    import re

    from retail_sales_etl_spark.streaming.events import _gap_stats_partial

    from pyspark.sql import functions as F

    batch = spark.createDataFrame(
        [(1, "2020-01-01 00:00:00")], "user_id bigint, ts string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    plan = _formatted_plan(_gap_stats_partial(batch))
    assert not re.search(r"Window.*partitionBy=\[\]", plan)
    assert "HashAggregate" in plan


def test_tga_resize_pipeline_is_shuffle_free_and_column_pruned(spark, sf_dir):
    """The TGA resize chain must stay one zero-Exchange mapInPandas
    pipeline reading only doc_id (the codec-family contract)."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_tga_resize,
    )

    plan = _formatted_plan(q_multimodal_tga_resize(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_mtld_pipeline_is_shuffle_free_and_column_pruned(spark, sf_dir):
    """text_mtld's sequential per-doc walk must stay one zero-Exchange
    mapInPandas pipeline reading only (doc_id, text) — the documented
    genuinely-sequential carve-out keeps the codec family's plan
    shape: embarrassingly parallel, nothing corpus-wide."""
    from retail_sales_etl_spark.operators.text import q_text_mtld

    plan = _formatted_plan(q_text_mtld(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "source" not in read_schema and "lang" not in read_schema


def test_ico_pipeline_is_shuffle_free_and_column_pruned(spark, sf_dir):
    """The ICO chain (synthesize -> directory walk -> masked sums)
    must stay one zero-Exchange mapInPandas pipeline reading only
    doc_id — payload bytes never shuffle (the codec-family contract)."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_ico_stats,
    )

    plan = _formatted_plan(q_multimodal_ico_stats(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_ico_resize_is_shuffle_free_and_column_pruned(spark, sf_dir):
    """multimodal_ico_resize: synthesize -> seek -> per-image NN
    sample through the AND mask stays one zero-Exchange mapInPandas
    pipeline reading only doc_id — the resize family's contract that
    payload bytes never shuffle holds for the container codec too."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_ico_resize,
    )

    plan = _formatted_plan(q_multimodal_ico_resize(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_ccf_and_hurst_grid_bounded_and_column_pruned(spark, sf_dir):
    """orders_revenue_ccf and revenue_hurst: the fact collapses to the
    day grid in one scan reading only (o_orderdate, o_totalprice);
    every window is partitioned (per scale x block / none needed);
    aggregates partial-combine. The lag join and the scale explode
    live on the bounded grid, never on raw fact rows."""
    import re

    from retail_sales_etl_spark.operators.profiling import (
        q_orders_revenue_ccf,
        q_revenue_hurst,
    )

    for q in (q_orders_revenue_ccf, q_revenue_hurst):
        plan = _formatted_plan(q(spark, sf_dir))
        read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
        assert "o_orderdate" in read_schema
        assert "o_orderpriority" not in read_schema
        assert "o_custkey" not in read_schema
        assert "HashAggregate" in plan
    plan = _formatted_plan(q_revenue_hurst(spark, sf_dir))
    assert not re.search(r"Window.*partitionBy=\[\]", plan)


def test_ks_drift_windows_per_supplier_and_pruned(spark, sf_dir):
    """leadtime_drift_ks: the ECDF cumulative windows are per-supplier
    (bounded by a supplier's distinct lead days — never unpartitioned),
    the fact collapses to the count grid before any window, and the
    lineitem scan reads only the 3 needed columns."""
    import re

    from retail_sales_etl_spark.plans.analytics import q_leadtime_drift_ks

    plan = _formatted_plan(q_leadtime_drift_ks(spark, sf_dir))
    assert not re.search(r"Window.*partitionBy=\[\]", plan)
    li_schema = next(
        seg.splitlines()[0]
        for seg in plan.split("ReadSchema:")[1:]
        if "l_suppkey" in seg.splitlines()[0]
    )
    assert "l_quantity" not in li_schema and "l_discount" not in li_schema
    assert "HashAggregate" in plan


def test_chi2_grid_bounded_and_column_pruned(spark, sf_dir):
    """chi2_source_lang: the corpus collapses to categorical grids in
    one scan reading only (source, lang); the dense grid is a cross
    join of the TINY marginals; aggregates partial-combine."""
    from retail_sales_etl_spark.operators.text import q_chi2_source_lang

    plan = _formatted_plan(q_chi2_source_lang(spark, sf_dir))
    schemas = [
        seg.splitlines()[0] for seg in plan.split("ReadSchema:")[1:]
    ]
    assert any("source" in s and "lang" in s for s in schemas)
    assert all("text" not in s and "n_chars" not in s for s in schemas)
    assert "HashAggregate" in plan


def test_hour_uniformity_grid_bounded_and_pruned(spark, sf_dir):
    """events_hour_uniformity: one shuffle to the (user, hour) grid,
    map-combinable per-user aggregate, scan pruned to (user_id, ts)."""
    from retail_sales_etl_spark.operators.events import (
        q_events_hour_uniformity,
    )

    plan = _formatted_plan(q_events_hour_uniformity(spark, sf_dir))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "user_id" in read_schema
    assert "props" not in read_schema and "value" not in read_schema
    assert "HashAggregate" in plan


def test_wav_silence_pipeline_is_shuffle_free_and_column_pruned(
    spark, sf_dir
):
    """The WAV silence chain must stay one zero-Exchange mapInPandas
    pipeline reading only doc_id (the codec-family contract)."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_wav_silence,
    )

    plan = _formatted_plan(q_multimodal_wav_silence(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_rich_club_windows_on_bounded_degree_grids(spark, sf_dir):
    """copurchase_rich_club: the suffix-count windows run over the
    BOUNDED degree histograms (distinct degree values), never the
    edge list; the threshold joins are grid x grid; no cartesian
    blowup beyond the bounded grids."""
    from retail_sales_etl_spark.operators.graph import (
        q_copurchase_rich_club,
    )

    plan = _formatted_plan(q_copurchase_rich_club(spark, sf_dir))
    assert "HashAggregate" in plan
    li_schema = next(
        seg.splitlines()[0]
        for seg in plan.split("ReadSchema:")[1:]
        if "l_partkey" in seg.splitlines()[0]
    )
    assert "l_quantity" not in li_schema


def test_daily_peaks_grid_bounded_and_pruned(spark, sf_dir):
    """events_daily_peaks: the stream collapses to the day grid in
    one scan reading only ts; the lag/lead window is the documented
    calendar-bounded exempt class."""
    from retail_sales_etl_spark.operators.events import (
        q_events_daily_peaks,
    )

    plan = _formatted_plan(q_events_daily_peaks(spark, sf_dir))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "ts" in read_schema
    assert "props" not in read_schema and "user_id" not in read_schema
    assert "HashAggregate" in plan


def test_doc_novelty_single_gram_shuffle_and_pruned(spark, sf_dir):
    """doc_novelty: grams dedup map-side per doc (array_distinct
    before the explode), exactly ONE gram-keyed exchange (the global
    first-occurrence min), scan pruned to (doc_id, text)."""
    from retail_sales_etl_spark.operators.text import q_doc_novelty

    plan = _formatted_plan(q_doc_novelty(spark, sf_dir))
    assert plan.count("hashpartitioning(g#") <= 2  # min agg + rejoin
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "source" not in read_schema
    assert "Cartesian" not in plan


def test_hhi_broadcasts_dims_and_prunes_scan(spark, sf_dir):
    """nation_supplier_hhi: supplier/nation join BROADCAST, the fact
    collapses to the (nation, supplier) grid in one aggregate, scan
    pruned to the three needed lineitem columns."""
    from retail_sales_etl_spark.plans.analytics import (
        q_nation_supplier_hhi,
    )

    plan = _formatted_plan(q_nation_supplier_hhi(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    li_schema = next(
        seg.splitlines()[0]
        for seg in plan.split("ReadSchema:")[1:]
        if "l_suppkey" in seg.splitlines()[0]
    )
    assert "l_shipdate" not in li_schema and "l_quantity" not in li_schema
    assert "HashAggregate" in plan


def test_embedding_drift_grid_bounded_and_column_pruned(spark, sf_dir):
    """embedding_drift_mmd: the only O(n) stage is the map-side
    flatten with partial aggregation (HashAggregate before the
    exchange carries (label, i, j) grid partials, never raw terms);
    the label-pair joins live on the bounded moment grid — no
    cartesian product, per-label counts broadcast; the scan reads
    only (label, embedding)."""
    from retail_sales_etl_spark.operators.similarity import (
        q_embedding_drift_mmd,
    )

    plan = _formatted_plan(q_embedding_drift_mmd(spark, sf_dir))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "label" in read_schema and "embedding" in read_schema
    assert "vec_id" not in read_schema
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan
    assert "BroadcastHashJoin" in plan


def test_mann_kendall_grid_bounded_and_column_pruned(spark, sf_dir):
    """revenue_mann_kendall: the fact collapses to the day grid in one
    scan reading only (o_orderdate, o_totalprice); the O(grid^2) pair
    space lives on the BROADCAST grid (the theil_sen plan shape) — no
    shuffle ever carries pair rows — and the tie groups are one
    grid-bounded aggregate."""
    from retail_sales_etl_spark.operators.profiling import (
        q_revenue_mann_kendall,
    )

    plan = _formatted_plan(q_revenue_mann_kendall(spark, sf_dir))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderdate" in read_schema and "o_totalprice" in read_schema
    assert "o_custkey" not in read_schema
    assert "HashAggregate" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_qoi_pipelines_are_shuffle_free_and_column_pruned(spark, sf_dir):
    """The QOI chains (synthesize -> stateful chunk walk -> stats /
    NN resize) stay zero-Exchange mapInPandas pipelines reading only
    doc_id — the codec-family contract on the eighth codec."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_qoi_resize,
        q_multimodal_qoi_stats,
    )

    for q in (q_multimodal_qoi_stats, q_multimodal_qoi_resize):
        plan = _formatted_plan(q(spark, sf_dir))
        assert "Exchange" not in plan
        read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
        assert "doc_id" in read_schema and "text" not in read_schema


def test_text_readability_is_shuffle_free_and_pruned(spark, sf_dir):
    """text_readability: doc-grain in, doc-grain out — zero Exchange,
    all regexp/length expressions codegen'd, scan reads only
    (doc_id, text)."""
    from retail_sales_etl_spark.operators.text import q_text_readability

    plan = _formatted_plan(q_text_readability(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "source" not in read_schema


def test_jpeg_pipeline_is_shuffle_free_and_column_pruned(spark, sf_dir):
    """The synthesize->decode JPEG pipelines are two chained
    mapInPandas over the scan — zero Exchange, payload bytes never
    shuffle — and the scan reads ONLY doc_id (payload is generated)."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_jpeg_resize,
        q_multimodal_jpeg_stats,
    )

    for q in (q_multimodal_jpeg_stats, q_multimodal_jpeg_resize):
        plan = _formatted_plan(q(spark, sf_dir))
        assert "Exchange" not in plan, q.__name__
        assert "ReadSchema: struct<doc_id:bigint>" in plan, q.__name__


def test_session_tails_partial_window_per_user(spark):
    """The streaming session-survival partial: the within-batch
    sessionize windows (lag + running sum + per-user max) are ALL
    per-user — bounded by one user's batch activity, never an
    unpartitioned window over the batch."""
    import re

    from pyspark.sql import functions as F

    from retail_sales_etl_spark.streaming.events import _batch_sessions

    batch = spark.createDataFrame(
        [(1, "2020-01-01 00:00:00")], "user_id bigint, ts string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    plan = _formatted_plan(_batch_sessions(batch))
    assert not re.search(r"Window.*partitionBy=\[\]", plan)


def test_session_tails_probe_reads_file_pruned(spark, tmp_path, monkeypatch):
    """After the maintenance cycle Z-orders the tails by user_id, the
    next batch's prior-tail probe must read the pinned snapshot
    through stats-pruned read_where_in and OPEN strictly fewer files
    than the state holds (the user_gaps file-open bound applied to the
    session-tail state)."""
    from pyspark.sql import functions as F

    from retail_sales_etl_spark.load import lakehouse as lh
    from retail_sales_etl_spark.streaming import events as streaming_events

    tails = str(tmp_path / "tails")
    grid = str(tmp_path / "grid")
    users = spark.range(160).select(
        F.col("id").alias("user_id"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
    )
    for b in range(4):
        batch = users.filter((F.col("user_id") % 4) == b)
        assert streaming_events.session_tails_sink(
            batch, b, tails, grid
        ) is True
    lh.LakehouseTable(spark, tails).optimize(
        target_files=40, zorder_by=["user_id"]
    )
    live = lh.LakehouseTable(spark, tails).read().inputFiles()
    assert len(live) >= 20  # clustered into many narrow-range files

    opened = []
    orig = lh.LakehouseTable.read_where_in

    def spy(self, column, values, version=None):
        df = orig(self, column, values, version=version)
        opened.append((column, len(df.inputFiles())))
        return df

    monkeypatch.setattr(lh.LakehouseTable, "read_where_in", spy)
    nxt = spark.createDataFrame(
        [(3, 10_000), (1000, 10_001)], "user_id bigint, s bigint"
    ).select("user_id", F.timestamp_seconds(F.col("s")).alias("ts"))
    assert streaming_events.session_tails_sink(nxt, 4, tails, grid) is True
    probes = [o for o in opened if o[0] == "user_id"]
    assert probes, "prior-tail probe did not go through read_where_in"
    assert probes[0][1] <= 4 < len(live), (probes[0][1], len(live))


def test_jpeg_exif_pipeline_is_shuffle_free_and_column_pruned(spark, sf_dir):
    """The EXIF chain (synthesize -> APP1 splice -> TIFF walk) must
    stay one zero-Exchange mapInPandas pipeline reading only doc_id
    (the codec-family contract) — metadata extraction never shuffles
    payload bytes."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_jpeg_exif,
    )

    plan = _formatted_plan(q_multimodal_jpeg_exif(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_flac_pipeline_is_shuffle_free_and_column_pruned(spark, sf_dir):
    """The FLAC chain (synthesize -> bit-level decode) must stay one
    zero-Exchange mapInPandas pipeline reading only doc_id (the
    codec-family contract)."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_flac_stats,
    )

    plan = _formatted_plan(q_multimodal_flac_stats(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_copurchase_sink_appends_deltas_without_prior_grid_probe(
    spark, tmp_path, monkeypatch
):
    """Delta-append contract: each batch lands its pair partials as an
    append-only commit — NO probe of the prior grid (neither
    read_where_in nor a merge rewrite), totals fold on read, and the
    aggregating compaction re-bounds live rows to one per key with
    identical totals."""
    from pyspark.sql import functions as F

    from retail_sales_etl_spark.load import lakehouse as lh
    from retail_sales_etl_spark.streaming import events as streaming_events

    pairs = str(tmp_path / "pairs")
    items = str(tmp_path / "items")
    # 4 batches x 40 orders, each order a 2-item basket on a distinct
    # part range -> a wide pair grid; plus one hot recurring pair so
    # delta rows genuinely accumulate across batches
    for b in range(4):
        rows = []
        for o in range(40):
            key = b * 100 + o
            rows.append((key, key * 2 + 100))
            rows.append((key, key * 2 + 101))
        rows.append((b * 100 + 40, 6))
        rows.append((b * 100 + 40, 7))
        batch = spark.createDataFrame(
            rows, "l_orderkey bigint, l_partkey bigint"
        )
        assert streaming_events.copurchase_sink(
            batch, b, pairs, items
        ) is True

    probed = []
    orig = lh.LakehouseTable.read_where_in

    def spy(self, column, values, version=None):
        probed.append((self.path, column))
        return orig(self, column, values, version=version)

    monkeypatch.setattr(lh.LakehouseTable, "read_where_in", spy)
    nxt = spark.createDataFrame(
        [(10_000, 6), (10_000, 7)], "l_orderkey bigint, l_partkey bigint"
    )
    assert streaming_events.copurchase_sink(nxt, 4, pairs, items) is True
    pair_probes = [p for p in probed if p[0] == pairs]
    assert not pair_probes, pair_probes
    # every pair-grid commit is an append (no merge rewrites)
    ops = [
        e["operation"] for e in lh.LakehouseTable(spark, pairs).history()
    ]
    assert set(ops) == {"append"} and len(ops) == 5
    # read-time totals fold the hot pair's 5 delta rows
    pair_tot, _ = streaming_events._copurchase_grid_totals(
        spark, pairs, items
    )
    got = {(r.a_part, r.b_part): r.n_orders for r in pair_tot.collect()}
    assert got[(6, 7)] == 5
    raw = lh.LakehouseTable(spark, pairs).read()
    assert raw.filter("a_part = 6 AND b_part = 7").count() == 5
    # aggregating compaction re-bounds to one live row per key,
    # totals identical
    streaming_events._aggregate_compact(
        spark, pairs, ["a_part", "b_part"],
        [F.sum("n_orders").cast("bigint").alias("n_orders")],
    )
    compacted = lh.LakehouseTable(spark, pairs).read()
    assert compacted.filter("a_part = 6 AND b_part = 7").count() == 1
    pair_tot2, _ = streaming_events._copurchase_grid_totals(
        spark, pairs, items
    )
    assert {
        (r.a_part, r.b_part): r.n_orders for r in pair_tot2.collect()
    } == got


def test_flac_fixed_pipeline_is_shuffle_free_and_column_pruned(spark, sf_dir):
    """The FIXED/rice FLAC chain must stay one zero-Exchange
    mapInPandas pipeline reading only doc_id (the codec-family
    contract)."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_flac_fixed_stats,
    )

    plan = _formatted_plan(q_multimodal_flac_fixed_stats(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_flac_lpc_pipeline_is_shuffle_free_and_column_pruned(spark, sf_dir):
    """The LPC FLAC chain must stay one zero-Exchange mapInPandas
    pipeline reading only doc_id (the codec-family contract)."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_flac_lpc_stats,
    )

    plan = _formatted_plan(q_multimodal_flac_lpc_stats(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_jpeg_gps_pipeline_is_shuffle_free_and_column_pruned(spark, sf_dir):
    """The GPS chain must stay one zero-Exchange mapInPandas pipeline
    reading only doc_id (the codec-family contract)."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_jpeg_gps,
    )

    plan = _formatted_plan(q_multimodal_jpeg_gps(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_flac_stereo_pipeline_is_shuffle_free_and_column_pruned(spark, sf_dir):
    """The stereo-decorrelation FLAC chain must stay one zero-Exchange
    mapInPandas pipeline reading only doc_id (the codec-family
    contract)."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_flac_stereo_stats,
    )

    plan = _formatted_plan(q_multimodal_flac_stereo_stats(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_exif_oriented_resize_is_shuffle_free_and_column_pruned(spark, sf_dir):
    """The orientation-applied resize chain must stay one
    zero-Exchange mapInPandas pipeline reading only doc_id (the
    codec-family contract)."""
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_exif_oriented_resize,
    )

    plan = _formatted_plan(q_multimodal_exif_oriented_resize(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" not in read_schema
