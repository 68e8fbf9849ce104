"""Regenerate PLANS.md: formatted physical plans for flagship queries.

Run: python scripts/dump_plans.py  (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from retail_sales_etl_spark.plans import registry  # noqa: E402
from retail_sales_etl_spark.session import get_spark  # noqa: E402

SHOWCASE = [
    ("star_flagship", "full star join: broadcast dims, single fact shuffle"),
    ("q1_pricing_summary", "pushed scan filter + partial/final decimal aggregation"),
    ("sales_fact", "pure projection: column-pruned scan, zero shuffle"),
    ("events_sessionize", "one shuffle on user_id, windows within partitions"),
    ("dedup_minhash_lsh", "shingle explode -> signature agg -> band bucket join"),
    ("ann_ivf_topk", "centroid routing + in-cluster top-k, broadcast query"),
    ("bucketed_fact_join", "co-bucketed scans -> SortMergeJoin with no Exchange on either side"),
    ("events_interval_join", "user-keyed equi-join, time band as join filter"),
    ("sample_stratified", "map-side-only hash-threshold filter, zero shuffle"),
    ("dedup_semantic", "broadcast-argmax cell assignment -> ONE per-cell pandas kernel"),
    ("kmeans_centroids", "3 unrolled Lloyd rounds: broadcast centroids + (cell,dim) shuffle each"),
    ("decontaminate_ngram", "map-side gram dedup, broadcast eval probe, one doc_id shuffle"),
    ("setsim_join", "prefix-filtered candidate join: rarest-first slices, never all-pairs"),
    ("triangle_count", "degree-oriented wedge join over a checkpointed edge list"),
    ("bloom_pruned_revenue", "broadcast bloom map filters the fact BELOW the semi-join exchange"),
    ("events_session_native", "built-in session_window: one partial-merging aggregate, no window sort"),
    ("skyline_orders", "bucket suffix-max prune map-side, quadratic check on survivors only"),
    ("heavy_hitters", "Arrow MG candidates -> broadcast semi-join recount, key grid never shuffled"),
    ("kmeans_sampled_assign", "fixed-size TakeOrdered sample -> Lloyd -> one broadcast assignment pass"),
    ("dsir_select", "1024-row bucket tables broadcast onto the gram grid, TakeOrdered weight cut"),
    ("hard_negatives", "broadcast foreign-cell routing, one cell-keyed corpus join"),
    ("multimodal_ppm_stats", "zero-Exchange synthesize->decode mapInPandas chain, doc_id-only scan"),
    ("shard_serpentine", "two-phase global rank: bounded band-grid offsets + band-partitioned window"),
    ("part_abc_classes", "two-phase global PREFIX-SUM: band offsets broadcast + in-band running sum"),
    ("ann_ivf_pq_topk", "IVF-routed inverted lists restrict the PQ/ADC coded scan before re-rank"),
    ("hybrid_rrf_retrieval", "two k-row member rankings fused by one full-outer join"),
    ("bpe_merge_rounds", "3 unrolled merge rounds on the word-count grid, 1-row TakeOrdered argmax each"),
    ("source_minhash_jaccard", "map-combinable min sketch, |sources|^2 pair grid, corpus never re-shuffled"),
    ("session_km_survival", "session rollup -> all KM windows on the bounded duration grid"),
    ("events_pattern_match", "one user-keyed shuffle to symbol strings, map-side regexes, 1-row report"),
    ("customer_rfm", "ONE persisted fact pass: grouping-sets band grids, 3 chained band-partitioned rank windows"),
    ("doc_length_lorenz", "two-phase banded length rank -> exact rank-weighted Gini, no global sort"),
    ("fuzzy_prefix_match", "PassJoin candidates on (block, segment, shifted-window) keys, exact levenshtein last"),
    ("quality_logistic_newton", "3 Newton rounds: scan -> 5-number aggregate -> 1-row broadcast, no collect"),
    ("embedding_top_pc", "power iteration: 1-row iterate array broadcast, map-side fold dot + 64-group agg"),
    ("revenue_theil_sen", "fact collapses to the day grid; O(grid^2) pair space broadcast-joined on the grid"),
    ("supplier_projection_stats", "capped bipartite pair join co-partitioned on part, hubs excluded + counted"),
    ("multimodal_phash_dedup", "map-side Arrow decode -> only 12-bit hashes shuffle -> bucket census"),
    ("multimodal_phash_hamming", "pair census closed-form on the <=4096-row bucket grid: 13 probe dirs, 1 broadcast join"),
    ("multimodal_bmp_stats", "zero-Exchange BMP synthesize->decode mapInPandas chain, stride/flip/BGR in-executor"),
    ("multimodal_wav_stats", "zero-Exchange RIFF/WAVE synthesize->decode chain, chunk walk + signed PCM in-executor"),
    ("revenue_changepoint", "fact collapses to the persisted day grid; prefix-sum window on grid rows, TakeOrdered argmax"),
    ("brand_price_elasticity", "broadcast 2-column part dim, ONE map-combinable aggregate to the 25-brand grid of OLS sums"),
    ("revenue_hurst", "fact -> dense day grid; cum/stat windows per (scale, block) partition <= 256 rows; 9-dp decimal log-log fit"),
    ("leadtime_drift_ks", "orderkey co-partition join -> (supplier, lead-day, half) count grid; per-supplier ECDF windows; INTEGER KS argmax"),
    ("supplier_leadtime_profile", "co-partition fact join -> per-supplier exact-percentile buffers; broadcast supplier dim after the collapse"),
    ("copurchase_rich_club", "degree histograms + DESC suffix windows; O(K+D) interval fill serves every threshold, no per-k edge scan"),
    ("doc_novelty", "map-side per-doc gram dedup -> ONE gram-keyed min shuffle -> doc rollup; vocabulary-bounded"),
    ("multimodal_tga_stats", "zero-Exchange RLE-TGA synthesize->decode chain: packet framing, origin flip, ID skip in-executor"),
    ("multimodal_ico_stats", "zero-Exchange ICO container walk: seeked directory entries, doubled-height masks, opaque-only sums"),
    ("text_mtld", "zero-Exchange mapInPandas sequential factor walk per doc (the genuinely-sequential carve-out)"),
    ("mix_source_reliability", "source-grid rates broadcast back; doc keep decision map-side, corpus never shuffles"),
    ("multimodal_wav_frames", "zero-Exchange frame-grain feature extraction; frame chop + ZCR in-executor, integer-only gate"),
    ("cohort_ltv", "map-side (customer,month) combine -> customer-partitioned cohort window -> tiny cohort grid"),
    ("revenue_runs_test", "persisted day grid feeds median + flip window; closed-form z on a 1-row aggregate"),
    ("embedding_ivf_balance_qc", "broadcast-centroid argmax assignment -> map-combinable census to the cell grid"),
]


def main() -> None:
    spark = get_spark(app_name="dump-plans", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    sf_dir = "/root/testdata/sf0.01"

    lines = [
        "# Physical plans (generated by scripts/dump_plans.py at sf0.01)",
        "",
        "What to look for: `PushedFilters` on every scan, `ReadSchema`",
        "limited to referenced columns, `BroadcastHashJoin` for dimension",
        "sides, partial `HashAggregate` before each `Exchange`.",
        "",
    ]
    for name, why in SHOWCASE:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        plan = plan.strip()
        # iterative operators (power iteration, unrolled Lloyd) produce
        # multi-thousand-line plans; the showcase point is the SHAPE of
        # the first rounds, so cap each section
        plan_lines = plan.splitlines()
        if len(plan_lines) > 400:
            plan_lines = plan_lines[:400] + [
                f"... ({len(plan.splitlines()) - 400} more lines — "
                "later unrolled rounds repeat the same shape)"
            ]
        lines += [
            f"## {name}", "", f"_{why}_", "", "```",
            "\n".join(plan_lines), "```", "",
        ]

    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
