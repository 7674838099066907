"""Physical-plan audit over the query registry.

Walks every registry query's *optimized physical plan* (no execution —
``df._jdf.queryExecution().executedPlan()`` string) and flags the
anti-patterns that matter at 100 TB:

- **python-row-udf**: ``BatchEvalPython`` — a row-at-a-time Python UDF
  in the plan (Arrow ``ArrowEvalPython`` / ``FlatMapGroupsInPandas``
  etc. are allowed at codec/model boundaries and reported as info).
- **cartesian**: ``CartesianProduct`` — a non-broadcast cross join.
  Some queries are intentionally all-pairs (their names are
  allow-listed below with the reason); anything else is a defect.
- **wide-scan**: a parquet scan of the big fact tables (lineitem,
  orders, events, documents, embeddings) whose ReadSchema carries
  every column of the table — usually a missed column prune.
- **global-window**: a ``Window`` fed by ``Exchange SinglePartition``
  — a single-reducer sort. Fine over relations bounded by
  construction (a vocabulary, group-level aggregates, top-k output);
  a scale defect over anything fact-proportional (rows, users,
  documents). Every legitimate use must be allow-listed in
  GLOBAL_WINDOW_OK with the boundedness rationale; fact-proportional
  order statistics go through data/sharding.distributed_rank or the
  distinct-value-count + cumulative-weight selection instead.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
Exit code 1 if any non-allow-listed flag fires — usable as a gate.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

# queries whose plans legitimately contain a CartesianProduct
CARTESIAN_OK = {
    # the operator IS the all-pairs scoring surface (reference parity)
    "cartesian_product_scoring",
    # 1-row aggregate joined to every row (scalar broadcast by value);
    # Spark plans a 1×N cross join below the broadcast threshold
    # detection in some shapes — bounded by construction
}

# full column counts of the UNIFORM-WIDTH big tables (testdata
# schemas): a scan that reads EVERY column of one of these is a missed
# prune unless the query genuinely consumes the full row.
#
# `documents` and `embeddings` are deliberately NOT flagged: one column
# (text / embedding) carries >99% of the bytes, so a scan that also
# reads the narrow metadata columns costs ~nothing at 100 TB — and the
# shared tokenized-corpus cache (queries/_shared.py:_tokens)
# intentionally reads the full row once so 40+ text-tier queries reuse
# a single materialization. Pruning THOSE scans would multiply the
# expensive text read, not save it.
_TABLE_COLS = {
    "lineitem": 11,
    "orders": 6,
    "events": 6,
}

# queries that genuinely consume every column of a flagged table
# (full-row exports / profiling reports / schema-wide dedup)
WIDE_SCAN_OK: dict[str, set[str]] = {}

# queries whose plans legitimately contain a SinglePartition-fed Window:
# every entry names WHY the windowed relation is bounded by
# construction (does not grow with the corpus). Populated by the
# round-7 survey; additions need a rationale. Fact-proportional order
# statistics were converted instead (customer_spend_quartiles,
# time_to_convert_quantiles -> data/sharding.distributed_rank;
# data/dsir.select_top_k -> per-partition prune + bounded window).
GLOBAL_WINDOW_OK: dict[str, str] = {
    # --- distinct-VALUE / level tables (bounded by the value domain)
    "mann_whitney_shift": "window over distinct cent values of a bounded price domain",
    "propensity_stratified_ate": "quantile-boundary window over distinct per-user click counts (bounded value domain, weighted-median pattern)",
    "kaplan_meier_churn": "at-risk/survival windows over distinct lifetime hours (bounded by the observation window, not user count)",
    "heaps_law_fit": "cumulative window over the 10 fixed doc-range buckets",
    "ks_two_sample": "window over distinct cent values of a bounded price domain",
    "exact_auc": "window over the distinct score-level table (docstring: THE scale shape for AUC)",
    "pr_curve": "window over the distinct score-level table",
    "best_f1_threshold": "window over the distinct score-level table",
    "calibration_lift_table": "window over 100 fixed confidence bins / deciles",
    "qini_uplift_curve": "decile-boundary + cumulative windows over distinct per-user click-count scores, then 10 decile rows (level-table pattern)",
    "sprt_conversion_monitor": "cumulative-LLR window over days (time-bounded period relation)",
    "group_sequential_monitor": "look-index window over weeks (time-bounded look relation)",
    "cusum_daily_purchases": "running sum/min windows over days (time-bounded period relation)",
    "nelson_aalen_hazard": "at-risk/cumulative-hazard windows over distinct lifetime hours (bounded by the observation window, not user count)",
    "log_rank_churn": "at-risk windows over distinct lifetime hours (bounded by the observation window, not user count)",
    "pareto_frontier_spend": "suffix-max window over the order-count LEVEL table (bounded by per-customer order multiplicity, never customer count)",
    "ams_f2_join_size": "median-rank window over the 16 sketch replicas",
    "weekday_seasonal_outliers": "MAD cumulative-weight window over the |residual|-COUNT level table (bounded by the daily-count value domain, not day rows)",
    "neyman_allocation": "largest-remainder window over strata (event types)",
    # --- vocabulary / merge-table relations (bounded by the vocabulary)
    "vocab_coverage_curve": "occurrence-rank window over the token vocabulary",
    "bpe_encode": "merge-rank window over the trained merge table (vocab-bounded)",
    "negative_sampling_table": "unigram-CDF window over the token vocabulary",
    # --- group / domain / replica-level aggregates (bounded cardinality)
    "revenue_concentration": "Gini rank window over 25 nations",
    "unimax_allocation": "water-filling prefix window over languages",
    "token_budget_allocation": "largest-remainder window over sources",
    "domain_mix_weights": "window over source domains",
    "temperature_mix_weights": "window over source domains",
    "doremi_domain_reweight": "window over source domains",
    "quality_stratified_mix": "window over (source, quality-tercile) cells",
    "winrate_bootstrap_ci": "order-statistic window over ~100 bootstrap replica sums",
    "bootstrap_metric_ci": "order-statistic window over ~100 bootstrap replica sums",
    "lsh_parameter_plan": "window over the (bands, rows) parameter grid",
    "compaction_plan": "bin-packing prefix window over the file manifest (metadata-scale)",
    "rag_context_pack": "greedy-pack window over the per-query top-ranked chunks",
    # --- round-7 batch-14 distributional summaries
    "pareto_share_curve": "cumweight window over the distinct per-customer revenue level table (bounded value domain)",
    "cvm_two_sample": "window over distinct cent values of a bounded price domain (ks_two_sample idiom)",
    # --- round-7 batch-13 dependence/decomposition tier
    "tail_dependence_lambda": "quantile-threshold windows over the two value level tables (bounded domains)",
    "mix_rate_decomposition": "median-day window over the date level table (time-bounded)",
    "price_indices_periods": "median-day window over the date level table (time-bounded)",
    "ucb_arm_indices": "rank window over the <=10-row arm level table",
    # --- round-7 batch-12 robust-estimation tier
    "hodges_lehmann_shift": "cumweight window over the bounded pairwise-diff value domain (daily-count cross)",
    # --- round-7 batch-10 inference tier
    "auc_delong_ci": "placement windows over the distinct score-level table (pr_curve idiom)",
    # --- round-7 batch-9 nonparametric/survival tier
    "wilcoxon_signed_rank": "midrank window over distinct |diff| values (bounded count domain)",
    "cochran_q_event_types": "median window over the distinct cell-count level table (bounded count domain)",
    "runs_test_daily": "median/lag windows over day and count-value level tables (time-bounded)",
    "rmst_churn": "KM survival + lead windows over the distinct-duration hour domain",
    # --- round-7 batch-8 forecasting/eval tier
    "mcc_threshold_scan": "window over the distinct score-level table (pr_curve idiom)",
    # --- round-7 batch-7 drift tier
    "page_hinkley_drift": "running mean/min windows over days (time-bounded period relation)",
    # --- round-7 batch-6 distributional tier: value-domain level tables
    "emd_price_histogram": "CDF window over <=1000 fixed price-histogram buckets",
    "t_closeness_audit": "global-decile cumsum over a 10-row bucket level table",
    "gpd_tail_fit": "threshold-selection window over distinct dollar values of a bounded price domain",
    "bh_fdr_return_rates": "rank/step-up windows over the 25-row nation level table",
    # --- bounded candidate sets from map-side pruning
    "dsir_importance_weights": "top-k window over per-partition-pruned candidates (<= k*P rows)",
    # --- reference-parity composites: the reference's own id-map /
    # permutation semantics (scalable variant exists in operators/ids.py;
    # these reproduce redshells' exact outputs)
    "value_counts_id_map": "reference id-map parity; scalable variant operators/ids.py:65",
    "make_click_train_data": "reference composite (anti-join sampling id map)",
    "anti_join_negative_sampling": "reference composite id map",
    "make_similarity_data": "reference permutation semantics over the item dimension",
    "cross_group_negative_pairs": "reference permutation semantics over the item dimension",
    "convert_type_to_category": "reference parity: category map over distinct column values",
    "gcmc_feature_cold_start": "reference parity: GCMC id maps over users/items",
    # --- round 8: ppjoin frequency rank + level tables + sample tops
    "token_jaccard_join": "ppjoin element-frequency rank window over the token UNIVERSE (vocabulary-bounded, build_rank_sorted_sets docstring)",
    "ngram_jaccard": "ppjoin frequency rank over the bigram universe (vocabulary^2-bounded, never doc count)",
    "dedup_method_agreement": "same ppjoin frequency-rank window (bigram universe); all pair relations candidate-bounded",
    "pr_auc_exact": "cumulative TP/FP window over the distinct score-level table (exact_auc idiom)",
    "stratified_sample_exact": "largest-remainder quota window over the SEGMENT level table (5 rows)",
    "make_similarity_data_mf": "reference permutation semantics over the item dimension + top-200 cut over label-blocked sampled pairs (sample-bounded)",
    "kruskal_wallis_order_totals": "midrank window over distinct cent values of a bounded price domain (mann_whitney idiom) + 5-row group relation",
    "pettitt_changepoint_daily": "rank/cumulative-U windows over days (time-bounded period relation)",
    "catalog_coverage_topk": "popularity rank over the part DIMENSION (catalog-bounded, never fact-proportional)",
    "kendall_w_rankings": "three rankings over the 25-row nation relation",
    "feature_staleness_profile": "cumulative-weight window over the gap-SECONDS level table (bounded by the 86400s tolerance domain)",
    "cox_stuart_trend": "index window over days (time-bounded period relation)",
}


def _flag_global_windows(plan: str) -> bool:
    """True iff some Window node is fed (through its Sort) by an
    Exchange SinglePartition — the single-reducer global sort shape.
    Tree-printed plans put the window's child chain on the following
    lines at deeper indentation; 4 lines covers Window → [Project] →
    Sort → Exchange and the AQE wrapper variants."""
    lines = plan.splitlines()
    win_at = [i for i, ln in enumerate(lines) if re.search(r"\bWindow\b|\bWindowGroupLimit\b", ln)]
    for i in win_at:
        for j in range(i + 1, min(i + 5, len(lines))):
            if "Exchange SinglePartition" in lines[j]:
                return True
            # a repartitioning exchange between window and input means
            # the window is NOT single-partition
            if "Exchange hashpartitioning" in lines[j] or "Exchange rangepartitioning" in lines[j]:
                break
    return False


def _count_struct_fields(body: str) -> int:
    """Count top-level fields of a ReadSchema struct body, ignoring
    commas nested inside parameterized types like decimal(10,2) or
    array<struct<...>>."""
    depth = 0
    fields = 0
    seen = False
    for ch in body:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            fields += 1
        else:
            seen = seen or not ch.isspace()
    return fields + 1 if seen else 0


def audit_plan(name: str, plan: str) -> list[tuple[str, str]]:
    flags: list[tuple[str, str]] = []
    if "BatchEvalPython" in plan:
        flags.append(("python-row-udf", "BatchEvalPython in plan"))
    if "CartesianProduct" in plan and name not in CARTESIAN_OK:
        flags.append(("cartesian", "non-broadcast cross join"))
    if name not in GLOBAL_WINDOW_OK and _flag_global_windows(plan):
        flags.append(("global-window", "Window fed by Exchange SinglePartition"))
    for table, ncols in _TABLE_COLS.items():
        if table in WIDE_SCAN_OK.get(name, set()):
            continue
        for m in re.finditer(
            rf"{table}\.parquet[^\n]*ReadSchema: struct<((?:[^<>]|<[^<>]*>)*)>",
            plan,
        ):
            n = _count_struct_fields(m.group(1))
            if n >= ncols:
                flags.append(
                    (
                        "wide-scan",
                        f"{table} scan reads all {n} columns",
                    )
                )
    return flags


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from redshells_spark import get_spark_session
    from redshells_spark.queries import get_queries

    spark = get_spark_session(
        "plan_audit", shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = get_queries()
    names = sys.argv[2:] or list(queries)
    n_flagged = 0
    n_arrow = 0
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — report, keep walking
            print(f"{name:34s} PLAN ERROR: {exc}")
            n_flagged += 1
            continue
        if "ArrowEvalPython" in plan or "FlatMapGroupsInPandas" in plan or "MapInPandas" in plan:
            n_arrow += 1
        flags = audit_plan(name, plan)
        if flags:
            n_flagged += 1
            for kind, detail in flags:
                print(f"{name:34s} {kind:15s} {detail}")
    print(
        f"\n{len(names)} plans audited, {n_flagged} flagged, "
        f"{n_arrow} use Arrow-batch Python (allowed)"
    )
    return 1 if n_flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
