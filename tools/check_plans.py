"""Battery-wide physical-plan hygiene sweep.

For every registered query (or the names given), builds the DataFrame
at the given sf dir and audits the OPTIMIZED/EXECUTED plan text for the
anti-patterns the 100 TB lens forbids:

- ``CartesianProduct`` — an unkeyed all-pairs join that slipped past a
  join condition;
- ``BatchEvalPython`` — a row-at-a-time Python UDF on the data path
  (Arrow-batched ``ArrowEvalPython`` / ``MapInPandas`` are the
  sanctioned Python boundary; per-row pickling is never);
- ``BroadcastNestedLoopJoin`` — allowed only for queries that declare
  it (a broadcast-side inequality probe against a tiny relation is
  legitimate: the rangejoin oracle fence and the brute-force
  oracle-tier constructs), flagged everywhere else.

Usage: python tools/check_plans.py [sf_dir] [query ...]

Exit 1 if any undeclared anti-pattern appears. This is the static
sibling of tools/check_determinism.py: that proves results don't
depend on the plan; this proves the plan itself stays inside the
scale rules as the battery grows.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

# queries that legitimately carry a BroadcastNestedLoopJoin: tiny-side
# inequality probes (threshold scans against one-row aggregates,
# interval refines) — each is declared here ON PURPOSE so a new
# appearance anywhere else fails the sweep.
BNLJ_ALLOWED = {
    # --- bucketized range join: tiny-side exact refine
    "promo_event_attribution",
    # --- crossJoin(broadcast(<one-row aggregate>)): scalar thresholds,
    # corpus totals, budget offsets — a 1×N nested loop is the correct
    # plan for a one-row build side
    "idle_rich_customers",
    "training_export_budget",
    "customer_rfm_segments",
    "revenue_decile_lift",
    "import_cooccurrence",
    "orders_drift_ks",
    "domain_mix_weights",
    "dsir_importance_weights",
    "bigram_lm_score",
    "bm25_search",
    "events_dau_wau",           # one-row (d0, d1) range probe
    "embedding_power_iteration",  # one-row max|y| renormalizer per iter
    "orders_dow_profile",       # one-row revenue total share divisor
    "customer_abc_classes",     # one-row total-cents class divisor
    "events_hour_heatmap",      # one-row grid-total share divisor
    "zipf_word_slope",          # one-row corpus word total
    "corpus_vocab_growth",      # 5-row checkpoint grid, <= probe
    "pps_systematic_sample",    # one-row total/step divisor
    "monthly_seasonal_index",   # one-row overall-average divisor
    "events_burst_minutes",     # one-row (n, S, S2) threshold probe
    "qty_price_grid",           # one-row grid-total share divisor
    # --- fenced brute-force / oracle-tier constructs (broadcast small
    # side with non-equi condition by design)
    "eval_ngram_contamination",
    "eval_semantic_contamination",
    "decontaminate_vs_eval",
    "cluster_safe_split",
    "split_leakage_audit",
    "cluster_purity",
    "embedding_cosine_dup",
    "repo_sketch_similarity",
    "simhash_threshold_sweep",
    "simhash_effectiveness",
    "eff_sweep_exact",
    "eff_best_threshold",
    "distance_histogram",
    # --- ANN: bounded query-side broadcast probed with inequality /
    # multi-probe conditions (query set ≪ corpus by contract)
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_ivf_kmeans_topk",
    "ann_ivf_pq_topk",
    "ann_recall_report",
    "pq_recall_report",
    "hybrid_rank_fusion",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from twinspect_spark.queries import QUERIES
    from twinspect_spark.session import get_spark

    names = sys.argv[2:] or sorted(QUERIES)
    spark = get_spark("check_plans", cores=4, shuffle_partitions=4)
    failures = 0
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 - report, don't abort
            failures += 1
            print(f"FAIL  {name}: build error {type(e).__name__}: {e}")
            continue
        problems = []
        if "CartesianProduct" in plan:
            problems.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            problems.append("BatchEvalPython (row-at-a-time UDF)")
        if (
            "BroadcastNestedLoopJoin" in plan
            and name not in BNLJ_ALLOWED
        ):
            problems.append("BroadcastNestedLoopJoin (undeclared)")
        if problems:
            failures += 1
            print(f"FAIL  {name}: {', '.join(problems)}")
        else:
            print(f"OK    {name}")
    spark.stop()
    print(f"failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
