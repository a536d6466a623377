#!/usr/bin/env python
"""Generate PLANS.md: the formatted physical plans of the load-bearing
queries, plus the corpus-wide hygiene sweep. This is the audit trail of
the explain-and-iterate loop — the plan each query ships with is the
plan we wanted, not the first one that passed."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from high_energy_gamma_ray_search_in_kascade_array_data_spark import get_spark  # noqa: E402
from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# query -> what to look for in its plan (the property that matters at 100 TB)
SHOWCASE = {
    "survival_curve": "one event-scale exchange (partial histogram); windows on the aggregated relation",
    "q1_pricing_summary": "map-side partial aggregation before the single shuffle",
    "q5_local_supplier_volume": "nation/region hint-broadcast; SF-growing sides unhinted (auto-broadcast while small, shuffle at scale)",
    "q6_forecast_revenue": "range predicates pushed to the parquet scan; 5/11 columns read",
    "q2_min_cost_supplier": "correlated MIN decorrelated to a window over the aggregate",
    "q21_waiting_suppliers": "EXISTS/NOT-EXISTS as two grains of one aggregate, no triple self-join",
    "window_topk_per_group": "WindowGroupLimit pushed below the exchange (map-side rank limit)",
    "compact_latest_per_key": "WindowGroupLimit pushed below the exchange (map-side rank limit)",
    "cosine_topk": "TakeOrderedAndProject, not a global sort; dot product in codegen",
    "pq_adc_topk": "query→centroid table folded as plan-time literals (r9): scan → codegen projection → TakeOrdered, no join of any kind (r11: plus the conditional starved-scan spread exchange, absent on multi-split corpora)",
    "minhash_lsh_neardup_fast": "band-bucket equi-join; no cross product anywhere",
    "stat_corr_covar_suffstats": "moments as one partial-aggregated pass of integer sums",
    "cdc_merge_apply": "full-outer sort-merge on the key; changeset union stays unshuffled until the join",
    "spatial_grid_pair_histogram": "9-cell explode then cell equi-join; candidate pairs bounded by local density, no range join",
    "skyline_pareto": "bucket-partitioned range windows + broadcast prefix maxima; no single-partition global sort on the row scale",
    "global_row_index": "bucketed two-phase rank: tiny offset window, per-bucket row_number partitioned by bucket",
    "basket_pair_support": "pair self-join keyed on the basket id; intermediates bounded by basket size squared",
    "mad_outlier_events": "two keyed percentile aggregations; per-type stats broadcast back, event side shuffles only for the aggs",
    "kmeans_lloyd_integer": "assignment as centroid-literal column expression (no join, no shuffle); one partial-agg per sweep",
    "weighted_median_price": "two-phase weighted median: coarse (flag, range) mass aggregate locates the crossing; rescan of the located ranges only — no per-stratum cumsum over raw lineitem",
    "quantile_bucketize": "decile FIT via two-phase order-statistic locate (no global row_number sort); broadcast APPLY is map-side-only",
    "window_ntile": "NTILE via bucket/offset global rank (per-bucket windows + broadcast offsets), not Exchange SinglePartition",
    "distributed_gd_training": "per-epoch gradient as one map-side-combinable aggregate (the AllReduce); weights broadcast as literals",
    "distributed_adam_training": "Adam moments/bias-correction/isqrt step held driver-side; per-epoch one 4-number-per-partition aggregate",
    "hll_distinct_estimate": "mergeable 64-register sketch: one bucket-keyed max aggregate; harmonic sum as exact integers",
    "funnel_conversion_3step": "three user-keyed aggregates chained by user-keyed joins; no window over the raw fact",
    "temporal_embargo_split": "1-row cutoff aggregate broadcast back onto the scan; exact integer-microsecond boundaries",
    "feature_hashing_counts": "vocabulary-free hashing trick: polynomial char hash in codegen, one explode + one partial aggregate",
    "neardup_keep_best": "survivor selection joins the bounded verified-pair set; fact-scale exchanges stay the audited signature/band shuffles",
    "zorder_clustering_stats": "Morton interleave as shift/mask codegen; one 256-cell partial aggregate",
    "rotate_grid_wide_vec": "Arrow-batched NumPy kernel (ArrowEvalPython), scan → project, no shuffle — the HOF escape hatch (r10)",
    "bpe_encode_apply": "one token-scale groupBy; R chained JVM array folds collapse to a single vocab-scale projection (r10)",
}


HAND_MARKER = "<!-- hand-written notes below: preserved by gen_plans -->"


def main() -> int:
    spark = get_spark("gen_plans", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    reg = corpus()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    out = [
        "# PLANS — physical plans of the load-bearing queries",
        "",
        "Generated by `scripts/gen_plans.py` at sf0.001 (plan shapes are",
        "scale-invariant; AQE may re-plan exchanges at runtime). The",
        "hygiene sweep below runs over the whole corpus; per-plan",
        "assertions live in `tests/test_plans.py` / `test_plan_sweep.py`.",
        "",
    ]
    for name, why in SHOWCASE.items():
        if name not in reg:
            continue
        df = reg[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(mode)
        # keep the operator tree, drop the verbose per-node detail
        tree = plan.split("\n\n", 1)[0]
        out += [f"## {name}", "", f"*Property:* {why}", "", "```", tree, "```", ""]
    out += ["## Corpus hygiene sweep", ""]
    n_checked = flagged = 0
    side_effect = ("stream_", "npz_legacy", "partitioned_split", "ivf_partitioned")
    for name in sorted(reg):
        if name.startswith(side_effect):
            continue
        n_checked += 1
        plan = reg[name].fn(spark, SF_DIR)._jdf.queryExecution().explainString(mode)
        bad = [
            flag
            for flag, needle in (
                ("CartesianProduct", "CartesianProduct"),
                ("row-at-a-time Python", "BatchEvalPython"),
            )
            if needle in plan
        ]
        if bad and name not in ("udtf_chunk_documents", "mllib_als_recommend"):
            flagged += 1
            out.append(f"- **{name}**: {', '.join(bad)}")
    out += [
        f"",
        f"{n_checked} query plans checked; {flagged} flagged. Documented"
        f" exceptions excluded from the count: the UDTF chunker (the one"
        f" row-at-a-time surface) and mllib_als_recommend (MLlib's"
        f" recommendForAllUsers blocked cross product over the rank-4"
        f" FACTOR matrices — the all-pairs scoring IS the algorithm; see"
        f" tests/test_plan_sweep.py).",
        "",
    ]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    tail = ""
    if os.path.exists(path):
        prev = open(path).read()
        if HAND_MARKER in prev:
            tail = "\n" + prev[prev.index(HAND_MARKER):]
    with open(path, "w") as f:
        f.write("\n".join(out) + tail)
    print(f"wrote PLANS.md: {len(SHOWCASE)} showcased, {n_checked} swept, {flagged} flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
