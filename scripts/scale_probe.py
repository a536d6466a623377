#!/usr/bin/env python
"""Scaling-linearity probe: replicate the sf0.1 fixture 10x into a
scratch dir (ids offset per replica so key cardinalities scale too),
run a representative slice of the headline queries at both scales on
the same local[32] session, and report the wall-clock ratio per query.

A shuffle-bound plan whose cost is ~linear in rows should show a ratio
near 10 (or below it, when fixed JVM/codegen overhead dominates the
sf0.1 time); a super-linear ratio flags a plan that would NOT survive
the next 100x — the same signal that caught rotate_grid_wide's
quadratic CollapseProject inlining. Results are recorded in SCALE.md.

Usage: python scripts/scale_probe.py [--rebuild]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from high_energy_gamma_ray_search_in_kascade_array_data_spark import get_spark  # noqa: E402
from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus  # noqa: E402
from high_energy_gamma_ray_search_in_kascade_array_data_spark.sources.catalog import load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
# Parameterized so the same builder serves the 10x tier (default), the
# round-5 100x tier (SPARK_GRAFT_SCALE_REPLICAS=100, ~1.6 GB of
# parquet: lineitem 60M rows, events 10M, documents 500k) and the
# round-6 30x tail probe. SPARK_GRAFT_SCALE_BASE picks the comparison
# tier (e.g. the 10x fixture, so a 30x run reports the 3x-data ratio).
DST = os.environ.get("SPARK_GRAFT_SCALE_DST", "/tmp/scale10x")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))
BASE = os.environ.get("SPARK_GRAFT_SCALE_BASE", SRC)

# (table, id columns to offset per replica so cardinality scales)
TABLES = {
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "partsupp": ["ps_partkey"],
    "nation": [],
    "region": [],
}

PROBE_QUERIES = [
    "survival_curve",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "sessionize_events",
    "heavy_hitters_exact_recount",
    "two_phase_exact_percentile",
    "interval_coalesce_islands",
    "minhash_lsh_neardup_fast",
    "dedup_exact",
    "cosine_topk",
    "stat_corr_covar_suffstats",
    "compaction_binpack_plan",
]


def build(spark) -> None:
    for table, id_cols in TABLES.items():
        src_path = f"{SRC}/{table}.parquet"
        if not os.path.exists(src_path):
            continue
        df = load_table(spark, SRC, table)
        if not id_cols:
            # FIXED-CARDINALITY dims (nation/region): a real higher SF
            # keeps them at 25/5 rows — replicating them N× duplicated
            # every key N times and MULTIPLIED every join through them
            # by N (q7 at 30x: orders⋈customer⋈nation = 135M rows,
            # li⋈…⋈supplier⋈nation = 4.5B — the "super-linear q5/q7"
            # the r5/r6 probes recorded was THIS fixture artifact, not
            # a plan property).  Copy them through verbatim, once.
            df.write.mode("overwrite").parquet(f"{DST}/{table}.parquet")
            print(f"built {table} x1 (fixed-cardinality dim)", flush=True)
            continue
        offsets = {c: df.agg(F.max(c)).first()[0] + 1 for c in id_cols}
        parts = []
        for i in range(REPLICAS):
            rep = df
            for c, off in offsets.items():
                rep = rep.withColumn(c, F.col(c) + F.lit(i * off))
            if table == "documents" and i > 0:
                # Replica texts must be DISTINCT content, not clones:
                # suffixing every token makes replica i share zero
                # shingles with replica j — "10 crawl shards" with the
                # original dup/near-dup structure inside each shard.
                # Verbatim replication instead makes 90% of the corpus
                # exact clones, which drives any exact prefix-filter
                # similarity join quadratic (41M candidate pairs, >56GB
                # in the oracle engine at 10x — SCALE.md round-5
                # record): a data-distribution pathology, not a plan
                # property the sweep is supposed to measure.
                rep = rep.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"$1x{i}")
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{table}.parquet")
        print(f"built {table} x{REPLICAS}", flush=True)


def run(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    reg = corpus()
    times: dict[str, float] = {}
    for name in names:
        fn = reg[name].fn
        t0 = time.monotonic()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.monotonic() - t0, 3)
        except Exception as exc:  # fixture-shape dependent queries may not replicate
            print(f"SKIP {name}: {exc}", flush=True)
            times[name] = float("nan")
        print(f"  {name} @ {sf_dir}: {times[name]}s", flush=True)
    return times


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")] or PROBE_QUERIES
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    if "--rebuild" in sys.argv or not os.path.exists(DST):
        build(spark)
    # warm both paths once (codegen/JIT), then measure
    run(spark, BASE, names[:1])
    base = run(spark, BASE, names)
    big = run(spark, DST, names)
    b_tag, d_tag = os.path.basename(BASE.rstrip("/")), os.path.basename(DST.rstrip("/"))
    print(f"{'query':34s} {b_tag:>10s} {d_tag:>10s} {'ratio':>7s}")
    for name in names:
        r = big[name] / base[name] if base[name] else float("nan")
        print(f"{name:34s} {base[name]:10.2f} {big[name]:10.2f} {r:7.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
