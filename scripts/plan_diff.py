#!/usr/bin/env python
"""Plan-strategy diff between two scale factors (r8 VERDICT task 1).

sf1 is where broadcast thresholds (the 16 MB dim policy) and AQE
re-planning actually change behavior. For every headline query this
script captures the physical plan at BOTH fixtures, extracts the
join-strategy / aggregate / exchange skeleton, and reports queries
whose skeleton CHANGED — the review surface for "no broadcast→SMJ
flips unexplained". AQE-final strategies are captured by running the
query first (count) and then reading the re-optimized plan.

Usage: python scripts/plan_diff.py [sf_a] [sf_b] [out.md]
Defaults: /root/testdata/sf0.1  /tmp/scale10x  PLAN_DIFF_SF1.md
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_A = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
SF_B = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale10x"
OUT = sys.argv[3] if len(sys.argv) > 3 else "PLAN_DIFF_SF1.md"

STRATS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Exchange",
    "BroadcastExchange",
    "TakeOrderedAndProject",
    "Sort ",
    "Window",
)


def skeleton(plan: str) -> Counter:
    c: Counter = Counter()
    for strat in STRATS:
        n = len(re.findall(re.escape(strat), plan))
        if strat == "Exchange":
            n -= plan.count("BroadcastExchange")  # don't double-count
        if n:
            c[strat.strip()] = n
    return c


def main() -> int:
    from high_energy_gamma_ray_search_in_kascade_array_data_spark import get_spark
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.plans.audit import physical_plan
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus

    import bench

    spark = get_spark("plan_diff")
    spark.sparkContext.setLogLevel("ERROR")
    reg = corpus()
    names = [n for n in bench.HEADLINE if n in reg]
    diffs: list[tuple[str, Counter, Counter]] = []
    same = 0
    errors: list[str] = []
    for name in names:
        try:
            da = reg[name].fn(spark, SF_A)
            da.count()  # AQE re-optimizes during execution
            pa = skeleton(physical_plan(da))
            db = reg[name].fn(spark, SF_B)
            db.count()
            pb = skeleton(physical_plan(db))
        except Exception as e:  # noqa: BLE001
            errors.append(f"{name}: {str(e)[:200]}")
            continue
        if pa == pb:
            same += 1
        else:
            diffs.append((name, pa, pb))
            print(f"DIFF {name}: {dict(pa)} -> {dict(pb)}", flush=True)
    lines = [
        "# PLAN_DIFF — physical-strategy skeleton, sf0.1 vs sf1 (10× fixture)",
        "",
        f"date: {datetime.now(timezone.utc).strftime('%Y-%m-%dT%H:%MZ')}  "
        f"a: {SF_A}  b: {SF_B}  queries: {len(names)}  identical: {same}  "
        f"changed: {len(diffs)}  errors: {len(errors)}",
        "",
        "Skeleton = counts of join strategies, aggregate modes, exchanges,",
        "sorts, windows in the AQE-final physical plan. A changed skeleton",
        "is not automatically wrong — AQE is SUPPOSED to re-plan with data",
        "size — but every broadcast→SMJ flip must be explainable by a side",
        "outgrowing the broadcast threshold, not by a lost hint.",
        "",
    ]
    for name, pa, pb in diffs:
        keys = sorted(set(pa) | set(pb))
        delta = ", ".join(f"{k}: {pa.get(k, 0)}→{pb.get(k, 0)}" for k in keys if pa.get(k, 0) != pb.get(k, 0))
        lines.append(f"- **{name}** — {delta}")
    if not diffs:
        lines.append("No skeleton changes — every headline query keeps its strategy at sf1.")
    if errors:
        lines += ["", "## Errors", ""] + [f"- {e}" for e in errors]
    with open(OUT, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"\n{len(diffs)} changed, {same} identical → {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
