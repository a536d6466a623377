#!/usr/bin/env python
"""Solo-warm per-query probe (guide §1.4): run the named queries in
one warm session, N reps each, timing the bench action (count).
First rep is reported separately (codegen/JIT/fixture build); the
median of the remaining reps is the warm floor.

Usage: python scripts/solo_probe.py q1 q2 ... [--reps N] [--sf DIR]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from high_energy_gamma_ray_search_in_kascade_array_data_spark import get_spark  # noqa: E402
from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
        if a.startswith("--sf="):
            sf_dir = a.split("=")[1]
    spark = get_spark("solo_probe")
    reg = corpus()
    # prime JVM + python workers
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()
    for name in args:
        if name not in reg:
            print(f"{name}: NOT IN REGISTRY")
            continue
        walls = []
        for r in range(reps):
            t0 = time.perf_counter()
            reg[name].fn(spark, sf_dir).count()
            walls.append(time.perf_counter() - t0)
        warm = statistics.median(walls[1:]) if len(walls) > 1 else walls[0]
        print(
            f"{name}: first={walls[0]:.3f}s warm_med={warm:.3f}s "
            f"all={[round(w, 3) for w in walls]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
