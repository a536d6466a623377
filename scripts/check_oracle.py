#!/usr/bin/env python
"""Run the full oracle-differential corpus in one process and print a
pass/fail line per query. Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from high_energy_gamma_ray_search_in_kascade_array_data_spark import get_spark  # noqa: E402
from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus  # noqa: E402
from tests.oracle_utils import compare_frames, duckdb_con  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    spark = get_spark("oracle_check")
    con = duckdb_con(sf_dir)
    n_fail = 0
    for name, q in sorted(corpus().items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"ROWS {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s, rows-only)")
            continue
        try:
            oracle_pdf = con.execute(q.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = compare_frames(spark_pdf, oracle_pdf)
        if problems:
            print(f"FAIL {name}: {problems[:3]}")
            n_fail += 1
        elif len(spark_pdf) == 0:
            print(f"WARN {name}: 0 rows (matches oracle, but weak)")
        else:
            print(f"ok   {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
