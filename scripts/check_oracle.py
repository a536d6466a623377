#!/usr/bin/env python
"""Run the full oracle-differential corpus in one process and print a
pass/fail line per query. Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]

Comparison is DRIVER-GRADE by default: after the tolerant
``compare_frames`` diagnostic pass, every query must also pass
``exact_hash_problems`` — the byte-level, signed-zero-sensitive
order-insensitive comparison that mirrors the driver's CORRECTNESS
value hash. A query that prints ``ok`` here hashes green in the
driver. Pass ``--tolerant`` to skip the exact gate (debugging only).

Additionally any float cell that is bitwise ``-0.0`` in either
engine's output is reported as ``SIGNED-ZERO`` — even when both sides
currently agree, a negative zero in a rounded aggregate column marks
the summation-order-flaky class that cost round 3 its one red driver
row (VERDICT r3 "What's wrong" #1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from high_energy_gamma_ray_search_in_kascade_array_data_spark import get_spark  # noqa: E402
from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus  # noqa: E402
from tests.oracle_utils import (  # noqa: E402
    compare_frames,
    duckdb_con,
    exact_hash_problems,
)


def _neg_zero_cols(pdf: pd.DataFrame) -> list[str]:
    """Column names holding at least one bitwise -0.0 float cell."""
    out = []
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_float_dtype(s.dtype):
            v = s.dropna().astype("float64").to_numpy()
            if len(v) and bool(np.any((v == 0.0) & np.signbit(v))):
                out.append(c)
    return out


def main() -> int:
    tolerant = "--tolerant" in sys.argv[1:]
    families: set[str] = set()
    args: list[str] = []
    for a in sys.argv[1:]:
        if a == "--tolerant":
            continue
        if a.startswith("--families="):
            # family = substring of the registering module's basename,
            # e.g. --families=streaming,sources_multimodal
            families = set(a.split("=", 1)[1].split(","))
            continue
        args.append(a)
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    # Guard against vacuous runs: a typo'd / unsupported selector (e.g.
    # "--only=a,b") would otherwise match nothing and print "0 failures"
    # for a sweep that checked zero queries.
    unknown = only - set(corpus())
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        return 2
    spark = get_spark("oracle_check")
    con = duckdb_con(sf_dir)
    n_fail = 0
    n_warn = 0
    for name, q in sorted(corpus().items()):
        if only and name not in only:
            continue
        if families:
            mod = q.fn.__module__.rsplit(".", 1)[-1]
            if not any(f in mod for f in families):
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
            continue
        if not tolerant:
            hash_problems = exact_hash_problems(spark_pdf, oracle_pdf)
            if hash_problems:
                print(f"HASH-FAIL {name}: {hash_problems[:2]}")
                n_fail += 1
                continue
        nz = sorted(set(_neg_zero_cols(spark_pdf)) | set(_neg_zero_cols(oracle_pdf)))
        if nz:
            print(f"SIGNED-ZERO {name}: -0.0 present in cols {nz} (flaky-sign risk)")
            n_warn += 1
        if len(spark_pdf) == 0:
            print(f"WARN {name}: 0 rows (matches oracle, but weak)")
        else:
            grade = "tolerant" if tolerant else "exact-hash"
            print(f"ok   {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s, {grade})")
    print(f"\n{n_fail} failures, {n_warn} signed-zero warnings")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
