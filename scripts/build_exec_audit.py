#!/usr/bin/env python
"""Corpus-wide driver-side BUILD vs JVM EXECUTE audit (VERDICT r10
task 3 — the memory-note lesson "loop cost is Catalyst/Py4J build, not
execution" applied to every query).

For every registry query, measure the WARM wall of the query-builder
call ``fn(spark, sf_dir)`` and split it into

  * execute — time inside DataFrame actions (collect/count/first/head/
    toPandas/localCheckpoint), i.e. JVM job execution the builder
    triggers internally (iterative loops, checkpoint barriers);
  * build  — everything else: Column construction, Py4J round-trips,
    plan analysis. This is the part that (a) does not shrink on a
    bigger cluster and (b) SERIALIZES across concurrent streams
    (GIL + Py4J), so >0.5 s of build is a multi-tenant defect even
    when the solo wall looks fine.

Build cost is scale-independent, so the audit runs at the smallest
fixture (sf0.001 default) where execute time is near-zero and the
split is sharpest. Two passes per query: pass 1 warms imports/JIT/
codegen, pass 2 measures. Writes BUILD_EXEC_AUDIT.md (top offenders +
full distribution) and prints queries whose build exceeds the bar.

Usage: python scripts/build_exec_audit.py [sf_dir] [bar_seconds]
"""

from __future__ import annotations

import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_EXEC = {"t": 0.0}


def _timed(orig):
    def wrapped(self, *a, **k):
        t0 = time.monotonic()
        try:
            return orig(self, *a, **k)
        finally:
            _EXEC["t"] += time.monotonic() - t0

    return wrapped


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    bar = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5

    # patch the CLASSIC DataFrame (the concrete class whose methods
    # instances resolve — pyspark.sql.DataFrame is only the abstract
    # base in Spark 4, and patching it is a silent no-op), plus
    # StreamingQuery.awaitTermination so streaming drains count as
    # execute, not build
    from pyspark.ml.base import Estimator
    from pyspark.sql.classic.dataframe import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter
    from pyspark.sql.streaming.query import StreamingQuery

    from high_energy_gamma_ray_search_in_kascade_array_data_spark import get_spark
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus

    for m in ("collect", "count", "first", "head", "toPandas", "localCheckpoint", "isEmpty"):
        setattr(DataFrame, m, _timed(getattr(DataFrame, m)))
    # JVM execution that bypasses DataFrame actions: streaming drains,
    # MLlib fits (Estimator.fit covers Pipeline and every JavaEstimator
    # subclass — none override it), and writer terminals (sink queries
    # execute through DataFrameWriter, not collect)
    StreamingQuery.awaitTermination = _timed(StreamingQuery.awaitTermination)
    Estimator.fit = _timed(Estimator.fit)
    for m in ("save", "parquet", "orc", "json", "csv", "text", "saveAsTable", "insertInto"):
        setattr(DataFrameWriter, m, _timed(getattr(DataFrameWriter, m)))

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    reg = corpus()

    rows: list[tuple[str, float, float, float]] = []
    for name in sorted(reg):
        fn = reg[name].fn
        try:
            df = fn(spark, sf_dir)  # pass 1: warm
            df.collect()
        except Exception as e:  # noqa: BLE001
            print(f"SKIP {name}: {type(e).__name__}: {e}", flush=True)
            continue
        # best-of-3: build cost is deterministic work — ambient noise
        # (GC pauses, box spikes) only ever ADDS, so min is the
        # estimator (the first, single-sample audit run booked a 7.7s
        # one-off GC spike to an 11-expression query)
        wall, execute = float("inf"), 0.0
        for _ in range(3):
            _EXEC["t"] = 0.0
            t0 = time.monotonic()
            fn(spark, sf_dir)
            w = time.monotonic() - t0
            if w < wall:
                wall, execute = w, _EXEC["t"]
        build = wall - execute
        rows.append((name, wall, execute, build))
        if build > bar:
            print(f"HEAVY-BUILD {name}: build={build:.2f}s execute={execute:.2f}s", flush=True)

    rows.sort(key=lambda r: -r[3])
    n_over = sum(1 for r in rows if r[3] > bar)
    total_build = sum(r[3] for r in rows)
    lines = [
        "# Driver-side build vs JVM execute — corpus audit",
        "",
        f"date: {datetime.now(timezone.utc).strftime('%Y-%m-%dT%H:%MZ')}  "
        f"fixture: {sf_dir}  queries: {len(rows)}  bar: {bar}s build",
        "",
        "`build` = warm builder wall minus time inside DataFrame actions —",
        "the Py4J/Catalyst driver-side cost that a bigger cluster cannot",
        "shrink and that serializes across concurrent streams.",
        "",
        f"- queries over the {bar}s build bar: **{n_over}**",
        f"- total corpus build time: {total_build:.1f}s "
        f"(mean {total_build / max(len(rows), 1):.3f}s/query)",
        "",
        "## Top 25 by build time",
        "",
        "| query | warm builder wall s | execute s | build s |",
        "|---|---|---|---|",
    ]
    lines += [f"| {n} | {w:.3f} | {e:.3f} | {b:.3f} |" for n, w, e, b in rows[:25]]
    lines += [
        "",
        "## Known mis-bookings",
        "",
        "- `sql_scripting_threshold_search`: the BEGIN…WHILE script's",
        "  ~40 aggregate scans execute EAGERLY inside the spark.sql()",
        "  call (measured r11: call 5.4 s, collect 0.01 s) — engine",
        "  execution this instrument cannot split out, not Py4J build.",
        "- iterative loops (bfs/bellman/kcore/bpe/training): residual",
        "  build ≈ 1 spark.sql parse + checkpoint + convergence action",
        "  per sweep (~80 ms) — the launch-bound floor of a driver-",
        "  coordinated loop, sub-linear at 100× (SCALE.md r6/r9 probes).",
    ]
    with open(os.path.join(REPO, "BUILD_EXEC_AUDIT.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines[:40]), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
