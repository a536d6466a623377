#!/usr/bin/env python
"""Memory-pressure / spill probe (round 9).

Every scale argument so far shows the HEAVY exchanges are hash-keyed
and partial-aggregated; this probe checks the remaining 100 TB failure
mode: what happens when a task's hash table does NOT fit in execution
memory. On a real cluster that is the steady state — executors run
with a few GB of execution memory against TB-scale shuffles — and the
required behavior is graceful spill-to-disk with unchanged results,
not an OOM.

Method: a fresh JVM is started with a deliberately starved unified
memory pool (``spark.memory.fraction=0.05`` of a 1200m heap ≈ 45 MB
of execution+storage shared by 4 concurrent fat tasks — 2 shuffle
partitions on local[4], the post-AQE-coalesce / skewed-key shape) and
the Spark event log enabled. The heaviest shuffle/aggregation queries of the corpus
run at sf0.1 under that pressure; each result is exact-hash compared
against the DuckDB oracle (driver-grade comparison, same machinery as
scripts/check_oracle.py). The event log is then parsed for per-task
``Memory Bytes Spilled`` / ``Disk Bytes Spilled``.

PASS means: every probed query still exact-hashes AND at least one
stage actually spilled (proving the spill path was exercised rather
than the pool never filling).

Usage: python scripts/spill_probe.py [out.txt]
Writes SPILL_PROBE.txt by default.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENTDIR = "/tmp/spillprobe_eventlog"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Heaviest shuffle/agg plans in the corpus: event-scale hash exchanges
# (LSH signature agg, 8x-inflated gram exchange, fact-scale joins,
# full-width percentile machinery).
PROBE_QUERIES = [
    "minhash_lsh_neardup",
    "substring_dedup_clean",
    "q18_large_volume",
    "trimmed_mean_robust",
    "two_phase_exact_percentile",
]


def parse_spill(event_dir: str) -> dict:
    """Aggregate spill/peak metrics per stage from the event log."""
    stages: dict[tuple, dict] = {}
    names: dict[tuple, str] = {}
    for path in glob.glob(f"{event_dir}/**", recursive=True):
        if os.path.isdir(path) or os.path.basename(path).startswith("appstatus"):
            continue
        op = gzip.open if path.endswith(".gz") else open
        with op(path, "rt", errors="replace") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if not isinstance(ev, dict):
                    continue
                if ev.get("Event") == "SparkListenerStageSubmitted":
                    si = ev["Stage Info"]
                    names[(si["Stage ID"], si["Stage Attempt ID"])] = si.get("Stage Name", "")
                elif ev.get("Event") == "SparkListenerTaskEnd":
                    key = (ev["Stage ID"], ev["Stage Attempt ID"])
                    tm = ev.get("Task Metrics") or {}
                    s = stages.setdefault(
                        key, {"tasks": 0, "mem_spill": 0, "disk_spill": 0, "peak_exec": 0}
                    )
                    s["tasks"] += 1
                    s["mem_spill"] += int(tm.get("Memory Bytes Spilled", 0) or 0)
                    s["disk_spill"] += int(tm.get("Disk Bytes Spilled", 0) or 0)
                    s["peak_exec"] = max(
                        s["peak_exec"], int(tm.get("Peak Execution Memory", 0) or 0)
                    )
    out = []
    for key, s in sorted(stages.items()):
        if s["mem_spill"] or s["disk_spill"]:
            out.append(
                {
                    "stage": key[0],
                    "name": names.get(key, "")[:70],
                    **s,
                }
            )
    total_mem = sum(s["mem_spill"] for s in stages.values())
    total_disk = sum(s["disk_spill"] for s in stages.values())
    return {"spilled_stages": out, "total_mem_spill": total_mem, "total_disk_spill": total_disk}


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SPILL_PROBE.txt"
    import shutil

    shutil.rmtree(EVENTDIR, ignore_errors=True)
    os.makedirs(EVENTDIR, exist_ok=True)

    # Starve the unified pool BEFORE the JVM exists. fraction=0.05 of
    # (1200m - 300m reserved) ≈ 45 MB execution+storage shared by all
    # concurrent tasks — far below the working set of the probed
    # aggregations at sf0.1, so hash aggregates and sorts must spill.
    os.environ["SPARK_DRIVER_MEMORY"] = os.environ.get("SPILL_PROBE_DRIVER_MEM", "1200m")
    # FAT partitions on purpose: 2 shuffle partitions on local[4] puts
    # an entire event-scale aggregation hash table / window sort run
    # into one task — the shape AQE coalescing or key skew produces on
    # a real cluster. Combined with the starved pool this is the
    # spill-or-OOM corner (AQE coalescing only ever merges partitions,
    # so the 2-partition setting cannot be re-split upward).
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    os.environ["SPARK_SHUFFLE_PARTITIONS"] = os.environ.get("SPILL_PROBE_PARTITIONS", "2")
    from high_energy_gamma_ray_search_in_kascade_array_data_spark import get_spark
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus
    from tests.oracle_utils import duckdb_con, exact_hash_problems

    spark = get_spark(
        app_name="spill_probe",
        extra_confs={
            "spark.memory.fraction": "0.05",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVENTDIR,
            # default rolling logs are zstd-compressed, which the stdlib
            # parser can't read — write plain JSON lines
            "spark.eventLog.compress": "false",
            # keep codegen etc. default: the probe must starve only the
            # unified pool, not change plan shapes
        },
    )
    frac = spark.conf.get("spark.memory.fraction", None)
    if frac != "0.05":
        print(f"FATAL: session pre-existed (memory.fraction={frac}); run in a fresh process")
        return 2

    reg = corpus()
    con = duckdb_con(SF_DIR)
    lines = []
    failures = 0
    for name in PROBE_QUERIES:
        q = reg[name]
        t0 = time.perf_counter()
        spdf = q.fn(spark, SF_DIR).toPandas()
        wall = time.perf_counter() - t0
        problems = exact_hash_problems(spdf, con.execute(q.oracle).df())
        status = "ok exact-hash" if not problems else f"FAIL {problems}"
        failures += bool(problems)
        lines.append(f"{name:32s} {wall:7.2f}s  rows={len(spdf):>7}  {status}")
        print(lines[-1])
    spark.stop()  # flush event log
    time.sleep(2.0)

    spill = parse_spill(EVENTDIR)
    header = [
        "# Spill probe: heavy corpus queries under a starved unified memory pool",
        f"# date: {datetime.now(timezone.utc).strftime('%Y-%m-%dT%H:%MZ')}  sf_dir: {SF_DIR}",
        f"# conf: driver-memory={os.environ['SPARK_DRIVER_MEMORY']}, "
        "memory.fraction=0.05 (starved exec+storage pool),",
        f"#       local[{os.environ['SPARK_GRAFT_CPUS']}] with "
        f"{os.environ['SPARK_SHUFFLE_PARTITIONS']} shuffle partitions (fat tasks), "
        "event-log spill metrics",
        "",
    ]
    body = lines + [
        "",
        f"total memory bytes spilled: {spill['total_mem_spill']:,}",
        f"total disk bytes spilled:   {spill['total_disk_spill']:,}",
        "",
        "spilling stages (stage, tasks, mem_spill, disk_spill, peak_exec, name):",
    ]
    for s in spill["spilled_stages"]:
        body.append(
            f"  {s['stage']:>4} {s['tasks']:>4} {s['mem_spill']:>13,} "
            f"{s['disk_spill']:>12,} {s['peak_exec']:>12,}  {s['name']}"
        )
    if failures:
        verdict = f"VERDICT: FAIL — {failures} probed queries diverged under memory pressure"
    elif spill["total_disk_spill"] == 0 and spill["total_mem_spill"] == 0:
        verdict = (
            "VERDICT: INCONCLUSIVE — nothing spilled; the pool was not actually "
            "starved at this SF (raise pressure before trusting this probe)"
        )
    else:
        verdict = (
            "VERDICT: PASS — all probed queries exact-hash vs the oracle under a "
            "starved pool, with real spill activity (graceful degradation, no OOM)"
        )
    body.append("")
    body.append(verdict)
    with open(out_path, "w") as fh:
        fh.write("\n".join(header + body) + "\n")
    print(verdict)
    return 0 if (not failures and verdict.startswith("VERDICT: PASS")) else 1


if __name__ == "__main__":
    raise SystemExit(main())
