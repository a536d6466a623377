#!/usr/bin/env python
"""Hot-band skew probe for the LSH dedup family (r7 VERDICT task 2).

The band-bucket self-join (operators/dedup.py::lsh_candidate_pairs)
is provably not all-pairs, but its worst case is a HOT BAND: a
boilerplate-dominated corpus (the realistic 100 TB web-text case)
where one band key holds ~10% of documents. This probe:

1. builds a fixture where 10% of docs share a 40-token boilerplate
   prefix plus a short unique tail — their minhash minima come from
   the shared shingles with high probability, so entire bands collide
   on one key (and pairwise jaccard ≈ 0.7 > threshold, so the pairs
   are TRUE near-dups: the quadratic pair OUTPUT is the answer, the
   plan question is whether one task serializes it);
2. runs the near-dup pipeline + connected components with the Spark
   event log enabled;
3. parses per-task durations from the event log and reports the
   straggler ratio (max task / median task) for every heavy stage —
   bounded spread (< ~4x) means AQE's skew handling split the hot
   bucket across tasks instead of funneling it through one.

Usage: python scripts/skew_band_probe.py [out.txt]
Writes SKEW_BAND_PROBE.txt by default.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import statistics
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = "/tmp/skewband"
EVENTDIR = "/tmp/skewband_eventlog"
N_DOCS = 10_000
HOT_FRAC = 0.10
BOILER = 40  # shared boilerplate tokens per hot doc
TAIL = 5  # unique tail tokens per hot doc


def build_fixture(spark) -> None:
    from pyspark.sql import functions as F

    n_hot = int(N_DOCS * HOT_FRAC)
    boiler = " ".join(f"boil{i}" for i in range(BOILER))
    base = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    tail = F.concat_ws(
        " ", *[F.concat(F.lit(f"u{k}_"), F.col("doc_id").cast("string")) for k in range(TAIL)]
    )
    # unique docs: 45 tokens, all doc-specific; hot docs: boilerplate + tail
    uniq_text = F.concat_ws(
        " ",
        *[F.concat(F.lit(f"w{k}_"), F.col("doc_id").cast("string")) for k in range(BOILER + TAIL)],
    )
    docs = base.select(
        "doc_id",
        F.when(F.col("doc_id") < n_hot, F.concat(F.lit(boiler + " "), tail))
        .otherwise(uniq_text)
        .alias("text"),
    )
    docs.repartition(8).write.mode("overwrite").parquet(f"{FIXTURE}/documents.parquet")


def parse_task_spread(event_dir: str) -> list[dict]:
    """Per-stage task-duration spread from the Spark event log."""
    stages: dict[tuple, list[float]] = {}
    names: dict[tuple, str] = {}
    # Spark 4 rolling event logs are DIRECTORIES (eventlog_v2_*/events_*)
    for path in glob.glob(f"{event_dir}/**", recursive=True):
        if os.path.isdir(path) or os.path.basename(path).startswith("appstatus"):
            continue
        op = gzip.open if path.endswith(".gz") else open
        with op(path, "rt", errors="replace") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except Exception:
                    continue
                if ev.get("Event") == "SparkListenerTaskEnd":
                    ti = ev.get("Task Info", {})
                    dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000.0
                    key = (ev.get("Stage ID"), ev.get("Stage Attempt ID"))
                    stages.setdefault(key, []).append(dur)
                elif ev.get("Event") == "SparkListenerStageSubmitted":
                    si = ev.get("Stage Info", {})
                    names[(si.get("Stage ID"), si.get("Stage Attempt ID"))] = si.get(
                        "Stage Name", ""
                    )[:60]
    rows = []
    for key, durs in stages.items():
        if len(durs) < 8 or sum(durs) < 2.0:
            continue  # tiny stages: spread is launch noise
        med = statistics.median(durs)
        rows.append(
            dict(
                stage=key[0],
                name=names.get(key, ""),
                n_tasks=len(durs),
                total_s=round(sum(durs), 1),
                median_s=round(med, 2),
                max_s=round(max(durs), 2),
                straggler=round(max(durs) / med, 2) if med > 0 else float("inf"),
            )
        )
    rows.sort(key=lambda r: -r["total_s"])
    return rows


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SKEW_BAND_PROBE.txt"
    import shutil

    shutil.rmtree(EVENTDIR, ignore_errors=True)  # parse only THIS run
    os.makedirs(EVENTDIR, exist_ok=True)
    from high_energy_gamma_ray_search_in_kascade_array_data_spark import get_spark

    spark = get_spark(
        "skew_band_probe",
        extra_confs={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVENTDIR}",
            # plain single-file JSONL (no zstd, no rolling) so the
            # stdlib can parse it
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from high_energy_gamma_ray_search_in_kascade_array_data_spark.operators import dedup

    # rebuild the fixture when the generating constants change — a
    # stale fixture from an older constant set would make the probe
    # measure the wrong workload. The constants are stamped in a
    # sidecar file next to the parquet.
    stamp_path = f"{FIXTURE}/constants.json"
    stamp = json.dumps(
        {"N_DOCS": N_DOCS, "HOT_FRAC": HOT_FRAC, "BOILER": BOILER, "TAIL": TAIL},
        sort_keys=True,
    )
    have = None
    if os.path.exists(stamp_path):
        with open(stamp_path) as fh:
            have = fh.read()
    if have != stamp or not os.path.exists(f"{FIXTURE}/documents.parquet"):
        build_fixture(spark)
        with open(stamp_path, "w") as fh:
            fh.write(stamp)
    docs = spark.read.parquet(f"{FIXTURE}/documents.parquet")

    n_hot = int(N_DOCS * HOT_FRAC)
    t0 = time.monotonic()
    pairs = dedup.minhash_near_duplicates_fast(docs, threshold=0.5)
    n_pairs = pairs.count()
    wall_pairs = time.monotonic() - t0
    # sanity: the hot family must be a (near-)clique — the probe is
    # vacuous if the fixture failed to make the band hot
    expected = n_hot * (n_hot - 1) // 2
    hot_pairs = pairs.filter((F.col("doc_a") < n_hot) & (F.col("doc_b") < n_hot)).count()
    # enforce, don't just print: a cold band means the probe measured
    # nothing and "BOUNDED" would be vacuous
    if hot_pairs != expected:
        print(
            f"FATAL: hot-family clique incomplete ({hot_pairs}/{expected}) — "
            "fixture did not produce a hot band; probe is vacuous",
            file=sys.stderr,
        )
        return 2

    t1 = time.monotonic()
    comp = dedup.connected_components_star(pairs.select("doc_a", "doc_b"))
    n_comp_docs = comp.count()
    wall_comp = time.monotonic() - t1
    dedup.release_caches()
    spark.stop()  # flush the event log

    rows = parse_task_spread(EVENTDIR)
    if not rows:
        # an empty parse (event log disabled because a pre-existing
        # session ignored the conf, a format change, or a truncated
        # log) must FAIL, not print a vacuous "BOUNDED (< 4x)"
        print(
            "FATAL: event-log parse produced no heavy stages — the probe "
            "measured nothing (conf ignored / format changed / empty log)",
            file=sys.stderr,
        )
        return 2
    worst = max(r["straggler"] for r in rows)
    lines = [
        "# Hot-band skew probe: LSH dedup under a boilerplate-dominated corpus",
        f"# fixture: {N_DOCS} docs, {n_hot} sharing a {BOILER}-token boilerplate"
        f" (one hot family per band)",
        f"# date: {datetime.now(timezone.utc).strftime('%Y-%m-%dT%H:%MZ')}",
        "",
        f"near-dup pairs: {n_pairs} (hot-family clique {hot_pairs}/{expected})"
        f"  wall {wall_pairs:.1f}s",
        f"components: {n_comp_docs} labeled docs  wall {wall_comp:.1f}s",
        "",
        f"{'stage':>5s} {'tasks':>6s} {'total_s':>8s} {'median_s':>9s} "
        f"{'max_s':>7s} {'straggler':>9s}  name",
    ]
    for r in rows[:15]:
        lines.append(
            f"{r['stage']:5d} {r['n_tasks']:6d} {r['total_s']:8.1f} {r['median_s']:9.2f} "
            f"{r['max_s']:7.2f} {r['straggler']:9.2f}  {r['name']}"
        )
    lines.append("")
    lines.append(
        f"worst straggler ratio across heavy stages: {worst:.2f} "
        f"({'BOUNDED (< 4x)' if worst < 4 else 'STRAGGLER — needs salting'})"
    )
    text = "\n".join(lines) + "\n"
    with open(out_path, "w") as fh:
        fh.write(text)
    print(text)
    return 0 if worst < 4 else 1


if __name__ == "__main__":
    raise SystemExit(main())
