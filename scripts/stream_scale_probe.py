#!/usr/bin/env python
"""Streaming scale probe (r7 VERDICT task 4): run the stateful
streaming family at sf0.1 and at the 10x fixture (10x rows AND 10x
distinct keys — user_id/event_id are offset per replica), recording
per query: result rows, wall, microbatch count, peak state-store rows
(stateOperators[].numRowsTotal of the final progress), and max batch
duration. The claim under test is state-store BOUNDEDNESS: watermarked
state must scale with live keys inside the horizon (~linear in key
cardinality, never super-linear), and batch durations must not blow up
with state size.

Usage: python scripts/stream_scale_probe.py [out.txt]
Writes a FAMILY_CHECK-style artifact (default STREAM_SCALE_10X.txt).
"""

from __future__ import annotations

import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from high_energy_gamma_ray_search_in_kascade_array_data_spark import get_spark  # noqa: E402
from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus  # noqa: E402
from high_energy_gamma_ray_search_in_kascade_array_data_spark.streaming import core  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_STREAM_BASE", "/root/testdata/sf0.1")
BIG = os.environ.get("SPARK_GRAFT_STREAM_BIG", "/tmp/scale10x")

# The stateful heads the verdict names, plus one of each remaining
# state-operator class (window agg, session window, dedup state).
QUERIES = [
    "stream_stateful_user_stats_tws",
    "stream_cdc_chunk_dedup",
    "stream_substring_dup_rate",
    "stream_stream_join",
    "stream_stream_left_outer_join",
    "stream_tumbling_counts",
    "stream_session_windows",
    "stream_dedup_keys",
    "stream_survival_curve",
]


def _progress_stats() -> dict:
    batches = 0
    max_batch_ms = 0
    state_rows = 0
    state_mem = 0
    input_rows = 0
    for plist in core.LAST_PROGRESS.values():
        for p in plist:
            batches += 1
            max_batch_ms = max(max_batch_ms, int(p.get("batchDuration") or 0))
            input_rows += int(p.get("numInputRows") or 0)
        if plist:
            for so in plist[-1].get("stateOperators", []):
                state_rows += int(so.get("numRowsTotal") or 0)
                state_mem += int(so.get("memoryUsedBytes") or 0)
    return dict(
        batches=batches,
        max_batch_ms=max_batch_ms,
        state_rows=state_rows,
        state_mem_mb=round(state_mem / 1e6, 1),
        input_rows=input_rows,
    )


def run_tier(spark, sf_dir: str) -> dict[str, dict]:
    reg = corpus()
    out: dict[str, dict] = {}
    for name in QUERIES:
        core.LAST_PROGRESS.clear()
        t0 = time.monotonic()
        try:
            n = reg[name].fn(spark, sf_dir).count()
            stats = _progress_stats()
            stats.update(rows=n, wall=round(time.monotonic() - t0, 2))
        except Exception as exc:
            stats = dict(error=str(exc)[:200])
        out[name] = stats
        print(f"  {name} @ {sf_dir}: {stats}", flush=True)
    return out


ROCKS = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def run_rocksdb_tier(spark, sf_dir: str) -> dict[str, dict]:
    """The two largest-state queries again at the big tier, under the
    RocksDB provider (r10 VERDICT task 7): at 100 TB these state
    tables exceed executor heap and RocksDB spills to local disk —
    recorded here so the provider swap ships with same-tier metrics
    (result parity is pinned by
    tests/test_streaming_semantics.py::
    test_heavy_stateful_queries_identical_under_rocksdb_state_store)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKS)
    try:
        reg = corpus()
        out: dict[str, dict] = {}
        for name in ("stream_substring_dup_rate", "stream_cdc_chunk_dedup"):
            core.LAST_PROGRESS.clear()
            t0 = time.monotonic()
            try:
                n = reg[name].fn(spark, sf_dir).count()
                stats = _progress_stats()
                stats.update(rows=n, wall=round(time.monotonic() - t0, 2))
            except Exception as exc:
                stats = dict(error=str(exc)[:200])
            out[name] = stats
            print(f"  [rocksdb] {name} @ {sf_dir}: {stats}", flush=True)
        return out
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "STREAM_SCALE_10X.txt"
    spark = get_spark("stream_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = run_tier(spark, BASE)
    big = run_tier(spark, BIG)
    rocks = run_rocksdb_tier(spark, BIG)
    lines = [
        "# Streaming state-store scale probe (r7 VERDICT task 4)",
        f"# base={BASE} big={BIG} (10x rows, 10x distinct keys)",
        f"# date: {datetime.now(timezone.utc).strftime('%Y-%m-%dT%H:%MZ')}",
        "# state_rows = stateOperators numRowsTotal at final microbatch;",
        "# bounded = state ratio <= ~10x (linear in live keys) and max",
        "# batch duration not super-linear.",
        "",
        f"{'query':34s} {'rows_b':>8s} {'rows_10x':>9s} {'state_b':>9s} "
        f"{'state_10x':>9s} {'s_ratio':>7s} {'batch_b':>8s} {'batch_10x':>9s} "
        f"{'wall_b':>7s} {'wall_10x':>8s}",
    ]
    worst = 0.0
    for name in QUERIES:
        b, g = base.get(name, {}), big.get(name, {})
        if "error" in b or "error" in g:
            lines.append(f"{name:34s} ERROR {b.get('error', '')}{g.get('error', '')}")
            continue
        sr = (g["state_rows"] / b["state_rows"]) if b["state_rows"] else float("nan")
        if sr == sr:
            worst = max(worst, sr)
        lines.append(
            f"{name:34s} {b['rows']:8d} {g['rows']:9d} {b['state_rows']:9d} "
            f"{g['state_rows']:9d} {sr:7.2f} {b['max_batch_ms']:7d}ms {g['max_batch_ms']:8d}ms "
            f"{b['wall']:7.2f} {g['wall']:8.2f}"
        )
    lines.append("")
    lines.append(f"worst state-rows ratio: {worst:.2f} (linear = 10.0)")
    lines += [
        "",
        "# RocksDB state-store tier (r10 VERDICT task 7): the two",
        "# largest-state queries at the 10x fixture under",
        "# RocksDBStateStoreProvider — result parity vs the default",
        "# store is pinned by tests/test_streaming_semantics.py; the",
        "# figures below show the provider swap at the same tier.",
    ]
    for name, st in rocks.items():
        if "error" in st:
            lines.append(f"{name:34s} ERROR {st['error']}")
        else:
            g = big.get(name, {})
            lines.append(
                f"{name:34s} rows={st['rows']} state_rows={st['state_rows']} "
                f"state_mem={st['state_mem_mb']}MB max_batch={st['max_batch_ms']}ms "
                f"wall={st['wall']} (default-store wall at same tier: {g.get('wall', '?')})"
            )
    text = "\n".join(lines) + "\n"
    with open(out_path, "w") as fh:
        fh.write(text)
    print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
