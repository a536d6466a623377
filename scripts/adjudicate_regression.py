#!/usr/bin/env python
"""Interleaved re-run adjudicator for flagged bench regressions
(VERDICT r10 task 6).

``check_bench_regression.py --strict`` (now part of preflight) fails
the close on any ≥1.5× calib-normalized per-query regression UNLESS it
has been adjudicated here. Adjudication = the only evidence that can
separate variance from real cost on a noisy box: run the flagged
query solo, N× INTERLEAVED between the reference commit (a throwaway
git worktree) and the working tree (ref, cur, ref, cur, …) in one
session window, median the spin-normalized walls, and record the
verdict:

  * ratio < THRESH  → "noise"  (strict mode then passes the query)
  * ratio ≥ THRESH  → "real"   (strict mode KEEPS failing — fix it, or
    hand-edit the verdict to "accepted" with a reason, which the
    committed BENCH_ADJUDICATION.json makes auditable)

Each subprocess measures its own 1-s spin constant immediately before
the query, so normalization tracks the box within the window instead
of across days. Results go to BENCH_ADJUDICATION.json (merged) and a
table is appended to SCALE.md.

Usage:
    python scripts/adjudicate_regression.py [--ref REF] [--sf SF_DIR]
        [--rounds N] query [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESH = 1.5

_RUNNER = r"""
import json, os, sys, time
tree = sys.argv[1]; sf_dir = sys.argv[2]; names = sys.argv[3:]
sys.path.insert(0, tree)
t0 = time.perf_counter(); it = 0; x = 0
while time.perf_counter() - t0 < 1.0:
    for _ in range(10000):
        x = (x * 1103515245 + 12345) % 2147483648
    it += 10000
from high_energy_gamma_ray_search_in_kascade_array_data_spark import get_spark
from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus
spark = get_spark("adjudicate")
spark.sparkContext.setLogLevel("ERROR")
reg = corpus()
out = {"spin": it, "queries": {}}
for n in names:
    reg[n].fn(spark, sf_dir).count()  # warm
    t0 = time.time()
    reg[n].fn(spark, sf_dir).count()
    out["queries"][n] = round(time.time() - t0, 3)
print("ADJ_JSON " + json.dumps(out))
"""


def _run_tree(tree: str, sf_dir: str, names: list[str]) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = tree
    r = subprocess.run(
        [sys.executable, "-c", _RUNNER, tree, sf_dir, *names],
        capture_output=True,
        text=True,
        timeout=1200,
        env=env,
        cwd=tree,
    )
    for line in r.stdout.splitlines():
        if line.startswith("ADJ_JSON "):
            return json.loads(line[len("ADJ_JSON "):])
    raise RuntimeError(
        f"runner in {tree} produced no result\nstdout:{r.stdout[-1500:]}\nstderr:{r.stderr[-1500:]}"
    )


def main() -> int:
    args = sys.argv[1:]

    def opt(flag: str, default: str) -> str:
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    from check_bench_regression import _default_ref

    ref = opt("--ref", _default_ref())
    sf_dir = opt("--sf", "/root/testdata/sf0.1")
    rounds = int(opt("--rounds", "3"))
    names = args
    if not names:
        print("usage: adjudicate_regression.py [--ref R] [--sf D] [--rounds N] query...")
        return 2

    sha = subprocess.run(
        ["git", "rev-parse", "--short", ref], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()
    wt = os.path.join(tempfile.gettempdir(), f"adjud_ref_{sha}")
    if not os.path.isdir(wt):
        subprocess.run(["git", "worktree", "add", "--detach", wt, ref], cwd=REPO, check=True)

    ref_runs: dict[str, list[float]] = {n: [] for n in names}
    cur_runs: dict[str, list[float]] = {n: [] for n in names}
    spins: list[tuple[int, int]] = []
    for i in range(rounds):
        a = _run_tree(wt, sf_dir, names)
        b = _run_tree(REPO, sf_dir, names)
        spins.append((a["spin"], b["spin"]))
        for n in names:
            # normalize by each run's own spin: wall × spin is
            # box-speed-invariant for CPU-bound work
            ref_runs[n].append(a["queries"][n] * a["spin"] / 1e6)
            cur_runs[n].append(b["queries"][n] * b["spin"] / 1e6)
        print(f"round {i + 1}/{rounds}: spins ref={a['spin']} cur={b['spin']}", flush=True)

    adj_path = os.path.join(REPO, "BENCH_ADJUDICATION.json")
    book = json.load(open(adj_path)) if os.path.exists(adj_path) else {}
    lines = [
        "",
        f"## Regression adjudication vs {sha} "
        f"({datetime.now(timezone.utc).strftime('%Y-%m-%dT%H:%MZ')}, "
        f"{rounds}x interleaved solo re-runs at {sf_dir}, spin-normalized walls)",
        "",
        "| query | ref median (norm) | cur median (norm) | ratio | verdict |",
        "|---|---|---|---|---|",
    ]
    any_real = False
    for n in names:
        mr = statistics.median(ref_runs[n])
        mc = statistics.median(cur_runs[n])
        ratio = mc / mr if mr > 0 else float("inf")
        verdict = "noise" if ratio < THRESH else "real"
        any_real |= verdict == "real"
        book[n] = {
            "ref": sha,
            "date": datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%MZ"),
            "sf_dir": sf_dir,
            "ratio": round(ratio, 3),
            "verdict": verdict,
            "ref_runs_norm": [round(v, 3) for v in ref_runs[n]],
            "cur_runs_norm": [round(v, 3) for v in cur_runs[n]],
            "spins": spins,
        }
        lines.append(f"| {n} | {mr:.2f} | {mc:.2f} | {ratio:.2f}x | {verdict} |")
        print(f"{n}: ref={mr:.2f} cur={mc:.2f} ratio={ratio:.2f}x -> {verdict}", flush=True)

    json.dump(book, open(adj_path, "w"), indent=1, sort_keys=True)
    with open(os.path.join(REPO, "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {adj_path}; table appended to SCALE.md", flush=True)
    return 1 if any_real else 0


if __name__ == "__main__":
    raise SystemExit(main())
