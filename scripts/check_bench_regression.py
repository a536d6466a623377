#!/usr/bin/env python
"""Calib-normalized per-query bench regression gate (r8 VERDICT task 7).

Aggregate bench totals are gated by the driver; per-query moves were
only ever caught by the judge reading BENCH_DETAIL by hand. This
script compares the working-tree BENCH_DETAIL.json against the
previous committed one, NORMALIZED by the calib spin constant (a 1-s
single-thread integer loop recorded in both files — the box-speed
attribution r7 added), and prints every query whose normalized time
moved more than THRESH× in either direction.

Normalization: a box with half the spin throughput is expected to run
~2× slower wall-clock, so
    t_norm = t_cur × (spin_cur / spin_ref)
is comparable to t_ref. Sub-second queries are noise-dominated and
held to an absolute floor instead (|Δ| must also exceed 0.3 s).

Usage:
    python scripts/check_bench_regression.py [--ref GITREF] [--strict]

Default GITREF: the most recent commit that changed BENCH_DETAIL.json
(HEAD if the working tree differs from HEAD, else HEAD's parent entry
in the file's history). --strict exits 1 on any flagged regression;
default is advisory (bench noise should not block a snapshot, but the
round close must cite the table).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

THRESH = 1.5
ABS_FLOOR_S = 0.3

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git_show(ref: str) -> dict | None:
    try:
        out = subprocess.run(
            ["git", "show", f"{ref}:BENCH_DETAIL.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out)
    except Exception:
        return None


def _default_ref() -> str:
    """HEAD if the working tree's BENCH_DETAIL differs from HEAD's,
    else the previous commit that touched the file."""
    diff = subprocess.run(
        ["git", "diff", "--quiet", "HEAD", "--", "BENCH_DETAIL.json"], cwd=REPO
    )
    if diff.returncode != 0:
        return "HEAD"
    log = subprocess.run(
        ["git", "log", "-2", "--format=%H", "--", "BENCH_DETAIL.json"],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout.split()
    return log[1] if len(log) > 1 else "HEAD"


def main() -> int:
    args = sys.argv[1:]
    strict = "--strict" in args
    ref = args[args.index("--ref") + 1] if "--ref" in args else _default_ref()

    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
        cur = json.load(fh)
    prev = _git_show(ref)
    if prev is None:
        print(f"bench-regression: no BENCH_DETAIL.json at {ref} — nothing to compare")
        return 0

    spin_cur = cur.get("calib", {}).get("spin_iters_per_sec")
    spin_ref = prev.get("calib", {}).get("spin_iters_per_sec")
    norm = (spin_cur / spin_ref) if (spin_cur and spin_ref) else 1.0

    # Adjudication book (scripts/adjudicate_regression.py): a flagged
    # regression is excusable in --strict mode ONLY when it was re-run
    # interleaved against the SAME ref and the verdict is noise (or a
    # hand-written "accepted" with its reason on the record).
    adj_path = os.path.join(REPO, "BENCH_ADJUDICATION.json")
    adjudication = json.load(open(adj_path)) if os.path.exists(adj_path) else {}
    ref_sha = subprocess.run(
        ["git", "rev-parse", "--short", ref], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()

    def adjudicated(name: str) -> bool:
        e = adjudication.get(name)
        return bool(e) and e.get("ref") == ref_sha and e.get("verdict") in ("noise", "accepted")

    qc, qp = cur.get("queries", {}), prev.get("queries", {})
    flagged: list[tuple[str, float, float, float]] = []
    for name in sorted(set(qc) & set(qp)):
        t_norm = qc[name] * norm
        ratio = t_norm / qp[name] if qp[name] > 0 else float("inf")
        if (ratio > THRESH or ratio < 1 / THRESH) and abs(t_norm - qp[name]) > ABS_FLOOR_S:
            flagged.append((name, qp[name], qc[name], ratio))

    print(
        f"bench-regression: cur vs {ref[:12]}  "
        f"spin_cur={spin_cur} spin_ref={spin_ref} norm={norm:.3f}  "
        f"common queries={len(set(qc) & set(qp))} "
        f"(new: {sorted(set(qc) - set(qp))or '[]'}, dropped: {sorted(set(qp) - set(qc)) or '[]'})"
    )
    if not flagged:
        print(f"bench-regression: no normalized move >{THRESH}x (abs floor {ABS_FLOOR_S}s)")
        return 0
    print(f"{'query':40s} {'ref_s':>7s} {'cur_s':>7s} {'norm_ratio':>10s}")
    worst = 0.0
    for name, t_ref, t_cur, ratio in sorted(flagged, key=lambda r: -r[3]):
        mark = "  [adjudicated: see BENCH_ADJUDICATION.json]" if adjudicated(name) else ""
        print(f"{name:40s} {t_ref:7.2f} {t_cur:7.2f} {ratio:10.2f}{mark}")
        worst = max(worst, ratio)
    n_reg = sum(1 for f in flagged if f[3] > 1)
    unadj = [f[0] for f in flagged if f[3] > 1 and not adjudicated(f[0])]
    print(
        f"bench-regression: {n_reg} regressions / {len(flagged) - n_reg} improvements "
        f"flagged (>{THRESH}x normalized); unadjudicated regressions: {unadj or 'none'}"
    )
    if strict and unadj:
        print(
            "bench-regression STRICT FAIL: adjudicate with "
            f"'python scripts/adjudicate_regression.py --ref {ref_sha} {' '.join(unadj)}' "
            "(3x interleaved solo re-run) or fix the regression"
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
