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

r12 (VERDICT r11 task 7) — TWO-CHANNEL gate: the spin constant only
measures CPU; the r11 adjudications showed multi-second bursty HOST
I/O stalls landing on a different random handful of queries per run
while spin said the box was FINE (pq_adc_topk 0.65 s → 13.2 s,
identical code). Both bench files since r11 also record a direct
disk-read probe (``calib.read_mb_per_s``). A move now counts as a
regression only when it exceeds THRESH under BOTH normalizations:
    ratio_cpu = t_cur × (spin_cur/spin_ref) / t_ref
    ratio_io  = t_cur × (read_cur/read_ref) / t_ref   (clamped: the
        io factor is bounded to [1/4, 1] — a slower-disk window can
        EXCUSE up to 4× of a slowdown, but a faster disk never
        amplifies one, and a >4× disk gap means the runs are not
        comparable at all, not that every query got 10× slack)
and symmetrically for improvements (both ratios < 1/THRESH). When
either file lacks the read probe, the gate degrades to spin-only
exactly as before. Purpose: stop I/O-stall false flags from consuming
3×-interleaved adjudication effort; real code regressions are
CPU-visible and still fail both channels.

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
    read_cur = cur.get("calib", {}).get("read_mb_per_s")
    read_ref = prev.get("calib", {}).get("read_mb_per_s")
    # io factor <1 = current disk window slower; clamped (see header)
    io_norm = (
        max(0.25, min(1.0, read_cur / read_ref)) if (read_cur and read_ref) else 1.0
    )

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
        if qp[name] <= 0:
            continue
        ratio_cpu = qc[name] * norm / qp[name]
        ratio_io = qc[name] * io_norm / qp[name]
        t_norm = qc[name] * norm
        # regression: must exceed THRESH under BOTH channels; the
        # reported ratio is the more forgiving one (what survives).
        if (
            ratio_cpu > THRESH
            and ratio_io > THRESH
            and abs(t_norm - qp[name]) > ABS_FLOOR_S
        ):
            flagged.append((name, qp[name], qc[name], min(ratio_cpu, ratio_io)))
        elif (
            ratio_cpu < 1 / THRESH
            and ratio_io < 1 / THRESH
            and abs(t_norm - qp[name]) > ABS_FLOOR_S
        ):
            flagged.append((name, qp[name], qc[name], max(ratio_cpu, ratio_io)))

    print(
        f"bench-regression: cur vs {ref[:12]}  "
        f"spin_cur={spin_cur} spin_ref={spin_ref} norm={norm:.3f}  "
        f"read_cur={read_cur} read_ref={read_ref} io_norm={io_norm:.3f}  "
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
