#!/usr/bin/env python
"""Driver-sample blind-spot audit (r8 VERDICT task 5).

110 of 363 corpus queries have been driver-sampled across 8 rounds;
the rest are only ever checked by the repo's own harness. The harness
mirrors the driver's hash discipline (column-name sort + row sort),
but two divergence classes could hide behind that mirror:

1. INCIDENTAL-ORDER dependence: a comparison that only passes because
   both engines happen to emit rows/columns in the same order. Probed
   by re-comparing with the Spark frame's columns randomly permuted
   and both frames' rows independently shuffled — the harness compare
   must be invariant, and the values themselves must not encode
   position.
2. SESSION-CONF dependence: the driver runs queries() in ITS OWN
   SparkSession, not get_spark() — a different
   spark.sql.shuffle.partitions changes float summation order and
   could flip a rounded aggregate's last digit. Probed by re-running
   every audited query under shuffle.partitions=200 (the stock
   default, 6× our 32) and requiring the exact hash to still match
   the oracle.

Audits the N largest (by oracle row count at sf0.01) never-sampled
queries. Usage:

    python scripts/order_audit.py [N] [out.md]
    python scripts/order_audit.py --all-cheap [out.md]

``--all-cheap`` (r9 VERDICT task 5) runs the cheap check pair — (b)
column-permutation and (c) row-shuffle, plus the free (a) baseline —
over the ENTIRE never-driver-sampled pool (one Spark execution per
query, no conf-200 re-run) and APPENDS the results to the output file
as an appendix, so the full blind pool is covered once.

Writes ORDER_AUDIT.md by default; exit 1 on any finding.
"""

from __future__ import annotations

import glob
import json
import os
import random
import sys
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_AUDIT_SF", "/root/testdata/sf0.01")


def driver_sampled() -> set[str]:
    names: set[str] = set()
    for f in glob.glob(os.path.join(os.path.dirname(SF_DIR), "..", "repo", "CORRECTNESS_r*.json")):
        pass  # repo-relative resolution below
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        names |= set(json.load(open(f)).keys())
    return names


def main() -> int:
    all_cheap = len(sys.argv) > 1 and sys.argv[1] == "--all-cheap"
    if all_cheap:
        n_audit = 10**9
        out_path = sys.argv[2] if len(sys.argv) > 2 else "ORDER_AUDIT.md"
    else:
        n_audit = int(sys.argv[1]) if len(sys.argv) > 1 else 20
        out_path = sys.argv[2] if len(sys.argv) > 2 else "ORDER_AUDIT.md"

    from high_energy_gamma_ray_search_in_kascade_array_data_spark import get_spark
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus
    from tests.oracle_utils import duckdb_con, exact_hash_problems

    reg = corpus()
    sampled = driver_sampled()
    never = [n for n in sorted(reg) if n not in sampled and reg[n].oracle is not None]
    con = duckdb_con(SF_DIR)

    # rank by oracle row count (cheap: DuckDB only, no Spark)
    sizes: dict[str, int] = {}
    for name in never:
        try:
            sizes[name] = len(con.execute(reg[name].oracle).fetchdf())
        except Exception:
            sizes[name] = -1  # oracle error would be caught by the sweep
    targets = sorted((n for n in never if sizes[n] >= 0), key=lambda n: -sizes[n])[:n_audit]
    if all_cheap:
        targets = [n for n in never if sizes[n] >= 0]

    spark = get_spark("order_audit")
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(42)
    findings: list[str] = []
    hdr = (
        "# APPENDIX (r10): cheap-pair audit over the FULL never-sampled pool"
        if all_cheap
        else "# ORDER_AUDIT — driver-sample blind-spot audit"
    )
    cols = (
        "| query | oracle rows | a:baseline | b:col-perm | c:row-shuf |"
        if all_cheap
        else "| query | oracle rows | a:baseline | b:col-perm | c:row-shuf | d:conf-200 |"
    )
    seps = "|---|---|---|---|---|" if all_cheap else "|---|---|---|---|---|---|"
    lines = [
        hdr,
        "",
        f"date: {datetime.now(timezone.utc).strftime('%Y-%m-%dT%H:%MZ')}  "
        f"fixture: {SF_DIR}  never-driver-sampled pool: {len(never)}  audited: {len(targets)}",
        "",
        "Checks per query: (a) baseline exact-hash vs oracle; (b) Spark frame",
        "column order randomly permuted; (c) both frames' rows independently",
        "shuffled" + ("." if all_cheap else "; (d) query re-run under spark.sql.shuffle.partitions=200"),
        "" if all_cheap else "(the driver-session perturbation — float summation order changes).",
        "",
        cols,
        seps,
    ]
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    for name in targets:
        q = reg[name]
        oracle_pdf = con.execute(q.oracle).fetchdf()
        spark_pdf = q.fn(spark, SF_DIR).toPandas()
        a = exact_hash_problems(spark_pdf, oracle_pdf)

        perm = list(spark_pdf.columns)
        rng.shuffle(perm)
        b = exact_hash_problems(spark_pdf[perm], oracle_pdf)

        c = exact_hash_problems(
            spark_pdf.sample(frac=1.0, random_state=rng.randint(0, 2**31)),
            oracle_pdf.sample(frac=1.0, random_state=rng.randint(0, 2**31)),
        )

        def mark(p: list[str], tag: str) -> str:
            if p:
                findings.append(f"{name} [{tag}]: {p[0][:300]}")
                return "FAIL"
            return "ok"

        if all_cheap:
            lines.append(
                f"| {name} | {sizes[name]} | {mark(a,'baseline')} | {mark(b,'col-perm')} "
                f"| {mark(c,'row-shuf')} |"
            )
        else:
            try:
                spark.conf.set("spark.sql.shuffle.partitions", "200")
                d = exact_hash_problems(q.fn(spark, SF_DIR).toPandas(), oracle_pdf)
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
            lines.append(
                f"| {name} | {sizes[name]} | {mark(a,'baseline')} | {mark(b,'col-perm')} "
                f"| {mark(c,'row-shuf')} | {mark(d,'conf-200')} |"
            )
        print(lines[-1], flush=True)

    lines += ["", f"## Findings: {len(findings)}", ""]
    lines += [f"- {f}" for f in findings] or ["None — no audited query depends on incidental "
                                              "column/row order or on the harness session's "
                                              "shuffle-partition count."]
    mode = "a" if all_cheap and os.path.exists(out_path) else "w"
    with open(out_path, mode) as fh:
        if mode == "a":
            fh.write("\n\n")
        fh.write("\n".join(lines) + "\n")
    print(f"\n{len(findings)} findings → {out_path}")
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
