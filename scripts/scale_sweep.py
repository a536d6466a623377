#!/usr/bin/env python
"""Corpus-wide exact-hash oracle sweep at a replicated higher-SF fixture.

Round-4's 10x probe (``scale_probe.py``) *timed* 11 queries and caught
an int64 overflow; this script answers the stronger question for the
ENTIRE registered corpus: does every query still hash-match its DuckDB
twin when the data is 10x the driver's largest fixture (sf1.0:
lineitem 6M rows, events 1M)?  It is the executable approximation of
"would this survive 100x" — the bug classes it targets (integer
overflow of sufficient statistics, float summation-order divergence
that only appears at higher partition counts, fixture-shape
assumptions baked into oracle constants) are exactly the ones that
correctness at sf0.1 cannot see.  The fixture tier is parameterized:
``SPARK_GRAFT_SCALE_DST``/``SPARK_GRAFT_SCALE_REPLICAS`` pick the
destination and replication factor (see ``scale_probe.py``); the r9
sf1.0 sweeps ran at REPLICAS=10 (DST=/tmp/sf1, then /tmp/scale10x
after the corpus grew to 368) and are committed as
``SWEEP_SF1.jsonl`` + ``SWEEP_SF1.log``.

The comparison is byte-identical to the driver's CORRECTNESS gate
(``tests/oracle_utils.exact_hash_problems``) on the SAME parquet for
both engines.  Results stream to a JSONL file so an interrupted run
resumes where it left off.

Usage:
    python scripts/scale_sweep.py [--rebuild] [--fresh] [query ...]

    --rebuild  rebuild the 10x fixture even if present
    --fresh    ignore (truncate) previous results, rerun everything
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from high_energy_gamma_ray_search_in_kascade_array_data_spark import get_spark  # noqa: E402
from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus  # noqa: E402
from scripts.scale_probe import DST, build  # noqa: E402
from tests.oracle_utils import duckdb_con, exact_hash_problems  # noqa: E402

RESULTS = f"/tmp/scale_sweep_results_{os.path.basename(DST.rstrip('/'))}.jsonl"

# Queries whose ORACLE deliberately pins the driver fixture's physical
# layout and therefore cannot (and should not) pass against the
# Spark-written multi-part 10x fixture. Each entry documents why.
# (Empty since r6: file_metadata_provenance's oracle now checks
# layout-independent invariants and sweeps green on any layout.)
LAYOUT_PINNED: dict[str, str] = {}


def load_done() -> tuple[dict[str, dict], dict[str, int]]:
    """Latest completed record per query, plus a count of crash
    markers ("started" lines never followed by a completion — the
    process was killed mid-query, e.g. by the OOM reaper)."""
    done: dict[str, dict] = {}
    crashes: dict[str, int] = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            for line in f:
                if not line.strip():
                    continue
                rec = json.loads(line)
                if rec["status"] == "started":
                    crashes[rec["name"]] = crashes.get(rec["name"], 0) + 1
                else:
                    done[rec["name"]] = rec
                    crashes.pop(rec["name"], None)
    return done, crashes


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only = set(args)
    spark = get_spark("scale_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    if "--rebuild" in sys.argv or not os.path.exists(DST):
        build(spark)
    if "--fresh" in sys.argv and os.path.exists(RESULTS):
        os.remove(RESULTS)
    done, crashes = load_done()
    con = duckdb_con(DST)
    reg = corpus()
    names = [n for n in sorted(reg) if (not only or n in only)]
    out = open(RESULTS, "a", buffering=1)
    n_fail = 0
    for i, name in enumerate(names):
        if name in done and done[name]["status"] == "ok" and not only:
            continue
        if crashes.get(name, 0) >= 2 and not only:
            print(f"[{i+1}/{len(names)}] SKIP {name}: killed the process twice", flush=True)
            continue
        if name in LAYOUT_PINNED:
            rec = {"name": name, "status": "layout-pinned", "why": LAYOUT_PINNED[name]}
            out.write(json.dumps(rec) + "\n")
            print(f"[{i+1}/{len(names)}] LAYOUT-PINNED {name}", flush=True)
            continue
        q = reg[name]
        out.write(json.dumps({"name": name, "status": "started"}) + "\n")
        rec: dict = {"name": name}
        t0 = time.monotonic()
        try:
            spark_pdf = q.fn(spark, DST).toPandas()
            rec["spark_s"] = round(time.monotonic() - t0, 2)
            rec["rows"] = len(spark_pdf)
        except Exception as e:  # noqa: BLE001
            rec.update(status="spark-error", err=str(e)[:500])
            out.write(json.dumps(rec) + "\n")
            print(f"[{i+1}/{len(names)}] SPARK-ERR {name}: {str(e)[:200]}", flush=True)
            n_fail += 1
            continue
        if q.oracle is None:
            rec["status"] = "rows-only"
            out.write(json.dumps(rec) + "\n")
            print(f"[{i+1}/{len(names)}] ROWS {name}: {rec['rows']}", flush=True)
            continue
        t1 = time.monotonic()
        try:
            oracle_pdf = con.execute(q.oracle).fetchdf()
            rec["oracle_s"] = round(time.monotonic() - t1, 2)
        except Exception as e:  # noqa: BLE001
            rec.update(status="oracle-error", err=str(e)[:500])
            out.write(json.dumps(rec) + "\n")
            print(f"[{i+1}/{len(names)}] ORACLE-ERR {name}: {str(e)[:200]}", flush=True)
            n_fail += 1
            continue
        t2 = time.monotonic()
        problems = exact_hash_problems(spark_pdf, oracle_pdf)
        rec["hash_s"] = round(time.monotonic() - t2, 2)
        if problems:
            rec.update(status="hash-fail", err=problems[0][:800])
            n_fail += 1
            print(f"[{i+1}/{len(names)}] HASH-FAIL {name}: {problems[0][:200]}", flush=True)
        else:
            rec["status"] = "ok"
            print(
                f"[{i+1}/{len(names)}] ok {name}: {rec['rows']} rows "
                f"(spark {rec['spark_s']}s, oracle {rec['oracle_s']}s)",
                flush=True,
            )
        out.write(json.dumps(rec) + "\n")
    out.close()
    done, crashes = load_done()
    bad = {
        n: r
        for n, r in done.items()
        if r["status"] not in ("ok", "rows-only", "layout-pinned")
    }
    print(
        f"\nsweep: {len(done)} recorded, {len(bad)} not-ok: {sorted(bad)}; "
        f"crash-skipped: {sorted(n for n, c in crashes.items() if c >= 2)}",
        flush=True,
    )
    return 1 if bad or crashes else 0


if __name__ == "__main__":
    raise SystemExit(main())
