#!/usr/bin/env python
"""Rules-vs-wall cost curve for BPE ENCODE application (VERDICT r10
task 5).

``bpe_encode_apply`` applies the learned merge table as R chained
JVM array folds in one projection. At the corpus R=5 that is cheap,
but real tokenizers carry 30k+ merges, and the chained-fold plan grows
linearly in R (R nested aggregate() expressions — analysis, codegen,
and per-row work are all ∝ R, and codegen may fall off the
whole-stage cliff long before 30k). This script measures the law: it
trains ONE 50-rule table, then times encode at rule-count prefixes
R ∈ {5, 10, 20, 35, 50} (warm, fold-form) plus — when the fold form
has gone super-linear — the vectorized ``bpe_encode_vec`` Arrow
kernel at the same prefixes, and writes BPE_ENCODE_CURVE.md.

Exactness gate: at every R both forms must agree on (n_words,
n_symbols, n_chars, distinct_symbols) — the fold form is the
oracle-checked reference; at R=5 the registry oracle already pins it
to the DuckDB twin.

Usage: python scripts/bpe_encode_curve.py [sf_dir] [max_rules]
"""

from __future__ import annotations

import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PREFIXES = [5, 10, 20, 35, 50]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_rules = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from high_energy_gamma_ray_search_in_kascade_array_data_spark import get_spark
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.queries import text as T
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus

    spark = get_spark("bpe-encode-curve")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    corpus()["survival_curve"].fn(spark, sf_dir).collect()
    calib = time.time() - t0

    docs = T.load_table(spark, sf_dir, "documents")
    words = T._bpe_words(spark, docs)
    t0 = time.time()
    rules = T.bpe_train(spark, docs, max_rules, words=words)
    t_train = time.time() - t0

    rows = []
    prefixes = [p for p in PREFIXES if p <= max_rules]
    for npfx in prefixes:
        sub = rules[:npfx]
        # warm + measured runs of each form
        fold_walls, vec_walls = [], []
        ref_stats = vec_stats = None
        for i in range(2):
            t0 = time.time()
            ref_stats = tuple(T.bpe_encode_stats(words, sub).collect()[0])
            fold_walls.append(time.time() - t0)
            t0 = time.time()
            vec_stats = tuple(T.bpe_encode_stats_vec(words, sub).collect()[0])
            vec_walls.append(time.time() - t0)
        assert ref_stats == vec_stats, (
            f"R={npfx}: fold {ref_stats} != vec {vec_stats}"
        )
        rows.append((npfx, min(fold_walls), min(vec_walls)))
        print(
            f"R={npfx}: fold={min(fold_walls):.2f}s vec={min(vec_walls):.2f}s "
            f"(agree: {ref_stats})",
            flush=True,
        )

    # cost law: wall ratio vs rule ratio between the end points
    r0, f0, v0 = rows[0]
    r1, f1, v1 = rows[-1]
    fold_law = (f1 / f0) / (r1 / r0) if f0 > 0 else float("inf")
    vec_law = (v1 / v0) / (r1 / r0) if v0 > 0 else float("inf")

    lines = [
        "# BPE encode rules-vs-wall curve",
        "",
        f"date: {datetime.now(timezone.utc).strftime('%Y-%m-%dT%H:%MZ')}  "
        f"fixture: {sf_dir}  merge table: {max_rules} rules "
        f"(trained once in {t_train:.1f}s)  calib survival_curve: {calib:.2f}s",
        "",
        "Both encoders apply the SAME semantics (each rule once, full",
        "left-to-right non-overlapping pass, in rank order — exactly the",
        "re-fold the DuckDB twin does) and must agree exactly at every R;",
        "`fold` = R chained JVM array folds in one projection,",
        "`vec` = one Arrow-vectorized pandas kernel carrying the R-rule",
        "table as a plan constant.",
        "",
        "| rules R | fold wall s (warm) | vec wall s (warm) |",
        "|---|---|---|",
    ]
    lines += [f"| {r} | {f:.2f} | {v:.2f} |" for r, f, v in rows]
    lines += [
        "",
        f"- fold cost law (wall growth / rule growth, {r0}→{r1}): "
        f"**{fold_law:.2f}** (1.0 = linear; >1 super-linear)",
        f"- vec  cost law: **{vec_law:.2f}**",
    ]
    with open(os.path.join(REPO, "BPE_ENCODE_CURVE.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
