"""Subprocess body for the batch task-retry determinism probe
(tests/test_properties.py::test_batch_retry_recompute_determinism).

Runs in its OWN SparkSession with master local[8,3] — task retries are
only enabled by the second master slot, and the shared test session is
plain local[*] — so this must be a fresh process. For each probed
query the script computes the result twice: once clean, once with
every source table wrapped in a fail-once mapInPandas identity (first
attempt of partition 0 of every wrapped stage raises; the retry
succeeds). Lineage recompute after the injected failure must
reproduce the IDENTICAL result — the guarantee a 100 TB job leans on
every time a node dies mid-stage. Exits non-zero on any mismatch.
"""

from __future__ import annotations

import sys

from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession


def flaky_identity(df: DataFrame, marker: str) -> DataFrame:
    """Pass-through mapInPandas that fails the FIRST attempt of
    partition 0, succeeds on retry — the minimal mid-stage fault.
    Appends to ``marker`` when it raises, so the caller can assert
    the fault actually fired (no vacuous green)."""

    def gen(batches):
        tc = TaskContext.get()
        if tc is not None and tc.partitionId() == 0 and tc.attemptNumber() == 0:
            with open(marker, "a") as f:
                f.write("raised\n")
            raise RuntimeError("injected first-attempt failure (retry probe)")
        for b in batches:
            yield b

    return df.mapInPandas(gen, df.schema)


def rows_key(df: DataFrame) -> list[tuple]:
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    sf_dir = sys.argv[1]
    marker = sys.argv[2]
    spark = (
        SparkSession.builder.master("local[8,3]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("retry-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import os

    from high_energy_gamma_ray_search_in_kascade_array_data_spark.queries import (
        analytics_ext,
        common,
        dedup,
        kascade,
        recursive,
        relational,
        text,
    )
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus

    reg = corpus()
    # stratified_split / corpus_mix_sample: the VERDICT r9 pair (seeded
    # draws). window_topk_per_group: rank-based selection (ties broken
    # deterministically) recomputed mid-shuffle. minhash_lsh_neardup_fast:
    # the memoized pipeline — persisted frames + invocation memo must
    # survive a task retry without serving partial state.
    # bom_chain_rollup_rcte / bfs_shortest_hops_rcte: the engine-side
    # recursion (UnionLoop) — the BOM ascent re-scans the fault-wrapped
    # dimension at EVERY recursion level (each level is a fresh stage,
    # so the fail-once fault fires and retries per level); the BFS form
    # faults during the checkpointed edge build feeding the recursion.
    probes = [
        "stratified_split",
        "corpus_mix_sample",
        "window_topk_per_group",
        "minhash_lsh_neardup_fast",
        "bom_chain_rollup_rcte",
        "bfs_shortest_hops_rcte",
    ]
    # Every query module binds load_table via `from ...catalog import
    # load_table`, so each binding must be patched in ITS OWN namespace
    # — patching only common/kascade/text left window_topk_per_group
    # (relational) and minhash_lsh_neardup_fast (dedup) fault-free and
    # their "ok" lines vacuous (ADVICE r10).
    patch_modules = [common, kascade, text, relational, dedup, analytics_ext, recursive]
    real_load = common.load_table

    def flaky_load(spark, sf_dir, table):
        return flaky_identity(real_load(spark, sf_dir, table), marker)

    from high_energy_gamma_ray_search_in_kascade_array_data_spark.operators import dedup as dedup_ops

    failures = []
    for name in probes:
        fn = reg[name].fn
        # flush the dedup invocation memo so the injected run COMPUTES
        # (a memo hit from the clean run would skip the wrapped scan and
        # the fault would never fire — the vacuous case this probe now
        # rejects per-query). The fault therefore fires mid-memo-
        # population, the scenario a real executor loss hits.
        dedup_ops.release_caches()
        clean = rows_key(fn(spark, sf_dir))
        dedup_ops.release_caches()
        # per-query vacuous-green guard: truncate the marker, require the
        # fault to have fired for THIS query before its "ok" counts
        open(marker, "w").close()
        for mod in patch_modules:
            mod.load_table = flaky_load
        try:
            injected = rows_key(fn(spark, sf_dir))
        finally:
            for mod in patch_modules:
                mod.load_table = real_load
        if not open(marker).read():
            failures.append(name)
            print(f"VACUOUS {name}: the injected fault never fired for this query")
        elif clean != injected:
            failures.append(name)
            print(f"MISMATCH {name}: clean={clean[:3]} injected={injected[:3]}")
        else:
            print(f"ok {name}: {len(clean)} rows identical after injected retry")

    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
