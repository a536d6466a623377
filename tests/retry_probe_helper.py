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

    from high_energy_gamma_ray_search_in_kascade_array_data_spark.queries import common, kascade, text
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus

    reg = corpus()
    # stratified_split / corpus_mix_sample: the VERDICT r9 pair (seeded
    # draws). window_topk_per_group: rank-based selection (ties broken
    # deterministically) recomputed mid-shuffle. minhash_lsh_neardup_fast:
    # the memoized pipeline — persisted frames + invocation memo must
    # survive a task retry without serving partial state.
    probes = [
        "stratified_split",
        "corpus_mix_sample",
        "window_topk_per_group",
        "minhash_lsh_neardup_fast",
    ]
    real_load = common.load_table

    def flaky_load(spark, sf_dir, table):
        return flaky_identity(real_load(spark, sf_dir, table), marker)

    failures = []
    for name in probes:
        fn = reg[name].fn
        clean = rows_key(fn(spark, sf_dir))
        # inject: every module-level load_table these queries reach
        common.load_table = flaky_load
        kascade.load_table = flaky_load
        text.load_table = flaky_load
        try:
            injected = rows_key(fn(spark, sf_dir))
        finally:
            common.load_table = real_load
            kascade.load_table = real_load
            text.load_table = real_load
        if clean != injected:
            failures.append(name)
            print(f"MISMATCH {name}: clean={clean[:3]} injected={injected[:3]}")
        else:
            print(f"ok {name}: {len(clean)} rows identical after injected retry")

    import os

    if not os.path.exists(marker) or not open(marker).read():
        print("VACUOUS: the injected fault never fired")
        sys.exit(2)
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
