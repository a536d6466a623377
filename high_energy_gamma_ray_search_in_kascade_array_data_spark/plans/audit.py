"""Plan introspection + assertion helpers.

The reference performs its optimizations by hand — early column
pruning (``train_classification.py:209-216``), filter-before-histogram
(``:288-293``) — and nothing guards them against regression. Here the
equivalent Catalyst behaviors are *asserted*: a refactor that silently
turns a broadcast join into a cartesian product, or un-pushes a parquet
filter, fails the test suite instead of failing at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan (post-AQE initial plan) as text."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Every fragment must appear inside a PushedFilters: [...] list —
    i.e. the predicate reached the parquet reader."""
    plan = physical_plan(df)
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line]
    joined = " ".join(pushed)
    for frag in fragments:
        assert frag in joined, f"filter {frag!r} not pushed to scan; pushed lines: {pushed}\n{plan}"


def assert_no_cartesian_product(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"


def assert_broadcast_hash_join(df: DataFrame, at_least: int = 1) -> None:
    """The small side of every dim join must broadcast (no shuffle of
    the big side on a dim key)."""
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= at_least, f"expected ≥{at_least} BroadcastHashJoin, found {n}:\n{plan}"


def assert_partial_aggregation(df: DataFrame) -> None:
    """Aggregates must combine map-side before the exchange
    (partial_* functions below the shuffle) — the property that keeps
    a 100 TB groupBy's shuffle bounded by key-cardinality."""
    plan = physical_plan(df)
    assert "partial_" in plan, f"no map-side partial aggregation in plan:\n{plan}"


def assert_columns_pruned(df: DataFrame, table_glob: str, max_cols: int) -> None:
    """The parquet ReadSchema for scans of ``table_glob`` must project
    at most ``max_cols`` columns (column pruning reached the reader)."""
    plan = physical_plan(df)
    schemas = []
    take = False
    for line in plan.splitlines():
        if line.strip().startswith("Location") and table_glob in line:
            take = True
        elif take and line.strip().startswith("ReadSchema"):
            schemas.append(line)
            take = False
    assert schemas, f"no scan of {table_glob} found:\n{plan}"
    for s in schemas:
        ncols = s.count(":")
        assert ncols - 1 <= max_cols, f"scan reads {ncols - 1} cols (> {max_cols}): {s}"
