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


def simple_plan(df: DataFrame) -> str:
    """The simple-mode physical plan (tree with inline Exchange
    partitioning specs) — the parse target for the fact-scale-sort
    audit below."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )


# Tables whose row count grows with the scale factor: an exchange that
# funnels their RAW rows into one (or ≤7) partitions is a plan that
# dies at 100 TB no matter how fast it runs at sf0.1.  nation/region
# are fixed-size and excluded.
_FACT_TABLES = (
    "lineitem", "orders", "events", "documents", "embeddings",
    "partsupp", "customer", "part", "supplier",
)

# Columns whose domain is a handful of values: hash-partitioning raw
# fact rows by ONLY these keys gives each reducer an O(fact/k) slice.
_LOW_CARD_COLS = frozenset({
    "l_returnflag", "l_linestatus", "l_shipmode", "l_shipinstruct",
    "o_orderstatus", "o_orderpriority", "c_mktsegment",
    "p_mfgr", "p_brand", "p_container", "r_name", "n_name",
})

_TREE_SEGMENTS = ("   ", ":  ", "+- ", ":- ")


def _tree_nodes(plan: str) -> list[tuple[int, str]]:
    """(depth, node-text) per line of a simple-mode plan tree."""
    nodes = []
    for raw in plan.splitlines():
        if not raw.strip() or raw.startswith("=="):
            continue
        i = 0
        while raw[i : i + 3] in _TREE_SEGMENTS:
            i += 3
        text = raw[i:]
        if text.startswith("*("):  # codegen stage marker
            text = text.split(") ", 1)[-1]
        nodes.append((i // 3, text))
    return nodes


def fact_scale_exchange_violations(plan: str) -> list[str]:
    """Exchange nodes that funnel RAW fact-table rows into one or a
    handful of partitions — the silent scale-killer class (a global
    ``row_number``/``ntile`` window, a per-returnflag cumsum over raw
    lineitem).  An exchange is a violation when it is SinglePartition
    or hash-keyed ONLY by known low-cardinality columns AND its
    subtree scans a fact table with no aggregation (or limit) in
    between — aggregates bound the exchanged rows by key cardinality,
    which is exactly what makes the two-phase rewrites safe.
    Distributed range partitioning (``orderBy``) is not flagged."""
    import re

    nodes = _tree_nodes(plan)
    violations = []
    for idx, (depth, text) in enumerate(nodes):
        if not text.startswith("Exchange"):
            continue
        if "SinglePartition" in text:
            hazard = True
        elif "hashpartitioning(" in text:
            cols = set(re.findall(r"(\w+)#\d+", text.split("hashpartitioning(", 1)[1]))
            hazard = bool(cols) and cols <= _LOW_CARD_COLS
        else:
            hazard = False
        if not hazard:
            continue
        subtree = []
        for d2, t2 in nodes[idx + 1 :]:
            if d2 <= depth:
                break
            subtree.append(t2)
        scans_fact = any(
            "FileScan" in s
            and any(f"/{t}.parquet" in s or f"/{t}/" in s for t in _FACT_TABLES)
            for s in subtree
        )
        reduces = any(
            "HashAggregate" in s
            or "SortAggregate" in s
            or "ObjectHashAggregate" in s
            or "LocalLimit" in s
            or "TakeOrdered" in s
            # a mapInPandas kernel between scan and exchange is bespoke
            # per-batch logic (e.g. topk_per_group_two_phase's local
            # top-k prune) — judged by its own test, not this audit
            or "MapInPandas" in s
            for s in subtree
        )
        if scans_fact and not reduces:
            violations.append(text)
    return violations
