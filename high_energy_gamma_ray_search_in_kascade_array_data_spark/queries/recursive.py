"""Recursive-CTE query family — fixpoints evaluated ENGINE-SIDE via
Spark 4's native ``WITH RECURSIVE`` (``UnionLoop``), the declarative
alternative to the driver-coordinated sweep loops in
``analytics_ext`` (``bfs_shortest_hops``, ``bellman_ford_min_cost``).

Why both forms exist in the corpus:

* The recursive CTE builds ONE analyzed plan — zero per-sweep
  Py4J/Catalyst driver work, so it cannot serialize across concurrent
  query streams (the failure mode the r10/r11 contention probes
  measured on the driver-looped family before the SQL-string fix).
* The driver loop keeps control-flow in Python — it can anti-join
  against the accumulated settled set, take per-sweep MIN labels, and
  exit the moment the frontier drains. Spark's recursion (4.1.2)
  supports UNION ALL only: no dedup against prior levels
  (``UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE``), no aggregates or window
  functions over the recursive reference
  (``INVALID_RECURSIVE_REFERENCE.PLACE``). ``SELECT DISTINCT`` in the
  recursive term IS allowed, which bounds each LEVEL but not the level
  COUNT — termination must come from an explicit guard column.

Engine-boundary measurements (this round, local[32], recorded in
SCALE.md): level-synchronous BFS fits the model perfectly (per-level
DISTINCT keeps every frontier ≤ |V|, hop guard terminates, 2.4 s warm
at sf0.1 ≈ the hand-tuned driver loop); label-correcting algorithms do
NOT — Bellman-Ford as a recursive CTE needs one level per unit of path
cost (≤ the cost bound, 80 levels) because dominated labels can't be
MIN-combined mid-recursion, and measured 42 s at sf0.01 vs 2.3 s for
the relaxation loop. So BFS/tree walks register here; Bellman-Ford
stays a driver loop by design.

Scale shape: each level is a keyed equi-join frontier ⋈ edges followed
by a level-local DISTINCT — state is partitioned by node key, nothing
is collected to the driver, and the recursion-depth guard (not data
volume) bounds the iteration count, exactly like the loop form. At
100 TB the same plan runs with cluster-sized shuffle partitions; the
``_loop_shuffle`` pin below is fixture-scale job-scheduling hygiene
(frontiers here are ≤ 512 rows).

Reference parity: the reference pipeline has no graph/hierarchy
operators — this family is part of the training-data-pipeline surface
(lineage walks, crawl frontiers, taxonomy rollups) the engine adds on
top (see SURVEY.md §2.7/§2.10 joins + set ops, which these compose).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from high_energy_gamma_ray_search_in_kascade_array_data_spark.queries.analytics_ext import (
    _BFS_MAX_HOPS,
    _BFS_N,
    _loop_shuffle,
    _residue_edges,
)
from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import register
from high_energy_gamma_ray_search_in_kascade_array_data_spark.sources.catalog import load_table

# Level count (recursion depth) the BFS CTE is allowed — mirrors the
# driver loop's _BFS_MAX_HOPS bound and the DuckDB oracle's guard. The
# graph's true eccentricity from source 0 is 15 (asserted with margin
# by tests/test_recursive.py), so the fixpoint is bound-independent
# for any guard ≥ 15.
_RCTE_HOP_GUARD = _BFS_MAX_HOPS


@register(
    "bfs_shortest_hops_rcte",
    survey_ref="§2.7,§2.10",
    oracle=f"""
WITH RECURSIVE edges AS (
  SELECT DISTINCT event_id % {_BFS_N} AS u, (event_id % {_BFS_N} * 31 + 7) % {_BFS_N} AS v
  FROM events
  UNION
  SELECT DISTINCT event_id % {_BFS_N}, (event_id % {_BFS_N} * 17 + 3) % {_BFS_N}
  FROM events
),
reach(node, hops) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION
  SELECT e.v, r.hops + 1
  FROM reach r JOIN edges e ON e.u = r.node
  WHERE r.hops < {_RCTE_HOP_GUARD}
)
SELECT node, CAST(MIN(hops) AS INTEGER) AS hops
FROM reach GROUP BY node
""",
)
def q_bfs_shortest_hops_rcte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS shortest hop counts — the SAME fixpoint as
    ``bfs_shortest_hops`` (``analytics_ext.py``) but evaluated
    entirely inside the engine with ``WITH RECURSIVE``: the anchor is
    the source row, each level is one keyed join (frontier ⋈ edges)
    with a level-local DISTINCT, and the final aggregate takes
    MIN(hops) per node across all levels (a node rediscovered at a
    deeper level is dominated there, not during the recursion —
    Spark's UNION ALL recursion cannot dedup against prior levels).
    ONE analyzed plan, zero per-sweep driver builds: under concurrent
    query streams nothing serializes on the Python side, which is this
    form's advantage over the loop (SCALE.md contention table).
    Termination: the hop-guard column (< _RCTE_HOP_GUARD = 20), with
    the graph's true eccentricity 15 asserted ≤ guard − 5 by the
    property test. The DuckDB oracle is the semi-naive UNION-dedup
    form — a third evaluation strategy agreeing on the same fixpoint,
    and byte-equal to the ``bfs_shortest_hops`` oracle so the two
    Spark strategies are checked against one truth."""
    edges = _residue_edges(spark, sf_dir)  # event-scale dedup at full parallelism
    with _loop_shuffle(spark, 4):
        return spark.sql(
            f"""
WITH RECURSIVE reach(node, hops) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION ALL
  SELECT DISTINCT e.v, r.hops + 1
  FROM reach r JOIN {{e}} e ON e.u = r.node
  WHERE r.hops < {_RCTE_HOP_GUARD}
)
SELECT node, CAST(MIN(hops) AS INT) AS hops
FROM reach GROUP BY node""",
            e=edges,
        )


# Parts "bill of materials" forest, derived deterministically from the
# contiguous part keys (FIXTURES.md-style): parent(k) = floor(k / 4)
# for k > 3; keys 0..3 are roots. A 4-ary forest of depth
# ~log4(|part|) — at sf0.01 depth 6, at a 100 TB part dimension depth
# ~17, always far under the recursion level limit (100).
_BOM_CTE = """
WITH RECURSIVE chains(part, node, depth, chain_cost) AS (
  SELECT p_partkey, p_partkey, 0, CAST(p_retailprice AS DOUBLE) FROM {part}
  UNION ALL
  SELECT c.part, par.p_partkey, c.depth + 1,
         c.chain_cost + CAST(par.p_retailprice AS DOUBLE)
  FROM chains c JOIN {part} par
    ON par.p_partkey = CAST(FLOOR(c.node / 4) AS BIGINT)
  WHERE c.node > 3
)
"""
_BOM_FINAL = """
SELECT part, node AS root, depth, ROUND(chain_cost, 2) AS chain_cost
FROM {chains} WHERE node <= 3
"""


@register(
    "bom_chain_rollup_rcte",
    survey_ref="§2.7,§2.6",
    oracle=_BOM_CTE.format(part="part") + _BOM_FINAL.format(chains="chains"),
)
def q_bom_chain_rollup_rcte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill-of-materials explosion — THE canonical recursive-CTE
    workload (assembly → component chains): for every part, walk the
    ancestor chain of a deterministic 4-ary forest (parent(k) =
    ⌊k/4⌋, roots 0–3) accumulating depth and the running sum of
    retail prices, emitting (part, root, depth, chain_cost) at the
    root. In a training-data pipeline this is the taxonomy/lineage
    rollup shape: per-document source-chain attribution, license
    inheritance, collection → shard → corpus cost accounting.
    Direction matters: the existing ``recursive_cte_bom_depth``
    (``relational_ext.py:1569``) DESCENDS from one root over its
    subtree; this query ASCENDS from every node to its root — the
    "find my lineage" direction, whose anchor is the whole dimension
    and whose per-level frontier SHRINKS as chains retire at roots.
    (``bom_subtree_rollup`` remains the closed-form scale path when
    the hierarchy function is known.)
    Spark form: anchor = every part (the walk starts at ALL nodes at
    once — one recursion computes all chains, not |V| traversals);
    each level joins the live chains to the part dimension on the
    derived parent key. The per-level join is dimension-sized and
    broadcast-able; chain state is partitioned by part key; depth is
    bounded by log4(|part|), so the level count grows logarithmically
    with data volume — the recursion that DEEPENS slower than the data
    grows is the one that survives 100 TB. Floating chain_cost is a
    left-to-right sum along the chain in both engines (identical
    association order), rounded to 2 decimals per corpus float rules.
    Recursion-volume guard, sized not disabled: the recursion emits
    one row per (part, ancestor) pair — Σ(depth+1) ≤ 33·|part| rows
    for ANY bigint keyspace (depth ≤ log4(2^63) < 32) — which trips
    Spark's default 1M-row runaway valve at a mere ~200k-row dimension
    (found by this repo's 10× sweep: RECURSION_ROW_LIMIT_EXCEEDED at
    sf1.0). The fix is the engine's own mechanism: a LIMIT directly
    over the CTE relation overrides the row valve IN THE PLAN — no
    session conf mutated (an execution-time conf would race under
    concurrent streams and outlive the builder), and the 100-level
    valve stays armed as the true runaway backstop (this recursion
    provably terminates within 32 levels by arithmetic, so a LIMIT
    truncation is unreachable — asserted at 10× by the sweep's
    exact-hash).
    Oracle: the byte-identical recursion under DuckDB (whose UNION ALL
    recursion has no row valve, so no LIMIT is needed there)."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    bound = 33 * part.count()  # dimension-scale count: bounded control-plane
    sql = (
        _BOM_CTE.format(part="{p}")
        + _BOM_FINAL.format(chains=f"(SELECT * FROM chains LIMIT {bound}) t")
    )
    with _loop_shuffle(spark, 8):
        return spark.sql(sql, p=part)
