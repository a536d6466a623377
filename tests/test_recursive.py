"""Recursive-CTE family (queries/recursive.py): the engine-side
fixpoint strategy must (a) produce the UnionLoop operator (i.e. the
recursion really is engine-evaluated, not planner-flattened), (b) agree
bit-for-bit with the driver-looped strategy on the same fixpoint, and
(c) keep its termination guard at a safe margin above the graph's true
eccentricity — the guard is the ONLY terminator Spark's UNION ALL
recursion has (no dedup against prior levels), so the margin is a
correctness property, not a tuning knob."""

from __future__ import annotations

from high_energy_gamma_ray_search_in_kascade_array_data_spark.plans import physical_plan
from high_energy_gamma_ray_search_in_kascade_array_data_spark.queries.recursive import _RCTE_HOP_GUARD
from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus

_C = corpus()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_bfs_rcte_plan_is_engine_side_recursion(spark, sf_dir):
    """The logical WITH RECURSIVE must survive to a UnionLoop physical
    operator — if Catalyst ever rewrote it into something driver-visible
    (or a future version silently unrolled it), this query's zero-
    per-sweep-Py4J property would be gone."""
    df = _C["bfs_shortest_hops_rcte"].fn(spark, sf_dir)
    assert "UnionLoop" in physical_plan(df)


def test_bfs_rcte_matches_driver_loop_fixpoint(spark, sf_dir):
    """Two genuinely different evaluation strategies (engine-side
    level-synchronous recursion vs Python relaxation sweeps with
    anti-join settling) must reach the identical (node, hops) fixpoint."""
    rcte = _rows(_C["bfs_shortest_hops_rcte"].fn(spark, sf_dir))
    loop = _rows(_C["bfs_shortest_hops"].fn(spark, sf_dir))
    assert rcte == loop


def test_bfs_rcte_guard_margin_over_eccentricity(spark, sf_dir):
    """max(min-hops) — the eccentricity of source 0 — must sit at
    least 5 levels under the recursion guard, so a small drift in the
    derived graph can't silently truncate the fixpoint."""
    rows = _C["bfs_shortest_hops_rcte"].fn(spark, sf_dir).collect()
    ecc = max(r["hops"] for r in rows)
    assert ecc <= _RCTE_HOP_GUARD - 5, (ecc, _RCTE_HOP_GUARD)
    # and the recursion actually needed multiple levels (non-vacuous)
    assert ecc >= 2


def test_bom_rollup_chain_invariants(spark, sf_dir):
    """Every part appears exactly once, every chain terminates at a
    root key in 0..3, and depth is the exact base-4 logarithm of the
    part key (the forest is parent(k)=floor(k/4), so depth(k) =
    number of divisions by 4 until reaching <= 3)."""
    rows = _C["bom_chain_rollup_rcte"].fn(spark, sf_dir).collect()
    parts = [r["part"] for r in rows]
    assert len(parts) == len(set(parts))
    for r in rows:
        k, depth = r["part"], 0
        while k > 3:
            k //= 4
            depth += 1
        assert r["root"] == k and r["depth"] == depth, dict(r.asDict())


def test_bom_rollup_plan_is_engine_side_recursion(spark, sf_dir):
    df = _C["bom_chain_rollup_rcte"].fn(spark, sf_dir)
    assert "UnionLoop" in physical_plan(df)
