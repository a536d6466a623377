"""Structural invariants for the analytics_ext operators — checked
against brute-force recomputation in plain Python at sf0.001,
independent of the DuckDB oracle (SURVEY §5.2 model: the oracle pins
cross-engine equality, these pin the SEMANTICS)."""

from __future__ import annotations

import math
from collections import defaultdict

import pyspark.sql.functions as F

from high_energy_gamma_ray_search_in_kascade_array_data_spark.queries import analytics_ext as ax
from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus
from high_energy_gamma_ray_search_in_kascade_array_data_spark.sources.catalog import load_table

_Q = corpus()


def test_skyline_is_exactly_the_undominated_set(spark, sf_dir):
    """Every skyline member is undominated and every non-member is
    dominated — brute force over the full part relation."""
    parts = [
        (r["p_partkey"], int(math.floor(r["p_retailprice"] * 100 + 0.5)), r["p_size"])
        for r in load_table(spark, sf_dir, "part").collect()
    ]
    def dominated(p):
        return any(
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
            for q in parts
        )
    expect = {(k, pc, sz) for (k, pc, sz) in parts if not dominated((k, pc, sz))}
    got = {
        (r["p_partkey"], r["price_c"], r["p_size"])
        for r in _Q["skyline_pareto"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_bfs_hops_are_a_valid_shortest_hop_labeling(spark, sf_dir):
    """BFS output: source at 0; every hop-h node has a predecessor at
    h-1; no edge crosses from a settled node to an unsettled one
    (closure is complete); hop counts never skip a level."""
    rows = _Q["bfs_shortest_hops"].fn(spark, sf_dir).collect()
    hops = {r["node"]: r["hops"] for r in rows}
    assert hops[0] == 0
    n = ax._BFS_N
    edges = defaultdict(set)
    for u in range(n):
        edges[u].add((u * 31 + 7) % n)
        edges[u].add((u * 17 + 3) % n)
    for node, h in hops.items():
        if h > 0:
            assert any(
                hops.get(p) == h - 1 and node in edges[p] for p in hops
            ), f"node {node} at hop {h} has no hop-{h-1} predecessor"
    for u in hops:
        for v in edges[u]:
            assert v in hops, f"reachable node {v} missing from closure"
            assert hops[v] <= hops[u] + 1, "hop labels skip a level"


def test_spatial_histogram_matches_brute_force(spark, sf_dir):
    """The grid-bucketed pair histogram equals the all-pairs brute
    force on the same scattered points."""
    def scatter(eid, m1, m2, mod):
        h = eid * m1 % 4294967296
        return ((h ^ (h // 65536)) * m2 % 4294967296) % mod
    ids = [
        r["event_id"]
        for r in load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 5 == 0)
        .select("event_id")
        .collect()
    ]
    pts = [(scatter(i, 2654435761, 49157, 997), scatter(i, 2246822519, 40503, 991)) for i in ids]
    expect: dict[int, int] = defaultdict(int)
    r2 = ax._SP_R * ax._SP_R
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            d2 = (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2
            if d2 <= r2:
                expect[d2] += 1
    got = {
        r["d2"]: r["n_pairs"]
        for r in _Q["spatial_grid_pair_histogram"].fn(spark, sf_dir).collect()
    }
    assert got == dict(expect)


def test_basket_pairs_are_oriented_and_supported(spark, sf_dir):
    rows = _Q["basket_pair_support"].fn(spark, sf_dir).collect()
    assert rows, "no frequent pairs — weak fixture"
    baskets = defaultdict(set)
    for r in (
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    ):
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    for r in rows:
        assert r["part_a"] < r["part_b"]
        true_support = sum(
            1 for b in baskets.values() if r["part_a"] in b and r["part_b"] in b
        )
        assert true_support == r["support"] >= 2


def test_ohlc_bars_are_internally_consistent(spark, sf_dir):
    rows = _Q["ohlc_candlestick"].fn(spark, sf_dir).collect()
    assert rows
    total = 0
    for r in rows:
        assert r["low"] <= min(r["open"], r["close"]) <= max(r["open"], r["close"]) <= r["high"]
        assert r["volume"] >= 1
        total += r["volume"]
    assert total == load_table(spark, sf_dir, "events").count()


def test_time_weighted_average_is_bounded_by_value_range(spark, sf_dir):
    rows = _Q["time_weighted_average"].fn(spark, sf_dir).collect()
    bounds = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in rows:
        lo, hi = bounds[r["event_type"]]
        assert lo - 0.01 <= r["twa"] <= hi + 0.01
        assert r["total_s"] > 0


def test_mad_outliers_are_a_strict_minority(spark, sf_dir):
    for r in _Q["mad_outlier_events"].fn(spark, sf_dir).collect():
        assert r["mad_value"] >= 0
        # by definition of the median fence, >50% of points sit within
        # 1 MAD, so the 3-MAD fence can never flag a majority
        assert r["n_outliers"] < r["n"] / 2


def test_kmeans_partitions_all_points_into_k_clusters(spark, sf_dir):
    rows = _Q["kmeans_lloyd_integer"].fn(spark, sf_dir).collect()
    n_emb = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n"] for r in rows) == n_emb
    assert len(rows) == ax._KM_K
    assert all(r["inertia"] >= 0 for r in rows)


def test_repeated_passages_really_repeat(spark, sf_dir):
    """Every mined shingle occurs in ≥2 distinct documents' text."""
    rows = _Q["repeated_passage_mining"].fn(spark, sf_dir).limit(20).collect()
    assert rows
    docs = [
        (r["doc_id"], r["text"])
        for r in load_table(spark, sf_dir, "documents").collect()
    ]
    for r in rows:
        holders = {d for d, t in docs if r["sg"] in t}
        assert len(holders) >= r["n_docs"] >= 2


def test_bellman_ford_labels_satisfy_triangle_inequality(spark, sf_dir):
    """Min-cost labels: source 0; every label is tight (achieved via
    some in-edge) and no edge can relax further; the oracle's cost
    bound leaves margin above the true maximum."""
    rows = _Q["bellman_ford_min_cost"].fn(spark, sf_dir).collect()
    cost = {r["node"]: r["cost"] for r in rows}
    assert cost[0] == 0
    n = ax._BFS_N
    edges = {}
    for u in range(n):
        for v in ((u * 31 + 7) % n, (u * 17 + 3) % n):
            w = 1 + (u + v) % 7
            edges.setdefault(u, {})[v] = min(edges.get(u, {}).get(v, w), w)
    for u, c in cost.items():
        for v, w in edges[u].items():
            assert cost[v] <= c + w, f"edge {u}->{v} can still relax"
        if c > 0:
            assert any(
                cost.get(p) is not None and v == u and cost[p] + w == c
                for p in cost
                for v, w in edges[p].items()
            ), f"label of {u} not achieved by any in-edge"
    assert max(cost.values()) + max(w for d in edges.values() for w in d.values()) \
        <= ax._BF_COST_BOUND, "oracle cost bound has no safety margin"


def test_prefix_join_equals_brute_force_similarity(spark, sf_dir):
    """The PPJoin prefix filter is LOSSLESS: its output equals the
    all-pairs brute force (same shingles, same threshold) — the
    property that separates it from MinHash-LSH's probabilistic
    recall."""
    rows = _Q["set_similarity_prefix_join"].fn(spark, sf_dir).collect()
    got = {(r["doc_a"], r["doc_b"]): r["n_common"] for r in rows}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    sets = {}
    for r in docs:
        w = r["text"].split(" ")
        if len(w) >= 3:
            sets[r["doc_id"]] = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
    ids = sorted(sets)
    expect = {}
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            inter = len(sets[da] & sets[db])
            if 3 * inter >= len(sets[da]) + len(sets[db]):
                expect[(da, db)] = inter
    assert got == expect
    assert expect, "no similar pairs at this SF — weak fixture"


def test_curation_funnel_partitions_the_corpus(spark, sf_dir):
    """Disposition precedence is first-gate-wins, so the report is a
    partition of documents: doc and token totals across statuses equal
    the whole table's."""
    rows = _Q["corpus_curation_report"].fn(spark, sf_dir).collect()
    d = load_table(spark, sf_dir, "documents")
    totals = d.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.split("text", " "))).alias("toks"),
    ).collect()[0]
    assert sum(r["n_docs"] for r in rows) == totals["n"]
    assert sum(r["total_tokens"] for r in rows) == totals["toks"]
    statuses = {r["status"] for r in rows}
    assert "kept" in statuses and "eval_holdout" in statuses
    for r in rows:
        if r["status"] != "kept":
            assert r["n_bins"] == 0


def test_attribution_conserves_purchase_value(spark, sf_dir):
    """Linear attribution credits sum EXACTLY to total purchase value
    in millicents — the integer split loses nothing."""
    rows = _Q["multi_touch_attribution"].fn(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint") * 1000).alias("t")
    ).collect()[0]["t"]
    assert sum(r["credited_millicents"] for r in rows) == total
    assert {r["event_type"] for r in rows} >= {"(direct)"}


def test_clamped_balance_is_nonlinear_and_bounded(spark, sf_dir):
    """The clamp genuinely changes results vs max(sum,0) for a
    nontrivial share of users, and every balance is ≥ 0 and ≤ total
    positive inflow."""
    rows = _Q["clamped_inventory_balance"].fn(spark, sf_dir).collect()
    got = {r["user_id"]: r["final_balance_cents"] for r in rows}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    ).collect()
    from collections import defaultdict
    seqs = defaultdict(list)
    for r in ev:
        vc = math.floor(r["value"] * 100 + 0.5)
        d = -3 * vc if r["event_type"] == "purchase" else vc
        seqs[r["user_id"]].append((r["ts"], r["event_id"], d))
    differs = 0
    for uid, seq in seqs.items():
        seq.sort()
        bal, tot_pos = 0, 0
        for _, _, d in seq:
            bal = max(bal + d, 0)
            tot_pos += max(d, 0)
        assert got[uid] == bal
        assert 0 <= bal <= tot_pos
        if bal != max(sum(d for _, _, d in seq), 0):
            differs += 1
    assert differs > 0, "clamp never fired — degenerate fixture"


def test_kcore_peel_is_a_partition_with_margin(spark, sf_dir):
    """Peel rounds partition the vertex set (this graph has no
    4-core), rounds are contiguous from 1, and the fixpoint lands
    well inside the oracle's unroll budget."""
    rows = _Q["kcore_peel_profile"].fn(spark, sf_dir).collect()
    by_round = {r["peel_round"]: r["n_peeled"] for r in rows}
    assert sum(by_round.values()) == ax._BFS_N
    assert sorted(by_round) == list(range(1, max(by_round) + 1))
    assert max(by_round) + 2 <= ax._KCORE_ROUNDS, "no fixpoint margin"
