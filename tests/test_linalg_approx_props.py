"""Structural invariants for the linalg and approx_ops families —
brute-force Python recomputation at sf0.001, independent of the DuckDB
oracle (SURVEY §5.2 model: the oracle pins cross-engine equality, these
pin the SEMANTICS)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pyspark.sql.functions as F

from high_energy_gamma_ray_search_in_kascade_array_data_spark.queries import linalg
from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus
from high_energy_gamma_ray_search_in_kascade_array_data_spark.sources.catalog import load_table

_Q = corpus()


def _embedding_matrix(spark, sf_dir, scale):
    rows = load_table(spark, sf_dir, "embeddings").select("embedding").collect()
    return np.array(
        [[math.floor(float(x) * scale) for x in r["embedding"]] for r in rows],
        dtype=object,  # exact Python ints — no float64 rounding in the check
    )


def test_gram_matrix_equals_numpy_exact(spark, sf_dir):
    """G(i,j) from the distributed suff-stats reduction equals the
    dense XᵀX computed with exact integer arithmetic."""
    x = _embedding_matrix(spark, sf_dir, 4096)
    got = {
        (r["i"], r["j"]): r["g"]
        for r in _Q["gram_matrix_embeddings"].fn(spark, sf_dir).collect()
    }
    assert len(got) == 64 * 65 // 2
    # spot-check full first row + diagonal (full 2080-cell check is slow in
    # object-dtype numpy; these cover both triangle orientations)
    for j in range(64):
        assert got[(0, j)] == int(sum(int(a) * int(b) for a, b in zip(x[:, 0], x[:, j])))
        assert got[(j, j)] == int(sum(int(a) * int(a) for a in x[:, j]))


def test_power_iteration_is_rayleigh_quotient_of_one_step(spark, sf_dir):
    """λ̂ must equal (v₁ᵀAv₁)/(v₁ᵀv₁) for v₁ = A·1 computed densely, and
    must lower-bound the true spectral radius (Rayleigh inequality)."""
    x = _embedding_matrix(spark, sf_dir, 64)
    a = np.zeros((64, 64), dtype=object)
    for i in range(64):
        for j in range(i, 64):
            g = int(sum(int(p) * int(q) for p, q in zip(x[:, i], x[:, j])))
            a[i, j] = g
            a[j, i] = g
    v1 = a.sum(axis=1)
    v2 = a @ v1
    num = int(sum(int(p) * int(q) for p, q in zip(v1, v2)))
    den = int(sum(int(p) * int(p) for p in v1))
    row = _Q["power_iteration_eigen"].fn(spark, sf_dir).collect()[0]
    assert row["n_dims"] == 64
    assert row["lambda_est"] == round(num / den, 6)
    af = np.array([[float(v) for v in r] for r in a])
    lam_true = max(abs(np.linalg.eigvalsh(af)))
    assert row["lambda_est"] <= lam_true * (1 + 1e-9)


def test_ridge_betas_solve_the_normal_equations(spark, sf_dir):
    """β returned by Cramer must satisfy (XᵀX + λI)β = Xᵀy to float
    precision when recomputed densely."""
    rows = load_table(spark, sf_dir, "events").select("event_id", "value").collect()
    feats = [
        (1.0, float(r["event_id"] * 131 % 2500), float(r["event_id"] * 17 % 45),
         float(math.floor(r["value"] * 64)))
        for r in rows
    ]
    xm = np.array([[a, b, c] for a, b, c, _ in feats])
    y = np.array([v for *_, v in feats])
    a = xm.T @ xm + 1000 * np.eye(3)
    beta = np.linalg.solve(a, xm.T @ y)
    got = _Q["ridge_normal_equations"].fn(spark, sf_dir).collect()[0]
    assert got["n"] == len(feats)
    for k in range(3):
        assert abs(got[f"beta{k}"] - beta[k]) < 1e-4


def test_pps_sample_hits_each_stratum_exactly_k_and_respects_weights(spark, sf_dir):
    """Exactly k=5 draws per language stratum; each drawn doc's weight
    interval must contain its systematic offset."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars"
    ).collect()
    by_lang = defaultdict(list)
    for r in docs:
        by_lang[r["lang"]].append((r["doc_id"], r["n_chars"]))
    got = _Q["pps_systematic_sample"].fn(spark, sf_dir).collect()
    seen = defaultdict(set)
    for r in got:
        seen[r["lang"]].add(r["m"])
    for lang, rows in by_lang.items():
        assert seen[lang] == set(range(5)), lang
    for r in got:
        rows = sorted(by_lang[r["lang"]])
        total = sum(w for _, w in rows)
        t = (total * (2 * r["m"] + 1)) // 10
        cum = 0
        for doc_id, w in rows:
            if cum <= t < cum + w:
                assert doc_id == r["doc_id"]
                break
            cum += w


def test_count_min_never_undercounts_and_exact_matches_counter(spark, sf_dir):
    """CMS guarantee: estimate ≥ exact for every probe; exact counts
    match a Python Counter of the same tokenization."""
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    cnt = Counter(
        t for r in docs for t in r["text"].split(" ") if len(t) >= 3
    )
    got = _Q["count_min_sketch_estimate"].fn(spark, sf_dir).collect()
    assert len(got) == 20
    for r in got:
        assert cnt[r["tok"]] == r["exact_n"]
        assert r["cms_est"] >= r["exact_n"]
        assert r["overcount"] == r["cms_est"] - r["exact_n"]


def test_bloom_has_no_false_negatives(spark, sf_dir):
    """Every true match must be a candidate (Bloom filters never have
    false negatives) and the counts must be internally consistent."""
    row = _Q["bloom_semijoin_reduction"].fn(spark, sf_dir).collect()[0]
    assert row["candidates"] >= row["true_matches"]
    assert row["false_positives"] == row["candidates"] - row["true_matches"]
    assert 0 < row["bits_set"] <= min(3 * row["n_dim"], 16384)


def test_zone_map_clustered_layout_skips_at_least_as_much(spark, sf_dir):
    """Value-clustering can only improve min/max skipping for a value
    predicate, and skipped rows must actually contain no matches."""
    rows = {r["layout"]: r for r in _Q["zone_map_skipping_stats"].fn(spark, sf_dir).collect()}
    assert rows["value_clustered"]["files_skipped"] >= rows["row_order"]["files_skipped"]
    assert rows["row_order"]["rows_total"] == rows["value_clustered"]["rows_total"]
    ev = load_table(spark, sf_dir, "events").select("event_id", "value").collect()
    n_match = sum(1 for r in ev if 100.0 <= r["value"] <= 120.0)
    for r in rows.values():
        assert r["rows_total"] - r["rows_skipped"] >= n_match


def test_inverted_index_postings_rank_and_truncate_correctly(spark, sf_dir):
    """Posting lists hold the true top-5 docs by (tf desc, doc asc) and
    df/total_tf match a brute-force index."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    tf = defaultdict(Counter)
    for r in docs:
        for t in r["text"].split(" "):
            if len(t) >= 3:
                tf[t][r["doc_id"]] += 1
    got = _Q["inverted_index_postings"].fn(spark, sf_dir).collect()
    expect_terms = {t for t, c in tf.items() if len(c) >= 3}
    assert {r["term"] for r in got} == expect_terms
    for r in got:
        c = tf[r["term"]]
        assert r["df"] == len(c)
        assert r["total_tf"] == sum(c.values())
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        assert r["postings"] == " ".join(f"{d}:{n}" for d, n in top)


def test_tok_hash_spark_sql_forms_agree(spark, sf_dir):
    """The unrolled polynomial hash must be identical through both
    generators (the Spark Column builder and the SQL string builder)."""
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.queries.approx_ops import _tok_hash_spark, _tok_hash_sql

    toks = ["a", "abc", "abcdefgh", "abcdefghijklmno", "zzz9", "with-dash"]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    spark_h = [r[0] for r in df.select(_tok_hash_spark(F.col("tok"))).collect()]
    import duckdb

    sql_h = [
        duckdb.sql(f"SELECT {_tok_hash_sql(repr(t))}").fetchone()[0] for t in toks
    ]
    assert spark_h == sql_h
