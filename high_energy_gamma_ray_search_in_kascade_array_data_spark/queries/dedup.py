"""Oracle-checked corpus wrappers for the MinHash-LSH / SimHash dedup
operators (operators/dedup.py). Every hash is exact integer arithmetic
over a deterministic token-id dictionary, so DuckDB reproduces Spark's
"random" hashes bit-for-bit — the full near-dup pipeline is
differential-tested end-to-end, not just rows-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from high_energy_gamma_ray_search_in_kascade_array_data_spark.operators import dedup
from high_energy_gamma_ray_search_in_kascade_array_data_spark.operators.dedup import (
    A,
    B,
    N_HASH,
    P,
    SIMHASH_BITS,
    SIMHASH_MULT,
)
from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import register
from high_energy_gamma_ray_search_in_kascade_array_data_spark.sources.catalog import load_table

# Shared oracle CTE: 3-gram shingle sets → deterministic integer
# vocab → ids (mirrors operators/dedup.py doc_token_ids(shingle=3)).
TID_CTE = """
tok_arrays AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE LEN(string_split(text, ' ')) >= 3
),
toks AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS tok
  FROM tok_arrays, UNNEST(range(1, LEN(t)-1)) AS r(i)
),
vocab AS (
  SELECT tok,
         ROW_NUMBER() OVER (PARTITION BY ascii(tok) % 256 ORDER BY tok) * 256
           + ascii(tok) % 256 AS tok_id
  FROM (SELECT DISTINCT tok FROM toks) v
),
tid AS (SELECT doc_id, tok_id FROM toks JOIN vocab USING (tok))"""

# tok_id % P first: bucketed vocab ids (and xxhash64 ids on the fast
# path) exceed P, and A·x must not overflow — mirrors operators/dedup.py
_SIG_COLS = ",\n         ".join(
    f"MIN(({A[i]}*(tok_id%{P})+{B[i]})%{P}) AS mh_{i}" for i in range(N_HASH)
)
SIG_CTE = f"""
sig AS (
  SELECT doc_id,
         {_SIG_COLS}
  FROM tid GROUP BY doc_id
)"""

_BANDS = "\n  UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, mh_{2 * b}*{P}+mh_{2 * b + 1} AS key FROM sig"
    for b in range(N_HASH // 2)
)


@register(
    "minhash_signatures",
    survey_ref="M5:dedup",
    oracle=f"""
WITH {TID_CTE},
{SIG_CTE}
SELECT doc_id, {", ".join(f"CAST(mh_{i} AS BIGINT) AS mh_{i}" for i in range(N_HASH))}
FROM sig
""",
)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-wide MinHash signature per document over the token-id set."""
    d = load_table(spark, sf_dir, "documents")
    tid = dedup.doc_token_ids(d)
    sig = dedup.minhash_signatures(tid)
    return sig.select("doc_id", *[F.col(f"mh_{i}").cast("long").alias(f"mh_{i}") for i in range(N_HASH)])


# Shared oracle for BOTH near-dup variants: the verified output
# (doc_a, doc_b, n_inter, jaccard over token *sets*) is invariant to
# the token-id mapping, so the dictionary-variant SQL also oracles the
# xxhash64 fast path — PROVIDED both hash families surface the same
# candidate pairs. At 8 bands × 2 rows a true near-dup pair (j ≥ 0.85)
# is missed with P ≤ 4e-6 per family, and
# tests/test_properties.py::test_minhash_fast_agrees_with_dictionary_variant
# guards the recall equivalence; if it ever diverges, widen bands.
_NEARDUP_ORACLE = f"""
WITH {TID_CTE},
{SIG_CTE},
bands AS (
  {_BANDS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
counts AS (SELECT doc_id, COUNT(*) AS n FROM tid GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN tid ta ON ta.doc_id = c.doc_a
  JOIN tid tb ON tb.doc_id = c.doc_b AND tb.tok_id = ta.tok_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, CAST(i.n_inter AS BIGINT) AS n_inter,
       ROUND(i.n_inter * 1.0 / (ca.n + cb.n - i.n_inter), 6) AS jaccard
FROM inter i
JOIN counts ca ON ca.doc_id = i.doc_a
JOIN counts cb ON cb.doc_id = i.doc_b
WHERE ROUND(i.n_inter * 1.0 / (ca.n + cb.n - i.n_inter), 6) >= 0.5
"""


@register("minhash_lsh_neardup", survey_ref="M5:dedup", oracle=_NEARDUP_ORACLE)
def q_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dup pipeline: minhash → LSH bands → bucket-join
    candidates → exact Jaccard verify at threshold 0.5."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_near_duplicates(d, threshold=0.5)


@register("minhash_lsh_neardup_fast", survey_ref="M5:dedup", oracle=_NEARDUP_ORACLE)
def q_minhash_lsh_neardup_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production 100 TB near-dup path: shingles hash straight
    through xxhash64 (no dictionary stage, no vocab window, no
    broadcast); plan otherwise identical to minhash_lsh_neardup. Its
    verified output is token-id-mapping-invariant, so it shares the
    dictionary variant's oracle (see _NEARDUP_ORACLE comment for the
    recall-equivalence argument)."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_near_duplicates_fast(d, threshold=0.5)


_VOTES = ",\n    ".join(
    f"SUM(CASE WHEN ((((tok_id*{SIMHASH_MULT})%{1 << SIMHASH_BITS}) >> {j}) & 1) = 1 "
    f"THEN 1 ELSE -1 END) AS v_{j}"
    for j in range(SIMHASH_BITS)
)
_FP = " + ".join(
    f"(CASE WHEN v_{j} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
)


@register(
    "simhash_fingerprints",
    survey_ref="M5:dedup",
    oracle=f"""
WITH {TID_CTE},
votes AS (
  SELECT doc_id,
    {_VOTES}
  FROM tid GROUP BY doc_id
)
SELECT doc_id, CAST({_FP} AS BIGINT) AS simhash
FROM votes
""",
)
def q_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document (near-dup docs agree on most bits;
    Hamming-ball blocking is then a groupBy on bit-slices)."""
    d = load_table(spark, sf_dir, "documents")
    tid = dedup.doc_token_ids(d)
    return dedup.simhash_fingerprints(tid)


# the verified near-dup edge set, shared by the components oracles and
# the triangle count
_VERIFIED_EDGES_CTES = f"""{TID_CTE},
{SIG_CTE},
bands AS (
  {_BANDS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
counts AS (SELECT doc_id, COUNT(*) AS n FROM tid GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN tid ta ON ta.doc_id = c.doc_a
  JOIN tid tb ON tb.doc_id = c.doc_b AND tb.tok_id = ta.tok_id
  GROUP BY 1, 2
),
verified AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN counts ca ON ca.doc_id = i.doc_a
  JOIN counts cb ON cb.doc_id = i.doc_b
  WHERE i.n_inter * 1.0 / (ca.n + cb.n - i.n_inter) >= 0.5
)"""


@register(
    "dup_graph_triangles",
    survey_ref="M5:dedup,§2.7",
    oracle=f"""
WITH {_VERIFIED_EDGES_CTES.replace("verified AS (", "verified AS MATERIALIZED (", 1)}
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM verified e1
JOIN verified e2 ON e2.doc_a = e1.doc_b
JOIN verified e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
""",
)
def q_dup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the verified near-dup graph — the graph
    statistic that separates clique-like duplicate clusters (many
    triangles → safe to collapse) from chain-like borderline matches
    (few → review before deleting). Edges are canonical (a<b), so each
    triangle is counted exactly once by the two equi-joins; no
    cartesian, cost bounded by the candidate-pair graph, the standard
    distributed triangle-count join plan."""
    d = load_table(spark, sf_dir, "documents")
    # localCheckpoint, not persist: three join branches reuse the edge
    # set once-materialized, and the blocks free with the DataFrame
    # instead of pinning cache for the session lifetime
    e = (
        dedup.minhash_near_duplicates(d, threshold=0.5)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    e1 = e.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = e.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    e3 = e.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


# shared by the propagation and star-contraction queries: the oracle
# derives components algorithm-agnostically (recursive transitive
# closure), so both Spark engines must match it — and therefore each
# other — under the driver's hash gate.
_NEARDUP_COMPONENTS_ORACLE = f"""
WITH RECURSIVE {TID_CTE},
{SIG_CTE},
bands AS (
  {_BANDS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
counts AS (SELECT doc_id, COUNT(*) AS n FROM tid GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN tid ta ON ta.doc_id = c.doc_a
  JOIN tid tb ON tb.doc_id = c.doc_b AND tb.tok_id = ta.tok_id
  GROUP BY 1, 2
),
verified AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN counts ca ON ca.doc_id = i.doc_a
  JOIN counts cb ON cb.doc_id = i.doc_b
  WHERE i.n_inter * 1.0 / (ca.n + cb.n - i.n_inter) >= 0.5
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM verified
  UNION ALL
  SELECT doc_b, doc_a FROM verified
),
reach(u, v) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) s
  UNION
  SELECT e.u, r.v FROM edges e JOIN reach r ON r.u = e.v
)
SELECT CAST(u AS BIGINT) AS doc_id, CAST(MIN(v) AS BIGINT) AS component
FROM reach GROUP BY u
"""


@register(
    "neardup_components",
    survey_ref="M5:dedup,§2.10",
    oracle=_NEARDUP_COMPONENTS_ORACLE,
)
def q_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: the verified MinHash-LSH pair graph
    collapsed into connected components by iterative min-label
    propagation (operators/dedup.py::connected_components). The oracle
    computes the same components as a WITH RECURSIVE transitive
    closure — O(V·E), fine for an oracle, unusable at scale; the Spark
    loop is the distributed form (join + partial-agg per sweep,
    lineage cut per iteration). Propagation is the right engine HERE
    because LSH dup graphs are near-cliques (diameter ~2); for deep or
    unknown topologies the star query below is the drop-in."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(d, threshold=0.5)
    comp = dedup.connected_components(pairs)
    return comp.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
    )


@register(
    "neardup_components_star",
    survey_ref="M5:dedup,§2.10",
    oracle=_NEARDUP_COMPONENTS_ORACLE,
)
def q_neardup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same clustering through large-star/small-star contraction
    (operators/dedup.py::connected_components_star, Kiveris et al.) —
    O(log n) rounds on ANY topology where propagation needs
    O(diameter). Identical oracle to neardup_components: the driver
    gate proves both distributed engines agree with the exact
    transitive closure, hence with each other."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(d, threshold=0.5)
    comp = dedup.connected_components_star(pairs)
    return comp.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
    )


@register(
    "neardup_keep_best",
    survey_ref="M5:dedup,A8,§2.7",
    oracle=f"""
WITH {TID_CTE},
{SIG_CTE},
bands AS (
  {_BANDS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
counts AS (SELECT doc_id, COUNT(*) AS n FROM tid GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN tid ta ON ta.doc_id = c.doc_a
  JOIN tid tb ON tb.doc_id = c.doc_b AND tb.tok_id = ta.tok_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN counts ca ON ca.doc_id = i.doc_a
  JOIN counts cb ON cb.doc_id = i.doc_b
  WHERE ROUND(i.n_inter * 1.0 / (ca.n + cb.n - i.n_inter), 6) >= 0.5
),
lens AS (SELECT doc_id, LENGTH(text) AS len FROM documents),
losers AS (
  SELECT CASE WHEN la.len > lb.len THEN p.doc_b
              WHEN lb.len > la.len THEN p.doc_a
              ELSE p.doc_b END AS doc_id
  FROM pairs p
  JOIN lens la ON la.doc_id = p.doc_a
  JOIN lens lb ON lb.doc_id = p.doc_b
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lost_pairs
FROM losers GROUP BY doc_id ORDER BY doc_id
""",
)
def q_neardup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVIVOR SELECTION on top of the near-dup pipeline — the step a
    dedup actually ships: for every verified duplicate pair, keep the
    BETTER document (longer text; ties break to the smaller doc_id so
    re-runs keep the same survivor) and mark the other for removal.
    The output is the drop list with per-doc pair counts; the keyed
    joins move the bounded pair set and one (doc_id, len) relation —
    the fact-scale shuffles remain the signature aggregate and band
    exchange already audited in operators/dedup.py."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(d, threshold=0.5).select("doc_a", "doc_b")
    lens = d.select("doc_id", F.length("text").alias("len"))
    la = lens.select(F.col("doc_id").alias("doc_a"), F.col("len").alias("len_a"))
    lb = lens.select(F.col("doc_id").alias("doc_b"), F.col("len").alias("len_b"))
    loser = (
        F.when(F.col("len_a") > F.col("len_b"), F.col("doc_b"))
        .when(F.col("len_b") > F.col("len_a"), F.col("doc_a"))
        .otherwise(F.col("doc_b"))
    )
    return (
        pairs.join(la, "doc_a")
        .join(lb, "doc_b")
        .select(loser.alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_lost_pairs"))
        .orderBy("doc_id")
    )


@register(
    "dup_graph_clustering_coefficient",
    survey_ref="M5:dedup,§2.7,§2.8",
    oracle=f"""
WITH {_VERIFIED_EDGES_CTES.replace("verified AS (", "verified AS MATERIALIZED (", 1)},
sym AS (
  SELECT doc_a AS v, doc_b AS nbr FROM verified
  UNION ALL SELECT doc_b AS v, doc_a AS nbr FROM verified
),
deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS degree FROM sym GROUP BY v),
tri AS (
  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
  FROM verified e1
  JOIN verified e2 ON e2.doc_a = e1.doc_b
  JOIN verified e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
),
tv AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
    SELECT a AS v FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
  ) GROUP BY v
)
SELECT d.v AS doc_id, d.degree,
       CAST(d.degree * (d.degree - 1) / 2 AS BIGINT) AS n_wedges,
       CAST(COALESCE(tv.n_triangles, 0) AS BIGINT) AS n_triangles,
       ROUND(CASE WHEN d.degree >= 2
                  THEN 2.0 * COALESCE(tv.n_triangles, 0) / (d.degree * (d.degree - 1))
                  ELSE 0.0 END, 6) AS coeff
FROM deg d LEFT JOIN tv ON tv.v = d.v
ORDER BY doc_id
""",
)
def q_dup_graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node CLUSTERING COEFFICIENT over the verified near-dup
    graph: 2·triangles(v) / (deg·(deg−1)) — the local density measure
    that tells a dedup reviewer whether a node sits in a clique-like
    duplicate cluster (coeff → 1, collapse confidently) or bridges
    otherwise-unrelated chains (coeff → 0, review before deleting).
    Triangles and wedges ship as exact integers; the coefficient is
    one rounded division.  Same bounded join plan as
    ``dup_graph_triangles`` plus a degree aggregate — nothing beyond
    the candidate-pair graph is ever shuffled."""
    d = load_table(spark, sf_dir, "documents")
    e = (
        dedup.minhash_near_duplicates(d, threshold=0.5)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    sym = e.select(F.col("doc_a").alias("v")).unionAll(
        e.select(F.col("doc_b").alias("v"))
    )
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("degree"))
    e1 = e.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = e.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    e3 = e.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    tv = (
        tri.select(F.col("a").alias("v"))
        .unionAll(tri.select(F.col("b").alias("v")))
        .unionAll(tri.select(F.col("c").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    j = deg.join(tv, "v", "left").select(
        F.col("v").alias("doc_id"),
        "degree",
        (F.col("degree") * (F.col("degree") - 1) / 2).cast("long").alias("n_wedges"),
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias("n_triangles"),
        F.round(
            F.when(
                F.col("degree") >= 2,
                2.0
                * F.coalesce(F.col("n_triangles"), F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
            ).otherwise(0.0),
            6,
        ).alias("coeff"),
    )
    return j.orderBy("doc_id")


_LSH_PRECISION_ORACLE = f"""
WITH {TID_CTE},
{SIG_CTE},
bands AS (
  {_BANDS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
counts AS (SELECT doc_id, COUNT(*) AS n FROM tid GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN tid ta ON ta.doc_id = c.doc_a
  JOIN tid tb ON tb.doc_id = c.doc_b AND tb.tok_id = ta.tok_id
  GROUP BY 1, 2
),
scored AS (
  SELECT i.doc_a, i.doc_b,
         ROUND(i.n_inter * 1.0 / (ca.n + cb.n - i.n_inter), 6) AS jaccard
  FROM inter i
  JOIN counts ca ON ca.doc_id = i.doc_a
  JOIN counts cb ON cb.doc_id = i.doc_b
),
base AS (
  SELECT CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
         CAST(COUNT(*) AS BIGINT) AS n_scored,
         CAST(SUM(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_true
  FROM scored
)
SELECT n_candidates, n_true,
       ROUND(n_true * 1.0 / n_candidates, 6) AS precision_at_band
FROM base
"""


@register("lsh_candidate_precision", survey_ref="M5:dedup,§2.6", oracle=_LSH_PRECISION_ORACLE)
def q_lsh_candidate_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH index-quality evaluation for the dedup pipeline: of all
    candidate pairs the 8-band/2-row banding emits, what fraction
    survives exact Jaccard >= 0.5 — the precision knob that decides
    whether the banding is too loose (verify cost explodes) or too
    tight (recall loss), read alongside the retrieval-side
    ``ann_recall_at_k``. Candidate count, true-pair count, precision.

    Scale shape: identical candidate generation to
    ``minhash_lsh_neardup`` (signature aggregate + bounded band-bucket
    self-join — never all-pairs); the evaluation adds only a 1-row
    rollup on top of the verify join, so the eval costs what the
    pipeline itself costs."""
    d = load_table(spark, sf_dir, "documents")
    tid = dedup.doc_token_ids(d)
    sig = dedup.minhash_signatures(tid)
    cand = dedup.lsh_candidate_pairs(sig)
    sets_df = dedup.token_sets(tid)
    verified = dedup.jaccard_verify(cand, sets_df)
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    agg = verified.agg(
        F.sum(F.when(F.col("jaccard") >= 0.5, 1).otherwise(0)).alias("n_true")
    )
    return (
        n_cand.crossJoin(agg)
        .select(
            "n_candidates",
            F.col("n_true").cast("long").alias("n_true"),
            F.round(F.col("n_true") * 1.0 / F.col("n_candidates"), 6).alias(
                "precision_at_band"
            ),
        )
    )


@register(
    "neardup_cross_source_matrix",
    survey_ref="M5:dedup,§2.6,§2.7",
    oracle=f"""
WITH pairs AS ({_NEARDUP_ORACLE})
SELECT LEAST(da.source, db.source) AS source_a,
       GREATEST(da.source, db.source) AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CAST(ROUND(p.jaccard * 1000000) AS BIGINT)) AS BIGINT) AS jaccard_micro_sum,
       ROUND(SUM(CAST(ROUND(p.jaccard * 1000000) AS BIGINT)) / (COUNT(*) * 1000000.0), 6)
         AS avg_jaccard
FROM pairs p
JOIN documents da ON da.doc_id = p.doc_a
JOIN documents db ON db.doc_id = p.doc_b
GROUP BY 1, 2
ORDER BY source_a, source_b
""",
)
def q_neardup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix — the curation report that
    decides which crawls/dumps to drop: near-dup pairs rolled up by
    the (unordered) source pair, with pair counts and mean verified
    jaccard. High off-diagonal mass means two sources mirror each
    other; high diagonal mass means a source is internally redundant.

    The mean is computed from micro-integer-encoded jaccards (already
    6-dp rounded, so ·1e6 is exact) summed as BIGINT — aggregation-
    order-proof — with ONE final division.

    Scale shape: reuses the invocation-memoized verified-pair frame
    (operators/dedup.py slot cache) when run after the near-dup
    queries — zero re-shingling; the rollup joins pairs to the two
    doc-metadata sides (broadcastable projections at any scale:
    doc_id→source) and hash-aggregates on a |sources|² key space."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(d, threshold=0.5)
    src = d.select("doc_id", "source")
    jm = F.round(F.col("jaccard") * 1000000).cast("bigint")
    return (
        pairs.join(src.withColumnsRenamed({"doc_id": "doc_a", "source": "src_a"}), "doc_a")
        .join(src.withColumnsRenamed({"doc_id": "doc_b", "source": "src_b"}), "doc_b")
        .groupBy(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(jm).alias("jaccard_micro_sum"),
            F.round(F.sum(jm) / (F.count(F.lit(1)) * 1000000.0), 6).alias("avg_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )
