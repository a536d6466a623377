"""Distributed linear algebra, survey sampling, and index-build corpus.

The reference's training pipeline standardizes features and fits linear
heads over dense matrices held in driver memory
(``/root/reference/train_classification.py``, ``tools.py:15-31``).  At
100 TB the matrix never fits anywhere — the scale-correct shape is the
classical one-pass SUFFICIENT-STATISTICS reduction: every query here
pushes a huge scan through a map-side-combinable aggregate whose group
count is bounded by the *feature dimensionality* (64×64 Gram cells, a
3×3 normal-equations matrix), never by the row count, then finishes the
tiny dense solve as plan-level column arithmetic (no collect, no UDF).

Cross-engine exactness: inputs are dyadically quantized (``FLOOR(x *
2^k)`` — float32→double is exact, scaling by a power of two is exact,
FLOOR is unambiguous in both engines), so every aggregate is an integer
sum — bit-stable at any partitioning and identical in Spark and DuckDB.
Wide products that exceed int64 are carried as ``DECIMAL(38,0)`` in
Spark / ``HUGEINT`` in DuckDB; final ratios convert the identical
integers to double (correctly-rounded in both engines) before ROUND,
with ``+ 0.0`` normalizing IEEE signed zero on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import register
from high_energy_gamma_ray_search_in_kascade_array_data_spark.sources.catalog import load_table, spread_scan

DIMS = 64

_DEC = "decimal(38,0)"


def _quantized(col: Column, scale: int) -> Column:
    """Dyadic quantization of a float array: exact in both engines."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("bigint"))


def _gram_upper(spark: SparkSession, sf_dir: str, scale: int) -> DataFrame:
    """Upper-triangle Gram matrix G = XᵀX of the quantized embedding
    matrix as a (i, j, g) relation, i ≤ j, 0-based.

    Shape: per row, the 2 080 upper-triangle products are generated
    INSIDE the array world (nested ``transform`` over a sliced tail —
    whole-stage codegen, no UDF, no self-join), exploded, and hash-
    aggregated.  Partial aggregation collapses each task to ≤ 2 080
    groups before the exchange, so the shuffle ships O(#partitions ×
    D²/2) rows regardless of table size — the one-pass suff-stats shape
    that survives 100 TB.  A naive self-join on vec_id would ship
    N×D rows twice and then build N×D² pairs post-join; this plan never
    materializes a pair relation wider than one input row.
    """
    e = spread_scan(load_table(spark, sf_dir, "embeddings"))
    q = e.select(_quantized(F.col("embedding"), scale).alias("q"))
    pairs = q.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("q"),
                    lambda qi, i: F.transform(
                        F.slice(F.col("q"), i + 1, F.lit(DIMS) - i),
                        lambda qj, j: F.struct(
                            i.cast("int").alias("i"),
                            (i + j).cast("int").alias("j"),
                            (qi * qj).alias("p"),
                        ),
                    ),
                )
            )
        ).alias("e")
    ).select("e.i", "e.j", "e.p")
    return pairs.groupBy("i", "j").agg(F.sum("p").alias("g"))


def _gram_oracle_cte(scale: int) -> str:
    """DuckDB twin of ``_gram_upper`` (the oracle may use the dumb
    self-join — it only runs at fixture scale)."""
    return f"""
qmat AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS i,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {scale}) AS BIGINT) AS qx
  FROM embeddings
),
gram AS (
  SELECT a.i AS i, b.i AS j, CAST(SUM(a.qx * b.qx) AS BIGINT) AS g
  FROM qmat a JOIN qmat b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY 1, 2
)"""


@register(
    "gram_matrix_embeddings",
    survey_ref="M5:similarity,A1,§2.6",
    oracle=f"""
WITH {_gram_oracle_cte(4096).lstrip()}
SELECT i, j, g FROM gram
""",
)
def q_gram_matrix_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix XᵀX over the embedding table — the
    covariance/PCA/linear-head building block the reference computes
    in driver memory (``train_classification.py`` standardization).
    One scan, one bounded shuffle (≤2 080 groups), integer-exact."""
    return _gram_upper(spark, sf_dir, 4096)


@register(
    "power_iteration_eigen",
    survey_ref="M5:similarity,A4,§2.7",
    oracle=f"""
WITH {_gram_oracle_cte(64).lstrip()},
sym AS (
  SELECT i, j, g FROM gram
  UNION ALL
  SELECT j AS i, i AS j, g FROM gram WHERE i < j
),
v1 AS (SELECT i, CAST(SUM(g) AS BIGINT) AS v1 FROM sym GROUP BY i),
v2 AS (
  SELECT s.i, CAST(SUM(s.g * v1.v1) AS HUGEINT) AS v2
  FROM sym s JOIN v1 ON v1.i = s.j
  GROUP BY s.i
),
dots AS (
  SELECT SUM(CAST(v1.v1 AS HUGEINT) * v2.v2) AS num,
         SUM(CAST(v1.v1 AS HUGEINT) * v1.v1) AS den,
         MIN(v1.v1) AS v1_min, MAX(v1.v1) AS v1_max,
         CAST(COUNT(*) AS BIGINT) AS n_dims
  FROM v1 JOIN v2 ON v1.i = v2.i
)
SELECT n_dims,
       ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) + 0.0 AS lambda_est,
       v1_min, v1_max
FROM dots
""",
)
def q_power_iteration_eigen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-eigenvalue estimate of the Gram matrix by one power step +
    Rayleigh quotient: v₁ = A·𝟙, v₂ = A·v₁, λ̂ = (v₁·v₂)/(v₁·v₁).

    The heavy pass is the suff-stats Gram reduction; everything after
    operates on a ≤4 160-row relation (matvec = equi-join + groupBy on
    the tiny side, broadcast by AQE), so the iterative refinement costs
    nothing at scale.  All arithmetic is integer (DECIMAL(38,0) for the
    final dot products — v₁·v₂ exceeds int64 by design) and therefore
    bit-stable; only the final ratio converts to double."""
    g = _gram_upper(spark, sf_dir, 64)
    sym = g.union(
        g.filter(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), F.col("g")
        )
    )
    v1 = sym.groupBy("i").agg(F.sum("g").alias("v1"))
    v2 = (
        sym.join(v1.select(F.col("i").alias("j"), F.col("v1").alias("v1j")), "j")
        .groupBy("i")
        .agg(F.sum(F.col("g").cast(_DEC) * F.col("v1j").cast(_DEC)).alias("v2"))
    )
    dots = (
        v1.join(v2, "i")
        .agg(
            F.sum(F.col("v1").cast(_DEC) * F.col("v2")).alias("num"),
            F.sum(F.col("v1").cast(_DEC) * F.col("v1").cast(_DEC)).alias("den"),
            F.min("v1").alias("v1_min"),
            F.max("v1").alias("v1_max"),
            F.count(F.lit(1)).alias("n_dims"),
        )
    )
    return dots.select(
        "n_dims",
        (F.round(F.col("num").cast("double") / F.col("den").cast("double"), 6) + F.lit(0.0)).alias(
            "lambda_est"
        ),
        "v1_min",
        "v1_max",
    )


# Ridge normal equations: y ~ b0 + b1·lg_e_milli + b2·ze over the
# deterministic shower features (common.py SHOWER_CTE integer forms).
_RIDGE_LAMBDA = 1000


def _det3(m: list[list[Column]]) -> Column:
    """3×3 determinant as plan-level column arithmetic (exact in
    DECIMAL(38,0) for the magnitudes proven in the module docstring)."""
    (a, b, c), (d, e, f), (g, h, i) = m
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


@register(
    "ridge_normal_equations",
    survey_ref="M4,A1,A4,§2.6",
    oracle=f"""
WITH feats AS (
  SELECT event_id * 131 % 2500 AS x1,
         event_id * 17 % 45 AS x2,
         CAST(FLOOR(value * 64) AS BIGINT) AS yq
  FROM events
),
s AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x1) AS HUGEINT) AS sx1, CAST(SUM(x2) AS HUGEINT) AS sx2,
         CAST(SUM(x1*x1) AS HUGEINT) AS sx1x1, CAST(SUM(x1*x2) AS HUGEINT) AS sx1x2,
         CAST(SUM(x2*x2) AS HUGEINT) AS sx2x2,
         CAST(SUM(yq) AS HUGEINT) AS sy, CAST(SUM(x1*yq) AS HUGEINT) AS sx1y,
         CAST(SUM(x2*yq) AS HUGEINT) AS sx2y
  FROM feats
),
a AS (
  SELECT n + {_RIDGE_LAMBDA} AS a11, sx1 AS a12, sx2 AS a13,
         sx1 AS a21, sx1x1 + {_RIDGE_LAMBDA} AS a22, sx1x2 AS a23,
         sx2 AS a31, sx1x2 AS a32, sx2x2 + {_RIDGE_LAMBDA} AS a33,
         sy, sx1y, sx2y, n
  FROM s
),
dets AS (
  SELECT n,
         a11*(a22*a33 - a23*a32) - a12*(a21*a33 - a23*a31) + a13*(a21*a32 - a22*a31) AS det_a,
         sy*(a22*a33 - a23*a32) - a12*(sx1y*a33 - a23*sx2y) + a13*(sx1y*a32 - a22*sx2y) AS det_b0,
         a11*(sx1y*a33 - sx2y*a23) - sy*(a21*a33 - a23*a31) + a13*(a21*sx2y - sx1y*a31) AS det_b1,
         a11*(a22*sx2y - sx1y*a32) - a12*(a21*sx2y - sx1y*a31) + sy*(a21*a32 - a22*a31) AS det_b2
  FROM a
)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(CAST(det_b0 AS DOUBLE) / CAST(det_a AS DOUBLE), 6) + 0.0 AS beta0,
       ROUND(CAST(det_b1 AS DOUBLE) / CAST(det_a AS DOUBLE), 6) + 0.0 AS beta1,
       ROUND(CAST(det_b2 AS DOUBLE) / CAST(det_a AS DOUBLE), 6) + 0.0 AS beta2
FROM dets
""",
)
def q_ridge_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge regression (two regressors + intercept) via
    normal equations and Cramer's rule — the distributed twin of the
    reference's sklearn linear heads (``train_classification.py``).

    The scan reduces to NINE integer sufficient statistics in one
    map-side-combinable aggregate (shuffle ships one row per task);
    the 3×3 solve (XᵀX + λI)β = Xᵀy is plan-level DECIMAL(38,0)
    arithmetic on that single row — no collect, no second pass, no
    UDF.  Magnitudes: |det| ≤ 6·(6.25e11)³ ≈ 1.5e36 < 10³⁸ at 10⁵
    rows, so the determinants are exact; both engines convert the
    identical integers to double for the final ratios."""
    ev = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    feats = ev.select(
        (eid * 131 % 2500).alias("x1"),
        (eid * 17 % 45).alias("x2"),
        F.floor(F.col("value") * 64).cast("bigint").alias("yq"),
    )
    x1, x2, yq = F.col("x1"), F.col("x2"), F.col("yq")
    s = feats.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).alias("sx1"),
        F.sum(x2).alias("sx2"),
        F.sum((x1 * x1).cast(_DEC)).alias("sx1x1"),
        F.sum((x1 * x2).cast(_DEC)).alias("sx1x2"),
        F.sum((x2 * x2).cast(_DEC)).alias("sx2x2"),
        F.sum(yq).alias("sy"),
        F.sum((x1 * yq).cast(_DEC)).alias("sx1y"),
        F.sum((x2 * yq).cast(_DEC)).alias("sx2y"),
    )
    lam = F.lit(_RIDGE_LAMBDA).cast(_DEC)

    def d(name: str) -> Column:
        return F.col(name).cast(_DEC)

    a = [
        [d("n") + lam, d("sx1"), d("sx2")],
        [d("sx1"), d("sx1x1") + lam, d("sx1x2")],
        [d("sx2"), d("sx1x2"), d("sx2x2") + lam],
    ]
    rhs = [d("sy"), d("sx1y"), d("sx2y")]
    det_a = _det3(a)

    def beta(k: int) -> Column:
        mk = [[rhs[r] if c == k else a[r][c] for c in range(3)] for r in range(3)]
        return (
            F.round(_det3(mk).cast("double") / det_a.cast("double"), 6) + F.lit(0.0)
        ).alias(f"beta{k}")

    return s.select(F.col("n").alias("n"), beta(0), beta(1), beta(2))


_PPS_K = 5


@register(
    "pps_systematic_sample",
    survey_ref="X2,X3,§2.8",
    oracle=f"""
WITH w AS (
  SELECT lang, doc_id, n_chars,
         SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM documents
),
tot AS (SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS total FROM documents GROUP BY lang),
offs AS (
  SELECT lang, m, (total * (2 * m + 1)) // {2 * _PPS_K} AS t
  FROM tot, (SELECT unnest(range({_PPS_K})) AS m)
)
SELECT o.lang, CAST(o.m AS INTEGER) AS m, w.doc_id, w.n_chars
FROM offs o JOIN w ON w.lang = o.lang
WHERE o.t >= w.cum - w.n_chars AND o.t < w.cum
""",
)
def q_pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic PPS (probability-proportional-to-size) sampling: k=5
    draws per language stratum, inclusion probability ∝ ``n_chars`` —
    the survey-sampling generalization of the reference's
    ``train_test_split`` (X2/X3) that a corpus-curation pipeline uses
    to weight long documents correctly.

    Deterministic and exact: cumulative INTEGER weights (window cumsum
    keyed per stratum), k evenly-spaced integer offsets t_m =
    ⌊total·(2m+1)/2k⌋ derived from the per-stratum totals (a tiny
    aggregate, broadcast back), and interval-containment selection —
    no RNG, no floats, resumable at any partitioning.  The per-stratum
    window is the only shuffle and partitions by the stratum key, so
    skew is bounded by the largest stratum, not the table."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "lang",
        "doc_id",
        "n_chars",
        F.sum("n_chars")
        .over(Window.partitionBy("lang").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    tot = d.groupBy("lang").agg(F.sum("n_chars").alias("total"))
    offs = tot.select(
        F.col("lang").alias("s_lang"),
        F.explode(F.sequence(F.lit(0), F.lit(_PPS_K - 1))).alias("m"),
        "total",
    ).select(
        "s_lang",
        F.col("m").cast("int").alias("m"),
        F.expr(f"(total * (2 * m + 1)) DIV {2 * _PPS_K}").alias("t"),
    )
    return (
        w.join(
            F.broadcast(offs),
            [
                F.col("lang") == F.col("s_lang"),
                F.col("t") >= F.col("cum") - F.col("n_chars"),
                F.col("t") < F.col("cum"),
            ],
        )
        .select("lang", "m", "doc_id", "n_chars")
    )


@register(
    "inverted_index_postings",
    survey_ref="§2.6,§2.9,M5:text",
    oracle="""
WITH tf AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) t
  WHERE LENGTH(term) >= 3
  GROUP BY term, doc_id
)
SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
       array_to_string(list(doc_id || ':' || tf ORDER BY tf DESC, doc_id)[1:5], ' ')
         AS postings
FROM tf
GROUP BY term
HAVING COUNT(*) >= 3
""",
)
def q_inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: term → document frequency, corpus tf, and
    the top-5 posting list '(doc:tf …)' ranked tf-desc/doc-asc — the
    retrieval-side index a RAG / dedup pipeline derives from the same
    corpus it trains on.

    Two hash aggregates — (term, doc) then term — both map-side
    combinable; the posting list is truncated INSIDE the aggregate
    (``sort_array`` + ``slice`` over the collected pairs), so hot terms
    carry at most df pairs through one exchange and emit a bounded
    string.  At 100 TB the (term, doc) pre-aggregation is what keeps
    the second shuffle proportional to the vocabulary, not the token
    stream."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")).filter(
        F.length("term") >= 3
    )
    tf = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    postings = F.array_join(
        F.transform(
            F.slice(
                F.sort_array(F.array_agg(F.struct((-F.col("tf")).alias("ntf"), F.col("doc_id").alias("doc_id")))),
                1,
                5,
            ),
            lambda s: F.concat_ws(":", s.doc_id.cast("string"), (-s.ntf).cast("string")),
        ),
        " ",
    )
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            postings.alias("postings"),
        )
        .filter(F.col("df") >= 3)
    )


@register(
    "bm25_topk_retrieval",
    survey_ref="M5:text,§2.6,§2.7",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, SUM(dl) * 1.0 / COUNT(*) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE term IN ('scan', 'join', 'window')
  GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
),
comp AS (
  SELECT tf.doc_id, tf.term,
         LN(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) AS c
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats s
),
pivoted AS (
  SELECT doc_id,
         COALESCE(MAX(CASE WHEN term = 'scan' THEN c END), 0.0)
           + COALESCE(MAX(CASE WHEN term = 'join' THEN c END), 0.0)
           + COALESCE(MAX(CASE WHEN term = 'window' THEN c END), 0.0) AS score,
         CAST(COUNT(*) AS BIGINT) AS n_terms_hit
  FROM comp GROUP BY doc_id
)
SELECT doc_id, ROUND(score, 6) AS bm25, n_terms_hit
FROM pivoted
ORDER BY bm25 DESC, doc_id
LIMIT 10
""",
)
def q_bm25_topk_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (k1=1.2, b=0.75, Lucene idf) for the fixed
    query {scan, join, window} — the ranking function a RAG / data-
    curation pipeline runs over the same inverted index
    ``inverted_index_postings`` builds (reference analogue: the
    selection scans in ``data_preparation.py``; re-derived, not copied).

    Scale shape: one event-scale token aggregate for per-doc length,
    one *query-filtered* (3-term) tf aggregate — everything after that
    is query-sized. df (3 rows) and the corpus stats (1 row) ride as
    broadcast joins; the per-term components are pivoted into fixed
    columns so the final score is a row-local fixed-order float add
    (no partition-order-dependent SUM of doubles — the exact-hash
    discipline ADVICE r6 asked for), then TakeOrderedAndProject top-10.
    At 100 TB the only full-corpus work is the two token aggregates;
    candidate rows are bounded by docs containing a query term."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") * F.lit(1.0) / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("term").isin("scan", "join", "window"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    comp = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            (
                F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * 2.2)
                / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl")))
            ).alias("c"),
        )
    )
    zero = F.lit(0.0)
    pivoted = comp.groupBy("doc_id").agg(
        (
            F.coalesce(F.max(F.when(F.col("term") == "scan", F.col("c"))), zero)
            + F.coalesce(F.max(F.when(F.col("term") == "join", F.col("c"))), zero)
            + F.coalesce(F.max(F.when(F.col("term") == "window", F.col("c"))), zero)
        ).alias("score"),
        F.count(F.lit(1)).alias("n_terms_hit"),
    )
    return (
        pivoted.select("doc_id", F.round("score", 6).alias("bm25"), "n_terms_hit")
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(10)
    )
