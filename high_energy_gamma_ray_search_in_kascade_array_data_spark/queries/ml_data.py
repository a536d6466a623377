"""ML data-preparation operators round 6: leakage-aware splits, CV
fold bookkeeping, the hashing trick, and leave-one-out target encoding
— the dataset-construction steps between the corpus modules' dedup/
filter stage and the training loop, each with the leakage discipline a
production pipeline must enforce (split by GROUP, embargo around the
temporal boundary, exclude own row from the encode).

Scale shapes: every query is one keyed partial aggregate and/or a
broadcast of a tiny (splits/folds/categories) relation back onto the
fact — no global sorts, no per-row Python.  Determinism follows
``registry.py``: integer draws (Knuth multiplicative hash), exact
integer cents, dyadic ratios only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import register
from high_energy_gamma_ray_search_in_kascade_array_data_spark.sources.catalog import load_table, spread_scan

# Deterministic per-USER draw (vs common.RND_SQL's per-event draw):
# split assignment must be a function of the group key alone so every
# row of a user lands in one split.
_USER_DRAW = "((user_id % 2147483648) * 2654435761 % 4294967296)"
_SPLIT_CASE = (
    f"CASE WHEN {_USER_DRAW} < 3435973837 THEN 'train' "
    f"WHEN {_USER_DRAW} < 3865470566 THEN 'valid' ELSE 'test' END"
)  # 0.8 / 0.1 / 0.1 of 2^32


@register(
    "grouped_leakage_free_split",
    survey_ref="X1,X3,§2.6",
    oracle=f"""
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM (SELECT user_id, value, {_SPLIT_CASE} AS split FROM events)
GROUP BY split ORDER BY split
""",
)
def q_grouped_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-aware train/valid/test split — the leakage-safe variant
    of the reference's row-level stratified split (X1,
    ``create_train_valid_test_datasets.py``): the split is a
    deterministic function of the GROUP key (user), so all of a user's
    events land in exactly one split and no user straddles the
    train/test boundary (the classic leakage bug row-level splitting
    causes when rows of one entity correlate).  Pure column algebra —
    the Knuth multiplicative draw on user_id — then one partial
    aggregate; seeded determinism (X3) for free."""
    ev = load_table(spark, sf_dir, "events")
    draw = (F.col("user_id") % 2147483648) * 2654435761 % 4294967296
    split = (
        F.when(draw < 3435973837, "train")
        .when(draw < 3865470566, "valid")
        .otherwise("test")
    )
    return (
        ev.select("user_id", "value", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("sum_cents"),
        )
        .orderBy("split")
    )


@register(
    "temporal_embargo_split",
    survey_ref="X1,§2.6",
    oracle="""
WITH bounds AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
), cutoff AS (
  SELECT lo + CAST(FLOOR(0.8 * (hi - lo)) AS BIGINT) AS cut,
         lo + CAST(FLOOR(0.8 * (hi - lo)) AS BIGINT) + 86400000000 AS emb
  FROM bounds
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM (
  SELECT value,
         CASE WHEN epoch_us(e.ts) < c.cut THEN 'train'
              WHEN epoch_us(e.ts) < c.emb THEN 'embargo'
              ELSE 'test' END AS split
  FROM events e, cutoff c
)
GROUP BY split ORDER BY split
""",
)
def q_temporal_embargo_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL split with an embargo gap — the time-series analogue
    of the grouped split: train strictly before the 80%-of-range
    cutoff, test strictly after cutoff + 1 day, and the day in between
    EMBARGOED (dropped from both sides) so look-ahead leakage through
    boundary-straddling effects is structurally impossible.  The
    cutoff is a 1-row global aggregate broadcast back as a literal-
    free cross join (Catalyst plans a BroadcastNestedLoopJoin of one
    row — the scale-safe way to parameterize a scan by a computed
    scalar); all timestamp math is exact integer microseconds."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    ).select(
        (F.col("lo") + F.floor(0.8 * (F.col("hi") - F.col("lo"))).cast("long")).alias("cut")
    ).select("cut", (F.col("cut") + F.lit(86400000000)).alias("emb"))
    us = F.unix_micros("ts")
    split = (
        F.when(us < F.col("cut"), "train")
        .when(us < F.col("emb"), "embargo")
        .otherwise("test")
    )
    return (
        ev.crossJoin(F.broadcast(b))
        .select("value", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("sum_cents"),
        )
        .orderBy("split")
    )


@register(
    "kfold_assignment",
    survey_ref="X1,X3,§2.6",
    oracle=f"""
SELECT fold,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(COUNT(*)) OVER () - COUNT(*) AS BIGINT) AS n_train,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM (SELECT value, CAST({_USER_DRAW} % 5 AS INTEGER) AS fold FROM events)
GROUP BY fold ORDER BY fold
""",
)
def q_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-fold cross-validation bookkeeping: deterministic group-keyed
    fold assignment (the same leakage discipline as the grouped split
    — a user's rows share a fold), plus each fold's test/train sizes
    in one pass: the train size is total − fold via a window over the
    5-row aggregate (not a second scan of the fact)."""
    ev = load_table(spark, sf_dir, "events")
    draw = (F.col("user_id") % 2147483648) * 2654435761 % 4294967296
    agg = (
        ev.select("value", (draw % 5).cast("int").alias("fold"))
        .groupBy("fold")
        .agg(
            F.count("*").alias("n_test"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("sum_cents"),
        )
    )
    from pyspark.sql import Window

    total = F.sum("n_test").over(Window.partitionBy())
    return agg.select(
        "fold",
        "n_test",
        (total - F.col("n_test")).alias("n_train"),
        "sum_cents",
    ).orderBy("fold")


# Polynomial character hash over the first 8 code points: identical
# integer arithmetic in Spark (aggregate over sequence) and DuckDB
# (list_sum over range); 31^7·1114111 < 2^63 so no overflow.
_FH_BUCKETS = 64


@register(
    "feature_hashing_counts",
    survey_ref="T7,§2.12",
    oracle=f"""
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS total_count,
       CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct_tokens
FROM (
  SELECT tok,
         CAST(list_sum(list_transform(range(0, LEAST(LENGTH(tok), 8)),
              k -> ascii(tok[k+1]) * (31 ** k))) % {_FH_BUCKETS} AS INTEGER) AS bucket
  FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
  WHERE LENGTH(tok) > 0
)
GROUP BY bucket ORDER BY bucket
""",
)
def q_feature_hashing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HASHING TRICK (feature hashing): tokens map to a fixed
    64-dim index space via a deterministic polynomial character hash —
    the fixed-width featurization that needs NO vocabulary build,
    broadcast, or dictionary shuffle, which is exactly why it is the
    100 TB default (vs ``token_vocab``'s dictionary path in
    ``operators/dedup.py``).  The hash is plain integer column algebra
    over the first 8 code points (no JVM-hash dependence, so Spark and
    DuckDB agree bit-for-bit), one explode + one partial aggregate."""
    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.length("tok") > 0
    )
    toks = toks.withColumn("bucket", (_fh_hash() % _FH_BUCKETS).cast("int"))
    return (
        toks.groupBy("bucket")
        .agg(
            F.count("*").alias("total_count"),
            F.countDistinct("tok").alias("n_distinct_tokens"),
        )
        .orderBy("bucket")
    )


def _fh_hash() -> F.Column:
    """Σ ascii(tok[k]) · 31^k over k < min(len, 8) as EXACT integer
    column algebra (31^k is a Python-int literal per term, the per-term
    guard keeps out-of-range substrings contributing 0)."""
    h = F.lit(0).cast("long")
    for k in range(8):
        code = F.when(
            F.length("tok") > k, F.ascii(F.substring("tok", k + 1, 1)).cast("long")
        ).otherwise(F.lit(0))
        h = h + code * F.lit(31**k)
    return h


@register(
    "target_encoding_loo",
    survey_ref="F7,A4,§2.7",
    oracle="""
WITH cat AS (
  SELECT o_orderpriority AS category,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cat_sum,
         CAST(COUNT(*) AS BIGINT) AS cat_n
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderkey, c.category,
       CAST(c.cat_sum - CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS BIGINT) AS loo_sum_cents,
       CAST(c.cat_n - 1 AS BIGINT) AS loo_n
FROM orders o JOIN cat c ON o.o_orderpriority = c.category
WHERE o.o_orderkey % 1000 = 0
ORDER BY o.o_orderkey
""",
)
def q_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAVE-ONE-OUT target encoding — the leakage-safe categorical
    encoder: each row's category statistic excludes its OWN target
    (sum − own, n − 1), so the encode never memorizes the row it will
    be used to predict.  One partial aggregate over the categories (a
    handful of rows) broadcast back onto the fact; the numerator/
    denominator ship as exact integers instead of a pre-divided double
    so the oracle gate is bit-exact and the consumer chooses its own
    smoothing."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    cat = o.groupBy(F.col("o_orderpriority").alias("category")).agg(
        F.sum(cents).alias("cat_sum"), F.count("*").alias("cat_n")
    )
    return (
        o.filter(F.col("o_orderkey") % 1000 == 0)
        .join(F.broadcast(cat), o.o_orderpriority == F.col("category"))
        .select(
            "o_orderkey",
            "category",
            (F.col("cat_sum") - cents).alias("loo_sum_cents"),
            (F.col("cat_n") - 1).alias("loo_n"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "churn_label_builder",
    survey_ref="§2.6,§2.7,M3",
    oracle="""
WITH bounds AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
),
cut AS (
  SELECT lo + ((hi - lo) * 4) // 5 AS cut_us FROM bounds
),
feat AS (
  SELECT e.user_id,
         CAST(COUNT(*) AS BIGINT) AS n_before,
         CAST(SUM(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_purchase_before,
         MAX(epoch_us(e.ts)) AS last_seen_us
  FROM events e, cut
  WHERE epoch_us(e.ts) < cut.cut_us
  GROUP BY e.user_id
),
future AS (
  SELECT DISTINCT e.user_id
  FROM events e, cut
  WHERE epoch_us(e.ts) >= cut.cut_us
)
SELECT f.user_id, f.n_before, f.n_purchase_before,
       (c.cut_us - f.last_seen_us) // 3600000000 AS recency_hours,
       CAST(CASE WHEN fu.user_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS churned
FROM feat f LEFT JOIN future fu ON f.user_id = fu.user_id, cut c
ORDER BY f.user_id
""",
)
def q_churn_label_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe churn-label construction: split observation time at
    the 80% mark of the global window, build features STRICTLY from
    events before the cutoff (activity count, purchases, recency) and
    the label (churned = no events after the cutoff) strictly from
    events after it — the supervised-dataset builder that pairs with
    ``temporal_embargo_split`` (which guards the same leakage class at
    split level).

    Scale shape: the cutoff is a broadcast 1-row aggregate; features
    are one user-keyed aggregate over the before-cut scan; the label
    is an anti-join-shaped LEFT JOIN against the distinct after-cut
    user set (user-keyed, no fan-out). Micros arithmetic is exact
    BIGINT throughout."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    bounds = e.agg(F.min(us).alias("lo"), F.max(us).alias("hi"))
    cut = bounds.select((F.col("lo") + F.expr("((hi - lo) * 4) DIV 5")).alias("cut_us"))
    before = e.crossJoin(F.broadcast(cut)).filter(us < F.col("cut_us"))
    feat = before.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_before"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "n_purchase_before"
        ),
        F.max(us).alias("last_seen_us"),
        F.max(F.col("cut_us")).alias("cut_us"),
    )
    future = (
        e.crossJoin(F.broadcast(cut))
        .filter(us >= F.col("cut_us"))
        .select("user_id")
        .distinct()
        .withColumn("seen_after", F.lit(1))
    )
    return (
        feat.join(future, "user_id", "left")
        .select(
            "user_id",
            "n_before",
            "n_purchase_before",
            F.expr("(cut_us - last_seen_us) DIV 3600000000").alias("recency_hours"),
            F.when(F.col("seen_after").isNull(), 1).otherwise(0).cast("long").alias("churned"),
        )
        .orderBy("user_id")
    )


@register(
    "dataset_mixture_temperature",
    survey_ref="A9,§2.6,M5:text",
    oracle="""
WITH c AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source
),
r AS (
  SELECT source, n,
         CAST(FLOOR(SQRT(n) * 1000000 + 0.5) AS BIGINT) AS rt
  FROM c
),
t AS (SELECT CAST(SUM(rt) AS BIGINT) AS srt, CAST(SUM(n) AS BIGINT) AS sn FROM r)
SELECT source, n,
       ROUND(rt * 1.0 / t.srt, 6) AS p_temp,
       ROUND(n * 1.0 / t.sn, 6) AS p_nat,
       ROUND((rt * 1.0 / t.srt) / (n * 1.0 / t.sn), 6) AS upsample_factor,
       CAST((rt * 1000000) // t.srt AS BIGINT) AS docs_per_million
FROM r, t
ORDER BY source
""",
)
def q_dataset_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled dataset mixing (the multi-source sampling
    rule of multilingual/multi-corpus LLM training, T=0.5: sample
    source s with p_s ∝ n_s^T — upweights small sources relative to
    natural frequency without letting one giant crawl dominate):
    per-source doc counts, temperature weight, natural weight, the
    upsample factor small sources gain, and the integer docs-per-
    million-samples budget (exact floor division; pair with
    ``largest_remainder_allocation`` when the budget must sum exactly).

    Float discipline: √n is integer-encoded at 1e-6 ticks per source
    BEFORE the normalizing sum, so the total is an exact BIGINT in any
    aggregation order (SQRT of a BIGINT is one correctly-rounded IEEE
    op, identical cross-engine; a float Σ√n would be
    partition-order-dependent).

    Scale shape: one map-combinable count per source (the only
    event-scale exchange) then arithmetic on a |sources|-row relation
    — at 100 TB this is the metadata query that CONFIGURES the
    sampler; the sampling itself composes with ``sample``/
    ``epoch_shuffle_order``."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    r = c.select(
        "source", "n", F.floor(F.sqrt(F.col("n")) * 1000000 + 0.5).cast("bigint").alias("rt")
    )
    t = r.agg(F.sum("rt").alias("srt"), F.sum("n").alias("sn"))
    return (
        r.crossJoin(F.broadcast(t))
        .select(
            "source",
            "n",
            F.round(F.col("rt") * 1.0 / F.col("srt"), 6).alias("p_temp"),
            F.round(F.col("n") * 1.0 / F.col("sn"), 6).alias("p_nat"),
            F.round(
                (F.col("rt") * 1.0 / F.col("srt")) / (F.col("n") * 1.0 / F.col("sn")), 6
            ).alias("upsample_factor"),
            F.expr("(rt * 1000000) DIV srt").alias("docs_per_million"),
        )
        .orderBy("source")
    )


@register(
    "mutual_information_features",
    survey_ref="M5:text,§2.6",
    oracle="""
WITH b AS (
  SELECT d.i - 1 AS dim,
         CASE WHEN e.embedding[d.i] >= 0 THEN 1 ELSE 0 END AS bin,
         e.label
  FROM embeddings e, UNNEST(range(1, 9)) AS d(i)
),
jc AS (
  SELECT dim, bin, label, COUNT(*) AS c_bl FROM b GROUP BY 1, 2, 3
),
mc AS (
  SELECT dim, bin, SUM(c_bl) AS c_b FROM jc GROUP BY 1, 2
),
lc AS (
  SELECT dim, label, SUM(c_bl) AS c_l FROM jc GROUP BY 1, 2
),
n AS (
  SELECT dim, SUM(c_bl) AS n FROM jc GROUP BY 1
)
SELECT jc.dim,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       ROUND(SUM(c_bl * LN(CAST(n.n AS DOUBLE) * c_bl
                           / (CAST(mc.c_b AS DOUBLE) * lc.c_l))) / ANY_VALUE(n.n), 6)
         AS mi_nats
FROM jc
JOIN mc USING (dim, bin)
JOIN lc ON lc.dim = jc.dim AND lc.label = jc.label
JOIN n ON n.dim = jc.dim
GROUP BY jc.dim
""",
)
def q_mutual_information_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-relevance screening: mutual information (nats) between
    the class label and each of the first 8 embedding dimensions,
    sign-binned — the filter-method ranking a pipeline uses to spot
    label-leaking or dead features before training. Sign binning keeps
    the contingency table integer-exact in both engines; only the
    final LN is transcendental, so the result rounds to 6 decimals
    (the corpus libm rule).

    Scale shape: one posexplode (x8, bounded by the dim constant) into
    a (dim, bin, label) hash aggregate — map-side combinable to at
    most dims x 2 x classes rows per partition; marginals and the MI
    reduction are window-free re-aggregations of that tiny contingency
    table. Nothing downstream of the first aggregate is event-scale.
    The n*c_bl and c_b*c_l products are promoted to DOUBLE before the
    multiply (both engines): Spark wraps int64 silently in non-ANSI
    mode while DuckDB promotes SUM to HUGEINT, so at row counts past
    ~3e9 a long*long product would diverge between the engines."""
    e = load_table(spark, sf_dir, "embeddings")
    b = e.select(
        F.posexplode(F.slice("embedding", 1, 8)).alias("dim", "v"),
        "label",
    ).select("dim", F.when(F.col("v") >= 0, 1).otherwise(0).alias("bin"), "label")
    jc = b.groupBy("dim", "bin", "label").agg(F.count(F.lit(1)).alias("c_bl"))
    mc = jc.groupBy("dim", "bin").agg(F.sum("c_bl").alias("c_b"))
    lc = jc.groupBy("dim", "label").agg(F.sum("c_bl").alias("c_l"))
    n = jc.groupBy("dim").agg(F.sum("c_bl").alias("n"))
    return (
        jc.join(mc, ["dim", "bin"])
        .join(lc, ["dim", "label"])
        .join(n, "dim")
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.round(
                F.sum(
                    F.col("c_bl")
                    * F.log(
                        F.col("n").cast("double") * F.col("c_bl")
                        / (F.col("c_b").cast("double") * F.col("c_l"))
                    )
                )
                / F.first("n"),
                6,
            ).alias("mi_nats"),
        )
    )
