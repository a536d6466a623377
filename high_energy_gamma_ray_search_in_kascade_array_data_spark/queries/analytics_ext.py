"""Analytics extensions, round-4 continuation: OHLC candlesticks,
time-weighted averages, robust (MAD) outlier detection, Pareto skyline,
market-basket pair support, and BFS shortest hops — classic warehouse /
feature-engineering operators the corpus did not yet cover, each with a
structurally different DuckDB twin.

Cross-engine determinism rules follow ``registry.py``: integer cents
(``FLOOR(x*100 + 0.5)``), exact epoch-second durations, comparisons on
exact dyadic values, deterministic tie-breaks on every pick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from contextlib import contextmanager

from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import register
from high_energy_gamma_ray_search_in_kascade_array_data_spark.sources.catalog import load_table


@contextmanager
def _loop_shuffle(spark: SparkSession, n: int):
    """Pin spark.sql.shuffle.partitions for an iterative driver loop
    whose per-sweep state is a few hundred rows: every sweep launches
    jobs, and at fixture scale 32 near-empty shuffle tasks per job are
    pure scheduling overhead (the same sizing rule as
    ``streaming.core.run_to_memory``'s ``state_partitions``). A real
    cluster sizes this to state volume instead — the loop SHAPE
    (keyed join + partial agg per sweep) is what scales, not the
    partition count."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@register(
    "ohlc_candlestick",
    survey_ref="§2.6,§2.8,A4",
    oracle="""
WITH t AS (
  SELECT event_type, CAST(ts AS DATE) AS day, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, day,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS volume
FROM t GROUP BY 1, 2
""",
)
def q_ohlc_candlestick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candlestick per event_type — the canonical
    downsample of a tick stream to bar data (open/high/low/close/
    volume). Open/close are first/last by (ts, event_id) — picked via
    two row_number windows over the same (type, day) partitioning, so
    the sort is reused; high/low are plain MIN/MAX. Every output value
    is either a count or a RAW input double selected by comparison
    (no arithmetic), so the result is hash-exact with no rounding at
    any partitioning. One shuffle on (event_type, day); window state
    per key is a single counter — at 100 TB the day column keeps
    partitions bounded regardless of total history length."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    base = ev.select("event_type", day, "ts", "event_id", "value")
    wa = Window.partitionBy("event_type", "day").orderBy(F.asc("ts"), F.asc("event_id"))
    wd = Window.partitionBy("event_type", "day").orderBy(F.desc("ts"), F.desc("event_id"))
    t = base.select(
        "event_type",
        "day",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return t.groupBy("event_type", "day").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("volume"),
    )


@register(
    "time_weighted_average",
    survey_ref="§2.6,§2.8",
    oracle="""
WITH seq AS (
  SELECT event_type,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc,
         CAST(FLOOR(epoch(LEAD(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id))) AS BIGINT)
           - CAST(FLOOR(epoch(ts)) AS BIGINT) AS dur_s
  FROM events
)
SELECT event_type,
       CAST(SUM(vc * dur_s) AS BIGINT) AS weighted_cents_s,
       CAST(SUM(dur_s) AS BIGINT) AS total_s,
       ROUND(SUM(vc * dur_s) / (100.0 * SUM(dur_s)), 6) AS twa
FROM seq WHERE dur_s IS NOT NULL
GROUP BY 1
""",
)
def q_time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per event_type — the
    correct mean for irregularly sampled gauges (each reading holds
    until the next one), the shape monitoring/IoT rollups and TWAP
    pricing use. Each interval's weight is its exact integer duration
    (FLOOR'd epoch seconds, the SCALE.md cross-engine rule) times the
    integer cent value, so the big SUM is order-independent — exact at
    ANY partitioning — and the average is one final division. One
    window (lead) + one partial-aggregated shuffle, both keyed by
    event_type."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("long")
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    seq = ev.select(
        "event_type",
        vc.alias("vc"),
        (F.lead(epoch).over(w) - epoch).alias("dur_s"),
    ).filter(F.col("dur_s").isNotNull())
    return seq.groupBy("event_type").agg(
        F.sum(F.col("vc") * F.col("dur_s")).cast("bigint").alias("weighted_cents_s"),
        F.sum("dur_s").cast("bigint").alias("total_s"),
        F.round(
            F.sum(F.col("vc") * F.col("dur_s")) / (F.lit(100.0) * F.sum("dur_s")), 6
        ).alias("twa"),
    )


@register(
    "mad_outlier_events",
    survey_ref="§2.6,A1",
    oracle="""
WITH v AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc FROM events
),
med AS (
  SELECT event_type, quantile_cont(vc, 0.5) AS med FROM v GROUP BY 1
),
dev AS (
  SELECT v.event_type, m.med, ABS(v.vc - m.med) AS dev
  FROM v JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY 1
)
SELECT d.event_type,
       ROUND(MAX(d.med) / 100.0, 4) AS median_value,
       ROUND(MAX(m.mad) / 100.0, 4) AS mad_value,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN d.dev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY 1
""",
)
def q_mad_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen per event_type: median / MAD (median
    absolute deviation) with a 3×MAD fence — the heavy-tail-safe
    alternative to z-scores (``window_zscore_anomaly``) every data-
    quality pipeline needs, since mean/stddev are themselves dragged
    by the outliers they're meant to catch. Values are integer cents,
    so both medians interpolate to exact dyadic (quarter-cent) values
    and the fence comparison is bit-deterministic cross-engine. Plan:
    two exact-percentile aggregations on the 5-key type column with a
    broadcast join back after each — per-type stats are tiny forever,
    so the joins never shuffle the event side more than the two
    keyed aggregations already do. At 100 TB swap the exact
    percentile for percentile_approx at the same seam."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("vc")
    )
    med = v.groupBy("event_type").agg(F.percentile("vc", F.lit(0.5)).alias("med"))
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("vc") - F.col("med")).alias("dev")
    )
    mad = dev.groupBy("event_type").agg(F.percentile("dev", F.lit(0.5)).alias("mad"))
    joined = dev.join(F.broadcast(mad), "event_type")
    return joined.groupBy("event_type").agg(
        F.round(F.max("med") / 100.0, 4).alias("median_value"),
        F.round(F.max("mad") / 100.0, 4).alias("mad_value"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("dev") > 3 * F.col("mad"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_outliers"),
    )


@register(
    "skyline_pareto",
    survey_ref="§2.6,§2.8,A8",
    oracle="""
WITH pc AS (
  SELECT p_partkey, CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c, p_size
  FROM part
),
w AS (
  SELECT p_partkey, price_c, p_size,
         MAX(p_size) OVER (ORDER BY price_c
                           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS strict_max,
         MAX(p_size) OVER (ORDER BY price_c
                           RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS tie_max
  FROM pc
)
SELECT p_partkey, price_c, p_size
FROM w
WHERE (strict_max IS NULL OR strict_max < p_size) AND p_size = tie_max
""",
)
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline of ``part`` (minimize price, maximize size):
    the parts no other part beats on both dimensions — the classic
    multi-criteria shortlist operator. The naive form is an O(n²)
    dominance anti-join; the 2-D skyline reduces to prefix-max over
    the price order, which Spark runs WITHOUT a global single-
    partition sort: rows bucket by price range, a per-bucket max-size
    aggregate (hundreds of rows) takes a tiny window for the
    strictly-lower-bucket running max and broadcasts back, and the
    within-bucket strict/tie maxima come from range-frame windows
    PARTITIONED by bucket. Dominated iff a strictly-cheaper part is
    at least as large, or an equal-priced part is strictly larger.
    All-integer comparisons (price cents) — hash-exact. The oracle
    uses single-sort range windows: same semantics, different plan."""
    p = load_table(spark, sf_dir, "part")
    pc = p.select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("bigint").alias("price_c"),
        "p_size",
    )
    pc = pc.withColumn("bucket", (F.col("price_c") / F.lit(1000)).cast("bigint"))
    # per-bucket max size: a few hundred rows at any SF — the window
    # over it is tiny by construction (documented single-stage on
    # purpose; the event-scale rows never enter a global sort)
    bmax = pc.groupBy("bucket").agg(F.max("p_size").alias("bmax"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bmax = bmax.select("bucket", F.max("bmax").over(wb).alias("lower_max"))
    wi_strict = (
        Window.partitionBy("bucket").orderBy("price_c").rangeBetween(Window.unboundedPreceding, -1)
    )
    wi_tie = Window.partitionBy("bucket").orderBy("price_c").rangeBetween(0, 0)
    scored = (
        pc.join(F.broadcast(bmax), "bucket")
        .select(
            "p_partkey",
            "price_c",
            "p_size",
            F.greatest(
                F.coalesce(F.col("lower_max"), F.lit(-1)),
                F.coalesce(F.max("p_size").over(wi_strict), F.lit(-1)),
            ).alias("strict_max"),
            F.max("p_size").over(wi_tie).alias("tie_max"),
        )
    )
    return scored.filter(
        (F.col("strict_max") < F.col("p_size")) & (F.col("p_size") == F.col("tie_max"))
    ).select("p_partkey", "price_c", "p_size")


@register(
    "basket_pair_support",
    survey_ref="§2.7,§2.6,M5:text",
    oracle="""
WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
SELECT a.pk AS part_a, b.pk AS part_b, CAST(COUNT(*) AS BIGINT) AS support
FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
GROUP BY 1, 2 HAVING COUNT(*) >= 2
""",
)
def q_basket_pair_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket frequent-pair mining over orders: co-occurring
    part pairs with support ≥ 2 — the candidate-generation step of
    A-Priori / co-purchase recommendation.

    r12 shape (guide §2.3/§2.4, VERDICT r11 task 8): aggregate the
    basket FIRST — ``collect_set(pk)`` per order is one partial-
    aggregated shuffle (dedup within basket for free) — then enumerate
    each basket's ordered pairs as a JVM array expression and count
    with a second partial-aggregated shuffle. The r11 self-join form
    scanned lineitem twice (the distinct subtree under both join
    aliases), shuffled three times (distinct, join re-key on ok, pair
    count) and shipped one row per basket-pair across the join
    exchange; this form scans once and shuffles twice, with pair
    enumeration happening AFTER the basket shuffle as codegen array
    ops. Intermediates stay bounded by Σ basket_size² — baskets are ≤7
    lines here and bounded in any sane retail schema, which is what
    makes the shape safe at 100 TB where an unkeyed pair enumeration
    would be quadratic. ``sort_array`` + (i < j) slice canonicalizes
    pair identity exactly like the old ``p1 < p2`` join predicate.
    Equivalence: same oracle, exact-hash re-verified at sf0.001/0.01/
    0.1/1.0 (SWEEP addendum r12)."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .groupBy("ok")
        .agg(F.sort_array(F.collect_set("pk")).alias("pks"))
    )
    pair_expr = F.expr(
        "flatten(transform(pks, (x, i) -> "
        "transform(slice(pks, i + 2, size(pks) - i - 1), "
        "y -> struct(x AS part_a, y AS part_b))))"
    )
    return (
        baskets.select(F.explode(pair_expr).alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )


# Spatial self-join fixture: points scattered over a 997×991 plane by a
# murmur-style mix (multiply, xor-fold the high half back, multiply
# again, prime modulus) — the xor fold + prime moduli matter: a plain
# multiplicative hash mod a composite leaves event-id arithmetic
# progressions on a near-lattice where every close pair shares one
# difference vector.
_SP_R = 12  # pairing radius; grid cell width = radius → 3×3 neighborhood


def _scatter_sql(mult1: int, mult2: int, mod: int) -> str:
    h = f"(event_id * {mult1} % 4294967296)"
    return f"(xor({h}, {h} // 65536) * {mult2} % 4294967296) % {mod}"


@register(
    "spatial_grid_pair_histogram",
    survey_ref="§2.7,§2.6,M5:dedup",
    oracle=f"""
WITH pts AS (
  SELECT event_id AS id,
         {_scatter_sql(2654435761, 49157, 997)} AS x,
         {_scatter_sql(2246822519, 40503, 991)} AS y
  FROM events WHERE event_id % 5 = 0
)
SELECT (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS d2,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pts a JOIN pts b
  ON b.x BETWEEN a.x - {_SP_R} AND a.x + {_SP_R}
 AND b.y BETWEEN a.y - {_SP_R} AND a.y + {_SP_R}
 AND a.id < b.id
WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {_SP_R * _SP_R}
GROUP BY 1
""",
)
def q_spatial_grid_pair_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius self-join (all point pairs within distance r) reduced to
    a squared-distance histogram — the spatial companion of the LSH
    dedup family and the core of collision detection, geo dedup, and
    sensor clustering. The scale-correct plan: snap points to r-wide
    grid cells, EXPLODE each left point to its 3×3 neighbor cells, and
    equi-join on the cell id — candidate pairs are bounded by local
    density times 9, never all-pairs; one shuffle keyed on the cell.
    The ``a.id < b.id`` orientation canonicalizes pairs (each found in
    exactly one offset). All-integer coordinates → exact d². The
    oracle is a DuckDB range join (IEJoin) over the raw coordinates —
    a genuinely different physical strategy for the same predicate."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 5 == 0)

    def scatter(mult1: int, mult2: int, mod: int):
        h = (F.col("event_id") * mult1) % F.lit(4294967296)
        mixed = h.bitwiseXOR(F.floor(h / F.lit(65536)).cast("bigint"))
        return (mixed * mult2 % F.lit(4294967296)) % F.lit(mod)

    pts = ev.select(
        F.col("event_id").alias("id"),
        scatter(2654435761, 49157, 997).alias("x"),
        scatter(2246822519, 40503, 991).alias("y"),
    )
    r = F.lit(_SP_R)
    offsets = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    a = pts.select(
        F.col("id").alias("ia"), F.col("x").alias("xa"), F.col("y").alias("ya"),
        F.explode(offsets).alias("o"),
    ).select(
        "ia", "xa", "ya",
        (F.floor(F.col("xa") / r) + F.col("o.dx")).alias("cx"),
        (F.floor(F.col("ya") / r) + F.col("o.dy")).alias("cy"),
    )
    b = pts.select(
        F.col("id").alias("ib"), F.col("x").alias("xb"), F.col("y").alias("yb"),
        F.floor(F.col("x") / r).alias("cx"), F.floor(F.col("y") / r).alias("cy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        a.join(b, ["cx", "cy"])
        .filter((F.col("ia") < F.col("ib")) & (d2 <= _SP_R * _SP_R))
        .select(d2.alias("d2"))
        .groupBy("d2")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "repeated_passage_mining",
    survey_ref="M5:text,M5:dedup,§2.6",
    oracle="""
WITH sh AS (
  SELECT doc_id, substring(text, s, 30) AS sg
  FROM documents
  CROSS JOIN UNNEST(range(1, GREATEST(len(text) - 29, 1) + 1, 10)) AS t(s)
  WHERE len(text) >= 30
)
SELECT sg,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occ
FROM sh
GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
""",
)
def q_repeated_passage_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-passage mining: fixed-length character
    shingles (30 chars, stride 10) that appear in ≥2 distinct
    documents — the detection half of exact-substring dedup (Lee et
    al., "Deduplicating Training Data Makes Language Models Better"),
    which removes verbatim boilerplate MinHash's whole-document
    granularity misses. Shingling is row-local (sequence + substring
    HOFs, no UDF), then ONE aggregation keyed by the shingle string:
    pairs of duplicate docs never materialize — the group-by bounds
    work by total shingle count, not doc², which is what survives a
    100 TB corpus where boilerplate passages may occur millions of
    times. Complements ``decontaminate_overlap`` (train-vs-eval
    equi-join) and ``doc_repetition_metrics`` (within-doc)."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 30)
    positions = F.sequence(F.lit(1), F.greatest(F.length("text") - 29, F.lit(1)), F.lit(10))
    sh = d.select(
        "doc_id",
        F.explode(F.transform(positions, lambda s: F.substring(F.col("text"), s, F.lit(30)))).alias("sg"),
    )
    return (
        sh.groupBy("sg")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@register(
    "global_row_index",
    survey_ref="§2.8,§2.9,X4",
    oracle="""
SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS idx
FROM documents
""",
)
def q_global_row_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable global row numbering (zipWithIndex-at-scale): assign each
    document its 1-based rank in doc_id order WITHOUT the
    single-partition global-sort window that a naive
    ``row_number() OVER (ORDER BY ...)`` plans, and without
    ``monotonically_increasing_id`` (whose values depend on physical
    partitioning). Two-phase: rows bucket by key range, a per-bucket
    count aggregate (hundreds of rows) takes a tiny prefix-sum window
    and broadcasts offsets back, and ranks come from a window
    PARTITIONED by bucket — the same decomposition Spark's own
    zipWithIndex uses (per-partition counts → offsets), expressed
    declaratively. The primitive every training-data shard writer
    needs for stable example ids."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.withColumn("bucket", (F.col("doc_id") / F.lit(64)).cast("bigint"))
    counts = d.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("n").over(wb), F.lit(0)).alias("offset")
    )
    wi = Window.partitionBy("bucket").orderBy("doc_id")
    return (
        d.join(F.broadcast(offsets), "bucket")
        .select("doc_id", (F.col("offset") + F.row_number().over(wi)).alias("idx"))
    )


@register(
    "seasonal_hour_baseline",
    survey_ref="§2.6,§2.8,A1",
    oracle="""
WITH v AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS hod,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events
),
stats AS (
  SELECT event_type, hod,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(vc) AS BIGINT) AS s,
         CAST(SUM(vc * vc) AS BIGINT) AS sq
  FROM v GROUP BY 1, 2
)
SELECT v.event_type, CAST(v.hod AS INTEGER) AS hod,
       MAX(st.n) AS n,
       CAST(FLOOR(MAX(st.s) * 100.0 / MAX(st.n) + 0.5) AS BIGINT) / 10000.0 AS baseline,
       CAST(SUM(CASE WHEN (v.vc * st.n - st.s) * (v.vc * st.n - st.s)
                          > 4 * (st.n * st.sq - st.s * st.s)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous
FROM v JOIN stats st USING (event_type, hod)
GROUP BY 1, 2
""",
)
def q_seasonal_hour_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal (hour-of-day) baseline + 2σ anomaly counts per
    event_type — the monitoring pattern that beats a global z-score
    (``window_zscore_anomaly``) on strongly diurnal metrics: each
    observation is judged against ITS OWN hour's distribution. The 2σ
    fence is evaluated in cross-multiplied integer form
    ((vc·n − s)² > 4(n·sq − s²), all exact BIGINTs — no sqrt, no
    float σ), so anomaly counts are bit-deterministic at any
    partitioning. One sufficient-stats aggregation on the bounded
    (type, hour) key, broadcast back, one counting pass."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.hour("ts").cast("int").alias("hod"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("vc"),
    )
    stats = v.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vc").alias("s"),
        # squared-value accumulator widened to DECIMAL(38,0): BIGINT
        # holds the sums of 100 TB of cent values but not of their
        # squares (same headroom class scale_probe caught in
        # stat_corr_covar_suffstats); DuckDB's SUM is HUGEINT already.
        F.sum((F.col("vc") * F.col("vc")).cast("decimal(38,0)")).alias("sq"),
    )
    j = v.join(F.broadcast(stats), ["event_type", "hod"])
    dev = F.col("vc").cast("decimal(38,0)") * F.col("n") - F.col("s")
    fence = dev * dev > 4 * (F.col("n") * F.col("sq") - F.col("s") * F.col("s"))
    return j.groupBy("event_type", "hod").agg(
        F.max("n").cast("bigint").alias("n"),
        (
            F.floor(F.max("s") * F.lit(100.0) / F.max("n") + F.lit(0.5)).cast("bigint")
            / F.lit(10000.0)
        ).alias("baseline"),
        F.sum(F.when(fence, 1).otherwise(0)).cast("bigint").alias("n_anomalous"),
    )


@register(
    "cumulative_distinct_users",
    survey_ref="§2.6,§2.8",
    oracle="""
WITH f AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY 1
),
d AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users FROM f GROUP BY 1)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM d
""",
)
def q_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — the growth-curve query that
    naively needs COUNT(DISTINCT) over an ever-growing prefix per day
    (quadratic re-scans). The scale form: distinct collapses to each
    user's FIRST-SEEN day (one keyed aggregation over users), daily
    new-user counts follow, and the running total is a window over the
    ~30-row daily series — incremental-materialization friendly, since
    yesterday's curve never changes. Same first-touch decomposition
    every funnel/growth pipeline uses."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("day"))
    d = f.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return d.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


# --- integer Lloyd's k-means ------------------------------------------------
_KM_K, _KM_T, _KM_D = 4, 2, 64


def _km_assign_cte(prev_c: str, pts: str = "pts") -> str:
    d2 = (
        f"list_sum(list_transform(range(1, {_KM_D + 1}), "
        f"i -> (p.x[i]-c.c[i])*(p.x[i]-c.c[i])))"
    )
    return f"""(
  SELECT vec_id, x, cl, d2 FROM (
    SELECT p.vec_id, p.x, c.cl, {d2} AS d2,
           ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY {d2}, c.cl) AS rn
    FROM {pts} p CROSS JOIN {prev_c} c
  ) WHERE rn = 1
)"""


def _km_oracle() -> str:
    sql = f"""
WITH pts AS (
  SELECT vec_id,
         list_transform(embedding, e -> CAST(FLOOR(CAST(e AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS x
  FROM embeddings
),
c0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cl, x AS c
  FROM (SELECT vec_id, x FROM pts ORDER BY vec_id LIMIT {_KM_K})
)"""
    for t in range(1, _KM_T + 1):
        sql += f""",
a{t} AS {_km_assign_cte(f'c{t - 1}')},
s{t} AS (
  SELECT cl, r.i AS i, CAST(FLOOR(CAST(SUM(x[r.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS ci
  FROM a{t} CROSS JOIN UNNEST(range(1, {_KM_D + 1})) AS r(i)
  GROUP BY cl, r.i
),
c{t} AS (SELECT cl, list(ci ORDER BY i) AS c FROM s{t} GROUP BY cl)"""
    sql += f""",
fin AS {_km_assign_cte(f'c{_KM_T}')}
SELECT f.cl, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(f.d2) AS BIGINT) AS inertia,
       CAST(MAX(list_sum(list_transform(c.c, v -> ABS(v)))) AS BIGINT) AS centroid_l1
FROM fin f JOIN c{_KM_T} c ON c.cl = f.cl
GROUP BY 1
"""
    return sql


@register(
    "kmeans_lloyd_integer",
    survey_ref="M4,A1,§2.6,M5:ann",
    oracle=_km_oracle(),
)
def q_kmeans_lloyd_integer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (K=4, 2 update sweeps + final
    assignment) over the embedding corpus, BIT-EXACT cross-engine:
    vectors quantize to integer milliunits, distances are exact
    integer sums, and centroid updates floor the per-dim mean through
    one exact double division — so a *clustering algorithm* passes a
    byte-level hash gate, which float k-means (summation-order
    dependent) never could. The layout is MLlib's own: centroids live
    on the DRIVER (K·D = 256 ints — metadata, same license as the IVF
    cell fetch in ``queries/advanced.py``), assignment is a pure
    column expression against centroid literals (NO shuffle, no
    crossJoin), and each sweep's only shuffle is the K·D-row partial
    aggregate of per-cluster per-dim sums. Per-sweep cost at 100 TB:
    one map-side-combined aggregation, exactly like
    ``KMeans.fit``'s ``treeAggregate``. Init = the K lowest vec_ids
    (k-means‖ would slot in the same seam). The DuckDB oracle
    recomputes every sweep relationally (cross join + window argmin +
    per-dim regrouping) — a different plan for the same fixpoint.
    Empty clusters drop out of the centroid relation identically in
    both engines."""
    e = load_table(spark, sf_dir, "embeddings")
    pts = e.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda v: F.floor(v.cast("double") * 1000 + F.lit(0.5)).cast("bigint"),
        ).alias("x"),
    ).localCheckpoint(eager=True)  # scanned T+2 times: quantize once.
    # eager-vs-lazy measured r11: identical warm cost (~0.4 s both; the
    # apparent 2 s eager penalty was first-run codegen) — eager kept so
    # the frame is FULLY materialized before the seed limit(4), which
    # under lazy would checkpoint only the partitions the limit touches

    seeds = pts.orderBy("vec_id").limit(_KM_K).collect()
    # (cluster label, centroid) pairs — labels survive empty clusters
    cl_ids: list[int] = list(range(_KM_K))
    cents: list[list[int]] = [list(r["x"]) for r in seeds]

    def dist_sql(c: list[int]) -> str:
        # built as a SQL STRING, not composed Columns: the Column form
        # of K=4 × D=64 literal arrays + zip_with + fold costs ~0.6 s
        # of Py4J round-trips PER SWEEP (×3 invocations ≈ 1.8 s of
        # driver-side build that also serializes under concurrency —
        # the kmeans 4.4× driver-bench outlier, VERDICT r10 task 1);
        # the string parses JVM-side in ~0.04 s. Optimized plan is
        # identical to the Column form
        # (tests/test_sqlstring_forms.py::test_kmeans_sql_string_form
        # asserts sameResult) — same template as pq_adc_topk
        # (queries/vectors.py).
        arr = ",".join(f"{int(v)}L" for v in c)
        return (
            f"aggregate(zip_with(x, array({arr}), (a, b) -> (a - b) * (a - b)),"
            f" 0L, (acc, v) -> acc + v)"
        )

    def assigned_frame():
        """(x, cl, d2) with the distance array STAGED in its own
        projection: ``ds`` feeds both array_min and array_position,
        and downstream Generate/aggregate nodes block projection
        collapse, so without the stage the 4 fold expressions would
        interpret twice per row (the expression-recompute trap —
        measured 8× on the sweep). Ties → lowest label: dist exprs
        follow ascending cl_ids order and array_position picks the
        FIRST minimum, matching the oracle's ORDER BY d2, cl."""
        ds = ",".join(dist_sql(c) for c in cents)
        staged = pts.selectExpr("x", f"array({ds}) AS ds")
        labels = ",".join(str(int(c)) for c in cl_ids)
        return staged.selectExpr(
            "x",
            f"element_at(array({labels}),"
            f" cast(array_position(ds, array_min(ds)) as int)) AS cl",
            "array_min(ds) AS d2",
        )

    import math

    for _t in range(_KM_T):
        with _loop_shuffle(spark, 8):
            sums = (
                assigned_frame()
                .select("cl", F.posexplode("x").alias("i", "v"))
                .groupBy("cl", "i")
                .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
                .collect()
            )
        by_cl: dict[int, dict[int, int]] = {}
        for r in sums:
            by_cl.setdefault(r["cl"], {})[r["i"]] = int(
                math.floor(float(r["s"]) / r["n"])
            )
        cl_ids = sorted(by_cl)
        cents = [[by_cl[cl][i] for i in range(_KM_D)] for cl in cl_ids]

    fin = assigned_frame().select("cl", "d2")
    l1_pairs = F.map_from_arrays(
        F.array(*[F.lit(int(c)).cast("int") for c in cl_ids]),
        F.array(*[F.lit(int(sum(abs(v) for v in c))).cast("bigint") for c in cents]),
    )
    return fin.groupBy("cl").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d2").cast("bigint").alias("inertia"),
        F.max(F.element_at(l1_pairs, F.col("cl"))).cast("bigint").alias("centroid_l1"),
    )


# BFS graph: 2-out-regular digraph on the 512 event-id residues
# (u -> 31u+7 mod 512, u -> 17u+3 mod 512) — every residue class is
# populated at every SF, reachable diameter 15 from source 0.
_BFS_N = 512
_BFS_MAX_HOPS = 20

_EDGES_SQL = f"""edges AS (
  SELECT u, v, 1 + (u + v) % 7 AS w FROM (
    SELECT DISTINCT event_id % {_BFS_N} AS u, (event_id % {_BFS_N} * 31 + 7) % {_BFS_N} AS v
    FROM events
    UNION
    SELECT DISTINCT event_id % {_BFS_N}, (event_id % {_BFS_N} * 17 + 3) % {_BFS_N}
    FROM events
  )
)"""


def _residue_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic residue digraph with integer edge weights
    w(u,v) = 1 + (u+v) mod 7, pre-partitioned on the join key and
    lineage-cut (reused every sweep by the BFS / Bellman-Ford loops)."""
    ev = load_table(spark, sf_dir, "events")
    u = (F.col("event_id") % _BFS_N).alias("u")
    e1 = ev.select(u, (((F.col("event_id") % _BFS_N) * 31 + 7) % _BFS_N).alias("v"))
    e2 = ev.select(u, (((F.col("event_id") % _BFS_N) * 17 + 3) % _BFS_N).alias("v"))
    return (
        e1.union(e2)
        .distinct()
        .select("u", "v", (1 + (F.col("u") + F.col("v")) % 7).alias("w"))
        .repartition("u")
        .localCheckpoint(eager=True)
    )


@register(
    "bfs_shortest_hops",
    survey_ref="§2.7,§2.10,M5:dedup",
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
  WHERE r.hops < {_BFS_MAX_HOPS}
)
SELECT node, CAST(MIN(hops) AS INTEGER) AS hops
FROM reach GROUP BY node
""",
)
def q_bfs_shortest_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS shortest hop counts over a deterministic
    link graph — the reachability/radius primitive of lineage walks,
    social-distance features, and crawl-frontier scheduling. Spark
    form: level-synchronous frontier expansion — per sweep ONE keyed
    join (frontier ⋈ edges on the node key) and one anti-join against
    the settled set, lineage cut per sweep, loop exits when the
    frontier drains (≤ graph diameter sweeps, 15 here). This is the
    scale-correct BFS: state is (node, hops), partitioned by node; no
    global collect. The oracle is a DuckDB RECURSIVE CTE — a
    genuinely different evaluation strategy (semi-naive datalog)
    checking the same fixpoint. Graph derived from events residues
    (FIXTURES.md-style deterministic derivation, all residues present
    at every SF)."""
    # edge dedup is event-scale — build it at full parallelism, BEFORE
    # pinning the loop's state-partition count
    edges = _residue_edges(spark, sf_dir)
    with _loop_shuffle(spark, 4):
        dist = (
            spark.range(1)
            .select(F.lit(0).cast("bigint").alias("node"), F.lit(0).cast("int").alias("hops"))
            .localCheckpoint(eager=True)
        )
        frontier = dist
        # FOUR hops per sweep (r12; generalizes the r4/r11 two-hop
        # batching): at fixture scale each driver-side action costs
        # ~0.2 s of job launch, so quartering the sweep count cuts the
        # wall again (8 sweeps → 4 at eccentricity 15). Soundness is
        # the same invariant as the 2-hop form: ring j ⊇ every node
        # whose TRUE hop count is h+j−1 (its predecessor ring carries
        # all true-(h+j−2) nodes), every candidate label is the length
        # of a REAL walk from the source (never below the true hop
        # count), so MIN per node over the rings gives exact labels
        # and the anti-join against the settled set drops revisits.
        # Each sweep remains ONE JVM-parsed statement (the r11
        # Py4J-build elimination).
        hops_per_sweep = 4
        h = 1
        while h <= _BFS_MAX_HOPS:
            k = min(hops_per_sweep, _BFS_MAX_HOPS - h + 1)
            rings = ["r1 AS (SELECT e.v AS node FROM {f} f JOIN {e} e ON f.node = e.u)"]
            for j in range(2, k + 1):
                rings.append(
                    f"r{j} AS (SELECT e.v AS node FROM r{j - 1} r JOIN {{e}} e ON r.node = e.u)"
                )
            cand_sql = "\n  UNION ALL\n  ".join(
                f"SELECT node, CAST({h + j - 1} AS INT) AS hops FROM r{j}"
                for j in range(1, k + 1)
            )
            rings_sql = ",\n".join(rings)
            nxt = spark.sql(
                f"""
WITH {rings_sql}
SELECT g.node, g.hops
FROM (SELECT node, MIN(hops) AS hops FROM ({cand_sql}) c GROUP BY node) g
LEFT ANTI JOIN {{d}} d ON g.node = d.node""",
                f=frontier,
                e=edges,
                d=dist,
            ).localCheckpoint(eager=True)
            if nxt.isEmpty():
                break
            # dist stays a shallow union tree of checkpointed pieces
            # (≤ 5 levels) — no per-sweep re-checkpoint needed
            dist = dist.union(nxt)
            # inner-ring discoveries were already expanded within the
            # sweep; only the outermost ring seeds the next one
            frontier = nxt.filter(F.col("hops") == h + k - 1)
            h += k
    return dist


_BF_COST_BOUND = 80  # > max min-cost (47) — verified in tests


@register(
    "bellman_ford_min_cost",
    survey_ref="§2.7,§2.10,M5:dedup",
    oracle=f"""
WITH RECURSIVE {_EDGES_SQL},
paths(node, cost) AS (
  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT e.v, p.cost + e.w
  FROM paths p JOIN edges e ON e.u = p.node
  WHERE p.cost + e.w <= {_BF_COST_BOUND}
)
SELECT node, CAST(MIN(cost) AS BIGINT) AS cost
FROM paths GROUP BY node
""",
)
def q_bellman_ford_min_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source WEIGHTED shortest paths (Bellman-Ford) over the
    residue digraph with integer edge weights 1+(u+v) mod 7 — the
    cost-aware sibling of ``bfs_shortest_hops`` (routing cost, ETL
    dependency latency, cheapest-join-path planning). Spark form:
    relaxation sweeps — per sweep ONE keyed join (settled ⋈ edges),
    a min-combine per node, and an O(1)-row convergence check (labels
    only improve, so the (node count, Σcost) signature is a strictly
    decreasing measure), lineage cut per sweep; terminates in at most
    |longest optimal path| sweeps. Integer costs → bit-exact minima.
    The DuckDB oracle explores the bounded-cost path space with a
    RECURSIVE CTE (bound {_BF_COST_BOUND} > max optimal cost 47, so
    no optimal path is pruned — margin asserted by the property
    test) and takes MIN per node: semi-naive datalog vs iterative
    relaxation, same fixpoint."""
    edges = _residue_edges(spark, sf_dir)  # event-scale dedup: full parallelism
    with _loop_shuffle(spark, 4):
        dist = (
            spark.range(1)
            .select(F.lit(0).cast("bigint").alias("node"), F.lit(0).cast("bigint").alias("cost"))
            .localCheckpoint(eager=True)
        )
        # labels only ever improve, so (n_nodes, Σcost) is a strictly
        # decreasing convergence measure: count grows on discovery, the
        # sum strictly drops on any relaxation — one tiny aggregate per
        # sweep instead of an anti-join action
        prev_sig = (1, 0)
        # FOUR relaxations per sweep (r12; generalizes the r4/r11
        # two-relaxation batching): ring j chains off the un-minimized
        # ring j−1 rows — sound because the final min-combine sees
        # every 1..4-edge extension of the current labels, so the
        # fixpoint after k sweeps equals 4k textbook relaxations;
        # quarters the sweep count and the per-sweep action count.
        # Ring row counts stay bounded: out-degree ≤ 2 on the residue
        # graph, so ring 4 carries ≤ 16·|V| rows before the combine.
        # One spark.sql statement per sweep (DataFrame kwargs) — same
        # Py4J-build elimination as the BFS loop above, identical
        # relaxation algebra.
        sweep_sql = """
SELECT node, MIN(cost) AS cost FROM (
  SELECT node, cost FROM {d}
  UNION ALL SELECT node, cost FROM (
    WITH r1 AS (SELECT e.v AS node, d0.cost + e.w AS cost
                FROM {d} d0 JOIN {e} e ON d0.node = e.u),
         r2 AS (SELECT e.v AS node, r1.cost + e.w AS cost
                FROM r1 JOIN {e} e ON r1.node = e.u),
         r3 AS (SELECT e.v AS node, r2.cost + e.w AS cost
                FROM r2 JOIN {e} e ON r2.node = e.u),
         r4 AS (SELECT e.v AS node, r3.cost + e.w AS cost
                FROM r3 JOIN {e} e ON r3.node = e.u)
    SELECT node, cost FROM r1
    UNION ALL SELECT node, cost FROM r2
    UNION ALL SELECT node, cost FROM r3
    UNION ALL SELECT node, cost FROM r4
  ) rings
) c GROUP BY node"""
        for _sweep in range(_BFS_MAX_HOPS + 1):
            dist = spark.sql(sweep_sql, d=dist, e=edges).localCheckpoint(eager=True)
            row = dist.agg(
                F.count(F.lit(1)).alias("n"), F.sum("cost").alias("s")
            ).collect()[0]
            sig = (row["n"], row["s"])
            if sig == prev_sig:
                break
            prev_sig = sig
    return dist


# Exact Jaccard ≥ 0.5 pairs over 3-word shingle sets — shared by the
# PPJoin query AND the MLlib MinHashLSH query (both must produce the
# complete exact answer; the LSH path post-verifies its candidates).
_SIMILAR_PAIRS_ORACLE = """
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(l3) AS tok FROM (
    SELECT doc_id, [l[x] || ' ' || l[x+1] || ' ' || l[x+2] FOR x IN range(1, len(l)-1)] AS l3
    FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents) WHERE len(l) >= 3
  )
),
dfreq AS (SELECT tok, COUNT(*) AS df FROM toks GROUP BY 1),
ranked AS (
  SELECT t.doc_id, t.tok,
         ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.tok) AS r,
         COUNT(*) OVER (PARTITION BY t.doc_id) AS n
  FROM toks t JOIN dfreq d USING (tok)
),
prefix AS (SELECT doc_id, tok FROM ranked WHERE r <= n - CEIL(n / 2.0) + 1),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM prefix a JOIN prefix b ON a.tok = b.tok AND a.doc_id < b.doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS i
  FROM cand c
  JOIN toks ta ON ta.doc_id = c.doc_a
  JOIN toks tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1)
SELECT doc_a, doc_b,
       CAST(i AS BIGINT) AS n_common,
       ROUND(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE 3 * i >= sa.n + sb.n
"""


@register(
    "set_similarity_prefix_join",
    survey_ref="M5:dedup,§2.7,§2.8",
    oracle=_SIMILAR_PAIRS_ORACLE,
)
def q_set_similarity_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join (Jaccard ≥ 0.5 on 3-word
    shingle sets) via AllPairs/PPJoin prefix filtering (Bayardo et
    al., WWW'07; Xiao et al., WWW'08) — the deterministic complement
    of the MinHash-LSH family (``operators/dedup.py``): LSH is
    probabilistic recall, the prefix filter is LOSSLESS. Tokens order
    globally by ascending document frequency (rarest first); each
    set's prefix is its first |s| − ⌈t·|s|⌉ + 1 tokens, and any pair
    with Jaccard ≥ t MUST collide in both prefixes — so the join is
    keyed on prefix tokens (bounded candidates, no all-pairs), then
    verified by counting full-set intersections FOR CANDIDATES ONLY.
    The ≥ t test is the integer predicate 3·|∩| ≥ |a|+|b| (t = 1/2) —
    no float threshold, bit-exact. Shuffles: token-keyed df count,
    per-doc rank window (partitioned by doc), prefix equi-join,
    candidate-keyed verification joins. At 100 TB the df dictionary
    broadcast and the rarest-first ordering are what keep prefix
    buckets shallow."""
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.operators.dedup import doc_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = doc_tokens(docs, shingle=3).localCheckpoint(eager=True)  # reused 4×
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    wr = Window.partitionBy("doc_id").orderBy("df", "tok")
    wn = Window.partitionBy("doc_id")
    ranked = toks.join(F.broadcast(dfreq), "tok").select(
        "doc_id",
        "tok",
        F.row_number().over(wr).alias("r"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    prefix = ranked.filter(
        F.col("r") <= F.col("n") - F.ceil(F.col("n") / 2.0) + 1
    ).select("doc_id", "tok")
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ta = toks.select(F.col("doc_id").alias("doc_a"), "tok")
    tb = toks.select(F.col("doc_id").alias("doc_b"), "tok")
    inter = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "tok"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(3 * F.col("i") >= F.col("na") + F.col("nb"))
        .select(
            "doc_a",
            "doc_b",
            F.col("i").cast("bigint").alias("n_common"),
            F.round(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 6).alias("jaccard"),
        )
    )


_CURATION_ORACLE = """
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(l3) AS tok FROM (
    SELECT doc_id, [l[x] || ' ' || l[x+1] || ' ' || l[x+2] FOR x IN range(1, len(l)-1)] AS l3
    FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents) WHERE len(l) >= 3
  )
),
dfreq AS (SELECT tok, COUNT(*) AS df FROM toks GROUP BY 1),
ranked AS (
  SELECT t.doc_id, t.tok,
         ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.tok) AS r,
         COUNT(*) OVER (PARTITION BY t.doc_id) AS n
  FROM toks t JOIN dfreq d USING (tok)
),
prefix AS (SELECT doc_id, tok FROM ranked WHERE r <= n - CEIL(n / 2.0) + 1),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM prefix a JOIN prefix b ON a.tok = b.tok AND a.doc_id < b.doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS i
  FROM cand c
  JOIN toks ta ON ta.doc_id = c.doc_a
  JOIN toks tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1),
neardup AS (
  SELECT DISTINCT i.doc_b AS doc_id
  FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a JOIN sizes sb ON sb.doc_id = i.doc_b
  WHERE 3 * i.i >= sa.n + sb.n
),
contaminated AS (
  SELECT tr.doc_id
  FROM toks tr JOIN toks ev ON ev.tok = tr.tok AND ev.doc_id % 97 = 0
  WHERE tr.doc_id % 97 <> 0
  GROUP BY tr.doc_id HAVING COUNT(DISTINCT tr.tok) >= 2
),
base AS (
  SELECT d.doc_id, d.lang,
         LEN(string_split(d.text,' ')) AS n_tokens,
         LEN(list_distinct(string_split(d.text,' '))) * 1.0 / LEN(string_split(d.text,' ')) AS ttr,
         MIN(d.doc_id) OVER (PARTITION BY d.text) AS canonical
  FROM documents d
),
status AS (
  SELECT b.lang, b.n_tokens,
         CASE WHEN b.doc_id % 97 = 0 THEN 'eval_holdout'
              WHEN b.n_tokens < 5 OR b.ttr < 0.3 THEN 'quality_fail'
              WHEN b.doc_id <> b.canonical THEN 'exact_dup'
              WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
              WHEN ct.doc_id IS NOT NULL THEN 'contaminated'
              ELSE 'kept' END AS status
  FROM base b
  LEFT JOIN neardup nd ON nd.doc_id = b.doc_id
  LEFT JOIN contaminated ct ON ct.doc_id = b.doc_id
)
SELECT lang, status,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN status = 'kept' THEN CAST(CEIL(n_tokens / 512.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS n_bins
FROM status GROUP BY 1, 2
"""


@register(
    "corpus_curation_report",
    survey_ref="M5:text,M5:dedup,§3.1,§2.7",
    oracle=_CURATION_ORACLE,
)
def q_corpus_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-corpus curation funnel in ONE declarative
    DAG — the report a 100 TB data build publishes with every release:
    per (lang, disposition) doc/token counts through eval-holdout
    carve-out → quality gates (length, lexical diversity) → exact-dup
    keep-first → LOSSLESS near-dup suppression (the PPJoin prefix
    join, ``set_similarity_prefix_join`` reused as a subquery — the
    corpus operators COMPOSE) → n-gram decontamination vs the held-out
    split, plus 512-token packing-bin counts for what ships.
    Disposition precedence is first-gate-wins, so the funnel counts
    are a partition of the corpus (Σ n_docs = |documents|, asserted by
    the property test). Every stage is a keyed join/aggregate on the
    doc or shingle key; statuses resolve with two LEFT joins against
    tiny suppression sets — nothing quadratic anywhere."""
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.operators.dedup import doc_tokens

    d = load_table(spark, sf_dir, "documents")
    pairs = q_set_similarity_prefix_join(spark, sf_dir)
    neardup = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    toks = doc_tokens(d, shingle=3)
    tr = toks.filter(F.col("doc_id") % 97 != 0)
    ev = toks.filter(F.col("doc_id") % 97 == 0).select(F.col("tok").alias("etok"))
    contaminated = (
        tr.join(ev.distinct(), tr["tok"] == F.col("etok"))
        .groupBy("doc_id")
        .agg(F.count_distinct("tok").alias("n_overlap"))
        .filter(F.col("n_overlap") >= 2)
        .select("doc_id")
    )
    toks_split = F.split(F.col("text"), " ")
    base = d.select(
        "doc_id",
        "lang",
        "text",
        F.size(toks_split).alias("n_tokens"),
        (F.size(F.array_distinct(toks_split)) / F.size(toks_split)).alias("ttr"),
    ).withColumn("canonical", F.min("doc_id").over(Window.partitionBy("text")))
    status = (
        base.join(neardup.withColumn("is_nd", F.lit(True)), "doc_id", "left")
        .join(contaminated.withColumn("is_ct", F.lit(True)), "doc_id", "left")
        .select(
            "lang",
            "n_tokens",
            F.when(F.col("doc_id") % 97 == 0, "eval_holdout")
            .when((F.col("n_tokens") < 5) | (F.col("ttr") < 0.3), "quality_fail")
            .when(F.col("doc_id") != F.col("canonical"), "exact_dup")
            .when(F.col("is_nd"), "near_dup")
            .when(F.col("is_ct"), "contaminated")
            .otherwise("kept")
            .alias("status"),
        )
    )
    return status.groupBy("lang", "status").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum(
            F.when(F.col("status") == "kept", F.ceil(F.col("n_tokens") / 512.0)).otherwise(0)
        )
        .cast("bigint")
        .alias("n_bins"),
    )


@register(
    "multi_touch_attribution",
    survey_ref="§2.7,§2.8,§2.6",
    oracle="""
WITH purchases AS (
  SELECT event_id AS pid, user_id, ts AS pts,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events WHERE event_type = 'purchase'
),
touches AS (
  SELECT p.pid, p.vc, e.event_id, e.event_type, e.ts,
         COUNT(*) OVER (PARTITION BY p.pid) AS n,
         ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY e.ts, e.event_id) AS rn
  FROM purchases p
  JOIN events e ON e.user_id = p.user_id
              AND e.ts < p.pts AND e.ts >= p.pts - INTERVAL '1 hour'
              AND e.event_type <> 'purchase'
),
credited AS (
  SELECT event_type,
         (vc * 1000) // n + CASE WHEN rn = 1 THEN (vc * 1000) % n ELSE 0 END AS credit
  FROM touches
),
direct AS (
  SELECT '(direct)' AS event_type, p.vc * 1000 AS credit
  FROM purchases p
  WHERE NOT EXISTS (
    SELECT 1 FROM events e
    WHERE e.user_id = p.user_id AND e.ts < p.pts
      AND e.ts >= p.pts - INTERVAL '1 hour' AND e.event_type <> 'purchase'
  )
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_credits,
       CAST(SUM(credit) AS BIGINT) AS credited_millicents
FROM (SELECT * FROM credited UNION ALL SELECT * FROM direct)
GROUP BY 1
""",
)
def q_multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value splits
    EQUALLY across the user's touches in the prior hour, unmatched
    purchases credit '(direct)' — the ad-tech companion of
    ``asof_last_click`` (last-touch) that exercises a per-key temporal
    RANGE join plus an exact integer split: every touch gets
    ⌊v·1000/n⌋ millicents and the remainder goes to the EARLIEST touch
    (deterministic tie-break), so credits sum to exactly v·1000 —
    conservation asserted by the property test, and the whole report
    is bit-exact with no float shares. The join is keyed on user_id
    with a bounded 1-hour range predicate: per-user event counts bound
    the intermediates, the same locality argument as
    ``interval_overlap_join``. The no-touch side reuses the join as a
    LEFT ANTI — Spark plans both from one shuffle layout."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("puser"),
        F.col("ts").alias("pts"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("vc"),
    )
    cond = (
        (F.col("user_id") == F.col("puser"))
        & (F.col("ts") < F.col("pts"))
        & (F.col("ts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("event_type") != "purchase")
    )
    touches = purchases.join(ev, cond)
    wn = Window.partitionBy("pid")
    wr = Window.partitionBy("pid").orderBy("ts", "event_id")
    credited = touches.select(
        "event_type",
        "vc",
        F.count(F.lit(1)).over(wn).alias("n"),
        F.row_number().over(wr).alias("rn"),
    ).select(
        "event_type",
        (
            F.expr("(vc * 1000) div n")
            + F.when(F.col("rn") == 1, (F.col("vc") * 1000) % F.col("n")).otherwise(0)
        ).alias("credit"),
    )
    direct = (
        purchases.join(ev, cond, "left_anti")
        .select(F.lit("(direct)").alias("event_type"), (F.col("vc") * 1000).alias("credit"))
    )
    return (
        credited.unionByName(direct)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum("credit").cast("bigint").alias("credited_millicents"),
        )
    )


@register(
    "date_spine_zero_fill",
    survey_ref="§2.6,§2.7,§2.4",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events
),
spine AS (
  SELECT t.h, ty.event_type
  FROM bounds b
  CROSS JOIN UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS t(h)
  CROSS JOIN (SELECT DISTINCT event_type FROM events) ty
),
counts AS (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT s.event_type, s.h AS hour_start,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM spine s LEFT JOIN counts c ON c.event_type = s.event_type AND c.h = s.h
""",
)
def q_date_spine_zero_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly activity per event_type with a GENERATED time spine —
    the gap-filling idiom every dashboard needs: hours with zero
    events must appear as explicit zeros, which no GROUP BY over the
    raw table can produce (absent groups don't exist). The spine is
    one 1-row min/max aggregate exploded through ``sequence()`` and
    cross-joined with the tiny type dimension — generated rows =
    hours × types, independent of event volume — then LEFT-joined to
    the hourly counts (the fact side aggregates BEFORE the join, so
    the spine join touches slot-count rows, never events). Companion
    of ``resample_ffill`` (which fills by carrying values; this fills
    by zero, the correct semantics for counts)."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    types = ev.select("event_type").distinct()
    spine = (
        bounds.select(
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
        )
        .crossJoin(F.broadcast(types))
    )
    counts = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        spine.join(counts, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.col("h").alias("hour_start"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
        )
    )


@register(
    "event_path_trigrams",
    survey_ref="§2.8,§2.6,§2.9",
    oracle="""
WITH seq AS (
  SELECT event_type,
         LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
         LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t3
  FROM events
)
SELECT event_type || '>' || t2 || '>' || t3 AS path, CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE t3 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, path LIMIT 25
""",
)
def q_event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey trigrams (3 consecutive event types per user)
    — the path-mining step between the pair-level
    ``event_transition_matrix`` and full sequence mining: one lead
    window per user (sliding trigrams materialize row-locally, no
    self-join), a path-keyed count, and a deterministic top-k
    (count desc, path asc ties). Path cardinality is bounded by
    |types|³, so the final sort is a TakeOrdered over ≤125 rows no
    matter how many events flow in."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "event_type", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(25)
    )


@register(
    "clamped_inventory_balance",
    survey_ref="§2.12,§2.6,§2.8",
    oracle="""
WITH deltas AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase'
              THEN -3 * CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
              ELSE CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END AS d
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(list_reduce(
         list_prepend(CAST(0 AS BIGINT), list(d ORDER BY ts, event_id)),
         (acc, x) -> GREATEST(acc + x, 0)
       ) AS BIGINT) AS final_balance_cents
FROM deltas GROUP BY user_id
""",
)
def q_clamped_inventory_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CLAMPED running balance (inventory semantics: stock
    floors at zero, so a sale into empty stock is lost, not owed) —
    the canonical NON-LINEAR fold that no window function can express:
    greatest(acc+x, 0) is order-dependent and non-associative, unlike
    a running SUM. The Spark form stays declarative: per key, the
    ordered delta sequence materializes via sort_array over
    (ts, event_id, delta) structs (struct comparison = lexicographic,
    the deterministic order both engines share) and folds through the
    ``aggregate`` higher-order function — state per key is one array,
    bounded by per-user event counts, the same per-key-bounded
    argument as sessionization. The clamp is load-bearing: it differs
    from max(sum, 0) for a third of users (pinned by the property
    test). All-integer deltas → bit-exact."""
    ev = load_table(spark, sf_dir, "events")
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    d = F.when(F.col("event_type") == "purchase", -3 * vc).otherwise(vc)
    rows = ev.select(
        "user_id",
        F.struct(F.col("ts"), F.col("event_id"), d.alias("d")).alias("s"),
    )
    folded = rows.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.aggregate(
            F.transform(F.sort_array(F.collect_list("s")), lambda s: s["d"]),
            F.lit(0).cast("bigint"),
            lambda acc, x: F.greatest(acc + x, F.lit(0).cast("bigint")),
        ).alias("final_balance_cents"),
    )
    return folded.select(
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("final_balance_cents").cast("bigint").alias("final_balance_cents"),
    )


@register(
    "split_distinct_agg",
    survey_ref="§2.6,A3",
    oracle="""
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1
""",
)
def q_split_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key distinct counting via SPLIT (salted two-phase) distinct
    aggregation — Flink's SPLIT_DISTINCT_AGG / BigQuery's
    "partial distinct" pattern: plain COUNT(DISTINCT) on a 5-value
    group key funnels EVERY distinct value through 5 reducers (map-
    side combine cannot shrink distinct sets the way it shrinks sums),
    so one hot key owns one task at 100 TB. The salt (user_id mod 16)
    splits each group's distinct set into 16 DISJOINT shards —
    per-(key, salt) exact distinct counts, then an algebraic SUM per
    key: correctness is exact because the shards partition the user
    space. Same answer, 16× the reduce parallelism on the heavy
    phase. The oracle is the naive one-phase form."""
    ev = load_table(spark, sf_dir, "events")
    phase1 = (
        ev.groupBy("event_type", (F.col("user_id") % 16).alias("salt"))
        .agg(F.count_distinct("user_id").alias("nd"))
    )
    return phase1.groupBy("event_type").agg(
        F.sum("nd").cast("bigint").alias("n_users")
    )


@register(
    "ewma_final_per_user",
    survey_ref="§2.12,§2.6",
    oracle="""
WITH d AS (
  SELECT user_id, ts, event_id, CAST(FLOOR(value*100+0.5) AS BIGINT) AS vc FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       list_reduce(list_prepend(CAST(0 AS DOUBLE), list(CAST(vc AS DOUBLE) ORDER BY ts, event_id)),
                   (acc, x) -> acc * 0.5 + x * 0.5) AS ewma_cents
FROM d GROUP BY 1
""",
)
def q_ewma_final_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α = 1/2) per user — the
    classic recursive smoother that NO window frame expresses (each
    state depends on the previous state, not on a frame of inputs).
    Like ``clamped_inventory_balance`` it runs as an ordered per-key
    fold — and it makes a sharper point about float determinism: the
    fold's operation SEQUENCE is pinned by the explicit (ts, event_id)
    sort, so even though the accumulator is a double, both engines
    execute the identical IEEE mul/add chain and the result is
    BIT-exact with no rounding — order-dependent float math is fine
    when the order is part of the semantics. α = 1/2 keeps every
    intermediate dyadic-scaled. State per key: one array, bounded by
    per-user event counts."""
    ev = load_table(spark, sf_dir, "events")
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    rows = ev.select(
        "user_id",
        F.struct(F.col("ts"), F.col("event_id"), vc.cast("double").alias("v")).alias("s"),
    )
    return rows.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.aggregate(
            F.transform(F.sort_array(F.collect_list("s")), lambda s: s["v"]),
            F.lit(0.0),
            lambda acc, x: acc * 0.5 + x * 0.5,
        ).alias("ewma_cents"),
    )


@register(
    "mllib_minhash_lsh_join",
    survey_ref="M5:dedup,M4,§2.7",
    oracle=_SIMILAR_PAIRS_ORACLE,
)
def q_mllib_minhash_lsh_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib-NATIVE near-dup join (SURVEY M5 named this estimator
    explicitly): CountVectorizer(binary) → ``MinHashLSH`` (24 hash
    tables, fixed seed) → ``approxSimilarityJoin`` at distance 0.6 →
    EXACT post-verification (recompute |∩| on the token sets, keep
    3·|∩| ≥ |a|+|b|). The verification makes precision exact by
    construction, and at the corpus's similarity profile (true pairs
    all at Jaccard ≥ 0.5, miss probability ≤ (1−s)²⁴ per pair) recall
    is complete — so the MLlib estimator is held to the SAME exact
    oracle as the lossless prefix join and the custom LSH family, and
    the three implementations triangulate each other. The LSH join is
    banded/bucketed exactly like ``operators/dedup.py``'s custom path;
    what this adds is the stock-estimator surface a migrating MLlib
    user calls."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    from high_energy_gamma_ray_search_in_kascade_array_data_spark.operators.dedup import doc_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = doc_tokens(docs, shingle=3).localCheckpoint(eager=True)
    sets = toks.groupBy("doc_id").agg(F.collect_set("tok").alias("toks"))
    cv = CountVectorizer(inputCol="toks", outputCol="features", binary=True).fit(sets)
    feat = cv.transform(sets).select("doc_id", "features")
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=24, seed=42
    ).fit(feat)
    cand = (
        mh.approxSimilarityJoin(feat, feat, 0.6, distCol="d")
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )
    ta = toks.select(F.col("doc_id").alias("doc_a"), "tok")
    tb = toks.select(F.col("doc_id").alias("doc_b"), "tok")
    inter = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "tok"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(3 * F.col("i") >= F.col("na") + F.col("nb"))
        .select(
            "doc_a",
            "doc_b",
            F.col("i").cast("bigint").alias("n_common"),
            F.round(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 6).alias("jaccard"),
        )
    )


@register(
    "mllib_brp_lsh_transform",
    survey_ref="M5:ann,M4,§2.12",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       8 AS n_tables,
       1 AS hashes_complete
FROM embeddings
""",
)
def q_mllib_brp_lsh_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib-native ``BucketedRandomProjectionLSH`` over the embedding
    corpus (SURVEY M5 named this estimator) — the stock euclidean-LSH
    indexing surface a migrating MLlib user calls before
    ``approxNearestNeighbors``. The fixture's random vectors
    concentrate at pairwise distance ≈ √2 (the curse-of-dimensionality
    regime), so UNLIKE ``mllib_minhash_lsh_join`` no exact-recall
    oracle is honest here; the checked surface is the
    ``mllib_lr_pipeline``-style invariants, which ARE deterministic:
    every vector is indexed exactly once (n_items equals the table
    count), every row carries all 8 hash-table signatures, and no
    signature is null/empty — an indexing pass that drops rows or
    emits ragged signatures fails the gate. The deterministic ANN
    paths with value-checked results live in
    ``queries/vectors.py``/``advanced.py`` (custom LSH / IVF / PQ);
    this query adds the stock-estimator seam."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings")
    feat = e.select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=1.0, numHashTables=8, seed=7
    ).fit(feat)
    hashed = brp.transform(feat)
    return hashed.select(
        F.size("hashes").alias("n_t"),
        F.when(
            F.exists(F.col("hashes"), lambda h: h.isNull()), 0
        ).otherwise(1).alias("ok"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.min("n_t").cast("int").alias("n_tables"),
        F.min("ok").cast("int").alias("hashes_complete"),
    )


@register(
    "referential_integrity_audit",
    survey_ref="§2.7,§2.6,§3.1",
    oracle="""
SELECT 'orphan_order_fk' AS check_name, CAST((
  SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderkey IS NULL) AS BIGINT) AS n_violations
UNION ALL
SELECT 'orphan_part_fk', CAST((
  SELECT COUNT(*) FROM lineitem l LEFT JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_partkey IS NULL) AS BIGINT)
UNION ALL
SELECT 'orphan_cust_fk', CAST((
  SELECT COUNT(*) FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_custkey IS NULL) AS BIGINT)
UNION ALL
SELECT 'dup_order_pk', CAST((
  SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1)) AS BIGINT)
UNION ALL
SELECT 'dup_line_pk', CAST((
  SELECT COUNT(*) FROM (SELECT l_orderkey, l_linenumber FROM lineitem
                        GROUP BY 1, 2 HAVING COUNT(*) > 1)) AS BIGINT)
""",
)
def q_referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit across the star schema — the data-quality
    gate a warehouse runs after every load: FK orphans (lineitem →
    orders/part, orders → customer) via LEFT ANTI joins, PK
    uniqueness via HAVING>1 groups. The fixture genuinely violates
    the composite (l_orderkey, l_linenumber) key (118k dup groups at
    sf0.1), so the audit exercises a real failure, not a vacuous
    zero. Each check is one keyed join/aggregate collapsed to a
    single count; the five 1-row results union into the report —
    Spark runs them as independent subtrees (no driver round-trips),
    and at 100 TB each check shares the scan of its fact table via
    the usual exchange reuse."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    pt = load_table(spark, sf_dir, "part")
    cs = load_table(spark, sf_dir, "customer")

    def count_row(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("bigint").alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )

    checks = [
        count_row(
            "orphan_order_fk",
            li.join(od, li["l_orderkey"] == od["o_orderkey"], "left_anti"),
        ),
        count_row(
            "orphan_part_fk",
            li.join(pt, li["l_partkey"] == pt["p_partkey"], "left_anti"),
        ),
        count_row(
            "orphan_cust_fk",
            od.join(cs, od["o_custkey"] == cs["c_custkey"], "left_anti"),
        ),
        count_row(
            "dup_order_pk",
            od.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") > 1),
        ),
        count_row(
            "dup_line_pk",
            li.groupBy("l_orderkey", "l_linenumber")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > 1),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


@register(
    "trailing_7d_active_users",
    survey_ref="§2.6,§2.7,§2.8",
    oracle="""
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM du)
SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau_trailing
FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
GROUP BY 1
""",
)
def q_trailing_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day (rolling WAU) — the metric
    windowed COUNT(DISTINCT) cannot express (distinct is not frame-
    decomposable). Scale form: events collapse FIRST to distinct
    (day, user) pairs (one keyed aggregation — the only event-scale
    pass), then a bounded range join fans each pair into the ≤7 days
    it supports, and a distinct count per day finishes. Intermediates
    are |distinct day-user pairs| × 7, independent of raw event
    volume — the decomposition that keeps rolling-distinct metrics
    tractable over years of history. Complements
    ``cumulative_distinct_users`` (all-time) and
    ``weekly_active_growth`` (calendar buckets)."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = du.select("day").distinct()
    joined = days.alias("d").join(
        du.alias("u"),
        (F.col("u.day") >= F.date_sub(F.col("d.day"), 6))
        & (F.col("u.day") <= F.col("d.day")),
    )
    return joined.groupBy(F.col("d.day").alias("day")).agg(
        F.count_distinct("user_id").cast("bigint").alias("wau_trailing")
    )


def _entropy_oracle_cte(table: str, col: str) -> str:
    return f"""(
  WITH c AS (SELECT {col} AS v, COUNT(*) AS n FROM {table} GROUP BY 1),
  t AS (SELECT SUM(n) AS tot, COUNT(*) AS k, list(CAST(n AS DOUBLE) ORDER BY v) AS ns FROM c)
  SELECT '{table}.{col}' AS column_name,
         CAST(k AS BIGINT) AS n_categories,
         CAST(tot AS BIGINT) AS n_rows,
         ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE), ns),
               (acc, x) -> acc - (x / tot) * LN(x / tot)), 6) AS entropy_nats
  FROM t
)"""


@register(
    "categorical_entropy_profile",
    survey_ref="§2.6,§3.1,§2.12",
    oracle=f"""
SELECT * FROM {_entropy_oracle_cte('events', 'event_type')}
UNION ALL
SELECT * FROM {_entropy_oracle_cte('documents', 'lang')}
UNION ALL
SELECT * FROM {_entropy_oracle_cte('documents', 'source')}
""",
)
def q_categorical_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the categorical columns — the distribution-
    drift / balance metric corpus profilers publish next to counts
    (a collapsing source mix shows up as falling entropy long before
    a hard failure). The interesting mechanics: H = −Σ p·ln p is a sum
    of TRANSCENDENTAL terms, normally summation-order flaky — here
    the per-category counts collapse to a tiny array SORTED by
    category value and fold through the ``aggregate`` HOF, the same
    order-pinning trick as ``ewma_final_per_user``, so both engines
    run the identical ln/mul/sub chain and the value is stable to the
    final ROUND. One keyed count per column (the only data-scale
    pass); the fold touches k ≤ 25 elements."""
    out = None
    for table, col in [("events", "event_type"), ("documents", "lang"), ("documents", "source")]:
        c = load_table(spark, sf_dir, table).groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("n")
        )
        t = c.agg(
            F.sum("n").alias("tot"),
            F.count(F.lit(1)).alias("k"),
            F.transform(
                F.sort_array(F.collect_list(F.struct(F.col("v"), F.col("n")))),
                lambda s: s["n"].cast("double"),
            ).alias("ns"),
        )
        row = t.select(
            F.lit(f"{table}.{col}").alias("column_name"),
            F.col("k").cast("bigint").alias("n_categories"),
            F.col("tot").cast("bigint").alias("n_rows"),
            F.round(
                F.aggregate(
                    F.col("ns"),
                    F.lit(0.0),
                    lambda acc, x: acc - (x / F.col("tot")) * F.log(x / F.col("tot")),
                ),
                6,
            ).alias("entropy_nats"),
        )
        out = row if out is None else out.unionByName(row)
    return out


_KCORE_K, _KCORE_ROUNDS = 4, 12


def _kcore_oracle() -> str:
    sql = f"""
WITH dir AS MATERIALIZED (
  SELECT DISTINCT event_id % {_BFS_N} AS u, (event_id % {_BFS_N} * 31 + 7) % {_BFS_N} AS v FROM events
  UNION
  SELECT DISTINCT event_id % {_BFS_N}, (event_id % {_BFS_N} * 17 + 3) % {_BFS_N} FROM events
),
edges AS MATERIALIZED (SELECT u, v FROM dir WHERE u <> v UNION SELECT v, u FROM dir WHERE u <> v),
n0 AS (SELECT DISTINCT u AS node FROM edges)"""
    for t in range(1, _KCORE_ROUNDS + 1):
        sql += f""",
d{t} AS (
  SELECT e.u AS node, COUNT(*) AS deg
  FROM edges e JOIN n{t-1} a ON a.node = e.u JOIN n{t-1} b ON b.node = e.v
  GROUP BY 1
),
n{t} AS MATERIALIZED (SELECT node FROM d{t} WHERE deg >= {_KCORE_K}),
p{t} AS (SELECT {t} AS peel_round, COUNT(*) AS n_peeled
         FROM n{t-1} WHERE node NOT IN (SELECT node FROM n{t}))"""
    sql += (
        "\nSELECT CAST(peel_round AS INTEGER) AS peel_round,"
        " CAST(n_peeled AS BIGINT) AS n_peeled FROM (\n"
        + "\nUNION ALL\n".join(f"SELECT * FROM p{t}" for t in range(1, _KCORE_ROUNDS + 1))
        + "\n) WHERE n_peeled > 0"
    )
    return sql


@register(
    "kcore_peel_profile",
    survey_ref="§2.7,§2.10,M5:dedup",
    oracle=_kcore_oracle(),
)
def q_kcore_peel_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition peel profile (k = {k}) of the undirected
    residue graph: repeatedly drop nodes of degree < k and record how
    many fall in each round — the degeneracy cascade that community
    detection, spam-farm pruning and graph-sparsification pipelines
    read (this graph collapses COMPLETELY in 9 rounds: its 4-regular
    shell hides no 4-core, and the profile shows the avalanche).
    Spark form: per peel round one degree count (edges ⋈ survivor set
    on BOTH endpoints, keyed) and one anti-join to find the dropped
    nodes, lineage cut per round, loop exits at the fixpoint —
    exactly the level-synchronous shape of the BFS/Bellman family but
    with a SHRINKING vertex state. The DuckDB oracle unrolls
    {rounds} rounds as materialized CTEs ({rounds} > the 9-round
    fixpoint, margin asserted by the property test)."""
    edges_dir = _residue_edges(spark, sf_dir).select("u", "v")
    edges = (
        edges_dir.union(edges_dir.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .repartition("u")
        .localCheckpoint(eager=True)
    )
    with _loop_shuffle(spark, 4):
        nodes = edges.select(F.col("u").alias("node")).distinct().localCheckpoint(eager=True)
        peeled = None
        # per-round survivor set in ONE spark.sql statement (DataFrame
        # kwargs) — the Column form's ~6 Py4J-built ops per round cost
        # ~0.7 s of driver build across the cascade (r11 audit);
        # identical degree/threshold algebra
        keep_sql = f"""
SELECT u AS node FROM (
  SELECT e.u, COUNT(1) AS deg
  FROM {{e}} e
  JOIN {{n}} nu ON e.u = nu.node
  JOIN {{n}} nv ON e.v = nv.node
  GROUP BY e.u
) d WHERE deg >= {_KCORE_K}"""
        for rnd in range(1, _KCORE_ROUNDS + 1):
            keep = spark.sql(keep_sql, e=edges, n=nodes).localCheckpoint(eager=True)
            removed = nodes.join(keep, "node", "left_anti").select(
                "node", F.lit(rnd).cast("int").alias("peel_round")
            )
            # removed's lineage is two checkpointed frames deep — no
            # extra checkpoint needed; one count doubles as the
            # convergence probe
            if removed.count() == 0:
                break
            peeled = removed if peeled is None else peeled.union(removed)
            nodes = keep
    return peeled.groupBy("peel_round").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_peeled")
    )


q_kcore_peel_profile.__doc__ = q_kcore_peel_profile.__doc__.format(
    k=_KCORE_K, rounds=_KCORE_ROUNDS
)


@register(
    "seasonal_trend_decomposition",
    survey_ref="§2.6,§2.8",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS INTEGER) AS dow,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents_day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  GROUP BY 1, 2, 3
)
SELECT event_type, day, dow, cents_day, n,
       CAST(SUM(cents_day) OVER w7 AS BIGINT) AS trend7_cents,
       CAST(COUNT(*) OVER w7 AS BIGINT) AS n_window,
       CAST(COUNT(*) OVER w7 * cents_day - SUM(cents_day) OVER w7 AS BIGINT)
         AS detrended_scaled,
       CAST(SUM(cents_day) OVER wd AS BIGINT) AS dow_sum_cents,
       CAST(COUNT(*) OVER wd AS BIGINT) AS dow_n_days
FROM daily
WINDOW
  w7 AS (PARTITION BY event_type ORDER BY day
         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING),
  wd AS (PARTITION BY event_type, dow)
""",
)
def q_seasonal_trend_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-trend decomposition of the daily revenue series, kept
    EXACT: per (event_type, day) the centered 7-day trend window (sum
    + member count, so edge days stay honest instead of a padded
    moving average), the scaled detrended residual n_window·x −
    trend_sum (an integer — multiplying through by the window size
    avoids the division that would break hash-exactness), and the
    day-of-week seasonal component as (sum, count) sufficient
    statistics per weekday.  Day-of-week is computed arithmetically
    (epoch-days mod 7) because the engines disagree on ``dayofweek``
    numbering.

    Shape: one daily pre-aggregation (bounded groups), then two
    windows on the SAME per-type partitioning — the ordered 7-row
    frame and the dow partition reuse one shuffle's layout; nothing
    rescans events."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        (F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")) % 7)
        .cast("int")
        .alias("dow"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint")).alias("cents_day"),
        F.count(F.lit(1)).alias("n"),
    )
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    wd = Window.partitionBy("event_type", "dow")
    return daily.select(
        "event_type",
        "day",
        "dow",
        "cents_day",
        "n",
        F.sum("cents_day").over(w7).alias("trend7_cents"),
        F.count(F.lit(1)).over(w7).alias("n_window"),
        (
            F.count(F.lit(1)).over(w7) * F.col("cents_day")
            - F.sum("cents_day").over(w7)
        ).alias("detrended_scaled"),
        F.sum("cents_day").over(wd).alias("dow_sum_cents"),
        F.count(F.lit(1)).over(wd).alias("dow_n_days"),
    )


# ------------------------------------------ round-6: sketch/funnel/cohort

_HLL_HASH = "((user_id % 2147483648) * 2654435761 + 999331) % 4294967296"


@register(
    "hll_distinct_estimate",
    survey_ref="A3,§2.6",
    oracle=f"""
WITH h AS (
  SELECT CASE WHEN {_HLL_HASH} = 0 THEN 1 ELSE {_HLL_HASH} END AS h FROM events
), reg AS (
  SELECT h % 64 AS bucket,
         MAX(CASE WHEN h // 64 = 0 THEN 27
                  ELSE 27 - LENGTH(bin(CAST(h // 64 AS INTEGER))) END) AS reg
  FROM h GROUP BY h % 64
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(CAST(1 AS BIGINT) << (40 - reg)) AS BIGINT) AS present_sum
  FROM reg
), t AS (
  SELECT CAST(64 AS INTEGER) AS m,
         CAST(64 - k AS BIGINT) AS v_zero_registers,
         present_sum + (64 - k) * (CAST(1 AS BIGINT) << 40) AS harmonic_sum_scaled
  FROM s
)
SELECT t.m, t.v_zero_registers, t.harmonic_sum_scaled,
       ROUND(CAST(0.709364 AS DOUBLE) * 4096.0 * 1099511627776.0
             / CAST(t.harmonic_sum_scaled AS DOUBLE), 4) AS hll_estimate,
       (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events) AS n_true_distinct
FROM t
""",
)
def q_hll_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog built FROM SCRATCH as DataFrame algebra — the
    mergeable distinct-count sketch every 100 TB engine keeps instead
    of COUNT(DISTINCT): a deterministic 32-bit multiplicative hash,
    64 buckets, per-bucket max leading-zero rank via ``bin()`` string
    length (exact integer, no log), and the harmonic-mean estimate
    with the 2⁻ʳᵉᵍ terms scaled to EXACT integers (1 << (40−reg)), so
    the only float op is one literal-α multiply/divide — bit-identical
    across engines, hence hash-gated.  The register table is the
    mergeable state: max() over buckets is associative, so shards
    union + re-max — the sketch survives any partitioning.  True
    distinct shipped alongside to expose the estimator's bias."""
    ev = load_table(spark, sf_dir, "events")
    hraw = ((F.col("user_id") % 2147483648) * 2654435761 + 999331) % 4294967296
    h = F.when(hraw == 0, 1).otherwise(hraw)
    w = (h / 64).cast("long")
    rho = F.when(w == 0, 27).otherwise(27 - F.length(F.bin(w)))
    reg = (
        ev.select((h % 64).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
    )
    s = reg.agg(
        F.count("*").alias("k"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 40 - reg)")).alias("present_sum"),
    )
    nd = ev.agg(F.countDistinct("user_id").alias("n_true_distinct"))
    return (
        s.crossJoin(F.broadcast(nd))
        .select(
            F.lit(64).alias("m"),
            (64 - F.col("k")).cast("long").alias("v_zero_registers"),
            (
                F.col("present_sum")
                + (64 - F.col("k")) * F.expr("shiftleft(CAST(1 AS BIGINT), 40)")
            ).alias("harmonic_sum_scaled"),
            F.round(
                0.709364 * 4096 * 1099511627776.0 / (
                    F.col("present_sum")
                    + (64 - F.col("k")) * F.expr("shiftleft(CAST(1 AS BIGINT), 40)")
                ),
                4,
            ).alias("hll_estimate"),
            "n_true_distinct",
        )
    )


@register(
    "funnel_conversion_3step",
    survey_ref="A3,A4,§2.7,§2.8",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
)
SELECT step, n_users FROM (
  SELECT 1 AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
  UNION ALL SELECT 2, CAST(COUNT(*) AS BIGINT) FROM c
  UNION ALL SELECT 3, CAST(COUNT(*) AS BIGINT) FROM p
) ORDER BY step
""",
)
def q_funnel_conversion_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED-SEQUENCE funnel (view → click → purchase): step N
    counts users whose first step-N event strictly FOLLOWS their first
    step-(N−1) event — the temporal ordering is the whole point of a
    funnel (a plain per-type distinct count would credit out-of-order
    journeys).  Shape: three user-keyed partial aggregates chained by
    user-keyed joins — every exchange is on user_id, so at 100 TB the
    three stages co-partition and AQE coalesces; nothing global, no
    window over the full fact."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = [
        v.agg(F.count("*").alias("n_users")).select(F.lit(1).alias("step"), "n_users"),
        c.agg(F.count("*").alias("n_users")).select(F.lit(2).alias("step"), "n_users"),
        p.agg(F.count("*").alias("n_users")).select(F.lit(3).alias("step"), "n_users"),
    ]
    out = counts[0].unionAll(counts[1]).unionAll(counts[2])
    return out.orderBy("step")


@register(
    "retention_cohort_matrix",
    survey_ref="A3,A4,§2.7",
    oracle="""
WITH first_day AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id, f.cohort_date,
         datediff('day', f.cohort_date, CAST(e.ts AS DATE)) AS day_offset
  FROM events e JOIN first_day f ON e.user_id = f.user_id
)
SELECT cohort_date, CAST(day_offset AS INTEGER) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM activity
WHERE day_offset IN (0, 1, 7)
GROUP BY cohort_date, day_offset
ORDER BY cohort_date, day_offset
""",
)
def q_retention_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETENTION COHORTS (D0/D1/D7): users grouped by their first
    active date; each later active day contributes at most once per
    (user, offset) — the product-analytics matrix behind every
    retention dashboard.  Shape: one user-keyed aggregate for cohort
    assignment, one user-keyed join back, a distinct at (user, offset)
    grain, then a small-key aggregate — all exchanges keyed, the
    result is cohorts × 3 rows regardless of fact size."""
    ev = load_table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_date")
    )
    activity = (
        ev.join(first_day, "user_id")
        .select(
            "user_id",
            "cohort_date",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_date")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset").isin(0, 1, 7))
        .groupBy("cohort_date", F.col("day_offset").cast("int").alias("day_offset"))
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_date", "day_offset")
    )


@register(
    "scd2_dimension_build",
    survey_ref="T4,§2.8,§2.9",
    oracle="""
SELECT user_id, event_id,
       CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
       ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       CAST(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
            AS BOOLEAN) AS is_current
FROM events
WHERE user_id % 50 = 3
ORDER BY user_id, valid_from, event_id
""",
)
def q_scd2_dimension_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLOWLY-CHANGING-DIMENSION type 2 build: a change log becomes
    validity intervals — each record's ``valid_to`` is the next change
    for the same key (LEAD over a key-partitioned window, deterministic
    (ts, event_id) tie-break), open interval = current row.  The
    standard dimension-table build every warehouse runs on CDC input;
    the window is keyed by user so partitions stay bounded at any
    fact size (contrast the banned unpartitioned-window shape)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 3)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    ).orderBy("user_id", "valid_from", "event_id")


@register(
    "ab_test_welch",
    survey_ref="A4,§2.6",
    oracle="""
WITH g AS (
  SELECT user_id % 2 AS variant,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                  * CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS ssq
  FROM events GROUP BY user_id % 2
), a AS (SELECT * FROM g WHERE variant = 0), b AS (SELECT * FROM g WHERE variant = 1)
SELECT a.n AS n_a, b.n AS n_b,
       ROUND(CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n, 6) AS mean_diff_cents,
       ROUND((CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n)
             / SQRT(((CAST(a.ssq AS DOUBLE) - CAST(a.s AS DOUBLE) * a.s / a.n) / (a.n - 1)) / a.n
                  + ((CAST(b.ssq AS DOUBLE) - CAST(b.s AS DOUBLE) * b.s / b.n) / (b.n - 1)) / b.n),
             6) AS t_stat
FROM a, b
""",
)
def q_ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test readout via Welch's t statistic from SUFFICIENT
    STATISTICS: one partial-aggregated pass collects per-variant
    (n, Σx, Σx²) as exact integers (cents), the statistic is pure
    IEEE-correctly-rounded arithmetic (±, ×, ÷, √) on those exact
    sums — so even a significance test is exact-hash gated.  This is
    the map-side-combinable decomposition that analyzes an experiment
    over 100 TB of events in one shuffle of 2×3 numbers."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    g = (
        ev.select((F.col("user_id") % 2).alias("variant"), cents.alias("c"))
        .groupBy("variant")
        .agg(
            F.count("*").alias("n"),
            F.sum("c").alias("s"),
            F.sum(F.col("c") * F.col("c")).alias("ssq"),
        )
    )
    a = g.filter(F.col("variant") == 0).select(
        F.col("n").alias("n_a"), F.col("s").alias("s_a"), F.col("ssq").alias("ssq_a")
    )
    b = g.filter(F.col("variant") == 1).select(
        F.col("n").alias("n_b"), F.col("s").alias("s_b"), F.col("ssq").alias("ssq_b")
    )
    j = a.crossJoin(b)
    mean_diff = F.col("s_a").cast("double") / F.col("n_a") - F.col("s_b").cast(
        "double"
    ) / F.col("n_b")
    var_a = (
        F.col("ssq_a").cast("double")
        - F.col("s_a").cast("double") * F.col("s_a") / F.col("n_a")
    ) / (F.col("n_a") - 1)
    var_b = (
        F.col("ssq_b").cast("double")
        - F.col("s_b").cast("double") * F.col("s_b") / F.col("n_b")
    ) / (F.col("n_b") - 1)
    t = mean_diff / F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b"))
    return j.select(
        "n_a",
        "n_b",
        F.round(mean_diff, 6).alias("mean_diff_cents"),
        F.round(t, 6).alias("t_stat"),
    )


@register(
    "chi_square_independence",
    survey_ref="A4,A7,§2.6",
    oracle="""
WITH o AS (
  SELECT event_type, user_id % 4 AS ub, CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY event_type, user_id % 4
), rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM o GROUP BY event_type),
ct AS (SELECT ub, CAST(SUM(o) AS BIGINT) AS c FROM o GROUP BY ub),
n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM o),
cells AS (
  SELECT CAST(o.o AS HUGEINT) * n.n - CAST(rt.r AS HUGEINT) * ct.c AS d,
         CAST(n.n AS HUGEINT) * rt.r * ct.c AS den
  FROM o JOIN rt USING (event_type) JOIN ct USING (ub), n
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM((d * d * 1000000) // den) AS BIGINT) AS chi2_micro6,
       CAST((SELECT COUNT(*) FROM rt) - 1 AS BIGINT)
         * CAST((SELECT COUNT(*) FROM ct) - 1 AS BIGINT) AS dof
FROM cells
""",
)
def q_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² INDEPENDENCE TEST (event_type ⟂ user cohort?) from the exact
    contingency table, reported as an EXACT fixed-point integer.  With
    e = r·c/n the cell contribution (o−e)²/e equals (o·n − r·c)²/(n·r·c)
    exactly, so each cell yields the integer
    ``floor((o·n − r·c)² · 10⁶ / (n·r·c))`` and the statistic is their
    integer SUM — order-independent, unlike a float SUM whose
    partition-dependent addition order could flake the exact-hash gate
    (r6 ADVICE).  chi2 ≈ chi2_micro6 / 10⁶ (under-counts by < n_cells
    micro-units from the per-cell floor — a defined, deterministic
    statistic).  Intermediates ride DECIMAL(38,0) on Spark / HUGEINT on
    DuckDB: (o·n − r·c)² · 10⁶ stays under 10³⁸ through ~100× the test
    fixtures; beyond that, widen the 10⁶ scale down or split cells.
    At 100 TB the fact shuffles once on the (type, cohort) key and
    everything after is margin algebra on a handful of rows."""
    ev = load_table(spark, sf_dir, "events")
    o = ev.groupBy("event_type", (F.col("user_id") % 4).alias("ub")).agg(
        F.count("*").alias("o")
    )
    rt = o.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = o.groupBy("ub").agg(F.sum("o").alias("c"))
    n = o.agg(F.sum("o").alias("n"))
    cells = (
        o.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "ub")
        .crossJoin(F.broadcast(n))
        .select(
            F.expr(
                "CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c"
            ).alias("d"),
            F.expr("CAST(n AS DECIMAL(38,0)) * r * c").alias("den"),
        )
    )
    n_rt = rt.agg(F.count("*").alias("nr"))
    n_ct = ct.agg(F.count("*").alias("nc"))
    stat = cells.agg(
        F.count("*").alias("n_cells"),
        F.sum(F.expr("(d * d * 1000000) div den")).cast("long").alias("chi2_micro6"),
    )
    return (
        stat.crossJoin(F.broadcast(n_rt))
        .crossJoin(F.broadcast(n_ct))
        .select(
            "n_cells",
            "chi2_micro6",
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
        )
    )


@register(
    "inter_event_gap_stats",
    survey_ref="A4,§2.8",
    oracle="""
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT event_type,
       CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
       CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
       CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
FROM g WHERE gap_us IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
)
def q_inter_event_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTER-EVENT GAP telemetry: per user, the time since that user's
    previous event (LAG over a user-keyed window, deterministic
    (ts, event_id) tie-break), aggregated by the type of the LATER
    event — the dwell-time distribution behind engagement and
    anomaly-rate dashboards.  Gaps are exact integer microseconds, the
    window is keyed (bounded per user at any fact size), and the
    result is one small-key aggregate — the plan a 100 TB event store
    wants."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    g = ev.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return (
        g.groupBy("event_type")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.sum("gap_us").alias("sum_gap_us"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .orderBy("event_type")
    )


@register(
    "join_size_from_degrees",
    survey_ref="A3,A4,§2.6,§2.7",
    oracle="""
WITH do_ AS (SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c FROM orders GROUP BY o_orderkey),
dl AS (SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c FROM lineitem GROUP BY l_orderkey)
SELECT CAST(SUM(do_.c * dl.c) AS BIGINT) AS join_rows_from_degrees,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey) AS join_rows_actual,
       CAST(COUNT(*) AS BIGINT) AS n_matching_keys
FROM do_ JOIN dl ON do_.k = dl.k
""",
)
def q_join_size_from_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-SIZE computation from per-key DEGREE HISTOGRAMS —
    |A ⋈ₖ B| = Σₖ degA(k)·degB(k), the statistic a cost-based planner
    wants before committing to a join order, computed WITHOUT running
    the join on the wide rows: two key-grain count aggregates and a
    key-grain join of the (much smaller) degree relations.  The query
    also runs the actual join and ships both numbers, so the identity
    is exact-hash checked — and the degree pass is exactly how you
    detect the skewed key (max degree product) that would hot-spot the
    real join at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    do = o.groupBy(F.col("o_orderkey").alias("k")).agg(F.count(F.lit(1)).alias("co"))
    dl = li.groupBy(F.col("l_orderkey").alias("k")).agg(F.count(F.lit(1)).alias("cl"))
    est = do.join(dl, "k").agg(
        F.sum(F.col("co") * F.col("cl")).alias("join_rows_from_degrees"),
        F.count(F.lit(1)).alias("n_matching_keys"),
    )
    actual = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .agg(F.count(F.lit(1)).alias("join_rows_actual"))
    )
    return est.crossJoin(F.broadcast(actual)).select(
        "join_rows_from_degrees", "join_rows_actual", "n_matching_keys"
    )


@register(
    "cohort_overlap_matrix",
    survey_ref="A3,§2.7,§2.10",
    oracle="""
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_users
FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.event_type <= b.event_type
GROUP BY a.event_type, b.event_type
ORDER BY type_a, type_b
""",
)
def q_cohort_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIENCE OVERLAP matrix: for every pair of event types, how
    many distinct users did both — the co-occurrence table behind
    segment Venn diagrams and bitmap-index intersection estimates.
    One distinct pass to (type, user) grain, then a user-keyed
    self-join whose per-user fan-out is bounded by |types|² — the
    bitmap-free way to intersect cohorts when the bitmaps would not
    fit one machine."""
    ev = load_table(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    return (
        a.join(b, "user_id")
        .filter(F.col("type_a") <= F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_shared_users"))
        .orderBy("type_a", "type_b")
    )


def _rdv_hash_sql(shard: int) -> str:
    """Rendezvous weight of (user, shard): a distinct Knuth-style
    integer mix per shard — pure modular arithmetic, identical in both
    engines."""
    return f"((user_id % 2147483648) * 2654435761 + {shard} * 40503 + 997) % 4294967296"


def _rdv_argmax_sql(n: int) -> str:
    """Shard with the maximal weight among 0..n-1 (first-wins on the
    impossible tie): a GREATEST over the per-shard weights, then a
    CASE matching the winner in ascending shard order."""
    weights = [_rdv_hash_sql(s) for s in range(n)]
    greatest = "GREATEST(" + ", ".join(weights) + ")"
    cases = " ".join(
        f"WHEN ({weights[s]}) = {greatest} THEN {s}" for s in range(n)
    )
    return f"CASE {cases} END"


@register(
    "rendezvous_shard_rebalance",
    survey_ref="P5,A3,§2.6",
    oracle=f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
assign AS (
  SELECT user_id,
         CAST({_rdv_argmax_sql(8)} AS INTEGER) AS shard8,
         CAST({_rdv_argmax_sql(9)} AS INTEGER) AS shard9
  FROM u
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
       CAST(MAX(shard9) AS INTEGER) AS max_shard9
FROM assign
""",
)
def q_rendezvous_shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RENDEZVOUS (highest-random-weight) sharding and its rebalance
    guarantee, measured: each key goes to the shard with the maximal
    deterministic (key, shard) weight; growing 8 → 9 shards moves ONLY
    the keys whose new shard-8 weight wins — ~1/9 of them — versus
    mod-N hashing which moves ~8/9.  The argmax is a GREATEST/CASE
    over per-shard modular mixes (whole-stage codegen, no UDF); the
    query reports the measured migration fraction a partition-
    rebalance planner needs before resizing a 100 TB keyed store."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id").distinct()

    def weight(s: int):
        return ((F.col("user_id") % 2147483648) * 2654435761 + s * 40503 + 997) % 4294967296

    def argmax(n: int):
        # ascending-order first-wins, mirroring the oracle's CASE order
        best = F.greatest(*[weight(s) for s in range(n)])
        out = None
        for s in range(n):
            out = F.when(weight(s) == best, s) if out is None else out.when(weight(s) == best, s)
        return out.cast("int")

    a = u.select(
        "user_id", argmax(8).alias("shard8"), argmax(9).alias("shard9")
    )
    return a.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum((F.col("shard8") != F.col("shard9")).cast("long")).alias("n_moved"),
        F.max("shard9").alias("max_shard9"),
    )


_LRM_BUDGET = 10000


@register(
    "largest_remainder_allocation",
    survey_ref="A9,§2.6,§2.8",
    oracle=f"""
WITH c AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY event_type
),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
q AS (
  SELECT event_type, n,
         CAST({_LRM_BUDGET} * n // t.total AS BIGINT) AS floor_alloc,
         CAST(({_LRM_BUDGET} * n) % t.total AS BIGINT) AS remainder
  FROM c, t
),
s AS (SELECT CAST({_LRM_BUDGET} - SUM(floor_alloc) AS BIGINT) AS leftover FROM q),
r AS (
  SELECT q.*, ROW_NUMBER() OVER (ORDER BY remainder DESC, event_type) AS rk FROM q
)
SELECT r.event_type, r.n, r.floor_alloc,
       CAST(r.floor_alloc + CASE WHEN r.rk <= s.leftover THEN 1 ELSE 0 END AS BIGINT)
         AS allocation
FROM r, s ORDER BY r.event_type
""",
)
def q_largest_remainder_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT APPORTIONMENT by the largest-remainder (Hamilton) method:
    allocate a fixed budget across categories proportionally so the
    parts sum EXACTLY to the whole — floors first, then the leftover
    units go to the largest fractional remainders (deterministic
    category tie-break).  All integer arithmetic (the remainder IS the
    fractional part times the total, kept unscaled), one category
    aggregate plus windows over the category relation — the budget/
    quota arithmetic every sampling planner and cost allocator needs
    to avoid off-by-rounding drift."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    q = c.crossJoin(F.broadcast(t)).select(
        "event_type",
        "n",
        F.floor(F.lit(_LRM_BUDGET) * F.col("n") / F.col("total"))
        .cast("long")
        .alias("floor_alloc"),
        ((F.lit(_LRM_BUDGET) * F.col("n")) % F.col("total")).alias("remainder"),
    )
    s = q.agg((F.lit(_LRM_BUDGET) - F.sum("floor_alloc")).alias("leftover"))
    wr = Window.orderBy(F.col("remainder").desc(), "event_type")
    r = q.select("*", F.row_number().over(wr).alias("rk"))
    return (
        r.crossJoin(F.broadcast(s))
        .select(
            "event_type",
            "n",
            "floor_alloc",
            (
                F.col("floor_alloc")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("long")
            .alias("allocation"),
        )
        .orderBy("event_type")
    )


@register(
    "allen_interval_relations",
    survey_ref="§2.7,§2.8,A3",
    oracle="""
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) AS s,
         epoch_us(ts) + CAST(ROUND(value * 1000000) AS BIGINT) AS e,
         event_id
  FROM events
),
pairs AS (
  SELECT user_id,
         LAG(s) OVER w AS ps, LAG(e) OVER w AS pe,
         s, e
  FROM iv
  WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)
),
classified AS (
  SELECT CASE
           WHEN ps = s AND pe = e THEN 'equals'
           WHEN ps = s AND pe < e THEN 'starts'
           WHEN ps = s AND pe > e THEN 'started_by'
           WHEN pe < s THEN 'before'
           WHEN pe = s THEN 'meets'
           WHEN pe < e THEN 'overlaps'
           WHEN pe = e THEN 'finished_by'
           ELSE 'contains'
         END AS relation
  FROM pairs WHERE ps IS NOT NULL
)
SELECT relation, CAST(COUNT(*) AS BIGINT) AS n
FROM classified
GROUP BY relation
ORDER BY relation
""",
)
def q_allen_interval_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen's interval algebra (Allen 1983) over per-user event
    intervals [ts, ts + value): classify each consecutive interval
    pair (ordered by start, so 8 of the 13 relations are reachable)
    and histogram the relations — the temporal-data profiling step
    that decides whether downstream logic needs overlap handling
    (``interval_overlap_join``) or can assume disjointness.

    Scale shape: one user-keyed window (lag — partitioned by the
    natural key, no global sort) and one 8-key aggregate. Interval
    endpoints are exact BIGINT micros (value rounded to fixed-point
    micro-units), so every relation predicate is integer equality /
    order — no float-boundary flakiness."""
    e = load_table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.round(F.col("value") * 1000000).cast("long")).alias("e"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    pairs = iv.select(
        F.lag("s").over(w).alias("ps"),
        F.lag("e").over(w).alias("pe"),
        "s",
        "e",
    ).filter(F.col("ps").isNotNull())
    relation = (
        F.when((F.col("ps") == F.col("s")) & (F.col("pe") == F.col("e")), "equals")
        .when((F.col("ps") == F.col("s")) & (F.col("pe") < F.col("e")), "starts")
        .when((F.col("ps") == F.col("s")) & (F.col("pe") > F.col("e")), "started_by")
        .when(F.col("pe") < F.col("s"), "before")
        .when(F.col("pe") == F.col("s"), "meets")
        .when(F.col("pe") < F.col("e"), "overlaps")
        .when(F.col("pe") == F.col("e"), "finished_by")
        .otherwise("contains")
    )
    return (
        pairs.select(relation.alias("relation"))
        .groupBy("relation")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("relation")
    )


@register(
    "kaplan_meier_conversion",
    survey_ref="A6,§2.6,§2.8",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         MIN(epoch_us(ts)) AS t0,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tconv,
         MAX(epoch_us(ts)) AS tlast
  FROM events GROUP BY user_id
),
durations AS (
  SELECT (COALESCE(tconv, tlast) - t0) // 60000000 AS t_min,
         CASE WHEN tconv IS NULL THEN 1 ELSE 0 END AS censored
  FROM per_user
),
at_time AS (
  SELECT t_min,
         CAST(SUM(1 - censored) AS BIGINT) AS d,
         CAST(SUM(censored) AS BIGINT) AS c
  FROM durations GROUP BY t_min
),
risk AS (
  SELECT t_min, d, c,
         (SELECT COUNT(*) FROM durations)
           - COALESCE(SUM(d + c) OVER (ORDER BY t_min
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
  FROM at_time
),
km AS (
  SELECT t_min, d, c, n_risk,
         SUM(CASE WHEN d > 0
                  THEN CAST(ROUND(LN(1.0 - d * 1.0 / n_risk) * 1000000000) AS BIGINT)
                  ELSE 0 END)
           OVER (ORDER BY t_min) AS ilog_s
  FROM risk
  WHERE n_risk > d OR d = 0
)
SELECT t_min, d AS n_converted, c AS n_censored,
       CAST(n_risk AS BIGINT) AS n_risk,
       ROUND(EXP(ilog_s / 1000000000.0), 4) AS km_survival
FROM km
ORDER BY t_min
""",
)
def q_kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator over time-to-conversion: per
    user, duration in whole minutes from first event to first
    'purchase' (right-censored at the last observed event when no
    purchase happens), then the product-limit curve S(t) = prod(1 -
    d_i/n_i) over the ordered event times — the censoring-aware
    complement of the flagship ``survival_curve`` CDF (which has no
    censoring notion).

    Scale shape: one user-keyed aggregate collapses the fact table to
    one row per user; everything after runs at distinct-duration
    scale (bounded by the observation window in minutes), where the
    two cumulative windows are fine. The running product is computed
    as a cumulative BIGINT sum of fixed-point nano-logs (one LN per
    distinct time), so partial-order float accumulation never occurs;
    EXP is applied once per output row."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    per_user = e.groupBy("user_id").agg(
        F.min(us).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("tconv"),
        F.max(us).alias("tlast"),
    )
    durations = per_user.select(
        F.expr("(COALESCE(tconv, tlast) - t0) DIV 60000000").alias("t_min"),
        F.when(F.col("tconv").isNull(), 1).otherwise(0).alias("censored"),
    )
    at_time = durations.groupBy("t_min").agg(
        F.sum(1 - F.col("censored")).alias("d"),
        F.sum("censored").alias("c"),
    )
    total = durations.agg(F.count(F.lit(1)).alias("n_total"))
    w_prev = Window.orderBy("t_min").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        at_time.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("n_total")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)),
        )
        .filter((F.col("n_risk") > F.col("d")) | (F.col("d") == 0))
    )
    w_cum = Window.orderBy("t_min").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ilog = F.when(
        F.col("d") > 0,
        F.round(F.log(1.0 - F.col("d") * 1.0 / F.col("n_risk")) * 1000000000).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    km = risk.withColumn("ilog_s", F.sum(ilog).over(w_cum))
    return km.select(
        "t_min",
        F.col("d").cast("long").alias("n_converted"),
        F.col("c").cast("long").alias("n_censored"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.round(F.exp(F.col("ilog_s") / 1000000000.0), 4).alias("km_survival"),
    ).orderBy("t_min")


@register(
    "gini_activity_inequality",
    survey_ref="§2.6,§2.8,A9",
    oracle="""
WITH per_user AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS w FROM events GROUP BY user_id
),
by_wealth AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w FROM per_user GROUP BY w
),
ranked AS (
  SELECT w, n_w,
         COALESCE(SUM(n_w) OVER (ORDER BY w
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS a
  FROM by_wealth
),
terms AS (
  SELECT SUM(n_w) AS n,
         SUM(w * n_w) AS total,
         SUM(w * (n_w * a + n_w * (n_w + 1) // 2)) AS rank_sum
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_users,
       CAST(total AS BIGINT) AS total_events,
       ROUND(2.0 * rank_sum / (n * total) - (n + 1.0) / n, 6) AS gini
FROM terms
""",
)
def q_gini_activity_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user activity (event counts) — the
    inequality/skew diagnostic a platform runs to know whether 1% of
    users generate 90% of events (which is also exactly the key-skew
    statistic that predicts shuffle stragglers on user-keyed joins;
    cf. ``join_size_from_degrees``).

    Scale shape: the fact table collapses to one row per user, then to
    one row per DISTINCT wealth level — the rank-weighted sum
    Σ i·x_i is evaluated in closed form per tie-group (x·(n_w·a +
    n_w(n_w+1)/2), a = users below), so no global sort of users ever
    happens: the only window is a prefix-sum over the tiny distinct-
    wealth relation. Every term is exact BIGINT; the two divisions
    happen once, in the final 1-row projection."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("w"))
    by_wealth = per_user.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    wb = Window.orderBy("w").rowsBetween(Window.unboundedPreceding, -1)
    ranked = by_wealth.withColumn(
        "a", F.coalesce(F.sum("n_w").over(wb), F.lit(0))
    )
    terms = ranked.agg(
        F.sum("n_w").alias("n"),
        F.sum(F.col("w") * F.col("n_w")).alias("total"),
        F.sum(
            F.col("w")
            * (F.col("n_w") * F.col("a") + F.expr("n_w * (n_w + 1) DIV 2"))
        ).alias("rank_sum"),
    )
    return terms.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("total").cast("long").alias("total_events"),
        F.round(
            2.0 * F.col("rank_sum") / (F.col("n") * F.col("total"))
            - (F.col("n") + 1.0) / F.col("n"),
            6,
        ).alias("gini"),
    )


@register(
    "theil_sen_trend",
    survey_ref="§2.6,§2.7,§2.9",
    oracle="""
WITH hourly AS (
  SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) // 3600000000 AS h,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
slopes AS (
  SELECT CAST(FLOOR((b.n - a.n) * 1000000000.0 / (b.h - a.h) + 0.5) AS BIGINT) AS islope
  FROM hourly a JOIN hourly b ON b.h > a.h
),
ranked AS (
  SELECT islope, ROW_NUMBER() OVER (ORDER BY islope) AS rn, COUNT(*) OVER () AS m
  FROM slopes
)
SELECT CAST(MAX(m) AS BIGINT) AS n_pairs,
       ROUND(SUM(CASE WHEN rn = (m + 1) // 2 THEN islope ELSE 0 END)
             / 1000000000.0, 6) AS median_slope_per_hour
FROM ranked
""",
)
def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator over the hourly event-count
    series: the median of all pairwise slopes — the outlier-immune
    answer to 'is traffic growing' (a single incident hour that would
    wreck an OLS fit moves Theil-Sen by at most one rank).

    Scale shape: the fact collapses to the TIME-BOUNDED hourly series
    first (720 rows for a 30-day window — fixed by the window, not by
    SF), so the pairwise-slope self-join is bounded at ~260k rows
    regardless of data volume; slopes are integer-encoded nano-units
    (one division each, deterministic), and the median comes from a
    rank over the bounded slope relation. The all-pairs step is safe
    precisely BECAUSE it runs on the aggregated series — the same
    query shape on raw events would be the banned quadratic."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select(
            F.expr("unix_micros(date_trunc('hour', ts)) DIV 3600000000").alias("h")
        )
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = hourly.alias("a")
    b = hourly.alias("b")
    slopes = a.join(b, F.col("b.h") > F.col("a.h")).select(
        F.floor(
            (F.col("b.n") - F.col("a.n")) * 1000000000.0 / (F.col("b.h") - F.col("a.h"))
            + 0.5
        )
        .cast("long")
        .alias("islope")
    )
    w = Window.orderBy("islope")
    ranked = slopes.select(
        "islope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("m"),
    )
    return ranked.agg(
        F.max("m").cast("long").alias("n_pairs"),
        F.round(
            F.sum(F.when(F.col("rn") == F.expr("(m + 1) DIV 2"), F.col("islope")).otherwise(0))
            / 1000000000.0,
            6,
        ).alias("median_slope_per_hour"),
    )


@register(
    "cohort_ltv_curve",
    survey_ref="§2.6,§2.8",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         MIN(epoch_us(ts)) // 604800000000 AS cohort_week
  FROM events GROUP BY user_id
),
purchases AS (
  SELECT e.user_id,
         f.cohort_week,
         epoch_us(e.ts) // 604800000000 - f.cohort_week AS age_weeks,
         CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT) AS cents
  FROM events e JOIN firsts f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
),
cohort_sizes AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM firsts GROUP BY cohort_week
),
weekly AS (
  SELECT cohort_week, age_weeks, CAST(SUM(cents) AS BIGINT) AS rev
  FROM purchases GROUP BY cohort_week, age_weeks
),
cum AS (
  SELECT cohort_week, age_weeks,
         SUM(rev) OVER (PARTITION BY cohort_week ORDER BY age_weeks) AS cum_rev
  FROM weekly
)
SELECT c.cohort_week, c.age_weeks,
       CAST(c.cum_rev AS BIGINT) AS cum_rev_cents,
       s.n_users,
       ROUND(c.cum_rev * 1.0 / (s.n_users * 100), 6) AS ltv_per_user
FROM cum c JOIN cohort_sizes s USING (cohort_week)
ORDER BY c.cohort_week, c.age_weeks
""",
)
def q_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: users grouped by first-seen week,
    cumulative purchase revenue per cohort member as a function of
    cohort age in weeks — the curve a growth team reads LTV/CAC from,
    extending ``retention_cohort_matrix`` (presence) to value.

    Scale shape: first-seen is one user-keyed aggregate; revenue rolls
    up to (cohort, age) grain — bounded by weeks² — BEFORE the
    cumulative window runs (partitioned by cohort over the tiny
    grain relation, never over raw events). Cents are exact BIGINT;
    the per-user division happens once per output row."""
    e = load_table(spark, sf_dir, "events")
    wk = F.expr("unix_micros(ts) DIV 604800000000")
    firsts = e.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            "cohort_week",
            (wk - F.col("cohort_week")).alias("age_weeks"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
    )
    sizes = firsts.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_users"))
    weekly = purchases.groupBy("cohort_week", "age_weeks").agg(F.sum("cents").alias("rev"))
    wcum = (
        Window.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = weekly.withColumn("cum_rev", F.sum("rev").over(wcum))
    return (
        cum.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "age_weeks",
            F.col("cum_rev").cast("long").alias("cum_rev_cents"),
            "n_users",
            F.round(F.col("cum_rev") * 1.0 / (F.col("n_users") * 100), 6).alias("ltv_per_user"),
        )
        .orderBy("cohort_week", "age_weeks")
    )


@register(
    "autocorrelation_periodogram",
    survey_ref="§2.6,§2.7,§2.8",
    oracle="""
WITH hourly AS (
  SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) // 3600000000 AS h,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
lagged AS (
  SELECT k.k,
         CAST(COUNT(*) AS BIGINT) AS p,
         CAST(SUM(a.n * b.n) AS BIGINT) AS sxy,
         CAST(SUM(a.n) AS BIGINT) AS sx,
         CAST(SUM(b.n) AS BIGINT) AS sy,
         CAST(SUM(a.n * a.n) AS BIGINT) AS sxx,
         CAST(SUM(b.n * b.n) AS BIGINT) AS syy
  FROM (SELECT unnest([1, 2, 3, 6, 12, 24]) AS k) k
  JOIN hourly a ON TRUE
  JOIN hourly b ON b.h = a.h + k.k
  GROUP BY k.k
)
SELECT k AS lag_hours, p AS n_pairs,
       CAST(FLOOR(CAST(p * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(p * sxx - sx * sx AS DOUBLE)
                  * CAST(p * syy - sy * sy AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
         AS acf_micro
FROM lagged
ORDER BY lag_hours
""",
)
def q_autocorrelation_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation periodogram of the hourly event-count series at
    lags {1,2,3,6,12,24}h — the periodicity detector that tells a
    pipeline whether traffic has a diurnal cycle worth modeling
    (pairs with ``seasonal_hour_baseline``, which ASSUMES the 24h
    period this query verifies).

    Scale shape: the fact collapses to the time-bounded hourly series,
    then six lag self-joins on the hour key run at series scale; per
    lag, Pearson r comes from exact BIGINT sufficient statistics
    (all products < 2^63 at any SF since counts are per-hour), one
    float path per lag with explicit single conversions (the
    embedding_drift lesson), FLOOR(x·1e6+0.5) fixed-point output."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select(F.expr("unix_micros(date_trunc('hour', ts)) DIV 3600000000").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ks = spark.createDataFrame([(k,) for k in (1, 2, 3, 6, 12, 24)], "k int")
    a = hourly.alias("a")
    b = hourly.alias("b")
    lagged = (
        F.broadcast(ks)
        .crossJoin(a)
        .join(b, F.col("b.h") == F.col("a.h") + F.col("k"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("p"),
            F.sum(F.col("a.n") * F.col("b.n")).alias("sxy"),
            F.sum(F.col("a.n")).alias("sx"),
            F.sum(F.col("b.n")).alias("sy"),
            F.sum(F.col("a.n") * F.col("a.n")).alias("sxx"),
            F.sum(F.col("b.n") * F.col("b.n")).alias("syy"),
        )
    )
    num = (F.col("p") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    d1 = (F.col("p") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    d2 = (F.col("p") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return lagged.select(
        F.col("k").alias("lag_hours"),
        F.col("p").alias("n_pairs"),
        F.floor(num / F.sqrt(d1 * d2) * 1000000 + 0.5).cast("long").alias("acf_micro"),
    ).orderBy("lag_hours")


@register(
    "calibration_reliability_bins",
    survey_ref="A5,A7,§2.6",
    oracle="""
WITH scored AS (
  SELECT GREATEST(LEAST(CAST(FLOOR(value * 2500 + 0.5) AS BIGINT), 1000000), 0) AS conf_micro,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
binned AS (
  SELECT LEAST(conf_micro // 100000, 9) AS bin, conf_micro, y FROM scored
),
per_bin AS (
  SELECT bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(SUM(conf_micro) AS BIGINT) AS conf_sum,
         CAST(ABS(1000000 * SUM(y) - SUM(conf_micro)) AS BIGINT) AS gap_n
  FROM binned GROUP BY bin
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(gap_n) AS BIGINT) AS gsum FROM per_bin)
SELECT bin, n, n_pos,
       ROUND(conf_sum / (n * 1000000.0), 6) AS conf_avg,
       ROUND(n_pos * 1.0 / n, 6) AS acc,
       ROUND(gap_n / (n * 1000000.0), 6) AS gap,
       ROUND(tot.gsum / (tot.nn * 1000000.0), 6) AS ece
FROM per_bin, tot
ORDER BY bin
""",
)
def q_calibration_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + Expected Calibration Error — the eval
    every learned quality/toxicity classifier in a data pipeline needs
    before its scores gate documents: treat value/400 (clamped micro-
    encoded) as the model's confidence that an event is a 'purchase',
    bin into 10 confidence deciles, and compare per-bin mean
    confidence against empirical accuracy; ECE = Σ (n_b/N)·|acc−conf|.
    Completes ``calibration_reliability_report`` (queries/ml.py), which
    stops at the integer sufficient statistics: this query carries the
    per-bin gap and the corpus ECE through to oracle-compared ratios.

    Exactness: confidence is integer micro-encoded at the row
    (FLOOR(value·2500+0.5), one shared double expression), so per-bin
    sums and the |n_pos·1e6 − Σconf| gaps are BIGINT in any
    aggregation order; each output ratio does ONE final division.

    Scale shape: a single map-side-combinable 10-group aggregate over
    the fact plus a broadcastable 1-row total — the cheapest possible
    shape; at 100 TB this is one pass."""
    ev = load_table(spark, sf_dir, "events")
    # clamp BOTH ends: confidence is a probability, and an unclamped
    # negative conf_micro would hit the engines' integer-division sign
    # split (Spark DIV truncates toward zero, DuckDB // floors)
    scored = ev.select(
        F.greatest(
            F.least(F.floor(F.col("value") * 2500 + 0.5).cast("bigint"), F.lit(1000000)),
            F.lit(0),
        ).alias("conf_micro"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    per_bin = (
        scored.select(
            F.least(F.expr("conf_micro DIV 100000"), F.lit(9)).alias("bin"), "conf_micro", "y"
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("n_pos"),
            F.sum("conf_micro").alias("conf_sum"),
            F.abs(F.lit(1000000) * F.sum("y") - F.sum("conf_micro")).alias("gap_n"),
        )
    )
    tot = per_bin.agg(F.sum("n").alias("nn"), F.sum("gap_n").alias("gsum"))
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n",
            "n_pos",
            F.round(F.col("conf_sum") / (F.col("n") * 1000000.0), 6).alias("conf_avg"),
            F.round(F.col("n_pos") * 1.0 / F.col("n"), 6).alias("acc"),
            F.round(F.col("gap_n") / (F.col("n") * 1000000.0), 6).alias("gap"),
            F.round(F.col("gsum") / (F.col("nn") * 1000000.0), 6).alias("ece"),
        )
        .orderBy("bin")
    )
