"""Approximate-query sketches, join pruning, and layout/survivorship ops.

Scale rationale: at 100 TB the winning shapes are (a) BOUNDED-STATE
summaries that replace unbounded relations (a 4×64 count-min sketch, a
16 384-position Bloom bitmap, a per-file zone map), and (b) hash-lookup
membership instead of array scans (the Bloom probe is an equi-join
against the broadcast position set, not ``array_contains`` over a 16 k
array per row).  Everything is exact integer arithmetic — the string
hash is an unrolled 8-char polynomial over ``ascii``/``substring``
(identical in Spark and DuckDB on the all-ASCII fixture corpus) — so
every query hash-matches its oracle at any partitioning.

Reference tie-in: the reference's pipeline has no sketches — it holds
all data in driver memory (``tools.py``, ``train_classification.py``).
These are the structures that replace that assumption at cluster scale.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import register
from high_energy_gamma_ray_search_in_kascade_array_data_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# Cross-engine deterministic string hash: 8-char polynomial, base 31.
# rpad TRUNCATES to 8 chars in both engines; the pad char ' ' (ascii 32)
# keeps short tokens well-defined; + LENGTH distinguishes truncations.

_HASH_CHARS = 8
_HASH_BASE = 31


def _tok_hash_spark(tok: Column) -> Column:
    padded = F.rpad(tok, _HASH_CHARS, " ")
    h: Column = F.length(tok).cast("bigint")
    for i in range(1, _HASH_CHARS + 1):
        h = h + F.ascii(F.substring(padded, i, 1)).cast("bigint") * F.lit(
            _HASH_BASE ** (i - 1)
        )
    return h


def _tok_hash_sql(tok: str) -> str:
    terms = [f"CAST(LENGTH({tok}) AS BIGINT)"]
    for i in range(1, _HASH_CHARS + 1):
        terms.append(
            f"CAST(ascii(substring(rpad({tok}, {_HASH_CHARS}, ' '), {i}, 1)) AS BIGINT)"
            f" * {_HASH_BASE ** (i - 1)}"
        )
    return "(" + " + ".join(terms) + ")"


# ---------------------------------------------------------------------------
# Count-min sketch: depth 4, width 64, pairwise-ish row hashes.

_CMS_A = [31, 37, 41, 43]
_CMS_B = [7, 11, 13, 17]
_CMS_P = 1_000_003
_CMS_W = 64
_CMS_PROBES = 20


def _cms_bucket_spark(h: Column, r: int) -> Column:
    return (h * _CMS_A[r] + _CMS_B[r]) % _CMS_P % _CMS_W


def _cms_bucket_sql(h: str, r: int) -> str:
    return f"(({h} * {_CMS_A[r]} + {_CMS_B[r]}) % {_CMS_P}) % {_CMS_W}"


@register(
    "count_min_sketch_estimate",
    survey_ref="§2.6,M5:text",
    oracle=f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok
  FROM documents
),
toks3 AS (SELECT tok FROM toks WHERE LENGTH(tok) >= 3),
hashed AS (SELECT tok, {_tok_hash_sql('tok')} AS h FROM toks3),
cells AS (
  {" UNION ALL ".join(
    f"SELECT {r} AS r, {_cms_bucket_sql('h', r)} AS bucket, "
    f"CAST(COUNT(*) AS BIGINT) AS cnt FROM hashed GROUP BY 2"
    for r in range(4)
  )}
),
exact AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_n, MIN(h) AS h
  FROM hashed GROUP BY tok
  ORDER BY exact_n DESC, tok LIMIT {_CMS_PROBES}
),
probes AS (
  SELECT e.tok, e.exact_n, r.r AS r,
         CASE r.r
           WHEN 0 THEN {_cms_bucket_sql('e.h', 0)}
           WHEN 1 THEN {_cms_bucket_sql('e.h', 1)}
           WHEN 2 THEN {_cms_bucket_sql('e.h', 2)}
           ELSE {_cms_bucket_sql('e.h', 3)}
         END AS bucket
  FROM exact e, (SELECT unnest(range(4)) AS r) r
)
SELECT p.tok, p.exact_n, CAST(MIN(c.cnt) AS BIGINT) AS cms_est,
       CAST(MIN(c.cnt) - p.exact_n AS BIGINT) AS overcount
FROM probes p JOIN cells c ON c.r = p.r AND c.bucket = p.bucket
GROUP BY p.tok, p.exact_n
""",
)
def q_count_min_sketch_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch build + point queries, checked against exact
    counts (CMS guarantee: estimate ≥ exact, so ``overcount ≥ 0``).

    The sketch is the 100 TB shape for frequency estimation: the token
    stream collapses map-side into ≤ 4×64 = 256 cells — constant state
    per task, one bounded shuffle, mergeable across any partitioning
    (cell-wise sum), unlike the exact vocabulary aggregate whose group
    count follows the data.  Probing joins the 20 heaviest exact terms
    (TakeOrdered, no global window) against the broadcast sketch."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .filter(F.length("tok") >= 3)
        .select("tok", _tok_hash_spark(F.col("tok")).alias("h"))
    )
    cells = (
        toks.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            _cms_bucket_spark(F.col("h"), r).alias("bucket"),
                        )
                        for r in range(4)
                    ]
                )
            ).alias("c")
        )
        .groupBy("c.r", "c.bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_n"), F.min("h").alias("h"))
        .orderBy(F.desc("exact_n"), F.asc("tok"))
        .limit(_CMS_PROBES)
    )
    probes = exact.select(
        "tok",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cms_bucket_spark(F.col("h"), r).alias("bucket"),
                    )
                    for r in range(4)
                ]
            )
        ).alias("p"),
    ).select("tok", "exact_n", "p.r", "p.bucket")
    return (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("tok", "exact_n")
        .agg(
            F.min("cnt").alias("cms_est"),
            (F.min("cnt") - F.col("exact_n")).alias("overcount"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join reduction.

_BLOOM_A = [2654435761, 2246822519, 3266489917]
_BLOOM_B = [97, 193, 389]
_BLOOM_P = 1_000_000_007
_BLOOM_M = 16384
_BLOOM_SEGMENT = "BUILDING"


def _bloom_pos_sql(key: str, i: int) -> str:
    return f"(({key} * {_BLOOM_A[i]} + {_BLOOM_B[i]}) % {_BLOOM_P}) % {_BLOOM_M}"


@register(
    "bloom_semijoin_reduction",
    survey_ref="§2.7,§2.10",
    oracle=f"""
WITH dim AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = '{_BLOOM_SEGMENT}'
),
bits AS (
  SELECT DISTINCT pos FROM (
    {" UNION ALL ".join(f"SELECT {_bloom_pos_sql('c_custkey', i)} AS pos FROM dim" for i in range(3))}
  )
),
probe AS (
  SELECT o.o_orderkey, o.o_custkey,
         CAST(COUNT(b.pos) AS BIGINT) AS hits
  FROM (
    SELECT o_orderkey, o_custkey, unnest([
      {", ".join(_bloom_pos_sql('o_custkey', i) for i in range(3))}
    ]) AS pos
    FROM orders
  ) o LEFT JOIN bits b ON b.pos = o.pos
  GROUP BY 1, 2
),
counts AS (
  SELECT
    (SELECT CAST(COUNT(*) AS BIGINT) FROM dim) AS n_dim,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS bits_set,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM probe WHERE hits = 3) AS candidates,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
     WHERE o_custkey IN (SELECT c_custkey FROM dim)) AS true_matches
)
SELECT n_dim, bits_set, candidates, true_matches,
       candidates - true_matches AS false_positives
FROM counts
""",
)
def q_bloom_semijoin_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction — the classic distributed-join
    optimization: summarize the dim-side key set as k=3 hashed bit
    positions in an m=16 384-bit filter, prune the fact side by
    membership, then verify with the exact semi-join and report the
    false-positive overhead.

    Scale shape: the filter is built by explode → DISTINCT (group
    count bounded by m, map-side combinable — never a driver-side
    ``collect_set`` over the dim), and the probe is an equi-JOIN of the
    fact's exploded positions against the broadcast position set (hash
    lookup per probe) rather than ``array_contains`` over a 16 k array
    per row.  At 100 TB this ships a ≤ m-row bitmap instead of the dim
    table to every executor — semi-join reduction with bounded state."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dim = cust.filter(F.col("c_mktsegment") == _BLOOM_SEGMENT).select("c_custkey")

    def positions(key: Column) -> Column:
        return F.array(
            *[
                (key * _BLOOM_A[i] + _BLOOM_B[i]) % _BLOOM_P % _BLOOM_M
                for i in range(3)
            ]
        )

    bits = (
        dim.select(F.explode(positions(F.col("c_custkey"))).alias("pos"))
        .distinct()
    )
    probe = (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.explode(positions(F.col("o_custkey"))).alias("pos"),
        )
        .join(F.broadcast(bits), "pos")
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    candidates = probe.filter(F.col("hits") == 3).agg(
        F.count(F.lit(1)).alias("candidates")
    )
    true_matches = (
        orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("true_matches"))
    )
    n_dim = dim.agg(F.count(F.lit(1)).alias("n_dim"))
    bits_set = bits.agg(F.count(F.lit(1)).alias("bits_set"))
    return (
        n_dim.crossJoin(bits_set)
        .crossJoin(candidates)
        .crossJoin(true_matches)
        .select(
            "n_dim",
            "bits_set",
            "candidates",
            "true_matches",
            (F.col("candidates") - F.col("true_matches")).alias("false_positives"),
        )
    )


# ---------------------------------------------------------------------------
# Golden-record survivorship (entity resolution merge rules).


@register(
    "golden_record_survivorship",
    survey_ref="§2.6,§2.7,§2.8",
    oracle="""
WITH o AS (
  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderpriority, o_orderdate,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
ranked AS (
  SELECT o.*,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_latest,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY cents DESC, o_orderkey DESC) AS rn_big
  FROM o
),
golden AS (
  SELECT o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(cents) AS BIGINT) AS total_spend_cents,
         MIN(o_orderdate) AS first_order_ts,
         MAX(CASE WHEN rn_latest = 1 THEN o_orderstatus END) AS latest_status,
         MAX(CASE WHEN rn_big = 1 THEN o_orderpriority END) AS top_priority
  FROM ranked GROUP BY o_custkey
)
SELECT g.o_custkey AS custkey, c.c_name, c.c_mktsegment,
       g.n_orders, g.total_spend_cents, g.first_order_ts,
       g.latest_status, g.top_priority
FROM golden g JOIN customer c ON c.c_custkey = g.o_custkey
""",
)
def q_golden_record_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record merge (entity-resolution survivorship): collapse
    each customer's order history into one record where every column
    survives by its OWN rule — latest-wins for status (keyed by
    (orderdate, orderkey)), biggest-transaction-wins for priority
    (keyed by (cents, orderkey)), min for first-seen, exact integer
    cents for lifetime spend.

    One hash aggregate does all rules at once via ``max_by`` over
    composite struct keys (tie-broken by the unique orderkey, so the
    survivor is deterministic at any partitioning — the oracle's
    window formulation is the proof), then a join attaches the
    dimension attributes.  No windows on the Spark side: survivorship
    is a single map-side-combinable aggregate, which is what makes the
    golden-record build a one-shuffle operation at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    o = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        "o_orderdate",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    golden = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("total_spend_cents"),
        F.min("o_orderdate").alias("first_order_ts"),
        F.max_by(
            "o_orderstatus", F.struct(F.col("o_orderdate"), F.col("o_orderkey"))
        ).alias("latest_status"),
        F.max_by(
            "o_orderpriority", F.struct(F.col("cents"), F.col("o_orderkey"))
        ).alias("top_priority"),
    )
    return golden.join(
        cust, golden.o_custkey == cust.c_custkey
    ).select(
        F.col("o_custkey").alias("custkey"),
        "c_name",
        "c_mktsegment",
        "n_orders",
        "total_spend_cents",
        "first_order_ts",
        "latest_status",
        "top_priority",
    )


# ---------------------------------------------------------------------------
# Zone-map data skipping: row-order vs value-clustered layout.

_ZM_ROWS_PER_FILE = 3125
_ZM_LO, _ZM_HI = 100.0, 120.0
_ZM_VALUE_WIDTH = 18  # 560.21 max / 32 files


@register(
    "zone_map_skipping_stats",
    survey_ref="§2.6,S4",
    oracle=f"""
WITH tagged AS (
  SELECT value,
         event_id // {_ZM_ROWS_PER_FILE} AS f_row,
         LEAST(CAST(FLOOR(value / {_ZM_VALUE_WIDTH}) AS BIGINT), 31) AS f_clu
  FROM events
),
files AS (
  SELECT layout, f, MIN(value) AS minv, MAX(value) AS maxv,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM (
    SELECT 'row_order' AS layout, f_row AS f, value FROM tagged
    UNION ALL
    SELECT 'value_clustered' AS layout, f_clu AS f, value FROM tagged
  )
  GROUP BY layout, f
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN maxv < {_ZM_LO} OR minv > {_ZM_HI} THEN 1 ELSE 0 END)
            AS BIGINT) AS files_skipped,
       CAST(SUM(n) AS BIGINT) AS rows_total,
       CAST(SUM(CASE WHEN maxv < {_ZM_LO} OR minv > {_ZM_HI} THEN n ELSE 0 END)
            AS BIGINT) AS rows_skipped
FROM files
GROUP BY layout
""",
)
def q_zone_map_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (per-file min/max) data-skipping audit, quantifying the
    clustering payoff: the SAME predicate (``value BETWEEN 100 AND
    120``) against (a) the natural row-order file layout and (b) a
    value-range-clustered layout — the report a table optimizer reads
    before choosing a CLUSTER BY / Z-ORDER rewrite.

    One scan: each row is tagged with both layouts' file ids and
    exploded into (layout, file) pairs; min/max/count per file is a
    bounded hash aggregate (group count = #files, map-side combined);
    the verdict aggregate runs on the tiny file-stats relation.  No
    global sort is needed to MODEL the clustered layout — file
    assignment is a pure value-range function, which is exactly how a
    range-partitioned rewrite would bin rows at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        "value",
        F.expr(f"event_id DIV {_ZM_ROWS_PER_FILE}").alias("f_row"),
        F.least(
            F.floor(F.col("value") / _ZM_VALUE_WIDTH).cast("bigint"), F.lit(31)
        ).alias("f_clu"),
    )
    pairs = tagged.select(
        "value",
        F.explode(
            F.array(
                F.struct(F.lit("row_order").alias("layout"), F.col("f_row").alias("f")),
                F.struct(
                    F.lit("value_clustered").alias("layout"), F.col("f_clu").alias("f")
                ),
            )
        ).alias("t"),
    ).select("value", "t.layout", "t.f")
    files = pairs.groupBy("layout", "f").agg(
        F.min("value").alias("minv"),
        F.max("value").alias("maxv"),
        F.count(F.lit(1)).alias("n"),
    )
    skipped = (F.col("maxv") < _ZM_LO) | (F.col("minv") > _ZM_HI)
    return files.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.when(skipped, 1).otherwise(0)).alias("files_skipped"),
        F.sum("n").alias("rows_total"),
        F.sum(F.when(skipped, F.col("n")).otherwise(0)).alias("rows_skipped"),
    )


# ---------------------------------------------------------------------------
# k-anonymity release with generalization-lattice fallback.

_KANON_K = 8


@register(
    "k_anonymity_generalize",
    survey_ref="§2.6,P5",
    oracle=f"""
WITH base AS (
  SELECT event_type,
         strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M') AS hour_b,
         strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day_b,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
hourly AS (
  SELECT event_type, hour_b, MIN(day_b) AS day_b,
         CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
  FROM base GROUP BY event_type, hour_b
),
rel_h AS (SELECT * FROM hourly WHERE n >= {_KANON_K}),
daily AS (
  SELECT event_type, day_b, CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(sum_cents) AS BIGINT) AS sum_cents
  FROM hourly WHERE n < {_KANON_K} GROUP BY event_type, day_b
),
rel_d AS (SELECT * FROM daily WHERE n >= {_KANON_K}),
supp AS (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS n
  FROM daily WHERE n < {_KANON_K} GROUP BY event_type
)
SELECT 'hour' AS granularity, event_type, hour_b AS bucket, n, sum_cents FROM rel_h
UNION ALL
SELECT 'day' AS granularity, event_type, day_b AS bucket, n, sum_cents FROM rel_d
UNION ALL
SELECT 'suppressed' AS granularity, event_type, '*' AS bucket, n,
       CAST(NULL AS BIGINT) AS sum_cents
FROM supp
""",
)
def q_k_anonymity_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymous aggregate release (k=8) over the quasi-identifier
    (event_type, time bucket), with a generalization-lattice fallback:
    hour-level groups below k are COARSENED to day level by re-rolling
    the hourly PARTIAL aggregates (never rescanning the base table);
    groups still below k at day level are suppressed into a per-type
    total with the value column withheld — the release shape a
    training-data pipeline needs before publishing usage statistics.

    Scale shape: one base scan feeds the hour aggregate; every further
    lattice level is an aggregate OF aggregates over the already-tiny
    group relation (counts and integer-cent sums are mergeable partial
    states, which is what makes generalization a rollup rather than a
    second pass).  All arithmetic is exact integers."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm").alias("hour_b"),
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day_b"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    hourly = base.groupBy("event_type", "hour_b").agg(
        F.min("day_b").alias("day_b"),
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sum_cents"),
    )
    rel_h = hourly.filter(F.col("n") >= _KANON_K).select(
        F.lit("hour").alias("granularity"),
        "event_type",
        F.col("hour_b").alias("bucket"),
        "n",
        "sum_cents",
    )
    daily = (
        hourly.filter(F.col("n") < _KANON_K)
        .groupBy("event_type", "day_b")
        .agg(F.sum("n").alias("n"), F.sum("sum_cents").alias("sum_cents"))
    )
    rel_d = daily.filter(F.col("n") >= _KANON_K).select(
        F.lit("day").alias("granularity"),
        "event_type",
        F.col("day_b").alias("bucket"),
        "n",
        "sum_cents",
    )
    supp = (
        daily.filter(F.col("n") < _KANON_K)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n"))
        .select(
            F.lit("suppressed").alias("granularity"),
            "event_type",
            F.lit("*").alias("bucket"),
            "n",
            F.lit(None).cast("bigint").alias("sum_cents"),
        )
    )
    return rel_h.unionByName(rel_d).unionByName(supp)


# ---------------------------------------------------------------------------
# Incremental view maintenance: merge partial aggregate states.

_IVM_CUTOFF = "1998-01-01"


@register(
    "incremental_agg_maintenance",
    survey_ref="§2.6,A4",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       MIN(o_orderdate) AS first_order,
       MAX(o_orderdate) AS last_order
FROM orders
GROUP BY o_orderpriority
""",
)
def q_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for an aggregate view: the orders
    before the cutoff are reduced to PARTIAL STATES (count, integer-
    cent sum, min/max), the post-cutoff delta is reduced separately,
    and the view refresh MERGES the two state relations — never
    rescanning the base.  The oracle aggregates the whole table in one
    pass, so the gate proves merge(base_state, delta_state) ≡ full
    recompute, which is the algebraic property (commutative-monoid
    state) every IVM engine rests on.

    At 100 TB this is the difference between an O(delta) nightly
    refresh and an O(history) one: count/sum/min/max (and any other
    monoid — HLL, bitmap, CMS from this corpus) merge cell-wise, so
    the refresh shuffles only |groups| rows per side."""
    orders = load_table(spark, sf_dir, "orders")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")).alias(
                "sum_cents"
            ),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < _IVM_CUTOFF))
    delta = partial(orders.filter(F.col("o_orderdate") >= _IVM_CUTOFF))
    return (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_cents").alias("sum_cents"),
            F.min("first_order").alias("first_order"),
            F.max("last_order").alias("last_order"),
        )
    )


@register(
    "weighted_median_price",
    survey_ref="§2.6,§2.8",
    oracle="""
WITH w AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
         CAST(l_quantity AS BIGINT) AS qty,
         l_orderkey, l_linenumber
  FROM lineitem
),
cum AS (
  SELECT l_returnflag, price_c, qty,
         SUM(qty) OVER (PARTITION BY l_returnflag
                        ORDER BY price_c, l_orderkey, l_linenumber
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
         SUM(qty) OVER (PARTITION BY l_returnflag) AS total
  FROM w
),
hit AS (
  SELECT l_returnflag, price_c,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY c, price_c) AS rn
  FROM cum WHERE 2 * c >= total
)
SELECT l_returnflag, price_c AS weighted_median_cents
FROM hit WHERE rn = 1
""",
)
def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag — the
    survey-statistics generalization of the exact median: the first
    price (in cumulative price order) whose cumulative quantity
    reaches half the stratum total.  Ties share a price, so the
    crossing PRICE is deterministic by value alone; all integer
    arithmetic (cents × integer quantities) makes the answer exact
    and partitioning-independent.

    Scale shape (two-phase order-statistic locate, NOT a per-stratum
    cumsum over raw rows — 3 return flags would funnel ⅓ of lineitem
    through each reducer):  phase 1 coarsens to (flag, $100-range)
    quantity sums — one map-side-combinable aggregate whose output is
    ~3×1000 rows — and a cumulative window over that TINY relation
    locates the range containing each stratum's half-total crossing;
    phase 2 rescans only rows inside the ≤3 located ranges (broadcast
    semi-filter on the scan), groups exact cents within them, and a
    second tiny cumulative pins the crossing price.  Total shuffled
    data: two bounded-group aggregates + broadcast joins of 3-row
    relations.  The oracle keeps the naive global-window form, so the
    gate proves the refinement reproduces it exactly."""
    li = load_table(spark, sf_dir, "lineitem")
    w = li.select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint").alias("price_c"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    # phase 1: coarse (flag, $100-range) quantity mass + crossing range
    coarse = (
        w.groupBy("l_returnflag", F.expr("price_c DIV 10000").alias("bucket"))
        .agg(F.sum("qty").alias("bq"))
    )
    wflag = Window.partitionBy("l_returnflag").orderBy("bucket")
    coarse_cum = coarse.select(
        "l_returnflag",
        "bucket",
        "bq",
        (F.sum("bq").over(wflag.rowsBetween(Window.unboundedPreceding, 0)) - F.col("bq")).alias("below"),
        F.sum("bq").over(Window.partitionBy("l_returnflag")).alias("total"),
    )
    target = coarse_cum.filter(
        (2 * F.col("below") < F.col("total"))
        & (2 * (F.col("below") + F.col("bq")) >= F.col("total"))
    ).select("l_returnflag", "bucket", "below", "total")
    # phase 2: exact cents inside the (one-per-stratum) located ranges only
    fine = (
        w.join(
            F.broadcast(
                target.select(
                    F.col("l_returnflag").alias("tf"), F.col("bucket").alias("tb")
                )
            ),
            (F.col("l_returnflag") == F.col("tf"))
            & (F.expr("price_c DIV 10000") == F.col("tb")),
        )
        .groupBy("l_returnflag", "price_c")
        .agg(F.sum("qty").alias("g"))
    )
    wfine = Window.partitionBy("l_returnflag").orderBy("price_c").rowsBetween(
        Window.unboundedPreceding, 0
    )
    fine_cum = fine.select(
        "l_returnflag",
        "price_c",
        (F.sum("g").over(wfine) - F.col("g")).alias("fbelow"),
        "g",
    )
    return (
        fine_cum.join(
            F.broadcast(target.select("l_returnflag", "below", "total")), "l_returnflag"
        )
        .filter(
            (2 * (F.col("below") + F.col("fbelow")) < F.col("total"))
            & (2 * (F.col("below") + F.col("fbelow") + F.col("g")) >= F.col("total"))
        )
        .select("l_returnflag", F.col("price_c").alias("weighted_median_cents"))
    )


@register(
    "null_imputation_report",
    survey_ref="§2.6,P5,F6",
    oracle="""
WITH masked AS (
  SELECT event_type, event_id,
         CASE WHEN event_id % 17 = 0 THEN NULL
              ELSE CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END AS cents
  FROM events
),
ranked AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY cents, event_id) AS rk,
         COUNT(cents) OVER (PARTITION BY event_type) AS n_obs
  FROM masked WHERE cents IS NOT NULL
),
med AS (
  SELECT event_type, cents AS median_cents
  FROM ranked WHERE rk = (n_obs + 1) // 2
)
SELECT m.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN m.cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_missing,
       MIN(med.median_cents) AS median_cents,
       CAST(SUM(COALESCE(m.cents, med.median_cents)) AS BIGINT)
         AS sum_imputed_cents
FROM masked m JOIN med ON med.event_type = m.event_type
GROUP BY m.event_type
""",
)
def q_null_imputation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median imputation with an audit report — the data-repair step a
    curation pipeline runs before training: 1-in-17 of the value cells
    is masked NULL (deterministically, so the oracle sees the same
    holes), each hole is filled with its group's EXACT lower median
    (integer cents, rank ⌈n/2⌉ in (value, event_id) order — no
    interpolation, no float percentile), and the report accounts for
    every cell: total, missing, the imputation value, and the repaired
    sum.

    Shape: one window pass over the non-null rows ranks each group
    (the shuffle is keyed by the low-cardinality group column), the
    1-row-per-group median relation broadcasts back, and the repaired
    aggregate is a plain hash aggregate — the imputation itself never
    shuffles the fact table a second time."""
    ev = load_table(spark, sf_dir, "events")
    masked = ev.select(
        "event_type",
        "event_id",
        F.when(F.col("event_id") % 17 == 0, F.lit(None).cast("bigint")).otherwise(
            F.floor(F.col("value") * 100 + 0.5).cast("bigint")
        ).alias("cents"),
    )
    byt = Window.partitionBy("event_type")
    ranked = (
        masked.filter(F.col("cents").isNotNull())
        .withColumn("rk", F.row_number().over(byt.orderBy("cents", "event_id")))
        .withColumn("n_obs", F.count("cents").over(byt))
    )
    med = ranked.filter(F.col("rk") == F.expr("(n_obs + 1) DIV 2")).select(
        "event_type", F.col("cents").alias("median_cents")
    )
    return (
        masked.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("cents").isNull(), 1).otherwise(0)).alias("n_missing"),
            F.min("median_cents").alias("median_cents"),
            F.sum(F.coalesce(F.col("cents"), F.col("median_cents"))).alias(
                "sum_imputed_cents"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Hierarchy subtree rollup via closed-form ancestor enumeration.

_BOM_LEVELS = 8  # ceil(log10(max partkey)) + headroom


@register(
    "bom_subtree_rollup",
    survey_ref="§2.6,§2.7",
    oracle=f"""
WITH anc AS (
  SELECT DISTINCT
         unnest(list_distinct(list_transform(range({_BOM_LEVELS}),
                j -> p_partkey // CAST(POWER(10, j) AS BIGINT)))) AS node,
         p_partkey,
         CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c
  FROM part
)
SELECT node,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(price_c) AS BIGINT) AS subtree_cents
FROM anc
GROUP BY node
""",
)
def q_bom_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill-of-materials subtree rollup over the implicit decimal-trie
    part hierarchy (parent(k) = k DIV 10, root 0): every node's part
    count and total retail value across its ENTIRE subtree,
    self-inclusive.

    The Spark-first shape: because the parent function is closed-form,
    each row's full ancestor chain is enumerated as a per-row array
    (``transform`` over 8 levels + ``array_distinct`` — the trie is at
    most 8 deep), exploded, and hash-aggregated — ONE scan, ONE
    bounded shuffle (≤ 8 rows per part, group count = node count), NO
    iteration.  This is the materialized-path pattern that replaces a
    recursive CTE whenever depth is bounded: the iterative
    level-by-level join family (``bfs_shortest_hops``, ``kcore``)
    stays for graphs where ancestry is data-dependent.  All integer
    cents, hash-exact."""
    p = load_table(spark, sf_dir, "part")
    # integer division via DIV to stay in exact bigint land
    ancestors = F.array_distinct(
        F.expr(
            f"transform(sequence(0, {_BOM_LEVELS - 1}), "
            f"j -> p_partkey DIV CAST(POWER(10, j) AS BIGINT))"
        )
    )
    return (
        p.select(
            F.explode(ancestors).alias("node"),
            F.floor(F.col("p_retailprice") * 100 + 0.5).cast("bigint").alias("price_c"),
        )
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("price_c").alias("subtree_cents"),
        )
    )


@register(
    "poisson_bootstrap_ci",
    survey_ref="§2.3,§2.6,A4",
    oracle="""
WITH reps AS (
  SELECT e.event_id,
         CAST(ROUND(e.value * 1000000) AS BIGINT) AS iv,
         b.b,
         ((e.event_id % 1000003) * 31 + b.b * 7 + 11) * 2654435761 % 1000000 AS u
  FROM events e, (SELECT unnest(range(0, 16)) AS b) b
),
weighted AS (
  SELECT b,
         CASE WHEN u < 367879 THEN 0
              WHEN u < 735759 THEN 1
              WHEN u < 919699 THEN 2
              WHEN u < 981012 THEN 3
              WHEN u < 996340 THEN 4
              ELSE 5 END AS w,
         iv
  FROM reps
)
SELECT b,
       CAST(SUM(w) AS BIGINT) AS n_eff,
       ROUND(SUM(w * iv) * 1.0 / (SUM(w) * 1000000), 6) AS boot_mean
FROM weighted
GROUP BY b ORDER BY b
""",
)
def q_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (the distributed bootstrap: resample weights
    ~ Poisson(1) instead of materializing resamples — Chamandy et al.,
    'Estimating uncertainty for massive data streams', Google 2012):
    16 bootstrap replicates of the mean event value in ONE pass, each
    event's per-replicate weight drawn by inverse-CDF lookup on a
    deterministic integer hash (seeded by event_id × replicate), so
    the replicate means' spread is the standard error estimate.

    Scale shape: a literal 16-row explode fans each event into its
    replicates map-side (no shuffle to resample — the whole point at
    100 TB, where a true resample would shuffle the fact 16×), then
    one 16-key aggregate. Weights and micro-value sums are exact
    BIGINT (hash stays under 2^63: (1000003·31+123)·2654435761 ≈
    8.2e16), the only float division is once per output row."""
    e = load_table(spark, sf_dir, "events")
    b = spark.range(16).select(F.col("id").cast("int").alias("b"))
    reps = e.crossJoin(F.broadcast(b)).select(
        F.col("b"),
        F.round(F.col("value") * 1000000).cast("long").alias("iv"),
        (
            ((F.col("event_id") % 1000003) * 31 + F.col("b") * 7 + 11)
            * F.lit(2654435761)
            % 1000000
        ).alias("u"),
    )
    w = (
        F.when(F.col("u") < 367879, 0)
        .when(F.col("u") < 735759, 1)
        .when(F.col("u") < 919699, 2)
        .when(F.col("u") < 981012, 3)
        .when(F.col("u") < 996340, 4)
        .otherwise(5)
    )
    return (
        reps.select("b", w.alias("w"), "iv")
        .groupBy("b")
        .agg(
            F.sum("w").alias("n_eff"),
            F.round(F.sum(F.col("w") * F.col("iv")) * 1.0 / (F.sum("w") * 1000000), 6).alias(
                "boot_mean"
            ),
        )
        .orderBy("b")
    )


@register(
    "dp_laplace_counts",
    survey_ref="§2.6,A3",
    oracle="""
WITH counts AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY event_type
),
noised AS (
  SELECT event_type, n,
         (list_sum(list_transform(range(0, LEAST(LENGTH(event_type), 8)),
              k -> CAST(ascii(event_type[k+1]) AS BIGINT) * (31 ** k))) % 1000003
            * 2654435761 % 1000000
          + 0.5) / 1000000.0 AS u
  FROM counts
)
SELECT event_type, n AS true_n,
       ROUND(n + (CASE WHEN u >= 0.5 THEN -2.0 ELSE 2.0 END)
                 * LN(1.0 - 2.0 * ABS(u - 0.5)), 6) AS noisy_n,
       0.5 AS epsilon
FROM noised
ORDER BY event_type
""",
)
def q_dp_laplace_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy release shape: per-group counts with
    Laplace(sensitivity/epsilon = 1/0.5 = scale 2) noise drawn by
    inverse-CDF on a deterministic per-group hash uniform (seeded
    noise stands in for a CSPRNG — the privacy calibration and the
    plan shape are the operator; swap the hash for real entropy in
    production). Complements ``k_anonymity_generalize`` on the
    privacy surface.

    Scale shape: one hash aggregate to counts (group-key scale), then
    row-local noise arithmetic on the tiny result — the noise draw
    never touches the fact table. One LN per group, rounded to 1e-6."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    h = F.lit(0).cast("long")
    for k in range(8):
        code = F.when(
            F.length("event_type") > k,
            F.ascii(F.substring("event_type", k + 1, 1)).cast("long"),
        ).otherwise(F.lit(0))
        h = h + code * F.lit(31**k)
    u = (h % 1000003 * F.lit(2654435761) % 1000000 + 0.5) / 1000000.0
    noise = F.when(u >= 0.5, F.lit(-2.0)).otherwise(F.lit(2.0)) * F.log(
        1.0 - 2.0 * F.abs(u - 0.5)
    )
    return counts.select(
        "event_type",
        F.col("n").alias("true_n"),
        F.round(F.col("n") + noise, 6).alias("noisy_n"),
        F.lit(0.5).alias("epsilon"),
    ).orderBy("event_type")


@register(
    "l_diversity_audit",
    survey_ref="§2.6,P5",
    oracle="""
WITH base AS (
  SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M') AS hour_b,
         event_type
  FROM events
),
per_group AS (
  SELECT hour_b,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
         CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
  FROM base GROUP BY hour_b
),
scored AS (
  SELECT hour_b, n,
         (CASE WHEN n_click > 0 THEN 1 ELSE 0 END) + (CASE WHEN n_error > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN n_purchase > 0 THEN 1 ELSE 0 END) + (CASE WHEN n_signup > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN n_view > 0 THEN 1 ELSE 0 END) AS distinct_l,
         0.0 - (CASE WHEN n_click > 0 THEN n_click * 1.0 / n * LN(n_click * 1.0 / n) ELSE 0.0 END)
             - (CASE WHEN n_error > 0 THEN n_error * 1.0 / n * LN(n_error * 1.0 / n) ELSE 0.0 END)
             - (CASE WHEN n_purchase > 0 THEN n_purchase * 1.0 / n * LN(n_purchase * 1.0 / n) ELSE 0.0 END)
             - (CASE WHEN n_signup > 0 THEN n_signup * 1.0 / n * LN(n_signup * 1.0 / n) ELSE 0.0 END)
             - (CASE WHEN n_view > 0 THEN n_view * 1.0 / n * LN(n_view * 1.0 / n) ELSE 0.0 END) AS h
  FROM per_group
)
SELECT hour_b, n, CAST(distinct_l AS BIGINT) AS distinct_l,
       ROUND(EXP(h), 6) AS entropy_l,
       CAST(CASE WHEN distinct_l >= 3 AND EXP(h) >= 2.0 THEN 1 ELSE 0 END AS BIGINT) AS release_ok
FROM scored
ORDER BY hour_b
""",
)
def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) companion to
    ``k_anonymity_generalize``: for each quasi-identifier group (hour
    bucket), measure how diverse the sensitive attribute (event_type)
    is — both distinct-l and entropy-l — and flag groups safe to
    release under (distinct >= 3, entropy-l >= 2). k-anonymity alone
    leaves a group of 8 identical purchases fully disclosive; this is
    the check that catches it.

    Scale shape: one hash aggregate to the hour grain with the five
    known sensitive categories pivoted into fixed columns, so the
    entropy is a fixed-order row-local expression over exact integer
    counts (no order-dependent float SUM) — one LN per (group,
    category), applied on the aggregated relation only."""
    ev = load_table(spark, sf_dir, "events")
    cats = ["click", "error", "purchase", "signup", "view"]
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.when(F.col("event_type") == c, 1).otherwise(0)).alias(f"n_{c}") for c in cats
    ]
    per_group = (
        ev.select(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm").alias("hour_b"),
            "event_type",
        )
        .groupBy("hour_b")
        .agg(*aggs)
    )
    distinct_l = None
    h = F.lit(0.0)
    for c in cats:
        nc = F.col(f"n_{c}")
        ind = F.when(nc > 0, 1).otherwise(0)
        distinct_l = ind if distinct_l is None else distinct_l + ind
        p = nc * 1.0 / F.col("n")
        h = h - F.when(nc > 0, p * F.log(p)).otherwise(F.lit(0.0))
    return (
        per_group.select(
            "hour_b",
            "n",
            distinct_l.cast("long").alias("distinct_l"),
            F.round(F.exp(h), 6).alias("entropy_l"),
            F.when((distinct_l >= 3) & (F.exp(h) >= 2.0), 1)
            .otherwise(0)
            .cast("long")
            .alias("release_ok"),
        ).orderBy("hour_b")
    )


@register(
    "gdpr_erasure_audit",
    survey_ref="§2.6,§2.7,P5",
    oracle="""
WITH subjects AS (
  SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0
),
ev AS (
  SELECT e.user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT e.event_type) AS BIGINT) AS n_types,
         MIN(epoch_us(e.ts)) AS first_us,
         MAX(epoch_us(e.ts)) AS last_us
  FROM events e JOIN subjects s ON e.user_id = s.user_id
  GROUP BY e.user_id
)
SELECT user_id, n_events, n_types,
       (last_us - first_us) // 86400000000 AS span_days,
       CAST(CASE WHEN n_events > 0 THEN 1 ELSE 0 END AS BIGINT) AS requires_erasure
FROM ev
ORDER BY user_id
""",
)
def q_gdpr_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure (GDPR art. 17) pre-delete audit: for every
    data subject in the deletion batch (here the deterministic cohort
    user_id % 97 == 0), enumerate what will be destroyed — row counts,
    distinct event types, retention span — the report a privacy
    pipeline files BEFORE issuing the actual deletes, completing the
    privacy surface next to ``k_anonymity_generalize``,
    ``l_diversity_audit``, ``dp_laplace_counts`` and ``pii_redact``.

    Scale shape: the subject list is a broadcastable semi-join input
    (at 100 TB the deletion batch is always small relative to the
    fact), so the plan is one broadcast-filtered scan + one user-keyed
    aggregate. All outputs are exact integers."""
    e = load_table(spark, sf_dir, "events")
    subjects = e.filter(F.col("user_id") % 97 == 0).select("user_id").distinct()
    us = F.unix_micros("ts")
    ev = (
        e.join(F.broadcast(subjects), "user_id")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.min(us).alias("first_us"),
            F.max(us).alias("last_us"),
        )
    )
    return ev.select(
        "user_id",
        "n_events",
        "n_types",
        F.expr("(last_us - first_us) DIV 86400000000").alias("span_days"),
        F.when(F.col("n_events") > 0, 1).otherwise(0).cast("long").alias("requires_erasure"),
    ).orderBy("user_id")


@register(
    "ab_power_analysis",
    survey_ref="§2.6,A4",
    oracle="""
WITH cents AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events WHERE event_type IN ('view', 'purchase')
),
stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(vc) AS BIGINT) AS s,
         CAST(SUM(vc * vc) AS BIGINT) AS sq
  FROM cents GROUP BY event_type
),
pivoted AS (
  SELECT MAX(CASE WHEN event_type = 'view' THEN n END) AS n1,
         MAX(CASE WHEN event_type = 'view' THEN s END) AS s1,
         MAX(CASE WHEN event_type = 'view' THEN sq END) AS sq1,
         MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n2,
         MAX(CASE WHEN event_type = 'purchase' THEN s END) AS s2,
         MAX(CASE WHEN event_type = 'purchase' THEN sq END) AS sq2
  FROM stats
)
SELECT n1, n2,
       ROUND((s1 * 1.0 / n1 - s2 * 1.0 / n2) / 100.0, 6) AS observed_diff,
       ROUND(((sq1 * 1.0 - s1 * 1.0 * s1 / n1) / (n1 - 1)
            + (sq2 * 1.0 - s2 * 1.0 * s2 / n2) / (n2 - 1)) / 2.0 / 10000.0, 6)
         AS pooled_var,
       CAST(CEIL(2.0 * 7.849 * (((sq1 * 1.0 - s1 * 1.0 * s1 / n1) / (n1 - 1)
            + (sq2 * 1.0 - s2 * 1.0 * s2 / n2) / (n2 - 1)) / 2.0 / 10000.0)
            / (((s1 * 1.0 / n1 - s2 * 1.0 / n2) / 100.0)
               * ((s1 * 1.0 / n1 - s2 * 1.0 / n2) / 100.0))) AS BIGINT)
         AS n_per_arm_80pct
FROM pivoted
""",
)
def q_ab_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample power analysis (the design-stage companion to
    ``ab_test_welch``): from exact sufficient statistics of the two
    arms, compute the observed effect, pooled variance, and the
    per-arm sample size for 80% power at α=0.05 — n = 2(z_{α/2}+z_β)²
    σ²/Δ², with (1.96+0.842)² = 7.849 as the standard constant.

    Scale shape: one 2-key aggregate of exact integer sufficient
    statistics (n, Σ, Σ²) pivoted into fixed columns, so every float
    expression is row-local fixed-order arithmetic on exact BIGINTs —
    the same discipline as ab_test_welch; no per-row float math
    anywhere."""
    e = load_table(spark, sf_dir, "events")
    cents = e.filter(F.col("event_type").isin("view", "purchase")).select(
        "event_type", F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("vc")
    )
    stats = cents.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vc").alias("s"),
        F.sum(F.col("vc") * F.col("vc")).alias("sq"),
    )
    p = stats.agg(
        *[
            F.max(F.when(F.col("event_type") == et, F.col(c))).alias(f"{c}{i}")
            for i, et in ((1, "view"), (2, "purchase"))
            for c in ("n", "s", "sq")
        ]
    )
    mean_diff = (F.col("s1") * 1.0 / F.col("n1") - F.col("s2") * 1.0 / F.col("n2")) / 100.0
    var1 = (F.col("sq1") * 1.0 - F.col("s1") * 1.0 * F.col("s1") / F.col("n1")) / (
        F.col("n1") - 1
    )
    var2 = (F.col("sq2") * 1.0 - F.col("s2") * 1.0 * F.col("s2") / F.col("n2")) / (
        F.col("n2") - 1
    )
    pooled = (var1 + var2) / 2.0 / 10000.0
    return p.select(
        "n1",
        "n2",
        F.round(mean_diff, 6).alias("observed_diff"),
        F.round(pooled, 6).alias("pooled_var"),
        F.ceil(2.0 * 7.849 * pooled / (mean_diff * mean_diff)).cast("long").alias(
            "n_per_arm_80pct"
        ),
    )


@register(
    "ndv_estimate_audit",
    survey_ref="§2.6,A3",
    oracle="""
WITH ndv AS (
  SELECT 'l_orderkey' AS col, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_ndv,
         CAST(approx_count_distinct(l_orderkey) AS BIGINT) AS ap FROM lineitem
  UNION ALL
  SELECT 'l_partkey', CAST(COUNT(DISTINCT l_partkey) AS BIGINT),
         CAST(approx_count_distinct(l_partkey) AS BIGINT) FROM lineitem
  UNION ALL
  SELECT 'l_suppkey', CAST(COUNT(DISTINCT l_suppkey) AS BIGINT),
         CAST(approx_count_distinct(l_suppkey) AS BIGINT) FROM lineitem
)
SELECT col, exact_ndv,
       ABS(ap - exact_ndv) <= 0.1 * exact_ndv AS hll_within_10pct
FROM ndv ORDER BY col
""",
)
def q_ndv_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDV (number-of-distinct-values) estimation audit — the
    statistic every cost-based optimizer keys join orders on: exact
    NDV per key column of the fact table, plus an in-plan,
    oracle-compared invariant column ``hll_within_10pct``: each
    engine's own HLL sketch (Spark HLL++ rsd=0.02, DuckDB HLL) must
    sit within 10% of the exact count. The raw estimates differ
    bit-for-bit across engines, so the *contract* (bounded relative
    error) is the compared value — lazily evaluated inside the plan,
    never a driver-side assert (immune to ``python -O``).

    Scale shape: ONE pass over the fact computes all three exact
    distincts (expand + partial distinct map-side) and all three HLL
    sketches (mergeable registers); at 100 TB the production path is
    the HLL estimate alone, and this audit certifies its error."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ("l_orderkey", "l_partkey", "l_suppkey")
    agg = li.agg(
        *[F.countDistinct(c).alias(f"ex_{c}") for c in cols],
        *[F.approx_count_distinct(c, rsd=0.02).alias(f"ap_{c}") for c in cols],
    )
    return (
        agg.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("col"),
                            F.col(f"ex_{c}").alias("exact_ndv"),
                            (
                                F.abs(F.col(f"ap_{c}") - F.col(f"ex_{c}"))
                                <= 0.1 * F.col(f"ex_{c}")
                            ).alias("hll_within_10pct"),
                        )
                        for c in cols
                    ]
                )
            ).alias("s")
        )
        .select("s.*")
        .orderBy("col")
    )


@register(
    "psi_population_stability",
    survey_ref="§2.6,A5",
    oracle="""
WITH mid AS (
  SELECT MIN(epoch_us(ts)) + (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 2 AS m
  FROM events
),
binned AS (
  SELECT CASE WHEN epoch_us(ts) < mid.m THEN 'ref' ELSE 'cur' END AS cohort,
         CAST(LEAST(CAST(FLOOR(value / 10.0) AS BIGINT), 39) AS INTEGER) AS bin
  FROM events, mid
),
counts AS (
  SELECT bin,
         CAST(SUM(CASE WHEN cohort = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS r,
         CAST(SUM(CASE WHEN cohort = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM binned GROUP BY bin
),
tot AS (SELECT SUM(r) AS tr, SUM(c) AS tc FROM counts),
terms AS (
  SELECT bin, r, c,
         CAST(ROUND(((c + 1) * 1.0 / (tot.tc + 40) - (r + 1) * 1.0 / (tot.tr + 40))
               * LN(((c + 1) * 1.0 / (tot.tc + 40)) / ((r + 1) * 1.0 / (tot.tr + 40)))
               * 1000000000) AS BIGINT) AS ipsi
  FROM counts, tot
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(r) AS BIGINT) AS n_ref,
       CAST(SUM(c) AS BIGINT) AS n_cur,
       ROUND(SUM(ipsi) / 1000000000.0, 6) AS psi
FROM terms
""",
)
def q_psi_population_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the observation window (the credit-scoring / feature-drift metric:
    PSI < 0.1 stable, > 0.25 drifted): 40 fixed value bins, add-one
    smoothing so empty bins stay finite, PSI = Σ (p-q)·ln(p/q).
    Pairs with ``embedding_drift_report`` (vector drift) and
    ``window_zscore_anomaly`` (pointwise) on the monitoring surface.

    Scale shape: the time midpoint is a broadcast 1-row aggregate; one
    40-key binned aggregate per cohort (single fact pass, map-side
    combine); the PSI terms are integer-encoded (nano units) per bin
    BEFORE the final 40-row SUM, so bin accumulation order never
    shows. One LN per bin."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    mid = e.agg((F.min(us) + F.expr("(max(unix_micros(ts)) - min(unix_micros(ts))) DIV 2")).alias("m"))
    binned = e.crossJoin(F.broadcast(mid)).select(
        F.when(us < F.col("m"), "ref").otherwise("cur").alias("cohort"),
        F.least(F.floor(F.col("value") / 10.0).cast("long"), F.lit(39)).cast("int").alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("cohort") == "ref", 1).otherwise(0)).alias("r"),
        F.sum(F.when(F.col("cohort") == "cur", 1).otherwise(0)).alias("c"),
    )
    tot = counts.agg(F.sum("r").alias("tr"), F.sum("c").alias("tc"))
    p = (F.col("c") + 1) * 1.0 / (F.col("tc") + 40)
    q = (F.col("r") + 1) * 1.0 / (F.col("tr") + 40)
    terms = counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "r",
        "c",
        F.round((p - q) * F.log(p / q) * 1000000000).cast("long").alias("ipsi"),
    )
    return terms.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("r").alias("n_ref"),
        F.sum("c").alias("n_cur"),
        F.round(F.sum("ipsi") / 1000000000.0, 6).alias("psi"),
    )


# ---------------------------------------------------------------------------
# Engine-native runtime Bloom filter (InjectRuntimeFilter) — the
# non-partitioned-column analogue of dynamic partition pruning, and the
# engine-side twin of the manual bloom_semijoin_reduction above.


def runtime_bloom_session(spark: SparkSession) -> SparkSession:
    """A scoped session that makes Catalyst's InjectRuntimeFilter
    observable at fixture scale.

    The rule is ON by default in Spark 4 but gated by production-sized
    thresholds: the probe-side scan must exceed 10 GB
    (`applicationSideScanSizeThreshold`) before the optimizer considers
    a runtime bloom worth the build, and a broadcast-able build side
    takes the broadcast-join path instead (where the hashed relation
    itself prunes). At 100 TB both gates pass on their own — lineitem
    dwarfs 10 GB and a filtered orders selection exceeds the broadcast
    threshold — so this session recreates the production regime at
    sf0.01/0.1 (scan gate → 1KB, broadcast off) rather than tuning
    anything. The confs live on a `newSession()` clone (shared
    SparkContext, PRIVATE SQLConf) instead of a save/restore on the
    caller's session: a save/restore window would leak
    `autoBroadcastJoinThreshold=-1` to every other query running on
    the session during the window — the same cross-thread hazard class
    the r10 contention probe caught in the dedup memo."""
    scoped = spark.newSession()
    scoped.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "1KB",
    )
    scoped.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    return scoped


def runtime_bloom_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lazy plan under test: fact⋈filtered-dim shuffle join where
    the optimizer should inject `might_contain(bloom, xxhash64(key))`
    on the lineitem side BEFORE its shuffle. Exposed separately so the
    plan test can assert on a runtime_bloom_session clone."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    sel = od.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    return (
        li.join(sel, li.l_orderkey == sel.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    + F.lit(0.5)
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )


@register(
    "runtime_bloom_filter_join",
    survey_ref="§2.7,§2.10",
    oracle="""
SELECT l.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY 1
""",
)
def q_runtime_bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENGINE-BUILT runtime Bloom filter on a fact-fact shuffle join:
    Catalyst's InjectRuntimeFilter plants
    `might_contain(bloom_agg(xxhash64(o_orderkey)), xxhash64(l_orderkey))`
    on the lineitem side, so ~4/5 of the fact rows (non-URGENT orders'
    lines) are dropped BEFORE the shuffle — at 100 TB the exchange, not
    the scan, is what this halves, which is exactly the shuffle-volume
    lever the manual `bloom_semijoin_reduction` demonstrates by hand
    (16k-bit bitmap, explicit position join). This twin shows the
    engine-native form: zero user-visible plumbing, bloom built as a
    runtime subquery over the filtered dim, false positives resolved by
    the join itself — semantics are EXACTLY the plain join (the bloom
    only over-approximates, never drops a match), which is what the
    oracle checks. `tests/test_plans.py` asserts both the injection
    (might_contain in the physical plan, below the probe-side exchange)
    and the runtime reduction (executed Filter metrics: rows surviving
    the bloom < total lineitem rows, >= true join matches).
    Thresholds that gate the rule at fixture scale are recreated on a
    scoped session (`runtime_bloom_session` — private SQLConf, no
    cross-thread leak); the result materializes eagerly
    (localCheckpoint, a few grouped rows) so later re-optimization
    cannot lose the injected filter."""
    scoped = runtime_bloom_session(spark)
    return runtime_bloom_frame(scoped, sf_dir).localCheckpoint(eager=True)
