"""TPC-H tail queries adapted to the driver fixture schema (SURVEY
§2.6-2.9 engine surface; the reference has no SQL layer — SURVEY §2.7
"Engine surface").

The fixtures omit ``partsupp``, ``l_commitdate``/``l_receiptdate``,
``o_comment`` and ``c_phone``, so Q2/Q11/Q12/Q16/Q20/Q21 cannot be run
verbatim; the shapes below keep each query's *operator* content —
multi-way join trees, correlated scalar subqueries, NOT EXISTS,
disjunctive pushdown, outer-join aggregation — on the columns that
exist. Q2/Q11/Q20 stand in ``partsupp`` with a per-(part, supplier)
aggregate of ``lineitem``; Q21's commit/receipt lateness becomes
ship-lag vs ``o_orderdate``; Q12's ship mode becomes ``l_linestatus``.
With those six the full 22-query suite is represented.

Scale notes (100 TB): broadcast HINTS go only on fixed-cardinality
relations (region/nation, 1-row global aggregates).  SF-growing sides
(supplier, part, customer, orders — and per-part/per-supplier
aggregates) carry NO hint: the size estimator auto-broadcasts them
while they are genuinely small and AQE converts shuffle joins to
broadcast at runtime from EXACT sizes, so the same plan text is
broadcast-joined at sf0.1 and shuffle-joined at 100 TB.  (The r6 30×
probe caught the old hint-everything policy force-broadcasting a
4.5M-row customer build side — a single-threaded hash-relation build
that made q7/q5 super-linear; hints on growing tables are exactly the
"works at sf0.1, dies at scale" class.)  Per-part / per-customer
aggregates are partial-aggregated map-side before their single
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import register
from high_energy_gamma_ray_search_in_kascade_array_data_spark.sources.catalog import load_table


# ------------------------------------------------------------- TPC-H Q7
@register(
    "q7_volume_shipping",
    survey_ref="§2.7,§2.6",
    oracle="""
SELECT supp_nation, cust_nation, l_year,
       ROUND(SUM(volume_cents) / 100.0, 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
         CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS volume_cents
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
    AND c_nationkey = n2.n_nationkey
    AND n1.n_name <> n2.n_name
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (widened to every cross-nation pair — a single named
    pair is empty at fixture scale): bilateral trade volume by year.
    Five-way join where both nation legs carry explicit broadcast
    hints (fixed 25 rows); orders/customer/supplier are UNHINTED so
    the optimizer broadcasts them only while genuinely small and
    shuffles them at scale (see module docstring — the r6 30× probe
    caught the old forced-broadcast form).  The cross-nation
    inequality lands after the nation joins."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    # Join ORDER is chosen by hand (no CBO stats locally): pre-join
    # orders⋈customer⋈nation at ORDER grain first — shuffles move the
    # two 1/4-scale relations — then lineitem joins that once on
    # l_orderkey. The naive li⋈orders→⋈customer order re-shuffles the
    # full fact a second time on o_custkey (2× the fact-scale exchange
    # bytes; measured 30% slower at the 30× probe tier).
    order_nation = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .select("o_orderkey", "cust_nation")
    )
    supp_nation = supp.join(broadcast(n1), F.col("s_nationkey") == F.col("s_nk")).select(
        "s_suppkey", "supp_nation"
    )
    joined = (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
        )
        .join(order_nation, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            # integer cents via FLOOR(x*100+0.5): identical IEEE ops in
            # both engines, and the BIGINT sum is exact regardless of
            # summation order — immune to half-cent rounding flips
            F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)
            .cast("bigint")
            .alias("volume_cents"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume_cents") / 100.0, 2).alias("revenue"))
    )


# ------------------------------------------------------------- TPC-H Q8
@register(
    "q8_market_share",
    survey_ref="§2.7,§2.6,P5",
    oracle="""
SELECT o_year,
       ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
             / SUM(volume), 6) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
    AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of PROMO-part revenue sold into
    ASIA, by order year — an eight-table join tree whose dimension
    chain (part, supplier, customer, nation×2, region) is entirely
    broadcast, plus conditional aggregation for the share ratio."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.join(
        broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    ).select(F.col("n_nationkey").alias("c_nk"))
    n2 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation"))
    # hand-ordered: the PROMO part join prunes lineitem first; the
    # ASIA-customer orders pre-join happens at ORDER grain so the
    # pruned fact shuffles once on l_orderkey (not again on o_custkey)
    asia_orders = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .select("o_orderkey", "o_orderdate")
    )
    supp_n = supp.join(broadcast(n2), F.col("s_nationkey") == F.col("s_nk")).select(
        "s_suppkey", "nation"
    )
    joined = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(asia_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp_n, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "nation")
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


# ------------------------------------------------------------- TPC-H Q9
@register(
    "q9_product_profit",
    survey_ref="§2.7,§2.6",
    oracle="""
SELECT nation, o_year, ROUND(SUM(amount_cents) / 100.0, 2) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         CAST(FLOOR((l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity) * 100 + 0.5) AS BIGINT) AS amount_cents
  FROM part, supplier, lineitem, orders, nation
  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
    AND p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (supply cost stood in by 0.6·p_retailprice — the
    fixtures carry no partsupp): profit on widget parts by supplier
    nation and year. LIKE-filtered part broadcast prunes lineitem
    before the orders join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            F.floor(amount * 100 + 0.5).cast("bigint").alias("amount_cents"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount_cents") / 100.0, 2).alias("sum_profit"))
    )


# ------------------------------------------------------------ TPC-H Q13
@register(
    "q13_customer_distribution",
    survey_ref="§2.7,§2.6,A3",
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count-per-customer distribution including
    zero-order customers — a left outer join with an ON-clause filter
    (kept out of the WHERE so unmatched customers survive), then two
    cascaded aggregations. COUNT(o_orderkey) counts non-null matches
    only, which is what makes the outer join observable."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ------------------------------------------------------------ TPC-H Q15
@register(
    "q15_top_supplier",
    survey_ref="§2.7,§2.6,A8",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) / 100.0
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: quarter's top-revenue supplier via a reused
    aggregate — the revenue relation feeds both the argmax scalar and
    the final join, so it is computed once and the 1-row max is a
    broadcast cross-join (revenue rounded to 2dp before the equality
    compare to keep the argmax stable across summation orders)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01 00:00:00")))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
                    ).cast("bigint")
                )
                / 100.0
            ).alias("total_revenue")
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ------------------------------------------------------------ TPC-H Q17
@register(
    "q17_small_quantity_revenue",
    survey_ref="§2.7,§2.6",
    oracle="""
SELECT ROUND(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) / 700.0, 2) AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.5 * AVG(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from below-half-average-quantity orders of
    one brand. The correlated scalar subquery decorrelates into a
    per-part AVG aggregate joined back on partkey — at scale the
    per-part aggregate is partial-aggregated map-side and both join
    legs share the l_partkey shuffle key."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("avg_pk")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part_avg, F.col("l_partkey") == F.col("avg_pk"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")) / 700.0, 2
            ).alias("avg_yearly")
        )
    )


# ------------------------------------------------------------ TPC-H Q19
@register(
    "q19_disjunctive_revenue",
    survey_ref="§2.7,P3",
    oracle="""
SELECT ROUND(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) / 100.0, 2)
         AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey AND (
     (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40))
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs over mixed join-side columns. Catalyst
    extracts the common p_partkey equi-key so this stays a hash join
    (not a nested-loop theta join) with the disjunction as a post-join
    filter; the part-only brand/size terms could additionally be
    pushed as a broadcast-side prefilter OR-union, left to AQE here."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(arm("Brand#1", 15, 1, 21) | arm("Brand#2", 25, 10, 30) | arm("Brand#3", 35, 20, 40))
        .agg(
            F.round(
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
                    ).cast("bigint")
                )
                / 100.0,
                2,
            ).alias("revenue")
        )
    )


# ------------------------------------------------------------ TPC-H Q22
@register(
    "q22_idle_customers",
    survey_ref="§2.7,§2.6",
    oracle="""
SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM (
  SELECT CAST(c_nationkey % 10 AS INTEGER) AS cntrycode, c_acctbal
  FROM customer
  WHERE c_nationkey % 10 IN (1, 2, 3, 4, 5, 6, 7)
    AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                     WHERE c_acctbal > 0.0 AND c_nationkey % 10 IN (1, 2, 3, 4, 5, 6, 7))
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
) custsale
GROUP BY cntrycode
""",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (country code stood in by c_nationkey%10 — fixtures
    carry no c_phone; "never ordered" scoped to urgent orders because
    every fixture customer has orders): above-average-balance
    customers with no urgent order. NOT EXISTS compiles to a left
    anti join against the filtered orders key projection; the global
    AVG is a 1-row broadcast cross-join, so the anti join is the only
    real shuffle."""
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "cntrycode", (F.col("c_nationkey") % 10).cast("int")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    eligible = cust.filter(F.col("cntrycode").isin(1, 2, 3, 4, 5, 6, 7))
    avg_bal = eligible.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        eligible.join(broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, eligible["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# ------------------------------------------------------------- TPC-H Q2
@register(
    "q2_min_cost_supplier",
    survey_ref="§2.7,§2.6",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS supplycost_raw
  FROM lineitem GROUP BY 1, 2
), eligible AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier, nation, region
  WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       FLOOR(supplycost_raw * 10000 + 0.5) / 10000.0 AS supplycost
FROM ps, eligible, part
WHERE ps.l_suppkey = s_suppkey AND ps.l_partkey = p_partkey
  AND p_type = 'STANDARD' AND p_size <= 15
  AND supplycost_raw = (SELECT MIN(ps2.supplycost_raw) FROM ps ps2, eligible e2
                        WHERE ps2.l_partkey = ps.l_partkey AND ps2.l_suppkey = e2.s_suppkey)
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (partsupp stood in by per-(part, supplier) MIN unit
    price over lineitem): cheapest EUROPE supplier per qualifying part.
    The correlated MIN subquery decorrelates into a window MIN over
    l_partkey on the eligible-supplier slice — one shuffle (the
    partsupp-surrogate aggregate), then the window reuses its
    clustering; supplier/nation/region and the filtered part side are
    broadcasts. Reference has no SQL layer (SURVEY §2.7 engine
    surface)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15)
    )
    eligible = (
        supp.join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost_raw")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey")
    ps_eligible = ps.join(eligible, F.col("l_suppkey") == F.col("s_suppkey"))
    return (
        ps_eligible.withColumn("min_cost", F.min("supplycost_raw").over(w))
        .filter(F.col("supplycost_raw") == F.col("min_cost"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            # FLOOR(x*1e4+0.5)/1e4 not ROUND: identical IEEE ops in both
            # engines (ROUND half-up/half-even differs on ties)
            (F.floor(F.col("supplycost_raw") * 10000 + 0.5) / 10000.0).alias("supplycost"),
        )
    )


# ------------------------------------------------------------ TPC-H Q11
@register(
    "q11_important_stock",
    survey_ref="§2.7,§2.6",
    oracle="""
WITH val AS (
  SELECT l_partkey,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS v_cents
  FROM lineitem, supplier, nation, region
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_regionkey = r_regionkey AND r_name = 'ASIA'
  GROUP BY 1
)
SELECT l_partkey AS p_partkey, ROUND(v_cents / 100.0, 2) AS part_value
FROM val WHERE v_cents > (SELECT 1.5 * AVG(v_cents) FROM val)
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (partsupp value stood in by ASIA-supplied lineitem
    revenue per part; fixed fraction replaced by a scale-free 1.5×
    average so the HAVING survives any SF): parts holding an outsized
    share. The per-part aggregate is computed once and feeds both the
    global scalar (1-row broadcast) and the filter — the reused-
    aggregate pattern of Q15. Integer-cents sum keeps both engines
    exact regardless of summation order."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = (
        supp.join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    val = (
        li.join(asia_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
                ).cast("bigint")
            ).alias("v_cents")
        )
    )
    threshold = val.agg((F.lit(1.5) * F.avg("v_cents")).alias("thr"))
    return (
        val.join(broadcast(threshold))
        .filter(F.col("v_cents") > F.col("thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("v_cents") / 100.0, 2).alias("part_value"),
        )
    )


# ------------------------------------------------------------ TPC-H Q12
@register(
    "q12_late_lines",
    survey_ref="§2.7,§2.6,P5",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate > o_orderdate + INTERVAL 180 DAY
GROUP BY l_linestatus
""",
)
def q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (ship mode stood in by l_linestatus; commit/receipt
    lateness stood in by >180-day ship lag vs order date): priority mix
    of late lines per status. The lateness predicate spans both join
    sides so it evaluates post-join; the conditional counts are
    map-side partial aggregates after the single orders⋈lineitem
    shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 180 DAY"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ------------------------------------------------------------ TPC-H Q16
@register(
    "q16_supplier_cnt",
    survey_ref="§2.7,§2.6",
    oracle="""
SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 4 = 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (partsupp stood in by lineitem pairs; the complaint
    exclusion — fixtures carry no s_comment — by a deterministic key
    predicate): distinct-supplier counts per (brand, type, size). NOT
    IN compiles to a broadcast left-anti join (the excluded set is
    provably non-null here, sidestepping NOT IN's three-valued-logic
    null trap); COUNT(DISTINCT) expands to a two-phase distinct
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 4 == 0)
        .select("s_suppkey")
    )
    return (
        li.join(excluded, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ------------------------------------------------------------ TPC-H Q20
@register(
    "q20_potential_promotion",
    survey_ref="§2.7,§2.6",
    oracle="""
SELECT s_name, s_acctbal FROM supplier
WHERE s_suppkey IN (
  SELECT y95.l_suppkey FROM
    (SELECT l_partkey, l_suppkey, SUM(l_quantity) AS q95 FROM lineitem
     WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
       AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00' GROUP BY 1, 2) y95,
    (SELECT l_partkey, l_suppkey, SUM(l_quantity) AS q96 FROM lineitem
     WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' GROUP BY 1, 2) y96
  WHERE y95.l_partkey = y96.l_partkey AND y95.l_suppkey = y96.l_suppkey
    AND y95.q95 > 0.5 * y96.q96
    AND y95.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
)
""",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (availqty stood in by 1995 shipped quantity per
    (part, supplier), compared against half the 1996 demand): suppliers
    overstocked on widget parts. The nested IN subqueries become
    left-semi joins — part prefilter semi-joins the aggregate, the
    qualifying supplier keys semi-join supplier. Both year slices
    aggregate on the same (l_partkey, l_suppkey) key, so AQE can plan
    their equi-join without a further repartition."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    widget = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%")).select(
        "p_partkey"
    )

    def year_slice(lo: str, hi: str, out: str) -> DataFrame:
        return (
            li.filter(
                (F.col("l_shipdate") >= F.to_timestamp(F.lit(lo)))
                & (F.col("l_shipdate") < F.to_timestamp(F.lit(hi)))
            )
            .groupBy("l_partkey", "l_suppkey")
            .agg(F.sum("l_quantity").alias(out))
        )

    y95 = year_slice("1995-01-01 00:00:00", "1996-01-01 00:00:00", "q95")
    y96 = year_slice("1996-01-01 00:00:00", "1997-01-01 00:00:00", "q96")
    qualifying = (
        y95.join(y96, ["l_partkey", "l_suppkey"])
        .filter(F.col("q95") > 0.5 * F.col("q96"))
        .join(widget, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select("l_suppkey")
    )
    return supp.join(
        qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_name", "s_acctbal")


# ------------------------------------------------------------ TPC-H Q21
@register(
    "q21_waiting_suppliers",
    survey_ref="§2.7,§2.6",
    oracle="""
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F' AND s_nationkey = n_nationkey
  AND l1.l_shipdate > o_orderdate + INTERVAL 180 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 180 DAY)
GROUP BY s_name
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (receipt-vs-commit lateness stood in by >180-day ship
    lag vs order date): suppliers who alone held up multi-supplier
    finalized orders. Instead of correlated EXISTS/NOT EXISTS
    self-joins, one pass aggregates lineitem to (order, supplier)
    grain — late-line counts — then to order grain — supplier count and
    sole-late-supplier count; a supplier's late lines qualify iff the
    order has >1 supplier and exactly 1 late one. Two aggregations
    share the l_orderkey clustering; at 100 TB this replaces three
    lineitem shuffles (l1⋈l2⋈l3) with one."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    lines = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).withColumn(
        "late",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 180 DAY")).cast("int"),
    )
    per_order_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum("late").alias("n_late_lines"), F.max("late").alias("any_late")
    )
    per_order = per_order_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("any_late").alias("n_late_supp")
    )
    blamed = (
        per_order_supp.filter(F.col("any_late") == 1)
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        blamed.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
    )
