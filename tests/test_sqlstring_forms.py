"""SQL-string expression forms must be PLAN-IDENTICAL to the Column
forms they replaced.

Several expression-heavy queries build their per-row expressions as
SQL strings (one selectExpr parse JVM-side) instead of composed Column
objects (hundreds of Py4J round-trips that also serialize across
concurrent streams — the r10 contention finding). The rewrite is a
BUILD-cost optimization only: these tests reconstruct the original
Column form and assert ``optimizedPlan().sameResult`` against the
shipped SQL-string form, so the conversion can never drift the
semantics. Equality is checked on the OPTIMIZED plan because the
analyzed plan still carries unfolded literal casts
(``F.lit(0).cast("bigint")`` vs ``0L``) that constant-folding erases;
after folding the trees are canonically identical, which is the
equality that matters for physical work.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from high_energy_gamma_ray_search_in_kascade_array_data_spark.queries.analytics_ext import _KM_K
from high_energy_gamma_ray_search_in_kascade_array_data_spark.sources.catalog import load_table


def _same_optimized(df_a, df_b) -> bool:
    qa = df_a._jdf.queryExecution().optimizedPlan()
    qb = df_b._jdf.queryExecution().optimizedPlan()
    return qa.sameResult(qb)


def test_kmeans_sql_string_form_plan_identical(spark, sf_dir):
    """The shipped SQL-string assignment frame (VERDICT r10 task 1)
    optimizes to the same plan as the original Column form."""
    e = load_table(spark, sf_dir, "embeddings")
    pts = e.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda v: F.floor(v.cast("double") * 1000 + F.lit(0.5)).cast("bigint"),
        ).alias("x"),
    )
    seeds = pts.orderBy("vec_id").limit(_KM_K).collect()
    cents = [list(r["x"]) for r in seeds]
    cl_ids = list(range(_KM_K))

    # the ORIGINAL Column form (pre-r11), reconstructed verbatim
    def dist_cols(cent_list):
        out = []
        for c in cent_list:
            diff = F.zip_with(
                F.col("x"),
                F.array(*[F.lit(int(v)).cast("bigint") for v in c]),
                lambda a, b: (a - b) * (a - b),
            )
            out.append(F.aggregate(diff, F.lit(0).cast("bigint"), lambda acc, v: acc + v))
        return out

    staged = pts.select("x", F.array(*dist_cols(cents)).alias("ds"))
    labels = F.array(*[F.lit(int(c)).cast("int") for c in cl_ids])
    pos = F.array_position(F.col("ds"), F.array_min("ds"))
    col_form = staged.select(
        "x",
        F.element_at(labels, pos.cast("int")).alias("cl"),
        F.array_min("ds").alias("d2"),
    )

    # the SHIPPED SQL-string form (same template as the query body)
    def dist_sql(c):
        arr = ",".join(f"{int(v)}L" for v in c)
        return (
            f"aggregate(zip_with(x, array({arr}), (a, b) -> (a - b) * (a - b)),"
            f" 0L, (acc, v) -> acc + v)"
        )

    ds = ",".join(dist_sql(c) for c in cents)
    lab = ",".join(str(int(c)) for c in cl_ids)
    sql_form = pts.selectExpr("x", f"array({ds}) AS ds").selectExpr(
        "x",
        f"element_at(array({lab}), cast(array_position(ds, array_min(ds)) as int)) AS cl",
        "array_min(ds) AS d2",
    )

    assert _same_optimized(col_form, sql_form)
    # and the frames agree row-for-row on the fixture
    a = sorted(map(tuple, col_form.drop("x").collect()))
    b = sorted(map(tuple, sql_form.drop("x").collect()))
    assert a == b


def test_bpe_fold_sql_string_plan_identical(spark, sf_dir):
    """_bpe_merge_fold_sql (the hot-loop form bpe_train/encode use)
    optimizes to the same plan as the Column reference fold, including
    for rule symbols carrying SQL-hostile characters."""
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.queries import text as T
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.sources.catalog import load_table

    words = T._bpe_words(spark, load_table(spark, sf_dir, "documents"))
    for a, b in [("t", "h"), ("o'x", "b\\q")]:
        col_form = words.select(T._bpe_merge_fold(F.col("s"), a, b).alias("s"), "w")
        sql_form = words.selectExpr(f"{T._bpe_merge_fold_sql('s', a, b)} AS s", "w")
        assert _same_optimized(col_form, sql_form), (a, b)
    # and rows agree for a real rule
    col_rows = sorted(
        map(tuple, words.select(T._bpe_merge_fold(F.col("s"), "t", "h").alias("s"), "w")
            .selectExpr("concat_ws('|', s) AS j", "w").collect())
    )
    sql_rows = sorted(
        map(tuple, words.selectExpr(f"{T._bpe_merge_fold_sql('s', 't', 'h')} AS s", "w")
            .selectExpr("concat_ws('|', s) AS j", "w").collect())
    )
    assert col_rows == sql_rows


def test_bpe_encode_composed_fold_plan_identical(spark, sf_dir):
    """The composed single-string R-fold (one analysis pass, O(R))
    optimizes to the same plan as R chained selectExpr folds
    (CollapseProject's merge of the chain) and returns the same rows."""
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.queries import text as T
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.sources.catalog import load_table

    words = T._bpe_words(spark, load_table(spark, sf_dir, "documents"))
    rules = [("t", "h"), ("e", "r"), ("th", "er")]

    chained = words.select("s", "w")
    for a, b in rules:
        chained = chained.selectExpr(f"{T._bpe_merge_fold_sql('s', a, b)} AS s", "w")

    expr = "s"
    for a, b in rules:
        expr = T._bpe_merge_fold_sql(expr, a, b)
    composed = words.selectExpr(f"{expr} AS s", "w")

    assert _same_optimized(chained, composed)
    a = sorted(map(tuple, chained.selectExpr("concat_ws('|', s) AS j", "w").collect()))
    b = sorted(map(tuple, composed.selectExpr("concat_ws('|', s) AS j", "w").collect()))
    assert a == b


def test_icos_sql_string_plan_identical(spark, sf_dir):
    """_icos_spark_sql builds the exact _icos_col expression tree
    (same in-order folds and casts — integer-encoded cosine must stay
    bit-stable), JVM-parsed."""
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.queries import vectors as V

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    base = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    for k in (16, 64):
        col_form = base.select(
            "vec_id", V._icos_col(F.col("embedding"), F.col("qe"), k).alias("icos")
        )
        sql_form = base.selectExpr(
            "vec_id", f"{V._icos_spark_sql('embedding', 'qe', k)} AS icos"
        )
        assert _same_optimized(col_form, sql_form), k
    a = sorted(map(tuple, col_form.collect()))
    b = sorted(map(tuple, sql_form.collect()))
    assert a == b
