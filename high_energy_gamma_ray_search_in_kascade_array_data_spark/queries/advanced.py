"""Advanced operator corpus: the pandas GROUPED_AGG UDAF seam, the
grouped-map applyInPandas seam, and IVF coarse assignment — each
oracle-checked."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from high_energy_gamma_ray_search_in_kascade_array_data_spark.queries.common import SHOWER_CTE, shower_frame
from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import register
from high_energy_gamma_ray_search_in_kascade_array_data_spark.sources.catalog import load_table


@register(
    "pandas_udaf_median",
    survey_ref="§2.12",
    oracle=f"""
WITH {SHOWER_CTE}
SELECT label, ROUND(MEDIAN(p), 6) AS median_p,
       ROUND(MEDIAN(lg_e), 6) AS median_lg_e
FROM shower GROUP BY label
""",
)
def q_pandas_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate through the GROUPED_AGG pandas_udf seam
    (np.median — interpolated like SQL MEDIAN). The partial-agg
    shuffle still applies: only group columns move. This is the UDAF
    surface the reference has no analogue for (SURVEY §2.12 note)."""
    import numpy as np

    @F.pandas_udf(DoubleType())
    def median_udaf(v: pd.Series) -> float:
        return float(np.median(v.to_numpy()))

    df = shower_frame(spark, sf_dir)
    return df.groupBy("label").agg(
        F.round(median_udaf("p"), 6).alias("median_p"),
        F.round(median_udaf("lg_e"), 6).alias("median_lg_e"),
    )


@register(
    "apply_in_pandas_sessionize",
    survey_ref="§2.12,§2.8",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '30 minutes'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts) AS session_id
  FROM ordered
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, session_id
""",
)
def q_apply_in_pandas_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-valued per-group transform through applyInPandas (grouped
    map): each user's events arrive as ONE pandas frame, sessionized
    imperatively (gap > 30 min), returning a different shape than the
    input — the UDTF-style seam for logic that doesn't decompose into
    window expressions. Shuffles once on the group key."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")

    def sessionize(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        gap = pdf["ts"].diff().dt.total_seconds() > 1800
        session_id = gap.cumsum().astype("int64") + 1
        out = (
            pdf.assign(session_id=session_id)
            .groupby("session_id", as_index=False)
            .agg(user_id=("user_id", "first"), n_events=("ts", "size"))
        )
        return out[["user_id", "session_id", "n_events"]]

    return ev.groupBy("user_id").applyInPandas(
        sessionize, "user_id long, session_id long, n_events long"
    )


@register(
    "ivf_assign_cells",
    survey_ref="M5:similarity",
    oracle="""
WITH exploded AS (
  SELECT label, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
cent AS (
  SELECT label AS cell, list(c ORDER BY pos) AS cvec
  FROM (SELECT label, pos, AVG(x) AS c FROM exploded GROUP BY label, pos) t
  GROUP BY label
),
scored AS (
  SELECT e.vec_id, c.cell,
         list_sum(list_transform(range(1, 65),
                  i -> CAST(e.embedding[i] AS DOUBLE) * c.cvec[i]))
           / (SQRT(list_sum(list_transform(e.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
              * SQRT(list_sum(list_transform(c.cvec, v -> v * v)))) AS cos
  FROM embeddings e, cent c
),
best AS (
  SELECT vec_id, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
  FROM scored
)
SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_assigned
FROM best WHERE rn = 1 GROUP BY cell
""",
)
def q_ivf_assign_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid (cells = per-label means here; k-means centroids slot in
    identically). The centroid table is tiny and broadcast; the argmin
    is a per-vector window over n_cells rows. At scale the assigned
    cell becomes the partition key ANN probes prune on."""
    e = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    exploded = e.select("label", F.posexplode(as_double).alias("pos", "x"))
    cent = (
        exploded.groupBy("label", "pos")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("cvec")
        )
        .select(F.col("label").alias("cell"), "cvec")
    )
    dot = F.aggregate(
        F.zip_with(as_double, F.col("cvec"), lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    n_e = F.sqrt(F.aggregate(F.transform(as_double, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    n_c = F.sqrt(F.aggregate(F.transform(F.col("cvec"), lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    scored = e.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cell", (dot / (n_e * n_c)).alias("cos")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cell"))
    best = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return best.groupBy("cell").agg(F.count(F.lit(1)).alias("n_assigned"))
