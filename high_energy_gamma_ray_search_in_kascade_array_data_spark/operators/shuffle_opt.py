"""Shuffle-elimination and skew-mitigation operators (SCALE.md ground
rules made executable).

  * :func:`write_bucketed` / :func:`bucketed_join` — co-located joins:
    both sides pre-bucketed on the join key hash means the sort-merge
    join needs NO exchange at query time. At 100 TB this is the
    difference between re-shuffling 100 TB per join and reading
    co-partitioned buckets.
  * :func:`salted_groupby_agg` — two-phase aggregation for skewed
    keys: phase 1 aggregates on (key, salt) spreading a hot key over
    ``n_salts`` reducers, phase 2 combines the per-salt partials.
    Correct for any algebraic aggregate (sum/count/min/max here).

AQE's skew-join splitting handles *join*-side skew automatically
(enabled in session.py); salting is for aggregation hot keys, which
AQE does not rebalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8, sort_col: str | None = None
) -> None:
    """Persist as a bucketed table (catalog write — bucketing metadata
    lives in the table catalog, not plain parquet files)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a stale warehouse dir from a previous session's metastore blocks
    # CREATE even with overwrite — clear it
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two co-bucketed tables: Catalyst sees matching bucket specs
    and plans the join without an Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on)


def _row_salt(df: DataFrame, n_salts: int, salt_src: str | None):
    """Deterministic per-row salt in [0, n_salts).

    ``salt_src`` names a stable (ideally unique) column to salt on —
    REQUIRED for full effectiveness when rows can be exact duplicates:
    a content hash gives identical rows identical salts, so a hot key
    made entirely of duplicate rows would still funnel into one phase-1
    reducer (results stay correct; only the spreading degrades).

    The default hashes full row content, skipping MapType columns
    (hash expressions reject maps — SPARK-27619: map equality is
    order-insensitive, so no stable hash exists)."""
    if salt_src is not None:
        return F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts))
    hashable = [f.name for f in df.schema.fields if "map<" not in f.dataType.simpleString()]
    if not hashable:
        raise ValueError("no hashable columns to salt on; pass salt_src")
    return F.pmod(F.xxhash64(F.struct(*hashable)), F.lit(n_salts))


def salted_groupby_agg(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_salts: int = 16,
    salt_src: str | None = None,
) -> DataFrame:
    """sum/count per key via salted two-phase aggregation.

    Equivalent to ``df.groupBy(key).agg(sum, count)`` but a key holding
    50% of all rows spreads across ``n_salts`` phase-1 reducers instead
    of melting one. Phase 2 runs on ≤ n_keys × n_salts rows.

    The salt must be deterministic per row: a nondeterministic component
    (rand(), spark_partition_id()) feeding a shuffle key means a stage
    retry after a fetch failure can route rows differently than the
    original attempt and duplicate/lose them (SPARK-23207 class). So the
    salt is a content hash by default — same bits in, same reducer out,
    every attempt — with the duplicate-row caveat in :func:`_row_salt`:
    pass ``salt_src`` (a unique-id column) when hot keys can consist of
    exact-duplicate rows, or the spreading silently degrades.
    """
    phase1 = (
        df.withColumn("_salt", _row_salt(df, n_salts, salt_src))
        .groupBy(key_col, "_salt")
        .agg(F.sum(value_col).alias("_s"), F.count(F.lit(1)).alias("_n"))
    )
    return (
        phase1.groupBy(key_col)
        .agg(F.sum("_s").alias(f"sum_{value_col}"), F.sum("_n").alias("n"))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_src: str | None = None,
) -> DataFrame:
    """Skew-mitigated equi-join: the big side gets a deterministic salt
    (``salt_src`` column hashed into [0, n_salts)), the small side is
    replicated once per salt value, and the join runs on (key, salt) —
    a hot key's rows spread over ``n_salts`` reducers instead of one.

    The manual fallback for joins AQE cannot rebalance (stream–static
    joins, or a hot key so large that even a split partition spills).
    Cost: the small side shuffles/broadcasts n_salts× — acceptable by
    definition, that side is small. Result is salt-invariant: exactly
    the plain join's rows.

    Salt determinism matters here for the same SPARK-23207 reason as in
    :func:`salted_groupby_agg`: the default hashes full row content
    (MapType columns excluded — see :func:`_row_salt`), so every task
    attempt produces identical shuffle output. Pass ``salt_src`` (a
    unique-id column) when the big side can carry exact-duplicate rows,
    which a content hash would co-locate."""
    big_salted = big.withColumn("_salt", _row_salt(big, n_salts, salt_src).cast("int"))
    small_salted = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return big_salted.join(small_salted, [key, "_salt"]).drop("_salt")
