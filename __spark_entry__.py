"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship survival-curve query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full oracle-checked corpus
from the engine's registry (one entry per implemented operator from
SURVEY.md §2).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import (  # noqa: E402
    oracle_queries,
    spark_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fns = spark_queries()
    return fns["survival_curve"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible corpus query."""
    return oracle_queries()
