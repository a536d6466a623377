"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference repo
``OlegShchegolev/High_Energy_Gamma_Ray_Search_in_KASCADE_array_data``.

The reference is an eager NumPy/PyTorch pipeline for gamma/proton
separation in KASCADE air-shower data (see SURVEY.md). This package
re-expresses every operation it performs — plus the relational,
streaming and LLM-data-pipeline surface the driver grades — as lazy
Spark DataFrame plans so Catalyst/Tungsten pick the physical strategy.

Layout:
  session     — tuned SparkSession builder
  sources/    — parquet catalog, legacy NPZ/NPY ingest, sinks
  functions/  — scalar column-expression libraries (physics, text, vectors)
  operators/  — composite DataFrame operators (survival curve, split,
                rotation, scalers, dedup, similarity, sessionize, ...)
  ml/         — MLlib + pandas_udf inference surface
  streaming/  — Structured Streaming readings of the batch operators
  queries     — the oracle-checked corpus registry (driver contract)
"""

from high_energy_gamma_ray_search_in_kascade_array_data_spark.session import get_spark

__all__ = ["get_spark"]
