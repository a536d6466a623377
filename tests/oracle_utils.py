"""Local mirror of the driver's DuckDB oracle-differential check:
row count + column names + order-insensitive value comparison, with a
small float tolerance so a genuine semantic mismatch is distinguishable
from last-ulp noise (the committed queries additionally round so the
driver's exact hash matches too)."""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd

from high_energy_gamma_ray_search_in_kascade_array_data_spark.sources.catalog import TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = df[c].dtype
        if pd.api.types.is_float_dtype(dt):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(dt):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(dt):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    sort_cols = list(df.columns)
    return df.sort_values(sort_cols, na_position="last").reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns: spark={s_cols} oracle={o_cols}")
        return problems
    if problems:
        return problems
    s, o = _normalize(spark_pdf), _normalize(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv.dtype) and pd.api.types.is_float_dtype(ov.dtype):
            both_nan = sv.isna() & ov.isna()
            close = np.isclose(sv.fillna(0), ov.fillna(0), rtol=1e-9, atol=1e-12) | both_nan
            if not bool(close.all()):
                idx = int(np.argmin(close.values))
                problems.append(
                    f"col {c}: first float mismatch at sorted row {idx}: "
                    f"spark={sv.iloc[idx]!r} oracle={ov.iloc[idx]!r}"
                )
        else:
            eq = (sv == ov) | (sv.isna() & ov.isna())
            if not bool(eq.all()):
                idx = int(np.argmin(eq.values))
                problems.append(
                    f"col {c}: first mismatch at sorted row {idx}: "
                    f"spark={sv.iloc[idx]!r} oracle={ov.iloc[idx]!r}"
                )
    return problems


def exact_hashable(spark_pdf: pd.DataFrame) -> bool:
    """True if every float column survives a round-trip through a
    12-significant-digit string — a proxy for hash stability."""
    for c in spark_pdf.columns:
        if pd.api.types.is_float_dtype(spark_pdf[c].dtype):
            v = spark_pdf[c].dropna()
            if not np.allclose(v, [float(f"{x:.12g}") for x in v], rtol=0, atol=0):
                return False
    return True


def checks_queries(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, list[str]]:
    """Run every corpus query against its oracle; return {name: problems}."""
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus

    con = duckdb_con(sf_dir)
    results: dict[str, list[str]] = {}
    for name, q in sorted(corpus().items()):
        if names and name not in names:
            continue
        try:
            spark_pdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            results[name] = [f"spark error: {e}"]
            continue
        if q.oracle is None:
            results[name] = [] if len(spark_pdf) >= 0 else ["no rows"]
            continue
        try:
            oracle_pdf = con.execute(q.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            results[name] = [f"oracle error: {e}"]
            continue
        results[name] = compare_frames(spark_pdf, oracle_pdf)
    return results
