"""Local mirror of the driver's DuckDB oracle-differential check.

Two comparison grades:

  * :func:`compare_frames` — row count + column names + order-
    insensitive value comparison with a small float tolerance, so a
    genuine semantic mismatch is distinguishable from last-ulp noise
    (useful error messages while developing a query).
  * :func:`exact_hash_problems` — the driver-grade check: order-
    insensitive comparison of *canonically stringified* values with NO
    tolerance, sensitive to 1-ulp float differences and IEEE signed
    zero. A query that passes this locally hashes identically in the
    driver's CORRECTNESS gate; round 1's ``direction_cosines`` slipped
    through because the local gate only had the tolerant mode
    (VERDICT r1 "What's wrong" #2).
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import numpy as np
import pandas as pd

from high_energy_gamma_ray_search_in_kascade_array_data_spark.sources.catalog import TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Bounded memory + disk spill: DuckDB's default limit (~80% of
    # RAM) let a token-join-heavy oracle balloon to 111 GB RSS at the
    # 10x fixture before the kernel OOM-killed the whole sweep
    # (SCALE.md round-5 record). An engine gets to be slow under
    # pressure, not dead — same discipline Spark's spill gives the
    # other side of the differential.
    # Hard 68 GB cap, spill DISABLED. Three facts force this shape
    # (SCALE.md round-5 record): (1) unbounded, a token-join-heavy
    # oracle ballooned to 111 GB RSS at the 10x fixture and the kernel
    # OOM-killed the sweep; (2) this box has only ~17 GB of free disk,
    # and once a temp_directory exists DuckDB's out-of-core operators
    # partition to disk EAGERLY — well below the memory limit — so
    # "bounded + spill" filled the disk twice; (3) every corpus oracle
    # fits ≤60 GB in-memory at 10x. So: cap RAM, fail fast with a
    # catchable OOM error for anything heavier, never touch disk.
    con.execute("SET memory_limit = '68GB'")
    con.execute("SET temp_directory = ''")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        # The driver fixtures are single files; Spark-written fixtures
        # (e.g. the 10x replicated scale sweep) are DIRECTORIES of
        # part files — glob them so the oracle reads the same rows.
        if os.path.isdir(path):
            path = os.path.join(path, "*.parquet")
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


def _canon_cell(v) -> str:
    """Canonical string for one value: bit-sensitive for floats
    (repr round-trips the exact double, and distinguishes -0.0 from
    0.0), type-tagged so 5 (int) never collides with 5.0 (float)."""
    if v is None:
        return "\x00null"
    if isinstance(v, float):
        if v != v:  # NaN
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, (np.floating,)):
        f = float(v)
        return "f:nan" if f != f else f"f:{f!r}"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, bytes):
        return "x:" + v.hex()
    if isinstance(v, pd.Timestamp):
        return f"t:{v.value}"
    # Spark DateType arrives as datetime.date objects while DuckDB
    # DATE arrives as datetime64 — the driver's hash treats them as
    # equal (q3 passed r1), so canonicalize to midnight timestamps.
    if isinstance(v, datetime.datetime):
        return f"t:{pd.Timestamp(v).value}"
    if isinstance(v, datetime.date):
        return f"t:{pd.Timestamp(v).value}"
    if isinstance(v, (list, np.ndarray, tuple)):
        return "a:[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "m:{" + ",".join(f"{k}={_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return f"s:{v}"


def _canon_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Order-insensitive canonical form: every cell stringified via
    :func:`_canon_cell` (after int→int64 / float→float64 dtype
    normalization so int32-vs-int64 differences don't register as
    value differences — the driver records schema separately), rows
    sorted lexicographically."""
    df = df[sorted(df.columns)]
    cols: list[list[str]] = []
    for c in df.columns:
        s = df[c]
        dt = s.dtype
        if pd.api.types.is_float_dtype(dt):
            vals = s.astype("float64")
            cols.append(["\x00null" if pd.isna(v) else _canon_cell(float(v)) for v in vals])
        elif pd.api.types.is_bool_dtype(dt):
            cols.append([_canon_cell(bool(v)) for v in s])
        elif pd.api.types.is_integer_dtype(dt):
            cols.append([_canon_cell(int(v)) for v in s.astype("int64")])
        elif pd.api.types.is_datetime64_any_dtype(dt):
            ts = pd.to_datetime(s)
            if getattr(ts.dt, "tz", None) is not None:
                ts = ts.dt.tz_localize(None)
            cols.append(["\x00null" if pd.isna(v) else f"t:{v.value}" for v in ts])
        else:
            cols.append(["\x00null" if v is None or v is pd.NA else _canon_cell(v) for v in s])
    return sorted(zip(*cols)) if cols else []


def exact_hash_problems(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Driver-grade exact order-insensitive comparison (see module
    docstring). Returns mismatch descriptions (empty = the driver's
    value hash would match)."""
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        return [f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"]
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return [f"columns: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"]
    s_rows, o_rows = _canon_rows(spark_pdf), _canon_rows(oracle_pdf)
    if s_rows != o_rows:
        n_bad = sum(1 for a, b in zip(s_rows, o_rows) if a != b)
        first = next((i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b)
        problems.append(
            f"exact-hash mismatch: {n_bad}/{len(s_rows)} sorted rows differ; "
            f"first at row {first[0]}: spark={first[1]} oracle={first[2]} "
            f"(cols sorted: {sorted(spark_pdf.columns)})"
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
