"""Oracle-differential tests: every registered corpus query must match
its DuckDB twin (rows + columns + values) — the local mirror of the
driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus
from tests.oracle_utils import compare_frames, duckdb_con, exact_hash_problems

_CORPUS = corpus()


@pytest.fixture(scope="session")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(_CORPUS))
def test_query_matches_oracle(name, spark, sf_dir, con):
    q = _CORPUS[name]
    sdf = q.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if q.oracle is None:
        # rows-only check (non-SQL-expressible operator)
        assert spark_pdf is not None
        return
    oracle_pdf = con.execute(q.oracle).fetchdf()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: {problems}"
    # driver-grade gate: exact order-insensitive stringified values,
    # 1-ulp and signed-zero sensitive (mirrors the driver's value hash)
    hash_problems = exact_hash_problems(spark_pdf, oracle_pdf)
    assert not hash_problems, f"{name}: {hash_problems}"
    assert len(spark_pdf) > 0, f"{name}: empty result — weak test, widen the filter"
