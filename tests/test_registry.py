"""Registry hygiene: every oracle must be valid DuckDB SQL against the
fixture catalog. EXPLAIN-only (no execution), so the whole corpus
validates in seconds — the fast guard that catches an oracle typo at
commit time instead of 15 minutes into a full differential sweep.
No SparkSession needed."""

from __future__ import annotations

import pytest

from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus
from tests.oracle_utils import duckdb_con

_C = corpus()
_WITH_ORACLE = sorted(n for n, q in _C.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_con(sf_dir)


def test_every_query_has_oracle_or_documented_exemption():
    missing = [n for n, q in _C.items() if q.oracle is None]
    assert missing == [], f"queries without oracle SQL: {missing}"


def test_every_query_has_survey_ref():
    untagged = [n for n, q in _C.items() if not q.survey_ref.strip()]
    assert untagged == []


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_sql_parses_and_plans(name, con):
    con.execute(f"EXPLAIN {_C[name].oracle}")
