"""Corpus-wide plan-hygiene sweep: no query may plan a cartesian
product or a row-at-a-time Python eval, ever — the two silent
scale-killers. Queries with plan-time side effects (streaming drains,
sink round-trips) are exercised by their own dedicated tests instead."""

from __future__ import annotations

import pytest

from high_energy_gamma_ray_search_in_kascade_array_data_spark.plans import physical_plan
from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import corpus

_C = corpus()

# plan construction itself drains a stream / writes a sink for these
_SIDE_EFFECT_PREFIXES = ("stream_", "npz_legacy", "partitioned_split", "ivf_partitioned")

# the UDTF is the documented row-at-a-time API demonstration
_ROW_PYTHON_ALLOWED = {"udtf_chunk_documents"}

# MLlib's recommendForAllUsers IS a deliberate blocked cross product:
# all-pairs (user-block × item-block) scoring over the small FACTOR
# matrices (rank-4 rows, not input rows) is the algorithm for global
# top-k recommendation — the sweep exists to catch accidental
# cartesians over base relations, which this is not.
_CARTESIAN_ALLOWED = {"mllib_als_recommend"}

_NAMES = [
    n
    for n in sorted(_C)
    if not n.startswith(_SIDE_EFFECT_PREFIXES)
]


@pytest.mark.parametrize("name", _NAMES)
def test_no_cartesian_no_row_python(name, spark, sf_dir):
    plan = physical_plan(_C[name].fn(spark, sf_dir))
    if name not in _CARTESIAN_ALLOWED:
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in _ROW_PYTHON_ALLOWED:
        assert "BatchEvalPython" not in plan, f"{name} plans row-at-a-time Python"


# Dedup runs over the corpus-scale documents table: no stage may
# funnel through one partition (r1's token_vocab global window planned
# an Exchange SinglePartition — the dictionary sorted on one task).
_DEDUP_QUERIES = [n for n in _NAMES if "minhash" in n or "simhash" in n or "neardup" in n]


@pytest.mark.parametrize("name", _DEDUP_QUERIES)
def test_dedup_plans_have_no_single_partition_stage(name, spark, sf_dir):
    plan = physical_plan(_C[name].fn(spark, sf_dir))
    assert "SinglePartition" not in plan, f"{name} funnels through one partition"
