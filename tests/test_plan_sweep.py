"""Corpus-wide plan-hygiene sweep: no query may plan a cartesian
product or a row-at-a-time Python eval, ever — the two silent
scale-killers. Queries with plan-time side effects (streaming drains,
sink round-trips) are exercised by their own dedicated tests instead."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from high_energy_gamma_ray_search_in_kascade_array_data_spark.plans import (
    fact_scale_exchange_violations,
    physical_plan,
    simple_plan,
)
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
_DEDUP_QUERIES = [
    n
    for n in _NAMES
    if "minhash" in n or "simhash" in n or "neardup" in n or n.startswith("substring_")
]


@pytest.mark.parametrize("name", _DEDUP_QUERIES)
def test_dedup_plans_have_no_single_partition_stage(name, spark, sf_dir):
    plan = physical_plan(_C[name].fn(spark, sf_dir))
    assert "SinglePartition" not in plan, f"{name} funnels through one partition"


# Fact-scale sort funnels (r5 verdict): an Exchange SinglePartition or
# a hash exchange keyed ONLY by low-cardinality columns over RAW fact
# rows is a plan that dies at 100 TB — 3 return flags means each
# reducer sorts ⅓ of lineitem. The audit allows such exchanges only
# above an aggregation/limit/local-prune (which bounds the exchanged
# rows by key cardinality, the property the two-phase rewrites of
# weighted_median_price / quantile_bucketize / window_ntile restore).
@pytest.mark.parametrize("name", _NAMES)
def test_no_fact_scale_sort_funnel(name, spark, sf_dir):
    violations = fact_scale_exchange_violations(
        simple_plan(_C[name].fn(spark, sf_dir))
    )
    assert not violations, f"{name} funnels raw fact rows: {violations}"


def test_fact_scale_audit_catches_naive_forms(spark, sf_dir):
    """The audit must FLAG the exact hazards the r6 rewrites removed —
    otherwise the corpus sweep above proves nothing."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    naive_ntile = c.select(
        "c_acctbal",
        F.ntile(4).over(Window.orderBy("c_acctbal", "c_custkey")).alias("q"),
    )
    assert fact_scale_exchange_violations(simple_plan(naive_ntile))

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    naive_cumsum = li.select(
        "l_returnflag",
        F.sum("l_quantity")
        .over(
            Window.partitionBy("l_returnflag")
            .orderBy("l_extendedprice")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("c"),
    )
    assert fact_scale_exchange_violations(simple_plan(naive_cumsum))
