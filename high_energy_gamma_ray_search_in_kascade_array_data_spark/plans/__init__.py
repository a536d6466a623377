"""Physical-plan auditing (SURVEY §4): helpers that make the
plan-shape properties this engine relies on at 100 TB — predicate
pushdown, broadcast joins, map-side partial aggregation, no cartesian
products — assertable in tests instead of hoped-for."""

from high_energy_gamma_ray_search_in_kascade_array_data_spark.plans.audit import (
    assert_broadcast_hash_join,
    assert_no_cartesian_product,
    assert_partial_aggregation,
    assert_pushed_filters,
    fact_scale_exchange_violations,
    physical_plan,
    simple_plan,
)

__all__ = [
    "assert_broadcast_hash_join",
    "assert_no_cartesian_product",
    "assert_partial_aggregation",
    "assert_pushed_filters",
    "fact_scale_exchange_violations",
    "physical_plan",
    "simple_plan",
]
