"""Oracle-checked corpus modules — importing this package registers
every query into the registry (see ``registry.py``)."""

from high_energy_gamma_ray_search_in_kascade_array_data_spark.queries import (  # noqa: F401
    advanced,
    analytics_ext,
    approx_ops,
    dedup,
    kascade,
    linalg,
    ml,
    ml_data,
    pipelines,
    recursive,
    relational,
    relational_ext,
    scale_ops,
    sources_multimodal,
    streaming_queries,
    text,
    tpch_ext,
    vectors,
)
