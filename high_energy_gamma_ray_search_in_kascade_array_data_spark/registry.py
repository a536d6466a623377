"""Oracle-checked query corpus registry.

Every operator this engine claims (SURVEY.md §2) registers here as a
``(name, spark_fn, oracle_sql)`` triple. ``__spark_entry__.queries()``
/ ``oracle_sql()`` read straight from this registry, as do the local
differential tests and ``bench.py`` — one source of truth.

Cross-engine determinism rules (Spark vs DuckDB) used throughout the
corpus:
  * integer-derived arithmetic (modulo, floor of exact ratios, counts)
    is bit-exact in both engines — no rounding needed;
  * multi-term double aggregations (SUM/AVG over doubles) are
    order-dependent in the last ulp — round to a fixed number of
    decimals IN BOTH implementations; BUT rounding is a per-magnitude
    gamble, not a contract: at ~1e12 sum magnitude the double ulp
    (~1e-4) accumulates past a cent across millions of terms (measured
    at the 100x tier, r11). Money totals therefore sum INTEGER CENTS
    (``SUM(FLOOR(price * 100 + 0.5))``) on both sides — bit-exact at
    any scale;
  * libm transcendentals (sin/cos/sqrt of non-trivial args) may differ
    by 1 ulp between the JVM and C — round those too;
  * DuckDB ``SUM(int)`` returns ``HUGEINT`` — always ``CAST`` oracle
    sums to ``BIGINT``/``DOUBLE`` to match Spark's ``LONG``/``DOUBLE``;
  * alias every computed column identically on both sides (the driver
    sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class CorpusQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    survey_ref: str = ""  # SURVEY.md §2 operator ids this query covers


_REGISTRY: dict[str, CorpusQuery] = {}


def register(name: str, oracle: str | None = None, survey_ref: str = "") -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate corpus query {name!r}")
        _REGISTRY[name] = CorpusQuery(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref)
        return fn

    return deco


def corpus() -> dict[str, CorpusQuery]:
    """All registered queries (importing the corpus modules on demand)."""
    # Import for side effect: each module registers its queries.
    from high_energy_gamma_ray_search_in_kascade_array_data_spark import queries as _corpus_modules  # noqa: F401

    return dict(_REGISTRY)


def spark_queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in corpus().values()}


def oracle_queries() -> dict[str, str]:
    return {q.name: q.oracle for q in corpus().values() if q.oracle is not None}
