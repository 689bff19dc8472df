"""Query registry: every operator exposed as a (Spark plan, DuckDB oracle) pair.

The driver's correctness gate runs each Spark query and its oracle SQL
side by side at sf0.01 and compares row count + schema + value hash
(order-insensitive, columns sorted by name). Hence every computed
column is aliased identically on both sides, and all floating-point
aggregation goes through exact decimal arithmetic (or identical
left-associated double chains) so values match bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over pre-registered table views
    headline: bool = False  # included in bench.py
    doc: str = ""
    # True when BUILDING the DataFrame executes real work (e.g. the
    # maintenance censuses stage a table copy, run delete/compact jobs
    # and return a checkpointed end-state scan). Plan-only tooling
    # (tools/explain_audit.py) must skip these: building them both
    # runs the heavy side effects and yields a plan that shows nothing
    # (Scan ExistingRDD over the checkpoint).
    effectful: bool = False


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    headline: bool = False,
    doc: str = "",
    effectful: bool = False,
) -> Callable:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(
            name, fn, oracle, headline, doc, effectful
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules that populate REGISTRY.
    from scio_db_spark.plans import (  # noqa: F401
        corpusops,
        libops,
        mediation,
        mmops,
        relational,
        temporal,
        textops,
        tpch_fill,
        tpch_more,
        vecops,
    )

    return REGISTRY
