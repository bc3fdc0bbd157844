"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over `bigdata06_spark.queries` — the engine's query
registry. `entry` runs the flagship query (SURVEY.md §7 M0) at
sf0.001; `queries()` exposes every implemented operator from
SURVEY.md §2; `oracle_sql()` the DuckDB-equivalent SQL for each
(omitted only for genuinely non-SQL-expressible ops, which fall back
to the driver's rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bigdata06_spark.queries import load_all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q5_revenue_by_nation) on /root/testdata/sf0.001."""
    specs = load_all_queries()
    return specs["q5_revenue_by_nation"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in load_all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in load_all_queries().items()
        if spec.oracle is not None
    }
