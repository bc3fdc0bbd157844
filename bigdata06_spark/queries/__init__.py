"""Query registry — the driver-contract surface.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a `(spark, sf_dir) -> DataFrame` builder plus (where expressible)
the equivalent ANSI SQL the DuckDB oracle runs on the same parquet
tables. `__spark_entry__.py` re-exports this registry.

Conventions (driver hash-compare is exact):
- Alias every computed column identically in Spark and oracle SQL.
- Round every *derived* double (sums/products of doubles) to a fixed
  number of decimals on both sides — float addition is not associative,
  so unrounded parallel sums can differ in the last ulp from DuckDB's
  sequential sums. Stored doubles projected unchanged are bit-exact and
  need no rounding.
- In oracle SQL, CAST integer SUMs to BIGINT (DuckDB widens to HUGEINT,
  Spark to LONG).
- Deterministic output: any ranking/top-k pins total order with a key
  tiebreak.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query builder to the registry."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and return
    the full registry."""
    from bigdata06_spark.queries import (  # noqa: F401
        tpch,
        tpch2,
        tpch3,
        tpch4,
        refparity,
        analytics,
        scalars_q,
        llm,
        curation,
        streaming_q,
        sampling,
        udfs_q,
    )

    return REGISTRY
