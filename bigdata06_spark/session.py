"""SparkSession factory.

One place to encode the engine's execution-model choices so every entry
point (driver contract, tests, bench) runs with the same plan-shaping
configuration:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  broadcast-join demotion/promotion from runtime stats) — the main lever
  that makes one static plan survive a 100x scale-up.
- Arrow on for every pandas interchange path (Pandas UDFs,
  `applyInPandas`, `mapInPandas`, `toPandas`).
- `spark.sql.shuffle.partitions` sized to cores for local runs; on a
  real cluster this (or rather AQE's advisory partition size) would be
  sized so a shuffle partition is ~128-200MB.
- Session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle (naive-UTC) bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 4)


def get_spark(app_name: str = "bigdata06_spark", cores: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Local mode is a single JVM; on a cluster the same configs apply with
    `master` supplied by the environment (spark-submit / k8s). Nothing in
    the engine assumes local mode.
    """
    n = cores or default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(n, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet stores TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long and convert in catalog.load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # streaming micro-batches in tests read small files; keep state store local
        .config("spark.sql.streaming.schemaInference", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        builder = builder.master(f"local[{n}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
