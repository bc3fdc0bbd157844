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


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship the bigdata06_spark package to executors (addPyFile zip).

    Functions used in mapInPandas/pandas_udf stages are pickled by
    REFERENCE to their module; workers must be able to import it even
    when the driver process was launched from another cwd. Idempotent;
    cheap (one small zip)."""
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_base = os.path.join(tempfile.gettempdir(), "bigdata06_spark_pkg")
    zip_path = zip_base + ".zip"
    if not os.path.exists(zip_path):
        staging = os.path.join(tempfile.gettempdir(), "bigdata06_spark_staging")
        target = os.path.join(staging, "bigdata06_spark")
        if os.path.exists(staging):
            shutil.rmtree(staging)
        shutil.copytree(pkg_dir, target, ignore=shutil.ignore_patterns("__pycache__"))
        shutil.make_archive(zip_base, "zip", staging)
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:  # noqa: BLE001 — already added in this context
        pass


def get_spark(app_name: str = "bigdata06_spark", cores: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Local mode is a single JVM; on a cluster the same configs apply with
    `master` supplied by the environment (spark-submit / k8s). Nothing in
    the engine assumes local mode. `extra_conf` lets tooling override
    session-build configs (e.g. tools/shuffle_audit.py re-enables the
    UI its REST metrics come from) — only effective for the FIRST
    builder in the JVM, like every static conf.
    """
    n = cores or default_parallelism()

    # Vendored-protobuf shim (compat.py): the transformWithState
    # protobuf is imported by every kind of Python process Spark
    # spawns (task workers, the state-schema-validation runner), so
    # the vendor dir must be on PYTHONPATH before the JVM starts —
    # child processes inherit the JVM's environment in local mode
    # (executorEnv carries it on a cluster). No-op when the
    # environment ships its own protobuf.
    from bigdata06_spark.compat import (
        VENDOR_DIR,
        ensure_protobuf,
        using_vendored_protobuf,
    )

    protobuf_ok = ensure_protobuf()
    py_path = os.environ.get("PYTHONPATH", "")
    if protobuf_ok and using_vendored_protobuf():
        # only when the VENDORED runtime is the one in play: workers in
        # an environment with a real protobuf must resolve that one,
        # not be shadowed by the older vendored copy
        if VENDOR_DIR not in py_path.split(os.pathsep):
            py_path = f"{VENDOR_DIR}{os.pathsep}{py_path}" if py_path else VENDOR_DIR
        os.environ["PYTHONPATH"] = py_path

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(n, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # custom Python data sources (sources/spotify_datasource.py)
        # implement pushFilters; the capability ships disabled
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # events.parquet stores TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long and convert in catalog.load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # streaming micro-batches in tests read small files; keep state store local
        .config("spark.sql.streaming.schemaInference", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if protobuf_ok and using_vendored_protobuf():
        builder = builder.config("spark.executorEnv.PYTHONPATH", py_path).config(
            "spark.executorEnv.TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK",
            os.environ.get("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", ""),
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    if not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        builder = builder.master(f"local[{n}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
