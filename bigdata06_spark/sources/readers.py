"""File readers with explicit schemas (SURVEY.md §2.B "Scans").

The reference's only schema story is pandas dtype inference
(`pd.DataFrame(...)` — Spotify_API.py:88); the engine requires a
declared StructType on every non-parquet read (inference costs an
extra pass and produces unstable types), and parquet reads get their
schema from the file footer with Catalyst pruning/pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType, header: bool = True) -> DataFrame:
    """CSV scan, schema mandatory (never inferSchema — it double-reads
    and guesses). Malformed rows surface as nulls (PERMISSIVE) so bad
    records don't kill a 100 TB job; switch to FAILFAST in tests."""
    return spark.read.options(header=header, mode="PERMISSIVE").schema(schema).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines scan with declared schema — nested structs/arrays land
    typed, ready for the flatten helpers (functions/flatten.py)."""
    return spark.read.schema(schema).json(path)
