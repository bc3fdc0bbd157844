"""Streaming CHANGE-DATA-FEED source for the lakehouse table format:
`spark.readStream.format("lakehouse_cdf")` — the Delta-streaming-source
design (each micro-batch = the rows of data files ADDED by the table
versions committed since the last checkpointed offset), closing the
loop with `streaming/sinks.foreach_batch_lakehouse_merge` (which
STREAMS INTO a table): a lakehouse table is now both a streaming sink
and a streaming source, so tables chain into incremental pipelines.

Offset design: `{"version": N}` — the last table version fully
emitted. Monotone by construction (the log's version counter), so
restart/replay semantics are exact: `read` advances to
`current_version()`, `readBetweenOffsets` re-emits precisely the
versions of a replayed batch, and a committed offset is never
re-emitted. Each row carries `_commit_version` (the version that
added it), the streaming analogue of the CDF read
(`lakehouse.read_changes`).

Driver-side file I/O only: the simple stream reader runs on the
driver and decodes the added parquet files with pyarrow — correct for
the source-of-truth semantics (the log IS driver-visible state); the
heavy lifting (the downstream query) is normal distributed Spark.
Schema comes from the LATEST version's files plus logged schema_adds,
so evolved columns surface as typed NULLs for pre-evolution files.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql import types as T

from bigdata06_spark import lakehouse as LH

_ARROW_TO_SPARK = {
    "int64": T.LongType(),
    "int32": T.IntegerType(),
    "int16": T.ShortType(),
    "int8": T.ByteType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "string": T.StringType(),
    "large_string": T.StringType(),
    "bool": T.BooleanType(),
    "date32[day]": T.DateType(),
    "binary": T.BinaryType(),
    "large_binary": T.BinaryType(),
}


def _arrow_field_to_spark(field) -> T.DataType:
    name = str(field.type)
    if name in _ARROW_TO_SPARK:
        return _ARROW_TO_SPARK[name]
    if name.startswith("timestamp"):
        return T.TimestampType()
    if name.startswith("decimal"):
        import re

        m = re.match(r"decimal\d*\((\d+),\s*(\d+)\)", name)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
    raise ValueError(f"lakehouse_cdf: no Spark mapping for arrow type {name}")


def table_stream_schema(path: str) -> T.StructType:
    """Schema of the CDF stream: latest version's parquet schema +
    any logged schema_adds + the `_commit_version` lineage column."""
    latest = LH.current_version(path)
    if latest < 0:
        raise ValueError(f"no lakehouse table at {path}")
    files = LH.files_at_version(path, latest)
    sch = pq.read_schema(os.path.join(path, files[0]))
    fields = [
        T.StructField(f.name, _arrow_field_to_spark(f), True) for f in sch
    ]
    names = {f.name for f in fields}
    for col, typ in LH._schema_adds_at(path, latest):
        if col not in names:
            fields.append(
                T.StructField(col, T.StructType.fromDDL(f"x {typ}")["x"].dataType, True)
            )
            names.add(col)
    fields.append(T.StructField("_commit_version", T.LongType(), False))
    return T.StructType(fields)


class LakehouseCDFStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options, schema: T.StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("lakehouse_cdf requires a path option")
        start = options.get("startingversion", options.get("startingVersion", "0"))
        # offset semantics: "last version fully emitted"; starting at
        # version V means V is the FIRST emitted → initial = V-1
        self.first_version = int(start)
        self.spark_schema = schema

    def initialOffset(self) -> dict:
        return {"version": self.first_version - 1}

    def _added_files(self, v: int) -> list[str]:
        now = set(LH.files_at_version(self.path, v))
        if v == 0:
            return sorted(now)
        before = set(LH.files_at_version(self.path, v - 1))
        return sorted(now - before)

    def _rows_for_versions(self, lo: int, hi: int) -> list[tuple]:
        # a LIST, not a generator: Spark's prefetch cache copy.copy()s
        # the returned iterator for replay, which only list/tuple
        # iterators support
        cols = [f.name for f in self.spark_schema.fields[:-1]]
        rows: list[tuple] = []
        for v in range(lo, hi + 1):
            for rel in self._added_files(v):
                tbl = pq.read_table(os.path.join(self.path, rel))
                for rec in tbl.to_pylist():
                    rows.append(tuple(rec.get(c) for c in cols) + (v,))
        return rows

    def read(self, start: dict):
        latest = LH.current_version(self.path)
        if latest <= start["version"]:
            return iter([]), start
        lo = start["version"] + 1
        return iter(self._rows_for_versions(lo, latest)), {"version": latest}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows_for_versions(start["version"] + 1, end["version"]))


class LakehouseCDFDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "lakehouse_cdf"

    def schema(self):
        return table_stream_schema(self.options.get("path"))

    def simpleStreamReader(self, schema):
        return LakehouseCDFStreamReader(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(LakehouseCDFDataSource)
