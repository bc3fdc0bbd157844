"""`lakehouse` — the lakehouse table format as a Spark Python
DataSource: `spark.read.format("lakehouse").load(path)`, with
`versionAsOf` / `timestampAsOf` options — the `format("delta")`-style
reader surface, so the table plugs into the DataFrame reader API and
`CREATE TABLE ... USING` SQL without importing the library.

Everything the library reader (`lakehouse.read_version`) resolves on
the JVM scan, this source resolves Arrow-side, one InputPartition per
data file (N-way parallelism, the same granularity Delta's file scan
uses):

- the version's FILE SET from the log (planner-side, no data I/O)
- DELETION VECTORS: each partition carries its file's DV parquet
  list; the task reads the positions with pyarrow and mask-filters by
  row index — the same (file, row_index) subtraction as the JVM path
- SCHEMA-ACTION REPLAY (column mapping): a single file holds ONE
  vintage, so per file the replay is rename-if-present / drop /
  null-fill, then a projection to the table's logical column order

Reference parity note: the reference scripts expose data as plain
pandas frames (01_TestingPy/Spotify_API.py:42-165); this source is
the Spark-native generalization of that "just read it" surface for
the engine's own table format.

Usage:
    from bigdata06_spark.sources.lakehouse_datasource import register
    register(spark)
    spark.read.format("lakehouse").option("versionAsOf", 3).load(path)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from bigdata06_spark import lakehouse as LH


def _arrow_type_of(spark_type: T.DataType):
    from pyspark.sql.pandas.types import to_arrow_type

    return to_arrow_type(spark_type)


_ATOMIC_DDL = {
    "string": T.StringType(), "long": T.LongType(), "bigint": T.LongType(),
    "int": T.IntegerType(), "integer": T.IntegerType(),
    "short": T.ShortType(), "smallint": T.ShortType(),
    "byte": T.ByteType(), "tinyint": T.ByteType(),
    "double": T.DoubleType(), "float": T.FloatType(), "real": T.FloatType(),
    "boolean": T.BooleanType(), "binary": T.BinaryType(),
    "date": T.DateType(), "timestamp": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
}


def _ddl_to_spark(s: str) -> T.DataType:
    """DDL type string → Spark type WITHOUT an active session —
    DataSource planning runs in a session-less Python worker, where
    T._parse_datatype_string is unavailable. Covers the atomic types
    `add_column` records plus decimal(p,s); anything fancier is a
    loud error rather than a silent misread."""
    import re

    k = s.strip().lower()
    if k in _ATOMIC_DDL:
        return _ATOMIC_DDL[k]
    m = re.fullmatch(r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", k)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    raise ValueError(f"unsupported add_column DDL type {s!r} in the "
                     "lakehouse DataSource schema resolver")


def _resolve_version(path: str, options) -> int:
    latest = LH.current_version(path)
    if latest < 0:
        raise ValueError(f"no lakehouse table at {path}")
    v_opt = options.get("versionAsOf")
    ts_opt = options.get("timestampAsOf")
    if v_opt is not None and ts_opt is not None:
        raise ValueError("pass versionAsOf or timestampAsOf, not both")
    if v_opt is not None:
        v = int(v_opt)
        if not (0 <= v <= latest):
            raise ValueError(f"version {v} not in [0, {latest}]")
        return v
    if ts_opt is not None:
        return LH.version_at_timestamp(path, float(ts_opt))
    return latest


def _logical_schema(path: str, version: int,
                    rel_files: list[str]) -> T.StructType:
    """The table's logical Spark schema at `version`: union of the
    files' parquet schemas (first-occurrence field order) with the
    schema-action history replayed, projected to the logical column
    order — the same resolution read_version's mergeSchema + replay
    produces, computed from footers only."""
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_type

    fields: dict[str, T.DataType] = {}
    order: list[str] = []
    for f in rel_files:
        sch = pq.read_schema(_abs(path, f))
        for name in sch.names:
            if name not in fields:
                fields[name] = from_arrow_type(sch.field(name).type)
                order.append(name)
    actions = LH._schema_actions_at(path, version)
    for a in actions:
        if a["kind"] == "add":
            if a["column"] not in fields:
                fields[a["column"]] = _ddl_to_spark(a["type"])
                order.append(a["column"])
        elif a["kind"] == "rename":
            o, n = a["from"], a["to"]
            if o in fields:
                if n in fields:  # mixed vintages: one logical column
                    del fields[o]
                    order.remove(o)
                else:
                    fields[n] = fields.pop(o)
                    order[order.index(o)] = n
        elif a["kind"] == "drop":
            if a["column"] in fields:
                del fields[a["column"]]
                order.remove(a["column"])
    logical = LH._logical_cols_at(path, version)
    if logical:
        order = [c for c in logical if c in fields] + [
            c for c in order if c not in set(logical)
        ]
    return T.StructType([T.StructField(c, fields[c], True) for c in order])


def _abs(path: str, f: str) -> str:
    return f if os.path.isabs(f) else os.path.join(path, f)


class LakehouseFilePartition(InputPartition):
    def __init__(self, listed_name: str, abs_file: str, dv_files: list[str]):
        self.listed_name = listed_name
        self.abs_file = abs_file
        self.dv_files = dv_files


class LakehouseReader(DataSourceReader):
    def __init__(self, path: str, version: int, schema: T.StructType):
        self.path = path
        self.schema_json = schema.json()
        rel_files, dvs = LH._state_at_version(path, version)
        self._parts = [
            LakehouseFilePartition(
                f, _abs(path, f), [_abs(path, d) for d in dvs.get(f, [])]
            )
            for f in rel_files
        ]
        self.actions = LH._schema_actions_at(path, version)

    def partitions(self):
        return self._parts

    def read(self, partition: LakehouseFilePartition):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = T.StructType.fromJson(json.loads(self.schema_json))
        tbl = pq.read_table(partition.abs_file)

        # deletion vectors: subtract this file's listed positions
        if partition.dv_files:
            dead: set[int] = set()
            for d in partition.dv_files:
                dv = pq.read_table(d, columns=["file", "row_index"])
                mask = pa.compute.equal(dv.column("file"),
                                        pa.scalar(partition.listed_name))
                dead.update(dv.filter(mask).column("row_index").to_pylist())
            if dead:
                keep = np.ones(tbl.num_rows, dtype=bool)
                keep[np.fromiter(dead, dtype=np.int64)] = False
                tbl = tbl.filter(pa.array(keep))

        # schema-action replay (single vintage: rename/drop/ignore)
        for a in self.actions:
            names = tbl.schema.names
            if a["kind"] == "rename" and a["from"] in names:
                tbl = tbl.rename_columns(
                    [a["to"] if c == a["from"] else c for c in names]
                )
            elif a["kind"] == "drop" and a["column"] in names:
                tbl = tbl.drop_columns([a["column"]])

        # project to the logical schema: null-fill missing columns,
        # cast present ones to the declared (merged) type, order
        cols = []
        names = set(tbl.schema.names)
        for field in schema.fields:
            at = _arrow_type_of(field.dataType)
            if field.name in names:
                cols.append(tbl.column(field.name).cast(at))
            else:
                cols.append(pa.nulls(tbl.num_rows, type=at))
        out = pa.table({f.name: c for f, c in zip(schema.fields, cols)})
        yield from out.to_batches(max_chunksize=1 << 16)


class LakehouseDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "lakehouse"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError("format('lakehouse') needs .load(<table path>)")
        return p

    def schema(self) -> T.StructType:
        path = self._path()
        v = _resolve_version(path, self.options)
        rel_files, _dvs = LH._state_at_version(path, v)
        return _logical_schema(path, v, rel_files)

    def reader(self, schema: T.StructType) -> DataSourceReader:
        path = self._path()
        v = _resolve_version(path, self.options)
        return LakehouseReader(path, v, schema)


def register(spark) -> None:
    spark.dataSource.register(LakehouseDataSource)
