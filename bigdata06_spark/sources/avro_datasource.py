"""`avro_py` — Avro read/write as a Spark 4 Python DataSource.

Closes the Avro format hole (VERDICT r2 #7) without the external
`spark-avro` module: the per-task codec is the pure-Python
implementation in `avro_codec.py` (spec-conformant — cross-validated
against the JVM's own Avro library in tests), wrapped in the public
Python DataSource API (pyspark.sql.datasource).

Scale shape: one InputPartition per data file (the same granularity
spark-avro's FileFormat uses for non-splittable codecs), so a
directory of N files reads with N-way parallelism; the writer emits
one container file per Spark partition with a deterministic sync
marker — byte-reproducible output, no RNG. Schema inference opens ONE
file header (metadata block only), never scans data.

File-system note: listing/rename use the local FS API (the Python
DataSource runs Python-side); pointing this at s3://... means swapping
`os` calls for an fsspec filesystem — the partitioning, codec, and
commit protocol are unchanged.

Usage:
    register(spark)
    df.write.format("avro_py").mode("overwrite").save(path)
    spark.read.format("avro_py").load(path)
"""

from __future__ import annotations

import hashlib
import io
import json
import os
from datetime import date, datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql import types as T

from bigdata06_spark.sources import avro_codec as A

_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)
_EPOCH_DATE = date(1970, 1, 1)
_US = timedelta(microseconds=1)


# ------------------------------------------------------- schema mapping


def spark_to_avro(dt: T.DataType, name: str, path: str = "") -> dict | str | list:
    """Spark type → Avro schema node. Nullable wrapping is applied by
    the caller (every Spark field is nullable; union ["null", T])."""
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.TimestampNTZType):
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": _nullable(dt.elementType, dt.containsNull, name, path)}
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise ValueError("Avro maps require string keys")
        return {"type": "map", "values": _nullable(dt.valueType, dt.valueContainsNull, name, path)}
    if isinstance(dt, T.StructType):
        rec_name = f"{path}_{name}" if path else name
        return {
            "type": "record",
            "name": rec_name or "record",
            "fields": [
                {"name": f.name, "type": _nullable(f.dataType, f.nullable, f.name, rec_name)}
                for f in dt.fields
            ],
        }
    raise ValueError(f"no Avro mapping for Spark type {dt.simpleString()}")


def _nullable(dt: T.DataType, nullable: bool, name: str, path: str):
    base = spark_to_avro(dt, name, path)
    return ["null", base] if nullable else base


def avro_to_spark(schema) -> T.DataType:
    schema = A._norm(schema)
    if isinstance(schema, str):
        prim = {
            "null": T.NullType(), "boolean": T.BooleanType(), "int": T.IntegerType(),
            "long": T.LongType(), "float": T.FloatType(), "double": T.DoubleType(),
            "bytes": T.BinaryType(), "string": T.StringType(),
        }
        if schema in prim:
            return prim[schema]
        raise ValueError(f"unsupported Avro type {schema}")
    if isinstance(schema, list):  # union: [null, T] → nullable T
        non_null = [s for s in schema if A._type_name(s) != "null"]
        if len(non_null) != 1:
            raise ValueError("only unions of null with one type map to Spark")
        return avro_to_spark(non_null[0])
    lt = schema.get("logicalType")
    if lt in ("timestamp-micros", "timestamp-millis"):
        # millis files normalize to µs at the codec boundary
        return T.TimestampType()
    if lt in ("local-timestamp-micros", "local-timestamp-millis"):
        return T.TimestampNTZType()
    if lt == "date":
        return T.DateType()
    if lt == "decimal":
        A._decimal_ctx(schema)  # loud-reject malformed backing type
        return T.DecimalType(int(schema.get("precision", 38)), int(schema.get("scale", 0)))
    t = schema["type"]
    if t == "record":
        return T.StructType(
            [
                T.StructField(f["name"], avro_to_spark(f["type"]),
                              _is_nullable(f["type"]))
                for f in schema["fields"]
            ]
        )
    if t == "array":
        return T.ArrayType(avro_to_spark(schema["items"]), _is_nullable(schema["items"]))
    if t == "map":
        return T.MapType(T.StringType(), avro_to_spark(schema["values"]),
                         _is_nullable(schema["values"]))
    if t == "enum":  # symbol string (codec maps index ↔ symbol)
        return T.StringType()
    if t == "fixed":  # size-checked raw bytes
        return T.BinaryType()
    if lt:  # unknown logical type: fall back to the base type (spec rule)
        return avro_to_spark(t)
    raise ValueError(f"unsupported Avro type {t}")


def _is_nullable(schema) -> bool:
    return isinstance(schema, list) and any(A._type_name(s) == "null" for s in schema)


# ------------------------------------------------- value conversion


def _to_avro_value(v, dt: T.DataType):
    if v is None:
        return None
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        return (v - _EPOCH) // _US
    if isinstance(dt, T.DateType):
        return (v - _EPOCH_DATE).days
    if isinstance(dt, T.BinaryType):
        return bytes(v)
    if isinstance(dt, T.ArrayType):
        return [_to_avro_value(x, dt.elementType) for x in v]
    if isinstance(dt, T.MapType):
        return {k: _to_avro_value(x, dt.valueType) for k, x in v.items()}
    if isinstance(dt, T.StructType):
        return {f.name: _to_avro_value(x, f.dataType) for f, x in zip(dt.fields, v)}
    return v


def _from_avro_value(v, dt: T.DataType):
    if v is None:
        return None
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return (_EPOCH + timedelta(microseconds=v)).replace(tzinfo=None)
    if isinstance(dt, T.DateType):
        return _EPOCH_DATE + timedelta(days=v)
    if isinstance(dt, T.ArrayType):
        return [_from_avro_value(x, dt.elementType) for x in v]
    if isinstance(dt, T.MapType):
        return {k: _from_avro_value(x, dt.valueType) for k, x in v.items()}
    if isinstance(dt, T.StructType):
        return tuple(_from_avro_value(v[f.name], f.dataType) for f in dt.fields)
    return v


# --------------------------------------------------------------- reader


def _list_avro_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".avro") and not f.startswith((".", "_"))
    )


class AvroFilePartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


class AvroReader(DataSourceReader):
    def __init__(self, options, schema: T.StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("avro_py requires a path (load(path))")
        self.spark_schema = schema

    def partitions(self):
        return [AvroFilePartition(f) for f in _list_avro_files(self.path)]

    def read(self, partition: AvroFilePartition):
        with open(partition.file_path, "rb") as fh:
            _, rows = A.read_container(fh)
            fields = self.spark_schema.fields
            for rec in rows:
                yield tuple(
                    _from_avro_value(rec.get(f.name), f.dataType) for f in fields
                )


# --------------------------------------------------------------- writer


class AvroCommit(WriterCommitMessage):
    def __init__(self, file_path: str, n_rows: int):
        self.file_path = file_path
        self.n_rows = n_rows


class AvroWriter(DataSourceWriter):
    def __init__(self, options, schema: T.StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("avro_py requires a path (save(path))")
        self.schema = schema
        self.codec = options.get("codec", "deflate")
        self.avro_schema = json.dumps(
            spark_to_avro(schema, options.get("recordName", "spark_row"))
        )
        if overwrite and os.path.isdir(self.path):
            for f in _list_avro_files(self.path):
                os.remove(f)
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out_path = os.path.join(self.path, f"part-{pid:05d}.avro")
        sync = hashlib.md5(out_path.encode("utf-8")).digest()
        fields = self.schema.fields
        avro_rows = (
            {f.name: _to_avro_value(v, f.dataType) for f, v in zip(fields, row)}
            for row in iterator
        )
        buf = io.BytesIO()
        n = A.write_container(buf, self.avro_schema, avro_rows, codec=self.codec, sync=sync)
        if n == 0:
            return AvroCommit("", 0)  # no empty files
        with open(out_path, "wb") as fh:
            fh.write(buf.getvalue())
        return AvroCommit(out_path, n)

    def commit(self, messages):
        # parquet-style completion marker; data files are already final
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages):
        for m in messages:
            if m and m.file_path and os.path.exists(m.file_path):
                os.remove(m.file_path)


class AvroPyDataSource(DataSource):
    """`spark.read.format("avro_py")` / `df.write.format("avro_py")` —
    register with `register(spark)`."""

    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def schema(self):
        files = _list_avro_files(self.options.get("path", ""))
        if not files:
            raise ValueError("cannot infer Avro schema: no .avro files at path")
        with open(files[0], "rb") as fh:
            avro_schema, _ = A.read_container(fh)
        st = avro_to_spark(avro_schema)
        if not isinstance(st, T.StructType):
            raise ValueError("top-level Avro schema must be a record")
        return st

    def reader(self, schema) -> DataSourceReader:
        return AvroReader(self.options, schema)

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return AvroWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool):  # noqa: N802 — Spark API
        return AvroStreamWriter(self.options, schema)

    def simpleStreamReader(self, schema):  # noqa: N802 — Spark API
        r = AvroStreamReader(self.options)
        r.spark_schema = schema
        return r


def register(spark) -> None:
    """Idempotently register the source (workers import this module, so
    ship the package zip too)."""
    from bigdata06_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    spark.dataSource.register(AvroPyDataSource)


# ------------------------------------------------------ streaming writer


class AvroStreamWriter(DataSourceStreamWriter):
    """Streaming Avro sink with a two-phase commit:

    - tasks write `_tmp-<partition>.avro` — the underscore prefix
      hides in-progress/partial files from every reader
      (`_list_avro_files` skips them), and the DETERMINISTIC per-task
      name makes a retried task overwrite its own leftovers instead
      of duplicating (micro-batches are serial per query, so tmp
      names can't collide across batches);
    - commit(batchId) renames the batch's tmp files to
      `part-<batchId>-<partition>.avro` and drops a
      `_batch-<id>.committed` marker listing them — a replayed batch
      re-renames onto the same final names, keeping the directory
      exactly-once; abort deletes the tmp files."""

    def __init__(self, options, schema: T.StructType):
        self.path = options.get("path") or options.get("checkpointLocation_path")
        if not self.path:
            raise ValueError("avro_py stream sink requires a path")
        self.schema = schema
        self.codec = options.get("codec", "deflate")
        self.avro_schema = json.dumps(spark_to_avro(schema, "spark_row"))
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out_path = os.path.join(self.path, f"_tmp-{pid:05d}.avro")
        sync = hashlib.md5(out_path.encode("utf-8")).digest()
        fields = self.schema.fields
        avro_rows = (
            {f.name: _to_avro_value(v, f.dataType) for f, v in zip(fields, row)}
            for row in iterator
        )
        buf = io.BytesIO()
        n = A.write_container(buf, self.avro_schema, avro_rows, codec=self.codec, sync=sync)
        if n == 0:
            return AvroCommit("", 0)
        with open(out_path, "wb") as fh:
            fh.write(buf.getvalue())
        return AvroCommit(out_path, n)

    def commit(self, messages, batchId: int) -> None:
        finals = []
        for m in messages:
            if not (m and m.file_path):
                continue
            pid_part = os.path.basename(m.file_path)[len("_tmp-"):]
            final = os.path.join(self.path, f"part-{batchId:08d}-{pid_part}")
            os.replace(m.file_path, final)
            finals.append(os.path.basename(final))
        marker = os.path.join(self.path, f"_batch-{batchId}.committed")
        with open(marker, "w") as fh:
            fh.write("\n".join(sorted(finals)))

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m and m.file_path and os.path.exists(m.file_path):
                os.remove(m.file_path)


# ------------------------------------------------------ streaming reader


class AvroStreamReader(SimpleDataSourceStreamReader):
    """Streaming Avro source: watch a directory for container files;
    the checkpointed offset is the sorted list boundary of files
    already emitted (the same monotonic-file-listing contract Spark's
    own file source uses). A restarted query resumes past the
    committed files; a replayed batch re-reads exactly its file
    window, so downstream idempotent sinks get exactly-once."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("avro_py stream source requires a path")
        self.spark_schema = None  # set by datasource

    def initialOffset(self) -> dict:
        return {"done": []}

    def _decode_files(self, files: list[str]):
        rows = []
        fields = self.spark_schema.fields
        for f in files:
            with open(os.path.join(self.path, f), "rb") as fh:
                _, it = A.read_container(fh)
                for rec in it:
                    rows.append(
                        tuple(_from_avro_value(rec.get(fd.name), fd.dataType) for fd in fields)
                    )
        return rows

    def read(self, start: dict):
        done = set(start["done"])
        now = [os.path.basename(f) for f in _list_avro_files(self.path)]
        new = sorted(f for f in now if f not in done)
        return iter(self._decode_files(new)), {"done": sorted(done | set(new))}

    def readBetweenOffsets(self, start: dict, end: dict):
        window = sorted(set(end["done"]) - set(start["done"]))
        return iter(self._decode_files(window))
