"""Pure-Python Avro Object Container File codec.

The container has no Spark module in this environment
(`spark-avro_2.13` is an external package; no Python `avro`/`fastavro`
either), so the fourth-most-common interchange format is implemented
here from the PUBLIC Avro 1.11 specification
(https://avro.apache.org/docs/1.11.1/specification/): zigzag-varint
primitives, the Object Container File framing (magic `Obj\\x01`,
metadata map with `avro.schema`/`avro.codec`, 16-byte sync marker,
length-prefixed blocks), `null` and `deflate` codecs.

Conformance is tested against the JVM's own Avro implementation
(avro-1.12.1.jar ships with Spark): files written by
org.apache.avro.file.DataFileWriter are decoded here and vice versa —
a genuine cross-implementation check, not a self-round-trip
(tests/test_sources_sinks.py).

Type support (the Spark-mappable core): null, boolean, int, long,
float, double, bytes, string, record, array, map, unions, and the
timestamp-micros / date logical types. enum/fixed/decimal are
rejected loudly at schema parse — not silently misread.

Scale shape: this codec is the per-task kernel of a Python
DataSource (`avro_datasource.py`) — each Spark task encodes/decodes
its own partition stream; nothing here ever sees more than one file.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, Callable, Iterable, Iterator

MAGIC = b"Obj\x01"
SUPPORTED_CODECS = ("null", "deflate")

# ----------------------------------------------------------- primitives


def zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(out: io.BytesIO, n: int) -> None:
    n = zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    # interpret as unsigned 64-bit two's complement before unzigzag
    if acc >= 1 << 64:
        raise ValueError("varint longer than 64 bits")
    return zigzag_decode(acc)


def write_bytes(out: io.BytesIO, b: bytes) -> None:
    write_long(out, len(b))
    out.write(b)


def read_bytes(buf: io.BytesIO) -> bytes:
    n = read_long(buf)
    b = buf.read(n)
    if len(b) != n:
        raise ValueError("truncated bytes value")
    return b


# ----------------------------------------------------------- schema walk


def _norm(schema: Any) -> Any:
    """Normalize a parsed Avro schema node: bare primitive strings stay
    strings; dicts with only a `type` primitive collapse (unless they
    carry a logicalType)."""
    if isinstance(schema, dict) and "logicalType" not in schema and schema.get("type") in (
        "null", "boolean", "int", "long", "float", "double", "bytes", "string"
    ) and set(schema) <= {"type", "name", "doc"}:
        return schema["type"]
    return schema


def _encoder(schema: Any) -> Callable[[io.BytesIO, Any], None]:
    """Compile a schema node into a writer function (closure tree —
    schema walked once, not per value)."""
    schema = _norm(schema)
    if isinstance(schema, str):
        if schema == "null":
            return lambda out, v: None
        if schema == "boolean":
            return lambda out, v: out.write(b"\x01" if v else b"\x00")
        if schema in ("int", "long"):
            return write_long
        if schema == "float":
            return lambda out, v: out.write(struct.pack("<f", v))
        if schema == "double":
            return lambda out, v: out.write(struct.pack("<d", v))
        if schema == "bytes":
            return lambda out, v: write_bytes(out, bytes(v))
        if schema == "string":
            return lambda out, v: write_bytes(out, v.encode("utf-8"))
        raise ValueError(f"unsupported Avro type: {schema}")
    if isinstance(schema, list):  # union: write branch index then value
        subs = [_encoder(s) for s in schema]
        names = [_type_name(s) for s in schema]
        null_idx = names.index("null") if "null" in names else None

        def enc_union(out: io.BytesIO, v: Any) -> None:
            if v is None and null_idx is not None:
                write_long(out, null_idx)
                return
            for i, nm in enumerate(names):
                if nm != "null":
                    write_long(out, i)
                    subs[i](out, v)
                    return
            raise ValueError("no union branch for value")

        return enc_union
    t = schema["type"]
    if t == "record":
        field_encs = [(f["name"], _encoder(f["type"])) for f in schema["fields"]]

        def enc_record(out: io.BytesIO, v: Any) -> None:
            # accepts dict or sequence in field order
            if isinstance(v, dict):
                for name, e in field_encs:
                    e(out, v[name])
            else:
                for (name, e), item in zip(field_encs, v):
                    e(out, item)

        return enc_record
    if t == "array":
        item_enc = _encoder(schema["items"])

        def enc_array(out: io.BytesIO, v: Any) -> None:
            if v:
                write_long(out, len(v))
                for item in v:
                    item_enc(out, item)
            write_long(out, 0)

        return enc_array
    if t == "map":
        val_enc = _encoder(schema["values"])

        def enc_map(out: io.BytesIO, v: Any) -> None:
            if v:
                write_long(out, len(v))
                for k, val in v.items():
                    write_bytes(out, k.encode("utf-8"))
                    val_enc(out, val)
            write_long(out, 0)

        return enc_map
    if "logicalType" in schema:  # timestamp-micros / date ride their base type
        return _encoder(schema["type"])
    raise ValueError(f"unsupported Avro type: {t} (enum/fixed/decimal not implemented)")


def _decoder(schema: Any) -> Callable[[io.BytesIO], Any]:
    schema = _norm(schema)
    if isinstance(schema, str):
        if schema == "null":
            return lambda buf: None
        if schema == "boolean":
            return lambda buf: buf.read(1) == b"\x01"
        if schema in ("int", "long"):
            return read_long
        if schema == "float":
            return lambda buf: struct.unpack("<f", buf.read(4))[0]
        if schema == "double":
            return lambda buf: struct.unpack("<d", buf.read(8))[0]
        if schema == "bytes":
            return read_bytes
        if schema == "string":
            return lambda buf: read_bytes(buf).decode("utf-8")
        raise ValueError(f"unsupported Avro type: {schema}")
    if isinstance(schema, list):
        subs = [_decoder(s) for s in schema]
        return lambda buf: subs[read_long(buf)](buf)
    t = schema["type"]
    if t == "record":
        field_decs = [(f["name"], _decoder(f["type"])) for f in schema["fields"]]

        def dec_record(buf: io.BytesIO) -> dict:
            return {name: d(buf) for name, d in field_decs}

        return dec_record
    if t == "array":
        item_dec = _decoder(schema["items"])

        def dec_array(buf: io.BytesIO) -> list:
            out = []
            while True:
                n = read_long(buf)
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix (spec-legal)
                    n = -n
                    read_long(buf)
                for _ in range(n):
                    out.append(item_dec(buf))

        return dec_array
    if t == "map":
        val_dec = _decoder(schema["values"])

        def dec_map(buf: io.BytesIO) -> dict:
            out = {}
            while True:
                n = read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    read_long(buf)
                for _ in range(n):
                    k = read_bytes(buf).decode("utf-8")
                    out[k] = val_dec(buf)

        return dec_map
    if "logicalType" in schema:
        return _decoder(schema["type"])
    raise ValueError(f"unsupported Avro type: {t} (enum/fixed/decimal not implemented)")


def _type_name(schema: Any) -> str:
    schema = _norm(schema)
    if isinstance(schema, str):
        return schema
    if isinstance(schema, dict):
        return schema["type"]
    return "union"


# ------------------------------------------------------- container file


def write_container(out, schema: dict | str | list, rows: Iterable[Any],
                    codec: str = "deflate", sync: bytes | None = None,
                    block_rows: int = 4096) -> int:
    """Write an Object Container File; returns the row count. `sync`
    must be 16 bytes (callers pass a deterministic per-task marker so
    output is byte-reproducible — no RNG in the write path)."""
    if codec not in SUPPORTED_CODECS:
        raise ValueError(f"codec must be one of {SUPPORTED_CODECS}")
    schema_json = json.dumps(schema) if not isinstance(schema, str) else schema
    sync = sync or b"\x00" * 16
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    out.write(MAGIC)
    meta = io.BytesIO()
    write_long(meta, 2)
    write_bytes(meta, b"avro.schema")
    write_bytes(meta, schema_json.encode("utf-8"))
    write_bytes(meta, b"avro.codec")
    write_bytes(meta, codec.encode("utf-8"))
    write_long(meta, 0)
    out.write(meta.getvalue())
    out.write(sync)

    enc = _encoder(json.loads(schema_json))
    total = 0
    buf, n = io.BytesIO(), 0

    def flush() -> None:
        nonlocal buf, n
        if n == 0:
            return
        data = buf.getvalue()
        if codec == "deflate":
            data = zlib.compress(data)[2:-4]  # raw deflate: strip zlib header+adler
        head = io.BytesIO()
        write_long(head, n)
        write_long(head, len(data))
        out.write(head.getvalue())
        out.write(data)
        out.write(sync)
        buf, n = io.BytesIO(), 0

    for row in rows:
        enc(buf, row)
        n += 1
        total += 1
        if n >= block_rows:
            flush()
    flush()
    return total


def read_container(raw) -> tuple[dict | str | list, Iterator[Any]]:
    """Read an Object Container File: returns (schema, row iterator)."""
    if raw.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = read_long(raw)
        if n == 0:
            break
        if n < 0:
            n = -n
            read_long(raw)
        for _ in range(n):
            k = read_bytes(raw).decode("utf-8")
            meta[k] = read_bytes(raw)
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in SUPPORTED_CODECS:
        raise ValueError(f"unsupported codec {codec}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    sync = raw.read(16)
    dec = _decoder(schema)

    def rows() -> Iterator[Any]:
        while True:
            first = raw.read(1)
            if not first:
                return
            # un-read the byte into the varint decode
            rest = io.BytesIO()
            b = first[0]
            acc, shift = b & 0x7F, 7
            while b & 0x80:
                (b,) = raw.read(1)
                acc |= (b & 0x7F) << shift
                shift += 7
            n_rows = zigzag_decode(acc)
            n_bytes = read_long(raw)
            data = raw.read(n_bytes)
            if codec == "deflate":
                data = zlib.decompress(data, -15)
            block = io.BytesIO(data)
            for _ in range(n_rows):
                yield dec(block)
            if raw.read(16) != sync:
                raise ValueError("sync marker mismatch — corrupt block boundary")
            del rest

    return schema, rows()
