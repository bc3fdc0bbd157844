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
float, double, bytes, string, record, array, map, unions, enum
(symbol index ↔ symbol string), fixed (size-checked raw bytes), the
timestamp-micros / date logical types, and bytes/fixed-backed
`decimal` (two's-complement big-endian unscaled integer, scale and
precision from the schema — the common financial-interchange shape).
The WRITE path additionally rejects unions with
more than one non-null branch at schema-compile time: the encoder
dispatches None→null / value→branch, which is only well-defined for
["null", T] — anything wider would be silently mis-encoded into an
undecodable file (the read path decodes any union by branch index).

Scale shape: this codec is the per-task kernel of a Python
DataSource (`avro_datasource.py`) — each Spark task encodes/decodes
its own partition stream; nothing here ever sees more than one file.
"""

from __future__ import annotations

import decimal
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
        names = [_type_name(s) for s in schema]
        non_null = [i for i, nm in enumerate(names) if nm != "null"]
        subs = [_encoder(s) for s in schema]
        null_idx = names.index("null") if "null" in names else None
        if len(non_null) <= 1:
            # fast path: ["null", T] / [T] needs no runtime matching
            val_idx = non_null[0] if non_null else None

            def enc_union(out: io.BytesIO, v: Any) -> None:
                if v is None and null_idx is not None:
                    write_long(out, null_idx)
                    return
                if val_idx is None:
                    raise ValueError("no union branch for value")
                write_long(out, val_idx)
                subs[val_idx](out, v)

            return enc_union

        # MULTI-BRANCH union (e.g. ["null","long","string"]): dispatch
        # on the value's RUNTIME type — first branch (declaration
        # order) whose matcher accepts the value wins, the Avro spec's
        # resolution rule and fastavro's behavior. No match is a loud
        # error (consistent with the enum/fixed/decimal policy), never
        # a silent wrong-branch encode.
        matchers = [_branch_matcher(s) for s in schema]

        def enc_union_multi(out: io.BytesIO, v: Any) -> None:
            for i, m in enumerate(matchers):
                if m(v):
                    write_long(out, i)
                    subs[i](out, v)
                    return
            raise ValueError(
                f"value {v!r} ({type(v).__name__}) matches no branch of "
                f"union {names}"
            )

        return enc_union_multi
    t = schema["type"]
    if schema.get("logicalType") == "decimal":
        return _decimal_encoder(schema)
    if schema.get("logicalType") in ("timestamp-millis", "local-timestamp-millis"):
        # engine-internal timestamps are MICROSECONDS; the millis
        # logical types convert at the codec boundary so every
        # consumer sees one unit (Kafka-Connect-style interchange
        # files default to millis)
        return lambda out, v: write_long(out, v // 1000)
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
    if t == "enum":
        symbols = list(schema["symbols"])
        index = {s: i for i, s in enumerate(symbols)}

        def enc_enum(out: io.BytesIO, v: Any) -> None:
            try:
                write_long(out, index[v])
            except KeyError:
                raise ValueError(
                    f"{v!r} not in enum {schema.get('name', '')} symbols"
                ) from None

        return enc_enum
    if t == "fixed":
        size = int(schema["size"])

        def enc_fixed(out: io.BytesIO, v: Any) -> None:
            b = bytes(v)
            if len(b) != size:
                raise ValueError(
                    f"fixed {schema.get('name', '')} needs exactly {size} bytes, got {len(b)}"
                )
            out.write(b)

        return enc_fixed
    if "logicalType" in schema:  # timestamp-micros / date ride their base type
        return _encoder(schema["type"])
    raise ValueError(f"unsupported Avro type: {t}")


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
    if schema.get("logicalType") == "decimal":
        return _decimal_decoder(schema)
    if schema.get("logicalType") in ("timestamp-millis", "local-timestamp-millis"):
        return lambda buf: read_long(buf) * 1000  # millis → µs (see encoder)
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
    if t == "enum":
        symbols = list(schema["symbols"])
        return lambda buf: symbols[read_long(buf)]
    if t == "fixed":
        size = int(schema["size"])

        def dec_fixed(buf: io.BytesIO) -> bytes:
            b = buf.read(size)
            if len(b) != size:
                raise ValueError("truncated fixed value")
            return b

        return dec_fixed
    if "logicalType" in schema:
        return _decoder(schema["type"])
    raise ValueError(f"unsupported Avro type: {t}")


def _decimal_ctx(schema: Any) -> tuple[int, int | None]:
    """(scale, fixed_size) for a decimal logical type node. Decimal
    rides bytes (length-prefixed) or fixed (raw `size` bytes); the
    unscaled value is a two's-complement big-endian integer and the
    real value is unscaled × 10^-scale (Avro 1.11 spec §Logical
    Types). Anything else backing decimal is malformed."""
    t = schema["type"]
    scale = int(schema.get("scale", 0))
    if scale < 0:
        raise ValueError("decimal scale must be >= 0")
    if t == "bytes":
        return scale, None
    if t == "fixed" or (isinstance(t, dict) and t.get("type") == "fixed"):
        size = int(schema["size"] if t == "fixed" else t["size"])
        return scale, size
    raise ValueError(f"decimal logical type must back bytes or fixed, got {t}")


def _decimal_encoder(schema: Any) -> Callable[[io.BytesIO, Any], None]:
    scale, fixed_size = _decimal_ctx(schema)
    precision = int(schema["precision"]) if "precision" in schema else None

    def enc(out: io.BytesIO, v: Any) -> None:
        unscaled_dec = decimal.Decimal(v).scaleb(scale)
        unscaled = int(unscaled_dec)
        if unscaled != unscaled_dec:
            raise ValueError(
                f"value {v} does not fit decimal scale {scale} exactly"
            )
        # loud-reject values wider than the declared precision (same
        # policy as enum symbols / fixed sizes): a 13-digit unscaled
        # value written into DECIMAL(12,2) would violate the declared
        # logical type for every downstream reader
        if precision is not None and abs(unscaled) >= 10 ** precision:
            raise ValueError(
                f"value {v} has more than {precision} significant digits "
                f"(decimal precision {precision}, scale {scale})"
            )
        if fixed_size is not None:
            out.write(unscaled.to_bytes(fixed_size, "big", signed=True))
            return
        # minimal two's-complement length (signed): bit_length//8 + 1
        n = unscaled.bit_length() // 8 + 1
        write_bytes(out, unscaled.to_bytes(n, "big", signed=True))

    return enc


def _decimal_decoder(schema: Any) -> Callable[[io.BytesIO], Any]:
    scale, fixed_size = _decimal_ctx(schema)

    def dec(buf: io.BytesIO) -> decimal.Decimal:
        b = buf.read(fixed_size) if fixed_size is not None else read_bytes(buf)
        if fixed_size is not None and len(b) != fixed_size:
            raise ValueError("truncated fixed decimal value")
        unscaled = int.from_bytes(b, "big", signed=True)
        return decimal.Decimal(unscaled).scaleb(-scale)

    return dec


def _branch_matcher(schema: Any) -> Callable[[Any], bool]:
    """Runtime-type predicate for one union branch — the dispatch rule
    for multi-branch unions. bool is checked before int (Python bools
    ARE ints); record matchers require the dict's keys to cover the
    field names, so a record and a map can coexist in one union with
    record-first declaration order deciding ties (the spec leaves
    ambiguous-value resolution to declaration order)."""
    schema = _norm(schema)
    if isinstance(schema, str):
        prims: dict[str, Callable[[Any], bool]] = {
            "null": lambda v: v is None,
            "boolean": lambda v: isinstance(v, bool),
            "int": lambda v: isinstance(v, int) and not isinstance(v, bool),
            "long": lambda v: isinstance(v, int) and not isinstance(v, bool),
            "float": lambda v: isinstance(v, float),
            "double": lambda v: isinstance(v, float),
            "bytes": lambda v: isinstance(v, (bytes, bytearray)),
            "string": lambda v: isinstance(v, str),
        }
        return prims[schema]
    if isinstance(schema, list):
        subs = [_branch_matcher(s) for s in schema]
        return lambda v: any(m(v) for m in subs)
    t = schema["type"]
    if schema.get("logicalType") == "decimal":
        return lambda v: isinstance(v, decimal.Decimal)
    if "logicalType" in schema and t in ("int", "long"):
        # timestamp-millis/micros, date, time — integer-backed
        return lambda v: isinstance(v, int) and not isinstance(v, bool)
    if t == "record":
        fields = {f["name"] for f in schema["fields"]}
        return lambda v: isinstance(v, dict) and fields <= set(v)
    if t == "array":
        return lambda v: isinstance(v, (list, tuple))
    if t == "map":
        return lambda v: isinstance(v, dict)
    if t == "enum":
        symbols = set(schema["symbols"])
        return lambda v: isinstance(v, str) and v in symbols
    if t == "fixed":
        size = int(schema["size"])
        return lambda v: isinstance(v, (bytes, bytearray)) and len(v) == size
    return _branch_matcher(t)


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
