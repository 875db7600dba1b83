"""Minimal Apache Avro binary codec (Object Container Files), pure Python.

Implements exactly the subset of the PUBLIC Avro 1.11 specification
(binary encoding + object container file format) that Apache Iceberg's
metadata layer needs — manifest files and manifest lists are Avro, and
this container ships no avro/fastavro Python package, so the spec is
implemented from first principles:

- primitives: null, boolean, int, long (zigzag varint), float, double,
  bytes, string, fixed;
- complex: record, enum, array, map, union (the spec's long-prefixed
  block encodings; negative block counts with byte-size prefix are
  accepted on read);
- container files: ``Obj\\x01`` magic, file-metadata map carrying
  ``avro.schema`` / ``avro.codec``, 16-byte sync marker, null codec.

Scale note: Iceberg metadata is small relative to data (a manifest entry
per data file), and this codec runs driver-side exactly where Iceberg's
own planning runs; the data files themselves are parquet read by Spark
executors as usual.
"""

from __future__ import annotations

import io
import json
import os
import struct


# --- zigzag varint (spec: int/long) ---------------------------------------


def _encode_long(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63)  # zigzag
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _decode_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


# --- schema-driven encode ---------------------------------------------------


def _type_name(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def _encode(schema, value, out: bytearray) -> None:
    t = _type_name(schema)
    if t == "union":
        branches = schema
        idx = _match_branch(branches, value)
        out += _encode_long(idx)
        _encode(branches[idx], value, out)
    elif t == "null":
        if value is not None:
            raise ValueError(f"null schema got {value!r}")
    elif t == "boolean":
        out += b"\x01" if value else b"\x00"
    elif t in ("int", "long"):
        out += _encode_long(int(value))
    elif t == "float":
        out += struct.pack("<f", float(value))
    elif t == "double":
        out += struct.pack("<d", float(value))
    elif t == "bytes":
        b = bytes(value)
        out += _encode_long(len(b)) + b
    elif t == "string":
        b = str(value).encode("utf-8")
        out += _encode_long(len(b)) + b
    elif t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError(f"fixed size mismatch: {len(b)} != {schema['size']}")
        out += b
    elif t == "enum":
        out += _encode_long(schema["symbols"].index(value))
    elif t == "record":
        for f in schema["fields"]:
            if f["name"] in value:
                _encode(f["type"], value[f["name"]], out)
            elif "default" in f:
                _encode(f["type"], f["default"], out)
            else:
                _encode(f["type"], None, out)  # only valid for nullable
    elif t == "array":
        items = list(value or [])
        if items:
            out += _encode_long(len(items))
            for v in items:
                _encode(schema["items"], v, out)
        out += _encode_long(0)
    elif t == "map":
        entries = dict(value or {})
        if entries:
            out += _encode_long(len(entries))
            for k, v in entries.items():
                _encode("string", k, out)
                _encode(schema["values"], v, out)
        out += _encode_long(0)
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def _match_branch(branches, value) -> int:
    def kind(s):
        return _type_name(s)

    if value is None:
        for i, b in enumerate(branches):
            if kind(b) == "null":
                return i
        raise ValueError("no null branch for None")
    for i, b in enumerate(branches):
        k = kind(b)
        if k == "null":
            continue
        if isinstance(value, bool):
            if k == "boolean":
                return i
            continue
        if isinstance(value, int) and k in ("int", "long"):
            return i
        if isinstance(value, float) and k in ("float", "double"):
            return i
        if isinstance(value, str) and k in ("string", "enum"):
            return i
        if isinstance(value, (bytes, bytearray)) and k in ("bytes", "fixed"):
            return i
        if isinstance(value, dict) and k in ("record", "map"):
            return i
        if isinstance(value, (list, tuple)) and k == "array":
            return i
    # single non-null branch fallback
    non_null = [i for i, b in enumerate(branches) if kind(b) != "null"]
    if len(non_null) == 1:
        return non_null[0]
    raise ValueError(f"cannot match {type(value)} to union {branches}")


# --- schema-driven decode ---------------------------------------------------


def _decode(schema, buf: io.BytesIO):
    t = _type_name(schema)
    if t == "union":
        idx = _decode_long(buf)
        return _decode(schema[idx], buf)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _decode_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return buf.read(_decode_long(buf))
    if t == "string":
        return buf.read(_decode_long(buf)).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "enum":
        return schema["symbols"][_decode_long(buf)]
    if t == "record":
        return {f["name"]: _decode(f["type"], buf) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _decode_long(buf)
            if n == 0:
                return out
            if n < 0:  # spec: negative count → byte size follows
                _decode_long(buf)
                n = -n
            for _ in range(n):
                out.append(_decode(schema["items"], buf))
    if t == "map":
        out = {}
        while True:
            n = _decode_long(buf)
            if n == 0:
                return out
            if n < 0:
                _decode_long(buf)
                n = -n
            for _ in range(n):
                k = buf.read(_decode_long(buf)).decode("utf-8")
                out[k] = _decode(schema["values"], buf)
    raise ValueError(f"unsupported avro type {t!r}")


# --- object container files -------------------------------------------------

_MAGIC = b"Obj\x01"
_SYNC = bytes(range(16))  # deterministic sync marker (spec: any 16 bytes)

_META_SCHEMA = {"type": "map", "values": "bytes"}


def write_container(
    schema: dict, records: list[dict], extra_meta: dict[str, bytes] | None = None
) -> bytes:
    """Serialize records into an Avro Object Container File (null codec).

    ``extra_meta`` adds caller key/values to the file-metadata map —
    Iceberg manifests carry ``schema`` / ``partition-spec`` /
    ``format-version`` / ``content`` there per its spec."""
    out = bytearray()
    out += _MAGIC
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": b"null",
        **(extra_meta or {}),
    }
    _encode(_META_SCHEMA, meta, out)
    out += _SYNC
    if records:
        block = bytearray()
        for r in records:
            _encode(schema, r, block)
        out += _encode_long(len(records))
        out += _encode_long(len(block))
        out += block
        out += _SYNC
    return bytes(out)


def read_container(data: bytes) -> tuple[dict, list[dict]]:
    """Parse an Avro Object Container File → (writer schema, records)."""
    buf = io.BytesIO(data)
    if buf.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file")
    meta = _decode(_META_SCHEMA, buf)
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b""):
        raise ValueError(f"unsupported avro codec {codec!r} (null only)")
    schema = json.loads(meta["avro.schema"].decode())
    sync = buf.read(16)
    records: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, os.SEEK_CUR)
        n = _decode_long(buf)
        _decode_long(buf)  # block byte size
        for _ in range(n):
            records.append(_decode(schema, buf))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt container)")
    return schema, records
