"""Minimal Apache Avro object-container codec (pure Python, stdlib only).

Implements the public Avro 1.x specification subset that Apache Iceberg
metadata files use — records, unions, arrays, maps, enums, fixed and all
primitives, with ``null`` and ``deflate`` block codecs — so Iceberg
manifest / manifest-list files can be read and written in environments
without the Iceberg runtime jar or an Avro wheel
(:mod:`..sources.iceberg_lite`). The reader is schema-generic: it decodes
with the WRITER schema embedded in the container header, so it can read
real manifest files produced by the Java/PyIceberg writers, not only its
own output.

Scale note: Avro metadata files are driver-side, kilobyte-to-megabyte
objects (one per manifest); nothing here touches the distributed data
path. Data files stay parquet and are scanned by Spark.

Spec: https://avro.apache.org/docs/current/specification/ (public).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}


# ---------------------------------------------------------------------------
# binary decoder
# ---------------------------------------------------------------------------


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        # zigzag varint
        shift = 0
        acc = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())


def _decode(r: _Reader, schema, names: dict):
    """Decode one value of ``schema`` (parsed JSON) from ``r``."""
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            t = schema
        else:
            return _decode(r, names[schema], names)  # named-type reference
    elif isinstance(schema, list):  # union
        return _decode(r, schema[r.read_long()], names)
    else:
        t = schema["type"]

    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read_bytes()
    if t == "string":
        return r.read_bytes().decode("utf-8")
    if t == "record":
        _register(schema, names)
        return {
            f["name"]: _decode(r, f["type"], names) for f in schema["fields"]
        }
    if t == "enum":
        _register(schema, names)
        return schema["symbols"][r.read_long()]
    if t == "fixed":
        _register(schema, names)
        return r.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                r.read_long()  # block byte size — unused, we decode anyway
                n = -n
            for _ in range(n):
                out.append(_decode(r, schema["items"], names))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                r.read_long()
                n = -n
            for _ in range(n):
                k = r.read_bytes().decode("utf-8")
                out[k] = _decode(r, schema["values"], names)
        return out
    if t in _PRIMITIVES or isinstance(t, (dict, list)):
        # {"type": "long", "logicalType": ...} wrapper, or nested complex
        return _decode(r, t, names)
    raise ValueError(f"unsupported avro type {t!r}")


def _register(schema: dict, names: dict) -> None:
    if isinstance(schema, dict) and "name" in schema:
        nm = schema["name"]
        ns = schema.get("namespace")
        names.setdefault(nm, schema)
        if ns:
            names.setdefault(f"{ns}.{nm}", schema)


def _collect_names(schema, names: dict) -> None:
    """Pre-register every named type so forward/backward references resolve."""
    if isinstance(schema, dict):
        _register(schema, names)
        t = schema.get("type")
        if t == "record":
            for f in schema.get("fields", []):
                _collect_names(f["type"], names)
        elif t == "array":
            _collect_names(schema.get("items"), names)
        elif t == "map":
            _collect_names(schema.get("values"), names)
        elif isinstance(t, (dict, list)):
            _collect_names(t, names)
    elif isinstance(schema, list):
        for s in schema:
            _collect_names(s, names)


def read_container(data: bytes) -> tuple[dict, list]:
    """Parse an Avro object container. Returns (writer_schema, records)."""
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise ValueError("not an avro object container")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _decode(r, meta_schema, {})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = r.read(16)
    names: dict = {}
    _collect_names(schema, names)
    records: list = []
    while r.pos < len(r.buf):
        count = r.read_long()
        size = r.read_long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        br = _Reader(block)
        for _ in range(count):
            records.append(_decode(br, schema, names))
        if r.read(16) != sync:
            raise ValueError("avro sync marker mismatch")
    return schema, records


def read_container_file(path: str) -> tuple[dict, list]:
    with open(path, "rb") as f:
        return read_container(f.read())


# ---------------------------------------------------------------------------
# binary encoder
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(w: io.BytesIO, schema, value, names: dict) -> None:
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            t = schema
        else:
            return _encode(w, names[schema], value, names)
    elif isinstance(schema, list):  # union: first branch whose type matches
        for i, branch in enumerate(schema):
            if _matches(branch, value, names):
                w.write(_zigzag(i))
                return _encode(w, branch, value, names)
        raise ValueError(f"value {value!r} matches no union branch {schema!r}")
    else:
        t = schema["type"]

    if t == "null":
        return None
    if t == "boolean":
        w.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        w.write(_zigzag(int(value)))
    elif t == "float":
        w.write(struct.pack("<f", float(value)))
    elif t == "double":
        w.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        w.write(_zigzag(len(value)))
        w.write(bytes(value))
    elif t == "string":
        b = value.encode("utf-8")
        w.write(_zigzag(len(b)))
        w.write(b)
    elif t == "record":
        _register(schema, names)
        for f in schema["fields"]:
            try:
                _encode(w, f["type"], value[f["name"]], names)
            except KeyError:
                raise ValueError(
                    f"record value missing field {f['name']!r}"
                ) from None
    elif t == "enum":
        _register(schema, names)
        w.write(_zigzag(schema["symbols"].index(value)))
    elif t == "fixed":
        _register(schema, names)
        if len(value) != schema["size"]:
            raise ValueError("fixed size mismatch")
        w.write(bytes(value))
    elif t == "array":
        if value:
            w.write(_zigzag(len(value)))
            for item in value:
                _encode(w, schema["items"], item, names)
        w.write(_zigzag(0))
    elif t == "map":
        if value:
            w.write(_zigzag(len(value)))
            for k, v in value.items():
                kb = k.encode("utf-8")
                w.write(_zigzag(len(kb)))
                w.write(kb)
                _encode(w, schema["values"], v, names)
        w.write(_zigzag(0))
    elif t in _PRIMITIVES or isinstance(t, (dict, list)):
        _encode(w, t, value, names)
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def _matches(branch, value, names: dict) -> bool:
    """Loose union-branch match (sufficient for [null, X] and
    disjoint-kind unions, which is all Iceberg metadata uses)."""
    if isinstance(branch, str) and branch not in _PRIMITIVES:
        branch = names.get(branch, branch)
    t = branch if isinstance(branch, str) else branch.get("type")
    if t == "null":
        return value is None
    if value is None:
        return False
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if t == "string":
        return isinstance(value, str)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t == "record":
        return isinstance(value, dict)
    if t == "map":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, list)
    if t == "enum":
        return isinstance(value, str)
    return True


def write_container(
    schema: dict, records: list, codec: str = "deflate",
    sync: bytes | None = None, meta_extra: dict[str, bytes] | None = None,
) -> bytes:
    """Serialize ``records`` (dicts) to an Avro object container.

    ``meta_extra`` adds header metadata entries (Iceberg stores the table
    schema / partition spec / format-version in manifest headers)."""
    names: dict = {}
    _collect_names(schema, names)
    body = io.BytesIO()
    for rec in records:
        _encode(body, schema, rec, names)
    block = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        block = comp.compress(block) + comp.flush()
    elif codec != "null":
        raise ValueError(f"unsupported avro codec {codec!r}")
    if sync is None:
        # deterministic container bytes for identical inputs: the marker
        # only needs to be locally unique within the file
        sync = zlib.crc32(json.dumps(schema).encode()).to_bytes(4, "little") * 4
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
        **(meta_extra or {}),
    }
    _encode(out, {"type": "map", "values": "bytes"}, meta, {})
    out.write(sync)
    out.write(_zigzag(len(records)))
    out.write(_zigzag(len(block)))
    out.write(block)
    out.write(sync)
    return out.getvalue()


def write_container_file(
    path: str, schema: dict, records: list, codec: str = "deflate",
    meta_extra: dict[str, bytes] | None = None,
) -> int:
    data = write_container(schema, records, codec, meta_extra=meta_extra)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return len(data)
