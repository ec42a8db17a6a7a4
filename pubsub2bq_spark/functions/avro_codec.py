"""Pure-Python Avro *binary* codec for the reference's topic schema.

The reference declares its Pub/Sub topic schema in Avro
(/root/reference/terraform/main.tf:358-374) while its wire actually
carries the JSON encoding (README.md:293 —
``googclient_schemaencoding=JSON``); ``schema_validate`` covers that
JSON leg. This module closes the Avro wire-format leg: single-record
binary encoding per the public Avro specification (zig-zag varint
ints/longs, length-prefixed UTF-8 strings, record = fields in schema
order, no per-record framing). Pure Python because the container ships
neither avro/fastavro nor the spark-avro jar — and the format is small
enough that a spec-faithful codec is ~60 lines.

The Spark side wraps these in Arrow-batched ``mapInPandas`` kernels
(operators/cdc_semantics.py::avro_validate), so bytes cross the Python
boundary once per batch, never per row.
"""

from __future__ import annotations

# (name, type) pairs exactly as the reference schema declares them.
TOPIC_FIELDS: tuple[tuple[str, str], ...] = (
    ("id", "int"),
    ("first_name", "string"),
    ("last_name", "string"),
    ("email", "string"),
    ("zipcode", "int"),
    ("city", "string"),
    ("country", "string"),
    ("__deleted", "string"),
)

_MAX_VARINT_BYTES = 10  # 64-bit zig-zag never exceeds 10 varint bytes


def _zigzag(n: int) -> int:
    return (n << 1) if n >= 0 else ((-n << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def encode_long(n: int, out: bytearray) -> None:
    u = _zigzag(n)
    while u > 0x7F:
        out.append((u & 0x7F) | 0x80)
        u >>= 7
    out.append(u)


def decode_long(buf: bytes, pos: int) -> tuple[int, int]:
    u = 0
    shift = 0
    start = pos
    while True:
        if pos >= len(buf):
            raise ValueError("varint truncated")
        if pos - start >= _MAX_VARINT_BYTES:
            raise ValueError("varint overlong")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(u), pos
        shift += 7


def encode_string(s: str, out: bytearray) -> None:
    data = s.encode("utf-8")
    encode_long(len(data), out)
    out.extend(data)


def decode_string(buf: bytes, pos: int) -> tuple[str, int]:
    n, pos = decode_long(buf, pos)
    if n < 0 or pos + n > len(buf):
        raise ValueError("string length out of bounds")
    return buf[pos : pos + n].decode("utf-8"), pos + n


def encode_record(rec: dict) -> bytes:
    """Avro binary encoding of one record of the topic schema."""
    out = bytearray()
    for name, typ in TOPIC_FIELDS:
        if typ == "int":
            encode_long(int(rec[name]), out)
        else:
            encode_string(rec[name], out)
    return bytes(out)


def decode_record(buf: bytes) -> dict:
    """Decode one topic-schema record; raises ValueError on any wire
    corruption (truncation, overlong varints, bad lengths, trailing
    bytes)."""
    rec: dict = {}
    pos = 0
    for name, typ in TOPIC_FIELDS:
        if typ == "int":
            rec[name], pos = decode_long(buf, pos)
        else:
            rec[name], pos = decode_string(buf, pos)
    if pos != len(buf):
        raise ValueError(f"{len(buf) - pos} trailing bytes after record")
    return rec
