"""Minimal Go ``encoding/gob`` codec for the reference's MetaData.

The reference stores its subfile index as a gob-encoded ``MetaData``
struct (``reader.go:31-43``) in the string property ``"metadata"`` of a
leading header feature (``reader.go:236-274``)::

    type SubFile  struct { Positions [2]int; NumberFeatures int; Size int }
    type MetaData struct { FileSize int; NumberFeatures int;
                           Files map[string]*SubFile; Bounds Extrema }
    type Extrema  struct { N, S, E, W float64 }   (mercantile)

This module implements the documented gob wire format (the public
encoding/gob specification) for the subset those types need: signed /
unsigned ints, float64, string, fixed arrays, maps and structs, with
the self-describing type-definition messages.  The decoder is generic
over that subset — it reads type descriptors from the stream, so ANY
field order / type-id assignment a Go encoder chooses is handled.  The
encoder mirrors Go's layout (inner typedefs first, zero fields
omitted); it round-trips through the decoder and follows the spec
byte-for-byte on the documented ``Point`` example (pinned in tests).
"""

from __future__ import annotations

import struct as _struct

# predefined gob type ids
_BOOL, _INT, _UINT, _FLOAT, _BYTES, _STRING = 1, 2, 3, 4, 5, 6
_WIRE_TYPE = 16


class _Buf:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes):
        self.b = b
        self.i = 0

    def read(self, n: int) -> bytes:
        out = self.b[self.i: self.i + n]
        if len(out) != n:
            raise ValueError("gob: truncated stream")
        self.i += n
        return out

    def eof(self) -> bool:
        return self.i >= len(self.b)


def _read_uint(buf: _Buf) -> int:
    b0 = buf.read(1)[0]
    if b0 < 0x80:
        return b0
    n = 256 - b0  # minus-byte-count
    if not 1 <= n <= 8:
        raise ValueError(f"gob: bad uint prefix {b0:#x}")
    return int.from_bytes(buf.read(n), "big")


def _read_int(buf: _Buf) -> int:
    u = _read_uint(buf)
    return ~(u >> 1) if (u & 1) else (u >> 1)


def _read_float(buf: _Buf) -> float:
    u = _read_uint(buf)
    return _struct.unpack(">d", u.to_bytes(8, "little"))[0]


def _write_uint(out: bytearray, v: int) -> None:
    if v < 0x80:
        out.append(v)
        return
    raw = v.to_bytes((v.bit_length() + 7) // 8, "big")
    out.append(256 - len(raw))
    out.extend(raw)


def _write_int(out: bytearray, v: int) -> None:
    _write_uint(out, (~v << 1) | 1 if v < 0 else v << 1)


def _write_float(out: bytearray, v: float) -> None:
    _write_uint(out, int.from_bytes(_struct.pack(">d", v), "little"))


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class GobDecoder:
    """Streaming decoder for the gob subset above."""

    def __init__(self, data: bytes):
        self.buf = _Buf(data)
        self.types: dict[int, dict] = {}

    def _decode_wiretype(self, msg: _Buf) -> dict:
        """Decode a wireType struct value (field-delta keyed)."""
        kind_by_field = {0: "array", 1: "slice", 2: "struct", 3: "map"}
        field = -1
        out: dict = {}
        while True:
            delta = _read_uint(msg)
            if delta == 0:
                return out
            field += delta
            kind = kind_by_field.get(field)
            if kind is None:
                raise ValueError(f"gob: unsupported wireType field {field}")
            out = {"kind": kind, **self._decode_typedef_body(msg, kind)}

    def _decode_common(self, msg: _Buf) -> dict:
        field = -1
        name, tid = "", 0
        while True:
            delta = _read_uint(msg)
            if delta == 0:
                return {"name": name, "id": tid}
            field += delta
            if field == 0:
                name = self.buf_read_string(msg)
            elif field == 1:
                tid = _read_int(msg)
            else:
                raise ValueError("gob: bad commonType field")

    @staticmethod
    def buf_read_string(msg: _Buf) -> str:
        return msg.read(_read_uint(msg)).decode("utf-8")

    def _decode_typedef_body(self, msg: _Buf, kind: str) -> dict:
        field = -1
        info: dict = {"common": {"name": "", "id": 0}}
        while True:
            delta = _read_uint(msg)
            if delta == 0:
                return info
            field += delta
            if field == 0:  # embedded commonType
                info["common"] = self._decode_common(msg)
            elif kind == "array" and field == 1:
                info["elem"] = _read_int(msg)
            elif kind == "array" and field == 2:
                info["len"] = _read_int(msg)
            elif kind == "slice" and field == 1:
                info["elem"] = _read_int(msg)
            elif kind == "struct" and field == 1:
                nf = _read_uint(msg)
                fields = []
                for _ in range(nf):
                    fields.append(self._decode_field(msg))
                info["fields"] = fields
            elif kind == "map" and field == 1:
                info["key"] = _read_int(msg)
            elif kind == "map" and field == 2:
                info["elem"] = _read_int(msg)
            else:
                raise ValueError(f"gob: bad {kind} typedef field {field}")

    def _decode_field(self, msg: _Buf) -> dict:
        field = -1
        name, tid = "", 0
        while True:
            delta = _read_uint(msg)
            if delta == 0:
                return {"name": name, "id": tid}
            field += delta
            if field == 0:
                name = self.buf_read_string(msg)
            elif field == 1:
                tid = _read_int(msg)
            else:
                raise ValueError("gob: bad fieldType field")

    def _decode_value(self, msg: _Buf, tid: int):
        if tid == _BOOL:
            return _read_uint(msg) != 0
        if tid == _INT:
            return _read_int(msg)
        if tid == _UINT:
            return _read_uint(msg)
        if tid == _FLOAT:
            return _read_float(msg)
        if tid == _BYTES:
            return msg.read(_read_uint(msg))
        if tid == _STRING:
            return self.buf_read_string(msg)
        t = self.types.get(tid)
        if t is None:
            raise ValueError(f"gob: unknown type id {tid}")
        if t["kind"] == "struct":
            out = {}
            field = -1
            while True:
                delta = _read_uint(msg)
                if delta == 0:
                    return out
                field += delta
                f = t["fields"][field]
                out[f["name"]] = self._decode_value(msg, f["id"])
        if t["kind"] in ("array", "slice"):
            n = _read_uint(msg)
            if t["kind"] == "array" and n != t.get("len", n):
                raise ValueError("gob: array length mismatch")
            return [self._decode_value(msg, t["elem"]) for _ in range(n)]
        if t["kind"] == "map":
            n = _read_uint(msg)
            out = {}
            for _ in range(n):
                k = self._decode_value(msg, t["key"])
                out[k] = self._decode_value(msg, t["elem"])
            return out
        raise ValueError(f"gob: unsupported kind {t['kind']}")

    def decode(self):
        """Decode the next top-level value from the stream."""
        while True:
            ln = _read_uint(self.buf)
            msg = _Buf(self.buf.read(ln))
            tid = _read_int(msg)
            if tid < 0:  # type definition
                self.types[-tid] = self._decode_wiretype(msg)
                continue
            t = self.types.get(tid)
            if t is None or t["kind"] != "struct":
                # non-struct top level values carry a leading 0 byte
                if _read_uint(msg) != 0:
                    raise ValueError("gob: bad singleton delta")
            return self._decode_value(msg, tid)


# ---------------------------------------------------------------------------
# encoder (MetaData-shaped, mirrors Go's inner-first typedef emission)
# ---------------------------------------------------------------------------


def _msg(out: bytearray, payload: bytes) -> None:
    _write_uint(out, len(payload))
    out.extend(payload)


def _string_bytes(s: str) -> bytes:
    b = bytearray()
    raw = s.encode("utf-8")
    _write_uint(b, len(raw))
    b.extend(raw)
    return bytes(b)


def _field_type(name: str, tid: int) -> bytes:
    b = bytearray()
    _write_uint(b, 1)  # delta to field 0 (Name)
    b.extend(_string_bytes(name))
    _write_uint(b, 1)  # delta to field 1 (Id)
    _write_int(b, tid)
    _write_uint(b, 0)
    return bytes(b)


def _common_type(name: str, tid: int) -> bytes:
    return _field_type(name, tid)  # same wire layout (Name, Id)


def _struct_typedef(tid: int, name: str, fields: list[tuple[str, int]]) -> bytes:
    body = bytearray()
    _write_int(body, -tid)
    # wireType struct, field 2 = StructT
    _write_uint(body, 3)
    # structType: field 0 common, field 1 []fieldType
    _write_uint(body, 1)
    body.extend(_common_type(name, tid))
    _write_uint(body, 1)
    _write_uint(body, len(fields))
    for fname, ftid in fields:
        body.extend(_field_type(fname, ftid))
    _write_uint(body, 0)  # end structType
    _write_uint(body, 0)  # end wireType
    return bytes(body)


def _array_typedef(tid: int, name: str, elem: int, length: int) -> bytes:
    body = bytearray()
    _write_int(body, -tid)
    _write_uint(body, 1)  # wireType field 0 = ArrayT
    _write_uint(body, 1)
    body.extend(_common_type(name, tid))
    _write_uint(body, 1)
    _write_int(body, elem)
    _write_uint(body, 1)
    _write_int(body, length)
    _write_uint(body, 0)
    _write_uint(body, 0)
    return bytes(body)


def _map_typedef(tid: int, name: str, key: int, elem: int) -> bytes:
    body = bytearray()
    _write_int(body, -tid)
    _write_uint(body, 4)  # wireType field 3 = MapT
    _write_uint(body, 1)
    body.extend(_common_type(name, tid))
    _write_uint(body, 1)
    _write_int(body, key)
    _write_uint(body, 1)
    _write_int(body, elem)
    _write_uint(body, 0)
    _write_uint(body, 0)
    return bytes(body)


# fixed id assignment mirroring first-use order when encoding MetaData
_ID_METADATA, _ID_MAP, _ID_SUBFILE, _ID_ARR2, _ID_EXTREMA = 65, 66, 67, 68, 69


def encode_metadata(meta: dict) -> bytes:
    """Encode the MetaData dict (same keys as the Go struct) as gob.

    ``meta`` = {"FileSize": int, "NumberFeatures": int,
    "Files": {key: {"Positions": [a, b], "NumberFeatures": n,
    "Size": s}}, "Bounds": {"N":..,"S":..,"E":..,"W":..}}.
    """
    out = bytearray()
    _msg(out, _struct_typedef(_ID_METADATA, "MetaData", [
        ("FileSize", _INT), ("NumberFeatures", _INT),
        ("Files", _ID_MAP), ("Bounds", _ID_EXTREMA)]))
    _msg(out, _map_typedef(_ID_MAP, "map[string]*geobuf.SubFile",
                           _STRING, _ID_SUBFILE))
    _msg(out, _struct_typedef(_ID_SUBFILE, "SubFile", [
        ("Positions", _ID_ARR2), ("NumberFeatures", _INT),
        ("Size", _INT)]))
    _msg(out, _array_typedef(_ID_ARR2, "[2]int", _INT, 2))
    _msg(out, _struct_typedef(_ID_EXTREMA, "Extrema", [
        ("N", _FLOAT), ("S", _FLOAT), ("E", _FLOAT), ("W", _FLOAT)]))

    body = bytearray()
    _write_int(body, _ID_METADATA)

    def enc_struct_fields(b, items):
        """items: [(field_index, writer)] for NON-zero fields only."""
        prev = -1
        for idx, writer in items:
            _write_uint(b, idx - prev)
            prev = idx
            writer(b)
        _write_uint(b, 0)

    def w_int(v):
        return lambda b: _write_int(b, v)

    def w_subfile(sf):
        def w(b):
            items = []
            pos = sf.get("Positions", [0, 0])
            if any(pos):
                def wp(bb, pos=pos):
                    _write_uint(bb, 2)
                    _write_int(bb, pos[0])
                    _write_int(bb, pos[1])
                items.append((0, wp))
            if sf.get("NumberFeatures"):
                items.append((1, w_int(sf["NumberFeatures"])))
            if sf.get("Size"):
                items.append((2, w_int(sf["Size"])))
            enc_struct_fields(b, items)
        return w

    def w_files(files):
        def w(b):
            _write_uint(b, len(files))
            for k in files:  # Go map order is random; any order decodes
                b.extend(_string_bytes(k))
                w_subfile(files[k])(b)
        return w

    def w_bounds(bb_):
        def w(b):
            items = [(i, (lambda b2, v=bb_.get(k, 0.0): _write_float(b2, v)))
                     for i, k in enumerate("NSEW") if bb_.get(k, 0.0) != 0.0]
            enc_struct_fields(b, items)
        return w

    items = []
    if meta.get("FileSize"):
        items.append((0, w_int(meta["FileSize"])))
    if meta.get("NumberFeatures"):
        items.append((1, w_int(meta["NumberFeatures"])))
    if meta.get("Files"):
        items.append((2, w_files(meta["Files"])))
    bounds = meta.get("Bounds", {})
    if any(bounds.get(k, 0.0) != 0.0 for k in "NSEW"):
        items.append((3, w_bounds(bounds)))
    enc_struct_fields(body, items)
    _msg(out, bytes(body))
    return bytes(out)


def decode_metadata(data: bytes) -> dict:
    """Decode a gob MetaData blob (reference-written or ours).

    Missing (zero-valued, gob-omitted) fields are filled with zeros so
    callers see the full Go struct shape.
    """
    raw = GobDecoder(data).decode()
    files = {}
    for k, sf in (raw.get("Files") or {}).items():
        sf = sf or {}
        files[k] = {
            "Positions": list(sf.get("Positions", [0, 0])),
            "NumberFeatures": int(sf.get("NumberFeatures", 0)),
            "Size": int(sf.get("Size", 0)),
        }
    bounds = raw.get("Bounds") or {}
    return {
        "FileSize": int(raw.get("FileSize", 0)),
        "NumberFeatures": int(raw.get("NumberFeatures", 0)),
        "Files": files,
        "Bounds": {k: float(bounds.get(k, 0.0)) for k in "NSEW"},
    }
