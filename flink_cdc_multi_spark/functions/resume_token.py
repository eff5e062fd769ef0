"""MongoDB change-stream resume-token decoder (reference capability T10,
java/utils/ResumeTokenDecoder.java:70-493 — reimplemented from the public
MongoDB KeyString wire format, not translated).

A resume token's ``_data`` is a hex KeyString (v1) encoding, in order:
clusterTime (Timestamp), version, tokenType, txnOpIndex, fromInvalidate,
uuid (BinData subtype 4), documentKey/eventIdentifier. The reference uses it
only to surface ``txnOpIndex`` in the envelope (``_txn_op_index``,
MongoDBDebeziumToJSONDeserializer.java:51-72).

Pure Python; when needed per-record it runs as a pandas_udf over the token
column (tokens are tiny — decode is microseconds).
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass
from typing import Any

# KeyString CType bytes (public MongoDB source: mongo/db/storage/key_string.cpp)
K_MIN_KEY = 10
K_UNDEFINED = 15
K_NULLISH = 20
K_NUMERIC = 30
K_STRING_LIKE = 60
K_OBJECT = 70
K_ARRAY = 80
K_BINDATA = 90
K_OID = 100
K_BOOL_FALSE = 110
K_BOOL_TRUE = 111
K_DATE = 120
K_TIMESTAMP = 130
K_CODE = 160
K_MAX_KEY = 240

K_NUM_NAN = K_NUMERIC + 0
K_NUM_NEG_LARGE = K_NUMERIC + 1
K_NUM_NEG_8B = K_NUMERIC + 2  # ..through K_NUMERIC+9 = 1-byte negative
K_NUM_NEG_1B = K_NUMERIC + 9
K_NUM_NEG_SMALL = K_NUMERIC + 10
K_NUM_ZERO = K_NUMERIC + 11
K_NUM_POS_SMALL = K_NUMERIC + 12
K_NUM_POS_1B = K_NUMERIC + 13  # ..through K_NUMERIC+20 = 8-byte positive
K_NUM_POS_8B = K_NUMERIC + 20
K_NUM_POS_LARGE = K_NUMERIC + 21

_DISCRIMINATOR_LESS = 1
_DISCRIMINATOR_GREATER = 254
_END = 4


@dataclass
class ResumeToken:
    timestamp_t: int
    timestamp_i: int
    version: int | None
    token_type: int | None
    txn_op_index: int | None
    from_invalidate: bool | None
    uuid_hex: str | None
    identifier: Any


class _Cursor:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def eof(self) -> bool:
        return self.pos >= len(self.data)

    def peek(self) -> int | None:
        return None if self.eof() else self.data[self.pos]

    def u8(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def u32(self) -> int:
        v = struct.unpack_from(">I", self.data, self.pos)[0]
        self.pos += 4
        return v

    def u64(self) -> int:
        v = struct.unpack_from(">Q", self.data, self.pos)[0]
        self.pos += 8
        return v

    def take(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        if len(out) != n:
            raise ValueError("unexpected end of keystring")
        self.pos += n
        return out

    def cstring(self) -> str:
        end = self.data.index(0, self.pos)
        s = self.data[self.pos : end].decode("utf-8")
        self.pos = end + 1
        return s

    def cstring_with_nuls(self) -> str:
        parts = [self.cstring()]
        # embedded NULs are escaped as 0xFF <more cstring>
        while self.peek() == 0xFF:
            self.u8()
            parts.append(self.cstring())
        return "\x00".join(parts)


def _int_byte_width(ctype: int) -> int:
    if ctype >= K_NUM_POS_1B:
        return ctype - K_NUM_POS_1B + 1
    return K_NUM_NEG_1B - ctype + 1


def _read_value(ctype: int, cur: _Cursor, version: str) -> Any:
    if ctype in (K_MIN_KEY, K_MAX_KEY):
        return {"$minKey" if ctype == K_MIN_KEY else "$maxKey": 1}
    if ctype in (K_NULLISH, K_UNDEFINED):
        return None
    if ctype == K_BOOL_TRUE:
        return True
    if ctype == K_BOOL_FALSE:
        return False
    if ctype == K_DATE:
        # stored sign-flipped for ordering: XOR with 2^63
        return cur.u64() ^ (1 << 63)
    if ctype == K_TIMESTAMP:
        return (cur.u32(), cur.u32())
    if ctype == K_OID:
        return cur.take(12).hex()
    if ctype in (K_STRING_LIKE, K_CODE):
        return cur.cstring_with_nuls()
    if ctype == K_BINDATA:
        size = cur.u8()
        if size == 0xFF:
            size = cur.u32()
        subtype = cur.u8()
        return {"subtype": subtype, "data": cur.take(size)}
    if ctype == K_OBJECT:
        return _read_named(cur, version)
    if ctype == K_ARRAY:
        out = []
        while cur.peek() not in (None, 0):
            out.append(_read_value(cur.u8(), cur, version))
        cur.u8()  # end marker
        return out
    if ctype == K_NUM_NAN:
        return math.nan
    if ctype == K_NUM_ZERO:
        return 0
    if K_NUM_NEG_8B <= ctype <= K_NUM_NEG_1B or K_NUM_POS_1B <= ctype <= K_NUM_POS_8B:
        negative = ctype <= K_NUM_NEG_1B
        raw = 0
        for _ in range(_int_byte_width(ctype)):
            b = cur.u8()
            if negative:
                b = (~b) & 0xFF
            raw = (raw << 8) | b
        has_fraction = raw & 1
        value = raw >> 1
        if has_fraction:
            # fractional continuation not needed for resume tokens
            return math.nan
        return -value if negative else value
    if ctype in (K_NUM_NEG_LARGE, K_NUM_POS_LARGE):
        raw = cur.u64()
        if ctype == K_NUM_NEG_LARGE:
            raw = (~raw) & 0xFFFFFFFFFFFFFFFF
        if version == "v0":
            return struct.unpack(">d", struct.pack(">Q", raw))[0]
        return -math.inf if ctype == K_NUM_NEG_LARGE else math.inf
    if ctype in (K_NUM_NEG_SMALL, K_NUM_POS_SMALL):
        cur.u64()
        return 0.0
    raise ValueError(f"unknown keystring ctype: {ctype}")


def _read_named(cur: _Cursor, version: str) -> dict:
    out: dict[str, Any] = {}
    while not cur.eof():
        ctype = cur.u8()
        if ctype in (_DISCRIMINATOR_LESS, _DISCRIMINATOR_GREATER):
            ctype = cur.u8()
        if ctype in (_END, 0):
            break
        key = cur.cstring()
        out[key] = _read_value(cur.u8(), cur, version)
    return out


def keystring_to_list(hex_data: str, version: str = "v1") -> list:
    cur = _Cursor(bytes.fromhex(hex_data))
    out = []
    while not cur.eof():
        ctype = cur.u8()
        if ctype in (_DISCRIMINATOR_LESS, _DISCRIMINATOR_GREATER):
            ctype = cur.u8()
        if ctype == _END:
            break
        out.append(_read_value(ctype, cur, version))
    return out


def decode_resume_token(hex_data: str) -> ResumeToken:
    parts = keystring_to_list(hex_data, "v1")
    ts = parts[0]
    version = int(parts[1]) if len(parts) > 1 and parts[1] is not None else None
    if version is not None and version >= 1:
        token_type = int(parts[2]) if parts[2] is not None else None
        txn_op_index = int(parts[3]) if parts[3] is not None else None
        from_invalidate = bool(parts[4]) if len(parts) > 4 else None
        uuid_bin = parts[5] if len(parts) > 5 else None
        identifier = parts[6] if len(parts) > 6 else None
    else:
        token_type = None
        txn_op_index = int(parts[2]) if len(parts) > 2 and parts[2] is not None else None
        from_invalidate = None
        uuid_bin = parts[3] if len(parts) > 3 else None
        identifier = parts[4] if len(parts) > 4 else None
    uuid_hex = None
    if isinstance(uuid_bin, dict) and uuid_bin.get("subtype") == 4:
        uuid_hex = uuid_bin["data"].hex()
    return ResumeToken(
        timestamp_t=ts[0],
        timestamp_i=ts[1],
        version=version,
        token_type=token_type,
        txn_op_index=txn_op_index,
        from_invalidate=from_invalidate,
        uuid_hex=uuid_hex,
        identifier=identifier,
    )


def txn_op_index_of(hex_data: str) -> int | None:
    """The one field the envelope needs (``_txn_op_index``)."""
    try:
        return decode_resume_token(hex_data).txn_op_index
    except Exception:
        return None
