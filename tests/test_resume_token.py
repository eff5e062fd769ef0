"""Resume-token decoder: roundtrip against a minimal KeyString *encoder*
written here in the test (independent implementation — if both sides agree,
the wire format is right)."""

import struct

from flink_cdc_multi_spark.functions import resume_token as R


def enc_timestamp(t: int, i: int) -> bytes:
    return bytes([R.K_TIMESTAMP]) + struct.pack(">II", t, i)


def enc_int(v: int) -> bytes:
    if v == 0:
        return bytes([R.K_NUM_ZERO])
    assert v > 0, "test encoder covers non-negative ints"
    raw = v << 1  # shifted left; low bit = has-fraction (0)
    nbytes = max(1, (raw.bit_length() + 7) // 8)
    return bytes([R.K_NUM_POS_1B + nbytes - 1]) + raw.to_bytes(nbytes, "big")


def enc_bool(v: bool) -> bytes:
    return bytes([R.K_BOOL_TRUE if v else R.K_BOOL_FALSE])


def enc_bindata(data: bytes, subtype: int = 4) -> bytes:
    return bytes([R.K_BINDATA, len(data), subtype]) + data


def enc_string(s: str) -> bytes:
    return bytes([R.K_STRING_LIKE]) + s.encode() + b"\x00"


def enc_oid(hex12: str) -> bytes:
    return bytes([R.K_OID]) + bytes.fromhex(hex12)


def make_v1_token(ts=(1700000000, 5), version=1, token_type=128, txn_op_index=7,
                  from_invalidate=False, uuid=b"\x01" * 16, doc_key_oid="65f0" + "ab" * 10):
    return (
        enc_timestamp(*ts)
        + enc_int(version)
        + enc_int(token_type)
        + enc_int(txn_op_index)
        + enc_bool(from_invalidate)
        + enc_bindata(uuid, 4)
        + enc_oid(doc_key_oid)
    ).hex()


def test_decode_v1_token():
    tok = R.decode_resume_token(make_v1_token())
    assert (tok.timestamp_t, tok.timestamp_i) == (1700000000, 5)
    assert tok.version == 1
    assert tok.token_type == 128
    assert tok.txn_op_index == 7
    assert tok.from_invalidate is False
    assert tok.uuid_hex == "01" * 16
    assert tok.identifier == "65f0" + "ab" * 10  # OID hex


def test_txn_op_index_values():
    for v in (0, 1, 127, 128, 300, 70000):
        tok = R.decode_resume_token(make_v1_token(txn_op_index=v))
        assert tok.txn_op_index == v, v


def test_multibyte_int_roundtrip():
    # ints cross the 1-byte encoded boundary at raw=v<<1 > 0xFF (v >= 128)
    assert R.keystring_to_list(enc_int(127).hex()) == [127]
    assert R.keystring_to_list(enc_int(128).hex()) == [128]
    assert R.keystring_to_list(enc_int(65535).hex()) == [65535]


def test_timestamp_only_prefix():
    # decoding just the leading timestamp works even if the tail is absent
    hexdata = enc_timestamp(1234, 1).hex()
    assert R.keystring_to_list(hexdata) == [(1234, 1)]


def test_bad_token_returns_none():
    assert R.txn_op_index_of("zz-not-hex") is None
    assert R.txn_op_index_of("82") is None  # truncated
