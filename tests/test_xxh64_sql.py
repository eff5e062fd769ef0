"""Pin the generated DuckDB XXH64 replica (functions/xxh64_sql) bit-exact
against (a) a pure-Python XXH64 reference written from the public spec and
(b) Spark's live ``F.xxhash64`` — the two sides of the r17 portable-hash
fast lane for the sketch oracles (VERDICT r16 item 4). If either pin
breaks, the HLL/KMV/CMS gate queries stop replaying cross-engine."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from flink_cdc_multi_spark.functions.xxh64_sql import (
    xxh64_cte,
    xxh64_signed_expr,
)

_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261
_M = (1 << 64) - 1


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _M


def _rnd(acc, lane):
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def _merge(h, v):
    return ((h ^ _rnd(0, v)) * _P1 + _P4) & _M


def xxh64_py(data: bytes, seed: int = 42) -> int:
    """XXH64 from the public spec (Collet) — stripe accumulators for
    n >= 32, then 8/4/1-byte tails, then the avalanche."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _rnd(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _rnd(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _rnd(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _rnd(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h = (_rotl(h ^ _rnd(0, int.from_bytes(data[i:i + 8], "little")), 27)
             * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = (_rotl(h ^ (int.from_bytes(data[i:i + 4], "little") * _P1) & _M,
                   23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _M, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _fuzz_corpus():
    """Every structural class of the algorithm: empty, each tail-length
    residue, stripe boundaries (31/32/33, 63/64/65, 95/96/97), multibyte
    UTF-8 (so char length != byte length), and random mixed strings."""
    random.seed(13)
    strs = [
        "", "a", "hello", "héllo wörld", "tab\tnewline\n",
        "日本語のテキスト", "emoji 🎉 test",
    ]
    for ch, ln in [("a", 7), ("b", 8), ("c", 9), ("d", 12), ("e", 15),
                   ("f", 16), ("g", 24), ("h", 31), ("i", 32), ("j", 33),
                   ("k", 63), ("l", 64), ("m", 65), ("n", 95), ("o", 96),
                   ("p", 97), ("q", 100)]:
        strs.append(ch * ln)
    for ln in range(0, 140):
        strs.append(
            "".join(random.choice("abcdefghij αβγ日🎉") for _ in range(ln))
        )
    return strs


@pytest.fixture(scope="module")
def duck_hashes():
    strs = _fuzz_corpus()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join("(?)" for _ in strs) + ") v(s)",
        strs,
    )
    sql = (
        f"WITH {xxh64_cte('t', ['s'], 's')} "
        f"SELECT s, h, {xxh64_signed_expr('h')} AS hs FROM xx_h"
    )
    return {s: (int(h), int(hs)) for s, h, hs in con.sql(sql).fetchall()}


def test_duckdb_matches_python_reference(duck_hashes):
    for s, (h, _) in duck_hashes.items():
        assert h == xxh64_py(s.encode("utf-8")), repr(s)


def test_signed_expr_reinterprets_bits(duck_hashes):
    for s, (h, hs) in duck_hashes.items():
        expect = h - (1 << 64) if h >= (1 << 63) else h
        assert hs == expect, repr(s)


def test_duckdb_matches_spark_xxhash64(spark, duck_hashes):
    """The pin that matters: DuckDB replica == Spark F.xxhash64 (seed 42,
    UTF-8 bytes, SIGNED result) on every structural class."""
    strs = list(duck_hashes)
    df = spark.createDataFrame([(s,) for s in strs], ["s"])
    got = {
        r["s"]: r["h"]
        for r in df.select("s", F.xxhash64("s").alias("h")).collect()
    }
    for s in strs:
        assert got[s] == duck_hashes[s][1], repr(s)


def test_prefix_and_passthrough_columns():
    """Custom prefix + multiple pass-through columns survive the chain
    (the sketch oracles embed two chains in one WITH clause)."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE u AS SELECT 'en' AS lang, 1 AS k, 'tok' AS v"
    )
    sql = (
        f"WITH {xxh64_cte('u', ['lang', 'k'], 'v', prefix='aa')},\n"
        f"{xxh64_cte('u', ['lang'], 'v', prefix='bb')}\n"
        f"SELECT a.lang, a.k, a.h, b.h AS h2 "
        f"FROM aa_h a JOIN bb_h b USING (lang)"
    )
    lang, k, h, h2 = con.sql(sql).fetchone()
    assert (lang, k) == ("en", 1)
    assert int(h) == int(h2) == xxh64_py(b"tok")
