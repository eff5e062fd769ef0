"""XXH64 (seed 42) as generated DuckDB SQL — the portable-hash fast lane
for the sketch oracle contract (r17, VERDICT r16 item 4).

Why this exists: the sketch gate queries (HLL / KMV / CMS) hash one value
per distinct token or occurrence. The repo's original portable contract,
md5-hash60, costs Spark `md5 + conv(hex, 16, 10)` per value — the measured
sf10 scan wall (PERF.md r16: conv alone ~1 s of ext_sketch_hll's 3.0 s;
the xxhash64 production path runs at DuckDB parity, 1.7 s). Spark's
`F.xxhash64` is ONE whole-stage-codegen JVM call, but DuckDB has no
xxhash64 builtin — so the fast hash could not be oracle-gated until now.

This module renders the XXH64 algorithm (Collet's public spec — stripe
accumulators, 8/4/1-byte tails, avalanche) as a chain of DuckDB CTE
stages, bit-exact with Spark's ``F.xxhash64(col)`` (seed 42 over the
UTF-8 bytes), so the gate query can run the production hash and the
oracle replays it exactly. Pinned against both a pure-Python reference
and live Spark in tests/test_xxh64_sql.py.

Arithmetic mapping — ALL hash words live as UBIGINT (int64 lanes; the
first draft used HUGEINT mod-2^64 arithmetic and one int128 multiply
alone measured 0.81 s per 5M rows vs 0.13 s for the split form below —
the whole hash was 6-10x slower):

- DuckDB integer ops ERROR on overflow (no wrapping arithmetic), so
  mod-2^64 multiply and add are SPLIT at 32 bits with every
  intermediate provably < 2^64:
  ``a*b mod 2^64``: p0 = lo32(a)·lo32(b);  hi = (p0>>32 + lo32(a)·hi32(b)
  mod 2^32 + hi32(a)·lo32(b) mod 2^32) mod 2^32;  result = lo32(p0) + hi·2^32
  (b is always one of the XXH64 prime constants, pre-split in Python).
  ``a+b mod 2^64``: same lo/hi split with an explicit carry.
- rotl(x, r) = ``(x mod 2^(64-r))·2^r + x div 2^(64-r)`` — < 2^64 by
  construction, no mod needed; xor() is UBIGINT-native.
- byte access: ``hex(encode(s))`` once per value, then 1/4/8-byte
  little-endian lanes parsed via the ``'0x…'::UBIGINT`` string cast
  (hex pairs concatenated in reverse order — one cast per lane).
- the BOUNDED loops (≤3 tail 8-byte chunks, ≤1 4-byte chunk, ≤7 tail
  bytes, the merge chain, avalanche) are UNROLLED into narrow
  projection stages guarded by CASE (DuckDB evaluates CASE branches on
  selection vectors, so non-qualifying rows skip the work) — every
  expensive subexpression is bound to a stage column and computed ONCE.
- only the UNBOUNDED stripe loop (n ≥ 32) keeps a sequential fold:
  ``list_reduce(list_prepend(init, lanes), ...)`` per accumulator —
  XXH64's four stripe accumulators are independent folds over disjoint
  lane sequences, so no tuple state is needed; the whole fold sits
  under ``CASE WHEN n >= 32`` and word-sized values never pay for it.

The chain is ~30 narrow projection stages; DuckDB keeps linear CTE
chains as pipelined projection operators, so each stage's expressions
evaluate once per row.

The result column ``h`` is the UNSIGNED 64-bit pattern (UBIGINT).
Spark's xxhash64 returns the same bits as a SIGNED long; consumers pick
the domain: ``h // 2^58`` replays ``shiftrightunsigned(h, 58)``,
``h % 2^k`` replays ``h & (2^k - 1)``, and ``xxh64_signed_expr``
converts to the signed value for order-sensitive uses (KMV's
k-smallest).
"""

from __future__ import annotations

_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261
_T = 1 << 64
_C32 = "4294967296::UBIGINT"
_SEED = 42  # Spark's fixed xxhash64 seed (XxHash64 default)

_V1 = (_SEED + _P1 + _P2) % _T
_V2 = (_SEED + _P2) % _T
_V3 = _SEED % _T
_V4 = (_SEED - _P1) % _T
_H_SHORT = (_SEED + _P5) % _T  # n < 32 initial state


def _u(x: int) -> str:
    return f"{x}::UBIGINT"


def _m(a: str, b: int) -> str:
    """(a * b) mod 2^64, b a Python constant, all intermediates < 2^64.

    ``a`` is referenced four times — call it on COLUMN references (or
    lambda variables); bind compound inputs to a stage column first."""
    blo, bhi = b % (1 << 32), b >> 32
    p0 = f"((({a}) % {_C32}) * {_u(blo)})"
    hi = (
        f"(({p0} // {_C32} + (({a}) % {_C32}) * {_u(bhi)} % {_C32} "
        f"+ (({a}) // {_C32}) * {_u(blo)} % {_C32}) % {_C32})"
    )
    return f"({p0} % {_C32} + {hi} * {_C32})"


def _add(a: str, b: str) -> str:
    """(a + b) mod 2^64 with an explicit 32-bit carry split."""
    lo = f"((({a}) % {_C32}) + (({b}) % {_C32}))"
    hi = f"(((({a}) // {_C32}) + (({b}) // {_C32}) + {lo} // {_C32}) % {_C32})"
    return f"({lo} % {_C32} + {hi} * {_C32})"


def _rot(x: str, r: int) -> str:
    p, q = _u(1 << r), _u(1 << (64 - r))
    return f"((({x}) % {q}) * {p} + ({x}) // {q})"


def _round(acc: str, lane: str) -> str:
    """XXH64 round: rotl(acc + lane*P2, 31) * P1 (mod 2^64). Used only
    inside the stripe fold (unbounded part) — elsewhere the round is
    split across stages."""
    return _m(_rot(_add(acc, _m(lane, _P2)), 31), _P1)


def _lane8(o: str) -> str:
    """8-byte little-endian lane at 1-based byte offset ``o`` of hx."""
    parts = " || ".join(
        f"substr(hx, 2*(({o})+{j})-1, 2)" for j in (7, 6, 5, 4, 3, 2, 1, 0)
    )
    return f"('0x' || {parts})::UBIGINT"


def _lane4(o: str) -> str:
    parts = " || ".join(
        f"substr(hx, 2*(({o})+{j})-1, 2)" for j in (3, 2, 1, 0)
    )
    return f"('0x' || {parts})::UBIGINT"


def _byte(i: str) -> str:
    return f"('0x' || substr(hx, 2*({i})-1, 2))::UBIGINT"


def xxh64_cte(src: str, cols: list[str], value: str, prefix: str = "xx") -> str:
    """Render the CTE chain computing ``h`` = unsigned xxhash64(seed 42)
    of ``value``'s UTF-8 bytes for every row of ``src``.

    Returns the text of comma-separated CTE definitions (to be embedded
    inside an existing WITH clause); the final CTE, named
    ``{prefix}_h``, selects ``cols`` + ``h`` (UBIGINT in [0, 2^64)).
    NULL values hash to NULL (md5-contract convention — callers filter)."""
    c = ", ".join(cols)
    cc = c + ", " if c else ""
    p = prefix
    out = []

    def stage(name: str, body: str, src_name: str) -> str:
        out.append(f"{p}_{name} AS (\n  SELECT {body}\n  FROM {p}_{src_name}\n)")
        return name

    out.append(
        f"{p}_s0 AS (\n  SELECT {cc}hex(encode({value})) AS hx FROM {src}\n)"
    )
    stage("s1", f"{cc}hx, CAST(length(hx) // 2 AS BIGINT) AS n", "s0")
    # --- stripe phase (n >= 32 only; fold skipped via CASE otherwise) ---
    folds = []
    for k, (init, off) in enumerate(
        [(_V1, 0), (_V2, 8), (_V3, 16), (_V4, 24)], start=1
    ):
        lanes = "[%s for xxs in range(n // 32)]" % _lane8(f"32*xxs+{off}+1")
        fold = (
            f"list_reduce(list_prepend({_u(init)}, {lanes}), "
            f"(xxa, xxl) -> ({_round('xxa', 'xxl')}))"
        )
        folds.append(
            f"CASE WHEN n >= 32 THEN {fold} ELSE 0::UBIGINT END AS v{k}"
        )
    stage("s2", f"{cc}hx, n,\n    " + ",\n    ".join(folds), "s1")
    # rotated accumulators + the per-accumulator round(0, v) pre-mix
    rots = ",\n    ".join(
        f"{_rot(f'v{k}', r)} AS r{k}"
        for k, r in [(1, 1), (2, 7), (3, 12), (4, 18)]
    )
    mixes = ",\n    ".join(
        f"{_rot(_m(f'v{k}', _P2), 31)} AS q{k}" for k in range(1, 5)
    )
    stage("s3", f"{cc}hx, n,\n    {rots},\n    {mixes}", "s2")
    rvs = ",\n    ".join(f"{_m(f'q{k}', _P1)} AS rv{k}" for k in range(1, 5))
    stage(
        "s4",
        f"{cc}hx, n,\n    {rvs},\n"
        f"    {_add('r1', 'r2')} AS a12, {_add('r3', 'r4')} AS a34",
        "s3",
    )
    stage(
        "s5",
        f"{cc}hx, n, rv1, rv2, rv3, rv4,\n"
        f"    CASE WHEN n >= 32 THEN {_add('a12', 'a34')} "
        f"ELSE {_u(_H_SHORT)} END AS h0",
        "s4",
    )
    # merge chain: h = (h ^ round(0, v_k)) * P1 + P4, four stages
    prev = "h0"
    for k in range(1, 5):
        keep = ", ".join(f"rv{j}" for j in range(k + 1, 5))
        keep = keep + "," if keep else ""
        merged = _add(_m(f"xor({prev}, rv{k})", _P1), _u(_P4))
        stage(
            f"s{5 + k}",
            f"{cc}hx, n, {keep}\n"
            f"    CASE WHEN n >= 32 THEN {merged} ELSE {prev} END AS h{k}",
            f"s{4 + k}",
        )
        prev = f"h{k}"
    # + length; tail geometry
    stage(
        "s10",
        f"{cc}hx, n, n - (n % 32) AS p0, (n % 32) // 8 AS n8,\n"
        f"    {_add('h4', 'CAST(n AS UBIGINT)')} AS h5",
        "s9",
    )
    # --- 8-byte tail: up to 3 chunks, unrolled ---
    lanes8 = ",\n    ".join(
        f"CASE WHEN n8 > {k} THEN {_lane8(f'p0 + {8 * k} + 1')} "
        f"ELSE 0::UBIGINT END AS tl{k}"
        for k in range(3)
    )
    stage("s11", f"{cc}hx, n, p0, n8, h5,\n    {lanes8}", "s10")
    tq = ",\n    ".join(
        f"{_rot(_m(f'tl{k}', _P2), 31)} AS tq{k}" for k in range(3)
    )
    stage("s12", f"{cc}hx, n, p0, n8, h5,\n    {tq}", "s11")
    tr = ",\n    ".join(f"{_m(f'tq{k}', _P1)} AS tr{k}" for k in range(3))
    stage("s13", f"{cc}hx, n, p0, n8, h5,\n    {tr}", "s12")
    prev = "h5"
    for k in range(3):
        keep = ", ".join(f"tr{j}" for j in range(k + 1, 3))
        keep = keep + "," if keep else ""
        step = _add(_m(_rot(f"xor({prev}, tr{k})", 27), _P1), _u(_P4))
        stage(
            f"s{14 + k}",
            f"{cc}hx, n, p0, n8, {keep}\n"
            f"    CASE WHEN n8 > {k} THEN {step} ELSE {prev} END AS h{6 + k}",
            f"s{13 + k}",
        )
        prev = f"h{6 + k}"
    # --- 4-byte chunk ---
    stage(
        "s17",
        f"{cc}hx, n, h8, p0 + 8 * n8 AS p4, (n % 32) % 8 >= 4 AS has4",
        "s16",
    )
    stage(
        "s18",
        f"{cc}hx, n, h8, has4,\n"
        f"    CASE WHEN has4 THEN p4 + 4 ELSE p4 END AS pb,\n"
        f"    CASE WHEN has4 THEN {_m(_lane4('p4 + 1'), _P1)} "
        f"ELSE 0::UBIGINT END AS l4",
        "s17",
    )
    step4 = _add(_m(_rot("xor(h8, l4)", 23), _P2), _u(_P3))
    stage(
        "s19",
        f"{cc}hx, n, pb,\n"
        f"    CASE WHEN has4 THEN {step4} ELSE h8 END AS h9",
        "s18",
    )
    # --- byte tail: up to 7 bytes, unrolled ---
    bts = ",\n    ".join(
        f"CASE WHEN pb + {k} < n THEN {_m(_byte(f'pb + {k} + 1'), _P5)} "
        f"ELSE 0::UBIGINT END AS w{k}"
        for k in range(7)
    )
    stage("s20", f"{cc}n, pb, h9,\n    {bts}", "s19")
    prev = "h9"
    for k in range(7):
        keep = ", ".join(f"w{j}" for j in range(k + 1, 7))
        keep = keep + "," if keep else ""
        step = _m(_rot(f"xor({prev}, w{k})", 11), _P1)
        stage(
            f"s{21 + k}",
            f"{cc}n, pb, {keep}\n"
            f"    CASE WHEN pb + {k} < n THEN {step} ELSE {prev} END"
            f" AS h{10 + k}",
            f"s{20 + k}",
        )
        prev = f"h{10 + k}"
    # --- avalanche ---
    stage(
        "s28", f"{cc}{_m(f'xor({prev}, {prev} // {_u(1 << 33)})', _P2)} AS ha",
        "s27",
    )
    stage(
        "s29", f"{cc}{_m(f'xor(ha, ha // {_u(1 << 29)})', _P3)} AS hb", "s28"
    )
    stage("h", f"{cc}xor(hb, hb // {_u(1 << 32)}) AS h", "s29")
    return ",\n".join(out)


def xxh64_signed_expr(h: str = "h") -> str:
    """Signed reinterpretation of the unsigned hash column — the exact
    BIGINT value Spark's ``F.xxhash64`` returns."""
    return (
        f"CAST(CASE WHEN {h} >= {1 << 63}::UBIGINT "
        f"THEN {h}::HUGEINT - {_T} ELSE {h}::HUGEINT END AS BIGINT)"
    )
