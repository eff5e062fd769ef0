"""Adversarial fixture builder: copy an sf dir and append hostile rows —
NULLs in every nullable column, empty/whitespace/unicode text, malformed
and decimal JSON, zero vectors, boundary numerics — then run the normal
oracle gate against it.

    python tools/gen_adversarial_sf.py /root/testdata/sf0.001 /tmp/adv_sf
    python tools/check_oracle.py /tmp/adv_sf

The point: the driver REGENERATES /root/testdata between rounds, so any
query whose cross-engine parity silently depends on "the fixture never
contains X" is a latent gate failure. Every query must either process
these rows identically in both engines or exclude them identically
(explicit, mirrored guards). This tool makes that property testable on
demand instead of discovered per-round.
"""

from __future__ import annotations

import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _append(src: str, dst: str, name: str, rows: list[dict]) -> None:
    table = pq.read_table(f"{src}/{name}.parquet")
    if rows:
        extra = pa.Table.from_pylist(rows, schema=table.schema)
        table = pa.concat_tables([table, extra])
    pq.write_table(table, f"{dst}/{name}.parquet")


def adversarial_rows(name: str, schema: pa.Schema) -> list[dict]:
    """Hostile rows per table; ids are negative so they never collide and
    DO fall inside `id < N` query scopes. Datetime columns adapt to the
    fixture vintage (TIMESTAMP vs nanos-as-int64)."""
    import datetime as dt

    def ts_val(field: str, y, mo, d, h=0, mi=0, s=0):
        t = schema.field(field).type
        stamp = dt.datetime(y, mo, d, h, mi, s)
        if pa.types.is_integer(t):  # TIMESTAMP(NANOS) vintage read as int64
            return int(stamp.replace(tzinfo=dt.timezone.utc).timestamp() * 1e9)
        return stamp

    if name == "events":
        return [
            {"event_id": -1, "ts": None, "user_id": None, "event_type": None,
             "value": None, "props": None},
            {"event_id": -2, "ts": ts_val("ts", 2024, 1, 1), "user_id": -5,
             "event_type": "weird-type", "value": 84.5, "props": "not json"},
            {"event_id": -3, "ts": ts_val("ts", 2024, 1, 1, 0, 0, 1),
             "user_id": -5, "event_type": "purchase", "value": -0.005,
             "props": '{"k": "3.5"}'},
            {"event_id": -4, "ts": ts_val("ts", 2024, 1, 1, 0, 0, 1),
             "user_id": -5, "event_type": "click", "value": 1e9,
             "props": '{"k": "7\\n"}'},
            {"event_id": -5, "ts": ts_val("ts", 1999, 12, 31, 23, 59, 59),
             "user_id": -6, "event_type": "signup", "value": 0.0,
             "props": '{"k": -12}'},
            # NULL user_id with a VALID ts (ADVICE r6): a USING(user_id)
            # join drops this row while groupBy/Window keeps NULL as a
            # group — funnel/retention must pin the contract identically.
            {"event_id": -6, "ts": ts_val("ts", 2024, 1, 2), "user_id": None,
             "event_type": "view", "value": 2.5, "props": '{"k": 1}'},
            {"event_id": -7, "ts": ts_val("ts", 2024, 1, 3), "user_id": None,
             "event_type": "purchase", "value": 9.0, "props": None},
        ]
    if name == "documents":
        return [
            {"doc_id": -1, "text": None, "lang": None, "source": None,
             "n_chars": None},
            {"doc_id": -2, "text": "", "lang": "en", "source": "nodigits",
             "n_chars": 0},
            {"doc_id": -3, "text": "   ", "lang": "de", "source": "src1",
             "n_chars": 3},
            {"doc_id": -4, "text": "\t\n xé Ω ", "lang": "fr",
             "source": "src2", "n_chars": 9},
            {"doc_id": -5, "text": "dup dup dup dup", "lang": "en",
             "source": "src3", "n_chars": 15},
            {"doc_id": -6, "text": "dup dup dup dup", "lang": "en",
             "source": "src1", "n_chars": 15},
            # trailing-newline source (ADVICE r6): Java-regex $ matches
            # before a final \n, RE2 $ does not — priority extraction must
            # use the \z whole-text anchor in BOTH engines.
            {"doc_id": -7, "text": "dup dup dup dup", "lang": "en",
             "source": "src0\n", "n_chars": 15},
            # DDL-text rows (VERDICT r9 item 2): q08's RLIKE vs
            # REGEXP_MATCHES contract was never exercised on a MATCHING
            # row (0 rows at every tested SF = vacuous green). Match rows
            # cover each keyword with each whitespace class both engines'
            # \s agree on (space, tab, newline — NOT \x0B, where Java \s
            # and RE2 \s diverge; keep \x0B out of text columns or the
            # \s+ tokenizers split differently). Near-miss rows pin the
            # negative side: keyword+letter and keyword-at-end-of-text
            # must match in NEITHER engine.
            {"doc_id": -8, "text": "CREATE TABLE users (id INT)",
             "lang": "en", "source": "src1", "n_chars": 27},
            {"doc_id": -9, "text": "please drop\tthe index now",
             "lang": "en", "source": "src2", "n_chars": 25},
            {"doc_id": -10, "text": "AlTeR\nsession set x=1",
             "lang": "de", "source": "src3", "n_chars": 21},
            {"doc_id": -11, "text": "created a new file yesterday",
             "lang": "en", "source": "src1", "n_chars": 28},
            {"doc_id": -12, "text": "nothing left to alter",
             "lang": "fr", "source": "src2", "n_chars": 21},
            # duplicate-LINE rows (r12, ext_dedup_lines — the q08 pattern:
            # the clean fixture has no newlines, so the line-dedup
            # semantics are only exercised here). Winner of the shared
            # line is min (doc_id, pos) = (-15, 0): -15 keeps its first
            # copy and drops its in-doc repeat; -13/-14 drop their copies.
            # -16 pins that whitespace-only lines NEVER dedup.
            {"doc_id": -13, "text": "shared line alpha\nunique to thirteen",
             "lang": "en", "source": "src1", "n_chars": 36},
            {"doc_id": -14, "text": "intro text\nshared line alpha\nmore after",
             "lang": "en", "source": "src2", "n_chars": 39},
            {"doc_id": -15, "text": "shared line alpha\nshared line alpha",
             "lang": "en", "source": "src3", "n_chars": 35},
            {"doc_id": -16, "text": "   \nbelow a blank-ish line\n   ",
             "lang": "en", "source": "src1", "n_chars": 30},
            # duplicate-SPAN rows (r14, ext_dedup_spans_drop): ≥5-token
            # spans so the normal (non-whole-text) window path is
            # exercised on hostile ids. -17 repeats a 5-token span
            # within one doc (keep-first: the pos-0 occurrence is
            # canonical, later occurrences excised, overlapping windows
            # union their positions); -18 embeds the same span mid-text
            # (cross-doc excision: canonical is (-18, 2) < (-17, 0)
            # by id order, so BOTH -17 occurrences drop). The short-doc
            # dup rows (-5/-6/-7) already pin the whole-text-window
            # removal convention.
            {"doc_id": -17,
             "text": "alpha beta gamma delta epsilon alpha beta gamma delta epsilon tail",
             "lang": "en", "source": "src2", "n_chars": 66},
            {"doc_id": -18,
             "text": "lead in alpha beta gamma delta epsilon out",
             "lang": "en", "source": "src3", "n_chars": 42},
            # SINGLE-DOC language (r15, ext_sketch_histogram): with n=1
            # the integer-ceil quantile rule collapses p50/p90/p99 onto
            # the one bucket — the tiny-n edge the gate must pin on both
            # engines (every fixture lang otherwise has 70+ docs and the
            # claim would be vacuous; r15 review finding). 31 chars →
            # bucket 1 → all three lower bounds = 16.
            {"doc_id": -19, "text": "the only document in this lang",
             "lang": "xx", "source": "src0", "n_chars": 31},
        ]
    if name == "embeddings":
        dim = 0
        t = pq.read_table(f"{sys.argv[1]}/embeddings.parquet")
        if t.num_rows:
            dim = len(t.column("embedding")[0].as_py())
        return [
            {"vec_id": -1, "embedding": [0.0] * dim, "label": None},
            {"vec_id": -2, "embedding": [-1e-7] * dim, "label": -3},
            # NULL embedding (r11): a single NULL row must not kill any
            # numpy kernel (valid_vectors drops it; oracles mirror with
            # embedding IS NOT NULL) — negative id < 20 also makes it a
            # QUERY for the ann family, exercising the collect-side skip
            {"vec_id": -3, "embedding": None, "label": 1},
            # RAGGED embedding (r11): wrong dimension must be dropped by
            # the size guard (and len(embedding) = 64 in the oracles),
            # never reach an np.stack; quantize/centroid process it
            # per-element identically in both engines
            {"vec_id": -4, "embedding": [0.5, -0.25, 0.125], "label": 2},
            # OVER-LENGTH ragged embedding (r12, ADVICE r11): a query-side
            # row LONGER than the true dimension must not redefine the
            # inferred dim (brute_force_topk infers the MODAL length, and
            # the gated queries pass dim=64 explicitly) — a max-based
            # inference would drop every valid query and return empty
            {"vec_id": -5, "embedding": [0.25] * (dim + 1), "label": 3},
        ]
    if name == "orders":
        return [
            {"o_orderkey": -1, "o_custkey": None, "o_orderstatus": None,
             "o_totalprice": None, "o_orderdate": None, "o_orderpriority": None},
            {"o_orderkey": -2, "o_custkey": -9, "o_orderstatus": "F",
             "o_totalprice": -0.005, "o_orderdate": __import__("datetime").datetime(1992, 1, 1),
             "o_orderpriority": "1-URGENT"},
            # NULL custkey with status 'F' (VERDICT r9 item 4): flows a
            # NULL KEY into q29's EXCEPT left branch — set ops use
            # grouping equality, so the NULL must SURVIVE (no NULL on the
            # 'O' side) in BOTH engines, while an =-keyed anti join would
            # drop it. NB: for q11 this row is a pinned cross-engine
            # contract: the Spark fold's semi join drops the NULL key by
            # equality, so the oracle's NOT IN subquery must filter
            # `o_custkey IS NOT NULL` (a bare ANSI NOT IN with a NULL in
            # the list would three-valued-empty the result). q11 is in
            # ADVERSARIAL_QUERIES to keep both sides honest.
            {"o_orderkey": -3, "o_custkey": None, "o_orderstatus": "F",
             "o_totalprice": 1.0, "o_orderdate": __import__("datetime").datetime(1993, 1, 1),
             "o_orderpriority": "5-LOW"},
        ]
    if name == "lineitem":
        return [
            {"l_orderkey": -2, "l_partkey": None, "l_suppkey": None,
             "l_linenumber": 1, "l_quantity": None, "l_extendedprice": None,
             "l_discount": None, "l_tax": None, "l_returnflag": None,
             "l_linestatus": None, "l_shipdate": None},
            {"l_orderkey": -2, "l_partkey": -3, "l_suppkey": -4,
             "l_linenumber": 2, "l_quantity": 0.0, "l_extendedprice": 0.005,
             "l_discount": 1.0, "l_tax": 0.0, "l_returnflag": "Z",
             "l_linestatus": "Z", "l_shipdate": __import__("datetime").datetime(1992, 1, 2)},
        ]
    if name == "customer":
        return [
            {"c_custkey": -9, "c_name": None, "c_nationkey": None,
             "c_mktsegment": None, "c_acctbal": None},
            {"c_custkey": -10, "c_name": "x", "c_nationkey": 0,
             "c_mktsegment": "SEG-", "c_acctbal": -0.005},
        ]
    if name == "supplier":
        return [
            {"s_suppkey": -4, "s_name": None, "s_nationkey": None,
             "s_acctbal": None},
        ]
    if name == "part":
        return [
            {"p_partkey": -3, "p_name": None, "p_brand": None, "p_type": None,
             "p_size": None, "p_retailprice": None},
        ]
    return []  # region/nation: tiny fixed dims, left as-is


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    shutil.rmtree(dst, ignore_errors=True)
    import os

    os.makedirs(dst)
    for name in TABLES:
        schema = pq.read_schema(f"{src}/{name}.parquet")
        rows = adversarial_rows(name, schema)
        # pyarrow from_pylist needs parseable timestamps; normalize str -> None
        # mismatch is handled by the schema cast inside from_pylist
        _append(src, dst, name, rows)
        print(f"{name}: +{len(rows)} adversarial rows")


if __name__ == "__main__":
    main()
