"""Query registry with a round-aware driver-gate rotation.

The driver's correctness gate checks the FIRST 50 entries of ``queries()``
in iteration order; more than 50 queries are registered (len(ALL_QUERIES)
is the authoritative count), so ordering decides which
get a fresh driver-green CORRECTNESS row each round. A static hand-ordered
list goes stale (VERDICT r7 item 1: the r7 window re-checked the same 50
and let the other 30 age). Instead we order by *least recently
driver-checked*, computed from the committed ``CORRECTNESS_r*.json`` files
at import time:

  1. ``_REGATE`` — queries rewritten THIS round, pinned to the front so the
     driver re-gates the changed code. Edit this list when you rewrite a
     query's plan or oracle AS THE DRIVER SEES IT (the sf0.01 unbucketed
     fixture): a change that only fires on other layouts/sizes — a
     bucketed-input join reorder, a size-guard branch the gate SF doesn't
     take — does not move the driver-visible plan and may be left to the
     normal rotation (VERDICT r11 adjudicated q27 exactly so), but say
     which case you're in when you make that call.
  2. everything else ascending by the last round a driver row exists for
     (never-checked first), ties broken by stable registry order.

This is self-maintaining: each round the driver's new CORRECTNESS file
advances the checked queries' freshness, so next round the 30 unchecked
ones rotate to the front automatically. If the CORRECTNESS files are
unreadable (fresh clone without history) the order degrades to plain
registry order, which is still a valid 50-window.
"""

import json
import re
from pathlib import Path

from flink_cdc_multi_spark.plans.extensions import EXT_ORACLE_SQL, EXT_QUERIES
from flink_cdc_multi_spark.plans.oracle import ORACLE_SQL
from flink_cdc_multi_spark.plans.queries import QUERIES, load_table

# Queries rewritten this round — force into the driver window for re-gating.
# (New queries sort to the front automatically: never-checked queries rank
# before any checked one.)
#
# Pins are (query, round_pinned) and AUTO-EXPIRE (VERDICT r14 item 1): once a
# committed CORRECTNESS_r*.json from round >= round_pinned contains a PASSING
# row for the query, the pin has done its job and is ignored, so stale pins
# can never push least-recently-checked queries out of the next round's
# 50-window (the r14 round-boundary red: three r13-green queries were
# displaced by pins whose queries already had fresh r14 rows). The round stamp
# is what lets a pin coexist with the PREVIOUS round's green row for the same
# query — pin round N's plan changes as (name, N) and never clear by hand.
_REGATE: list[tuple[str, int]] = [
    # r18 optimization round wave 1: labelprop's broadcast lane folds
    # each round's two-aggregate argmax chain into ONE
    # mode(lbl, deterministic=true) aggregate — plan changed, labels
    # bit-identical (tie contract pinned in tests + ABAB tool)
    ("ext_graph_labelprop", 18),
    # r18 optimization round wave 2: line_dedup onepass lane (shared
    # h-repartition exchange, (is_ws, h) SHJ probe) + the ADVICE r17
    # whitespace-key guard in both lanes — plan changed, rows identical
    ("ext_dedup_lines", 18),
    # r18 optimization round wave 3: the BPE encode rides the Arrow
    # rank-dict kernel (bit-identical to the chain by pinned contract);
    # wave 3b adds pack_offsets' count barrier (count evaluates once per
    # doc — also reshapes ext_pack_sequences' counted frame). Plans
    # changed, values identical at every SF (checksummed sf0.1/1/10)
    ("ext_text_bpe", 18),
    ("ext_pack_bpe", 18),
    ("ext_pack_sequences", 18),
    # r17: the five sketch gate queries switched their portable-hash
    # contract from md5-hash60 to xxhash64 (Spark F.xxhash64 + the
    # generated DuckDB XXH64 chain in functions/xxh64_sql) — every
    # register/hash value in the results changed
    ("ext_sketch_hll", 17),
    ("ext_sketch_hll_merge", 17),
    ("ext_sketch_kmv", 17),
    ("ext_sketch_kmv_jaccard", 17),
    ("ext_sketch_cms", 17),
    # r17: binned join rebuilt on operators/intervals.interval_join and
    # the probe pre-agg keys on p_ts alone (bucket is derived) — plan
    # changed, values must not
    ("ext_events_interval_join", 17),
    # r17: array_distinct pre-pass removed from both HLL token feeds
    # (covered by the hll pins above, noted for the record)
    # r17 optimization round: graph iteration refactor (explode
    # symmetrization; pagerank's per-iteration pr⨝deg join folded into
    # the contribution aggregate) — plans changed, values bit-identical
    ("ext_graph_pagerank", 17),
    ("ext_graph_labelprop", 17),
    # r17 optimization round: triangle joins shuffle_hash-hinted
    # (SortMergeJoin×2 → SHJ, no sorts) — plan changed, values identical
    ("ext_graph_triangles", 17),
    # r17 optimization round: rollup queries aggregate to the
    # (flag, status) base BEFORE rolling up — Catalyst's Expand fan-out
    # moves from |lineitem| to |groups| rows (guide §2.3). Plans
    # changed, values bit-identical (decomposable sums; integral qty)
    ("ext_rollup_agg", 17),
    ("q30", 17),
    # r17 optimization round: kcenter_greedy small-corpus driver-local
    # fast path — the driver-visible plan (LocalTableScan of the picks)
    # is unchanged, but the value-computing path is new at the gate SF;
    # conservative re-gate (picks pinned bit-equal to the distributed
    # kernel in tests/test_extensions.py)
    ("ext_sample_kcenter", 17),
    # r17 optimization round: ivf_topk_fixed fused — query set collected
    # at plan time (the brute_force_topk shape), cells + candidate masks
    # + cosine scored in ONE mapInPandas pass with bit-identical
    # left-to-right fold arithmetic; deletes the duplicated corpus-side
    # cell_of ArrowEvalPython pair, the probes_of hop, the broadcast
    # join, and the interpreted per-pair cosine fold. Plan changed,
    # values bit-identical (fused==unfused pinned in tests + the ABAB
    # tool's 4-dir sorted-collect equality incl. adversarial)
    ("ext_ann_ivf", 17),
    # r17 optimization round: lsh_topk fused the same way (the corpus-side
    # sig UDF was ALSO double-evaluated; membership masks replace the
    # probe-explode join + pair-key dropDuplicates). Values bit-identical
    # (same fused==unfused pins + 4-dir equality incl. adversarial)
    ("ext_ann_lsh", 17),
    # r17 optimization round wave 7: the remaining md5-hash60 contract
    # queries moved to the xxhash64 fast lane (Spark F.xxhash64 replayed
    # by the generated DuckDB XXH64 chain per DISTINCT value, the
    # sketch-gate pattern) — hash-keyed VALUES changed where hashes are
    # load-bearing (quality_score buckets, canonical picks under
    # collision), every query re-gated at sf0.001 + sf0.01 + adversarial
    ("ext_text_commonness", 17),
    ("ext_text_tfidf", 17),
    ("ext_text_quality_score", 17),
    # …and wave 8 changed their topology again under the same pins:
    # ext_dedup_spans is the unique-complement form (no h join;
    # n_dup = n_windows − owned-unique count) and drop_duplicate_spans
    # derives the window stream ONCE (repartition(h) + ReusedExchange +
    # SHJ) — values identical both times (ABAB sorted-collect equality
    # at 5 dirs incl. adversarial; oracle SQL untouched)
    ("ext_dedup_spans", 17),
    ("ext_dedup_spans_drop", 17),
    ("ext_dedup_lines", 17),
    ("ext_contamination", 17),
    # composes quality_score, so its best-pick scores ride the new
    # bucket rule too (oracle's hand-rolled md5 replica fixed in the
    # same commit — the r14 hand-copy finding strikes again)
    ("ext_dedup_cluster_best", 17),
    # r16: ext_layout_zorder's dims now cross a Generate barrier before
    # the spread chain (plan changed after first registration this round)
    ("ext_layout_zorder", 16),
    # r16: url_canonicalize regex fixes (authority-anchored port strip,
    # non-greedy re-anchor) + multi-param gate synthesis on BOTH sides
    ("ext_dedup_urls", 16),
    # r16: oracle's luma residue sign-normalized for negative doc_ids
    # (the Spark-side generator was already non-negative-mod)
    ("ext_multimodal_video", 16),
    # r15: gated plan now takes the size-guarded broadcast_ranks form at the
    # gate SF (SHJ rank exchange deleted per iteration) — executed plan is new
    ("ext_graph_pagerank", 15),
    # (ext_dedup_semantic keeps its fixed-cell plan; the trained-centroid
    # form landed as the NEW query ext_dedup_semantic_trained, which fronts
    # automatically as never-checked)
]


def _row_passed(row) -> bool:
    """A CORRECTNESS row counts as 'checked' only if it PASSED.

    Failed rows (err non-null, or rows/hash mismatch) must keep the query
    stale so it stays at the front of the driver's 50-window until green —
    otherwise a red query rotates to the back and goes unverified.
    """
    if not isinstance(row, dict):
        return False
    return (
        row.get("err") is None
        and row.get("rows_match") is True
        and row.get("hash_match", True) is not False
        and row.get("schema_match", True) is not False
    )


def _last_checked_rounds() -> dict[str, int]:
    """query name -> most recent round with a PASSING driver row."""
    rounds: dict[str, int] = {}
    repo_root = Path(__file__).resolve().parents[2]
    for path in repo_root.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if _row_passed(row):
                rounds[name] = max(rounds.get(name, -1), rnd)
    return rounds


_merged = {**QUERIES, **EXT_QUERIES}
_registry_index = {name: i for i, name in enumerate(_merged)}
_checked = _last_checked_rounds()

# Auto-expire: a pin whose query already has a passing row in a round at or
# after the pin's own round has been re-gated — drop it so it stops occupying
# window space.
_ACTIVE_REGATE: list[str] = [
    name for name, pin_round in _REGATE if _checked.get(name, -1) < pin_round
]


def _gate_order(name: str) -> tuple[int, int, int]:
    pinned = (
        _ACTIVE_REGATE.index(name) if name in _ACTIVE_REGATE else len(_ACTIVE_REGATE)
    )
    return (pinned, _checked.get(name, -1), _registry_index[name])


ALL_QUERIES = {name: _merged[name] for name in sorted(_merged, key=_gate_order)}
assert len(ALL_QUERIES) == len(_merged)

ALL_ORACLE_SQL = {**ORACLE_SQL, **EXT_ORACLE_SQL}

__all__ = [
    "QUERIES",
    "EXT_QUERIES",
    "ALL_QUERIES",
    "ORACLE_SQL",
    "EXT_ORACLE_SQL",
    "ALL_ORACLE_SQL",
    "load_table",
]
