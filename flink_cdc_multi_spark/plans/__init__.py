from flink_cdc_multi_spark.plans.extensions import EXT_ORACLE_SQL, EXT_QUERIES
from flink_cdc_multi_spark.plans.oracle import ORACLE_SQL
from flink_cdc_multi_spark.plans.queries import QUERIES, load_table

# The driver's correctness gate checks the FIRST 50 entries of queries()
# in iteration order. 80 queries are registered, so ordering decides which
# get a driver-green CORRECTNESS row. Priority (VERDICT r6 item 2):
#   1. the 30 queries added mid-r5/r6 that have never had a driver row,
#   2. queries rewritten this round (re-gate after change),
#   3. the q01-q14 BASELINE gate suite, then remaining q-shapes;
#   4. the r6-green extension queries (locally re-verified each round).
_DRIVER_GATE_FIRST = [
    # -- never driver-checked as of r6 (CORRECTNESS_r06 has no row) --
    "ext_window_running",
    "ext_sessionize",
    "ext_cdc_scd2",
    "ext_asof_join",
    "ext_sample_stratified",
    "ext_mixture_sample",
    "ext_text_commonness",
    "ext_text_bigrams",
    "ext_text_vocab",
    "ext_contamination",
    "ext_text_repetition",
    "ext_dedup_clusters",
    "ext_text_chunks",
    "ext_events_funnel",
    "ext_events_retention",
    "ext_events_json",
    "ext_events_sliding",
    "ext_window_range",
    "ext_graph_triangles",
    "ext_text_redact",
    "ext_cdc_ivm",
    "ext_multimodal_audio",
    "ext_multimodal_jpeg",
    "ext_multimodal_gifbmp",
    "ext_events_topk",
    "ext_embed_centroid",
    "ext_profile_orders",
    "ext_sketch_kmv",
    "ext_dedup_priority",
    "ext_budget_sample",
    # -- rewritten in r7: re-gate --
    "ext_dedup_minhash",
    "ext_dedup_minhash_md5",
    "q21",
    # -- the BASELINE gate suite + remaining q-shapes --
    *[f"q{i:02d}" for i in range(1, 21)],
    "q22",
]

_merged = {**QUERIES, **EXT_QUERIES}
ALL_QUERIES = {name: _merged[name] for name in _DRIVER_GATE_FIRST}
ALL_QUERIES.update({n: f for n, f in _merged.items() if n not in ALL_QUERIES})
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
