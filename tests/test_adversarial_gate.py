"""Adversarial-fixture gate (VERDICT r6 item 8): build the hostile SF from
tools/gen_adversarial_sf.py (NULLs everywhere, NULL-user_id events with
valid ts, trailing-newline sources, empty/unicode text, zero vectors,
boundary numerics) and run the SAME Spark-vs-DuckDB compare the driver
runs — over the queries whose cross-engine parity the hostile rows
actually stress.

The driver regenerates /root/testdata between rounds; any query whose
parity silently depends on "the fixture never contains X" is a latent
gate failure. This test makes the property a committed green sweep
instead of a per-round discovery (ADVICE r6 found two such hazards:
USING-join NULL drops in funnel/retention, Java-vs-RE2 `$` in priority).
"""

from __future__ import annotations

import subprocess
import sys

import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from check_oracle import check_one, oracle_connection  # noqa: E402

SRC_SF = "/root/testdata/sf0.001"

# Queries over the tables that receive hostile rows (events, documents,
# embeddings, orders, lineitem, customer...). The pure-dim and
# multimodal/index queries are covered by the normal gate; re-running
# them here would triple suite time without new signal.
ADVERSARIAL_QUERIES = [
    # events: NULL row, NULL-user_id + valid ts, malformed/decimal JSON,
    # pre-epoch ts, extreme values
    "ext_events_funnel",
    "ext_events_retention",
    "ext_events_sliding",
    "ext_events_json",
    "ext_events_topk",
    "ext_window_range",
    "ext_window_running",
    "ext_sessionize",
    # documents: NULL/empty/whitespace/unicode text, dup texts across
    # sources, trailing-newline source
    "ext_dedup_priority",
    "ext_dedup_exact",
    "ext_dedup_ngram",
    "ext_dedup_fingerprint",
    "ext_text_quality",
    "ext_text_langid",
    "ext_text_tokens_by_lang",
    "ext_text_chunks",
    "ext_text_redact",
    "ext_budget_sample",
    "ext_sketch_kmv",
    "ext_text_vocab",
    # embeddings: zero vector (try_divide/zero-norm contract), negative ids
    "ext_dedup_embedding",
    "ext_embed_quantize",
    # TPC-H side: NULL fact columns, negative keys, boundary decimals
    "q01",
    "q06",
    "q14",
    "q21",
    "q22",
    "ext_profile_orders",
]


@pytest.fixture(scope="module")
def adv_sf(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("adv") / "sf")
    subprocess.run(
        [sys.executable, "/root/repo/tools/gen_adversarial_sf.py", SRC_SF, dst],
        check=True,
        capture_output=True,
        timeout=300,
    )
    return dst


def test_adversarial_sweep_is_gate_green(spark, adv_sf):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = oracle_connection(adv_sf)
    failures = []
    for name in ADVERSARIAL_QUERIES:
        n, problems = check_one(spark, con, qs[name], oracles[name], adv_sf)
        if problems:
            failures.append((name, problems))
    assert not failures, failures


def test_adversarial_rows_actually_reach_the_queries(spark, adv_sf):
    """Guard the guard: the hostile rows must be IN the scanned data (a
    refactor of the generator that silently stops appending would turn
    the sweep above into a no-op green)."""
    ev = spark.read.parquet(f"{adv_sf}/events.parquet")
    assert ev.filter("event_id < 0").count() >= 7
    assert (
        ev.filter("user_id IS NULL AND ts IS NOT NULL").count() >= 2
    ), "NULL-user_id/valid-ts rows missing (ADVICE r6 fixture)"
    docs = spark.read.parquet(f"{adv_sf}/documents.parquet")
    assert docs.filter("doc_id < 0").count() >= 7
    assert (
        docs.filter("source LIKE '%' || chr(10)").count() >= 1
    ), "trailing-newline source row missing (ADVICE r6 fixture)"
