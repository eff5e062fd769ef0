"""Skew mitigation utilities (SURVEY.md §7 scale design).

When each tool applies, at 100 TB:

- **Associative aggregates** (count/sum/min/max/min_by/max_by): need
  NOTHING here — partial (map-side) aggregation already collapses hot
  keys before the shuffle. This repo's materializations are built that
  way on purpose (operators/cdc.latest_image, PERF.md design rules).
- **Post-shuffle partition skew** in sort-merge joins: AQE's skew-join
  split handles it (`spark.sql.adaptive.skewJoin.enabled`, on in
  session.py) by splitting oversized partitions and replicating the
  matching build-side partition.
- **A single hot key in a shuffled equi-join** where the build side is
  too big to broadcast and AQE's split granularity still leaves one
  partition dominated by ONE key (AQE can split a partition, but every
  probe row of a key must still meet every build row of that key):
  SALTING — this module. The probe side spreads each key over
  ``n_salts`` buckets; the build side replicates each row into all
  buckets; the join key becomes (key, salt), so the hot key's work
  lands on n_salts tasks instead of one.

Cost model: build side is replicated n_salts×, so salt counts should be
small (8-32) and the technique only pays when probe-side hot-key volume
dominates build-side size — the classic "billions of events for one
user_id joined to a per-user dimension too large to broadcast" shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_probe(df: DataFrame, n_salts: int, salt_cols: list[str] | None = None) -> DataFrame:
    """Deterministically spread each row of the (large, skewed) probe side
    over ``n_salts`` buckets. The salt is a hash of ``salt_cols`` (default:
    ALL columns) — row-stable (re-executions of a lost task re-derive the
    same salt, which a random salt would not survive under Spark's
    task-retry semantics) and uniform as long as those columns vary.

    LIMITATION: EXACT-duplicate rows (identical across the salt columns)
    hash to ONE bucket — no deterministic function can split identical
    rows. If the hot key's rows are near-duplicates, that is the signal
    to aggregate BEFORE joining (carry a count column; q10's pre-agg
    shape) rather than to salt at all."""
    cols = salt_cols if salt_cols is not None else df.columns
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))
    )


def replicate_build(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate every build-side row into all ``n_salts`` salt buckets
    (explode of a 0..n-1 sequence — n_salts× the build side, the price of
    spreading the hot key's probe work)."""
    return df.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key_cols: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side's hot keys spread across ``n_salts``
    buckets. Result-identical to ``probe.join(build, key_cols, how)`` for
    'inner' and 'left' joins (pinned by test_skew.py); the salt column is
    dropped from the output.

    The physical win: without salting, every row of a hot key hashes to
    ONE reduce task (a 10-billion-row key = one straggler task); with
    salting the same key occupies n_salts tasks, each joining against a
    replicated copy of the key's build rows. Use ONLY when the build
    side cannot broadcast and AQE skew-split still leaves a dominant
    key; for associative aggregation after the join, prefer aggregating
    BEFORE joining instead (q10's pre-agg shape)."""
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join preserves semantics for inner/left joins only "
            f"(got {how!r}); right/outer would need the salt on the other side"
        )
    p = salt_probe(probe, n_salts)
    b = replicate_build(build, n_salts)
    return p.join(b, [*key_cols, SALT_COL], how).drop(SALT_COL)
