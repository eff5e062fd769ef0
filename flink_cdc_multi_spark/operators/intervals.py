"""Binned interval (range) join — the scalable form of
``probe.point BETWEEN interval.start AND interval.end`` (r17: promoted
from ext_events_interval_join's inline plan per VERDICT r16 item 5, so
the 13x-measured rewrite is reusable outside the gate query).

Why not the naive join: Catalyst plans a pure non-equi theta join as
BroadcastNestedLoopJoin — quadratic work and a broadcast of one whole
side, the 100 TB killer (plan-pinned out in test_plan_quality). The
binned form explodes each interval to the fixed-width buckets it covers,
buckets each probe point into exactly ONE bucket (``point div width``),
joins EQUI on the int64 bucket id, and applies the exact containment as
a post-join filter:

- exact: integer ``div`` is monotone, so a contained point's bucket
  always lies in the interval's bucket range — no pair is missed;
- each pair appears EXACTLY once (the probe has one bucket), so there
  is no dedup exchange;
- the one shuffle is an equi exchange on the bucket id; peak-hour
  buckets are ordinary key skew, which AQE skew-join splits, and
  ``bucket_width`` is the balance knob.

Fan-out bound: an interval spanning B buckets emits B rows. Callers
whose interval lengths are structurally bounded (e.g. sessionize's
gap·n_events bound) can leave ``max_buckets_per_interval=None``; for
UNBOUNDED interval sources pass a limit plus ``on_overflow`` ("error"
fails the job via assert_true before the fan-out materializes — ANSI
surface; "drop" excludes the hostile interval and keeps the pipeline
alive). A production variant for legitimately-long intervals is a
two-level bucket hierarchy — out of scope until a workload needs it
(documented here so the limit isn't mistaken for an oversight).

The aggregate-before-join trick (collapse probes with identical
(bucket, point) to one weighted row BEFORE the join — 2.58B → 26M pairs,
55.3 → 4.1 s at sf10, PERF.md r16) is a CALLER pattern: pre-aggregate
the probe frame and sum the weight after; ext_events_interval_join shows
the shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__ij_bucket"
_NB = "__ij_nb"


def interval_join(
    intervals: DataFrame,
    probes: DataFrame,
    start_col: str,
    end_col: str,
    point_col: str,
    bucket_width: int,
    max_buckets_per_interval: int | None = None,
    on_overflow: str = "error",
) -> DataFrame:
    """Join every probe row to every interval row whose
    ``[start_col, end_col]`` (inclusive both ends) contains its
    ``point_col`` — all integer-typed (epoch ms is the canonical use).

    Returns interval columns + probe columns (names must be disjoint).
    Rows with NULL start/end/point never match (dropped before the
    join — the SQL BETWEEN-with-NULL contract); inverted intervals
    (end < start) match nothing and are dropped with them."""
    if on_overflow not in ("error", "drop"):
        raise ValueError(f"on_overflow must be 'error'|'drop': {on_overflow}")
    overlap = set(intervals.columns) & set(probes.columns)
    if overlap:
        raise ValueError(
            f"interval/probe column names must be disjoint, both have: "
            f"{sorted(overlap)}"
        )
    b = int(bucket_width)
    if b <= 0:
        raise ValueError(f"bucket_width must be positive: {bucket_width}")
    ivl = intervals.filter(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(start_col) <= F.col(end_col))
    )
    first_b = F.expr(f"{start_col} div {b}")
    last_b = F.expr(f"{end_col} div {b}")
    if max_buckets_per_interval is not None:
        nb = (last_b - first_b + F.lit(1)).alias(_NB)
        lim = int(max_buckets_per_interval)
        if on_overflow == "drop":
            ivl = ivl.withColumn(_NB, nb).filter(
                F.col(_NB) <= lim
            ).drop(_NB)
        else:
            # assert_true raises INSIDE the scan stage, BEFORE the
            # sequence fan-out can materialize a monster row. It must be
            # LOAD-BEARING in the plan: projected-then-dropped it is
            # column-pruned away silently (measured — the first draft
            # never fired), so it rides a filter (NULL on pass → isNull
            # keeps every surviving row).
            ivl = ivl.filter(
                F.assert_true(
                    nb <= F.lit(lim),
                    F.concat(
                        F.lit(
                            f"interval_join: interval spans more than "
                            f"{lim} buckets of width {b} ("
                        ),
                        nb.cast("string"),
                        F.lit(
                            "); widen bucket_width, raise the limit, or "
                            "use on_overflow='drop'"
                        ),
                    ),
                ).isNull()
            )
    exploded = ivl.withColumn(
        _BUCKET, F.explode(F.sequence(first_b, last_b))
    )
    pr = probes.filter(F.col(point_col).isNotNull()).withColumn(
        _BUCKET, F.expr(f"{point_col} div {b}")
    )
    return (
        exploded.join(pr, _BUCKET)
        .filter(F.col(point_col).between(F.col(start_col), F.col(end_col)))
        .drop(_BUCKET)
    )
