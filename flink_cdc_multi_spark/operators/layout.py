"""Z-order (Morton) multi-column layout — the file-skipping tool for tables
filtered on MORE THAN ONE column.

A single-column sort makes parquet min/max statistics razor-sharp on that
column and useless on every other: sorting events by ``user_id`` means a
``ts`` predicate still touches every file. Interleaving the bits of two
(bucketed) sort dimensions into one Morton key and range-partitioning on it
gives every file a small bounding RECTANGLE in (dim_a, dim_b) space instead
of a thin stripe — so min/max pruning (parquet row-group stats, manifest
dt-stats, Delta/Iceberg file stats) cuts scans for predicates on EITHER
dimension or both. This is exactly the layout strategy Delta Lake's
``OPTIMIZE ZORDER BY`` and Iceberg's z-ordered rewrites apply before
100 TB scans; here it composes with the repo's own pruning surfaces (the
parquet row-group pruning Spark applies from pushed filters, and the
manifest dt-stats pruning in ``operators/routing.read_published``).

Scale shape: ONE pass — a scan-local bucket+interleave projection, then a
single ``repartitionByRange`` exchange on the z-key with a within-partition
sort. No joins, no windows, no driver data besides the ~|buckets| quantile
boundaries per dimension (computed by ``approxQuantile`` in one distributed
pass, the documented eager-build pattern). The bit-spreading uses the
classic 5-step magic-mask construction (Morton 1966 / "Bit Twiddling
Hacks"). The write path's default kernel is an Arrow-batched vectorized
searchsorted+spread (``_zkey_pandas_udf``) — the pure-expression form is
kept (and tested key-identical) but pays interpreted CodegenFallback
evaluation of the bucket lambda, measured 5-13× slower at sf10 (PERF.md
r16); the GATE query (ext_layout_zorder) uses the pure-JVM expression
kernel on raw ints, which is the oracle-replayed contract.

Quantile (equal-FREQUENCY) bucketing, not equal-width: real columns are
skewed, and equal-width buckets would put most rows in a few z-cells,
destroying the rectangle guarantee. Boundary arrays are small literals
(≤ n_buckets-1 doubles per dim) evaluated by a comparison-only array
lambda — cheap per row, no regex/CSE hazard.

The interleave kernel itself (``morton2``) is exact int64 arithmetic and
replayed bit-for-bit by the DuckDB oracle of ``ext_layout_zorder`` (masks
shared as decimal literals via ``MORTON_MASKS``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2-D bit-spread magic masks (64-bit): after x &= (2^21 - 1), the chain
# (x | x<<16)&M0, (x | x<<8)&M1, (x | x<<4)&M2, (x | x<<2)&M3,
# (x | x<<1)&M4 places bit i of x at bit 2i. Decimal (not hex) so the
# DuckDB oracle can embed the SAME literals verbatim.
MORTON_BITS = 21
MORTON_INPUT_MASK = (1 << MORTON_BITS) - 1  # 2097151
MORTON_MASKS = (
    281470681808895,  # 0x0000FFFF0000FFFF
    71777214294589695,  # 0x00FF00FF00FF00FF
    1085102592571150095,  # 0x0F0F0F0F0F0F0F0F
    3689348814741910323,  # 0x3333333333333333
    6148914691236517205,  # 0x5555555555555555
)
_MORTON_SHIFTS = (16, 8, 4, 2, 1)


def dim_barrier(df: DataFrame, a: Column, b: Column) -> DataFrame:
    """Materialize the two morton dimensions behind a Generate barrier —
    ``explode(array(struct(a, b)))`` — before feeding them to
    :func:`morton2`. The spread chain references its input TWICE per
    step, so the expression tree duplicates its leaf 2^5 = 32 times;
    CollapseProject happily re-inlines a computed alias into every copy
    (the token_barrier lesson), which is catastrophic when the dim is a
    quantile_bucket: higher-order functions are CodegenFallback, so the
    63-comparison lambda would run INTERPRETED ×32 per row (measured:
    the first zorder_layout draft wrote sf10 events in 12.6 s; with the
    barrier the re-inline is impossible and only attribute leaves are
    duplicated). Output columns: ``__dim_a``, ``__dim_b`` appended to
    ``df``'s columns."""
    keep = [F.col(c) for c in df.columns]
    return df.select(
        *keep,
        F.explode(
            F.array(F.struct(a.alias("a"), b.alias("b")))
        ).alias("__ab"),
    ).select(
        *keep,
        F.col("__ab.a").alias("__dim_a"),
        F.col("__ab.b").alias("__dim_b"),
    )


def spread_bits2(x: Column) -> Column:
    """Spread the low 21 bits of ``x`` so bit i lands at bit 2i (int64).

    Five shift-or-mask steps — exact, codegen-friendly, and identical in
    any engine with 64-bit ``&``/``|``/``<<`` (the DuckDB oracle replays
    the same chain from the same decimal masks)."""
    x = x.cast("long").bitwiseAND(F.lit(MORTON_INPUT_MASK))
    for shift, mask in zip(_MORTON_SHIFTS, MORTON_MASKS):
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def morton2(a: Column, b: Column) -> Column:
    """Interleave two 21-bit non-negative ints into one 42-bit Morton key
    (bit i of ``a`` → bit 2i, bit i of ``b`` → bit 2i+1). NULL in either
    dimension → NULL key (range partitioning sorts NULLs first — they
    cluster, which is what a layout wants)."""
    return spread_bits2(a).bitwiseOR(F.shiftleft(spread_bits2(b), 1))


def morton2_py(a: int, b: int) -> int:
    """Pure-Python reference of :func:`morton2` (tests pin Spark and the
    oracle against this independent bit-by-bit construction)."""
    z = 0
    for i in range(MORTON_BITS):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def quantile_bucket(col: Column, boundaries: list[float]) -> Column:
    """Equal-frequency bucket index of ``col`` against sorted upper
    ``boundaries``: the count of boundaries ≤ x — a comparison-only
    aggregate over a small literal array (no regex, no CSE hazard; safe
    inside the lambda per the PERF.md rule). NULL → NULL."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    n = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, bnd: acc + F.when(bnd <= col.cast("double"), 1).otherwise(0),
    )
    return F.when(col.isNotNull(), n)


def morton2_np(a, b):
    """Vectorized :func:`morton2` over numpy int64 arrays — the same
    5-step magic-mask chain, verified element-identical to morton2_py in
    tests. Inputs must already be masked to MORTON_BITS (bucket indices
    are)."""
    def spread(x):
        x = x & np.int64(MORTON_INPUT_MASK)
        for s, m in zip(_MORTON_SHIFTS, MORTON_MASKS):
            x = (x | (x << np.int64(s))) & np.int64(m)
        return x

    return spread(a) | (spread(b) << np.int64(1))


def _zkey_pandas_udf(bounds_a: list[float], bounds_b: list[float]):
    """Arrow-batched zkey kernel for the WRITE path: np.searchsorted
    (side='right' = count of boundaries ≤ x, exactly quantile_bucket's
    contract) + the vectorized spread. This is the sanctioned
    when-Python-is-unavoidable shape: the pure-expression form hits the
    CodegenFallback trap — quantile_bucket is a higher-order function,
    so the whole projection runs INTERPRETED and the 2·63-comparison
    lambda dominates (same-session sf10 ABAB: 35 s/write expression vs
    2.6-6.6 s vectorized — see PERF.md r16). NULL in either dim → NULL
    key, matching the expression path (tested equal)."""
    from pyspark.sql.functions import pandas_udf

    bna = np.asarray(bounds_a, dtype=float)
    bnb = np.asarray(bounds_b, dtype=float)

    @pandas_udf("long")
    def zkey(a: pd.Series, b: pd.Series) -> pd.Series:
        ia = np.searchsorted(
            bna, a.to_numpy(dtype=float, na_value=np.nan), side="right"
        ).astype(np.int64)
        ib = np.searchsorted(
            bnb, b.to_numpy(dtype=float, na_value=np.nan), side="right"
        ).astype(np.int64)
        out = pd.Series(morton2_np(ia, ib))
        mask = a.isna() | b.isna()
        if mask.any():
            out = out.astype("Int64")
            out[mask] = pd.NA
        return out

    return zkey


def zorder_bounds(
    df: DataFrame, cols: list[str], n_buckets: int
) -> dict[str, list[float]]:
    """Per-column quantile boundaries for the bucket step — ONE
    distributed ``approxQuantile`` pass per column collecting
    ≤ n_buckets-1 doubles to the driver (the documented eager-boundary
    pattern; relativeError 1/(4·n_buckets) keeps bucket populations
    near-uniform without a full sort). Equal boundaries (low-cardinality
    columns) dedup, so the effective bucket count may be smaller."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    err = 1.0 / (4 * n_buckets)
    return {
        c: sorted(set(df.selectExpr(f"cast({c} as double) as x")
                      .approxQuantile("x", probs, err)))
        for c in cols
    }


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_buckets: int = 256,
    n_partitions: int | None = None,
    use_numpy: bool = True,
) -> DataFrame:
    """Return ``df`` re-laid-out in Z-order on two columns: quantile-bucket
    each dim to ``n_buckets`` cells, interleave to a Morton key, then ONE
    ``repartitionByRange`` + within-partition sort on it. Write the result
    with ``.write.parquet`` — every output file then covers a small
    (col_a, col_b) rectangle, so parquet row-group min/max stats prune
    scans filtered on either column (measured: see tests/test_layout.py
    and PERF.md r16).

    ``approxQuantile`` is one distributed pass collecting ≤ n_buckets-1
    doubles per dim to the driver (the documented eager-boundary pattern —
    same class as the IVF centroid build). relativeError 1/(4·n_buckets)
    keeps bucket populations near-uniform without a full sort.
    """
    if len(cols) != 2:
        raise ValueError("zorder_layout interleaves exactly two columns")
    if not 2 <= n_buckets <= MORTON_INPUT_MASK + 1:
        raise ValueError(f"n_buckets must be in [2, 2^{MORTON_BITS}]")
    reserved = {"__zkey", "__dim_a", "__dim_b", "__ab"} & set(df.columns)
    if reserved:
        # withColumn would silently OVERWRITE user data and the final
        # drop would then delete it (the dedup_stream reserved-column rule)
        raise ValueError(f"input already has reserved column(s) {reserved}")
    bounds = zorder_bounds(df, cols, n_buckets)
    if use_numpy:
        # the default write path: one Arrow-batched vectorized kernel
        # (see _zkey_pandas_udf — the expression form pays interpreted
        # CodegenFallback evaluation of the bucket lambda)
        zkey_udf = _zkey_pandas_udf(bounds[cols[0]], bounds[cols[1]])
        out = df.withColumn("__zkey", zkey_udf(F.col(cols[0]), F.col(cols[1])))
    else:
        # pure-expression fallback (no Python workers): bucket indices
        # MUST cross a dim_barrier before the interleave — see
        # dim_barrier: without it the interpreted bucket lambda re-runs
        # ~32x per row inside the spread chain
        out = dim_barrier(
            df,
            quantile_bucket(F.col(cols[0]), bounds[cols[0]]),
            quantile_bucket(F.col(cols[1]), bounds[cols[1]]),
        ).withColumn(
            "__zkey", morton2(F.col("__dim_a"), F.col("__dim_b"))
        ).drop("__dim_a", "__dim_b")
    n_out = n_partitions or out.sparkSession.sparkContext.defaultParallelism
    return (
        out.repartitionByRange(n_out, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
