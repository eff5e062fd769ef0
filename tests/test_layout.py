"""Z-order layout (operators/layout.py): the Morton kernel is pinned
against an independent pure-Python bit-by-bit reference, and the layout's
whole REASON — parquet min/max stats that prune scans on EITHER dimension —
is asserted directly on written files via pyarrow footer stats."""

import random

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from flink_cdc_multi_spark.operators.layout import (
    MORTON_BITS,
    MORTON_INPUT_MASK,
    morton2,
    morton2_py,
    quantile_bucket,
    spread_bits2,
    zorder_layout,
)


def test_morton2_matches_python_reference(spark):
    rng = random.Random(42)
    pairs = [(0, 0), (MORTON_INPUT_MASK, MORTON_INPUT_MASK), (0, MORTON_INPUT_MASK),
             (MORTON_INPUT_MASK, 0), (1, 2)] + [
        (rng.randrange(1 << MORTON_BITS), rng.randrange(1 << MORTON_BITS))
        for _ in range(200)
    ]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = df.select("a", "b", morton2(F.col("a"), F.col("b")).alias("z")).collect()
    for r in got:
        assert r["z"] == morton2_py(r["a"], r["b"]), (r["a"], r["b"])
    # the interleave is a bijection on 42 bits: no two pairs collide
    assert len({r["z"] for r in got}) == len({(r["a"], r["b"]) for r in got})


def test_spread_masks_out_high_bits(spark):
    # inputs wider than MORTON_BITS are truncated, never sign-extended
    df = spark.createDataFrame([((1 << 40) + 5, -1)], "a long, b long")
    r = df.select(
        spread_bits2(F.col("a")).alias("sa"), spread_bits2(F.col("b")).alias("sb")
    ).collect()[0]
    assert r["sa"] == morton2_py(5, 0)
    assert r["sb"] == morton2_py(MORTON_INPUT_MASK, 0)  # -1 & mask = all ones


def test_quantile_bucket_counts_boundaries(spark):
    df = spark.createDataFrame(
        [(5.0,), (10.0,), (25.0,), (35.0,), (None,)], "x double"
    )
    got = [
        r["b"]
        for r in df.select(
            quantile_bucket(F.col("x"), [10.0, 20.0, 30.0]).alias("b")
        ).collect()
    ]
    assert got == [0, 1, 2, 3, None]


def _file_stats(path, cols):
    """Per parquet file: {col: (min, max)} folded over its row groups."""
    out = {}
    md = pq.ParquetFile(path).metadata
    names = [md.row_group(0).column(i).path_in_schema
             for i in range(md.row_group(0).num_columns)]
    for col in cols:
        idx = names.index(col)
        mins, maxs = [], []
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            assert st is not None and st.has_min_max
            mins.append(st.min)
            maxs.append(st.max)
        out[col] = (min(mins), max(maxs))
    return out


def test_zorder_layout_prunes_on_both_dims(spark, tmp_path):
    """THE layout claim: after zorder_layout on (a, b), a selective
    predicate on EITHER column intersects only a few files' min/max
    ranges — while a single-column sort prunes nothing on the other
    column. (File-level min/max intersection is exactly what parquet
    row-group pruning / manifest stats / Delta data skipping evaluate.)"""
    rng = random.Random(7)
    rows = [(i, rng.randrange(10000), rng.randrange(10000)) for i in range(20000)]
    df = spark.createDataFrame(rows, "id long, a long, b long")

    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "l")
    zorder_layout(df, ["a", "b"], n_buckets=16, n_partitions=8).write.parquet(zdir)
    df.repartitionByRange(8, "a").sortWithinPartitions("a").write.parquet(ldir)

    import glob

    def hit_count(d, col, lo, hi):
        files = sorted(glob.glob(f"{d}/part-*.parquet"))
        assert len(files) >= 6
        hits = 0
        for f in files:
            mn, mx = _file_stats(f, [col])[col]
            if not (mx < lo or mn > hi):
                hits += 1
        return hits, len(files)

    # predicate on b (1/16 of the domain): zorder prunes, a-sort cannot
    zb, zn = hit_count(zdir, "b", 0, 624)
    lb, ln = hit_count(ldir, "b", 0, 624)
    assert lb == ln  # single-col layout: every file matches on b
    assert zb <= zn // 2  # zorder: at least half the files skipped
    # predicate on a still prunes in BOTH layouts (zorder's a-rectangles
    # are wider than a pure a-sort's stripes — boundedness on both dims
    # is the trade — so only SOME skipping is claimed here)
    za, _ = hit_count(zdir, "a", 0, 624)
    la, _ = hit_count(ldir, "a", 0, 624)
    assert za < zn and la <= ln // 2

    # the relayout is a pure reorder: same multiset of rows
    back = spark.read.parquet(zdir)
    orig = df.agg(F.count("*"), F.sum("id"), F.sum("a"), F.sum("b")).collect()[0]
    assert back.agg(F.count("*"), F.sum("id"), F.sum("a"), F.sum("b")).collect()[0] == orig


def test_morton2_np_matches_python_reference():
    import numpy as np

    from flink_cdc_multi_spark.operators.layout import morton2_np

    rng = random.Random(3)
    a = np.array([0, MORTON_INPUT_MASK]
                 + [rng.randrange(1 << MORTON_BITS) for _ in range(500)],
                 dtype=np.int64)
    b = np.array([MORTON_INPUT_MASK, 0]
                 + [rng.randrange(1 << MORTON_BITS) for _ in range(500)],
                 dtype=np.int64)
    z = morton2_np(a, b)
    for i in range(len(a)):
        assert int(z[i]) == morton2_py(int(a[i]), int(b[i]))


def test_zorder_write_paths_agree(spark):
    """The vectorized (numpy searchsorted + spread) write path and the
    pure-expression (quantile_bucket + morton2) fallback must assign the
    SAME z-key to every row — including NULL dims (NULL key, both
    paths)."""
    from pyspark.sql import functions as F

    from flink_cdc_multi_spark.operators.layout import (
        _zkey_pandas_udf,
        dim_barrier,
    )

    rng = random.Random(11)
    rows = [(i, rng.randrange(1000), float(rng.randrange(1000)))
            for i in range(4000)] + [(4000, None, 1.0), (4001, 5, None)]
    df = spark.createDataFrame(rows, "id long, a long, b double")
    probs = [i / 8 for i in range(1, 8)]
    ba = sorted(set(df.selectExpr("cast(a as double) as x")
                    .approxQuantile("x", probs, 1 / 32)))
    bb = sorted(set(df.selectExpr("cast(b as double) as x")
                    .approxQuantile("x", probs, 1 / 32)))
    expr_keys = {
        r["id"]: r["zk"]
        for r in dim_barrier(
            df, quantile_bucket(F.col("a"), ba), quantile_bucket(F.col("b"), bb)
        ).withColumn("zk", morton2(F.col("__dim_a"), F.col("__dim_b")))
        .collect()
    }
    udf_keys = {
        r["id"]: r["zk"]
        for r in df.withColumn(
            "zk", _zkey_pandas_udf(ba, bb)(F.col("a"), F.col("b"))
        ).collect()
    }
    assert expr_keys == udf_keys
    assert udf_keys[4000] is None and udf_keys[4001] is None


def test_zorder_layout_validates_args(spark):
    df = spark.range(10).withColumn("a", F.col("id")).withColumn("b", F.col("id"))
    with pytest.raises(ValueError):
        zorder_layout(df, ["a"], n_buckets=4)
    with pytest.raises(ValueError):
        zorder_layout(df, ["a", "b"], n_buckets=1)
    # a reserved working column in the input must be rejected, never
    # silently overwritten and dropped
    with pytest.raises(ValueError):
        zorder_layout(df.withColumn("__zkey", F.lit(1)), ["a", "b"])
