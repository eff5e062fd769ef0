"""Declared query surface (SURVEY.md §2.12): q01-q17 as Spark DataFrame plans.

Each function takes ``(spark, sf_dir)`` and returns a DataFrame whose
row-set, column names and types match the DuckDB oracle SQL in
``plans/oracle.py`` (driver compares row count + schema + order-insensitive
value hash at sf0.01).

Result contract is an unordered multiset: the driver's value-hash is
row-order-insensitive, so queries do NOT carry a trailing presentation
``orderBy`` — a global sort of a result consumed as a multiset is a wasted
range-exchange (plus its sampling job) at any scale, and the dominant cost
at 100 TB. Sorts that are *semantic* stay: q12's top-k (orderBy+limit →
TakeOrderedAndProject) and window/frame orderings inside q06/q07/q17.
The oracle SQL keeps its ORDER BY for readability; DuckDB's compare cost
for it is noise.

Scale notes are inline: these run on local[32] for tests but are written for
a 1000-executor cluster over ~100 TB — broadcast the dimension side of every
star join, pre-aggregate before joining where the join only feeds an
aggregate, never collect, and let AQE coalesce post-shuffle partitions.

Capability mapping to the reference (citations are reference file:line):
 q01-q02 envelope project/filter (MySQLDebeziumToJSONDeserializer.java:106-182)
 q03     side-output routing manifest (SideInputProcessFunction.java:37-132)
 q04     offset store argmax (BinlogOffsetStoreProcessFunction.java:53-55)
 q05     status store count/max (StatusStoreProcessFunction.java:48-58)
 q06     snapshot-completion first-event marker (DelayedStopSignalProcessFunction.java:62-135)
 q07     CDC last-image materialization (the engine's flagship semantic)
 q08     DDL regex classification (DelayedStopSignalProcessFunction.java:166-195)
 q09-q14 relational surface absent from the reference, provided by Spark SQL
 q15-q17 LLM-pipeline extensions (SURVEY.md §2.11)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_cdc_multi_spark.operators.bucketing import is_bucketed_on


def load_table(
    spark: SparkSession, sf_dir: str, name: str, refresh: bool = False
) -> DataFrame:
    """Parquet scan; Catalyst handles column pruning + predicate pushdown.

    ``events.ts`` has been written by the driver as parquet TIMESTAMP(NANOS)
    in some rounds (Spark reads it only via
    ``spark.sql.legacy.parquet.nanosAsLong`` → bigint ns; DuckDB truncates
    ns→us the same way) and as ``timestamp[us]`` (→ TIMESTAMP_NTZ) in others.
    Normalize BOTH to one canonical TIMESTAMP (LTZ) so every downstream
    query sees a single ts type contract regardless of fixture vintage.

    The loaded (and ts-normalized) DataFrame is memoized per session+path:
    ``spark.read.parquet`` does file listing + footer schema read on every
    call (~0.2 s of driver work at any SF), which a real deployment pays
    once at catalog-registration time, not once per query. The memo holds
    the *lazy* plan only — no data is cached, every execution still scans
    parquet — so plans (pushdown, pruning) are unchanged.

    NOTE the memo also pins the parquet FILE LISTING (InMemoryFileIndex) at
    first read: the bench/test data directories are static so this is safe
    for every gate/ext plan, but a caller pointing at a directory that
    gains files mid-session must pass ``refresh=True`` to re-list (or just
    use spark.read.parquet directly).
    """
    cache = getattr(spark, "_fcm_table_cache", None)
    if cache is None:
        cache = {}
        spark._fcm_table_cache = cache
    key = (sf_dir, name)
    if refresh:
        cache.pop(key, None)
    if key not in cache:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            ts_type = dict(df.dtypes).get("ts")
            if ts_type == "bigint":
                # TIMESTAMP(NANOS) parquet read via nanosAsLong: ns → us.
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
            elif ts_type == "timestamp_ntz":
                # timestamp[us] parquet (isAdjustedToUTC=false) arrives as NTZ;
                # under the pinned UTC session TZ the cast is value-preserving
                # and gives every query one canonical TIMESTAMP (LTZ) type.
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        cache[key] = df
    return cache[key]


# --------------------------------------------------------------------------
# CDC-shaped queries over `events` (event_id = monotone offset,
# event_type = op role, user_id = key)
# --------------------------------------------------------------------------


def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Envelope-style filter + project.

    NOTE: DuckDB CAST(double AS BIGINT) rounds half-to-even (84.5→84,
    85.5→86) while Spark's cast truncates; Spark's banker's-rounding
    ``bround`` + cast reproduces the oracle exactly.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter((F.col("event_type") != "delete") & (F.col("user_id") % 10 == 3))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.bround(F.col("value"), 0).cast("bigint").alias("value_i"),
        )
    )


def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Name sanitization (Sanitizer.java:4-8) + dt bucketing
    (DateBucketAssigner.java:32-41) as a projection."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.replace(F.col("event_type"), F.lit("-"), F.lit("_")).alias("event_type_s"),
        F.date_format("ts", "yyyy-MM-dd").alias("dt"),
    )


def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routing manifest: records per target table (R1 as a grouped agg)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.min("event_id").alias("first_id"),
            F.max("event_id").alias("last_id"),
        )
    )


def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-store argmax per key; snapshot READs carry no offset and are
    skipped (BinlogOffsetStoreProcessFunction.java:42-47)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_type") != "read")
        .groupBy("user_id")
        .agg(F.max("event_id").alias("last_offset"))
    )


def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status store: running count + last event timestamp (ST8)."""
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.count("*").alias("record_count"),
        F.max("ts").alias("last_event_timestamp"),
    )


def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key first non-read marker (snapshot-completion tracking, ST1).

    Scale: min_by aggregation, not a row_number window — partial (map-side)
    aggregation reduces each scan partition to |keys| rows before the
    shuffle, where a window must shuffle+sort EVERY surviving row.
    event_id is unique, so the reduction is deterministic.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_type") != "read")
        .groupBy("user_id")
        .agg(F.min_by(F.struct("event_id", "event_type"), "event_id").alias("s"))
        .select(
            F.col("s.event_id").alias("event_id"),
            "user_id",
            F.col("s.event_type").alias("event_type"),
        )
    )


def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC last-image materialization: latest row per key == current table
    state. The engine's flagship semantic — order-insensitive reduction over
    the monotone offset replaces the reference's single-thread total order
    (SURVEY.md §7.5).

    Scale: max_by over the monotone offset IS that reduction, and it gets
    map-side partial aggregation — the shuffle carries one candidate row per
    key per partition instead of the whole change log (measured 0.55→0.43 s
    at sf1 vs the row_number window form). event_id is unique ⇒ deterministic.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.max_by(F.struct("event_type", "value"), "event_id").alias("s"))
        .select(
            "user_id",
            F.col("s.event_type").alias("last_op"),
            F.col("s.value").alias("last_value"),
        )
    )


def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDL classification predicate (F4 regex gate) as rlike.

    Scale: a cheap substring pre-filter (LIKE-class, no regex engine) runs
    first; the case-insensitive regex only sees survivors. Any (?i) regex
    match necessarily contains one of the three keywords, so the pre-filter
    is lossless (measured 0.42→0.29 s at sf1).
    """
    docs = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    pre = low.contains("create") | low.contains("drop") | low.contains("alter")
    return (
        docs.filter(pre)
        .filter(F.col("text").rlike(r"(?i)(create|drop|alter)\s"))
        .select("doc_id", "lang")
    )


# --------------------------------------------------------------------------
# Relational surface (absent from the reference — SURVEY.md §2.8 — provided
# here via Spark SQL built-ins)
# --------------------------------------------------------------------------


def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join; region is tiny → broadcast (no shuffle at any scale)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_name", "r_name")
    )


def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-dim join + grouped agg + having.

    Scale: pre-aggregate orders by o_custkey BEFORE the join so the shuffle
    moves one row per customer instead of one per order (orders >> customer
    at any SF); then the customer join input is minimal and the final
    mktsegment agg is a near-free rollup of ~few segments.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_ord"), F.sum("o_totalprice").alias("rev")
    )
    return (
        per_cust.join(customer, per_cust.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("n_ord").alias("n_orders"),
            F.round(F.sum("rev"), 2).alias("revenue"),
        )
        .filter(F.col("n_orders") > 10)
    )


def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti join (IN / NOT IN with non-null keys).

    NULL contract (adversarial fixture has a NULL-custkey 'F' order): a
    NULL-key order belongs to no customer, so it must not block anyone.
    The fold's semi join drops the NULL group by equality; the oracle's
    NOT IN subquery filters `o_custkey IS NOT NULL` to match (otherwise
    ANSI three-valued NOT IN empties the whole result). Pinned on both
    sides; q11 is in ADVERSARIAL_QUERIES.

    Scale: customers with ≥1 order and no finished order. Instead of two
    shuffle joins of the full orders table (semi then anti), fold both
    existence tests into ONE partial-aggregated pass over orders —
    per-custkey max(status=='F') — then a single semi join against the
    surviving keys (measured 0.96→0.42 s at sf1; orders shuffles once,
    pre-reduced to |custkeys| rows).
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    keys = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("has_f")
        )
        .filter(F.col("has_f") == 0)
    )
    return (
        customer.join(keys, customer.c_custkey == keys.o_custkey, "left_semi")
        .select("c_custkey")
    )


def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: orderBy+limit compiles to TakeOrderedAndProject — per-partition
    heap + driver merge of k rows, no global sort at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )


def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: INTERSECT (distinct semantics in both engines)."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("k"))
        .intersect(supplier.select(F.col("s_nationkey").alias("k")))
    )


def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: pushdown-able filter + grouped agg; partial (map-side)
    aggregation makes the shuffle ~|groups| per partition regardless of SF."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Extension surface (SURVEY.md §2.11): dedup / text / similarity
# --------------------------------------------------------------------------


def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup then manifest (distinct is a hash-agg; partial agg keeps
    the shuffle at |distinct| not |rows|)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("text", "lang", "source")
        .distinct()
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n"))
    )


def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-analysis projection + filter."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("lang") == "en")
        .select(
            "doc_id",
            "n_chars",
            # bigint to match DuckDB LENGTH() in case of type-strict compare
            F.length("text").cast("bigint").alias("len_check"),
            F.when(F.col("n_chars") > 500, "long").otherwise("short").alias("bucket"),
        )
    )


def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity capability check: exact top-1 L2 neighbor per vector over
    the 100 smallest vec_ids. Squared L2 via zip_with+aggregate (JVM-side,
    no UDF); ordering by squared distance == ordering by list_distance.
    Both sides compute in float64 with the same left-to-right summation
    order, so the neighbor ranking matches bit-for-bit short of exact ties
    (tie-broken by nid). Scale path for the full table is
    operators/similarity.py (brute-force top-k and LSH-bucketed ANN).
    """
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .orderBy("vec_id")
        .limit(100)
    )
    a = emb.alias("a")
    b = emb.alias("b")
    dist2 = F.aggregate(
        F.zip_with(F.col("a.emb"), F.col("b.emb"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("qid").orderBy("d2", "nid")
    return (
        a.join(F.broadcast(b), F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("qid"),
            F.col("b.vec_id").alias("nid"),
            dist2.alias("d2"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("qid", "nid")
    )


def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: multi-hop star join (region→nation→customer→orders
    →lineitem) with a selective region filter — the join-ordering +
    multi-broadcast case.

    Scale: ONLY the always-tiny dims (region 5 rows, nation 25) carry an
    explicit broadcast hint; customer-sized and larger inputs are left to
    AQE — it broadcasts them at bench SF and switches to shuffle joins on
    a cluster, where force-broadcasting a customer table would OOM the
    executors. The two large-large joins (orders⋈customer-dims,
    lineitem⋈orders) shuffle on their keys; revenue rolls up with
    map-side partials to ~|nations| rows. Revenue sums doubles — rounded
    to 2 after the sum (integral cents-scale values keep
    accumulation-order noise far below the rounding grain)."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    dims = (
        customer.join(
            F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)),
            customer.c_nationkey == nation.n_nationkey,
        )
        .select("c_custkey", "n_name")
    )
    ord_dim = orders.join(dims, orders.o_custkey == dims.c_custkey).select(
        "o_orderkey", "n_name"
    )
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("r")
    return (
        lineitem.join(ord_dim, lineitem.l_orderkey == ord_dim.o_orderkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(rev), 2).alias("revenue"),
        )
    )


def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-group threshold from an aggregated subquery —
    lineitems whose quantity is below 20% of their part's average.

    Scale: the threshold table is one row per partkey (partial agg); both
    the lineitem⋈threshold and part joins shuffle on the partkey at scale
    (part grows with SF — no forced broadcast; AQE broadcasts them at
    bench SF). The < comparison is done in EXACT integer arithmetic
    (quantities are integral doubles, so 5*q*count < sum is
    order-independent), never against a float average — no cross-engine
    boundary flips by construction."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    thresh = lineitem.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("sum_q"), F.count("*").alias("n_q")
    )
    t = thresh.alias("t")
    li = lineitem.alias("li")
    small = li.join(t, F.col("li.l_partkey") == F.col("t.l_partkey")).filter(
        F.lit(5.0) * F.col("li.l_quantity") * F.col("t.n_q") < F.col("t.sum_q")
    )
    return (
        small.join(part, F.col("li.l_partkey") == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_small"),
            F.round(F.sum("li.l_extendedprice"), 2).alias("value"),
        )
    )


def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join + conditional count distribution —
    how many customers have 0, 1, 2, ... qualifying orders (zeros only
    reachable through the outer join).

    Scale: count(o_orderkey) per customer is a pre-aggregation on the
    orders side joined outer to customer (broadcast of the aggregate at
    small SF; shuffle-hash at scale), and the final distribution is a
    ~|distinct counts|-row rollup. All-integer outputs."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = orders.groupBy("o_custkey").agg(F.count("*").alias("n_ord"))
    dist = (
        customer.join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("n_ord"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )
    return dist


def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT-EXISTS correlation — suppliers who
    were the ONLY late supplier on a multi-supplier finished order
    ("late" adapted to this schema: l_shipdate > o_orderdate + 30 days;
    the reference TPC-H uses receipt/commit dates the fixture lacks).

    Scale/plan shape (r7 rewrite, VERDICT r6 item 5): the EXISTS /
    NOT-EXISTS correlation is evaluated as per-orderkey AGGREGATES
    instead of semi/anti self-joins with non-equi residuals — and both
    distinct-supplier tests reduce to MIN/MAX comparisons, so no
    count_distinct ever plans (a mixed distinct+non-distinct agg
    compiles to Expand, a 3x row fan-out over the fact table —
    measured 31.8 s at sf10; this form is 4.6 s ~= 1.0x DuckDB):
    "no other late supplier" is min(late suppkey) == max(late suppkey)
    (the shared value IS the unique supplier), "exists another
    supplier" is min < max over ALL lineitem of the order; NULL
    suppkeys are ignored by min/max exactly as count_distinct ignores
    them. The orders join carries a shuffle_hash hint: both sides
    shuffle on the orderkey either way, but hashing the FILTERED orders
    side skips the two 60M-row sorts sort-merge would pay; the build
    side per task is |F-orders| / shuffle-partitions — bounded by
    sizing partitions to the fact table, the standard hash-join
    contract (AQE skew-split applies to shuffled-hash joins too).
    supplier is broadcast-sized. Output (s_name, numwait) all-integer."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    late_agg = (
        lineitem.join(
            orders.hint("shuffle_hash"), lineitem.l_orderkey == orders.o_orderkey
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("mn"), F.max("l_suppkey").alias("l_suppkey"))
        .filter(F.col("mn") == F.col("l_suppkey"))
    )
    supp_agg = (
        lineitem.groupBy("l_orderkey")
        .agg((F.min("l_suppkey") < F.max("l_suppkey")).alias("multi"))
        .filter(F.col("multi"))
    )
    return (
        late_agg.join(supp_agg, "l_orderkey")
        .join(supplier, F.col("l_suppkey") == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-aggregate subquery + NOT EXISTS — customers
    with above-average positive balance and no URGENT orders, per market
    segment (the fixture has no phone country codes so c_mktsegment plays
    the grouping role, and every synthetic customer has at least one
    order so the NOT-EXISTS scopes to urgent orders to stay non-trivial).

    Scale/plan shape: the scalar average rides a broadcast 1-row
    aggregate (lazy crossJoin, no driver collect); NOT EXISTS compiles to
    LEFT ANTI against the orders key set. The above-average comparison is
    EXACT integer cents (c_cents · n > sum_cents) — never a float-vs-avg
    boundary that could flip between engines — and the output balance sum
    is exact cents too (ratio rule)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    cents = F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint")
    pos = customer.filter(F.col("c_acctbal") > 0)
    stats = pos.agg(
        F.sum(cents).alias("sum_cents"), F.count("*").alias("n_pos")
    )
    rich = (
        customer.withColumn("c_cents", cents)
        .crossJoin(F.broadcast(stats))
        .filter(F.col("c_cents") * F.col("n_pos") > F.col("sum_cents"))
    )
    no_orders = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return no_orders.groupBy("c_mktsegment").agg(
        F.count("*").alias("numcust"),
        F.sum("c_cents").alias("total_cents"),
    )


def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-percentile aggregate (sort-based aggregation shape): per
    (returnflag, linestatus), the exact MEDIAN of quantity plus count and
    range. Scoped deliberately to an INTEGRAL-valued column at q=0.5:
    median interpolation is then midpoint-of-two-small-integers — exact
    in binary under both engines' formulas — whereas arbitrary
    percentiles of decimal columns interpolate with a fractional weight
    whose last-ulp can differ between (1-g)·a+g·b and a+g·(b-a) forms
    (the ratio-metric float rule, percentile edition).

    Scale: percentile is a sort-based ObjectHashAggregate — per-group
    value buffers, partial-merged map-side; groups are tiny (6) so the
    final exchange is control-plane-sized."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: max-revenue supplier(s) over a ship-date quarter —
    the materialized-view + scalar-max equality pattern. Revenue is exact
    integer 1e-4-dollar units (cents × discount-percent), so the MAX
    equality cannot be flipped by float accumulation order in either
    engine (the ratio-metric rule, argmax edition).

    Scale: one partial-agg'd groupBy(l_suppkey) over the date-pruned scan
    (predicate pushdown on l_shipdate); the scalar max is a 1-row
    broadcast; the supplier join ships only the max-revenue rows (≈1) —
    AQE broadcasts that side, never the supplier table."""
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    dh = F.floor(F.col("l_discount") * 100 + 0.5).cast("long")
    rev = lineitem.groupBy("l_suppkey").agg(
        F.sum(cents * (100 - dh)).alias("total_rev_u")
    )
    mx = rev.agg(F.max("total_rev_u").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_rev_u == F.col("mx"))
        .join(supplier, rev.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev_u")
    )


def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose shipped value (through suppliers of
    one region) exceeds a fixed fraction of the total — global-scalar
    HAVING. The 0.05% threshold is applied as value_u · 2000 > total_u in
    exact integer units; the scalar total is a 1-row broadcast.

    Scale: nation is the only forced broadcast (25 rows); the
    supplier-restriction join and the partkey rollup shuffle on their
    keys with map-side partials; the partkey exchange is reused for the
    scalar total (ReusedExchange at runtime). The supplier side stays
    AQE-DECIDED by measurement (sf10 r9): AQE runtime-converts it to a
    broadcast join; a shuffle_hash hint measured SLOWER (3.1 s vs
    2.76 s unhinted), and a forced broadcast measured 1.31 s but is
    rejected — region-filtered supplier is SF-proportional, the q18
    rule (a forced broadcast of a fact-sized side dies at cluster
    scale). The residual vs DuckDB is the statically-planned lineitem
    shuffle write AQE's late conversion can't un-plan."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    lineitem = load_table(spark, sf_dir, "lineitem")
    sup = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    qi = F.floor(F.col("l_quantity") + 0.5).cast("long")
    val = (
        lineitem.join(sup, lineitem.l_suppkey == sup.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(cents * qi).alias("value_u"))
    )
    tot = val.agg(F.sum("value_u").alias("tot_u"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value_u") * 2000 > F.col("tot_u"))
        .select("l_partkey", "value_u")
    )


def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by (nation, order-year) for one product
    line — the widest join tree in the suite (lineitem ⋈ part ⋈ orders ⋈
    supplier ⋈ nation) with signed arithmetic in the rollup. Profit =
    revenue − cost proxy (p_retailprice·qty; the fixture has no partsupp
    table), all in exact 1e-4-dollar integer units.

    Scale: only nation is broadcast-hinted; the selective part filter
    (p_name) prunes before its join so AQE can broadcast the survivors;
    lineitem⋈orders is the large-large sort-merge shuffle on the
    orderkey; the final rollup is |nations|×|years| cells with map-side
    partials."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget")
    )
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    ext_c = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    dh = F.floor(F.col("l_discount") * 100 + 0.5).cast("long")
    ret_c = F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long")
    qi = F.floor(F.col("l_quantity") + 0.5).cast("long")
    profit_u = ext_c * (100 - dh) - ret_c * qi * 100
    return (
        lineitem.join(part.select("p_partkey", "p_retailprice"),
                      lineitem.l_partkey == F.col("p_partkey"))
        .join(orders.select("o_orderkey", F.year("o_orderdate").alias("o_year")),
              lineitem.l_orderkey == F.col("o_orderkey"))
        .join(supplier.select("s_suppkey", "s_nationkey"),
              lineitem.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy("n_name", F.col("o_year").cast("bigint").alias("o_year"))
        .agg(F.sum(profit_u).alias("profit_u"), F.count("*").alias("n_items"))
    )


def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nation pairs by year —
    supplier nation ≠ customer nation, both drawn from a two-nation set,
    revenue in exact 1e-4-dollar integer units grouped by (supp_nation,
    cust_nation, year).

    Scale: nation (25 rows) is the only forced broadcast, applied on
    both the supplier and customer dims; lineitem⋈orders and
    orders⋈customer shuffle on their keys; the final rollup is
    2×2×|years| cells with map-side partials. The nation-restricted
    sides (sup_n ≈ 8% of suppliers, cust_n ≈ 8% of customers, ord_n ≈
    8% of orders) carry shuffle_hash hints — the q21 contract (hint the
    SMALLER, filtered side; skips the fact-side sort-merge sorts).
    Interleaved sf10 A/B, min-of-3 (r9): unhinted 4.63 s, ord_n-only
    2.90 s, all three hinted 2.63 s."""
    return q27_plan(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


def q27_plan(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """q27 shape over caller-supplied frames, with PARTITIONING-AWARE join
    order (VERDICT r10 item 1): when lineitem is a scan of a table
    bucketed on l_orderkey (register_bucketed / write_bucketed lake
    layout), the orderkey join goes FIRST — lineitem never shuffles
    (ord_n alone shuffles into the matching bucket partitions) and only
    the ~8%-selectivity survivor shuffles on l_suppkey. The shipped
    suppkey-first order on bucketed data shuffles lineitem on l_suppkey
    immediately, DESTROYING the bucket partitioning before it pays off —
    measured at sf10 WORSE than unbucketed (4.96 s vs 3.66 s fixture),
    vs 2.66 s reordered (PERF.md r10 layout experiment). Catalyst orders
    joins by size estimates, not by partitioning preservation, so the
    operator asks `is_bucketed_on` explicitly. On unbucketed inputs
    suppkey-first ships unchanged (it filters lineitem to ~8% before the
    wider orderkey join — the right greedy order with no layout to
    preserve)."""
    pick = nation.filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    sup_n = supplier.join(
        F.broadcast(pick.select(F.col("n_nationkey").alias("snk"),
                                F.col("n_name").alias("supp_nation"))),
        supplier.s_nationkey == F.col("snk"),
    ).select("s_suppkey", "supp_nation").hint("shuffle_hash")
    cust_n = customer.join(
        F.broadcast(pick.select(F.col("n_nationkey").alias("cnk"),
                                F.col("n_name").alias("cust_nation"))),
        customer.c_nationkey == F.col("cnk"),
    ).select("c_custkey", "cust_nation").hint("shuffle_hash")
    ord_n = orders.join(cust_n, orders.o_custkey == cust_n.c_custkey).select(
        "o_orderkey", "cust_nation", F.year("o_orderdate").alias("o_year")
    ).hint("shuffle_hash")
    ext_c = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    dh = F.floor(F.col("l_discount") * 100 + 0.5).cast("long")
    if is_bucketed_on(lineitem, "l_orderkey"):
        joined = lineitem.join(
            ord_n, lineitem.l_orderkey == ord_n.o_orderkey
        ).join(sup_n, F.col("l_suppkey") == sup_n.s_suppkey)
    else:
        joined = lineitem.join(sup_n, lineitem.l_suppkey == sup_n.s_suppkey).join(
            ord_n, lineitem.l_orderkey == ord_n.o_orderkey
        )
    return (
        joined.filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.col("o_year").cast("bigint").alias("o_year"),
        )
        .agg(
            F.sum(ext_c * (100 - dh)).alias("volume_u"),
            F.count("*").alias("n_items"),
        )
    )


def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: order-priority counts per lineitem ship bucket —
    conditional aggregation (CASE counts) after a large-large join, the
    classic "one pass, many predicates" rollup. high = priority in
    {1-URGENT, 2-HIGH}; buckets by ship year.

    Scale: one orderkey-keyed shuffle join + a partial-agg'd groupBy on
    a |years|-sized key; both counts ride the same aggregate (no second
    pass over the join). The orders side (4× smaller than lineitem,
    2 narrow columns) carries a shuffle_hash hint — the q21 contract:
    sort-merge pays full sorts of BOTH fact tables; hashing the smaller
    side skips them (sf10 measured 11.9 s SMJ → 2.94 s hinted; per-task
    build = |orders|/shuffle-partitions, sized by the same rule as any
    hash join, AQE skew-split still applies)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    # coalesce + count(*)-sum: a NULL priority row counts as LOW (the
    # oracle's CASE ELSE branch); bare sum(1 - high) would silently DROP
    # NULL rows from both counts and diverge on a NULL-bearing fixture
    high = F.coalesce(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long"), F.lit(0)
    )
    return (
        lineitem.select("l_orderkey", F.year("l_shipdate").alias("ship_year"))
        .join(orders.select("o_orderkey", "o_orderpriority").hint("shuffle_hash"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("ship_year").cast("bigint").alias("ship_year"))
        .agg(
            F.sum(high).alias("high_line_count"),
            (F.count("*") - F.sum(high)).alias("low_line_count"),
        )
    )


def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference) — the last SURVEY §2.8 set-op with
    zero gate coverage (VERDICT r9 item 4): customers holding a finished
    ('F') order but no open ('O') order. ``DataFrame.subtract`` == SQL
    EXCEPT [DISTINCT] in both engines.

    NULL-key contract (pinned by the adversarial fixture's NULL-custkey
    'F' order): set ops compare by GROUPING equality, so a NULL key on
    the left SURVIVES unless the right also has one — the opposite of an
    ``=``-keyed anti join, which never matches NULL and is pinned against
    this in tests/test_adversarial_gate.py.

    Scale: both branches partial-agg to |distinct custkeys| map-side
    before the single hash shuffle; no sort, no fact-fact join.
    """
    orders = load_table(spark, sf_dir, "orders")
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    open_ = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("k")
    )
    return finished.subtract(open_)


def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals (r17) — the multi-level aggregate face of §2.8
    the q-series didn't cover: TPC-H Q1's flag/status revenue rollup
    with per-level subtotals and a grand total in ONE pass. GROUPING()
    indicator columns ride the output BY CONTRACT: a subtotal row's
    NULL group key is otherwise indistinguishable from a genuine NULL
    data value (the classic rollup ambiguity — pinned cross-engine).

    Ratio-rule floats: revenue is per-row quantized to integer cents —
    floor(p·(1−d)·100 + 0.5), one IEEE-exact per-row sequence shared by
    both engines — because a DOUBLE SUM's value depends on addition
    order and can never hash-match across engines; integer sums are
    order-insensitive (the centroid rule).

    Scale (r17 optimization round, guide §2.3 aggregate-before-expand):
    Catalyst compiles rollup to ONE Expand (3 levels) over its INPUT —
    so aggregate to the (flag, status) base FIRST and roll the base up:
    the 3× fan-out then rides a ≤|groups|-row stream instead of every
    lineitem row (plan diff: Expand input |lineitem| → |groups|, one
    extra group-count-sized exchange). Bit-equal: integer sums are
    decomposable and a real NULL group value stays a distinct base
    group (GROUPING() disambiguates exactly as before)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev_c = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        * F.lit(100) + F.lit(0.5)
    ).cast("bigint")
    base = (
        li.select(
            "l_returnflag",
            "l_linestatus",
            rev_c.alias("rev_c"),
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("_n"),
            F.sum("qty").alias("_sq"),
            F.sum("rev_c").alias("_sr"),
        )
    )
    return (
        base.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("_n").cast("bigint").alias("n_rows"),
            F.sum("_sq").cast("bigint").alias("sum_qty"),
            F.sum("_sr").cast("bigint").alias("sum_rev_cents"),
            F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
            F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        )
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q01": q01,
    "q02": q02,
    "q03": q03,
    "q04": q04,
    "q05": q05,
    "q06": q06,
    "q07": q07,
    "q08": q08,
    "q09": q09,
    "q10": q10,
    "q11": q11,
    "q12": q12,
    "q13": q13,
    "q14": q14,
    "q15": q15,
    "q16": q16,
    "q17": q17,
    "q18": q18,
    "q19": q19,
    "q20": q20,
    "q21": q21,
    "q22": q22,
    "q23": q23,
    "q24": q24,
    "q25": q25,
    "q26": q26,
    "q27": q27,
    "q28": q28,
    "q29": q29,
    "q30": q30,
}
