"""DuckDB oracle SQL for every entry in plans/queries.py.

Column names/aliases match the Spark side exactly (the driver sorts columns
by name before hashing). Engine-semantics notes:

- DuckDB CAST(double AS BIGINT) rounds half-away-from-zero; the Spark side
  uses ROUND(...,0)::bigint to match (q01).
- Session timezone is UTC on both sides (q02, q05, q14).
- q17 phrasing differs per engine (declared capability query): DuckDB
  list_distance vs Spark zip_with/aggregate; ordering by L2 == ordering by
  squared L2, ties broken by nid.
"""

ORACLE_SQL: dict[str, str] = {
    "q01": """
        SELECT event_id, user_id, event_type, CAST(value AS BIGINT) AS value_i
        FROM events WHERE event_type <> 'delete' AND user_id % 10 = 3
        ORDER BY event_id
    """,
    "q02": """
        SELECT event_id, REPLACE(event_type, '-', '_') AS event_type_s,
               STRFTIME(ts, '%Y-%m-%d') AS dt
        FROM events ORDER BY event_id
    """,
    "q03": """
        SELECT event_type, COUNT(*) AS cnt, MIN(event_id) AS first_id,
               MAX(event_id) AS last_id
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "q04": """
        SELECT user_id, MAX(event_id) AS last_offset
        FROM events WHERE event_type <> 'read'
        GROUP BY user_id ORDER BY user_id
    """,
    "q05": """
        SELECT COUNT(*) AS record_count, MAX(ts) AS last_event_timestamp
        FROM events
    """,
    "q06": """
        SELECT event_id, user_id, event_type FROM (
          SELECT event_id, user_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
          FROM events WHERE event_type <> 'read') t
        WHERE rn = 1 ORDER BY user_id
    """,
    "q07": """
        SELECT user_id, event_type AS last_op, value AS last_value FROM (
          SELECT user_id, event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          FROM events) t
        WHERE rn = 1 ORDER BY user_id
    """,
    "q08": r"""
        SELECT doc_id, lang FROM documents
        WHERE REGEXP_MATCHES(text, '(?i)(create|drop|alter)\s')
        ORDER BY doc_id
    """,
    "q09": """
        SELECT n.n_name, r.r_name FROM nation n
        JOIN region r ON n.n_regionkey = r.r_regionkey
        ORDER BY n.n_name
    """,
    "q10": """
        SELECT c.c_mktsegment, COUNT(*) AS n_orders,
               ROUND(SUM(o.o_totalprice), 2) AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment HAVING COUNT(*) > 10
        ORDER BY c.c_mktsegment
    """,
    "q11": """
        SELECT c_custkey FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
          AND c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_orderstatus = 'F'
                                  AND o_custkey IS NOT NULL)
        ORDER BY c_custkey
    """,
    "q12": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    "q13": """
        SELECT c_nationkey AS k FROM customer
        INTERSECT SELECT s_nationkey AS k FROM supplier
        ORDER BY k
    """,
    "q14": """
        SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity),2) AS sum_qty,
               ROUND(SUM(l_extendedprice * (1 - l_discount)),2) AS sum_disc_price,
               COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
    """,
    "q15": """
        SELECT lang, source, COUNT(*) AS n FROM (
          SELECT DISTINCT text, lang, source FROM documents) t
        GROUP BY lang, source ORDER BY lang, source
    """,
    "q16": """
        SELECT doc_id, n_chars, LENGTH(text) AS len_check,
               CASE WHEN n_chars > 500 THEN 'long' ELSE 'short' END AS bucket
        FROM documents WHERE lang = 'en' ORDER BY doc_id
    """,
    "q17": """
        WITH s AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings ORDER BY vec_id LIMIT 100
        ), p AS (
          SELECT a.vec_id AS qid, b.vec_id AS nid,
                 ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY list_distance(a.emb, b.emb), b.vec_id) AS rn
          FROM s a JOIN s b ON a.vec_id <> b.vec_id
        )
        SELECT qid, nid FROM p WHERE rn = 1 ORDER BY qid
    """,
    "q18": """
        SELECT n_name, COUNT(*) AS n_items,
               ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name ORDER BY n_name
    """,
    "q19": """
        WITH t AS (
          SELECT l_partkey, SUM(l_quantity) AS sum_q, COUNT(*) AS n_q
          FROM lineitem GROUP BY l_partkey
        )
        SELECT p_brand, COUNT(*) AS n_small,
               ROUND(SUM(li.l_extendedprice), 2) AS value
        FROM lineitem li
        JOIN t ON li.l_partkey = t.l_partkey
        JOIN part ON li.l_partkey = p_partkey
        WHERE 5.0 * li.l_quantity * t.n_q < t.sum_q
        GROUP BY p_brand ORDER BY p_brand
    """,
    "q20": """
        WITH per_cust AS (
          SELECT o_custkey, COUNT(*) AS n_ord FROM orders
          WHERE o_orderpriority <> '1-URGENT' GROUP BY o_custkey
        )
        SELECT c_count, COUNT(*) AS custdist FROM (
          SELECT COALESCE(n_ord, 0) AS c_count
          FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey) t
        GROUP BY c_count ORDER BY c_count
    """,
    "q21": """
        WITH late AS (
          SELECT DISTINCT l_orderkey, l_suppkey
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
            AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        )
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM late a JOIN supplier ON a.l_suppkey = s_suppkey
        WHERE EXISTS (
                SELECT 1 FROM lineitem b
                WHERE b.l_orderkey = a.l_orderkey
                  AND b.l_suppkey <> a.l_suppkey)
          AND NOT EXISTS (
                SELECT 1 FROM late c
                WHERE c.l_orderkey = a.l_orderkey
                  AND c.l_suppkey <> a.l_suppkey)
        GROUP BY s_name ORDER BY s_name
    """,
    "q22": """
        WITH c AS (
          SELECT c_custkey, c_mktsegment, c_acctbal,
                 CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS c_cents
          FROM customer
        ), s AS (
          SELECT CAST(SUM(c_cents) AS BIGINT) AS sum_cents,
                 COUNT(*) AS n_pos
          FROM c WHERE c_acctbal > 0
        )
        SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(c_cents) AS BIGINT) AS total_cents
        FROM c, s
        WHERE c_cents * n_pos > sum_cents
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c.c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "q23": """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               quantile_cont(l_quantity, 0.5) AS median_qty,
               MIN(l_quantity) AS min_qty,
               MAX(l_quantity) AS max_qty
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q24": """
        WITH rev AS (
          SELECT l_suppkey,
                 SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                     * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)))
                   AS total_rev_u
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(total_rev_u AS BIGINT) AS total_rev_u
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_rev_u = (SELECT MAX(total_rev_u) FROM rev)
    """,
    "q25": """
        WITH sup AS (
          SELECT s_suppkey FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_regionkey = 0
        ), v AS (
          SELECT l_partkey,
                 SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                     * CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS value_u
          FROM lineitem JOIN sup ON l_suppkey = s_suppkey
          GROUP BY l_partkey
        )
        SELECT l_partkey, CAST(value_u AS BIGINT) AS value_u
        FROM v
        WHERE value_u * 2000 > (SELECT SUM(value_u) FROM v)
    """,
    "q26": """
        SELECT n_name,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                        * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))
                        - CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT)
                          * CAST(FLOOR(l_quantity + 0.5) AS BIGINT) * 100)
                    AS BIGINT) AS profit_u,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name, o_year
    """,
    "q27": """
        WITH pick AS (
          SELECT n_nationkey, n_name FROM nation
          WHERE n_name IN ('NATION_1', 'NATION_2')
        )
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                        * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)))
                    AS BIGINT) AS volume_u,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN pick sn ON s_nationkey = sn.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN pick cn ON c_nationkey = cn.n_nationkey
        WHERE sn.n_name <> cn.n_name
        GROUP BY supp_nation, cust_nation, o_year
    """,
    "q28": """
        SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS ship_year,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY ship_year
    """,
    "q29": """
        SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        EXCEPT
        SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
        ORDER BY k
    """,
    # r17 ROLLUP replay: GROUPING() indicators disambiguate subtotal
    # NULLs from genuine NULL group values; revenue per-row quantized to
    # integer cents (floor(p*(1-d)*100 + 0.5), the same IEEE sequence as
    # the Spark side) because double SUMs are addition-order-dependent.
    "q30": """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                                   * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_rev_cents,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY g_flag, g_status, l_returnflag, l_linestatus
    """,
}
