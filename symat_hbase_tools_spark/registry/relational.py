"""Relational analytics (TPC-H-ish queries, profiling,
data-quality censuses).

Registration fragment: QUERIES (Spark callables) + ORACLE_SQL (DuckDB)
assembled by registry/__init__.py; split out of entry.py in round 13.
"""

from __future__ import annotations

from symat_hbase_tools_spark.registry.wrappers import (
    ORDERS_PROFILE_RENDERERS,
    hard_negatives_indexed_check,
    load_table,
    orders_price_mad,
    orders_profile,
    orders_zorder_census,
    profiling,
    referential_integrity_census,
    relational,
    similarity,
    text_analysis,
)
from symat_hbase_tools_spark.registry.sqlcommon import (
    _SHINGLE_CTE,
    _fk_oracle_sql,
    _money,
    _profile_oracle_sql,
)

QUERIES = {
    # relational category representatives (agg, join+topk, window, setop, JSON)
    "q1_pricing_summary": relational.q1_pricing_summary,
    "q3_shipping_priority": relational.q3_shipping_priority,
    "customer_running_totals": relational.customer_running_totals,
    "nation_setops": relational.nation_customer_supplier_setops,
    "hard_negatives_ann_recall_check": similarity.hard_negatives_ann_recall_check,
    "hard_negatives_indexed_check": hard_negatives_indexed_check,
    # data-quality surface (round 3)
    "orders_profile": orders_profile,
    "referential_integrity_census": referential_integrity_census,
    # round-5 data-quality additions
    "orders_price_mad": orders_price_mad,
    # round-10: Benford first-digit census (fraud / synthetic-data gate)
    # round-11: functional-dependency violation census (within-table
    # determinism check next to referential_integrity's between-table one)
    # round-11: duplicate-payment audit + Deequ-style constraint census
    "orders_duplicate_payments": lambda spark, sf: profiling.duplicate_payments(
        load_table(spark, sf, "orders")
    ),
    "lineitem_constraint_check": lambda spark, sf: profiling.constraint_check(
        load_table(spark, sf, "lineitem")
    ),
    "orders_fd_check": lambda spark, sf: profiling.fd_violations(
        load_table(spark, sf, "orders")
    ),
    "orders_benford": lambda spark, sf: profiling.benford_census(
        load_table(spark, sf, "orders"), "o_totalprice"
    ),
    # relational surface
    "q5_local_supplier_volume": relational.q5_local_supplier_volume,
    "q7_volume_shipping": relational.q7_volume_shipping,
    # round-4: footer-only stats via parquet aggregate pushdown
    "orders_stats_pushdown": relational.orders_stats_pushdown,
    "top_parts_per_brand": relational.top_parts_per_brand,
    "customer_order_deltas": relational.customer_order_deltas,
    "segment_distinct_counts": relational.segment_distinct_counts,
    "approx_distinct_parts": relational.approx_distinct_parts,
    "part_name_analysis": relational.part_name_analysis,
    "monthly_order_stats": relational.monthly_order_stats,
    "rollup_order_counts": relational.rollup_order_counts,
    "cube_returnflag_linestatus": relational.cube_returnflag_linestatus,
    "pivot_status_by_priority": relational.pivot_status_by_priority,
    "price_percentiles": relational.price_percentiles,
    "price_percentiles_approx": relational.price_percentiles_approx,
    "price_percentiles_exact_rank": relational.price_percentiles_exact_rank,
    "orders_without_lineitems": relational.orders_without_lineitems,
    "customer_balance_distribution": relational.customer_balance_distribution,
    "fuzzy_name_pairs": relational.fuzzy_name_pairs,
    "q13_customer_order_histogram": relational.q13_customer_order_histogram,
    "top_customer_per_nation": relational.top_customer_per_nation,
    "nation_pair_volume": relational.nation_pair_volume,
    "heavy_hitter_users": relational.heavy_hitter_users,
    "heavy_hitters_sketch": relational.heavy_hitters_sketch,
    "min_cost_supplier": relational.min_cost_supplier,
    "market_share": relational.market_share,
    "q4_order_priority": relational.q4_order_priority,
    "q6_forecast_revenue": relational.q6_forecast_revenue,
    "q9_product_profit": relational.q9_product_profit,
    "q10_returned_items": relational.q10_returned_items,
    "q12_late_shipment_priorities": relational.q12_late_shipment_priorities,
    "q15_top_supplier": relational.q15_top_supplier,
    "q16_part_supplier_counts": relational.q16_part_supplier_counts,
    "q20_promotion_suppliers": relational.q20_promotion_suppliers,
    "q21_waiting_suppliers": relational.q21_waiting_suppliers,
    "q11_part_value_share": relational.q11_part_value_share,
    "q14_promo_revenue": relational.q14_promo_revenue,
    "q17_small_quantity_revenue": relational.q17_small_quantity_revenue,
    "q18_large_volume_customers": relational.q18_large_volume_customers,
    "q19_disjunctive_revenue": relational.q19_disjunctive_revenue,
    "q22_idle_customers": relational.q22_idle_customers,
    # round-10: market-basket co-purchase lift (PMI-over-baskets shape)
    "part_affinity_lift": relational.part_affinity_lift,
    # round-11: ABC/Pareto revenue classification (integer class cuts over
    # the distributed prefix sum)
    "customer_abc_analysis": relational.customer_abc_analysis,
    "price_quantity_stats": relational.price_quantity_stats,
    "orders_cohort_retention": relational.orders_cohort_retention,
    "boilerplate_shingles": text_analysis.boilerplate_shingles,
    "click_conversion": relational.click_conversion,
    # round-3: equi-depth histogram (optimizer-statistics shape)
    "orders_equidepth_histogram": relational.orders_equidepth_histogram,
    # round-4: Z-order layout census (Morton interleave, oracle-checked)
    "orders_zorder_census": orders_zorder_census,
}

ORACLE_SQL = {
    # basket affinity: exact bigint counts and PRODUCTS on both sides of
    # each division (n_ab*n_orders vs n_a*n_b) — bit-stable
    "part_affinity_lift": """
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        tot AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
                    AS n_orders FROM li),
        pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                         CAST(COUNT(*) AS BIGINT) AS n_ab
                  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
                  GROUP BY 1, 2
                  HAVING COUNT(*) >= 2),
        pc AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_part
               FROM li GROUP BY 1)
        SELECT part_a, part_b, n_ab,
               ca.n_part AS n_a, cb.n_part AS n_b,
               CAST(n_ab AS DOUBLE) / n_orders AS support,
               CAST(n_ab * n_orders AS DOUBLE) / (ca.n_part * cb.n_part)
                   AS lift
        FROM pairs
        JOIN pc ca ON pairs.part_a = ca.l_partkey
        JOIN pc cb ON pairs.part_b = cb.l_partkey
        CROSS JOIN tot
    """,
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               {_money('l_extendedprice')} AS sum_base_price,
               {_money('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
               {_money('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
               SUM(l_quantity) / COUNT(*) AS avg_qty,
               {_money('l_extendedprice')} / COUNT(*) AS avg_price,
               {_money('l_discount')} / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": f"""
        SELECT l_orderkey,
               {_money('l_extendedprice * (1 - l_discount)')} AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    "orders_stats_pushdown": """
        SELECT COUNT(*) AS n_orders,
               MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
               MIN(o_custkey) AS min_custkey, MAX(o_custkey) AS max_custkey
        FROM orders
    """,
    "q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               {_money('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        GROUP BY 1, 2, 3
    """,
    "q5_local_supplier_volume": f"""
        SELECT n_name, {_money('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
    """,
    "top_parts_per_brand": f"""
        WITH per_part AS (
            SELECT p_brand, p_partkey,
                   {_money('l_extendedprice * (1 - l_discount)')} AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand, p_partkey
        )
        SELECT p_brand, p_partkey, revenue, rk FROM (
            SELECT *, row_number() OVER (
                PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rk
            FROM per_part
        ) WHERE rk <= 3
    """,
    "customer_order_deltas": """
        SELECT o_custkey, o_orderkey,
               o_totalprice - lag(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS price_delta
        FROM orders
    """,
    "segment_distinct_counts": """
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               COUNT(DISTINCT c_nationkey) AS n_nations,
               COUNT(DISTINCT CASE WHEN c_custkey IN (SELECT o_custkey FROM orders)
                                   THEN c_custkey END) AS n_buyers
        FROM customer GROUP BY c_mktsegment
    """,
    # approx_distinct_parts: tolerance oracle — the Spark side emits the
    # exact count plus a boolean asserting the HLL estimate is within 5%
    # (5x rsd) of it; sketch drift flips the boolean and fails the hash.
    "approx_distinct_parts": """
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS exact_parts,
               TRUE AS approx_within_bound
        FROM lineitem GROUP BY l_returnflag
    """,
    "orders_without_lineitems": """
        SELECT o_orderstatus, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
        GROUP BY o_orderstatus
    """,
    "q13_customer_order_histogram": """
        WITH per_cust AS (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey)
        SELECT c_count, COUNT(*) AS custdist FROM per_cust GROUP BY c_count
    """,
    "top_customer_per_nation": """
        SELECT c_nationkey, c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE c_acctbal = (SELECT max(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
    """,
    "nation_pair_volume": f"""
        SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               {_money('l_extendedprice * (1 - l_discount)')} AS volume
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE n1.n_name <> n2.n_name
        GROUP BY 1, 2, 3
    """,
    "heavy_hitter_users": """
        SELECT user_id, COUNT(*) AS n_events FROM events
        GROUP BY user_id ORDER BY n_events DESC, user_id LIMIT 10
    """,
    "min_cost_supplier": """
        WITH costs AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem WHERE l_quantity > 0 GROUP BY 1, 2
        )
        SELECT p_partkey, p_brand, s_name AS supplier, s_acctbal, unit_cost
        FROM costs
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE p_size < 15
          AND unit_cost = (SELECT MIN(c2.unit_cost) FROM costs c2
                           WHERE c2.l_partkey = costs.l_partkey)
    """,
    "market_share": f"""
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               {_money("CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
               / {_money('l_extendedprice * (1 - l_discount)')} AS mkt_share
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
        GROUP BY 1
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
    """,
    "q6_forecast_revenue": f"""
        SELECT {_money("l_extendedprice * l_discount")} AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.03 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q9_product_profit": f"""
        SELECT n_name AS nation,
               CAST(year(l_shipdate) AS INT) AS o_year,
               {_money("l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity")} AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_type = 'PROMO'
        GROUP BY n_name, year(l_shipdate)
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name AS nation,
               {_money("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q12_late_shipment_priorities": """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        GROUP BY l_linestatus
    """,
    "q15_top_supplier": f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   {_money("l_extendedprice * (1 - l_discount)")} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    "q16_part_supplier_counts": """
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        GROUP BY p_brand, p_type, p_size
    """,
    "q20_promotion_suppliers": """
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'SMALL')
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_partkey, l_suppkey
            HAVING SUM(l_quantity) > 100.0
        )
    """,
    "q21_waiting_suppliers": """
        WITH late AS (
            SELECT l_orderkey, l_suppkey
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        )
        SELECT s_name, CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
        FROM late l1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s_name
    """,
    "q11_part_value_share": f"""
        WITH per_part AS (
            SELECT l_partkey,
                   {_money('l_extendedprice * (1 - l_discount)')} AS part_value
            FROM lineitem GROUP BY l_partkey)
        SELECT l_partkey, part_value FROM per_part
        WHERE part_value > (SELECT CAST(SUM(CAST(part_value AS DECIMAL(18,6)))
                                        AS DOUBLE) / COUNT(*)
                            FROM per_part) * 1.5
    """,
    "q14_promo_revenue": f"""
        SELECT CAST(year(l_shipdate) AS INT) AS l_year,
               100.0 * {_money("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
               / {_money('l_extendedprice * (1 - l_discount)')} AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1
    """,
    "q17_small_quantity_revenue": f"""
        WITH li AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#13'),
        a AS (SELECT l_partkey AS a_partkey,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                       / COUNT(*) AS avg_qty
              FROM li GROUP BY 1)
        SELECT {_money('l_extendedprice')} / 7.0
               AS avg_yearly
        FROM li JOIN a ON l_partkey = a_partkey
        WHERE l_quantity < 0.5 * avg_qty
    """,
    "q18_large_volume_customers": """
        WITH big AS (
            SELECT l_orderkey, SUM(l_quantity) AS sum_qty
            FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
        SELECT c_custkey, c_name, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_totalprice, sum_qty
        FROM big JOIN orders ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
    """,
    "q19_disjunctive_revenue": f"""
        SELECT {_money('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q22_idle_customers": f"""
        SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
               {_money('c_acctbal')} AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6)))
                                       AS DOUBLE) / COUNT(*)
                           FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2001-01-01')
        GROUP BY c_nationkey
    """,
    "customer_running_totals": """
        WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate,
                          CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                   FROM orders)
        SELECT o_custkey, o_orderkey,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_index,
               CAST(CAST(SUM(cents) OVER wf AS BIGINT) AS DOUBLE) / 100.0
                   AS running_spend,
               CAST(CAST(SUM(cents) OVER w3 AS BIGINT) AS DOUBLE)
                   / (CAST(COUNT(*) OVER w3 AS DOUBLE) * 100.0) AS moving_avg3,
               strftime(first_value(o_orderdate) OVER wf, '%Y-%m-%d')
                   AS first_order_date
        FROM o
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               wf AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w3 AS (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    # moments assembled from exact integer power sums — see
    # relational.price_quantity_stats for why not built-in stddev/corr
    "price_quantity_stats": """
        WITH base AS (
            SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS xq,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS c
            FROM lineitem),
        s AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(xq) AS BIGINT) AS sx_i,
                   CAST(SUM(c) AS BIGINT) AS sy_c,
                   CAST(SUM(xq * xq) AS BIGINT) AS sxx_i,
                   CAST(SUM((c * c) // 1000000000) AS BIGINT) AS syy_hi,
                   CAST(SUM((c * c) % 1000000000) AS BIGINT) AS syy_lo,
                   CAST(SUM(xq * c) AS BIGINT) AS sxy_c
            FROM base GROUP BY 1),
        g AS (
            SELECT l_returnflag, n,
                   CAST(sx_i AS DOUBLE) AS sx,
                   CAST(sy_c AS DOUBLE) / 100.0 AS sy,
                   CAST(sxx_i AS DOUBLE) AS sxx,
                   (CAST(syy_hi AS DOUBLE) * 1000000000.0
                    + CAST(syy_lo AS DOUBLE)) / 10000.0 AS syy,
                   CAST(sxy_c AS DOUBLE) / 100.0 AS sxy
            FROM s)
        SELECT l_returnflag, n,
               sx / CAST(n AS DOUBLE) AS avg_qty,
               sy / CAST(n AS DOUBLE) AS avg_price,
               round(sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))), 6) AS stddev_qty,
               round(sqrt((CAST(n AS DOUBLE) * syy - sy * sy)
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))), 6) AS stddev_price,
               round((CAST(n AS DOUBLE) * sxy - sx * sy)
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)), 6) AS covar_qty_price,
               round((CAST(n AS DOUBLE) * sxy - sx * sy)
                    / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                           * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS corr_qty_price
        FROM g
    """,
    # heavy_hitters_sketch: tolerance oracle — the exact top-k with a
    # per-row boolean that the frequent-items sketch honored its error
    # bound (items under ~n/maxItemsTracked carry no guarantee and pass
    # vacuously — the sf1 lesson; see relational.heavy_hitters_sketch)
    "heavy_hitters_sketch": """
        SELECT user_id, n_events, TRUE AS sketch_within_bound
        FROM (SELECT user_id, COUNT(*) AS n_events FROM events
              GROUP BY user_id ORDER BY n_events DESC, user_id LIMIT 10)
        ORDER BY n_events DESC, user_id
    """,
    "nation_setops": """
        WITH c AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
             s AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
        SELECT nk, 'both' AS membership FROM c INTERSECT SELECT nk, 'both' FROM s
        UNION ALL
        SELECT nk, 'customers_only' FROM (SELECT nk FROM c EXCEPT SELECT nk FROM s)
        UNION ALL
        SELECT nk, 'suppliers_only' FROM (SELECT nk FROM s EXCEPT SELECT nk FROM c)
    """,
    "click_conversion": """
        SELECT c.event_id AS click_id, c.user_id, p.event_id AS purchase_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND epoch_us(p.ts) >= epoch_us(c.ts)
         AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000
    """,
    "part_name_analysis": r"""
        SELECT CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INT) AS brand_num,
               string_split(p_name, ' ')[1] AS first_word,
               COUNT(*) AS n_parts,
               COUNT(DISTINCT p_type) AS n_types,
               MAX(upper(p_name)) AS max_name_upper,
               CAST(SUM(length(p_name)) AS BIGINT) AS total_name_len
        FROM part GROUP BY 1, 2
    """,
    "monthly_order_stats": f"""
        SELECT CAST(year(o_orderdate) AS INT) AS y,
               CAST(month(o_orderdate) AS INT) AS m,
               COUNT(*) AS n_orders,
               {_money('o_totalprice')} AS total_price,
               COUNT(DISTINCT o_custkey) AS n_customers,
               CAST(COUNT(*) FILTER (WHERE dayofweek(o_orderdate) IN (0, 6)) AS BIGINT)
                   AS weekend_orders
        FROM orders GROUP BY 1, 2
    """,
    "rollup_order_counts": f"""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               {_money('o_totalprice')} AS total_price
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "cube_returnflag_linestatus": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
               SUM(l_quantity) AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "pivot_status_by_priority": """
        SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
               COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        FROM orders GROUP BY o_orderpriority
    """,
    "price_percentiles": """
        SELECT l_returnflag,
               CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE) AS p50,
               CAST(quantile_cont(l_extendedprice, 0.9) AS DOUBLE) AS p90
        FROM lineitem GROUP BY l_returnflag
    """,
    # identical spec via distributed rank selection (the exact-percentile
    # scale path) — same oracle as price_percentiles
    "price_percentiles_exact_rank": """
        SELECT l_returnflag,
               CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE) AS p50,
               CAST(quantile_cont(l_extendedprice, 0.9) AS DOUBLE) AS p90
        FROM lineitem GROUP BY l_returnflag
    """,
    # price_percentiles_approx: tolerance oracle — exact interpolated
    # percentiles plus booleans asserting the sketch is within 0.5% rel err.
    "price_percentiles_approx": """
        SELECT l_returnflag,
               CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE) AS p50,
               CAST(quantile_cont(l_extendedprice, 0.9) AS DOUBLE) AS p90,
               TRUE AS p50_within_bound,
               TRUE AS p90_within_bound
        FROM lineitem GROUP BY l_returnflag
    """,
    "boilerplate_shingles": f"""
        WITH {_SHINGLE_CTE}
        SELECT s AS shingle, CAST(COUNT(*) AS BIGINT) AS doc_freq
        FROM sh GROUP BY s
        ORDER BY doc_freq DESC, shingle
        LIMIT 20
    """,
    # bloom screening has no false negatives and survivors are exactly
    # verified, so the bloom path's spec — and oracle — is the exact one's
    "orders_zorder_census": """
        WITH g AS (
            SELECT o_custkey % 256 AS ck,
                   (CAST(epoch(o_orderdate) AS BIGINT) // 86400) % 256 AS dy
            FROM orders),
        z AS (SELECT (((ck >> 0) & 1) << 0) + (((dy >> 0) & 1) << 1) + (((ck >> 1) & 1) << 2) + (((dy >> 1) & 1) << 3) + (((ck >> 2) & 1) << 4) + (((dy >> 2) & 1) << 5) + (((ck >> 3) & 1) << 6) + (((dy >> 3) & 1) << 7) + (((ck >> 4) & 1) << 8) + (((dy >> 4) & 1) << 9) + (((ck >> 5) & 1) << 10) + (((dy >> 5) & 1) << 11) + (((ck >> 6) & 1) << 12) + (((dy >> 6) & 1) << 13) + (((ck >> 7) & 1) << 14) + (((dy >> 7) & 1) << 15) AS zv FROM g)
        SELECT CAST(zv >> 10 AS INT) AS quadrant,
               COUNT(*) AS n_orders,
               MIN(zv) AS zv_min, MAX(zv) AS zv_max
        FROM z GROUP BY 1
    """,
    "customer_balance_distribution": """
        SELECT c_custkey, c_acctbal,
               CAST(ntile(10) OVER w AS INT) AS decile,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume
        FROM customer WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
    "fuzzy_name_pairs": """
        SELECT a.s_suppkey AS k1, b.s_suppkey AS k2,
               a.s_name AS n1, b.s_name AS n2,
               CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS distance
        FROM supplier a JOIN supplier b
          ON a.s_suppkey < b.s_suppkey
         AND abs(length(a.s_name) - length(b.s_name)) <= 1
        WHERE levenshtein(a.s_name, b.s_name) <= 1
    """,
    "hard_negatives_ann_recall_check": """
        SELECT 'lsh+labelmask' AS method, COUNT(*) AS n_queries,
               TRUE AS recall_ok
        FROM embeddings WHERE label IS NOT NULL
    """,
    "hard_negatives_indexed_check": """
        SELECT 'ivf_indexed+labelmask' AS method, COUNT(*) AS n_queries,
               TRUE AS recall_ok
        FROM embeddings WHERE label IS NOT NULL
    """,
    "orders_cohort_retention": """
        WITH f AS (SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS cm
                   FROM orders GROUP BY 1)
        SELECT strftime(f.cm, '%Y-%m') AS cohort,
               CAST((year(o.o_orderdate) - year(f.cm)) * 12
                    + (month(o.o_orderdate) - month(f.cm)) AS BIGINT) AS months_out,
               COUNT(DISTINCT o.o_custkey) AS n_customers
        FROM orders o JOIN f ON o.o_custkey = f.o_custkey
        GROUP BY 1, 2
    """,
    "orders_profile": _profile_oracle_sql("orders", ORDERS_PROFILE_RENDERERS),
    "referential_integrity_census": _fk_oracle_sql(profiling.FK_EDGES),
    "orders_price_mad": """
        WITH o AS (SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE) AS price
                   FROM orders),
        med AS (SELECT o_orderpriority, quantile_cont(price, 0.5) AS m,
                       COUNT(*) AS n
                FROM o GROUP BY o_orderpriority)
        SELECT o.o_orderpriority,
               any_value(med.n) AS n,
               any_value(med.m) AS median,
               quantile_cont(abs(o.price - med.m), 0.5) * 1.4826 AS mad,
               quantile_cont(abs(o.price - med.m), 0.5) AS mad_raw
        FROM o JOIN med USING (o_orderpriority)
        GROUP BY o.o_orderpriority
    """,
    # Benford census: leading digit from the CENTS bigint's decimal
    # string (canonical cross-engine, unlike double repr); stats combine
    # identical bigints with identical log10 constants
    "orders_benford": """
        WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
                                        AS BIGINT) AS VARCHAR), 1, 1)
                              AS INTEGER) AS digit
                   FROM orders
                   WHERE o_totalprice > 0
                     AND CAST(round(o_totalprice * 100) AS BIGINT) >= 1),
        c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
        t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM c)
        SELECT digit, n,
               CAST(n AS DOUBLE) / n_total AS share,
               log10(1.0 + 1.0 / digit) AS benford_p,
               CAST(n AS DOUBLE) / n_total - log10(1.0 + 1.0 / digit)
                   AS deviation,
               (n - n_total * log10(1.0 + 1.0 / digit))
                   * (n - n_total * log10(1.0 + 1.0 / digit))
                   / (n_total * log10(1.0 + 1.0 / digit)) AS chi2_term
        FROM c CROSS JOIN t
    """,
    "orders_equidepth_histogram": f"""
        WITH cuts AS (SELECT
            {', '.join(f'CAST(quantile_cont(o_totalprice, 0.{i}) AS DOUBLE) AS c{i}'
                       for i in range(1, 10))}
            FROM orders)
        SELECT ({' + '.join(f'CAST(o_totalprice > c{i} AS INTEGER)'
                            for i in range(1, 10))}) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
               {_money('o_totalprice')} AS sum_total
        FROM orders CROSS JOIN cuts
        GROUP BY 1
    """,
    # round-11: duplicate-payment suspects — same-customer same-day
    # multi-order groups, identical amounts flagged via exact cents
    "orders_duplicate_payments": """
        SELECT o_custkey, o_orderdate,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(COUNT(DISTINCT CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS n_distinct_amounts,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents,
               array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys
        FROM orders
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
    """,
    # round-11: constraint census — one conditional-sum pass, NULL
    # predicate = violation
    "lineitem_constraint_check": """
        WITH one AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
            CAST(SUM(CASE WHEN COALESCE(l_discount >= 0.00 AND l_discount <= 0.10, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v1,
            CAST(SUM(CASE WHEN COALESCE(l_tax >= 0.00 AND l_tax <= 0.08, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v2,
            CAST(SUM(CASE WHEN COALESCE(l_quantity >= 1 AND l_quantity <= 50, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v3,
            CAST(SUM(CASE WHEN COALESCE(l_extendedprice > 0, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v4,
            CAST(SUM(CASE WHEN COALESCE(l_returnflag IN ('A','N','R'), FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v5,
            CAST(SUM(CASE WHEN COALESCE(l_linestatus IN ('O','F'), FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v6,
            CAST(SUM(CASE WHEN COALESCE(l_shipdate >= DATE'1992-01-01' AND l_shipdate <= DATE'1998-12-31', FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v7
            FROM lineitem)
        SELECT u.rule, u.n_violations, one.n_rows,
               u.n_violations = 0 AS passes
        FROM one, (
            SELECT * FROM (
                SELECT 'discount_in_range' AS rule, v1 AS n_violations FROM one
                UNION ALL SELECT 'tax_in_range', v2 FROM one
                UNION ALL SELECT 'quantity_in_range', v3 FROM one
                UNION ALL SELECT 'positive_price', v4 FROM one
                UNION ALL SELECT 'returnflag_domain', v5 FROM one
                UNION ALL SELECT 'linestatus_domain', v6 FROM one
                UNION ALL SELECT 'shipdate_bounds', v7 FROM one
            )) u
    """,
    # round-11: ABC census — window cumsum under the same total order,
    # identical integer class cuts
    "customer_abc_analysis": """
        WITH pc AS (SELECT o_custkey,
                           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                                AS BIGINT) AS rev_cents
                    FROM orders GROUP BY 1),
        cum AS (SELECT o_custkey, rev_cents,
                       CAST(SUM(rev_cents) OVER (
                            ORDER BY rev_cents DESC, o_custkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS BIGINT) AS cum_cents,
                       CAST(SUM(rev_cents) OVER () AS BIGINT) AS total_cents
                FROM pc),
        cl AS (SELECT o_custkey, rev_cents, total_cents,
                      CASE WHEN cum_cents * 5 <= total_cents * 4 THEN 'A'
                           WHEN cum_cents * 20 <= total_cents * 19 THEN 'B'
                           ELSE 'C' END AS abc_class
               FROM cum)
        SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(rev_cents) AS BIGINT) AS revenue_cents,
               CAST(SUM(rev_cents) AS DOUBLE) / ANY_VALUE(total_cents)
                   AS revenue_share
        FROM cl GROUP BY 1
    """,
    # round-11: FD-violation census — one exact-distinct aggregate per
    # candidate, unioned 1-row summaries
    "orders_fd_check": """
        SELECT 'o_orderkey -> o_custkey' AS fd,
               CAST(COUNT(*) AS BIGINT) AS n_lhs,
               CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating_lhs,
               CAST(MAX(n_rhs) AS BIGINT) AS max_fanout,
               MAX(n_rhs) = 1 AS holds
        FROM (SELECT o_orderkey, COUNT(DISTINCT o_custkey) AS n_rhs
              FROM orders GROUP BY 1)
        UNION ALL
        SELECT 'o_custkey -> o_orderpriority',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(MAX(n_rhs) AS BIGINT), MAX(n_rhs) = 1
        FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS n_rhs
              FROM orders GROUP BY 1)
        UNION ALL
        SELECT 'o_orderdate -> o_orderstatus',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(MAX(n_rhs) AS BIGINT), MAX(n_rhs) = 1
        FROM (SELECT o_orderdate, COUNT(DISTINCT o_orderstatus) AS n_rhs
              FROM orders GROUP BY 1)
    """,
}
