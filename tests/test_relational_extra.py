"""DuckDB twins for the r4 breadth TPC-H shapes (beyond the 50-entry gate
window): conditional-aggregate ratio (Q14), correlated aggregate as a
two-pass join (Q17), group-HAVING semi join (Q18), disjunctive predicate
pushdown (Q19). Each Spark result must match the independently-phrased SQL
bit-for-bit after the shared stable rounding."""

import duckdb
import pytest

from kafka_connector_s3_sink_spark.operators import relational

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("lineitem", "orders", "part", "customer", "events")


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_promo_revenue_ratio(spark, con):
    got = _rows(relational.promo_revenue_ratio(spark, SF_DIR))
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
            SELECT floor((100.0 *
                sum(CASE WHEN p_type = 'PROMO'
                    THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
                / sum(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5)
                / 10000.0 AS promo_revenue_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-07-01'
            """
        ).fetchall()
    )
    assert got == want and got[0][0] > 0


def test_small_quantity_revenue(spark, con):
    got = _rows(relational.small_quantity_revenue(spark, SF_DIR))
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
            WITH pa AS (
                SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_floor
                FROM lineitem GROUP BY 1
            )
            SELECT floor((sum(l_extendedprice) / 7.0) * 100.0 + 0.5) / 100.0
                AS avg_yearly_small_qty_revenue
            FROM lineitem JOIN pa USING (l_partkey)
            WHERE l_quantity < qty_floor
            """
        ).fetchall()
    )
    assert got == want


def test_large_volume_orders(spark, con):
    got = [tuple(r) for r in relational.large_volume_orders(spark, SF_DIR).collect()]
    want = [
        tuple(r)
        for r in con.execute(
            """
            WITH big AS (
                SELECT l_orderkey,
                    floor(sum(l_quantity) * 100.0 + 0.5) / 100.0 AS total_qty
                FROM lineitem GROUP BY 1
                HAVING floor(sum(l_quantity) * 100.0 + 0.5) / 100.0 > 150.0
            )
            SELECT c_name, o_orderkey, o_totalprice AS total_price, total_qty
            FROM big
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY total_price DESC, o_orderkey ASC
            LIMIT 20
            """
        ).fetchall()
    ]
    assert got == want and len(got) > 0


def test_disjunctive_branded_revenue(spark, con):
    got = _rows(relational.disjunctive_branded_revenue(spark, SF_DIR))
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
            SELECT count(*) AS n_lines,
                floor(sum(l_extendedprice * (1 - l_discount)) * 100.0 + 0.5)
                    / 100.0 AS disc_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 20)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
                   AND l_quantity BETWEEN 10 AND 35)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50
                   AND l_quantity BETWEEN 20 AND 50)
            """
        ).fetchall()
    )
    assert got == want and got[0][0] > 0


def test_disjunctive_predicates_reach_both_scans(spark):
    """The OR-of-ANDs splits per side: both the part scan and the lineitem
    scan must carry pushed filters (the point of the Q19 shape)."""
    plan = (
        relational.disjunctive_branded_revenue(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pushed = [
        seg.split("]")[0]
        for seg in plan.split("PushedFilters: [")[1:]
        if seg and not seg.startswith("]")
    ]
    assert any("p_brand" in s or "p_size" in s for s in pushed), pushed
    assert any("l_quantity" in s for s in pushed), pushed


def test_waiting_suppliers(spark, con):
    got = [tuple(r) for r in relational.waiting_suppliers(spark, SF_DIR).collect()]
    want = [
        tuple(r)
        for r in con.execute(
            """
            WITH j AS (
                SELECT l_orderkey, l_suppkey,
                    CAST(l_shipdate > o_orderdate + INTERVAL 90 DAY AS INTEGER)
                        AS late
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            ),
            per_supp AS (
                SELECT l_orderkey, l_suppkey, max(late) AS supp_late
                FROM j GROUP BY 1, 2
            ),
            per_order AS (
                SELECT l_orderkey, count(*) AS n_supp,
                    sum(supp_late) AS n_late_supp
                FROM per_supp GROUP BY 1
            )
            SELECT l_suppkey, count(*) AS numwait
            FROM per_supp JOIN per_order USING (l_orderkey)
            WHERE supp_late = 1 AND n_supp > 1 AND n_late_supp = 1
            GROUP BY 1
            ORDER BY numwait DESC, l_suppkey ASC
            LIMIT 20
            """
        ).fetchall()
    ]
    assert got == want and len(got) > 0


def test_idle_rich_customers(spark, con):
    got = [tuple(r) for r in relational.idle_rich_customers(spark, SF_DIR).collect()]
    want = [
        tuple(r)
        for r in con.execute(
            """
            WITH avg_bal AS (
                SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
            ),
            active AS (
                SELECT o_custkey FROM orders GROUP BY 1 HAVING count(*) > 5
            )
            SELECT c_mktsegment, count(*) AS n_customers,
                floor(sum(c_acctbal) * 100.0 + 0.5) / 100.0 AS total_balance
            FROM customer, avg_bal
            WHERE c_acctbal > a
              AND c_custkey NOT IN (SELECT o_custkey FROM active)
            GROUP BY 1 ORDER BY 1
            """
        ).fetchall()
    ]
    assert got == want and len(got) > 0


def test_nation_pair_trade(spark, con):
    con.execute(
        "CREATE VIEW IF NOT EXISTS supplier AS "
        f"SELECT * FROM read_parquet('{SF_DIR}/supplier.parquet')"
    )
    con.execute(
        "CREATE VIEW IF NOT EXISTS nation AS "
        f"SELECT * FROM read_parquet('{SF_DIR}/nation.parquet')"
    )
    got = [tuple(r) for r in relational.nation_pair_trade(spark, SF_DIR).collect()]
    want = [
        tuple(r)
        for r in con.execute(
            """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                CAST(year(l_shipdate) AS BIGINT) AS ship_year,
                floor(sum(l_extendedprice * (1 - l_discount)) * 100.0 + 0.5)
                    / 100.0 AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE n1.n_name <> n2.n_name
            GROUP BY 1, 2, 3
            ORDER BY revenue DESC, supp_nation, cust_nation, ship_year
            LIMIT 25
            """
        ).fetchall()
    ]
    assert got == want and len(got) == 25


def test_order_count_distribution(spark, con):
    got = [
        tuple(r)
        for r in relational.order_count_distribution(spark, SF_DIR).collect()
    ]
    want = [
        tuple(r)
        for r in con.execute(
            """
            WITH per_cust AS (
                SELECT c_custkey, count(o_orderkey) AS n_orders
                FROM customer LEFT JOIN orders ON c_custkey = o_custkey
                GROUP BY 1
            )
            SELECT n_orders, count(*) AS n_customers
            FROM per_cust GROUP BY 1
            ORDER BY n_customers DESC, n_orders DESC
            """
        ).fetchall()
    ]
    assert got == want and sum(r[1] for r in got) == 150


def _dim_views(con):
    for t in ("supplier", "nation", "region"):
        con.execute(
            f"CREATE VIEW IF NOT EXISTS {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )


def test_national_market_share(spark, con):
    """Q8: one-pass conditional-sum ratio per year."""
    _dim_views(con)
    got = [tuple(r) for r in relational.national_market_share(spark, SF_DIR).collect()]
    want = [
        tuple(r)
        for r in con.execute(
            """
            SELECT year(l_shipdate) AS o_year,
                floor((sum(CASE WHEN n1.n_name = 'BRAZIL'
                        THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
                    / sum(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5)
                    / 10000.0 AS mkt_share
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'AMERICA'
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            GROUP BY 1 ORDER BY 1
            """
        ).fetchall()
    ]
    assert got == want and len(got) > 0


def test_product_type_profit(spark, con):
    """Q9 (partsupp-free adaptation): star-join profit per (nation, year)."""
    _dim_views(con)
    got = [tuple(r) for r in relational.product_type_profit(spark, SF_DIR).collect()]
    want = [
        tuple(r)
        for r in con.execute(
            """
            SELECT n_name AS nation, year(l_shipdate) AS o_year,
                floor(sum(l_extendedprice * (1 - l_discount)
                    - 0.1 * p_retailprice * l_quantity) * 100.0 + 0.5)
                    / 100.0 AS profit
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY 1, 2 ORDER BY nation, o_year DESC
            """
        ).fetchall()
    ]
    assert got == want and len(got) > 0


def test_priority_mode_counts(spark, con):
    """Q12 shape (returnflag standing in for shipmode): conditional counts."""
    got = [tuple(r) for r in relational.priority_mode_counts(spark, SF_DIR).collect()]
    want = [
        tuple(r)
        for r in con.execute(
            """
            SELECT l_returnflag AS line_class,
                sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
                sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_returnflag IN ('A', 'R')
              AND l_shipdate >= '1995-01-01' AND l_shipdate < '1997-01-01'
            GROUP BY 1 ORDER BY 1
            """
        ).fetchall()
    ]
    assert got == want and len(got) == 2


def test_top_supplier_revenue(spark, con):
    """Q15: revenue view + global-max filter (all ties kept)."""
    _dim_views(con)
    got = [tuple(r) for r in relational.top_supplier_revenue(spark, SF_DIR).collect()]
    want = [
        tuple(r)
        for r in con.execute(
            """
            WITH rev AS (
                SELECT l_suppkey,
                    floor(sum(l_extendedprice * (1 - l_discount)) * 100.0 + 0.5)
                        / 100.0 AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
                GROUP BY 1
            )
            SELECT s_suppkey, s_name, total_revenue
            FROM rev JOIN supplier ON l_suppkey = s_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
            ORDER BY s_suppkey
            """
        ).fetchall()
    ]
    assert got == want and len(got) >= 1


def test_parts_supplier_counts(spark, con):
    """Q16 (lineitem pairs as the supply relation): distinct-count rollup."""
    got = [tuple(r) for r in relational.parts_supplier_counts(spark, SF_DIR).collect()]
    want = [
        tuple(r)
        for r in con.execute(
            """
            SELECT p_brand, p_type, p_size, count(DISTINCT suppkey) AS supplier_cnt
            FROM (SELECT DISTINCT l_partkey AS pk, l_suppkey AS suppkey FROM lineitem)
            JOIN part ON pk = p_partkey
            WHERE p_brand <> 'Brand#45' AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
            """
        ).fetchall()
    ]
    assert got == want and len(got) > 0


def test_dominant_part_suppliers(spark, con):
    """Q20 shape: correlated aggregate threshold as two rollups + join."""
    got = [tuple(r) for r in relational.dominant_part_suppliers(spark, SF_DIR).collect()]
    want = [
        tuple(r)
        for r in con.execute(
            """
            WITH ps AS (
                SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq
                FROM lineitem
                WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
                GROUP BY 1, 2
            ),
            p AS (SELECT l_partkey, sum(sq) AS pq FROM ps GROUP BY 1)
            SELECT l_suppkey AS s_suppkey, count(*) AS n_dominant_parts
            FROM ps JOIN p USING (l_partkey)
            WHERE sq > 0.5 * pq GROUP BY 1
            ORDER BY n_dominant_parts DESC, s_suppkey ASC
            """
        ).fetchall()
    ]
    assert got == want and len(got) > 0


def test_segment_revenue_share(spark, con):
    got = [
        tuple(r)
        for r in relational.segment_revenue_share(spark, SF_DIR).collect()
    ]
    want = [
        tuple(r)
        for r in con.execute(
            """
            WITH j AS (
                SELECT o_totalprice, c_mktsegment
                FROM orders JOIN customer ON o_custkey = c_custkey
            ),
            seg AS (
                SELECT c_mktsegment, sum(o_totalprice) AS seg_value FROM j
                GROUP BY 1
            ),
            tot AS (SELECT sum(o_totalprice) AS total FROM j)
            SELECT c_mktsegment,
                floor(seg_value * 100.0 + 0.5) / 100.0 AS segment_value,
                floor((seg_value / total) * 10000.0 + 0.5) / 10000.0 AS share
            FROM seg, tot
            WHERE seg_value > 0.05 * total
            ORDER BY segment_value DESC
            """
        ).fetchall()
    ]
    assert got == want and len(got) > 0


def test_events_after_signup_days_parameter_respected(spark, con):
    """Regression for the r8 verdict defect: `days` was declared but the
    range predicate hard-coded INTERVAL 7 DAYS, so days=30 silently gave
    7-day windows. A wider window must count at least as many events per
    signup, strictly more in total on the fixture, and days=7 must equal
    the default (and the DuckDB twin at days=1)."""
    d7 = {r.signup_id: r.n_events
          for r in relational.events_after_signup(spark, SF_DIR).collect()}
    d1 = {r.signup_id: r.n_events
          for r in relational.events_after_signup(spark, SF_DIR, days=1).collect()}
    d30 = {r.signup_id: r.n_events
           for r in relational.events_after_signup(spark, SF_DIR, days=30).collect()}
    assert d7 and all(d1.get(k, 0) <= v <= d30[k] for k, v in d7.items())
    assert sum(d1.values()) < sum(d7.values()) < sum(d30.values())
    want = dict(
        con.execute(
            """
            SELECT s.event_id, count(*)
            FROM events e
            JOIN (SELECT user_id, event_id, ts FROM events
                  WHERE event_type = 'signup') s
              ON e.user_id = s.user_id
             AND e.ts >= s.ts AND e.ts < s.ts + INTERVAL 1 DAY
            GROUP BY 1
            """
        ).fetchall()
    )
    assert d1 == want
