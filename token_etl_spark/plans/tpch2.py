"""Second wave of analytical queries: HAVING, rollup, set ops beyond the
reference (intersect/except), range-frame windows, exact median, semi-join
counts, OR-of-ANDs predicates — rounding out the relational surface a
migrating user would expect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, Window as W

from token_etl_spark.plans.base import SQL_DAY, QuerySpec, t


# --- Q4-style: order-priority counts for orders with ≥1 lineitem (semi) ----

def q_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


SQL_PRIORITY_COUNTS = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority
"""


# --- Q14-style: promo revenue share (conditional agg ratio) ----------------

def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                * 100.0
                / F.sum(rev)
            ).alias("promo_revenue_pct")
        )
    )


SQL_PROMO_SHARE = """
SELECT sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
       * 100.0 / sum(l_extendedprice * (1 - l_discount)) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


# --- Q18-style: HAVING on aggregated join ----------------------------------

def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .select("o_orderkey", "o_custkey", "o_totalprice", "total_qty")
    )


SQL_LARGE_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice, total_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150) b
  ON o_orderkey = b.l_orderkey
"""


# --- Q19-style: OR-of-ANDs multi-predicate ---------------------------------

def q_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("l_quantity").between(1, 11)) & (F.col("p_size").between(1, 5)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("l_quantity").between(10, 20)) & (F.col("p_size").between(1, 10)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("l_quantity").between(20, 30)) & (F.col("p_size").between(1, 15)))
    )
    return joined.filter(cond).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count("*").alias("n_items"),
    )


SQL_DISJUNCTIVE_FILTER = """
SELECT sum(l_extendedprice * (1 - l_discount)) AS revenue, count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
"""


# --- rollup (grouping-set capability beyond the reference) -----------------

def q_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("sum_qty")
    )


SQL_ROLLUP_COUNTS = """
SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


# --- intersect / except (U3 — absent in reference, free in Spark) ----------

def q_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .intersect(s.select(F.col("s_nationkey").alias("nationkey")))
    )


SQL_INTERSECT_NATIONS = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


def q_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey")).subtract(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


SQL_EXCEPT_NATIONS = """
SELECT DISTINCT c_nationkey AS nationkey FROM customer
WHERE c_nationkey NOT IN (SELECT s_nationkey FROM supplier)
"""


# --- range-frame window (rangeBetween — W3 family) -------------------------

def q_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    ts = F.unix_timestamp("ts").cast("long")
    base = ev.select("event_id", "user_id", ts.alias("ts_sec"), "value")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-3600, 0)
    )
    return base.select(
        "event_id",
        "user_id",
        "ts_sec",
        F.sum("value").over(w).alias("value_1h_window"),
    )


SQL_RANGE_WINDOW = """
SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
       sum(value) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS value_1h_window
FROM events
"""


# --- exact median / percentile ---------------------------------------------

def q_median_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("median_price"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90_price"),
    )


SQL_MEDIAN_PRICES = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS median_price,
       quantile_cont(l_extendedprice, 0.9) AS p90_price
FROM lineitem GROUP BY l_returnflag
"""


# --- Q7-style: revenue by (nation, year) ----------------------------------

def q_nation_year_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    dims = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select("c_custkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .groupBy("n_name", F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


SQL_NATION_YEAR_VOLUME = """
SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name, year(l_shipdate)
"""


# --- Q13-style: customer order-count distribution --------------------------

def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


SQL_ORDER_COUNT_DISTRIBUTION = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey) pc
GROUP BY c_count
"""


# --- Q17-style: small-quantity revenue vs per-part average (correlated) ----

def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    avg_qty = li.groupBy(F.col("l_partkey").alias("p_key")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    brand_parts = part.filter(F.col("p_brand") == "Brand#5").select("p_partkey")
    return (
        li.join(F.broadcast(brand_parts), li.l_partkey == brand_parts.p_partkey)
        .join(avg_qty, li.l_partkey == avg_qty.p_key)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg((F.sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


SQL_SMALL_QUANTITY_REVENUE = """
SELECT sum(l_extendedprice) / 7.0 AS avg_yearly
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#5'
  AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem i
                    WHERE i.l_partkey = lineitem.l_partkey)
"""


# --- Q22-style: above-average-balance customers with no orders -------------

def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The average-balance scalar enters the plan via a 1-row broadcast
    crossJoin (as in Q17/Q11) — plan construction launches zero jobs and
    the whole query runs as one Spark job."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("avg_bal"))
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("numcust"), F.sum("c_acctbal").alias("totacctbal"))
    )


SQL_IDLE_RICH_CUSTOMERS = """
SELECT c_mktsegment, count(*) AS numcust, sum(c_acctbal) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
"""


# --- approx distinct (scale variant of A6; tolerance-style oracle) ---------

def q_approx_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL estimate per day, checked against the exact count in the same
    plan. The HLL value itself is estimator-specific (DuckDB's sketch
    differs), so the contract is a tolerance bound: emit the EXACT count
    plus a boolean ``hll_within_10pct``; the oracle recomputes the exact
    count and asserts the boolean TRUE. A hash match therefore proves
    both the exact path and that Spark's HLL (rsd=0.05 default) stayed
    within 10% relative error on every group."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            ((F.unix_timestamp("ts").cast("long") / 86400).cast("long") * 86400).alias("day_ts")
        )
        .agg(
            F.countDistinct("user_id").cast("long").alias("exact_users"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            "day_ts",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.10 * F.col("exact_users")
            ).alias("hll_within_10pct"),
        )
    )


SQL_APPROX_ACTIVE_USERS = f"""
SELECT {SQL_DAY.format(ts='ts')} AS day_ts,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS hll_within_10pct
FROM events
GROUP BY 1
"""


# --- Q8-style: market share of one nation per year -------------------------

def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    dims = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select("c_custkey", "n_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .select(F.year("o_orderdate").cast("long").alias("order_year"), F.col("n_name"), rev.alias("rev"))
    )
    return joined.groupBy("order_year").agg(
        (
            F.sum(F.when(F.col("n_name") == "NATION_0", F.col("rev")).otherwise(F.lit(0.0)))
            / F.sum("rev")
        ).alias("mkt_share")
    )


SQL_MARKET_SHARE = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       sum(CASE WHEN n_name = 'NATION_0' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
       / sum(l_extendedprice * (1 - l_discount)) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY year(o_orderdate)
"""


# --- Q9-style: profit by (supplier nation, year) ----------------------------

def q_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    part = t(spark, sf_dir, "part")
    sdim = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey", "n_name")
    # no partsupp table → profit proxy: revenue − retailprice×qty×0.6
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * 0.6
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sdim), li.l_suppkey == sdim.s_suppkey)
        .groupBy("n_name", F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(F.sum(profit).alias("profit"))
    )


SQL_PROFIT_BY_NATION_YEAR = """
SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       sum(l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.6) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, year(l_shipdate)
"""


# --- Q16-style: part-type supplier stats ------------------------------------

def q_part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(~F.col("p_brand").isin("Brand#1"))
        .groupBy("p_type", "p_size")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.countDistinct("l_partkey").alias("part_cnt"),
        )
    )


SQL_PART_TYPE_STATS = """
SELECT p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt,
       count(DISTINCT l_partkey) AS part_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand NOT IN ('Brand#1')
GROUP BY p_type, p_size
"""


# --- rank / dense_rank / ntile window pack ---------------------------------

def q_rank_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).cast("long").alias("bal_rank"),
        F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
        F.ntile(4).over(w).cast("long").alias("bal_quartile"),
    )


SQL_RANK_PACK = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       CAST(rank()       OVER w AS BIGINT) AS bal_rank,
       CAST(dense_rank() OVER w AS BIGINT) AS bal_dense_rank,
       CAST(ntile(4)     OVER w AS BIGINT) AS bal_quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
"""


# --- cube (full grouping-set lattice) ---------------------------------------

def q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), F.sum("o_totalprice").alias("total")
    )


SQL_CUBE_COUNTS = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n, sum(o_totalprice) AS total
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def q_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint suite over orders in ONE aggregation pass
    (operators/profile.py validate — 'unit tests for data', Schelter et
    al. 2018). Includes a deliberately failing constraint
    (uniqueness(o_custkey) — customers repeat across orders) so the
    failed-row path is driver-verified, not just the all-green path.
    Metrics are single divisions of exact counts; the oracle replays
    each one."""
    from token_etl_spark.operators import profile as P

    orders = t(spark, sf_dir, "orders")
    checks = [
        P.check_completeness("o_custkey"),
        P.check_uniqueness("o_orderkey"),
        P.check_uniqueness("o_custkey"),  # fails: customers repeat
        P.check_min("o_totalprice", 0.0),
        P.check_max("o_totalprice", 600_000.0),
        P.check_values_in("o_orderstatus", ("F", "O", "P")),
        P.check_row_count(100),
    ]
    return P.validate(orders, checks)


SQL_DATA_QUALITY = """
WITH s AS (
  SELECT count(*) AS total,
         CAST(count(o_custkey) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m0,
         CAST(count(DISTINCT o_orderkey) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m1,
         CAST(count(DISTINCT o_custkey) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m2,
         CAST(min(o_totalprice) AS DOUBLE) AS m3,
         CAST(max(o_totalprice) AS DOUBLE) AS m4,
         CAST(sum(CASE WHEN o_orderstatus IN ('F', 'O', 'P') THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS m5,
         CAST(count(*) AS DOUBLE) AS m6
  FROM orders)
SELECT 'completeness' AS check_name, 'o_custkey' AS col_name, round(m0, 6) AS metric,
       CAST(1.0 AS DOUBLE) AS threshold, round(m0, 6) >= CAST(1.0 AS DOUBLE) AS passed FROM s
UNION ALL
SELECT 'uniqueness', 'o_orderkey', round(m1, 6), CAST(1.0 AS DOUBLE),
       round(m1, 6) >= CAST(1.0 AS DOUBLE) FROM s
UNION ALL
SELECT 'uniqueness', 'o_custkey', round(m2, 6), CAST(1.0 AS DOUBLE),
       round(m2, 6) >= CAST(1.0 AS DOUBLE) FROM s
UNION ALL
SELECT 'min_bound', 'o_totalprice', round(m3, 6), CAST(0.0 AS DOUBLE),
       round(m3, 6) >= CAST(0.0 AS DOUBLE) FROM s
UNION ALL
SELECT 'max_bound', 'o_totalprice', round(m4, 6), CAST(600000.0 AS DOUBLE),
       round(m4, 6) <= CAST(600000.0 AS DOUBLE) FROM s
UNION ALL
SELECT 'values_in', 'o_orderstatus', round(m5, 6), CAST(1.0 AS DOUBLE),
       round(m5, 6) >= CAST(1.0 AS DOUBLE) FROM s
UNION ALL
SELECT 'row_count', '*', round(m6, 6), CAST(100.0 AS DOUBLE),
       round(m6, 6) >= CAST(100.0 AS DOUBLE) FROM s
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — ((status, priority), (status), ()) but
    NOT (priority): the combination rollup can't express (it's a prefix
    chain) and cube over-produces. The DataFrame API has only
    rollup/cube, so the idiomatic Spark form is cube + a
    ``grouping_id`` filter — Catalyst prunes nothing here (cube expands
    then filters), which is fine: the Expand operator emits each set's
    rows in one pass either way. ``gid`` is emitted so the oracle's
    GROUPING_ID (same MSB-first bit convention in both engines)
    disambiguates NULL-as-value from NULL-as-aggregated."""
    o = t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n"),
            F.sum("o_totalprice").alias("total"),
        )
        .where(F.col("gid").isin(0, 1, 3))
        .select("o_orderstatus", "o_orderpriority", F.col("gid").cast("long").alias("gid"), "n", "total")
    )


SQL_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       count(*) AS n, sum(o_totalprice) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


# --- statistical aggregate pack --------------------------------------------

def q_stats_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per return flag: sample stddev/variance,
    correlation and sample covariance of quantity vs extended price."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.stddev_samp("l_quantity").alias("qty_stddev"),
        F.var_samp("l_quantity").alias("qty_var"),
        F.corr("l_quantity", "l_extendedprice").alias("qty_price_corr"),
        F.covar_samp("l_quantity", "l_extendedprice").alias("qty_price_covar"),
        F.avg("l_discount").alias("mean_discount"),
    )


SQL_STATS_PACK = """
SELECT l_returnflag,
       stddev_samp(l_quantity) AS qty_stddev,
       var_samp(l_quantity) AS qty_var,
       corr(l_quantity, l_extendedprice) AS qty_price_corr,
       covar_samp(l_quantity, l_extendedprice) AS qty_price_covar,
       avg(l_discount) AS mean_discount
FROM lineitem
GROUP BY l_returnflag
"""


# --- window pack 2: lead / first_value / last_value / percent_rank ---------

def q_window_pack2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second window pack over each customer's order history: next order
    date (lead), first/last order value in the running frame, and the
    percent rank of the order's price within the customer."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lead("o_orderdate", 1).over(w).alias("next_order_date"),
        F.first("o_totalprice").over(wf).alias("first_price"),
        F.last("o_totalprice").over(wf).alias("running_last_price"),
        F.percent_rank().over(
            W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
        ).alias("price_pct_rank"),
    )


SQL_WINDOW_PACK2 = """
SELECT o_orderkey, o_custkey,
       lead(o_orderdate, 1) OVER w AS next_order_date,
       first_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS first_price,
       last_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS running_last_price,
       percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
         AS price_pct_rank
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# --- histogram-sketch quantiles (scale variant of rel_median_prices) -------

HIST_LO, HIST_HI, HIST_BINS = 900.0, 105000.0, 128
HIST_QS = (0.5, 0.9, 0.99)
_HW = repr((HIST_HI - HIST_LO) / HIST_BINS)


def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of l_extendedprice per return flag from a 128-bin
    equi-width histogram sketch (operators/sketch.py histogram_counts /
    histogram_quantiles). Unlike ``rel_median_prices``' exact
    percentile — whose global per-group sort is the wrong plan at
    100 TB — the sketch is one map-side-combinable groupBy into 128
    cells per group, merged by addition, and the estimate is a pinned
    fixed-order interpolation the oracle replays bit-for-bit (the bin
    width divides by a power of two, so even the width literal is
    exact)."""
    from token_etl_spark.operators.sketch import (
        histogram_counts,
        histogram_quantiles,
    )

    li = t(spark, sf_dir, "lineitem")
    hist = histogram_counts(
        li, "l_extendedprice", HIST_LO, HIST_HI, HIST_BINS, ("l_returnflag",)
    )
    out = histogram_quantiles(
        hist, HIST_QS, HIST_LO, HIST_HI, HIST_BINS, ("l_returnflag",)
    )
    return out.select(
        "l_returnflag", "q", "n_rows", "bin", F.round("est", 6).alias("est")
    )


_HQ = ", ".join(f"CAST({q} AS DOUBLE)" for q in HIST_QS)

SQL_HISTOGRAM_QUANTILES = f"""
WITH b AS (
  SELECT l_returnflag,
         CAST(least(greatest(floor((CAST(l_extendedprice AS DOUBLE)
                                    - CAST({HIST_LO!r} AS DOUBLE))
                                   / CAST({_HW} AS DOUBLE)), 0),
                    {HIST_BINS - 1}) AS BIGINT) AS bin
  FROM lineitem WHERE l_extendedprice IS NOT NULL),
h AS (SELECT l_returnflag, bin, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
c AS (
  SELECT l_returnflag, bin, cnt,
         CAST(sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n_rows
  FROM h),
e AS (
  SELECT l_returnflag, q, n_rows, bin,
         CAST({HIST_LO!r} AS DOUBLE) + CAST({_HW} AS DOUBLE)
           * (CAST(bin AS DOUBLE)
              + (q * CAST(n_rows AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
                / CAST(cnt AS DOUBLE)) AS est
  FROM c CROSS JOIN (SELECT unnest([{_HQ}]) AS q)
  WHERE CAST(cum - cnt AS DOUBLE) < q * CAST(n_rows AS DOUBLE)
    AND q * CAST(n_rows AS DOUBLE) <= CAST(cum AS DOUBLE))
SELECT l_returnflag, q, n_rows, bin, round(est, 6) AS est FROM e
"""


SPECS = [
    QuerySpec("tpch_priority_counts", q_priority_counts, SQL_PRIORITY_COUNTS, ("join-semi", "agg")),
    QuerySpec("ext_histogram_quantiles", q_histogram_quantiles, SQL_HISTOGRAM_QUANTILES, ("sketch", "agg-approx")),
    QuerySpec("tpch_promo_share", q_promo_share, SQL_PROMO_SHARE, ("agg-conditional",)),
    QuerySpec("tpch_large_orders", q_large_orders, SQL_LARGE_ORDERS, ("having",)),
    QuerySpec("tpch_disjunctive_filter", q_disjunctive_filter, SQL_DISJUNCTIVE_FILTER, ("predicate",)),
    QuerySpec("rel_rollup_counts", q_rollup_counts, SQL_ROLLUP_COUNTS, ("grouping-sets",)),
    QuerySpec("rel_intersect_nations", q_intersect_nations, SQL_INTERSECT_NATIONS, ("setop",)),
    QuerySpec("rel_except_nations", q_except_nations, SQL_EXCEPT_NATIONS, ("setop",)),
    QuerySpec("rel_range_window", q_range_window, SQL_RANGE_WINDOW, ("window-range",)),
    QuerySpec("rel_median_prices", q_median_prices, SQL_MEDIAN_PRICES, ("agg-percentile",)),
    QuerySpec("rel_approx_active_users", q_approx_active_users, SQL_APPROX_ACTIVE_USERS, ("agg-approx",)),
    QuerySpec("rel_stats_pack", q_stats_pack, SQL_STATS_PACK, ("agg-statistical",)),
    QuerySpec("rel_window_pack2", q_window_pack2, SQL_WINDOW_PACK2, ("window-analytic",)),
    QuerySpec("tpch_nation_year_volume", q_nation_year_volume, SQL_NATION_YEAR_VOLUME, ("join-multiway",)),
    QuerySpec("tpch_order_count_distribution", q_order_count_distribution, SQL_ORDER_COUNT_DISTRIBUTION, ("join-outer", "agg")),
    QuerySpec("tpch_small_quantity_revenue", q_small_quantity_revenue, SQL_SMALL_QUANTITY_REVENUE, ("subquery",)),
    QuerySpec("tpch_idle_rich_customers", q_idle_rich_customers, SQL_IDLE_RICH_CUSTOMERS, ("join-anti", "subquery")),
    QuerySpec("tpch_market_share", q_market_share, SQL_MARKET_SHARE, ("agg-ratio", "join-multiway")),
    QuerySpec("tpch_profit_by_nation_year", q_profit_by_nation_year, SQL_PROFIT_BY_NATION_YEAR, ("join-multiway",)),
    QuerySpec("tpch_part_type_stats", q_part_type_stats, SQL_PART_TYPE_STATS, ("agg-distinct",)),
    QuerySpec("rel_rank_pack", q_rank_pack, SQL_RANK_PACK, ("window-rank",)),
    QuerySpec("rel_cube_counts", q_cube_counts, SQL_CUBE_COUNTS, ("grouping-sets",)),
    QuerySpec("rel_grouping_sets", q_grouping_sets, SQL_GROUPING_SETS, ("grouping-sets",)),
    QuerySpec("ext_data_quality", q_data_quality, SQL_DATA_QUALITY, ("profile", "validation")),
]
