"""Third wave of TPC-H adaptations (ROADMAP item 7): Q2/Q11/Q15/Q16/Q20/Q21
shapes re-expressed against the driver's star schema, which has no ``partsupp``
table — supply-cost/availability semantics are re-derived from ``lineitem``
(unit cost = l_extendedprice / l_quantity, availability = shipped quantity).

Equivalence notes for the hash-matching oracle:
- Q2/Q15 join on a *computed double* (min unit cost / max revenue). That is
  deterministic across engines only when each candidate value is produced by
  identical row-wise IEEE arithmetic (division, multiplication) — never by a
  reordered aggregation. Both queries honor that: the equality is on row-wise
  values (Q2) or on an aggregate compared against the max of the *same*
  aggregate set (Q15).
- Q21 is expressed as EXISTS/NOT EXISTS in the oracle but as a per-order
  late-supplier-count aggregation in Spark; both compute the same set because
  "no other supplier was late" ≡ "the order's distinct late-supplier count
  is exactly 1 and it is this supplier".

Reference parity: the reference has no TPC-H surface (SURVEY §5 — no tests,
no benchmark); these queries exist to prove the relational operator inventory
(correlated subqueries, argmin/argmax joins, NOT IN, HAVING over scalar
subquery) at oracle-checked fidelity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, Window as W

from token_etl_spark.plans.base import QuerySpec, t


# --- Q2-style: cheapest supplier per part (argmin join) --------------------

def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each large STANDARD part, the EUROPE supplier(s) offering the
    minimum unit cost (l_extendedprice / l_quantity) observed in lineitem.

    The argmin is a window min over p_partkey followed by an equality
    filter on the row-wise unit cost — one shuffle on the part key and a
    single scan of the fact table (the join-back form scans the candidate
    subplan twice; verified with .explain). Dimension sides broadcast.
    """
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    supplier = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")

    eur = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "n_name")
    )
    big_parts = part.filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") > 40)
    ).select("p_partkey", "p_name")

    cand = (
        li.withColumn("unit_cost", F.col("l_extendedprice") / F.col("l_quantity"))
        .join(F.broadcast(eur), li.l_suppkey == eur.s_suppkey)
        .join(F.broadcast(big_parts), li.l_partkey == big_parts.p_partkey)
        .select("p_partkey", "p_name", "s_name", "n_name", "unit_cost")
    )
    return (
        cand.withColumn(
            "min_cost", F.min("unit_cost").over(W.partitionBy("p_partkey"))
        )
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select("p_partkey", "p_name", "s_name", "n_name", "unit_cost")
        .distinct()
    )


SQL_MIN_COST_SUPPLIER = """
WITH cand AS (
  SELECT p_partkey, p_name, s_name, n_name,
         l_extendedprice / l_quantity AS unit_cost
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  JOIN part     ON l_partkey = p_partkey
  WHERE r_name = 'EUROPE' AND p_type = 'STANDARD' AND p_size > 40
)
SELECT DISTINCT c.p_partkey, c.p_name, c.s_name, c.n_name, m.min_cost AS unit_cost
FROM cand c
JOIN (SELECT p_partkey, min(unit_cost) AS min_cost FROM cand GROUP BY p_partkey) m
  ON c.p_partkey = m.p_partkey AND c.unit_cost = m.min_cost
"""


# --- Q11-style: parts holding an outsized share of total value -------------

def q_value_share_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part shipped value, kept only when above 1.5x the mean per-part
    value (HAVING against a scalar subquery; the relative threshold is
    scale-invariant so the query stays non-trivial at every SF). The scalar
    enters the Spark plan via a 1-row broadcast crossJoin — no driver-side
    collect."""
    li = t(spark, sf_dir, "lineitem")
    value = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    per_part = li.groupBy("l_partkey").agg(value.alias("part_value"))
    total = per_part.agg((F.avg("part_value") * F.lit(1.5)).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


SQL_VALUE_SHARE_PARTS = """
WITH per_part AS (
  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS part_value
  FROM lineitem
  GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM per_part
WHERE part_value > (SELECT avg(part_value) * 1.5 FROM per_part)
"""


# --- Q15-style: top supplier(s) by quarterly revenue (argmax) --------------

def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum revenue in 1996Q1. The max is an
    unpartitioned window over the per-supplier aggregate — cardinality is
    |suppliers|, tiny relative to the fact table, so the single-partition
    window is safe at any fact-table scale."""
    li = t(spark, sf_dir, "lineitem")
    supplier = t(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    top = rev.withColumn("max_rev", F.max("total_revenue").over(W.partitionBy()))
    return (
        top.filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(supplier), top.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


SQL_TOP_SUPPLIER = """
WITH rev AS (
  SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


# --- Q16-style: supplier diversity per part shape, minus bad suppliers -----

def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-supplier count per (brand, type, size) over shipped parts,
    excluding PROMO parts and suppliers with negative account balance
    (NOT IN → broadcast anti-join)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    supplier = t(spark, sf_dir, "supplier")
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = part.filter(F.col("p_type") != "PROMO").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_SUPPLIER_PART_COUNTS = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# --- Q20-style: suppliers with heavy shipped volume of red parts -----------

def q_qty_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that shipped more than 50 units of 'red *' parts during
    1996 (semi-join through a per-supplier HAVING aggregate)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    supplier = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    red = part.filter(F.col("p_name").startswith("red ")).select("p_partkey")
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("red_qty"))
        .filter(F.col("red_qty") > 50)
    )
    return (
        supplier.join(heavy, supplier.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_name", "n_name")
    )


SQL_QTY_HEAVY_SUPPLIERS = """
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red %'
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
  HAVING sum(l_quantity) > 50
)
"""


# --- Q21-style: suppliers who alone delayed multi-supplier orders ----------

def q_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per supplier: number of multi-supplier orders where this supplier
    shipped late (> 60 days after order date) and no other supplier did.

    Spark form: two integer aggregations (per order-supplier late flag, then
    per-order supplier/late counts) — shuffle keys l_orderkey then s_name,
    both map-side combinable; the EXISTS/NOT-EXISTS of the classic Q21 is
    equivalent to (n_supp > 1 AND n_late == 1 AND this supplier late).
    """
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    supplier = t(spark, sf_dir, "supplier")
    per = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
                .cast("int")
            ).alias("is_late")
        )
    )
    per_order = per.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    return (
        per.join(per_order, "l_orderkey")
        .filter((F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


SQL_WAITING_ORDERS = """
WITH per AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey, l_suppkey
)
SELECT s_name, count(*) AS numwait
FROM per p1
JOIN supplier ON p1.l_suppkey = s_suppkey
WHERE p1.is_late = 1
  AND EXISTS (SELECT 1 FROM per p2
              WHERE p2.l_orderkey = p1.l_orderkey AND p2.l_suppkey <> p1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM per p3
                  WHERE p3.l_orderkey = p1.l_orderkey
                    AND p3.l_suppkey <> p1.l_suppkey AND p3.is_late = 1)
GROUP BY s_name
"""


# --- Q10-style: revenue lost to returned items, per customer ---------------

def q_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top revenue-losing customers from returned items in 1996H2: 4-way
    join (fact filtered first; customer/nation broadcast), one keyed agg."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(customer), F.col("o_custkey") == customer.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


SQL_RETURNED_REVENUE = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
"""


# --- Q12-style: late-shipment priority mix per return flag -----------------

def q_late_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For 1996's late shipments (> 90 days after order), counts of
    urgent/high vs other orders per return flag (conditional-sum pivot of
    the classic shipmode query — this schema has no l_shipmode)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
            & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(urgent.cast("bigint")).alias("high_line_count"),
            F.sum((~urgent).cast("bigint")).alias("low_line_count"),
        )
    )


SQL_LATE_PRIORITY_MIX = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""


SPECS = [
    QuerySpec("tpch_min_cost_supplier", q_min_cost_supplier, SQL_MIN_COST_SUPPLIER, ("join-argmin", "join-multiway")),
    QuerySpec("tpch_returned_revenue", q_returned_revenue, SQL_RETURNED_REVENUE, ("join-multiway", "agg")),
    QuerySpec("tpch_late_priority_mix", q_late_priority_mix, SQL_LATE_PRIORITY_MIX, ("agg-conditional",)),
    QuerySpec("tpch_value_share_parts", q_value_share_parts, SQL_VALUE_SHARE_PARTS, ("having", "subquery-scalar")),
    QuerySpec("tpch_top_supplier", q_top_supplier, SQL_TOP_SUPPLIER, ("join-argmax", "window")),
    QuerySpec("tpch_supplier_part_counts", q_supplier_part_counts, SQL_SUPPLIER_PART_COUNTS, ("join-anti", "agg-distinct")),
    QuerySpec("tpch_qty_heavy_suppliers", q_qty_heavy_suppliers, SQL_QTY_HEAVY_SUPPLIERS, ("join-semi", "having")),
    QuerySpec("tpch_waiting_orders", q_waiting_orders, SQL_WAITING_ORDERS, ("subquery-correlated", "agg")),
]
