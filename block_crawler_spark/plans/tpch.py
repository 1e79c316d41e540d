"""TPC-H-style analytics over the driver's star schema.

These exercise the engine's relational surface — multi-way joins with
broadcast dimensions, hash aggregations with map-side partials, ordered
top-k (TakeOrderedAndProject, no full sort), scalar aggregates, and
anti-joins — each paired with an exact DuckDB oracle.

Float policy: every aggregate casts to decimal **before** summing, so the
result is exact and engine-independent (double summation order is not).

Output policy (round-2, VERDICT.md r1): the driver hashes pandas-fetched
frames, where DuckDB DECIMAL/HUGEINT become float64 while Spark Decimals
stay Decimal — so *emitted* numeric columns must be BIGINT on both engines.
Money is emitted as fixed-point integer (cents for scale-2, ten-thousandths
for scale-4 intermediates): the decimal sum is exact, then ``sum * 10^s``
has zero fractional part, so the BIGINT cast is exact on both engines
(sidestepping DuckDB round-half-up vs Spark truncate on decimal→int casts).
Decimal arithmetic stays internal; only the final projection changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table


def _dec(col, p=18, s=2):
    return F.col(col).cast(f"decimal({p},{s})")


def _fixed(expr, scale_pow: int):
    """Exact decimal → BIGINT fixed-point: multiply by 10^scale_pow (making
    the value integral) then cast.  Exact on both engines because the
    fractional part is zero after the multiply."""
    return (expr * F.lit(10**scale_pow)).cast("long")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + _dec("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _fixed(F.sum(_dec("l_quantity")).cast("decimal(38,2)"), 2).alias("sum_qty"),
            _fixed(F.sum(_dec("l_extendedprice")).cast("decimal(38,2)"), 2).alias("sum_base_price"),
            _fixed(F.sum(disc_price).cast("decimal(38,4)"), 4).alias("sum_disc_price"),
            _fixed(F.sum(charge).cast("decimal(38,6)"), 6).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) * 1000000 AS BIGINT) AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp"))
    revenue = _fixed(
        F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).cast("decimal(38,4)"),
        4,
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    revenue = _fixed(
        F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).cast("decimal(38,4)"),
        4,
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(revenue.alias("revenue"))
    )


Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(_fixed(F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("decimal(38,4)"), 4).alias("revenue"))
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.04 AND l_discount <= 0.06 AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    revenue = _fixed(
        F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).cast("decimal(38,4)"),
        4,
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def orders_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias("month"))
        .agg(
            F.count("*").alias("n_orders"),
            _fixed(F.sum(_dec("o_totalprice")).cast("decimal(38,2)"), 2).alias("total"),
        )
    )


# month as a STRING: a DATE column reaches pandas as datetime.date from
# Spark but datetime64 from DuckDB ("1995-01-01" vs "1995-01-01 00:00:00").
ORDERS_MONTHLY_SQL = """
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total
FROM orders GROUP BY 1
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (the J2 'leftover rows' pattern as a standalone operator)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def part_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            _fixed(F.sum(_dec("l_extendedprice")).cast("decimal(38,2)"), 2).alias("revenue"),
            _fixed(F.sum(_dec("l_quantity")).cast("decimal(38,2)"), 2).alias("qty"),
            F.count("*").alias("n_items"),
        )
    )


PART_BRAND_SQL = """
SELECT p_brand,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS qty,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""

def brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16-style distinct aggregate: suppliers per brand."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count_distinct("l_suppkey").alias("n_suppliers"), F.count_distinct("l_partkey").alias("n_parts"))
    )


Q16_SQL = """
SELECT p_brand, COUNT(DISTINCT l_suppkey) AS n_suppliers, COUNT(DISTINCT l_partkey) AS n_parts
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q22-style: above-average-balance customers with no orders.

    The scalar-average predicate is evaluated exactly as
    ``balance * N > total`` in decimal space — no division, so both engines
    agree bit-for-bit on boundary rows.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    stats = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).cast("decimal(38,2)").alias("total"),
        F.count("*").alias("n"),
    )
    rich = (
        c.crossJoin(F.broadcast(stats))
        .filter(_dec("c_acctbal") * F.col("n") > F.col("total"))
        .select("c_custkey", _fixed(_dec("c_acctbal"), 2).alias("acctbal"))
    )
    return rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")


Q22_SQL = """
WITH stats AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total, COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0
)
SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS acctbal
FROM customer, stats
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > total
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def cheapest_part_per_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2-style correlated-min: parts matching the minimum retail price of
    their size class (window min instead of a correlated subquery)."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_size")
    return (
        p.withColumn("min_price", F.min(_dec("p_retailprice")).over(w))
        .filter(_dec("p_retailprice") == F.col("min_price"))
        .select("p_size", "p_partkey", "p_brand", _fixed(_dec("p_retailprice"), 2).alias("price"))
    )


Q2_SQL = """
SELECT p_size, p_partkey, p_brand, CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price
FROM part p
WHERE CAST(p_retailprice AS DECIMAL(18,2)) = (
  SELECT MIN(CAST(p_retailprice AS DECIMAL(18,2))) FROM part p2 WHERE p2.p_size = p.p_size
)
"""

def order_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4-style: orders with at least one late lineitem (left-semi join)."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1998-01-01')
GROUP BY o_orderpriority
"""


def shipmode_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q12-style conditional aggregation over a join."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority"),
        )
    )


# CAST(SUM(...) AS BIGINT): DuckDB SUM(int) yields HUGEINT, which the
# driver's pandas fetch downgrades to float64 — the cast keeps it int64.
Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_priority,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_priority
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
"""


def big_orders_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q18-style: group + HAVING on an aggregate, join back to dimension."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast("decimal(38,2)").alias("total_qty_dec"))
        .filter(F.col("total_qty_dec") > 150)
        .select("l_orderkey", _fixed(F.col("total_qty_dec"), 2).alias("total_qty"))
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "l_orderkey", "total_qty")
    )


Q18_SQL = """
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) > 150
)
SELECT c_custkey, c_name, l_orderkey, total_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
"""

def nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q7-style: revenue between supplier-nation/customer-nation pairs by year."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    revenue = _fixed(
        F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).cast("decimal(38,4)"),
        4,
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(revenue.alias("revenue"))
    )


Q7_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT)*1 AS ship_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation sn ON s_nationkey = sn.n_nationkey
              JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name <> cn.n_name
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
"""


def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q14-style: share of revenue from 'promo'-typed parts, in integer ppm
    (LIKE predicate + conditional aggregate ratio)."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    rev = (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).cast("decimal(18,4)")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    promo = F.col("p_type").startswith("PROMO") | F.col("p_type").contains("BRASS")
    return j.agg(
        _fixed(F.sum(F.when(promo, rev)).cast("decimal(38,4)"), 4).alias("promo_revenue"),
        _fixed(F.sum(rev).cast("decimal(38,4)"), 4).alias("total_revenue"),
    )


Q14_SQL = """
SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' OR p_type LIKE '%BRASS%'
                     THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) END) * 10000 AS BIGINT) AS promo_revenue,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def disjunctive_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q19-style disjunctive predicate bundle (OR across brand/size/qty bands)."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("l_quantity").between(1, 11)) & (F.col("p_size").between(1, 5)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("l_quantity").between(10, 20)) & (F.col("p_size").between(1, 10)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("l_quantity").between(20, 30)) & (F.col("p_size").between(1, 15)))
    )
    return j.filter(cond).agg(
        _fixed(F.sum(_dec("l_extendedprice")).cast("decimal(38,2)"), 2).alias("revenue"),
        F.count("*").alias("n_items"),
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
"""

def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q13-style: distribution of customers by order count (left join + double agg)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


Q13_SQL = """
SELECT n_orders, COUNT(*) AS n_customers
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY n_orders
"""


def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q15-style: supplier(s) matching the maximum revenue (max-subquery)."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        l.groupBy("l_suppkey")
        .agg(
            _fixed(
                F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).cast(
                    "decimal(38,4)"
                ),
                4,
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS total_revenue
  FROM lineitem GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17-style correlated-average: lineitems under 50% of their part's mean
    quantity.  The per-part threshold compares division-free in decimal
    space (2·n·qty < Σqty) so both engines agree on boundaries."""
    l = load_table(spark, sf_dir, "lineitem")
    part_stats = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_dec("l_quantity")).cast("decimal(38,2)").alias("sum_qty"),
        F.count("*").alias("n"),
    )
    j = l.join(part_stats, l.l_partkey == part_stats.pk)
    cond = _dec("l_quantity") * F.col("n") * 2 < F.col("sum_qty")
    return j.filter(cond).agg(
        _fixed(F.sum(_dec("l_extendedprice")).cast("decimal(38,2)"), 2).alias("revenue"),
        F.count("*").alias("n_items"),
    )


Q17_SQL = """
WITH ps AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
         COUNT(*) AS n
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN ps ON l_partkey = pk
WHERE CAST(l_quantity AS DECIMAL(18,2)) * n * 2 < sum_qty
"""


def lone_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21-style semi + anti combination: suppliers with late lines on orders
    where no OTHER supplier was late."""
    l = load_table(spark, sf_dir, "lineitem")
    late = l.filter(F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")).select(
        "l_orderkey", "l_suppkey"
    )
    l1 = late.alias("l1")
    other_late = late.alias("l2")
    has_other = l1.join(
        other_late,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey")) & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_anti",
    )
    return has_other.groupBy(F.col("l1.l_suppkey").alias("s_key")).agg(F.count("*").alias("n_lone_late"))


Q21_SQL = """
WITH late AS (
  SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_shipdate > TIMESTAMP '1999-01-01'
)
SELECT l_suppkey AS s_key, COUNT(*) AS n_lone_late
FROM late l1
WHERE NOT EXISTS (
  SELECT 1 FROM late l2 WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
)
GROUP BY l_suppkey
"""

def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q9-style: profit by supplier nation and year for a part-name family."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("a"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    profit = _fixed(
        F.sum(
            _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            - _dec("l_quantity") * _dec("p_retailprice")
        ).cast("decimal(38,4)"),
        4,
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(profit.alias("profit"))
    )


Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
              - CAST(l_quantity AS DECIMAL(18,2)) * CAST(p_retailprice AS DECIMAL(18,2))) * 10000 AS BIGINT) AS profit
FROM lineitem JOIN part ON l_partkey = p_partkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%a%'
GROUP BY n_name, year(o_orderdate)
"""


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q8-style market share: fraction of revenue where the supplier's nation
    equals the customer's nation ("local" share), per order year.

    The ratio is emitted as integer ppm computed division-free-then-DIV:
    both revenue sums floor to whole currency units (floor on decimal is
    exact on both engines, unlike decimal→int casts which round in DuckDB
    and truncate in Spark), then ``local * 1e6 DIV total`` in int64 space.
    """
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    local = F.col("supp_nation") == F.col("cust_nation")
    per_year = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.floor(F.sum(rev).cast("decimal(38,4)")).cast("long").alias("total_units"),
            F.floor(F.sum(F.when(local, rev)).cast("decimal(38,4)")).cast("long").alias("local_units"),
        )
    )
    return per_year.select(
        "o_year",
        "total_units",
        "local_units",
        F.expr("CAST(local_units * 1000000 DIV total_units AS BIGINT)").alias("local_share_ppm"),
    )


Q8_SQL = """
WITH j AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev,
         sn.n_name = cn.n_name AS is_local
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation sn ON s_nationkey = sn.n_nationkey
                JOIN nation cn ON c_nationkey = cn.n_nationkey
), y AS (
  SELECT o_year,
         CAST(floor(CAST(SUM(rev) AS DECIMAL(38,4))) AS BIGINT) AS total_units,
         CAST(floor(CAST(SUM(CASE WHEN is_local THEN rev END) AS DECIMAL(38,4))) AS BIGINT) AS local_units
  FROM j GROUP BY o_year
)
SELECT o_year, total_units, local_units,
       CAST(local_units * 1000000 // total_units AS BIGINT) AS local_share_ppm
FROM y
"""


def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (the hypertable-rollup family): order counts and
    revenue at (region, nation), (region), and grand-total levels in one
    pass.  Subtotal rows surface via '<ALL>' sentinels instead of
    grouping-id bitmasks (no NULL names exist in the dims, so COALESCE is
    unambiguous and engine-agnostic)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            _fixed(F.sum(_dec("o_totalprice")).cast("decimal(38,2)"), 2).alias("revenue"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("<ALL>")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("<ALL>")).alias("nation"),
            "n_orders",
            "revenue",
        )
    )


ROLLUP_SQL = """
SELECT COALESCE(r_name, '<ALL>') AS region,
       COALESCE(n_name, '<ALL>') AS nation,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""


def range_join_ship_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: shipments falling inside the 30-day window
    after each of the top-100 orders' order dates.

    Uses ``operators.rangejoin.range_join`` — the bucketized equi-join form
    (quantize points, explode intervals over overlapped buckets, equi-join,
    exact recheck) instead of the BroadcastNestedLoopJoin a raw BETWEEN
    predicate plans as.  Coordinates are epoch-day integers (dates are
    midnight-aligned in this dataset), bucket width = the window length so
    each interval explodes to ≤2 buckets.

    The ≤100-row interval set is materialized through the driver: it feeds
    TWO consumers (the interval side of the range join and the final
    left-join spine), and as a lazy subtree Spark planned the second copy
    as a full global sort of orders + limit instead of re-fusing
    TakeOrderedAndProject (round-8 scanner finding) — a corpus-scale sort
    to re-derive 100 rows.  Collect/recreate is bounded by construction
    (the limit), the same idiom as the trained-codebook tables.
    """
    from ..operators.rangejoin import range_join

    epoch = F.lit("1990-01-01").cast("timestamp")
    o = load_table(spark, sf_dir, "orders")
    top = o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc()).limit(100)
    iv = (
        top.select("o_orderkey", F.datediff(F.col("o_orderdate"), epoch).alias("lo"))
        .withColumn("hi", F.col("lo") + 30)
    )
    iv = spark.createDataFrame(iv.collect(), iv.schema)
    pts = load_table(spark, sf_dir, "lineitem").select(
        F.datediff(F.col("l_shipdate"), epoch).alias("t")
    )
    j = range_join(pts, iv, point_col="t", lo_col="lo", hi_col="hi", bucket_width=30)
    counts = j.groupBy("o_orderkey").agg(F.count("*").alias("n"))
    return (
        iv.select("o_orderkey")
        .join(F.broadcast(counts), "o_orderkey", "left")  # ≤100 rows — no SMJ
        .select("o_orderkey", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_in_window"))
    )


RANGE_JOIN_SQL = """
WITH topo AS (
  SELECT o_orderkey, o_orderdate FROM orders
  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
)
SELECT o_orderkey,
       CAST(COUNT(l_orderkey) AS BIGINT) AS n_in_window
FROM topo LEFT JOIN lineitem
  ON l_shipdate >= o_orderdate AND l_shipdate < o_orderdate + INTERVAL 30 DAY
GROUP BY o_orderkey
"""


def important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11-style: part value share above a global-threshold fraction,
    compared division-free (value * 1800 > total, i.e. >1.11x the mean)."""
    l = load_table(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(
        F.sum(_dec("l_extendedprice")).cast("decimal(38,2)").alias("value_dec")
    )
    total = per_part.agg(F.sum("value_dec").cast("decimal(38,2)").alias("total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec") * 1800 > F.col("total"))
        .select("l_partkey", _fixed(F.col("value_dec"), 2).alias("value"))
    )


Q11_SQL = """
WITH pp AS (
  SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS value
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(value * 100 AS BIGINT) AS value FROM pp
WHERE value * 1800 > (SELECT CAST(SUM(value) AS DECIMAL(38,2)) FROM pp)
"""


def eligible_suppliers_nested_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20-style nested IN: suppliers of parts that shipped in volume."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    busy_parts = (
        l.groupBy("l_partkey").agg(F.sum(_dec("l_quantity")).alias("q")).filter(F.col("q") > 50).select("l_partkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    supp_of_busy = l.join(busy_parts, "l_partkey", "left_semi").select("l_suppkey").distinct()
    return s.join(supp_of_busy, s.s_suppkey == supp_of_busy.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


Q20_SQL = """
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    AND l_partkey IN (
      SELECT l_partkey FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      GROUP BY l_partkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 50
    )
)
"""


def segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: nations having BUILDING customers EXCEPT nations
    having MACHINERY suppliers... expressed with intersect/except."""
    c = load_table(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey").distinct()
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey").distinct()
    both = building.intersect(auto).withColumn("relation", F.lit("both"))
    only_building = building.exceptAll(auto).withColumn("relation", F.lit("building_only"))
    return both.unionByName(only_building)


SET_OPS_SQL = """
SELECT c_nationkey, 'both' AS relation FROM (
  SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
)
UNION ALL
SELECT c_nationkey, 'building_only' AS relation FROM (
  SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT
  SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
)
"""

QUERIES = {
    "tpch_q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "tpch_q9_profit_by_nation_year": (profit_by_nation_year, Q9_SQL),
    "tpch_q11_important_stock": (important_stock, Q11_SQL),
    "tpch_q20_nested_in_suppliers": (eligible_suppliers_nested_in, Q20_SQL),
    "set_ops_segments": (segment_set_ops, SET_OPS_SQL),
    "tpch_q13_order_distribution": (customer_order_distribution, Q13_SQL),
    "tpch_q15_top_revenue_suppliers": (top_revenue_suppliers, Q15_SQL),
    "tpch_q17_small_quantity_revenue": (small_quantity_revenue, Q17_SQL),
    "tpch_q21_lone_late_suppliers": (lone_late_suppliers, Q21_SQL),
    "tpch_q7_nation_trade_flows": (nation_trade_flows, Q7_SQL),
    "tpch_q8_market_share": (market_share, Q8_SQL),
    "agg_rollup_region_nation": (rollup_region_nation, ROLLUP_SQL),
    "join_range_ship_windows": (range_join_ship_windows, RANGE_JOIN_SQL),
    "tpch_q14_promo_revenue": (promo_revenue_ratio, Q14_SQL),
    "tpch_q19_disjunctive_quantities": (disjunctive_quantities, Q19_SQL),
    "tpch_q4_order_priority_semi": (order_priority_semi, Q4_SQL),
    "tpch_q12_shipmode_conditional": (shipmode_conditional, Q12_SQL),
    "tpch_q18_big_orders_having": (big_orders_having, Q18_SQL),
    "tpch_q16_brand_supplier_counts": (brand_supplier_counts, Q16_SQL),
    "tpch_q22_rich_idle_customers": (rich_idle_customers, Q22_SQL),
    "tpch_q2_cheapest_part_per_size": (cheapest_part_per_size, Q2_SQL),
    "tpch_q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "tpch_q5_local_supplier": (q5_local_supplier, Q5_SQL),
    "tpch_q6_revenue_forecast": (q6_revenue_forecast, Q6_SQL),
    "tpch_q10_returned_items": (q10_returned_items, Q10_SQL),
    "agg_orders_monthly": (orders_monthly, ORDERS_MONTHLY_SQL),
    "join_anti_customers_without_orders": (customers_without_orders, ANTI_JOIN_SQL),
    "join_part_brand_revenue": (part_brand_revenue, PART_BRAND_SQL),
}
