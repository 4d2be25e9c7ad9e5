"""TPC-H-shaped analytical queries on the fixture star schema — the BENCH
headliners that exercise scan-heavy aggregation and multi-way joins at
sf0.1 (lineitem ~600k rows) and are shaped to survive 100 TB:

- ``q_pricing_summary`` (TPC-H Q1): full-scan partial aggregation; the
  filter pushes to parquet; decimal sums are exact and order-independent.
- ``q_top_orders`` (TPC-H Q3 shape): selective dimension filter broadcast
  into the fact join, aggregate, deterministic top-10 via rank (both
  engines rank the same rounded values — never LIMIT on unrounded floats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.functions.determinism import roundn_col, roundn_sql
from elasticsearch_hbase_river_spark.sources.tables import load_table

Q1_CUTOFF = "2000-12-01"
Q3_SEGMENT = "BUILDING"
Q3_TOP = 10


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary report (adapted dates)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sq"),
            F.sum(price).alias("sp"),
            F.sum(price * (one - disc)).alias("sdp"),
            F.sum(price * (one - disc) * (one + tax)).alias("sc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag", "l_linestatus",
            roundn_col(F.col("sq").cast("double")).alias("sum_qty"),
            roundn_col(F.col("sp").cast("double")).alias("sum_base_price"),
            roundn_col(F.col("sdp").cast("double")).alias("sum_disc_price"),
            roundn_col(F.col("sc").cast("double")).alias("sum_charge"),
            roundn_col(F.col("sq").cast("double") / F.col("count_order")).alias("avg_qty"),
            roundn_col(F.col("sp").cast("double") / F.col("count_order")).alias("avg_price"),
            "count_order",
        )
    )


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: revenue of a market segment's orders, top 10.
    customer(filtered) broadcast into orders, then lineitem joined on the
    shrunken order set."""
    cust = (load_table(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == Q3_SEGMENT)
            .select("c_custkey"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_extendedprice").cast("decimal(18,2)")
         * (F.lit(1).cast("decimal(18,2)")
            - F.col("l_discount").cast("decimal(18,2)"))).alias("rev"))
    agg = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority",
                 F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"))
        .agg(F.sum("rev").alias("rev_dec"))
        .select("o_orderkey", "o_orderpriority", "o_date",
                roundn_col(F.col("rev_dec").cast("double")).alias("revenue"))
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
    return (agg.withColumn("rank", F.row_number().over(w).cast("long"))
               .filter(F.col("rank") <= Q3_TOP))


Q6_YEAR = "1998"
Q5_REGION = "ASIA"


def q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue delta from discount changes — a pure
    filter+aggregate whose predicates all push to the parquet scan (date
    range, discount band, quantity cap). The canonical 'is pushdown
    working' query: at 100 TB this reads only the matching row groups."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * F.col("l_discount").cast("decimal(18,2)"))
    out = (
        li.filter(
            (F.col("l_shipdate") >= F.lit(f"{Q6_YEAR}-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(f"{int(Q6_YEAR)+1}-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount").cast("decimal(18,2)") >= F.lit(0.05).cast("decimal(18,2)"))
            & (F.col("l_discount").cast("decimal(18,2)") <= F.lit(0.07).cast("decimal(18,2)"))
            & (F.col("l_quantity") < 24))
        .agg(F.sum(rev).alias("rev_dec"),
             F.count(F.lit(1)).alias("n_items"))
    )
    return out.select(roundn_col(F.col("rev_dec").cast("double")).alias("revenue"),
                      "n_items")


def q_regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation for one region where customer and
    supplier share the nation. Star shape: region/nation/customer/supplier
    broadcast; the orders⋈lineitem fact join is the only big shuffle."""
    region = load_table(spark, sf_dir, "region") \
        .filter(F.col("r_name") == Q5_REGION).select("r_regionkey")
    nation = load_table(spark, sf_dir, "nation") \
        .select("n_nationkey", "n_regionkey", "n_name")
    customer = load_table(spark, sf_dir, "customer") \
        .select("c_custkey", "c_nationkey")
    supplier = load_table(spark, sf_dir, "supplier") \
        .select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders") \
        .select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        (F.col("l_extendedprice").cast("decimal(18,2)")
         * (F.lit(1).cast("decimal(18,2)")
            - F.col("l_discount").cast("decimal(18,2)"))).alias("rev"))
    dim = (nation.join(F.broadcast(region),
                       nation.n_regionkey == region.r_regionkey)
                 .select("n_nationkey", "n_name"))
    cust = customer.join(F.broadcast(dim),
                         customer.c_nationkey == dim.n_nationkey) \
                   .select("c_custkey", "c_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
          .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
          .join(F.broadcast(supplier),
                (li.l_suppkey == supplier.s_suppkey)
                & (F.col("c_nationkey") == supplier.s_nationkey))
          .groupBy("n_name")
          .agg(F.sum("rev").alias("rev_dec"),
               F.count(F.lit(1)).alias("n_items"))
          .select("n_name",
                  roundn_col(F.col("rev_dec").cast("double")).alias("revenue"),
                  "n_items")
    )


QUERIES = {
    "q_pricing_summary": q_pricing_summary,
    "q_top_orders": q_top_orders,
    "q_revenue_forecast": q_revenue_forecast,
    "q_regional_supplier_volume": q_regional_supplier_volume,
}

ORACLES = {
    "q_pricing_summary": f"""
WITH g AS (
  SELECT l_returnflag, l_linestatus,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sp,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS sdp,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
             * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS sc,
         count(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
  GROUP BY l_returnflag, l_linestatus)
SELECT l_returnflag, l_linestatus,
       {roundn_sql('sq::DOUBLE')} AS sum_qty,
       {roundn_sql('sp::DOUBLE')} AS sum_base_price,
       {roundn_sql('sdp::DOUBLE')} AS sum_disc_price,
       {roundn_sql('sc::DOUBLE')} AS sum_charge,
       {roundn_sql('sq::DOUBLE / count_order')} AS avg_qty,
       {roundn_sql('sp::DOUBLE / count_order')} AS avg_price,
       count_order
FROM g""",

    "q_revenue_forecast": f"""
WITH f AS (
  SELECT CAST(l_extendedprice AS DECIMAL(18,2))
         * CAST(l_discount AS DECIMAL(18,2)) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q6_YEAR}-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '{int(Q6_YEAR)+1}-01-01 00:00:00'
    AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07
    AND l_quantity < 24)
SELECT {roundn_sql('sum(rev)::DOUBLE')} AS revenue, count(*) AS n_items
FROM f""",

    "q_regional_supplier_volume": f"""
WITH dim AS (
  SELECT n_nationkey, n_name
  FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q5_REGION}'),
j AS (
  SELECT dim.n_name,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
         * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))) AS rev
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN dim        ON c.c_nationkey = dim.n_nationkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
                 AND c.c_nationkey = s.s_nationkey)
SELECT n_name, {roundn_sql('sum(rev)::DOUBLE')} AS revenue, count(*) AS n_items
FROM j GROUP BY n_name""",

    "q_top_orders": f"""
WITH agg AS (
  SELECT o.o_orderkey, o.o_orderpriority,
         strftime(o.o_orderdate, '%Y-%m-%d') AS o_date,
         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
           AS rev_dec
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_mktsegment = '{Q3_SEGMENT}'
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2, 3),
r AS (
  SELECT o_orderkey, o_orderpriority, o_date,
         {roundn_sql('rev_dec::DOUBLE')} AS revenue
  FROM agg),
ranked AS (
  SELECT *, CAST(row_number() OVER (ORDER BY revenue DESC, o_orderkey) AS BIGINT)
              AS rank
  FROM r)
SELECT * FROM ranked WHERE rank <= {Q3_TOP}""",
}
