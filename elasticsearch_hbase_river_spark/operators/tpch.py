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

from pyspark.sql import Column, DataFrame, SparkSession, Window
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
    # Two-phase top-k: orderBy().limit(k) plans as TakeOrderedAndProject —
    # each partition keeps its local top-10, the driver merges k·P rows —
    # instead of a global window that funnels every qualifying order through
    # one partition. The deterministic rank is rebuilt by a window over the
    # <=10 survivors only.
    top = agg.orderBy(F.col("revenue").desc(), F.col("o_orderkey")).limit(Q3_TOP)
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


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


Q4_START, Q4_END = "1997-01-01", "1997-04-01"
Q7_NATION_A, Q7_NATION_B = "NATION_1", "NATION_2"
Q10_TOP = 20
Q14_START, Q14_END = "1997-09-01", "1997-10-01"
Q18_MIN_QTY = 250
Q22_CUTOFF = "2000-01-01"


def _dec(name: str) -> Column:
    return F.col(name).cast("decimal(18,2)")


def _li_revenue() -> Column:
    return (F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1).cast("decimal(18,2)")
               - F.col("l_discount").cast("decimal(18,2)")))


def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (fixtures have no commitdate, so the EXISTS predicate
    is 'has a returned line'): order counts per priority for a quarter.
    Spark-first: LEFT SEMI join — Catalyst decorrelates EXISTS into the
    same shape; the lineitem side is pre-filtered so the semi-join probe
    set is small and the orders scan prunes on the date predicate."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q4_START).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(Q4_END).cast("timestamp_ntz")))
    returned = load_table(spark, sf_dir, "lineitem") \
        .filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey,
                    "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year and
    direction. Both nation-keyed dimensions broadcast; the only big shuffle
    is lineitem ⋈ orders."""
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
            .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
            .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    cust = (load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
            .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
            .select("c_custkey", F.col("n_name").alias("cust_nation")))
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", _li_revenue().alias("rev"))
    pair = ((F.col("supp_nation") == Q7_NATION_A) & (F.col("cust_nation") == Q7_NATION_B)) | \
           ((F.col("supp_nation") == Q7_NATION_B) & (F.col("cust_nation") == Q7_NATION_A))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.sum("rev").alias("rev_dec"), F.count(F.lit(1)).alias("n_items"))
        .select("supp_nation", "cust_nation", "l_year",
                roundn_col(F.col("rev_dec").cast("double")).alias("revenue"),
                "n_items")
    )


def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top customers by revenue lost to returns in a
    quarter. Orders date-filtered before the fact join; customer/nation
    broadcast; deterministic top-20 via rank on (rounded revenue, key)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q4_START).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(Q4_END).cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_returnflag") == "R")
          .select("l_orderkey", _li_revenue().alias("rev")))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum("rev").alias("rev_dec"),
             F.max(_dec("c_acctbal")).alias("bal_dec"))
        .select("c_custkey", "c_name", "n_name",
                roundn_col(F.col("rev_dec").cast("double")).alias("revenue"),
                roundn_col(F.col("bal_dec").cast("double")).alias("c_acctbal"))
    )
    # Two-phase top-k (TakeOrderedAndProject), rank rebuilt on the <=20
    # survivors — the per-customer aggregate is corpus-proportional and must
    # never pass through a single-partition global window.
    top = agg.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(Q10_TOP)
    w = Window.orderBy(F.col("revenue").desc(), F.col("c_custkey"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue from PROMO parts.
    part is the small side — broadcast into the fact scan; the aggregate is
    a single conditional sum (no second pass over lineitem)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q14_START).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(Q14_END).cast("timestamp_ntz"))
    ).select("l_partkey", _li_revenue().alias("rev"))
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    out = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev"))
                  .otherwise(F.lit(0).cast("decimal(18,2)"))).alias("promo_dec"),
            F.sum("rev").alias("total_dec"),
            F.count(F.lit(1)).alias("n_items"))
    )
    return out.select(
        roundn_col(F.lit(100.0) * F.col("promo_dec").cast("double")
                   / F.col("total_dec").cast("double")).alias("promo_pct"),
        roundn_col(F.col("total_dec").cast("double")).alias("total_revenue"),
        "n_items")


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with maximum quarterly revenue. The
    scalar-subquery max becomes a window rank over the aggregated (tiny)
    per-supplier relation — no second scan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q4_START).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(Q4_END).cast("timestamp_ntz"))
    ).select("l_suppkey", _li_revenue().alias("rev"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    agg = (li.groupBy("l_suppkey").agg(F.sum("rev").alias("rev_dec"))
             .select("l_suppkey",
                     roundn_col(F.col("rev_dec").cast("double")).alias("total_revenue")))
    # rank()==1 is just "equals the max": a 1-row max aggregate broadcast
    # back preserves ties and replaces the global window's single-partition
    # exchange with a map-side filter.
    mx = agg.agg(F.max("total_revenue").alias("mx_rev"))
    return (agg.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx_rev"))
               .drop("mx_rev")
               .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
               .select(F.col("s_suppkey").cast("long").alias("s_suppkey"),
                       "s_name", "total_revenue"))


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    with their customers. The HAVING filter runs on the aggregated
    (order-grain) relation before any dimension join, so only qualifying
    orders join customer."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", _dec("l_quantity").alias("qty"))
    big = (li.groupBy("l_orderkey").agg(F.sum("qty").alias("qty_dec"))
             .filter(F.col("qty_dec") > F.lit(Q18_MIN_QTY).cast("decimal(18,2)")))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
                roundn_col(_dec("o_totalprice").cast("double")).alias("o_totalprice"),
                roundn_col(F.col("qty_dec").cast("double")).alias("total_qty"))
    )


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three OR'd brand/size/quantity bands.
    The disjunction stays a single predicate on the joined relation —
    Catalyst extracts the common l_partkey equi-join and pushes the
    per-table conjuncts (quantity bounds, size bounds) to both scans."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", _li_revenue().alias("rev"))
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    band = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30)))
    out = j.filter(band).agg(F.sum("rev").alias("rev_dec"),
                             F.count(F.lit(1)).alias("n_items"))
    return out.select(roundn_col(F.col("rev_dec").cast("double")).alias("revenue"),
                      "n_items")


def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (fixtures have no phone column — cohort is the
    nation): customers with above-average positive balance and no orders
    since a cutoff. The global-average scalar is a broadcast one-row
    cross join (exact decimal avg); 'no recent orders' is a LEFT ANTI join
    against the date-filtered orders projection."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", _dec("c_acctbal").alias("bal"))
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(Q22_CUTOFF).cast("timestamp_ntz")
    ).select("o_custkey")
    # Exact decimal mean: sum/count division deferred to a double compare
    # (bal * n > total) so both engines compare identical integers-scaled
    # decimals — no cross-engine decimal-division rounding.
    avg_row = (cust.filter(F.col("bal") > 0)
               .agg(F.sum("bal").alias("tot"), F.count(F.lit(1)).alias("n")))
    return (
        cust.crossJoin(F.broadcast(avg_row))
        .filter((F.col("bal") > 0) & (F.col("bal") * F.col("n") > F.col("tot")))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.sum("bal").alias("bal_dec"))
        .select("n_name", "numcust",
                roundn_col(F.col("bal_dec").cast("double")).alias("totacctbal"))
    )


QUERIES = {
    "q_pricing_summary": q_pricing_summary,
    "q_top_orders": q_top_orders,
    "q_revenue_forecast": q_revenue_forecast,
    "q_regional_supplier_volume": q_regional_supplier_volume,
    "q_order_priority": q_order_priority,
    "q_nation_trade_volume": q_nation_trade_volume,
    "q_returned_item_customers": q_returned_item_customers,
    "q_promo_revenue": q_promo_revenue,
    "q_top_supplier": q_top_supplier,
    "q_large_volume_customers": q_large_volume_customers,
    "q_disjunctive_revenue": q_disjunctive_revenue,
    "q_idle_rich_customers": q_idle_rich_customers,
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

    "q_order_priority": f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{Q4_START} 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '{Q4_END} 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority""",

    "q_nation_trade_volume": f"""
WITH j AS (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
         * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))) AS rev
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
  WHERE (ns.n_name = '{Q7_NATION_A}' AND nc.n_name = '{Q7_NATION_B}')
     OR (ns.n_name = '{Q7_NATION_B}' AND nc.n_name = '{Q7_NATION_A}'))
SELECT supp_nation, cust_nation, l_year,
       {roundn_sql('sum(rev)::DOUBLE')} AS revenue, count(*) AS n_items
FROM j GROUP BY 1, 2, 3""",

    "q_returned_item_customers": f"""
WITH agg AS (
  SELECT c.c_custkey, c.c_name, n.n_name,
         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
           AS rev_dec,
         max(CAST(c.c_acctbal AS DECIMAL(18,2))) AS bal_dec
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '{Q4_START} 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '{Q4_END} 00:00:00'
  GROUP BY 1, 2, 3),
r AS (
  SELECT c_custkey, c_name, n_name,
         {roundn_sql('rev_dec::DOUBLE')} AS revenue,
         {roundn_sql('bal_dec::DOUBLE')} AS c_acctbal
  FROM agg),
ranked AS (
  SELECT *, CAST(row_number() OVER (ORDER BY revenue DESC, c_custkey) AS BIGINT)
              AS rank
  FROM r)
SELECT * FROM ranked WHERE rank <= {Q10_TOP}""",

    "q_promo_revenue": f"""
WITH j AS (
  SELECT p.p_type,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
         * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))) AS rev
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '{Q14_START} 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '{Q14_END} 00:00:00'),
g AS (
  SELECT sum(CASE WHEN p_type = 'PROMO' THEN rev
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS promo_dec,
         sum(rev) AS total_dec, count(*) AS n_items
  FROM j)
SELECT {roundn_sql('100.0 * promo_dec::DOUBLE / total_dec::DOUBLE')} AS promo_pct,
       {roundn_sql('total_dec::DOUBLE')} AS total_revenue,
       n_items
FROM g""",

    "q_top_supplier": f"""
WITH agg AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
           AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q4_START} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q4_END} 00:00:00'
  GROUP BY l_suppkey),
r AS (
  SELECT l_suppkey, {roundn_sql('rev_dec::DOUBLE')} AS total_revenue FROM agg),
ranked AS (
  SELECT *, rank() OVER (ORDER BY total_revenue DESC) AS rnk FROM r)
SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name, ranked.total_revenue
FROM ranked JOIN supplier s ON ranked.l_suppkey = s.s_suppkey
WHERE ranked.rnk = 1""",

    "q_large_volume_customers": f"""
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > {Q18_MIN_QTY})
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_date,
       {roundn_sql('CAST(o.o_totalprice AS DECIMAL(18,2))::DOUBLE')} AS o_totalprice,
       {roundn_sql('big.qty_dec::DOUBLE')} AS total_qty
FROM big
JOIN orders o   ON big.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey""",

    "q_disjunctive_revenue": f"""
WITH j AS (
  SELECT CAST(l.l_extendedprice AS DECIMAL(18,2))
         * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))) AS rev
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
         AND l.l_quantity BETWEEN 1 AND 11)
     OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
         AND l.l_quantity BETWEEN 10 AND 20)
     OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
         AND l.l_quantity BETWEEN 20 AND 30))
SELECT {roundn_sql('sum(rev)::DOUBLE')} AS revenue, count(*) AS n_items
FROM j""",

    "q_idle_rich_customers": f"""
WITH bal AS (
  SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
  FROM customer),
avg_row AS (
  SELECT sum(bal) AS tot, count(*) AS n FROM bal WHERE bal > 0)
SELECT n.n_name, count(*) AS numcust,
       {roundn_sql('sum(b.bal)::DOUBLE')} AS totacctbal
FROM bal b CROSS JOIN avg_row a
JOIN nation n ON b.c_nationkey = n.n_nationkey
WHERE b.bal > 0 AND b.bal * a.n > a.tot
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = b.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{Q22_CUTOFF} 00:00:00')
GROUP BY n.n_name""",
}
