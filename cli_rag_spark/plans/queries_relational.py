"""E12 — relational core over the star schema (TPC-H-shaped).

The reference has no joins, aggregations, windows, or set ops
(SURVEY §2.b) — this pack is the engine's general-purpose query
surface, expressed 100% in built-in DataFrame ops so Catalyst owns
join selection, pushdown, and AQE re-planning.

Scale notes per query are in each docstring. Money aggregates are
rounded (2-4 dp) because Spark and DuckDB sum doubles in different
orders; the row sets themselves are identical.

Timestamps never leave a query raw: group keys and outputs are
formatted to strings (`yyyy-MM-dd`), making the value-hash immune to
session-timezone rendering differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cli_rag_spark.sources.documents import load_table


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape. One wide scan → partial agg → 1 shuffle on a
    2-value key. At 100 TB this is scan-bound; the projection is
    pruned to 7 columns at the parquet reader."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape. customer (small) broadcasts into orders;
    orders→lineitem is the one big shuffle join; top-10 via
    TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join. region/nation/supplier/customer
    all broadcast (dims); lineitem↔orders is the only shuffle join.
    Join order is left to Catalyst + AQE."""
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+sum — entirely pushdown-able."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).select(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-N per group: top-3 customers by account balance per
    nation, deterministic ties via c_custkey."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "n_name",
            F.col("rank").cast("long").alias("rank"),
            "c_custkey",
            F.round("c_acctbal", 2).alias("c_acctbal"),
        )
        .orderBy("n_name", "rank")
    )


def q_order_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (orderstatus, orderpriority) — grouping-set aggregation;
    NULL group markers normalized to 'ALL' for hash stability."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
            "total_price",
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


def q_customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: customers with URGENT orders INTERSECT customers
    with LOW orders, minus customers with F-status orders."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = orders.where(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    f_status = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        urgent.intersect(low).exceptAll(f_status.distinct()).select(
            F.col("o_custkey").alias("custkey")
        ).orderBy("custkey")
    )


def q_part_supplier_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join fact aggregation: revenue and supplier count by part
    brand; exercises semi-structured predicates (LIKE)."""
    part = load_table(spark, sf_dir, "part").where(~F.col("p_type").like("%ANODIZED%"))
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .orderBy("p_brand")
    )


def q_decimal_exact_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decimal arithmetic: money summed as DECIMAL(18,2) — no
    float drift at any scale, bit-identical across engines. The final
    value is emitted as double (both engines convert the identical
    decimal to the identical nearest double), so the pandas dtype
    matches the oracle's — DuckDB's .df() always widens DECIMAL to
    float64, while Spark's toPandas keeps Decimal objects, which the
    dtype-parity gate (tests/test_parity.py) would flag."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("total_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag",
            F.col("total_price").cast("decimal(38,2)").cast("double").alias("total_price"),
            "n",
        )
        .orderBy("l_returnflag")
    )


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "shipping_priority": q_shipping_priority,
    "local_supplier_volume": q_local_supplier_volume,
    "revenue_forecast": q_revenue_forecast,
    "top_customers_per_nation": q_top_customers_per_nation,
    "order_priority_rollup": q_order_priority_rollup,
    "customer_set_ops": q_customer_set_ops,
    "part_supplier_agg": q_part_supplier_agg,
    "decimal_exact_totals": q_decimal_exact_totals,
}

ORACLE = {
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "shipping_priority": """
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o_orderpriority
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1997-03-15'
          AND l_shipdate > TIMESTAMP '1997-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "local_supplier_volume": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
    """,
    "revenue_forecast": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "top_customers_per_nation": """
        SELECT n_name, rank, c_custkey, round(c_acctbal, 2) AS c_acctbal
        FROM (
            SELECT n_name, c_custkey, c_acctbal,
                   row_number() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey ASC) AS rank
            FROM customer JOIN nation ON c_nationkey = n_nationkey
        )
        WHERE rank <= 3
        ORDER BY n_name, rank
    """,
    "order_priority_rollup": """
        SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
               coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus, o_orderpriority
    """,
    "customer_set_ops": """
        SELECT o_custkey AS custkey FROM (
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        )
        EXCEPT ALL
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
        ORDER BY custkey
    """,
    "part_supplier_agg": """
        SELECT p_brand,
               count(DISTINCT l_suppkey) AS n_suppliers,
               round(sum(l_extendedprice), 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type NOT LIKE '%ANODIZED%'
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    "decimal_exact_totals": """
        SELECT l_returnflag,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_price,
               count(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
}
