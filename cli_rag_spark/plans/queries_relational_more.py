"""E12 extension 3 — TPC-H Q13/Q18/Q2/Q15 shapes.

These add the remaining classical join-agg shapes to the judged
surface: outer-join aggregation, group-having semi-join back to the
fact table, per-group argmin (decorrelated correlated subquery), and
having-equals-global-max. All pure built-ins (SURVEY §2.c E12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cli_rag_spark.operators.merge import upsert
from cli_rag_spark.sources.documents import load_table

LARGE_ORDER_QTY = 300  # ~Q18's threshold scaled to this data (p99.9 ≈ 337)


def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count,
    including zero-order customers (the left outer join is the point).
    customer is the smaller side but outer-join semantics keep it on
    the left; one shuffle on custkey, then a tiny re-agg on c_count."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a
    threshold, with customer detail. The group-having runs FIRST on
    lineitem alone (map-side partial agg → one shuffle), and only the
    tiny surviving key set joins back — never orders⋈lineitem first."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .where(F.col("total_qty") > LARGE_ORDER_QTY)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


def q_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp table here, so supply cost =
    min observed unit price in lineitem): per-part argmin over
    suppliers, decorrelated as agg → window-min → filter. The window
    reuses the groupBy output partitioning (both keyed on partkey), so
    the argmin costs no extra shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 3)
    sup = load_table(spark, sf_dir, "supplier")
    unit = (
        li.join(F.broadcast(part.select("p_partkey", "p_name")), li.l_partkey == F.col("p_partkey"))
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias("unit_cost"))
    )
    w = Window.partitionBy("p_partkey")
    best = (
        unit.withColumn("min_cost", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("min_cost"))
        .drop("min_cost")
    )
    return (
        best.join(sup, best.l_suppkey == sup.s_suppkey)
        .select("p_partkey", F.col("s_name").alias("supplier"), "unit_cost")
        .orderBy("p_partkey", "supplier")
    )


def q_top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the global maximum
    revenue in a quarter. The global max is a window over an
    already-tiny aggregate (one row per supplier), not a second scan."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    sup = load_table(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue"))
    )
    w = Window.partitionBy()
    best = rev.withColumn("max_rev", F.max("total_revenue").over(w)).where(
        F.col("total_revenue") == F.col("max_rev")
    )
    return (
        best.join(sup, best.l_suppkey == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q_returnflag_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the generalization cube/rollup sugar
    over): per-flag, per-status, and grand-total aggregates in ONE
    scan — Catalyst expands to a single Expand + hash aggregate, not
    three scans unioned."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM v_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """)


def q_orders_upsert_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics (operators/merge.py) on a deterministic
    changeset: every 97th order gets a 10% price bump + status 'U'
    (updates), and a shifted copy of every 500th order is inserted.
    Post-merge per-status totals prove update-wins, insert, and
    passthrough behavior in one result."""
    orders = load_table(spark, sf_dir, "orders")
    bump = (
        orders.where(F.col("o_orderkey") % 97 == 0)
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 1.1, 2))
        .withColumn("o_orderstatus", F.lit("U"))
    )
    inserts = orders.where(F.col("o_orderkey") % 500 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10_000_000
    )
    merged = upsert(orders, bump.unionByName(inserts), "o_orderkey")
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.round("o_totalprice", 2)), 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers ranked by revenue lost to returns in
    one quarter. Date + returnflag filters push to the scans; customer
    and nation broadcast; one shuffle for the custkey aggregate."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        # decimal accumulation: the per-row double product is
        # deterministic, but a 600-term double SUM is order-dependent
        # and this aggregate landed exactly on a .xx5 rounding
        # boundary at sf0.01 — decimal(18,6) sums exactly in both
        # engines.
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q_customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile window: customers bucketed into account-balance
    quartiles per market segment (deterministic: full orderBy with id
    tiebreak), then per-bucket stats — the cohort-analysis shape."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return (
        cust.withColumn("quartile", F.ntile(4).over(w).cast("long"))
        .groupBy("c_mktsegment", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
        .orderBy("c_mktsegment", "quartile")
    )


def q_scalar_function_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function breadth in one judged result: math, string,
    date, and conditional built-ins computed per row over a bounded
    slice — pins down cross-engine semantics for the everyday scalar
    surface (all whole-stage codegen; zero custom code)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    d = F.col("o_orderdate")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.abs(p - 100000).alias("abs_diff"),
        F.ceil(p / 1000).cast("long").alias("ceil_k"),
        F.floor(p / 1000).cast("long").alias("floor_k"),
        F.round(F.sqrt(p), 4).alias("sqrt_p"),
        F.round(F.log(p), 6).alias("ln_p"),
        F.round(F.pow(p / 100000, 2), 6).alias("pow2"),
        F.greatest(p, F.lit(150000.0)).alias("gst"),
        F.least(p, F.lit(150000.0)).alias("lst"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.upper("o_orderstatus").alias("status_up"),
        F.lower("o_orderpriority").alias("prio_lo"),
        F.substring("o_orderpriority", 1, 3).alias("prio_pfx"),
        F.lpad(F.col("o_orderkey").cast("string"), 8, "0").alias("key_pad"),
        F.reverse(F.col("o_orderstatus")).alias("status_rev"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("joined"),
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mo"),
        F.dayofmonth(d).cast("long").alias("dom"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.lit("1998-01-01").cast("date"), d.cast("date")).cast("long").alias("days_to_98"),
        F.when(p > 200000, "big").when(p > 100000, "mid").otherwise("small").alias("bucket"),
    ).orderBy("o_orderkey")


SMALL_QTY_BRAND = "Brand#23"
IDLE_CUTOFF = "2000-06-01"


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (r7): average yearly revenue lost if small-
    quantity orders (below 20% of the part's average order quantity)
    were no longer taken, for one brand. The distinctive relational
    shape is the PER-PART correlated average re-applied to the same
    fact table — decorrelated here as one partial-agg groupBy on the
    brand-filtered lineitem slice, broadcast back onto that same
    slice (the aggregate is one row per part of one brand, always
    tiny). Float discipline: quantities are integral, so the 20%
    threshold is the exact integer cross-multiply 5·qty·cnt < Σqty —
    no 0.2·avg float compare — and revenue accumulates in
    DECIMAL(18,6) before the single round (round-half-up in both
    engines)."""
    part_keys = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == SMALL_QTY_BRAND)
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part_keys), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            F.col("l_quantity").cast("bigint").alias("qty"),
            "l_extendedprice",
        )
    )
    per_part = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum("qty").alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    small = li.join(F.broadcast(per_part), F.col("l_partkey") == F.col("_pk")).where(
        F.col("qty") * 5 * F.col("cnt") < F.col("sum_qty")
    )
    return small.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double") / 7,
            2,
        ).alias("avg_yearly")
    )


def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (r7): per nation, the count and total balance
    of above-average-balance customers with no recent orders. The two
    distinctive pieces are the SCALAR aggregate subquery (global
    positive-balance average) and the ANTI join against the
    date-sliced orders. The scalar is a 1-row broadcast crossJoin;
    the above-average test is the exact decimal cross-multiply
    bal·n > Σbal (no float division); the anti join keys on custkey
    only after the balance filter has shrunk the probe side."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").cast("bigint").alias("nationkey"),
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
    )
    pos = cust.where(F.col("bal") > 0).agg(
        F.sum("bal").alias("_s"), F.count(F.lit(1)).alias("_n")
    )
    rich = cust.crossJoin(F.broadcast(pos)).where(
        F.col("bal") * F.col("_n") > F.col("_s")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= IDLE_CUTOFF)
        .select("o_custkey")
    )
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "anti")
    return (
        idle.groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("bal"), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("nationkey")
    )


QUERIES = {
    "returnflag_grouping_sets": q_returnflag_grouping_sets,
    "scalar_function_breadth": q_scalar_function_breadth,
    "customer_balance_quartiles": q_customer_balance_quartiles,
    "returned_item_customers": q_returned_item_customers,
    "orders_upsert_stats": q_orders_upsert_stats,
    "customer_order_distribution": q_customer_order_distribution,
    "large_orders": q_large_orders,
    "cheapest_supplier_per_part": q_cheapest_supplier_per_part,
    "top_revenue_suppliers": q_top_revenue_suppliers,
    "small_qty_revenue": q_small_qty_revenue,
    "idle_rich_customers": q_idle_rich_customers,
}

ORACLE = {
    "scalar_function_breadth": """
        SELECT o_orderkey,
               abs(o_totalprice - 100000) AS abs_diff,
               CAST(ceil(o_totalprice / 1000) AS BIGINT) AS ceil_k,
               CAST(floor(o_totalprice / 1000) AS BIGINT) AS floor_k,
               round(sqrt(o_totalprice), 4) AS sqrt_p,
               round(ln(o_totalprice), 6) AS ln_p,
               round(pow(o_totalprice / 100000, 2), 6) AS pow2,
               greatest(o_totalprice, 150000.0) AS gst,
               least(o_totalprice, 150000.0) AS lst,
               CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
               upper(o_orderstatus) AS status_up,
               lower(o_orderpriority) AS prio_lo,
               substr(o_orderpriority, 1, 3) AS prio_pfx,
               lpad(CAST(o_orderkey AS VARCHAR), 8, '0') AS key_pad,
               reverse(o_orderstatus) AS status_rev,
               concat_ws('-', o_orderstatus, o_orderpriority) AS joined,
               CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(month(o_orderdate) AS BIGINT) AS mo,
               CAST(day(o_orderdate) AS BIGINT) AS dom,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS days_to_98,
               CASE WHEN o_totalprice > 200000 THEN 'big'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'small' END AS bucket
        FROM orders WHERE o_orderkey <= 500
        ORDER BY o_orderkey
    """,
    "customer_balance_quartiles": """
        SELECT c_mktsegment, quartile, count(*) AS n,
               round(min(c_acctbal), 2) AS min_bal,
               round(max(c_acctbal), 2) AS max_bal
        FROM (
          SELECT c_mktsegment, c_acctbal,
                 ntile(4) OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal ASC, c_custkey ASC) AS quartile
          FROM customer
        )
        GROUP BY c_mktsegment, quartile
        ORDER BY c_mktsegment, quartile
    """,
    "returned_item_customers": """
        SELECT c_custkey, c_name, n_name,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "orders_upsert_stats": """
        WITH bump AS (
          SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                 round(o_totalprice * 1.1, 2) AS o_totalprice,
                 o_orderdate, o_orderpriority
          FROM orders WHERE o_orderkey % 97 = 0
        ), ins AS (
          SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey, o_orderstatus,
                 o_totalprice, o_orderdate, o_orderpriority
          FROM orders WHERE o_orderkey % 500 = 0
        ), changes AS (
          SELECT * FROM bump UNION ALL SELECT * FROM ins
        ), merged AS (
          SELECT * FROM changes
          UNION ALL
          SELECT * FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM changes c WHERE c.o_orderkey = o.o_orderkey)
        )
        SELECT o_orderstatus, count(*) AS n,
               round(sum(round(o_totalprice, 2)), 2) AS total
        FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "returnflag_grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "customer_order_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "large_orders": f"""
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               round(o_totalprice, 2) AS o_totalprice, total_qty
        FROM orders
        JOIN (
            SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING round(sum(l_quantity), 2) > {LARGE_ORDER_QTY}
        ) big ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
    """,
    "cheapest_supplier_per_part": """
        WITH unit AS (
            SELECT p_partkey, l_suppkey,
                   round(min(l_extendedprice / l_quantity), 4) AS unit_cost
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_size <= 3
            GROUP BY p_partkey, l_suppkey
        )
        SELECT p_partkey, s_name AS supplier, unit_cost
        FROM unit JOIN supplier ON l_suppkey = s_suppkey
        WHERE unit_cost = (
            SELECT min(unit_cost) FROM unit u2 WHERE u2.p_partkey = unit.p_partkey
        )
        ORDER BY p_partkey, supplier
    """,
    "top_revenue_suppliers": """
        WITH rev AS (
            SELECT l_suppkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        ORDER BY s_suppkey
    """,
    "small_qty_revenue": f"""
        WITH li AS (
            SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty, l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = '{SMALL_QTY_BRAND}'
        ),
        per_part AS (
            SELECT l_partkey AS _pk, sum(qty) AS sum_qty, count(*) AS cnt
            FROM li GROUP BY l_partkey
        )
        SELECT round(
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7, 2
               ) AS avg_yearly
        FROM li JOIN per_part ON l_partkey = _pk
        WHERE qty * 5 * cnt < sum_qty
    """,
    "idle_rich_customers": f"""
        WITH cust AS (
            SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nationkey,
                   CAST(c_acctbal AS DECIMAL(18,2)) AS bal
            FROM customer
        ),
        pos AS (
            SELECT sum(bal) AS _s, count(*) AS _n FROM cust WHERE bal > 0
        )
        SELECT nationkey, count(*) AS numcust,
               CAST(round(sum(bal), 2) AS DOUBLE) AS totacctbal
        FROM cust, pos
        WHERE bal * _n > _s
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '{IDLE_CUTOFF}'
          )
        GROUP BY nationkey
        ORDER BY nationkey
    """,
}
