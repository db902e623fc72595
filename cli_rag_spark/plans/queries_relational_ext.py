"""E12 extras — the relational surfaces the core pack doesn't touch:
multi-dimensional aggregation (CUBE), pivot, exact percentiles,
semi/anti joins as standalone query shapes, and grouped top-k via
dense_rank. All built-ins; same rounding/formatting conventions as
queries_relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cli_rag_spark.sources.documents import load_table

PIVOT_BRANDS = ["Brand#1", "Brand#2", "Brand#3", "Brand#4", "Brand#5"]


def q_segment_nation_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (mktsegment, nation): all 4 grouping combinations in
    one pass — Spark expands grouping sets before the single shuffle,
    so the cost is one scan regardless of dimension count."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    return (
        joined.cube("c_mktsegment", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .select(
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("mktsegment"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_cust",
            "total_bal",
        )
        .orderBy("mktsegment", "nation")
    )


def q_brand_size_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: avg retail price per p_size bucket × brand. Spark's
    pivot is a single groupBy with conditional aggregates — exactly
    what the oracle spells out; no extra shuffle vs a plain groupBy."""
    part = load_table(spark, sf_dir, "part")
    out = (
        part.withColumn("size_bucket", F.floor(F.col("p_size") / 10).cast("int"))
        .groupBy("size_bucket")
        .pivot("p_brand", PIVOT_BRANDS)
        .agg(F.round(F.avg("p_retailprice"), 4))
        .orderBy("size_bucket")
    )
    # pivot emits the raw brand strings as column names; normalize
    for b in PIVOT_BRANDS:
        out = out.withColumnRenamed(b, b.replace("Brand#", "brand_"))
    return out


def q_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation) of extended price
    per return flag — `percentile` is exact in both engines
    (DuckDB quantile_cont), unlike approx sketches which can never
    hash-match across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
        )
        .orderBy("l_returnflag")
    )


def q_idle_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: suppliers with no lineitem shipped in the first week of 1997 — the left side
    streams, the filter side shuffles only its distinct keys."""
    sup = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-08").cast("timestamp"))
    )
    return (
        sup.join(li, sup.s_suppkey == li.l_suppkey, "anti")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q_active_high_value_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS): orders over 100k with at least one
    undiscounted line — no duplication, no post-join distinct."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100_000)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_discount") == 0.0)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "semi")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy("o_orderkey")
    )


def q_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k with dense_rank (ties share rank; both engines
    break the final output identically by part key ordering)."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        part.withColumn("rnk", F.dense_rank().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", F.round("p_retailprice", 2).alias("p_retailprice"), "rnk")
        .orderBy("p_brand", "rnk", "p_partkey")
    )


def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue by (supplier nation, customer nation,
    ship year) for two nations. Both nation dims broadcast; lineitem→
    orders is the one big shuffle join; year extraction stays on the
    scan side so partition pruning by date survives at scale."""
    nations = ("NATION_1", "NATION_2")
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name").isin(*nations))
    sup = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sn = nation.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    cn = nation.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sk"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("ck"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


def q_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share per month of 1997 —
    conditional aggregation over one broadcast join, no second scan."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_type")), li.l_partkey == F.col("p_partkey"))
        .groupBy(F.month("l_shipdate").alias("ship_month"))
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)) * 100.0 / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
        .orderBy("ship_month")
    )


def q_parts_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape (price more than 4% above own brand's average),
    decorrelated as a window average — one shuffle on the brand key
    instead of a per-row subquery. The average itself is not emitted:
    a group mean sitting exactly on a rounding boundary (Brand#4 =
    950.59375) renders differently across engines at any fixed
    rounding, while the selected row SET is boundary-stable."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    return (
        part.withColumn("brand_avg", F.avg("p_retailprice").over(w))
        .where(F.col("p_retailprice") > F.col("brand_avg") * 1.04)
        .select(
            "p_partkey", "p_brand",
            F.round("p_retailprice", 2).alias("p_retailprice"),
        )
        .orderBy("p_partkey")
    )


QUERIES = {
    "nation_trade_volume": q_nation_trade_volume,
    "promo_revenue_ratio": q_promo_revenue_ratio,
    "parts_above_brand_avg": q_parts_above_brand_avg,
    "segment_nation_cube": q_segment_nation_cube,
    "brand_size_pivot": q_brand_size_pivot,
    "price_percentiles": q_price_percentiles,
    "idle_suppliers": q_idle_suppliers,
    "active_high_value_orders": q_active_high_value_orders,
    "top_parts_per_brand": q_top_parts_per_brand,
}

_PIVOT_COLS = ", ".join(
    f"round(avg(CASE WHEN p_brand = '{b}' THEN p_retailprice END), 4) AS brand_{b.split('#')[1]}"
    for b in PIVOT_BRANDS
)

ORACLE = {
    "nation_trade_volume": """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS ship_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE sn.n_name IN ('NATION_1', 'NATION_2')
          AND cn.n_name IN ('NATION_1', 'NATION_2')
          AND sn.n_name <> cn.n_name
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "promo_revenue_ratio": """
        SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
               round(sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END) * 100.0
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1 ORDER BY ship_month
    """,
    "parts_above_brand_avg": """
        SELECT p_partkey, p_brand,
               round(p_retailprice, 2) AS p_retailprice
        FROM (
            SELECT p_partkey, p_brand, p_retailprice,
                   avg(p_retailprice) OVER (PARTITION BY p_brand) AS brand_avg
            FROM part
        )
        WHERE p_retailprice > brand_avg * 1.04
        ORDER BY p_partkey
    """,
    "segment_nation_cube": """
        SELECT coalesce(c_mktsegment, 'ALL') AS mktsegment,
               coalesce(n_name, 'ALL') AS nation,
               count(*) AS n_cust,
               round(sum(c_acctbal), 2) AS total_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY CUBE (c_mktsegment, n_name)
        ORDER BY mktsegment, nation
    """,
    "brand_size_pivot": f"""
        SELECT floor(p_size / 10)::INTEGER AS size_bucket, {_PIVOT_COLS}
        FROM part
        GROUP BY 1 ORDER BY size_bucket
    """,
    "price_percentiles": """
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
               round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
               round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "idle_suppliers": """
        SELECT s_suppkey, s_name FROM supplier
        WHERE NOT EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_suppkey = s_suppkey
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-08'
        )
        ORDER BY s_suppkey
    """,
    "active_high_value_orders": """
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_totalprice > 100000
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_discount = 0.0)
        ORDER BY o_orderkey
    """,
    "top_parts_per_brand": """
        SELECT p_brand, p_partkey, round(p_retailprice, 2) AS p_retailprice, rnk
        FROM (
            SELECT p_brand, p_partkey, p_retailprice,
                   dense_rank() OVER (PARTITION BY p_brand
                                      ORDER BY p_retailprice DESC, p_partkey ASC) AS rnk
            FROM part
        )
        WHERE rnk <= 3
        ORDER BY p_brand, rnk, p_partkey
    """,
}


WAIT_LAG_DAYS = 60
WAIT_TOP = 10


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q21 shape (suppliers who kept orders waiting) on the
    fixture's columns: per (order, supplier), 'late' = any line shipped
    more than 60 days after the order date; count, per supplier, the
    multi-supplier orders where THIS supplier was late and NO OTHER
    supplier was (r7). The distinctive relational shape is the DOUBLE
    correlation on the same fact table — one EXISTS (semi join: some
    other supplier in the order) and one NOT EXISTS (anti join: no
    other LATE supplier) — which Spark plans as two keyed joins on the
    pre-aggregated (order, supplier) grain, never a per-row subquery."""
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    ls = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
                    > WAIT_LAG_DAYS,
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    others = ls.select(
        F.col("l_orderkey").alias("_ok"),
        F.col("l_suppkey").alias("_sk"),
        F.col("late").alias("_late"),
    )
    l1 = ls.where(F.col("late") == 1)
    waiting = (
        l1.join(
            others,
            (F.col("l_orderkey") == F.col("_ok")) & (F.col("l_suppkey") != F.col("_sk")),
            "semi",
        )
        .join(
            others.where(F.col("_late") == 1),
            (F.col("l_orderkey") == F.col("_ok")) & (F.col("l_suppkey") != F.col("_sk")),
            "anti",
        )
    )
    return (
        waiting.join(sup, waiting.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(WAIT_TOP)
    )


QUERIES["waiting_suppliers"] = q_waiting_suppliers

ORACLE["waiting_suppliers"] = f"""
    WITH ls AS (
        SELECT l_orderkey, l_suppkey,
               max(CASE WHEN date_diff('day', o_orderdate, l_shipdate)
                         > {WAIT_LAG_DAYS} THEN 1 ELSE 0 END) AS late
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        GROUP BY l_orderkey, l_suppkey
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM ls l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.late = 1
      AND EXISTS (SELECT 1 FROM ls l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM ls l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late = 1)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT {WAIT_TOP}
"""
