"""Approximate aggregates — HyperLogLog distinct counts and quantile
sketches.

At 100 TB, exact COUNT(DISTINCT) and exact percentiles are shuffle
monsters (all distinct values move); the sketch versions are one-pass,
mergeable, fixed-memory — `approx_count_distinct` (HLL++, relative
error configurable) and `percentile_approx` (Greenwald-Khanna). These
queries make the sketch surface judged: sketch outputs can't be
hash-compared across engines, so each query emits the EXACT value
(oracle-matched) alongside a BOOLEAN asserting the sketch is inside
its error bound — the oracle states the boolean as a literal, so a
sketch drifting out of tolerance fails the hash compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_rag_spark.sources.documents import load_table

HLL_RSD = 0.02  # target relative standard deviation for HLL++
HLL_TOL = 0.05  # assertion bound: |approx-exact|/exact (2.5 sigma)
PCT_TOL = 0.02  # quantile sketch: relative value error bound


def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: exact distinct users + HLL sketch, asserted
    within 5%. One pass, no distinct shuffle for the sketch column."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"),
        F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("n_hll"),
    )
    return agg.select(
        "event_type",
        "n_exact",
        (F.abs(F.col("n_hll") - F.col("n_exact")) <= F.col("n_exact") * HLL_TOL).alias(
            "hll_within_tol"
        ),
    ).orderBy("event_type")


def q_approx_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median and p90 of order totals: exact (oracle-matched) plus a
    Greenwald-Khanna sketch asserted within 2% relative error."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50_exact_raw"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90_exact_raw"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50_gk"),
        F.percentile_approx("o_totalprice", 0.9, 10000).alias("p90_gk"),
    )
    within = lambda gk, ex: (F.abs(F.col(gk) - F.col(ex)) <= F.col(ex) * PCT_TOL)  # noqa: E731
    return agg.select(
        F.round("p50_exact_raw", 2).alias("p50_exact"),
        F.round("p90_exact_raw", 2).alias("p90_exact"),
        within("p50_gk", "p50_exact_raw").alias("p50_within_tol"),
        within("p90_gk", "p90_exact_raw").alias("p90_within_tol"),
    )


QUERIES = {
    "approx_distinct_users": q_approx_distinct_users,
    "approx_price_quantiles": q_approx_price_quantiles,
}

ORACLE = {
    # the oracle pins the exact columns and asserts the tolerance
    # booleans as literals: if Spark's sketch leaves tolerance, the
    # boolean flips and the value hash mismatches.
    "approx_distinct_users": """
        SELECT event_type,
               count(DISTINCT user_id) AS n_exact,
               TRUE AS hll_within_tol
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "approx_price_quantiles": """
        SELECT round(quantile_cont(o_totalprice, 0.5), 2) AS p50_exact,
               round(quantile_cont(o_totalprice, 0.9), 2) AS p90_exact,
               TRUE AS p50_within_tol,
               TRUE AS p90_within_tol
        FROM orders
    """,
}
