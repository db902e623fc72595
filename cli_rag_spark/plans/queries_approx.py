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


SKETCH_WEEK = ("2024-01-08", "2024-01-14")


def q_sketch_rollup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGEABLE-SKETCH ROLLUP STORE — what makes sketches a
    storage feature, not just an aggregate: daily HLL sketches of the
    user set are PERSISTED as binary columns in parquet (one tiny row
    per day), and any date-range distinct-user question is answered
    by unioning stored sketches (hll_union_agg) — the events table is
    never rescanned. At 100 TB this turns "distinct users last week"
    from a full-scan shuffle into a 7-row merge. Emits, per queried
    range: days merged, the EXACT distinct count (oracle-matched),
    and the estimate-within-5% boolean the oracle pins as a literal
    (the approx-pack contract)."""
    import hashlib
    import tempfile

    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = f"{tempfile.gettempdir()}/cli_rag_spark_sketches_{tag}"
    (
        ev.groupBy("day")
        .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
        .write.mode("overwrite")
        .parquet(path)
    )
    store = spark.read.parquet(path)

    def range_stats(label: str, lo: str | None, hi: str | None) -> DataFrame:
        sel = store
        evr = ev
        if lo is not None:
            sel = sel.where(
                (F.col("day") >= F.lit(lo)) & (F.col("day") <= F.lit(hi))
            )
            evr = ev.where(
                (F.col("day") >= F.lit(lo)) & (F.col("day") <= F.lit(hi))
            )
        est = sel.agg(
            F.count(F.lit(1)).alias("n_days"),
            F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("_est"),
        )
        exact = evr.agg(F.countDistinct("user_id").alias("n_exact"))
        return (
            est.crossJoin(F.broadcast(exact))
            .select(
                F.lit(label).alias("range"),
                "n_days",
                "n_exact",
                (
                    F.abs(F.col("_est") - F.col("n_exact"))
                    <= F.col("n_exact") * HLL_TOL
                ).alias("union_within_tol"),
            )
        )

    return (
        range_stats("week2", *SKETCH_WEEK)
        .unionByName(range_stats("all", None, None))
        .orderBy("range")
    )


QUERIES = {
    "approx_distinct_users": q_approx_distinct_users,
    "approx_price_quantiles": q_approx_price_quantiles,
    "sketch_rollup_users": q_sketch_rollup_users,
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
    "sketch_rollup_users": f"""
        WITH days AS (
          SELECT CAST(ts AS DATE) AS day, user_id FROM events
        ), wk AS (
          SELECT 'week2' AS range,
                 count(DISTINCT day) AS n_days,
                 count(DISTINCT user_id) AS n_exact
          FROM days
          WHERE day >= DATE '{SKETCH_WEEK[0]}' AND day <= DATE '{SKETCH_WEEK[1]}'
        ), al AS (
          SELECT 'all', count(DISTINCT day), count(DISTINCT user_id) FROM days
        )
        SELECT range, CAST(n_days AS BIGINT) AS n_days,
               CAST(n_exact AS BIGINT) AS n_exact,
               TRUE AS union_within_tol
        FROM (SELECT * FROM wk UNION ALL SELECT * FROM al)
        ORDER BY range
    """,
    "approx_price_quantiles": """
        SELECT round(quantile_cont(o_totalprice, 0.5), 2) AS p50_exact,
               round(quantile_cont(o_totalprice, 0.9), 2) AS p90_exact,
               TRUE AS p50_within_tol,
               TRUE AS p90_within_tol
        FROM orders
    """,
}
