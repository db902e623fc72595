"""Distribution-drift statistics between two document populations.

Not in the reference (no statistics beyond per-query cosine); drift
detection is the standard guardrail a continuously-ingesting 100 TB
corpus needs — "did this crawl's length/quality distribution move?"
gates retraining and filter re-tuning (the monitoring step of every
production data pipeline).

Two-sample Kolmogorov–Smirnov, computed as a plan, not a collect:

1. tag rows with their population (a/b) — pure map;
2. ``groupBy(value)`` count per population — the ONLY data-sized
   shuffle, with map-side partial aggregation; N rows collapse to
   the distinct-value table;
3. cumulative counts via a window over the distinct-value table and
   D = max |F_a − F_b| via one TakeOrderedAndProject.

Scale note: step 3's window is unpartitioned — fine iff the
distinct-value table is bounded. For continuous scores pass
``round_digits`` to bin values first (ECDF error ≤ one bin width,
distinct values ≤ 10^round_digits·range); integer-valued metrics
(lengths, token counts) are naturally bounded. That two-level shape
(big keyed reduce → tiny ordered pass) is the same pattern as
approx-quantile sketch merges; the alternative — a global sort of N
raw rows — is exactly what this avoids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ks_statistic(
    df: DataFrame,
    value: Column,
    in_group_a: Column,
    in_group_b: Column,
    round_digits: int | None = None,
) -> DataFrame:
    """1-row frame (n_a, n_b, ks_d, ks_at): the two-sample KS distance
    and the smallest value attaining it.

    Determinism: cumulative counts are exact longs; each ECDF gap is
    one IEEE double expression from those longs, so the max and its
    arg are replayable bit-for-bit in a SQL oracle (ties on the gap
    break to the smallest value).
    """
    v = value.cast("double")
    if round_digits is not None:
        v = F.round(v, round_digits)
    tagged = df.select(
        v.alias("v"),
        in_group_a.cast("long").alias("in_a"),
        in_group_b.cast("long").alias("in_b"),
    ).where((F.col("in_a") + F.col("in_b")) > 0)
    counts = tagged.groupBy("v").agg(
        F.sum("in_a").alias("ca"), F.sum("in_b").alias("cb")
    )
    totals = counts.agg(F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    gaps = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "v",
            "n_a",
            "n_b",
            F.abs(
                F.sum("ca").over(w).cast("double") / F.col("n_a").cast("double")
                - F.sum("cb").over(w).cast("double") / F.col("n_b").cast("double")
            ).alias("gap"),
        )
    )
    return (
        gaps.orderBy(F.col("gap").desc(), F.col("v").asc())
        .limit(1)
        .select(
            "n_a",
            "n_b",
            F.round(F.col("gap"), 8).alias("ks_d"),
            F.col("v").alias("ks_at"),
        )
    )


def ks_oracle_sql(
    value_sql: str,
    in_a_sql: str,
    in_b_sql: str,
    table: str = "documents",
    round_digits: int | None = None,
) -> str:
    """DuckDB replay of :func:`ks_statistic` — the identical two-level
    plan (distinct-value counts → windowed ECDF gap → top-1)."""
    v = f"CAST(({value_sql}) AS DOUBLE)"
    if round_digits is not None:
        v = f"round({v}, {round_digits})"
    return f"""
        WITH tagged AS (
          SELECT {v} AS v,
                 CAST(({in_a_sql}) AS BIGINT) AS in_a,
                 CAST(({in_b_sql}) AS BIGINT) AS in_b
          FROM {table}
          WHERE CAST(({in_a_sql}) AS BIGINT) + CAST(({in_b_sql}) AS BIGINT) > 0
        ), counts AS (
          SELECT v, sum(in_a)::BIGINT AS ca, sum(in_b)::BIGINT AS cb
          FROM tagged GROUP BY v
        ), gaps AS (
          SELECT v,
                 (SELECT sum(ca)::BIGINT FROM counts) AS n_a,
                 (SELECT sum(cb)::BIGINT FROM counts) AS n_b,
                 abs(
                   CAST(sum(ca) OVER (ORDER BY v) AS DOUBLE)
                     / CAST((SELECT sum(ca)::BIGINT FROM counts) AS DOUBLE)
                   - CAST(sum(cb) OVER (ORDER BY v) AS DOUBLE)
                     / CAST((SELECT sum(cb)::BIGINT FROM counts) AS DOUBLE)
                 ) AS gap
          FROM counts
        )
        SELECT n_a, n_b, round(gap, 8) AS ks_d, v AS ks_at
        FROM gaps ORDER BY gap DESC, v ASC LIMIT 1
    """


def psi_statistic(
    df: DataFrame,
    value: Column,
    in_group_a: Column,
    in_group_b: Column,
    bin_edges: list[float],
) -> DataFrame:
    """1-row frame (n_a, n_b, psi): Population Stability Index between
    the two populations over FIXED bin edges —
    PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i), the banking/monitoring
    complement to :func:`ks_statistic` (KS asks "did the distribution
    move anywhere"; PSI weighs *how much* mass moved where, with the
    conventional act thresholds at 0.1/0.25).

    Fixed edges make the aggregation one partial-agg groupBy on the
    bin id (the value table never materializes); Laplace-smoothed
    (+1 per bin) proportions keep empty bins finite. Determinism: bin
    counts are exact longs; the per-bin terms are scalar IEEE doubles
    from those longs; the final Σ folds over the bin-SORTED array
    (collect → sort_array → aggregate), so the double addition order
    is fixed no matter how partitions land — the same trick as the
    dyadic grid in pagerank.py, solved by ordering instead of
    snapping (here the term count is tiny and known).
    """
    if not bin_edges or sorted(bin_edges) != list(bin_edges):
        raise ValueError("bin_edges must be a non-empty ascending list")
    v = value.cast("double")
    bin_id = sum(
        ((v >= F.lit(float(e))).cast("int")) for e in bin_edges
    )
    n_bins = len(bin_edges) + 1
    tagged = (
        df.select(
            v.alias("v"),
            bin_id.alias("bin"),
            in_group_a.cast("long").alias("in_a"),
            in_group_b.cast("long").alias("in_b"),
        )
        # NULL values carry no bin information and would otherwise
        # land in a phantom NULL bin here but bin 0 in the SQL
        # oracle's CASE WHEN — excluded identically on both sides
        .where(F.col("v").isNotNull() & ((F.col("in_a") + F.col("in_b")) > 0))
        .drop("v")
    )
    counts = tagged.groupBy("bin").agg(
        F.sum("in_a").alias("ca"), F.sum("in_b").alias("cb")
    )
    totals = counts.agg(F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"))
    pa = (F.col("t.ca") + 1).cast("double") / (F.col("n_a") + n_bins).cast("double")
    pb = (F.col("t.cb") + 1).cast("double") / (F.col("n_b") + n_bins).cast("double")
    terms = (
        counts.alias("t")
        .crossJoin(F.broadcast(totals))
        .select(
            "n_a",
            "n_b",
            F.struct(F.col("t.bin").alias("bin"), ((pa - pb) * F.log(pa / pb)).alias("term")).alias("bt"),
        )
    )
    return terms.groupBy("n_a", "n_b").agg(
        F.round(
            F.aggregate(
                F.sort_array(F.collect_list("bt")),
                F.lit(0.0),
                lambda acc, x: acc + x.term,
            ),
            8,
        ).alias("psi")
    )


def psi_oracle_sql(
    value_sql: str,
    in_a_sql: str,
    in_b_sql: str,
    bin_edges: list[float],
    table: str = "documents",
) -> str:
    """DuckDB replay of :func:`psi_statistic` — identical bin ids,
    Laplace terms, and bin-ordered fold."""
    edges = " + ".join(
        f"CASE WHEN CAST(({value_sql}) AS DOUBLE) >= {float(e)} THEN 1 ELSE 0 END"
        for e in bin_edges
    )
    n_bins = len(bin_edges) + 1
    return f"""
        WITH tagged AS (
          SELECT ({edges}) AS bin,
                 CAST(({in_a_sql}) AS BIGINT) AS in_a,
                 CAST(({in_b_sql}) AS BIGINT) AS in_b
          FROM {table}
          WHERE ({value_sql}) IS NOT NULL
            AND CAST(({in_a_sql}) AS BIGINT) + CAST(({in_b_sql}) AS BIGINT) > 0
        ), counts AS (
          SELECT bin, sum(in_a)::BIGINT AS ca, sum(in_b)::BIGINT AS cb
          FROM tagged GROUP BY bin
        ), totals AS (
          SELECT sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b FROM counts
        ), terms AS (
          SELECT n_a, n_b, bin,
                 (CAST(ca + 1 AS DOUBLE) / CAST(n_a + {n_bins} AS DOUBLE)
                  - CAST(cb + 1 AS DOUBLE) / CAST(n_b + {n_bins} AS DOUBLE))
                 * ln((CAST(ca + 1 AS DOUBLE) / CAST(n_a + {n_bins} AS DOUBLE))
                      / (CAST(cb + 1 AS DOUBLE) / CAST(n_b + {n_bins} AS DOUBLE))) AS term
          FROM counts, totals
        )
        SELECT n_a, n_b,
               round(list_aggregate(list(term ORDER BY bin), 'sum'), 8) AS psi
        FROM terms GROUP BY n_a, n_b
    """


def cusum_changepoints(
    df: DataFrame,
    group: Column,
    t: Column,
    x: Column,
) -> DataFrame:
    """DF[group, n_points, total, cp_t, cusum_abs] — per-group CUSUM
    change-point detection over an ordered series (Page 1954): the
    time step where the cumulative deviation from the series mean
    peaks, i.e. the single most likely level-shift point.

    EXACT-INTEGER formulation (the OLS sufficient-statistics trick):
    the textbook statistic S_k = sum_{i<=k} (x_i - mean) involves the
    irrational mean; scaling by n gives n*S_k = sum_{i<=k} (n*x_i - T)
    with T = sum(x_i) — every term a long, so the argmax is
    order-free and replays bit-identically in any SQL engine.
    ``cusum_abs`` is max_k |n*S_k| (reported in those n-scaled units);
    ``cp_t`` is the earliest t attaining it.

    Plan shape: ONE shuffle on ``group``; n/T via an unbounded window
    over the group partition, the prefix sum + argmax via two ordered
    windows over the same partition — all partition-local, no global
    sort, no driver data. Bounded state iff per-group series length
    is bounded (daily/hourly rollups are; pre-aggregate raw events
    first)."""
    part = df.select(group.alias("g"), t.alias("t"), x.cast("long").alias("x"))
    whole = Window.partitionBy("g")
    ordered = Window.partitionBy("g").orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    scored = (
        part.withColumn("n", F.count(F.lit(1)).over(whole))
        .withColumn("total", F.sum("x").over(whole))
        .withColumn("s", F.sum(F.col("n") * F.col("x") - F.col("total")).over(ordered))
        .withColumn("abs_s", F.abs("s"))
    )
    rn = Window.partitionBy("g").orderBy(F.col("abs_s").desc(), F.col("t").asc())
    return (
        scored.withColumn("rn", F.row_number().over(rn))
        .where(F.col("rn") == 1)
        .select(
            F.col("g").alias("group"),
            F.col("n").alias("n_points"),
            "total",
            F.col("t").alias("cp_t"),
            F.col("abs_s").alias("cusum_abs"),
        )
    )
