"""Poisson bootstrap — distributed confidence intervals in one pass.

The classical bootstrap resamples n rows WITH replacement B times —
unshardable as stated, because a resample is a global draw. The
standard large-scale fix (Poisson bootstrap; Chamandy et al.,
"Estimating Uncertainty for Massive Data Streams", Google 2012) uses
the limit Binomial(n, 1/n) -> Poisson(1): each row INDEPENDENTLY
draws a Poisson(1) multiplicity per replica, so the whole B-replica
ensemble is a map-side ``explode`` + one partial-aggregating
``groupBy(replica)`` — no global state, no second pass, and the
replica sums differ from true resampling by O(1/sqrt(n)) in
distribution.

Determinism across engines (no RNG): the per-(row, replica) Poisson
draw inverts the Poisson(1) CDF on a uniform u derived from
``md5(key:replica)`` — the engine-portable hash (training.py's
weighted-sample discipline). u is the first 8 md5 hex digits as a
32-bit integer, compared against PRECOMPUTED integer thresholds
floor(CDF * 2^32), so the draw is integer-compare-exact in Spark and
any SQL oracle. Multiplicity is capped at 4 (P ~ 0.4% per cell,
absorbed identically on both sides — the cap is part of the spec).

Values are summed as DECIMAL so replica totals are order-free exact;
quantile bounds over the B replica sums are rank-based (sorted
struct array over a B-row frame — driver-free, B is a constant).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# floor(CDF_Poisson(1)(k) * 2^32) for k = 0..3; u >= the last
# threshold draws the capped multiplicity 4. Recomputed (not
# hand-typed) so the oracle builder and the Spark plan share one
# source of truth.
POISSON1_THRESHOLDS: list[int] = [
    math.floor(c * (1 << 32))
    for c in (
        math.exp(-1.0),
        2.0 * math.exp(-1.0),
        2.5 * math.exp(-1.0),
        (8.0 / 3.0) * math.exp(-1.0),
    )
]
MAX_MULT = 4


def _u32(key: Column, replica: Column) -> Column:
    """Deterministic 32-bit uniform from (key, replica) — first 8 md5
    hex digits, the cross-engine-replayable hash."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", key.cast("string"), replica.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")


def poisson_multiplicity(key: Column, replica: Column) -> Column:
    """Poisson(1) draw as a chain of integer threshold compares."""
    u = _u32(key, replica)
    t = POISSON1_THRESHOLDS
    return (
        F.when(u < t[0], 0)
        .when(u < t[1], 1)
        .when(u < t[2], 2)
        .when(u < t[3], 3)
        .otherwise(MAX_MULT)
        .cast("long")
    )


def poisson_bootstrap_sums(
    df: DataFrame,
    key: Column,
    value: Column,
    n_replicas: int = 32,
) -> DataFrame:
    """DF[b, replica_sum: decimal(18,2)] — one bootstrap-replica total
    per row, b = 0..n_replicas-1.

    One map-side explode (B-fold row multiplication, no shuffle) into
    one partial-aggregating ``groupBy(b)`` — B output rows total.
    ``value`` is cast DECIMAL(18,2) before the weighted sum, so each
    replica total is exact and order-free."""
    if n_replicas < 2:
        raise ValueError(f"n_replicas must be >= 2, got {n_replicas}")
    v = value.cast("decimal(18,2)")
    rows = df.select(key.alias("k"), v.alias("v")).withColumn(
        "b", F.explode(F.sequence(F.lit(0), F.lit(n_replicas - 1)))
    )
    return (
        rows.withColumn("m", poisson_multiplicity(F.col("k"), F.col("b")))
        .groupBy("b")
        .agg(F.sum(F.col("v") * F.col("m")).cast("decimal(18,2)").alias("replica_sum"))
    )


def bootstrap_ci(
    df: DataFrame,
    key: Column,
    value: Column,
    n_replicas: int = 32,
    trim: int = 1,
) -> DataFrame:
    """1-row DF[n_replicas, point_est, ci_lo, ci_hi] — the full-sample
    total plus rank-based bootstrap bounds: ci_lo / ci_hi are the
    (1+trim)-th smallest / largest of the B replica sums (trim=1 at
    B=32 is a ~93.75% interval). Rank selection over the B-row frame
    is a sorted collect_list in ONE aggregate — exact decimals, no
    percentile interpolation to disagree across engines. Emitted as
    doubles (the decimal_exact_totals dtype discipline: DuckDB's .df()
    widens DECIMAL to float64)."""
    if not 0 < 2 * (trim + 1) <= n_replicas:
        raise ValueError(f"trim {trim} out of range for B={n_replicas}")
    sums = poisson_bootstrap_sums(df, key, value, n_replicas)
    bounds = sums.agg(
        F.sort_array(F.collect_list("replica_sum")).alias("s"),
    ).select(
        F.element_at("s", trim + 1).alias("ci_lo"),
        F.element_at("s", -(trim + 1)).alias("ci_hi"),
    )
    point = df.select(value.cast("decimal(18,2)").alias("v")).agg(
        F.sum("v").cast("decimal(18,2)").alias("point_est")
    )
    return (
        point.crossJoin(F.broadcast(bounds))
        .select(
            F.lit(n_replicas).cast("long").alias("n_replicas"),
            F.col("point_est").cast("double").alias("point_est"),
            F.col("ci_lo").cast("double").alias("ci_lo"),
            F.col("ci_hi").cast("double").alias("ci_hi"),
        )
    )
