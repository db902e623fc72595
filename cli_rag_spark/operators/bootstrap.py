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

from cli_rag_spark.session import spread_small_input

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


# an md5 digest is 128 bits = FOUR 32-bit uniforms: replicas are
# drawn in groups of 4 per digest, quartering the hash work (the
# dominant per-cell cost — measured, see BENCH.md ledger)
UNIFORMS_PER_DIGEST = 4

# the same thresholds as 8-char lowercase hex: comparing the digest
# SLICE against these lexicographically IS the numeric compare
# (fixed-width lowercase hex orders like its value in every engine),
# so the draw needs no hex->int conversion at all
POISSON1_HEX: list[str] = [format(t, "08x") for t in POISSON1_THRESHOLDS]


def _digest(key: Column, group: Column) -> Column:
    """One md5 per (key, replica-group) — the cross-engine-replayable
    hash (training.py's weighted-sample discipline)."""
    return F.md5(F.concat_ws(":", key.cast("string"), group.cast("string")))


def poisson_multiplicity(hex_slice: Column) -> Column:
    """Poisson(1) draw from one 8-hex-char digest slice as a chain of
    fixed-width string compares (== integer compares, see
    POISSON1_HEX)."""
    t = POISSON1_HEX
    return (
        F.when(hex_slice < t[0], 0)
        .when(hex_slice < t[1], 1)
        .when(hex_slice < t[2], 2)
        .when(hex_slice < t[3], 3)
        .otherwise(MAX_MULT)
        .cast("long")
    )


def _slot_sums(
    df: DataFrame,
    key: Column,
    value: Column,
    n_replicas: int,
) -> DataFrame:
    """DF[g, s0..s3, _gv] — one row per digest group g with its four
    slot-replica totals, plus ``_gv`` = the group's plain sum(v).
    Every input row contributes exactly one cell to every g, so _gv is
    the FULL-SAMPLE total (identical, exact decimal, in every group) —
    the point estimate rides the replica pass for free (r16: the
    separate point-estimate scan removed, guide §2.4)."""
    if n_replicas < 2 or n_replicas % UNIFORMS_PER_DIGEST != 0:
        raise ValueError(
            f"n_replicas must be a positive multiple of {UNIFORMS_PER_DIGEST}, "
            f"got {n_replicas}"
        )
    v = value.cast("decimal(18,2)")
    n_groups = n_replicas // UNIFORMS_PER_DIGEST
    # spread the digest fan-out (r16, guide §2.1): each row does
    # n_replicas/4 md5s — the operator's dominant CPU — so a
    # single-split input must not serialize it on one core; safe
    # because every aggregate below is exact-decimal and order-free
    src = spread_small_input(df.select(key.alias("k"), v.alias("v")))
    cells = (
        src
        .withColumn("g", F.explode(F.sequence(F.lit(0), F.lit(n_groups - 1))))
        .withColumn("d", _digest(F.col("k"), F.col("g")))
    )
    return cells.groupBy("g").agg(
        *[
            F.sum(
                F.col("v")
                * poisson_multiplicity(F.substring(F.col("d"), 1 + 8 * s, 8))
            )
            .cast("decimal(18,2)")
            .alias(f"s{s}")
            for s in range(UNIFORMS_PER_DIGEST)
        ],
        F.sum("v").cast("decimal(18,2)").alias("_gv"),
    )


def _unpivot_slots(slot_sums: DataFrame, keep: list[str]) -> DataFrame:
    """(g, s0..s3, *keep) -> (b, replica_sum, *keep): the per-replica
    un-pivot at the very end of the bootstrap plan — explodes the few
    group rows, never the (row x replica) intermediate."""
    return slot_sums.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("g") * UNIFORMS_PER_DIGEST + F.lit(s)).alias("b"),
                        F.col(f"s{s}").alias("replica_sum"),
                    )
                    for s in range(UNIFORMS_PER_DIGEST)
                ]
            )
        ).alias("p"),
        *keep,
    ).select("p.b", "p.replica_sum", *keep)


def poisson_bootstrap_sums(
    df: DataFrame,
    key: Column,
    value: Column,
    n_replicas: int = 32,
) -> DataFrame:
    """DF[b, replica_sum: decimal(18,2)] — one bootstrap-replica total
    per row, b = 0..n_replicas-1. Replica b's multiplicity for a row
    is drawn from slot b%4 of md5(key:b/4) — see POISSON1_HEX.

    Plan shape: ONE map-side explode fans each row to its
    n_replicas/4 digest groups; the four slot draws become four
    WEIGHT COLUMNS (not four more rows), so the partial-aggregating
    ``groupBy(g)`` compresses everything to n_replicas/4 rows x 4
    sums BEFORE the only shuffle, and the per-replica un-pivot
    explodes those few rows at the very end. The expensive
    intermediate (row x replica) never exists. ``value`` is cast
    DECIMAL(18,2) before the weighted sum, so each replica total is
    exact and order-free. ``n_replicas`` must be a multiple of 4
    (the digest packing)."""
    return _unpivot_slots(_slot_sums(df, key, value, n_replicas), keep=[])


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
    widens DECIMAL to float64).

    ONE scan (r16): the point estimate is every digest group's plain
    sum(v) — identical exact decimals in every group — so max(_gv) in
    the bounds aggregate replaces the former second input scan +
    broadcast crossJoin; on an EMPTY frame max over no rows is NULL,
    preserving the NULL-row contract."""
    if not 0 < 2 * (trim + 1) <= n_replicas:
        raise ValueError(f"trim {trim} out of range for B={n_replicas}")
    sums = _unpivot_slots(_slot_sums(df, key, value, n_replicas), keep=["_gv"])
    # try_element_at: on EMPTY input the replica array is empty and
    # ANSI element_at would throw ARRAY_INDEX_OUT_OF_BOUNDS mid-job;
    # the contract for an empty frame is instead NULL bounds next to
    # a NULL point estimate (ADVICE r6).
    return sums.agg(
        F.sort_array(F.collect_list("replica_sum")).alias("s"),
        F.max("_gv").alias("point_est"),
    ).select(
        F.lit(n_replicas).cast("long").alias("n_replicas"),
        F.col("point_est").cast("double").alias("point_est"),
        F.try_element_at("s", F.lit(trim + 1)).cast("double").alias("ci_lo"),
        F.try_element_at("s", F.lit(-(trim + 1))).cast("double").alias("ci_hi"),
    )
