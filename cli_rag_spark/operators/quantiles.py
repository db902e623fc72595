"""Exact distributed quantiles over QUANTIZED values — the
histogram-CDF method.

Exact quantiles normally need a global sort plus a global row index —
the row_number window over one partition that every scale review in
this repo bans (a single task sorts the corpus). But pipelines rarely
need quantiles of raw doubles: quality scores, prices-in-cents,
latencies-in-ms are all naturally QUANTIZED to a bounded integer
grid. On a quantized column the exact CDF is computable from the
value HISTOGRAM:

    hist = groupBy(value).count()          -- map-side combinable
    cdf  = running sum over the histogram  -- |distinct values| rows

The only window runs over the histogram, whose size is bounded by the
value grid (e.g. <= 1001 rows for a per-mille score), not the corpus —
at 100 TB the groupBy partial-aggregates billions of rows into that
fixed-size table and the window is driver-trivial. Every boundary is
an exact integer comparison, so DuckDB replays the same SQL
bit-identically (no percentile_disc/quantile semantics to reconcile
across engines — both sides build the same histogram).

Grouped forms partition the histogram window by the group key; skew
is bounded by |grid| rows per group, never by row count.

Semantics (deterministic, tie-stable):
- ``bucket(v) = floor(cum_excl(v) * k / total)`` — a value's bucket is
  where its FIRST occurrence lands in the sorted order; ties share one
  bucket and never split (so bucket populations may be uneven exactly
  when the data is tied — the honest answer). Rows with a NULL
  measure are excluded (the SQL aggregate convention): the histogram
  filters them, so they get no bucket and enter no median.
- ``median = min(v) with cum(v) * 2 >= total`` — the lower median.

The reference engine has no quantile support (SURVEY §2: the C
pipeline computes only cosine top-k); this operator is part of the
training-data analytics surface (quality-score curricula, outlier
gates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def value_histogram(
    df: DataFrame, value: Column, group_cols: list[str] | None = None
) -> DataFrame:
    """``groupBy(groups, value).count()`` with running (inclusive) and
    exclusive CDFs and the per-group total. Output: group cols + ``v``
    (the quantized value), ``n``, ``cum`` (inclusive), ``cum_excl``,
    ``total``. The window runs over the histogram (|grid| rows per
    group), not the data."""
    groups = group_cols or []
    reserved = {"v", "n", "cum", "cum_excl", "total"} & set(groups)
    if reserved:
        raise ValueError(
            f"group column(s) {sorted(reserved)} collide with histogram "
            "output names"
        )
    # NULL measures are EXCLUDED (the SQL aggregate convention) —
    # load-bearing for the oracle contract: Spark's window ORDER BY
    # puts NULLS FIRST ascending while DuckDB puts them LAST, so a
    # NULL row admitted into the histogram would shift every CDF
    # value differently in the two engines and read as an operator
    # bug. Filtering is the one semantics both engines share.
    hist = (
        df.where(value.isNotNull())
        .groupBy(*groups, value.alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(*groups).orderBy("v")
    wall = Window.partitionBy(*groups)
    return (
        hist.withColumn("cum", F.sum("n").over(w))
        .withColumn("cum_excl", F.col("cum") - F.col("n"))
        .withColumn("total", F.sum("n").over(wall))
    )


def quantile_buckets(
    df: DataFrame, value: Column, k: int, group_cols: list[str] | None = None
) -> DataFrame:
    """Assign each row its exact k-quantile bucket (0..k-1) by the
    first-occurrence rule. Returns ``df`` + ``v`` + ``bucket``. One
    shuffle for the histogram, one broadcast join back.

    With ``group_cols``, rows whose group key is NULL are EXCLUDED
    from the output: the join-back is a plain equi-join, and NULL
    never equals NULL — deliberately matching the oracle side's
    ``JOIN ... USING`` semantics (DuckDB drops them identically), so
    both engines agree. Same contract in :func:`mad_outliers`.

    CONTRACT — the value column must be QUANTIZED to a bounded grid
    (cents, a per-mille score, ms buckets): the histogram here is
    |grid| rows and is explicitly broadcast. Passing an effectively
    continuous double column makes the histogram corpus-sized and
    this broadcast a driver OOM (the r6 ngram-novelty failure genus).
    Quantize first — that precondition is the whole module's design
    (module docstring), not an optimization."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    taken = {"v", "bucket"} & set(df.columns)
    if taken:
        raise ValueError(f"df already has reserved column(s) {sorted(taken)}")
    groups = group_cols or []
    hist = value_histogram(df, value, groups).select(
        *groups,
        "v",
        F.floor(F.col("cum_excl") * k / F.col("total")).alias("bucket"),
    )
    return df.withColumn("v", value).join(F.broadcast(hist), [*groups, "v"])


def exact_median(
    df: DataFrame, value: Column, group_cols: list[str] | None = None
) -> DataFrame:
    """Lower median per group: the smallest quantized value whose
    inclusive CDF reaches half the population (``cum * 2 >= total``).
    Returns one row per group: group cols + ``median``. No sort of the
    data — a filter + min over the histogram."""
    groups = group_cols or []
    hist = value_histogram(df, value, groups)
    agg = hist.where(F.col("cum") * 2 >= F.col("total"))
    if groups:
        return agg.groupBy(*groups).agg(F.min("v").alias("median"))
    return agg.agg(F.min("v").alias("median"))


def quantile_values(
    df: DataFrame,
    value: Column,
    permilles: list[int],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact quantile VALUES at the given permille points (e.g.
    ``[100, 500, 900]`` → p10/p50/p90), one column ``p{permille}``
    per point, one row per group. Definition: the smallest quantized
    value whose inclusive CDF reaches the point —
    ``min(v) with cum * 1000 >= p * total`` — pure integer
    comparisons (no float q·n), consistent with
    :func:`exact_median` at p=500. One histogram pass serves ALL
    requested points (each is a conditional min over the same
    histogram rows); no join, no sort of the data."""
    if not permilles:
        raise ValueError("permilles must be non-empty")
    bad = [p for p in permilles if not (0 < p <= 1000)]
    if bad:
        raise ValueError(f"permilles must be in (0, 1000], got {bad}")
    if len(set(permilles)) != len(permilles):
        raise ValueError(f"duplicate permilles: {permilles}")
    groups = group_cols or []
    hist = value_histogram(df, value, groups)
    return quantiles_from_histogram(hist, permilles, groups)


def quantiles_from_histogram(
    hist: DataFrame,
    permilles: list[int],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """:func:`quantile_values` computed from an EXISTING
    :func:`value_histogram` frame (r15, guide §1.2): a caller that
    needs the histogram for its own aggregation too (e.g. a
    winsorized sum — Σ clamp(v)·n over histogram rows) builds it
    once and derives the quantile points here, instead of paying a
    second corpus scan + histogram shuffle inside
    :func:`quantile_values`. Same arithmetic verbatim — the smallest
    quantized value whose inclusive CDF reaches the point."""
    groups = group_cols or []
    aggs = [
        F.min(
            F.when(F.col("cum") * 1000 >= p * F.col("total"), F.col("v"))
        ).alias(f"p{p}")
        for p in permilles
    ]
    if groups:
        return hist.groupBy(*groups).agg(*aggs)
    return hist.agg(*aggs)


def mad_outliers(
    df: DataFrame,
    value: Column,
    group_cols: list[str] | None = None,
    cutoff: int = 3,
) -> DataFrame:
    """Median-absolute-deviation outlier flags on a quantized integer
    column: a row is an outlier when ``|x - median| > cutoff * MAD``
    (MAD = lower median of ``|x - median|``). Two histogram-CDF passes
    (median, then MAD) — both windows run over histograms, and the
    per-group medians ride broadcast joins. Returns ``df`` + ``v``,
    ``median``, ``mad``, ``is_outlier``. With MAD = 0 (over half the
    group tied at the median) every deviation > 0 is an outlier — the
    standard degenerate-MAD contract, replayed in the oracle. NULL
    measures never enter the medians and come back with NULL
    deviation and a NULL (not-true) flag. Rows with a NULL group key
    are excluded from the output (plain equi-join semantics — see
    :func:`quantile_buckets`)."""
    taken = {"v", "median", "mad", "is_outlier", "_dev"} & set(df.columns)
    if taken:
        raise ValueError(f"df already has reserved column(s) {sorted(taken)}")
    groups = group_cols or []
    d = df.withColumn("v", value)
    med = exact_median(d, F.col("v"), groups)
    d = (
        d.join(F.broadcast(med), groups)
        if groups
        else d.crossJoin(F.broadcast(med))
    )
    dev = d.withColumn("_dev", F.abs(F.col("v") - F.col("median")))
    mad = exact_median(dev, F.col("_dev"), groups).withColumnRenamed(
        "median", "mad"
    )
    dev = (
        dev.join(F.broadcast(mad), groups)
        if groups
        else dev.crossJoin(F.broadcast(mad))
    )
    return dev.withColumn(
        "is_outlier", F.col("_dev") > F.lit(cutoff) * F.col("mad")
    ).drop("_dev")
