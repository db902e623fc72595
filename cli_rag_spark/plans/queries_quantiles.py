"""Exact-quantile pack (operators/quantiles.py) — histogram-CDF
quantiles over quantized integer measures.

The scale story is the module's whole point: exact quantiles WITHOUT a
global sort or a one-partition row_number window. Values are quantized
to a bounded integer grid (a per-mille score, cents), the CDF is a
running sum over the value HISTOGRAM (map-side-combinable groupBy →
a window over |grid| rows), and every boundary decision is an integer
comparison both engines replay bit-identically.

Judged queries:
- ``curriculum_buckets`` — decile curriculum over a stopword-density
  quality score (the data-ordering step of curriculum training).
- ``mad_outlier_stats`` — per-event-type median/MAD outlier gate over
  ``value`` in exact cents.
- ``source_quality_quantiles`` — per-source p10/p50/p90 quality
  profile (the mixture designer's companion to the overlap matrix).
- ``winsorized_revenue_stats`` — robust aggregates with exact
  [p1, p99] clamping, BIGINT cents end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_rag_spark.functions.quality import stopword_count
from cli_rag_spark.functions.text import token_count
from cli_rag_spark.operators.quantiles import (
    mad_outliers,
    quantile_buckets,
    quantile_values,
)
from cli_rag_spark.sources.documents import load_table
from cli_rag_spark.plans.queries_text import _EN_STOP, _WS_TOKENS

QUERIES: dict = {}
ORACLE: dict = {}

CURRICULUM_K = 10
MAD_CUTOFF = 3

# SQL twin of _stop_density_pm — ONE definition interpolated into
# every oracle that shares the score grid (a density change edited in
# one copy would silently desynchronize oracles otherwise)
_STOP_DENSITY_SQL = rf"""CASE WHEN len({_WS_TOKENS.format(col='text')}) > 0
                  THEN floor(
                    len(list_filter({_WS_TOKENS.format(col='lower(text)')},
                                    x -> x IN ({_EN_STOP}))) * 1000
                    / len({_WS_TOKENS.format(col='text')}))
                  ELSE 0 END::BIGINT"""


def _stop_density_pm(text):
    """Stopword density per mille, floor-integer — the quantized
    curriculum score: 0 for empty docs, else floor(n_stop*1000/n_words).
    Integer by construction, so the histogram grid is <= 1001 keys."""
    nw = token_count(text)
    return F.when(
        nw > 0, F.floor(stopword_count(text) * 1000 / nw)
    ).otherwise(F.lit(0)).cast("long")


def q_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile curriculum over the documents table: every doc gets its
    exact stopword-density decile (first-occurrence rule, ties never
    split), then per-bucket population stats — the ordering table a
    curriculum-training data loader consumes. The only window runs
    over the <=1001-row score histogram; the assignment is a broadcast
    join back (operators/quantiles.py module docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_words"),
        _stop_density_pm(F.col("text")).alias("score_pm"),
    )
    bucketed = quantile_buckets(scored, F.col("score_pm"), CURRICULUM_K)
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.min("score_pm").alias("min_score_pm"),
            F.max("score_pm").alias("max_score_pm"),
        )
        .orderBy("bucket")
    )


QUERIES["curriculum_buckets"] = q_curriculum_buckets

# The oracle rebuilds the SAME histogram CDF (running sum over distinct
# scores) rather than calling quantile_disc/ntile — window-function
# quantile semantics differ across engines, histogram arithmetic
# doesn't. floor(cum_excl * 10 / total): integer*10 stays exact in the
# double division at any fixture scale (values <= 10 * n_docs).
ORACLE["curriculum_buckets"] = rf"""
    WITH s AS (
      SELECT doc_id,
             len({_WS_TOKENS.format(col='text')})::BIGINT AS n_words,
             {_STOP_DENSITY_SQL} AS score_pm
      FROM documents
    ), hist AS (
      SELECT score_pm, count(*) AS n FROM s GROUP BY score_pm
    ), cdf AS (
      SELECT score_pm,
             sum(n) OVER (ORDER BY score_pm) - n AS cum_excl,
             sum(n) OVER () AS total
      FROM hist
    ), b AS (
      SELECT score_pm, floor(cum_excl * {CURRICULUM_K} / total)::BIGINT AS bucket
      FROM cdf
    )
    SELECT b.bucket,
           count(*)::BIGINT AS n_docs,
           sum(s.n_words)::BIGINT AS total_words,
           min(s.score_pm) AS min_score_pm,
           max(s.score_pm) AS max_score_pm
    FROM s JOIN b USING (score_pm)
    GROUP BY b.bucket ORDER BY b.bucket
"""


def q_mad_outlier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outlier gate per event type over ``value`` in TRUE
    exact cents: DECIMAL(18,2) cast then ×100 — never floor(value*100)
    on the raw double, which lands one cent low whenever the decimal
    price's nearest double sits below it (2144.70 → 2144.6999…,
    floor(×100) = 214469; the repo's decimal_exact_totals discipline).
    Robust-statistics twin of the
    z-score drift gates: median and MAD come from two histogram-CDF
    passes (operators/quantiles.py mad_outliers), so no engine
    quantile function is involved and the 3×MAD cut is an exact
    integer comparison. Returns per-type medians and outlier counts."""
    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    flagged = mad_outliers(
        ev.select("event_type", "value"), cents,
        group_cols=["event_type"], cutoff=MAD_CUTOFF,
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.first("median").alias("median_cents"),
            F.first("mad").alias("mad_cents"),
            F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


QUERIES["mad_outlier_stats"] = q_mad_outlier_stats

# NULL-v discipline (ADVICE r8 medium): the histogram CTEs must
# exclude NULL v exactly like the Spark side's value_histogram does —
# a NULL group admitted into hist/dhist inflates `total` (DuckDB's
# NULLS-LAST keeps it out of `cum`), shifting the median threshold.
# NULL-v rows STAY in s/dev so n_events still counts them, mirroring
# mad_outliers' keep-with-NULL-flag contract.
ORACLE["mad_outlier_stats"] = f"""
    WITH s AS (
      SELECT event_type,
             (CAST(value AS DECIMAL(18,2)) * 100)::BIGINT AS v
      FROM events
    ), hist AS (
      SELECT event_type, v, count(*) AS n FROM s
      WHERE v IS NOT NULL GROUP BY event_type, v
    ), cdf AS (
      SELECT event_type, v,
             sum(n) OVER (PARTITION BY event_type ORDER BY v) AS cum,
             sum(n) OVER (PARTITION BY event_type) AS total
      FROM hist
    ), med AS (
      SELECT event_type, min(v) AS median_cents
      FROM cdf WHERE cum * 2 >= total GROUP BY event_type
    ), dev AS (
      SELECT s.event_type, s.v, abs(s.v - m.median_cents) AS dv,
             m.median_cents
      FROM s JOIN med m USING (event_type)
    ), dhist AS (
      SELECT event_type, dv, count(*) AS n FROM dev
      WHERE dv IS NOT NULL GROUP BY event_type, dv
    ), dcdf AS (
      SELECT event_type, dv,
             sum(n) OVER (PARTITION BY event_type ORDER BY dv) AS cum,
             sum(n) OVER (PARTITION BY event_type) AS total
      FROM dhist
    ), mad AS (
      SELECT event_type, min(dv) AS mad_cents
      FROM dcdf WHERE cum * 2 >= total GROUP BY event_type
    )
    SELECT d.event_type,
           count(*)::BIGINT AS n_events,
           d.median_cents,
           mad.mad_cents,
           sum(CASE WHEN d.dv > {MAD_CUTOFF} * mad.mad_cents
                    THEN 1 ELSE 0 END)::BIGINT AS n_outliers
    FROM dev d JOIN mad USING (event_type)
    GROUP BY d.event_type, d.median_cents, mad.mad_cents
    ORDER BY d.event_type
"""


# --- exact quantile values: per-source quality profile (r8) -----------

PROFILE_PERMILLES = [100, 500, 900]


def q_source_quality_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source p10/p50/p90 of the stopword-density quality score —
    the per-source quality PROFILE a mixture designer reads next to
    the overlap matrix (a source whose p10 is another's p90 gets a
    different weight, not a different filter). One histogram pass per
    source serves all three points (operators/quantiles.py
    quantile_values); everything is integer arithmetic on the
    ≤1001-key score grid."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "source", _stop_density_pm(F.col("text")).alias("score_pm")
    )
    return quantile_values(
        scored, F.col("score_pm"), PROFILE_PERMILLES, group_cols=["source"]
    ).orderBy("source")


QUERIES["source_quality_quantiles"] = q_source_quality_quantiles

ORACLE["source_quality_quantiles"] = rf"""
    WITH s AS (
      SELECT source,
             {_STOP_DENSITY_SQL} AS v
      FROM documents
    ), hist AS (
      SELECT source, v, count(*) AS n FROM s GROUP BY source, v
    ), cdf AS (
      SELECT source, v,
             sum(n) OVER (PARTITION BY source ORDER BY v) AS cum,
             sum(n) OVER (PARTITION BY source) AS total
      FROM hist
    )
    SELECT source,
           min(CASE WHEN cum * 1000 >= 100 * total THEN v END) AS p100,
           min(CASE WHEN cum * 1000 >= 500 * total THEN v END) AS p500,
           min(CASE WHEN cum * 1000 >= 900 * total THEN v END) AS p900
    FROM cdf GROUP BY source ORDER BY source
"""


# --- winsorized robust aggregates (r8) --------------------------------

WINSOR_LO = 10    # p1
WINSOR_HI = 990   # p99


def q_winsorized_revenue_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized revenue aggregates per return flag: extended prices
    in TRUE exact cents (DECIMAL(18,2) cast then ×100 — floor(×100) on
    the raw double lands one cent low for prices whose nearest double
    sits below the decimal, e.g. 2144.70), clamped to the group's
    exact [p1, p99] before summing — the robust total a reporting
    pipeline publishes so one fat-finger row can't move the aggregate.
    NULL prices are excluded up front (mirroring the quantile
    machinery's NULL contract — without the filter they would clamp
    to the p99 bound via NULL-skipping least/greatest). One histogram
    pass serves EVERYTHING (r15, guide §1.2/§2.3): the clamp bounds
    (quantiles_from_histogram) AND the clamped sum — every output is
    a Σ over histogram rows weighted by n (Σ_rows clamp(c) =
    Σ_v clamp(v)·n, exact longs), so the pre-r15 second corpus scan +
    bounds-join against every row collapses to a broadcast join over
    |distinct cents| histogram rows. The histogram is
    localCheckpoint-ed (lazily, inside the timed run) because both
    the bounds subtree and the weighted aggregation read it."""
    from cli_rag_spark.operators.quantiles import (
        quantiles_from_histogram,
        value_histogram,
    )

    li = load_table(spark, sf_dir, "lineitem")
    # spread_small_input was A/B'd here (r16) and NOT shipped: the
    # histogram partial aggregate gets perfect map-side combine from a
    # single-split input; spreading shuffles ~32x the distinct-cent
    # rows and measured 2.16 s / 4.8 CPU-s unspread vs 2.31 / 10.2
    # spread — the cheap cast never repays the lost combine
    cents = li.select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("c"),
    ).where(F.col("c").isNotNull())
    hist = value_histogram(
        cents, F.col("c"), ["l_returnflag"]
    ).localCheckpoint(eager=False)
    bounds = quantiles_from_histogram(
        hist, [WINSOR_LO, WINSOR_HI], ["l_returnflag"]
    )
    clamped = hist.join(F.broadcast(bounds), "l_returnflag").select(
        "l_returnflag",
        F.col("n"),
        (
            F.greatest(
                F.col(f"p{WINSOR_LO}"),
                F.least(F.col(f"p{WINSOR_HI}"), F.col("v")),
            )
            * F.col("n")
        ).alias("w"),
        F.when(F.col("v") < F.col(f"p{WINSOR_LO}"), F.col("n"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("lo"),
        F.when(F.col("v") > F.col(f"p{WINSOR_HI}"), F.col("n"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("hi"),
    )
    return (
        clamped.groupBy("l_returnflag")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("w").alias("winsorized_cents"),
            F.sum("lo").alias("n_clamped_low"),
            F.sum("hi").alias("n_clamped_high"),
        )
        .orderBy("l_returnflag")
    )


QUERIES["winsorized_revenue_stats"] = q_winsorized_revenue_stats

ORACLE["winsorized_revenue_stats"] = f"""
    WITH s AS (
      SELECT l_returnflag,
             (CAST(l_extendedprice AS DECIMAL(18,2)) * 100)::BIGINT AS c
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL
    ), hist AS (
      SELECT l_returnflag, c, count(*) AS n FROM s GROUP BY l_returnflag, c
    ), cdf AS (
      SELECT l_returnflag, c,
             sum(n) OVER (PARTITION BY l_returnflag ORDER BY c) AS cum,
             sum(n) OVER (PARTITION BY l_returnflag) AS total
      FROM hist
    ), b AS (
      SELECT l_returnflag,
             min(CASE WHEN cum * 1000 >= {WINSOR_LO} * total THEN c END) AS lo,
             min(CASE WHEN cum * 1000 >= {WINSOR_HI} * total THEN c END) AS hi
      FROM cdf GROUP BY l_returnflag
    )
    SELECT s.l_returnflag,
           count(*)::BIGINT AS n,
           sum(greatest(b.lo, least(b.hi, s.c)))::BIGINT AS winsorized_cents,
           sum(CASE WHEN s.c < b.lo THEN 1 ELSE 0 END)::BIGINT AS n_clamped_low,
           sum(CASE WHEN s.c > b.hi THEN 1 ELSE 0 END)::BIGINT AS n_clamped_high
    FROM s JOIN b USING (l_returnflag)
    GROUP BY s.l_returnflag ORDER BY s.l_returnflag
"""
