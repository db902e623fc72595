"""Skew-aware aggregation helpers.

At 100 TB a handful of hot keys (one viral document id, one dominant
event user) can pin an entire ``groupBy`` shuffle on one task. AQE's
skew-join splitting (on in session.py) handles *joins*; aggregations
need the classic **two-phase salted aggregate**:

    phase 1: groupBy(key, salt) — the hot key's rows spread across
             ``n_salts`` tasks, each computing a partial aggregate;
    phase 2: groupBy(key) over the ≤ n_salts partial rows.

Only algebraic aggregates decompose this way (sum/count/min/max, and
avg as sum+count). The helper takes the same aggregate surface the
engine's query packs use and rewrites it into the two phases; for
uniform data the extra phase is one near-free shuffle of pre-shrunk
rows, so it is safe to apply preemptively on any possibly-skewed key.

``salted_topk_per_key`` does the same for grouped top-k: per-salt
top-k (heap-sized state per task) then global top-k over k·n_salts
candidate rows — the Window never sees the hot key's full row set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PHASE1 = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}
_PHASE2 = {
    "sum": F.sum,
    "count": F.sum,  # counts add up
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-proof groupBy.

    ``aggs`` maps output column → (fn, input column) with fn in
    {sum, count, min, max, avg}. Example::

        salted_aggregate(events, ["user_id"],
                         {"n": ("count", "*"), "total": ("sum", "value"),
                          "avg_v": ("avg", "value")})
    """
    work = dict(aggs)
    avg_outs = {out: col for out, (fn, col) in aggs.items() if fn == "avg"}
    for out, col in avg_outs.items():
        del work[out]
        work[f"__{out}_sum"] = ("sum", col)
        work[f"__{out}_cnt"] = ("count", col)
    for out, (fn, _col) in work.items():
        if fn not in _PHASE1:
            raise ValueError(f"non-decomposable aggregate {fn!r} for {out!r}")

    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    p1 = salted.groupBy(*keys, "_salt").agg(
        *[
            _PHASE1[fn](F.lit(1) if col == "*" else F.col(col)).alias(out)
            for out, (fn, col) in work.items()
        ]
    )
    p2 = p1.groupBy(*keys).agg(
        *[_PHASE2[fn](F.col(out)).alias(out) for out, (fn, _col) in work.items()]
    )
    for out in avg_outs:
        p2 = p2.withColumn(out, F.col(f"__{out}_sum") / F.col(f"__{out}_cnt")).drop(
            f"__{out}_sum", f"__{out}_cnt"
        )
    return p2


def salted_topk_per_key(
    df: DataFrame,
    key: str,
    order_by: list[Column],
    k: int,
    n_salts: int = 16,
) -> DataFrame:
    """Grouped top-k that survives a hot key: per-(key, salt) top-k
    first (each task ranks only its slice), then top-k over the
    surviving k·n_salts rows per key."""
    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    w1 = Window.partitionBy(key, "_salt").orderBy(*order_by)
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy(key).orderBy(*order_by)
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
    )


def broadcast_head_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[str],
    weight_col: str,
    head_k: int = 1000,
) -> DataFrame:
    """Hybrid broadcast+shuffle inner equi-join for Zipf-skewed
    dimension tables (word/n-gram count tables being the canonical
    case: on real text the head tokens — "the", "of" — concentrate a
    large share of FACT rows on a few keys, and at 100 TB those
    shuffle-join partitions become stragglers).

    The ``head_k`` heaviest dim rows (by ``weight_col``, ties broken
    by key for determinism) are broadcast, so every fact row carrying
    a hot key is joined MAP-SIDE and never enters a shuffle; the tail
    — huge in keys but near-uniform in fact-row load — takes the
    normal shuffle path. Head and tail key sets are disjoint
    (anti-join), so the union is exactly the inner join.

    This is the standard hybrid plan for power-law keys: AQE's
    skew-join splitting can break up an oversized partition after the
    shuffle, but the broadcast head prevents the hot keys' fact rows
    from being shuffled at all. ``head_k`` bounds the broadcast at
    head_k KEYS (≈ head_k dim rows for the aggregated count tables
    this serves; a key's duplicate dim rows, if any, all travel with
    it — selecting whole keys, not rows, is what keeps head ∪ tail
    exactly the inner join even when duplicates straddle the cut).

    The dim lineage appears in several subtrees (head keys, head
    join, tail join); when dim is an aggregation over a shuffle,
    Spark's ReusedExchange serves them from one shuffle write —
    persist dim only if its lineage is wider than one exchange.
    """
    head_keys = (
        dim.groupBy(*keys)
        .agg(F.max(F.col(weight_col)).alias("_w"))
        .orderBy(F.col("_w").desc(), *[F.col(k) for k in keys])
        .limit(head_k)
        .select(*keys)
    )
    head = dim.join(F.broadcast(head_keys), keys, "semi")
    tail = dim.join(F.broadcast(head_keys), keys, "anti")
    return fact.join(F.broadcast(head), keys).unionByName(fact.join(tail, keys))


def key_skew_profile(df: DataFrame, key: Column) -> DataFrame:
    """1-row DF[total_rows, distinct_keys, max_cnt, p50_cnt, p99_cnt,
    max_share_ppm, skew_x100] — the decision input for every helper
    above: BEFORE salting a key or pinning a broadcast head, measure
    how skewed the key actually is.

    Exact integer percentiles WITHOUT a global sort (the two-level
    drift.py shape): per-key counts collapse to a count-HISTOGRAM
    (cnt -> n_keys, cardinality = #distinct per-key counts, tiny for
    any real key), the cumulative over that histogram is a window
    over the tiny frame, and pN_cnt = the smallest cnt whose
    cumulative key coverage reaches ceil(N% of keys) — the exact
    lower quantile, no interpolation, identical in any SQL engine.
    Ratios are integer (ppm / x100) so cross-engine replay is
    drift-free.

    Scale shape: one partial-aggregating ``groupBy(key)`` (the only
    data-sized shuffle), one ``groupBy(cnt)`` onto the tiny
    histogram, one unpartitioned window over it (bounded by distinct
    count-values, not keys), one 1-row aggregate."""
    counts = df.groupBy(key.alias("k")).agg(F.count(F.lit(1)).alias("cnt"))
    hist = counts.groupBy("cnt").agg(F.count(F.lit(1)).alias("n_keys"))
    cum = hist.withColumn(
        "cum",
        F.sum("n_keys").over(
            Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return cum.agg(
        F.sum(F.col("cnt") * F.col("n_keys")).alias("_total"),
        F.sum("n_keys").alias("_n"),
        F.max("cnt").alias("_max"),
        F.collect_list(F.struct("cnt", "cum")).alias("_h"),
    ).select(
        F.col("_total").alias("total_rows"),
        F.col("_n").alias("distinct_keys"),
        F.col("_max").alias("max_cnt"),
        # all-integer rank thresholds (2*cum >= n is cum >= n/2 with no
        # doubles in sight — cross-engine float/rounding-proof):
        # p50 = smallest cnt covering rank ceil(n/2), p99 = rank
        # ceil(0.99 n)
        F.aggregate(
            F.filter(F.col("_h"), lambda s: s.cum * 2 >= F.col("_n")),
            F.lit(None).cast("long"),
            lambda acc, s: F.least(F.coalesce(acc, s.cnt), s.cnt),
        ).alias("p50_cnt"),
        F.aggregate(
            F.filter(F.col("_h"), lambda s: s.cum * 100 >= F.col("_n") * 99),
            F.lit(None).cast("long"),
            lambda acc, s: F.least(F.coalesce(acc, s.cnt), s.cnt),
        ).alias("p99_cnt"),
        # floor-division, NOT cast: Spark's cast-to-long truncates,
        # DuckDB's rounds — floor agrees everywhere for positives
        F.floor(F.col("_max") * 1000000 / F.col("_total")).alias("max_share_ppm"),
    ).withColumn(
        "skew_x100", F.floor(F.col("max_cnt") * 100 / F.col("p50_cnt"))
    )
