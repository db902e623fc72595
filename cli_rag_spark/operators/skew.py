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
