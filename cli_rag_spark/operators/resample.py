"""Time-series resampling with forward fill — the gap-filling
operator every metrics/feature pipeline needs ("hourly activity per
user, carrying the last observation through silent hours") and the
one temporal shape the as-of/range/window family doesn't cover: the
OUTPUT grid is denser than the input.

Plan shape (scale-first):

1. per key, one partial-agg min/max timestamp — the grid bounds;
2. the dense grid materializes from ``sequence()`` + explode — rows
   are generated EXECUTOR-side per key, never collected, never
   crossJoined against a global calendar (the naive
   calendar × keys cartesian ships every key to every slot; this
   ships each key exactly its own span);
3. one left join of the grid against the bucketed per-slot aggregate
   (same key+slot equi-join both sides — AQE-coalesced narrow
   shuffle);
4. forward fill = ``last(value, ignorenulls=True)`` over the per-key
   time window — one shuffle on the key serves the join AND the fill
   sort.

Grid density is the caller's contract: a key spanning the whole
corpus window emits span/step rows (validated against an explicit
``max_slots`` so a runaway step cannot OOM-explode a hot key —
the same envelope discipline as weighted_sample's top-k guard).

Deterministic and SQL-replayable: slots are integer epoch divisions,
the fill is a window function with a total order, and per-slot
aggregates are exact counts/longs (callers round float payloads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
    agg: str = "sum",
    max_slots: int = 100_000,
) -> DataFrame:
    """DF[key, slot_ts, n_events, value, filled] — per key, a dense
    grid from its first to its last ``step_seconds`` slot: ``value``
    is the per-slot aggregate where events exist, forward-filled from
    the previous observed slot otherwise (``filled`` marks carried
    rows). ``agg`` ∈ sum/count/max/min over ``value_col``."""
    if step_seconds <= 0:
        raise ValueError("step_seconds must be positive")
    if agg not in ("sum", "count", "max", "min"):
        raise ValueError(f"unsupported agg {agg!r}")
    slot = (F.unix_seconds(F.col(ts_col)) / step_seconds).cast("long")
    agg_fn = {
        "sum": F.sum(F.col(value_col)),
        "count": F.count(F.lit(1)),
        "max": F.max(F.col(value_col)),
        "min": F.min(F.col(value_col)),
    }[agg]
    per_slot = (
        df.select(F.col(key_col).alias("key"), slot.alias("slot"), F.col(value_col))
        .groupBy("key", "slot")
        .agg(agg_fn.alias("_v"), F.count(F.lit(1)).alias("n_events"))
    )
    spans = per_slot.groupBy("key").agg(
        F.min("slot").alias("_lo"), F.max("slot").alias("_hi")
    )
    overflow = spans.where(F.col("_hi") - F.col("_lo") >= max_slots).limit(1).collect()
    if overflow:
        r = overflow[0]
        raise ValueError(
            f"key {r['key']!r} spans {r['_hi'] - r['_lo'] + 1} slots at "
            f"step={step_seconds}s (> max_slots={max_slots}); raise the step "
            "or the envelope"
        )
    grid = spans.select(
        "key", F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("slot")
    )
    w = Window.partitionBy("key").orderBy("slot")
    joined = grid.join(per_slot, ["key", "slot"], "left_outer")
    return (
        joined.select(
            "key",
            F.timestamp_seconds(F.col("slot") * step_seconds).alias("slot_ts"),
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.last("_v", ignorenulls=True).over(w).alias("value"),
            F.col("_v").isNull().alias("filled"),
        )
    )
