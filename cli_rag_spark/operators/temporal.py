"""Temporal joins — as-of join and point-in-interval range join.

Neither exists as a Spark SQL join type; the naive spellings are
non-starters at 100 TB:

* as-of via correlated subquery / inequality join → BroadcastNestedLoop
  (O(N·M) per key);
* range via ``ON point BETWEEN lo AND hi`` → same.

The formulations here are the scalable ones:

* **as-of = union + window.** Tag both inputs, union, sort each key
  group once by (ts, side, seq), and carry the last right-side payload
  forward with ``last(..., ignorenulls=True)``. One shuffle on the key
  (the same shuffle serves the sort and the window), zero candidate
  blow-up, and skew is a plain window-skew problem AQE already
  handles — not a join explosion. At equal timestamps the right row
  sorts before the left row, so a match at exactly
  ``left_ts == right_ts`` is included (backward as-of, pandas
  ``merge_asof`` / DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` semantics).

* **range = bucketize + equi-join.** Assign each point to a
  ``floor(ts / width)`` bucket, explode each interval into the buckets
  it overlaps, equi-join on (key, bucket), then apply the exact
  predicate. Picking ``width`` ≈ the typical interval length bounds the
  explode at ~2 buckets per interval, and the join is a shuffled
  hash/sort-merge equi-join Catalyst can plan, prune, and AQE-skew —
  never a nested loop.

The reference has no temporal operators at all (SURVEY §2.b); this is
north-star surface for event/telemetry pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_US_PER_SEC = 1_000_000


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tolerance_sec: float | None = None,
    tiebreak: str | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row picks the latest right row with
    ``right_ts <= left_ts`` (``direction='backward'``) or the earliest
    right row with ``right_ts >= left_ts`` (``'forward'``) in the same
    ``on`` key group — pandas ``merge_asof`` semantics, equal-ts
    inclusive in both directions.

    Returns all left columns plus, per ``payload`` column ``c``, a
    ``c + suffix`` column (null when no right row qualifies) and a
    ``right_ts + suffix`` column carrying the matched timestamp.
    ``tolerance_sec`` additionally bounds ``|left_ts - right_ts|``
    (pandas ``merge_asof`` tolerance). ``tiebreak`` names a right
    column ordering rows that share a timestamp (backward: highest
    wins; forward: lowest wins) — required for determinism when such
    ties are possible.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: direction must be backward|forward, got {direction!r}")
    backward = direction == "backward"
    carried = list(dict.fromkeys(payload + [right_ts]))
    tag, tb = "__asof_side", "__asof_tb"
    tb_col: Column = F.col(tiebreak) if tiebreak else F.lit(0)

    r = right.select(
        *on,
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias(tag),
        tb_col.alias(tb),
        *[F.col(c).alias(f"__carry_{c}") for c in carried],
    )
    l = left.withColumn("__asof_ts", F.col(left_ts)).withColumn(tag, F.lit(1))

    # backward: right rows sort BEFORE left rows at equal ts and the
    # frame looks back — `last` non-null is the latest eligible right.
    # forward: left rows sort first at equal ts, frame looks ahead —
    # `first` non-null is the earliest eligible right.
    if backward:
        order = [F.col("__asof_ts").asc(), F.col(tag).asc(), F.col(tb).asc()]
        frame = (Window.unboundedPreceding, Window.currentRow)
        pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    else:
        order = [F.col("__asof_ts").asc(), F.col(tag).desc(), F.col(tb).asc()]
        frame = (Window.currentRow, Window.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    w = Window.partitionBy(*on).orderBy(*order).rowsBetween(*frame)
    filled = (
        l.unionByName(r, allowMissingColumns=True)
        .select(
            "*",
            *[
                pick(f"__carry_{c}").over(w).alias(f"__filled_{c}")
                for c in carried
            ],
        )
        .where(F.col(tag) == 1)
    )

    matched_ts = F.col(f"__filled_{right_ts}")
    if tolerance_sec is not None:
        gap = F.unix_micros(F.col(left_ts)) - F.unix_micros(matched_ts)
        if not backward:
            gap = -gap
        in_tol = gap <= int(tolerance_sec * _US_PER_SEC)
    else:
        in_tol = F.lit(True)
    out = [F.col(c) for c in left.columns]
    out += [
        F.when(matched_ts.isNotNull() & in_tol, F.col(f"__filled_{c}")).alias(f"{c}{suffix}")
        for c in carried
    ]
    return filled.select(*out)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_sec: int,
    how: str = "inner",
    interval_id: str | None = None,
) -> DataFrame:
    """Join each point row to every interval row of the same key with
    ``start_ts < point_ts <= end_ts`` (half-open, end-inclusive).

    Output = all interval columns + all point columns (name clashes are
    the caller's responsibility). ``bucket_sec`` is the bucketization
    width — choose it near the typical interval length so each interval
    explodes into O(1) buckets. A point falls in exactly one bucket, so
    the inner join produces no duplicate (interval, point) pairs.

    ``how='left_outer'`` keeps unmatched intervals; because the
    exploded frame has one row per covered bucket, outer semantics need
    a unique ``interval_id`` column to recover unmatched intervals via
    an anti-join (a key-equi anti-join — still no nested loop).
    """
    b = F.lit(bucket_sec * _US_PER_SEC)
    p = points.withColumn("__bucket", F.floor(F.unix_micros(F.col(point_ts)) / b))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_ts)) / b),
                F.floor(F.unix_micros(F.col(end_ts)) / b),
            )
        ),
    )
    condition = p["__bucket"] == iv["__bucket"]
    for k in on:
        condition = condition & (p[k] == iv[k])
    exact = (p[point_ts] > iv[start_ts]) & (p[point_ts] <= iv[end_ts])
    matched = iv.join(p, condition & exact, "inner").drop(iv["__bucket"]).drop(p["__bucket"])
    # the equi-condition makes point-side key columns redundant copies
    for k in on:
        matched = matched.drop(p[k])
    if how == "inner":
        return matched
    if how not in ("left", "left_outer", "leftouter"):
        raise ValueError(f"range_join: unsupported how={how!r}")
    if interval_id is None:
        raise ValueError("range_join: left_outer requires interval_id (unique key)")
    unmatched = intervals.join(
        matched.select(interval_id).distinct(), interval_id, "left_anti"
    )
    return matched.unionByName(unmatched, allowMissingColumns=True)
