"""Temporal operators: asof_join vs pandas.merge_asof, range_join vs
brute-force inequality join, and physical-plan assertions (the whole
point of the bucketized formulation is NO nested-loop join)."""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cli_rag_spark.operators.temporal import asof_join, range_join

BASE = dt.datetime(2024, 1, 1)


def _mk_frames(spark, seed=7, n_left=200, n_right=300, n_keys=8):
    rng = random.Random(seed)
    left = [
        (i, rng.randrange(n_keys), BASE + dt.timedelta(seconds=rng.randrange(100_000)))
        for i in range(n_left)
    ]
    right = [
        (
            1000 + i,
            rng.randrange(n_keys),
            BASE + dt.timedelta(seconds=rng.randrange(100_000)),
            round(rng.uniform(0, 10), 3),
        )
        for i in range(n_right)
    ]
    ldf = spark.createDataFrame(left, "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(right, "rid long, k long, rts timestamp, v double")
    return left, right, ldf, rdf


@pytest.mark.parametrize("tolerance", [None, 3600.0])
@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas_merge_asof(spark, tolerance, direction):
    left, right, ldf, rdf = _mk_frames(spark)
    got = (
        asof_join(
            ldf, rdf, on=["k"], left_ts="ts", right_ts="rts",
            payload=["rid", "v"], tolerance_sec=tolerance, tiebreak="rid",
            direction=direction,
        )
        .orderBy("lid")
        .collect()
    )

    lp = pd.DataFrame(left, columns=["lid", "k", "ts"]).sort_values("ts", kind="stable")
    rp = (
        pd.DataFrame(right, columns=["rid", "k", "rts", "v"])
        .sort_values(["rts", "rid"], kind="stable")
    )
    tol = pd.Timedelta(seconds=tolerance) if tolerance is not None else None
    exp = pd.merge_asof(
        lp, rp, left_on="ts", right_on="rts", by="k",
        direction=direction, tolerance=tol,
    ).sort_values("lid")

    assert len(got) == len(left)
    for row, (_, e) in zip(got, exp.iterrows()):
        assert row.lid == e.lid
        if pd.isna(e.rid):
            assert row.rid_right is None and row.v_right is None and row.rts_right is None
        else:
            assert row.rid_right == int(e.rid)
            assert row.v_right == pytest.approx(e.v)
            assert row.rts_right == e.rts.to_pydatetime()


def test_asof_equal_ts_inclusive_and_tiebreak(spark):
    ldf = spark.createDataFrame([(1, 0, BASE)], "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(
        [(10, 0, BASE, 1.0), (11, 0, BASE, 2.0), (12, 0, BASE + dt.timedelta(seconds=1), 9.0)],
        "rid long, k long, rts timestamp, v double",
    )
    row = asof_join(
        ldf, rdf, on=["k"], left_ts="ts", right_ts="rts",
        payload=["rid", "v"], tiebreak="rid",
    ).collect()[0]
    # equal-ts rows ARE eligible; highest tiebreak wins; later rows are not
    assert row.rid_right == 11 and row.v_right == 2.0


def test_asof_no_match_yields_nulls(spark):
    ldf = spark.createDataFrame([(1, 0, BASE)], "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(
        [(10, 1, BASE, 1.0)], "rid long, k long, rts timestamp, v double"
    )
    row = asof_join(
        ldf, rdf, on=["k"], left_ts="ts", right_ts="rts", payload=["rid", "v"]
    ).collect()[0]
    assert row.rid_right is None and row.v_right is None


@pytest.mark.parametrize("bucket_sec", [900, 3600, 7200])
def test_range_join_matches_bruteforce(spark, bucket_sec):
    _, _, ldf, rdf = _mk_frames(spark, seed=11)
    intervals = rdf.select(
        "rid", "k",
        (F.col("rts") - F.expr("INTERVAL 30 MINUTES")).alias("w_start"),
        F.col("rts").alias("w_end"),
    )
    points = ldf.select("lid", "k", "ts")
    got = (
        range_join(points, intervals, on=["k"], point_ts="ts",
                   start_ts="w_start", end_ts="w_end", bucket_sec=bucket_sec)
        .select("rid", "lid")
        .collect()
    )
    brute = (
        intervals.join(
            points,
            (intervals.k == points.k)
            & (points.ts > intervals.w_start)
            & (points.ts <= intervals.w_end),
        )
        .select("rid", "lid")
        .collect()
    )
    assert sorted((r.rid, r.lid) for r in got) == sorted((r.rid, r.lid) for r in brute)


def test_range_join_left_outer_keeps_unmatched_intervals(spark):
    intervals = spark.createDataFrame(
        [(1, 0, BASE, BASE + dt.timedelta(hours=1))],
        "rid long, k long, w_start timestamp, w_end timestamp",
    )
    points = spark.createDataFrame(
        [(5, 1, BASE + dt.timedelta(minutes=30))], "lid long, k long, ts timestamp"
    )
    rows = range_join(points, intervals, on=["k"], point_ts="ts",
                      start_ts="w_start", end_ts="w_end", bucket_sec=3600,
                      how="left_outer", interval_id="rid").collect()
    assert len(rows) == 1 and rows[0].rid == 1 and rows[0].lid is None
    # an interval spanning many buckets still yields exactly ONE null row
    wide = spark.createDataFrame(
        [(2, 0, BASE, BASE + dt.timedelta(hours=10))],
        "rid long, k long, w_start timestamp, w_end timestamp",
    )
    rows = range_join(points, wide, on=["k"], point_ts="ts",
                      start_ts="w_start", end_ts="w_end", bucket_sec=3600,
                      how="left_outer", interval_id="rid").collect()
    assert len(rows) == 1 and rows[0].lid is None


def test_temporal_plans_have_no_nested_loop(spark):
    _, _, ldf, rdf = _mk_frames(spark)
    intervals = rdf.select(
        "rid", "k",
        (F.col("rts") - F.expr("INTERVAL 30 MINUTES")).alias("w_start"),
        F.col("rts").alias("w_end"),
    )
    rj = range_join(ldf, intervals, on=["k"], point_ts="ts",
                    start_ts="w_start", end_ts="w_end", bucket_sec=3600)
    aj = asof_join(ldf, rdf, on=["k"], left_ts="ts", right_ts="rts", payload=["v"])
    for df in (rj, aj):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


# ------------------------------------------------------- resample/ffill

def test_resample_ffill_semantics(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from cli_rag_spark.operators.resample import resample_ffill

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (1, t0, 10.0),
        (1, t0 + dt.timedelta(hours=3), 5.0),   # 2 silent hours between
        (1, t0 + dt.timedelta(hours=3, minutes=10), 7.0),  # same slot
        (2, t0, 1.0),                            # single-slot key
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {
        (r.key, r.slot_ts.hour): (r.n_events, r.value, r.filled)
        for r in resample_ffill(df, "user_id", "ts", "value").collect()
    }
    assert out[(1, 0)] == (1, 10.0, False)
    assert out[(1, 1)] == (0, 10.0, True)    # carried
    assert out[(1, 2)] == (0, 10.0, True)
    assert out[(1, 3)] == (2, 12.0, False)   # two events aggregated
    assert out[(2, 0)] == (1, 1.0, False)
    assert len([k for k in out if k[0] == 1]) == 4  # dense grid, no gaps


def test_resample_validation_and_envelope(spark):
    import datetime as dt

    import pytest

    from cli_rag_spark.operators.resample import resample_ffill

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t0, 1.0), (1, t0 + dt.timedelta(days=30), 2.0)], ["k", "ts", "v"]
    )
    with pytest.raises(ValueError):
        resample_ffill(df, "k", "ts", "v", step_seconds=0)
    with pytest.raises(ValueError):
        resample_ffill(df, "k", "ts", "v", agg="median")
    with pytest.raises(ValueError, match="max_slots"):
        resample_ffill(df, "k", "ts", "v", step_seconds=60, max_slots=100)


def test_ohlc_daily_tie_break_and_single_exchange(spark):
    from cli_rag_spark.plans.queries_temporal import q_ohlc_daily  # noqa: F401
    from pyspark.sql import Window

    # two events at the SAME timestamp: event_id must break the tie
    # (higher id wins close, lower id wins open)
    rows = [
        (1, "2024-01-01 09:00:00", "t", 10.0),
        (2, "2024-01-01 09:00:00", "t", 30.0),
        (3, "2024-01-01 12:00:00", "t", 20.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    base = df.withColumn("day", F.to_date("ts"))
    w_a = Window.partitionBy("event_type", "day").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    w_d = Window.partitionBy("event_type", "day").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    r = base.withColumn("_ra", F.row_number().over(w_a)).withColumn("_rd", F.row_number().over(w_d))
    out = r.groupBy("event_type", "day").agg(
        F.max(F.when(F.col("_ra") == 1, F.col("value"))).alias("open"),
        F.max(F.when(F.col("_rd") == 1, F.col("value"))).alias("close"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
    ).collect()[0]
    assert (out.open, out.close, out.high, out.low) == (10.0, 20.0, 30.0, 10.0)
    # the (type, day) exchange is shared: windows + groupBy must not
    # add a second hash exchange on the same keys
    plan = (
        r.groupBy("event_type", "day")
        .agg(F.max("value"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
