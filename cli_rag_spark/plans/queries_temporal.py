"""Temporal pack — as-of join and range join over the ``events`` table.

The judged queries exercise operators/temporal.py against independent
DuckDB formulations: native ``ASOF JOIN`` for the as-of oracle and a
plain inequality join for the range oracle — different algorithms,
same semantics, so a match is meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_rag_spark.operators.temporal import asof_join, range_join
from cli_rag_spark.sources.documents import load_table


def q_asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute each purchase to the latest prior click by the same
    user (classic last-touch attribution), with the click→purchase
    latency in seconds. Backward as-of, equal-ts inclusive."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        purchases,
        clicks.withColumnRenamed("event_id", "click_id"),
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload=["click_id"],
        tiebreak="click_id",
        suffix="_click",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("click_id_click").alias("click_id"),
        F.round(
            (F.unix_micros("ts") - F.unix_micros("ts_click")) / 1_000_000.0, 3
        ).alias("latency_sec"),
    ).orderBy("event_id")


def q_range_click_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, count same-user clicks in the preceding hour
    (half-open window (ts-1h, ts]) and sum their values — a
    point-in-interval range join, bucketized to an equi-join."""
    ev = load_table(spark, sf_dir, "events")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("w_start"),
            F.col("ts").alias("w_end"),
        )
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("p_user"), "ts", "value"
    )
    joined = range_join(
        clicks,
        purchases,
        on=["p_user"],
        point_ts="ts",
        start_ts="w_start",
        end_ts="w_end",
        bucket_sec=3600,
        how="left_outer",
        interval_id="p_id",
    )
    return (
        joined.groupBy("p_id")
        .agg(
            F.count("ts").alias("n_clicks_1h"),
            F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2).alias("click_value_1h"),
        )
        .orderBy("p_id")
    )


QUERIES = {
    "asof_click_attribution": q_asof_click_attribution,
    "range_click_burst": q_range_click_burst,
}

ORACLE = {
    # DuckDB-native ASOF JOIN: matches the greatest c.ts <= p.ts per key.
    # Clicks are deduped to one row per (user_id, ts) keeping the highest
    # event_id, mirroring the operator's `tiebreak` semantics.
    "asof_click_attribution": """
        WITH clicks AS (
          SELECT user_id, ts, max(event_id) AS click_id
          FROM events WHERE event_type = 'click'
          GROUP BY user_id, ts
        ), purchases AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        )
        SELECT p.event_id, p.user_id, c.click_id,
               round(epoch_us(p.ts - c.ts) / 1000000.0, 3) AS latency_sec
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id
    """,
    "range_click_burst": """
        WITH purchases AS (
          SELECT event_id AS p_id, user_id, ts FROM events WHERE event_type = 'purchase'
        ), clicks AS (
          SELECT user_id, ts, value FROM events WHERE event_type = 'click'
        )
        SELECT p.p_id,
               count(c.ts) AS n_clicks_1h,
               round(coalesce(sum(c.value), 0.0), 2) AS click_value_1h
        FROM purchases p
        LEFT JOIN clicks c
          ON c.user_id = p.user_id
         AND c.ts > p.ts - INTERVAL 1 HOUR
         AND c.ts <= p.ts
        GROUP BY p.p_id
        ORDER BY p.p_id
    """,
}


RESAMPLE_USERS = 10
RESAMPLE_STEP = 3600


def q_resample_user_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-user activity grid with forward fill
    (operators/resample.py resample_ffill): the gap-filling resample
    every metrics/feature pipeline runs — silent hours appear with
    n_events=0 carrying the last observed hourly total (filled=true).
    Grid rows generate executor-side per key from sequence() (never a
    calendar cross join); ONE key shuffle serves the slot join and the
    fill window. First 10 users keep the judged grid bounded."""
    from cli_rag_spark.operators.resample import resample_ffill

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < RESAMPLE_USERS)
    out = resample_ffill(ev, "user_id", "ts", "value", RESAMPLE_STEP, agg="sum")
    return (
        out.select(
            "key",
            # string-format the slot (the pack convention): pandas
            # timestamp RESOLUTION differs between engines (ns vs us)
            # and would flip the driver's dtype-sensitive hash
            F.date_format("slot_ts", "yyyy-MM-dd HH:mm:ss").alias("slot_ts"),
            "n_events",
            F.round("value", 2).alias("value"),
            "filled",
        )
        .orderBy("key", "slot_ts")
    )


QUERIES["resample_user_hourly"] = q_resample_user_hourly

ORACLE["resample_user_hourly"] = f"""
    WITH per_slot AS (
      SELECT user_id AS key,
             CAST(floor(epoch(ts) / {RESAMPLE_STEP}) AS BIGINT) AS slot,
             sum(value) AS v,
             count(*) AS n_events
      FROM events WHERE user_id < {RESAMPLE_USERS}
      GROUP BY key, slot
    ), spans AS (
      SELECT key, min(slot) AS lo, max(slot) AS hi FROM per_slot GROUP BY key
    ), grid AS (
      SELECT key, unnest(range(lo, hi + 1)) AS slot FROM spans
    ), joined AS (
      SELECT g.key, g.slot, p.v, coalesce(p.n_events, 0) AS n_events
      FROM grid g LEFT JOIN per_slot p ON g.key = p.key AND g.slot = p.slot
    )
    SELECT key,
           strftime(make_timestamp(slot * {RESAMPLE_STEP} * 1000000), '%Y-%m-%d %H:%M:%S') AS slot_ts,
           n_events,
           round(last_value(v IGNORE NULLS) OVER (
             PARTITION BY key ORDER BY slot
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS value,
           v IS NULL AS filled
    FROM joined
    ORDER BY key, slot_ts
"""


# --- OHLC downsampling (r7) ------------------------------------------


def q_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic time-series bar downsampling: per (event_type, day),
    open / high / low / close / count / decimal-exact volume. The
    open and close are the values at the (ts, event_id)-min/max rows
    — event_id breaks timestamp ties deterministically, so both
    engines pick the same row. One exchange on the (type, day) key
    serves both direction windows AND the final aggregate (the
    groupBy keys equal the window partition keys); volume accumulates
    in DECIMAL(28,8) (the anomalous_events discipline) before the
    single round."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    base = ev.withColumn("day", F.to_date("ts"))
    w_a = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w_d = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = base.withColumn("_ra", F.row_number().over(w_a)).withColumn(
        "_rd", F.row_number().over(w_d)
    )
    return (
        r.groupBy("event_type", "day")
        .agg(
            F.round(F.max(F.when(F.col("_ra") == 1, F.col("value"))), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max(F.when(F.col("_rd") == 1, F.col("value"))), 2).alias("close"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(28,8)")), 2)
            .cast("double")
            .alias("vol"),
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "open", "high", "low", "close", "n", "vol",
        )
        .orderBy("event_type", "day")
    )


QUERIES["ohlc_daily"] = q_ohlc_daily

ORACLE["ohlc_daily"] = """
    WITH r AS (
      SELECT event_type, CAST(ts AS DATE) AS day, value,
             row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                ORDER BY ts ASC, event_id ASC) AS ra,
             row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                ORDER BY ts DESC, event_id DESC) AS rd
      FROM events
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           round(max(CASE WHEN ra = 1 THEN value END), 2) AS open,
           round(max(value), 2) AS high,
           round(min(value), 2) AS low,
           round(max(CASE WHEN rd = 1 THEN value END), 2) AS close,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(28,8))), 2) AS DOUBLE) AS vol
    FROM r GROUP BY event_type, day
    ORDER BY event_type, day
"""


# --- exponential time-decay popularity (r8) ---------------------------

DECAY_SCALE = 1_000_000


def q_decayed_item_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed event popularity per type — the recency-
    weighted counter a trending/feed pipeline keeps (weight halves per
    day of age). Exactness design: ages are integer days against the
    corpus max day, and each event's weight is the INTEGER
    ``floor(1e6 / 2^age_days)`` — division by a power of two is exact
    in IEEE doubles and the floor lands both engines on the same
    integer, so the decayed sum is an exact BIGINT (no float-order
    drift, the dyadic-grid discipline of pagerank). Events older than
    19 days decay to weight 0 — stated contract. One scan, a 1-row
    broadcast anchor, one partial-agg groupBy; the anchor never
    collects to the driver."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("d")
    )
    anchor = ev.agg(F.max("d").alias("anchor"))
    return (
        ev.crossJoin(F.broadcast(anchor))
        .withColumn("age", F.datediff(F.col("anchor"), F.col("d")))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.lit(DECAY_SCALE) / F.pow(F.lit(2.0), F.col("age")))
            ).alias("decayed_ppm"),
            F.date_format(F.max("d"), "yyyy-MM-dd").alias("last_day"),
        )
        .orderBy("event_type")
    )


QUERIES["decayed_item_popularity"] = q_decayed_item_popularity

ORACLE["decayed_item_popularity"] = f"""
    WITH e AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             (SELECT max(CAST(ts AS DATE)) FROM events) AS anchor
      FROM events
    )
    SELECT event_type,
           count(*)::BIGINT AS n_events,
           sum(floor({DECAY_SCALE} / power(2.0, anchor - d)))::BIGINT
             AS decayed_ppm,
           strftime(max(d), '%Y-%m-%d') AS last_day
    FROM e GROUP BY event_type ORDER BY event_type
"""
