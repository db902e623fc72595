"""Events pack — time-series / log analytics over the ``events`` table.

Sessionization, tumbling windows, JSON extraction, running
aggregates: the window-function surface a telemetry pipeline needs.
(The reference's only "session state" is an in-RAM chat transcript,
multirag.c:303-304 — this is its batch analog, SURVEY §1.4.)

Timestamp outputs are always formatted strings; interval math uses
epoch-microsecond differences, which are timezone-shift-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cli_rag_spark.operators.skew import salted_aggregate, salted_topk_per_key
from cli_rag_spark.sources.documents import load_table

SESSION_GAP_MIN = 30


def q_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


def q_hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows (batch form of the streaming window op;
    streaming/ops.py reuses the same expression)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("hour")
    )


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (> 30 min starts a new session): lag →
    boundary flag → running count. Two window passes over the same
    (user_id, ts) partitioning — one shuffle, reused by both windows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), 1).otherwise(0)
    sessions = ev.withColumn("session_seq", F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ))
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.round((F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 1_000_000.0, 3).alias("duration_sec"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .orderBy("user_id", "session_seq")
    )


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction + distribution (get_json_object path)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select((k % 10).alias("k_mod"), "value")
        .groupBy("k_mod")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
        .orderBy("k_mod")
    )


def q_user_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user cumulative value (prefix sums are order-
    deterministic in both engines given the same ORDER BY)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 10)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    ).orderBy("user_id", "event_id")


def q_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view→click→purchase funnel per user via conditional aggregation
    (one shuffle; no self-joins)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "view").cast("int")).alias("has_view"),
        F.max((F.col("event_type") == "click").cast("int")).alias("has_click"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("has_purchase"),
    )
    return per_user.select(
        F.sum("has_view").alias("n_view"),
        F.sum(F.col("has_view") * F.col("has_click")).alias("n_view_click"),
        F.sum(F.col("has_view") * F.col("has_click") * F.col("has_purchase")).alias("n_full_funnel"),
    )


def q_ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel with TIME ORDER enforced (view strictly before click
    strictly before purchase) via conditional min-timestamp
    aggregation — still one shuffle, no self-joins, unlike the naive
    3-way join spelling."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    return per_user.select(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("t_view").isNotNull().cast("long")).alias("n_view"),
        F.sum(
            (F.col("t_view") < F.col("t_click")).cast("long")
        ).alias("n_view_then_click"),
        F.sum(
            ((F.col("t_view") < F.col("t_click")) & (F.col("t_click") < F.col("t_buy"))).cast("long")
        ).alias("n_full_ordered"),
    )


ROLLING_DAYS = 7


def q_rolling_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed rolling window (time-based, not row-based): each
    event's trailing 7-day value sum per user. The range frame is
    tie-safe by definition (all rows at equal ts are in-frame
    together), so no tiebreak column is needed for determinism."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 10)
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-ROLLING_DAYS * 86400 * 1_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("rolling_value"),
    ).orderBy("user_id", "event_id")


def q_salted_top_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k on the SKEW-PROOF physical path
    (operators/skew.py: per-(key, salt) top-k, then top-k over the
    k·n_salts survivors — a hot key's rows never land in one task).
    Result-identical to the plain window form, which is exactly what
    the oracle replays."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 30)
    out = salted_topk_per_key(
        ev,
        "user_id",
        [F.col("value").desc(), F.col("event_id").asc()],
        k=2,
    )
    return out.select(
        "user_id", "event_id", F.round("value", 4).alias("value"), F.col("rank").cast("long").alias("rank")
    ).orderBy("user_id", "rank")


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users grouped by first-seen week,
    counted distinct in each later week they were active. Two narrow
    aggregates + one broadcast-size join on user_id — the standard
    cohort shape with no event×event self-join."""
    ev = load_table(spark, sf_dir, "events")
    week = F.floor(F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01")) / 7).cast("long")
    first_week = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    active = ev.select("user_id", week.alias("week")).distinct()
    return (
        active.join(first_week, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("weeks_after"))
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "weeks_after")
    )


def q_salted_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user aggregates on the skew-proof TWO-PHASE path
    (operators/skew.py salted_aggregate: partial agg per (key, salt),
    then re-agg per key — a hot user's rows spread across n_salts
    tasks). Result-identical to the plain groupBy the oracle runs,
    including the decomposed average."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    out = salted_aggregate(
        ev,
        ["user_id"],
        {"n": ("count", "*"), "total": ("sum", "value"), "avg_v": ("avg", "value")},
    )
    return out.select(
        "user_id",
        F.col("n").cast("long").alias("n"),
        F.round("total", 2).alias("total"),
        F.round("avg_v", 4).alias("avg_v"),
    ).orderBy("user_id")


def q_session_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of R12 conversation accumulation (multirag.c:155-234):
    the reference appends (role, content) turns to an in-RAM transcript
    and renders them in order into one prompt string. Here each gap
    session is the conversation, each event a turn, and the rendered
    log is ``turn:role`` pieces joined in turn order.

    Physical shape: session assignment reuses the (user_id, ts)
    window partitioning; the per-session ordered render avoids a
    non-deterministic collect_list by aggregating structs and
    array_sort-ing on the turn number — one extra narrow shuffle on
    (user_id, session_seq), no driver-side accumulation."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), 1).otherwise(0)
    sessions = ev.withColumn("session_seq", F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ))
    w_turn = Window.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    turns = sessions.withColumn("turn_no", F.row_number().over(w_turn).cast("long"))
    return (
        turns.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_no", F.col("event_type").alias("role")))),
                    lambda x: F.concat_ws(":", x["turn_no"], x["role"]),
                ),
                " | ",
            ).alias("transcript"),
        )
        .orderBy("user_id", "session_seq")
    )


Z_THRESHOLD = 3.0


def q_anomalous_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score anomaly gate — the telemetry outlier pass
    ("which users produced events more than 3 sigma from their own
    value distribution?"). Two-pass exact moments, DETERMINISTICALLY:
    per-user sum(v) and sum(v^2) accumulate as DECIMAL(28,8) — exact,
    associative, partition-order-free (the
    returned_item_customers lesson) — then mean/variance/z are scalar
    IEEE doubles from those exact decimals, identical in both
    engines. One shuffle on user_id serves the moment aggregate; the
    flagging join broadcasts the per-user moment table back. Output:
    per user, event count, anomaly count, and the anomalous value sum
    (decimal-exact membership witness); users with no anomalies drop
    (the alert-table shape)."""
    ev = load_table(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(28,8)")
    moments = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(vdec).alias("s1"),
            F.sum(vdec * vdec).alias("s2"),
        )
        .where(F.col("n") >= 2)
    )
    mean = F.col("s1").cast("double") / F.col("n").cast("double")
    var = (
        F.col("s2").cast("double") / F.col("n").cast("double") - mean * mean
    )
    scored = (
        ev.join(F.broadcast(moments), "user_id")
        .withColumn("_z", (F.col("value") - mean) / F.sqrt(var))
        .where(F.abs(F.col("_z")) > Z_THRESHOLD)
    )
    return (
        scored.groupBy("user_id")
        .agg(
            F.max("n").alias("n_events"),
            F.count(F.lit(1)).alias("n_anomalies"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("anomaly_value_sum"),
        )
        .orderBy("user_id")
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior — the
    event-path analytics a product pipeline estimates ("what follows
    a click?"): per (prev_type, next_type) consecutive pair within a
    user's time-ordered stream, the transition count and probability.
    ONE shuffle on user_id serves the lag window; counts are exact
    longs and each probability is one integer division (identical
    IEEE in both engines), so the whole matrix value-replays. Rows
    ordered by prev, next."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("prev_type"),
            F.col("next_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # row totals as a window over the TINY counted matrix — a
    # groupBy+self-join would duplicate the event-stream lineage
    # (two user_id exchanges pre-AQE); this keeps exactly one
    row_w = Window.partitionBy("prev_type")
    return (
        pairs.withColumn("row_n", F.sum("n").over(row_w))
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("row_n").cast("double"), 6).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


QUERIES = {
    "anomalous_events": q_anomalous_events,
    "event_transitions": q_event_transitions,
    "event_type_stats": q_event_type_stats,
    "session_log": q_session_log,
    "retention_cohorts": q_retention_cohorts,
    "salted_user_totals": q_salted_user_totals,
    "ordered_funnel": q_ordered_funnel,
    "rolling_user_value": q_rolling_user_value,
    "salted_top_events": q_salted_top_events,
    "hourly_event_windows": q_hourly_event_windows,
    "sessionization": q_sessionization,
    "json_props": q_json_props,
    "user_running_value": q_user_running_value,
    "funnel_counts": q_funnel_counts,
}

ORACLE = {
    "event_transitions": """
        WITH pairs AS (
          SELECT event_type AS prev_type,
                 lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
          FROM events
        ), counted AS (
          SELECT prev_type, next_type, count(*)::BIGINT AS n
          FROM pairs WHERE next_type IS NOT NULL
          GROUP BY prev_type, next_type
        )
        SELECT prev_type, next_type, n,
               round(CAST(n AS DOUBLE)
                     / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6) AS p
        FROM counted
        ORDER BY prev_type, next_type
    """,
    "anomalous_events": f"""
        WITH moments AS (
          SELECT user_id, count(*) AS n,
                 sum(CAST(value AS DECIMAL(28,8))) AS s1,
                 sum(CAST(value AS DECIMAL(28,8)) * CAST(value AS DECIMAL(28,8))) AS s2
          FROM events GROUP BY user_id HAVING count(*) >= 2
        ), scored AS (
          SELECT e.user_id, e.value, m.n,
                 (e.value - CAST(m.s1 AS DOUBLE) / CAST(m.n AS DOUBLE))
                 / sqrt(CAST(m.s2 AS DOUBLE) / CAST(m.n AS DOUBLE)
                        - (CAST(m.s1 AS DOUBLE) / CAST(m.n AS DOUBLE))
                          * (CAST(m.s1 AS DOUBLE) / CAST(m.n AS DOUBLE))) AS z
          FROM events e JOIN moments m USING (user_id)
        )
        SELECT user_id,
               CAST(max(n) AS BIGINT) AS n_events,
               count(*) AS n_anomalies,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS anomaly_value_sum
        FROM scored WHERE abs(z) > {Z_THRESHOLD}
        GROUP BY user_id ORDER BY user_id
    """,
    "ordered_funnel": """
        WITH per_user AS (
          SELECT user_id,
                 min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                 min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                 min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
          FROM events GROUP BY user_id
        )
        SELECT count(*) AS n_users,
               CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
               CAST(sum(CASE WHEN t_view < t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_view_then_click,
               CAST(sum(CASE WHEN t_view < t_click AND t_click < t_buy THEN 1 ELSE 0 END) AS BIGINT) AS n_full_ordered
        FROM per_user
    """,
    "salted_user_totals": """
        SELECT user_id, count(*) AS n,
               round(sum(value), 2) AS total,
               round(avg(value), 4) AS avg_v
        FROM events WHERE user_id < 40
        GROUP BY user_id ORDER BY user_id
    """,
    "retention_cohorts": """
        WITH wk AS (
          SELECT user_id,
                 CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS BIGINT) AS week
          FROM events
        ), first_week AS (
          SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id
        ), active AS (
          SELECT DISTINCT user_id, week FROM wk
        )
        SELECT cohort_week, (week - cohort_week) AS weeks_after,
               count(DISTINCT a.user_id) AS n_users
        FROM active a JOIN first_week f USING (user_id)
        GROUP BY cohort_week, weeks_after
        ORDER BY cohort_week, weeks_after
    """,
    "salted_top_events": """
        SELECT user_id, event_id, round(value, 4) AS value, rank
        FROM (
          SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id ASC) AS rank
          FROM events WHERE user_id < 30
        )
        WHERE rank <= 2
        ORDER BY user_id, rank
    """,
    "rolling_user_value": f"""
        SELECT user_id, event_id,
               round(sum(value) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL {ROLLING_DAYS} DAYS PRECEDING AND CURRENT ROW
               ), 2) AS rolling_value
        FROM events WHERE user_id < 10
        ORDER BY user_id, event_id
    """,
    "event_type_stats": """
        SELECT event_type, count(*) AS n,
               round(sum(value), 2) AS total_value,
               round(avg(value), 4) AS avg_value,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "hourly_event_windows": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
               count(*) AS n, round(sum(value), 2) AS total_value
        FROM events GROUP BY 1 ORDER BY hour
    """,
    "sessionization": f"""
        WITH flagged AS (
          SELECT user_id, event_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts - lag(ts) OVER w) > {SESSION_GAP_MIN} * 60 * 1000000
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
          -- CAST: DuckDB types sum(int) OVER as HUGEINT (int128 -> float64 in
          -- pandas) while Spark emits int64; cast so the value-hash compares
          -- like-for-like (VERDICT r2 "What's wrong #1").
          SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
          FROM flagged
        )
        SELECT user_id, session_seq,
               count(*) AS n_events,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               round(epoch_us(max(ts) - min(ts)) / 1000000.0, 3) AS duration_sec,
               round(sum(value), 2) AS session_value
        FROM sess GROUP BY user_id, session_seq ORDER BY user_id, session_seq
    """,
    "session_log": f"""
        WITH flagged AS (
          SELECT user_id, event_id, ts, event_type,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts - lag(ts) OVER w) > {SESSION_GAP_MIN} * 60 * 1000000
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
          -- CAST: HUGEINT vs int64 hash artifact, see sessionization oracle.
          SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
          FROM flagged
        ), turns AS (
          SELECT user_id, session_seq, event_type,
                 row_number() OVER (PARTITION BY user_id, session_seq
                                    ORDER BY ts, event_id) AS turn_no
          FROM sess
        )
        SELECT user_id, session_seq, count(*) AS n_turns,
               string_agg(turn_no || ':' || event_type, ' | ' ORDER BY turn_no) AS transcript
        FROM turns GROUP BY user_id, session_seq ORDER BY user_id, session_seq
    """,
    "json_props": """
        SELECT json_extract_string(props, '$.k')::BIGINT % 10 AS k_mod,
               count(*) AS n, round(avg(value), 4) AS avg_value
        FROM events GROUP BY 1 ORDER BY k_mod
    """,
    "user_running_value": """
        SELECT user_id, event_id,
               round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING), 2) AS running_value
        FROM events WHERE user_id < 10 ORDER BY user_id, event_id
    """,
    "funnel_counts": """
        WITH per_user AS (
          SELECT user_id,
                 max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_view,
                 max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
          FROM events GROUP BY user_id
        )
        SELECT CAST(sum(has_view) AS BIGINT) AS n_view,
               CAST(sum(has_view * has_click) AS BIGINT) AS n_view_click,
               CAST(sum(has_view * has_click * has_purchase) AS BIGINT) AS n_full_funnel
        FROM per_user
    """,
}
