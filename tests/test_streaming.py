"""Streaming operator tests (streaming/ops.py).

The judged parity of the single-file path is covered by the oracle
harness (plans/queries_streaming.py); here we exercise what that
can't: state continuation across MULTIPLE micro-batches — events are
re-written as several time-ordered files and streamed one file per
trigger, so sessions that span batch boundaries must be stitched by
the applyInPandasWithState state, and windowed counts must accumulate
incrementally.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cli_rag_spark.sources.documents import load_table
from cli_rag_spark.streaming import ops

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def split_events_dir(spark, tmp_path_factory):
    """events at sf0.001 re-laid-out as 3 time-ordered files."""
    import glob
    import shutil

    root = tmp_path_factory.mktemp("events_split")
    out = str(root / "data")
    scratch = str(root / "scratch")
    __import__("os").makedirs(out)
    ev = load_table(spark, SF_SMOKE, "events")
    bounds = ev.select(
        F.percentile_approx("ts", [1 / 3, 2 / 3], 10000).alias("b")
    ).collect()[0]["b"]
    parts = [
        ev.where(F.col("ts") <= bounds[0]),
        ev.where((F.col("ts") > bounds[0]) & (F.col("ts") <= bounds[1])),
        ev.where(F.col("ts") > bounds[1]),
    ]
    for i, part in enumerate(parts):
        part.coalesce(1).write.mode("overwrite").parquet(scratch)
        (src,) = glob.glob(f"{scratch}/part-*.parquet")
        # file-stream processes in discovery order; name by time order
        shutil.copy(src, f"{out}/batch_{i}.parquet")
    return out


def _batch_sessions(spark, events_df, gap_min):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > gap_min * 60 * 1_000_000), 1).otherwise(0)
    sess = events_df.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    agg = sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.round(
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 1_000_000.0, 3
        ).alias("duration_sec"),
        F.round(F.sum("value"), 2).alias("session_value"),
        F.max("ts").alias("_end"),
    )
    gmax = events_df.agg(F.max("ts").alias("gmax"))
    return (
        agg.crossJoin(gmax)
        .where(
            F.unix_micros(F.col("gmax")) - F.unix_micros(F.col("_end"))
            >= gap_min * 60 * 1_000_000
        )
        .drop("_end", "gmax")
    )


def test_multibatch_sessionization_matches_batch(spark, split_events_dir):
    """Sessions spanning micro-batch boundaries are stitched by state;
    the flushed set equals the batch closed-form (end + gap <= max ts)."""
    stream = ops.read_events_stream(spark, split_events_dir, max_files_per_trigger=1)
    streamed = ops.run_to_memory(ops.sessionize_stream(stream), "append")
    batch_ev = spark.read.parquet(split_events_dir)
    expected = _batch_sessions(spark, batch_ev, ops.SESSION_GAP_MIN)
    got = sorted(tuple(r) for r in streamed.collect())
    want = sorted(tuple(r) for r in expected.collect())
    assert len(got) > 0
    assert got == want


def test_multibatch_hourly_windows_match_batch(spark, split_events_dir):
    stream = ops.read_events_stream(spark, split_events_dir, max_files_per_trigger=1)
    streamed = ops.run_to_memory(ops.hourly_windows(stream), "complete")
    batch = (
        spark.read.parquet(split_events_dir)
        .groupBy(F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    got = sorted(tuple(r) for r in streamed.collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want


def test_single_file_stream_smoke(spark):
    stream = ops.read_events_stream(spark, f"{SF_SMOKE}/events.parquet")
    out = ops.run_to_memory(ops.hourly_windows(stream), "complete")
    assert out.count() > 0


def test_multibatch_dedup_keys(spark, split_events_dir):
    """Key fingerprints must persist across micro-batches: a key first
    seen in batch 0 must suppress batch 1/2 duplicates (watermark
    exceeds the fixture span, so nothing is evicted mid-run)."""
    stream = ops.read_events_stream(spark, split_events_dir, max_files_per_trigger=1)
    deduped = ops.dedup_stream(stream, ["user_id", "event_type"], watermark="35 days")
    got = ops.run_to_memory(deduped.select("user_id", "event_type"), "append")
    want = spark.read.parquet(split_events_dir).select("user_id", "event_type").distinct()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_multibatch_enrich_matches_batch_join(spark, split_events_dir):
    """Stream-static join across micro-batches equals the batch join."""
    from cli_rag_spark.sources.documents import load_table as lt

    dim = lt(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    stream = ops.read_events_stream(spark, split_events_dir, max_files_per_trigger=1)
    agg = ops.enrich_stream(stream, dim, "user_id").groupBy("c_mktsegment").count()
    got = sorted(map(tuple, ops.run_to_memory(agg, "complete").collect()))
    want = sorted(
        map(
            tuple,
            spark.read.parquet(split_events_dir)
            .join(dim, "user_id", "left_outer")
            .groupBy("c_mktsegment")
            .count()
            .collect(),
        )
    )
    assert got == want


def test_multibatch_interval_join_matches_batch(spark, split_events_dir):
    """Stream-stream interval join across micro-batches: a click in
    batch 0 must still match a purchase arriving in batch 1 (the
    buffered-state path), and the total emitted set must equal the
    batch inequality join."""

    def branch(event_type, key, idc, tsc):
        return (
            ops.read_events_stream(spark, split_events_dir, max_files_per_trigger=1)
            .where(F.col("event_type") == event_type)
            .select(
                F.col("user_id").alias(key),
                F.col("event_id").alias(idc),
                F.col("ts").alias(tsc),
            )
        )

    joined = ops.interval_join_stream(
        branch("click", "l_user_id", "click_id", "lts"),
        branch("purchase", "r_user_id", "purchase_id", "rts"),
        left_key="l_user_id", right_key="r_user_id",
        left_ts="lts", right_ts="rts",
        interval="30 minutes", watermark="35 days",
    ).select("l_user_id", "click_id", "purchase_id")
    got = sorted(map(tuple, ops.run_to_memory(joined, "append").collect()))

    ev = spark.read.parquet(split_events_dir)
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    want = sorted(
        map(
            tuple,
            c.join(p, "u")
            .where(
                (F.col("pts") >= F.col("cts"))
                & (F.col("pts") <= F.col("cts") + F.expr("interval 30 minutes"))
            )
            .select("u", "click_id", "purchase_id")
            .collect(),
        )
    )
    assert got and got == want


def test_upsert_totals_replay_is_idempotent(spark, sf_smoke_dir, tmp_path):
    """The ._last_batch marker must make re-delivered micro-batches
    no-ops: replaying the WHOLE stream against the committed table
    (fresh query, batch ids restart at 0 <= committed 3) leaves the
    totals byte-identical — the foreachBatch exactly-once contract."""
    import os

    from cli_rag_spark.sources.documents import load_table
    from cli_rag_spark.streaming.ops import read_events_stream, upsert_totals_stream

    src = os.path.join(str(tmp_path), "frag")
    load_table(spark, sf_smoke_dir, "events").repartition(4).write.parquet(src)
    table = os.path.join(str(tmp_path), "totals")

    first = upsert_totals_stream(
        spark, read_events_stream(spark, src, max_files_per_trigger=1), table
    )
    snap1 = sorted(map(tuple, first.collect()))
    # full replay: same source, same table, new query (batch ids 0..3)
    second = upsert_totals_stream(
        spark, read_events_stream(spark, src, max_files_per_trigger=1), table
    )
    snap2 = sorted(map(tuple, second.collect()))
    assert snap1 == snap2
    # and the totals equal the one-shot batch aggregate
    from pyspark.sql import functions as F

    batch = (
        load_table(spark, sf_smoke_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(28,6)")
            .alias("total_value"),
        )
    )
    assert snap1 == sorted(map(tuple, batch.collect()))


def test_minhash_ingest_equals_batch_and_replays_idempotently(spark, sf_dir, tmp_path):
    """4-batch streaming ingest accumulates EXACTLY the full-corpus
    candidate set; a full replay over the same source commits nothing
    twice (marker no-op)."""
    from pyspark.sql import functions as F

    from cli_rag_spark.operators.dedup import minhash_candidates
    from cli_rag_spark.sources.documents import load_table
    from cli_rag_spark.streaming.ops import minhash_ingest_stream, read_events_stream

    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "docs4")
    docs.repartition(4).write.parquet(src)
    state = str(tmp_path / "state")

    def run(cp):
        stream = read_events_stream(spark, src, max_files_per_trigger=1)
        return minhash_ingest_stream(spark, stream, state, checkpoint_dir=cp)

    got = run(str(tmp_path / "cp1"))
    expected = minhash_candidates(docs, shingle_words=3, n_hashes=8, n_bands=4)
    key = lambda df: sorted((r["id_a"], r["id_b"]) for r in df.collect())
    assert key(got) == key(expected)

    # fresh checkpoint renumbers batches from 0 -> every batch id is
    # <= marker -> full replay is a no-op, state unchanged
    again = run(str(tmp_path / "cp2"))
    assert key(again) == key(expected)


def test_multibatch_sliding_counts_match_batch(spark, split_events_dir):
    """Sliding-window counts accumulated across 3 micro-batches must
    equal the batch sliding aggregation (every event fans out to 6
    windows; overlapping-window state must survive batch cuts)."""
    stream = ops.read_events_stream(spark, split_events_dir, max_files_per_trigger=1)
    got = sorted(
        map(tuple, ops.run_to_memory(ops.sliding_type_counts(stream), "complete").collect())
    )
    ev = load_table(spark, SF_SMOKE, "events")
    want = sorted(
        map(
            tuple,
            ev.groupBy(F.window("ts", "6 hours", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
                "event_type",
                "n",
            )
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_multibatch_native_sessions_match_closed_form(spark, split_events_dir):
    """session_window state must merge sessions across micro-batch
    cuts; the emitted set is the closed form (last_ts + gap <= max ts,
    end-exclusive >= split boundary)."""
    stream = ops.read_events_stream(spark, split_events_dir, max_files_per_trigger=1)
    got = sorted(
        map(tuple, ops.run_to_memory(ops.native_sessions(stream), "append").collect())
    )
    ev = load_table(spark, SF_SMOKE, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = ops.SESSION_GAP_MIN * 60 * 1_000_000
    diff = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    sess = ev.withColumn(
        "seq",
        F.sum(F.when(diff.isNull() | (diff >= gap_us), 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    gmax = ev.agg(F.max("ts").alias("gmax"))
    want = sorted(
        map(
            tuple,
            sess.groupBy("user_id", "seq")
            .agg(
                F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("session_value"),
                F.max("ts").alias("last_ts"),
            )
            .crossJoin(F.broadcast(gmax))
            .where(F.unix_micros("gmax") - F.unix_micros("last_ts") >= gap_us)
            .select("user_id", "session_start", "n_events", "session_value")
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_multibatch_daily_counts_match_batch(spark, split_events_dir):
    # the CUSUM monitor's input table: stream-maintained daily rollup
    # across micro-batches == the batch rollup, exactly
    stream = ops.read_events_stream(spark, split_events_dir, max_files_per_trigger=1)
    streamed = ops.run_to_memory(ops.daily_type_counts(stream), "complete")
    batch = (
        spark.read.parquet(split_events_dir)
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    got = sorted(tuple(r) for r in streamed.collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want


def test_multibatch_quality_router_matches_batch(spark, sf_smoke_dir, tmp_path):
    # in-stream C4/Gopher gate across micro-batches == batch filter
    src = str(tmp_path / "docs_split")
    load_table(spark, sf_smoke_dir, "documents").repartition(4).write.parquet(src)
    stream = ops.read_events_stream(spark, src, max_files_per_trigger=1)
    streamed = ops.run_to_memory(ops.quality_router_stream(stream), "complete")
    from cli_rag_spark.functions.quality import with_quality_metrics

    m = with_quality_metrics(spark.read.parquet(src))
    batch = m.groupBy(
        "source", F.col("keep").cast("long").alias("accepted")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
    )
    got = sorted(tuple(r) for r in streamed.collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want and len(got) > 1
