"""Salted (two-phase) aggregation must be result-identical to the
plain groupBy — only the physical shuffle shape differs."""

from __future__ import annotations

from pyspark.sql import functions as F

from cli_rag_spark.operators.skew import salted_aggregate, salted_topk_per_key
from cli_rag_spark.sources.documents import load_table


def test_salted_aggregate_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
        F.min("user_id").alias("min_u"),
        F.max("user_id").alias("max_u"),
        F.round(F.avg("value"), 6).alias("avg_v"),
    )
    salted = salted_aggregate(
        ev,
        ["event_type"],
        {
            "n": ("count", "*"),
            "total": ("sum", "value"),
            "min_u": ("min", "user_id"),
            "max_u": ("max", "user_id"),
            "avg_v": ("avg", "value"),
        },
        n_salts=8,
    ).select(
        "event_type", "n", F.round("total", 2).alias("total"),
        "min_u", "max_u", F.round("avg_v", 6).alias("avg_v"),
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


def test_salted_aggregate_on_skewed_key(spark):
    """90% of rows share one key — exactly the distribution the
    operator exists for; results must still be exact."""
    rows = [("hot", float(i)) for i in range(900)] + [
        (f"k{i}", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["key", "v"]).repartition(8)
    out = {
        r["key"]: (r["n"], r["total"])
        for r in salted_aggregate(
            df, ["key"], {"n": ("count", "*"), "total": ("sum", "v")}, n_salts=4
        ).collect()
    }
    assert out["hot"] == (900, sum(float(i) for i in range(900)))
    assert len(out) == 101


def test_salted_topk_matches_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    order = [F.col("value").desc(), F.col("event_id").asc()]
    salted = salted_topk_per_key(ev, "user_id", order, k=3, n_salts=4)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(*order)
    plain = (
        ev.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= 3)
    )
    a = sorted((r["user_id"], r["rank"], r["event_id"]) for r in plain.collect())
    b = sorted((r["user_id"], r["rank"], r["event_id"]) for r in salted.collect())
    assert a == b


def test_broadcast_head_join_equals_plain_inner_join(spark):
    """Hybrid head∪tail must be EXACTLY the inner join, including hot
    keys at the head/tail boundary and fact keys absent from dim."""
    from cli_rag_spark.operators.skew import broadcast_head_join

    # Zipf-ish dim: key k has weight 1000/k; fact references keys
    # 0..59 (dim only has 0..39 -> 20 fact keys dangle)
    dim = spark.range(40).select(
        F.col("id").alias("k"),
        (F.lit(1000) / (F.col("id") + 1)).cast("long").alias("w"),
    )
    fact = spark.range(600).select(
        (F.col("id") % 60).alias("k"), F.col("id").alias("payload")
    )
    got = broadcast_head_join(fact, dim, ["k"], "w", head_k=5)
    want = fact.join(dim, ["k"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # head and tail partition the dim: row counts add up exactly
    assert got.count() == 400 * 1  # 40 dim keys x 10 fact rows each


def test_broadcast_head_join_duplicate_keys_straddling_head(spark):
    """Head selection is per KEY, not per row: a key whose duplicate
    dim rows would straddle the head_k row cut must travel whole —
    the code-review counterexample (3 rows of key 0 vs head_k=2)."""
    from cli_rag_spark.operators.skew import broadcast_head_join

    dim = spark.createDataFrame(
        [(0, 10, "a"), (0, 10, "b"), (0, 10, "c"), (1, 5, "d"), (2, 1, "e")],
        "k long, w long, tag string",
    )
    fact = spark.createDataFrame([(0, 100), (1, 101), (2, 102)], "k long, payload long")
    got = broadcast_head_join(fact, dim, ["k"], "w", head_k=2)
    want = fact.join(dim, ["k"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() == 5
