"""Histogram-CDF exact quantiles (operators/quantiles.py): bucket
assignment, lower-median semantics, MAD outliers, tie behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cli_rag_spark.operators.quantiles import (
    exact_median,
    mad_outliers,
    quantile_buckets,
    value_histogram,
)


def _vals(spark, xs, col="x"):
    return spark.createDataFrame([(int(v),) for v in xs], f"{col} long")


def test_value_histogram_cdf(spark):
    df = _vals(spark, [5, 3, 3, 9, 3])
    rows = {
        r["v"]: (r["n"], r["cum"], r["cum_excl"], r["total"])
        for r in value_histogram(df, F.col("x")).collect()
    }
    assert rows == {3: (3, 3, 0, 5), 5: (1, 4, 3, 5), 9: (1, 5, 4, 5)}


def test_quantile_buckets_first_occurrence_rule(spark):
    # 10 values 0..9, k=5 -> buckets of 2
    df = _vals(spark, range(10))
    got = {r["x"]: r["bucket"] for r in quantile_buckets(df, F.col("x"), 5).collect()}
    assert got == {v: v // 2 for v in range(10)}


def test_quantile_buckets_ties_never_split(spark):
    # 8 copies of one value + 2 others, k=4: the tied block lands in
    # ONE bucket (its first occurrence's), later values in theirs
    df = _vals(spark, [7] * 8 + [9, 11])
    got = {(r["x"], r["bucket"]) for r in quantile_buckets(df, F.col("x"), 4).collect()}
    assert got == {(7, 0), (9, 3), (11, 3)}
    with pytest.raises(ValueError):
        quantile_buckets(df, F.col("x"), 0)


def test_exact_median_lower_semantics(spark):
    assert exact_median(_vals(spark, [1, 3, 5]), F.col("x")).first()["median"] == 3
    # even count: LOWER median
    assert exact_median(_vals(spark, [1, 3, 5, 7]), F.col("x")).first()["median"] == 3


def test_exact_median_grouped(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 9), ("a", 5), ("b", 2), ("b", 4)], "g string, x long"
    )
    got = {r["g"]: r["median"] for r in exact_median(df, F.col("x"), ["g"]).collect()}
    assert got == {"a": 5, "b": 2}


def test_mad_outliers_flags_and_degenerate_mad(spark):
    # group a: median 10, MAD 1 -> 100 is an outlier (dev 90 > 3)
    # group b: >half tied at 5 -> MAD 0 -> ANY deviation is an outlier
    df = spark.createDataFrame(
        [("a", 9), ("a", 10), ("a", 11), ("a", 100),
         ("b", 5), ("b", 5), ("b", 5), ("b", 6)],
        "g string, x long",
    )
    out = mad_outliers(df, F.col("x"), ["g"]).collect()
    flags = {(r["g"], r["x"]): r["is_outlier"] for r in out}
    assert flags[("a", 100)] is True
    assert flags[("a", 9)] is False and flags[("a", 11)] is False
    assert flags[("b", 6)] is True  # degenerate-MAD contract
    assert flags[("b", 5)] is False
    meds = {(r["g"]): (r["median"], r["mad"]) for r in out}
    assert meds["a"] == (10, 1)
    assert meds["b"] == (5, 0)


def test_quantile_buckets_partition_invariance(spark):
    # same buckets whatever the physical layout (exactness claim)
    df = _vals(spark, [4, 8, 8, 8, 15, 16, 23, 42])
    one = {(r["x"], r["bucket"]) for r in
           quantile_buckets(df.coalesce(1), F.col("x"), 4).collect()}
    many = {(r["x"], r["bucket"]) for r in
            quantile_buckets(df.repartition(16), F.col("x"), 4).collect()}
    assert one == many


def test_quantiles_differential_vs_python_reference(spark):
    # seeded random lists vs a pure-Python replay of the exact same
    # semantics (histogram CDF, first-occurrence buckets, lower median)
    import random

    rng = random.Random(8)
    for trial in range(5):
        xs = [rng.randrange(0, 50) for _ in range(rng.randrange(1, 200))]
        df = _vals(spark, xs)

        # reference: first-occurrence bucket per distinct value
        k = 7
        total = len(xs)
        ordered = sorted(xs)
        first_idx = {}
        for i, v in enumerate(ordered):
            first_idx.setdefault(v, i)
        ref_bucket = {v: (i * k) // total for v, i in first_idx.items()}
        got = {r["x"]: r["bucket"] for r in quantile_buckets(df, F.col("x"), k).collect()}
        assert got == ref_bucket, f"trial {trial}"

        # reference lower median: element at index ceil(n/2)-1
        ref_med = ordered[(total + 1) // 2 - 1]
        assert exact_median(df, F.col("x")).first()["median"] == ref_med, f"trial {trial}"


def test_null_measures_excluded_everywhere(spark):
    # NULLs sort differently in Spark (FIRST) vs DuckDB (LAST) windows,
    # so the operator excludes them outright — the one shared semantic
    df = spark.createDataFrame(
        [(1,), (None,), (3,), (None,), (5,)], "x int"
    )
    hist = value_histogram(df, F.col("x")).collect()
    assert {r["v"] for r in hist} == {1, 3, 5}
    assert all(r["total"] == 3 for r in hist)
    assert exact_median(df, F.col("x")).first()["median"] == 3
    got = quantile_buckets(df.withColumnRenamed("x", "y"), F.col("y"), 3)
    assert got.count() == 3  # null rows dropped, not bucketed


def test_reserved_column_guards(spark):
    df = spark.createDataFrame([(1, 2)], "x int, bucket int")
    with pytest.raises(ValueError, match="reserved"):
        quantile_buckets(df, F.col("x"), 2)
    df2 = spark.createDataFrame([(1, 2)], "x int, median int")
    with pytest.raises(ValueError, match="reserved"):
        mad_outliers(df2, F.col("x"))


def test_quantile_values_points_and_guards(spark):
    from cli_rag_spark.operators.quantiles import quantile_values

    df = _vals(spark, range(1, 11))  # 1..10
    row = quantile_values(df, F.col("x"), [100, 500, 900, 1000]).first()
    # smallest v with cum*1000 >= p*total: p100->1, p500->5, p900->9, p1000->10
    assert (row["p100"], row["p500"], row["p900"], row["p1000"]) == (1, 5, 9, 10)
    # consistency with exact_median at p=500
    assert row["p500"] == exact_median(df, F.col("x")).first()["median"]

    grouped = spark.createDataFrame(
        [("a", 1), ("a", 100), ("b", 7)], "g string, x long"
    )
    got = {r["g"]: (r["p500"], r["p900"]) for r in
           quantile_values(grouped, F.col("x"), [500, 900], ["g"]).collect()}
    assert got == {"a": (1, 100), "b": (7, 7)}

    with pytest.raises(ValueError, match="non-empty"):
        quantile_values(df, F.col("x"), [])
    with pytest.raises(ValueError, match="in \\(0, 1000\\]"):
        quantile_values(df, F.col("x"), [0, 1001])


def test_quantile_values_duplicate_and_group_collision_guards(spark):
    from cli_rag_spark.operators.quantiles import quantile_values

    df = _vals(spark, [1, 2, 3])
    with pytest.raises(ValueError, match="duplicate"):
        quantile_values(df, F.col("x"), [500, 500])
    collide = spark.createDataFrame([(1, 2)], "total long, x long")
    with pytest.raises(ValueError, match="collide"):
        quantile_values(collide, F.col("x"), [500], group_cols=["total"])


def test_mad_oracle_null_value_parity(spark, tmp_path):
    """ADVICE r8 medium: the mad_outlier_stats oracle must exclude NULL
    v from its histogram CTEs exactly like value_histogram does — the
    shipped events fixture has zero NULL values, so only a NULL-bearing
    fixture can prove the contract. Spark query and DuckDB oracle run
    side-by-side on the same parquet and must agree row-for-row."""
    import duckdb

    from cli_rag_spark.plans.queries_quantiles import (
        ORACLE,
        q_mad_outlier_stats,
    )

    rows = [
        ("a", 1.0), ("a", None), ("a", 2.0), ("a", 3.0), ("a", 100.0),
        ("b", None), ("b", 5.0), ("b", 5.0), ("b", 6.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, value double")
    path = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(path)

    got = [
        tuple(r)
        for r in q_mad_outlier_stats(spark, str(tmp_path)).collect()
    ]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM parquet_scan('{path}/*.parquet')"
    )
    want = con.execute(ORACLE["mad_outlier_stats"]).fetchall()
    assert got == want
    # hand-computed: NULLs counted in n_events but absent from medians
    # a: cents [100,200,300,10000] -> median 200, devs [0,100,100,9800]
    #    -> MAD 100, outliers dv>300 -> 1; n_events 5 (incl NULL row)
    # b: cents [500,500,600] -> median 500, MAD 0 (degenerate),
    #    outliers dv>0 -> 1; n_events 4 (incl NULL row)
    assert got == [("a", 5, 200, 100, 1), ("b", 4, 500, 0, 1)]
