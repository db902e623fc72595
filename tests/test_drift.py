"""Two-sample KS drift (operators/drift.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cli_rag_spark.operators.drift import ks_statistic


def _ks(spark, a, b, **kw):
    rows = [(float(v), "a") for v in a] + [(float(v), "b") for v in b]
    df = spark.createDataFrame(rows, "v double, g string")
    out = ks_statistic(
        df, F.col("v"), F.col("g") == "a", F.col("g") == "b", **kw
    ).collect()[0]
    return out


def test_identical_populations_zero(spark):
    out = _ks(spark, [1, 2, 3, 4], [1, 2, 3, 4])
    assert out["ks_d"] == 0.0
    assert (out["n_a"], out["n_b"]) == (4, 4)


def test_disjoint_populations_one(spark):
    out = _ks(spark, [1, 2, 3], [10, 11])
    assert out["ks_d"] == 1.0
    assert out["ks_at"] == 3.0  # smallest value attaining the sup


def test_matches_scipy_definition(spark):
    rng = np.random.default_rng(7)
    a = rng.normal(0, 1, 200)
    b = rng.normal(0.5, 1, 150)
    out = _ks(spark, a, b)
    # hand ECDF sup-diff evaluated at pooled sample points
    pooled = np.sort(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), pooled, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), pooled, side="right") / len(b)
    assert abs(out["ks_d"] - np.max(np.abs(fa - fb))) < 1e-8


def test_round_digits_bins_values(spark):
    # with 0-digit binning 0.4 and 0.6 collapse away from each other:
    # a={0.4}, b={0.6} -> binned to {0,1}, still disjoint, D=1
    out = _ks(spark, [0.4], [0.6], round_digits=0)
    assert out["ks_d"] == 1.0 and out["ks_at"] == 0.0
    # same bin -> identical distributions
    out = _ks(spark, [0.44], [0.41], round_digits=1)
    assert out["ks_d"] == 0.0


def test_rows_outside_both_groups_ignored(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "b"), (9.0, "c")], "v double, g string"
    )
    out = ks_statistic(
        df, F.col("v"), F.col("g") == "a", F.col("g") == "b"
    ).collect()[0]
    assert (out["n_a"], out["n_b"]) == (1, 1)


def test_psi_identical_populations_is_near_zero(spark, sf_dir):
    from pyspark.sql import functions as F
    from cli_rag_spark.operators.drift import psi_statistic
    from cli_rag_spark.sources.documents import load_table

    docs = load_table(spark, sf_dir, "documents")
    # same population on both sides -> Laplace terms cancel exactly
    row = psi_statistic(
        docs, F.col("n_chars"), F.lit(True), F.lit(True), [100.0, 300.0]
    ).collect()[0]
    assert row.psi == 0.0 and row.n_a == row.n_b


def test_psi_detects_shift_and_validates(spark):
    import pytest
    from pyspark.sql import functions as F
    from cli_rag_spark.operators.drift import psi_statistic

    # population a sits below 10, b above 10 -> large PSI
    rows = [(float(i % 10), 1, 0) for i in range(100)] + [
        (float(10 + i % 10), 0, 1) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["v", "a", "b"])
    out = psi_statistic(
        df, F.col("v"), F.col("a") == 1, F.col("b") == 1, [5.0, 10.0, 15.0]
    ).collect()[0]
    assert out.psi > 1.0  # far beyond the 0.25 act threshold
    with pytest.raises(ValueError):
        psi_statistic(df, F.col("v"), F.col("a") == 1, F.col("b") == 1, [])
    with pytest.raises(ValueError):
        psi_statistic(df, F.col("v"), F.col("a") == 1, F.col("b") == 1, [5.0, 1.0])


def test_psi_null_values_excluded(spark):
    from pyspark.sql import functions as F
    from cli_rag_spark.operators.drift import psi_statistic

    rows = [(1.0, 1, 0), (None, 1, 0), (1.0, 0, 1), (None, 0, 1), (2.0, 0, 1)]
    df = spark.createDataFrame(rows, "v double, a int, b int")
    out = psi_statistic(df, F.col("v"), F.col("a") == 1, F.col("b") == 1, [1.5]).collect()[0]
    # nulls dropped on both sides: n_a=1, n_b=2, no phantom NULL bin
    assert (out.n_a, out.n_b) == (1, 2)
