"""Column profiling (operators/profile.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cli_rag_spark.operators.profile import profile_columns


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        "x int, s string",
    )
    rows = {r["column"]: r for r in profile_columns(df).collect()}
    assert rows["x"]["n_rows"] == 4 and rows["s"]["n_rows"] == 4
    assert rows["x"]["n_nulls"] == 1 and rows["s"]["n_nulls"] == 1
    assert rows["x"]["n_distinct"] == 3  # NULL excluded
    assert rows["s"]["n_distinct"] == 2


def test_profile_column_subset_and_guard(spark):
    df = spark.createDataFrame([(1, "a")], "x int, s string")
    assert [r["column"] for r in profile_columns(df, ["s"]).collect()] == ["s"]
    with pytest.raises(ValueError, match="unknown columns"):
        profile_columns(df, ["nope"])


def test_profile_plan_has_no_expand(spark, sf_dir):
    # the one-pass N-distinct spelling plans an Expand that multiplies
    # every row xN; the per-column union must NOT
    from cli_rag_spark.sources.documents import load_table

    out = profile_columns(load_table(spark, sf_dir, "orders"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    # each branch scans exactly its own column (pruned reads)
    schemas = [seg.splitlines()[0] for seg in plan.split("ReadSchema: ")[1:]]
    assert len(schemas) == 6
    for s in schemas:
        assert s.count(":") == 1, f"unpruned scan: {s}"
