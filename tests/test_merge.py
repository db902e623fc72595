"""Upsert semantics: update-wins (including NULL values in updates),
inserts, passthrough, composite keys, schema validation."""

from __future__ import annotations

import pytest

from cli_rag_spark.operators.merge import upsert


def test_update_insert_passthrough(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, name string, v double"
    )
    got = {r.k: (r.name, r.v) for r in upsert(target, updates, "k").collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_update_null_value_wins(spark):
    target = spark.createDataFrame([(1, "a")], "k long, name string")
    updates = spark.createDataFrame([(1, None)], "k long, name string")
    got = upsert(target, updates, "k").collect()
    assert len(got) == 1 and got[0].name is None


def test_composite_key(spark):
    target = spark.createDataFrame([(1, 1, "x"), (1, 2, "y")], "a long, b long, v string")
    updates = spark.createDataFrame([(1, 2, "Y")], "a long, b long, v string")
    got = {(r.a, r.b): r.v for r in upsert(target, updates, ["a", "b"]).collect()}
    assert got == {(1, 1): "x", (1, 2): "Y"}


def test_schema_mismatch_raises(spark):
    target = spark.createDataFrame([(1, "a")], "k long, name string")
    updates = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="schemas differ"):
        upsert(target, updates, "k")
