"""Persisted derived-table artifacts (sources/artifacts.py) and the
shared trade-graph (plans/trade_graph.py): build-once/reuse semantics,
fingerprint invalidation, and equivalence to the direct derivation."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from cli_rag_spark.sources.artifacts import (
    persisted_artifact,
    table_files_fingerprint,
)


def _build_counter(spark, calls):
    def build():
        calls.append(1)
        return spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")

    return build


def test_persisted_artifact_builds_then_reuses(spark, tmp_path):
    path = str(tmp_path / "art")
    calls: list[int] = []
    fp = {"v": 1, "inputs": [["f", 10, 20]]}
    a = persisted_artifact(spark, path, fp, _build_counter(spark, calls))
    assert a.count() == 2 and calls == [1]
    # identical fingerprint: the parquet is read, build() never runs
    b = persisted_artifact(spark, path, fp, _build_counter(spark, calls))
    assert b.count() == 2 and calls == [1]
    # returned plan is a scan of the artifact, not the build lineage
    assert "parquet" in b._jdf.queryExecution().executedPlan().toString().lower()


def test_persisted_artifact_rebuilds_on_fingerprint_change(spark, tmp_path):
    path = str(tmp_path / "art")
    calls: list[int] = []
    persisted_artifact(spark, path, {"v": 1}, _build_counter(spark, calls))
    persisted_artifact(spark, path, {"v": 2}, _build_counter(spark, calls))
    assert calls == [1, 1]  # version bump invalidates
    # missing meta (e.g. crash between parquet and meta) => rebuild
    os.remove(f"{path}/_artifact_meta.json")
    persisted_artifact(spark, path, {"v": 2}, _build_counter(spark, calls))
    assert calls == [1, 1, 1]


def test_table_files_fingerprint_tracks_rewrites(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([(1,)], "x long").write.parquet(p)
    fp1 = table_files_fingerprint(spark, p)
    assert fp1 and all(len(e) == 3 for e in fp1)
    assert not any(e[0].startswith("_") for e in fp1)  # no _SUCCESS
    spark.createDataFrame([(1,), (2,)], "x long").write.mode(
        "overwrite"
    ).parquet(p)
    assert table_files_fingerprint(spark, p) != fp1
    with pytest.raises(ValueError, match="does not exist"):
        table_files_fingerprint(spark, str(tmp_path / "missing"))


def test_trade_pairs_matches_direct_derivation(spark, sf_dir):
    from cli_rag_spark.plans.trade_graph import trade_pairs
    from cli_rag_spark.sources.documents import load_table

    got = {
        (r["c_node"], r["s_node"]): r["w"]
        for r in trade_pairs(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    want = {
        (r["c"], r["s"]): r["w"]
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .collect()
    }
    assert got == want


def test_trade_edge_views_are_consistent(spark, sf_dir):
    from cli_rag_spark.plans.trade_graph import (
        trade_edges_bidir,
        trade_edges_bidir_int,
        trade_edges_directed,
        trade_pairs,
    )

    n_pairs = trade_pairs(spark, sf_dir).count()
    assert trade_edges_directed(spark, sf_dir).count() == n_pairs
    bidir = trade_edges_bidir(spark, sf_dir)
    assert bidir.count() == 2 * n_pairs
    assert dict(bidir.dtypes)["w"] == "double"
    assert dict(trade_edges_bidir_int(spark, sf_dir).dtypes)["w"] == "bigint"
    # second call hits the artifact: pure parquet scan, no join in plan
    plan = (
        trade_pairs(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
