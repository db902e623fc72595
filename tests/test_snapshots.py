"""Versioned snapshot tables (sources/snapshots.py): time travel,
bucket-level copy-on-write, merge semantics, commit protocol."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from cli_rag_spark.sources.documents import load_table
from cli_rag_spark.sources.snapshots import (
    latest_version,
    read_snapshot,
    upsert_snapshot,
    write_snapshot,
)


def _orders(spark, sf_dir, n=2000):
    return load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < n)


def key(df):
    return sorted(map(tuple, df.collect()))


def test_v1_roundtrip(spark, sf_dir, tmp_path):
    path = str(tmp_path / "snap")
    orders = _orders(spark, sf_dir)
    assert write_snapshot(orders, path, "o_orderkey") == 1
    assert latest_version(spark, path) == 1
    assert key(read_snapshot(spark, path)) == key(orders)


def test_upsert_merge_semantics_and_time_travel(spark, sf_dir, tmp_path):
    """Update wins on key match, inserts appear, untouched rows carry
    over — and version 1 still reads EXACTLY the original data."""
    path = str(tmp_path / "snap")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")

    updates = orders.where(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_orderstatus", F.lit("R")
    )
    inserts = orders.where(F.col("o_orderkey") % 501 == 5).withColumn(
        "o_orderkey", F.col("o_orderkey") + 1_000_000
    )
    batch = updates.unionByName(inserts)
    assert upsert_snapshot(spark, path, batch) == 2

    v2 = read_snapshot(spark, path, 2)
    expected = (
        orders.join(batch.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(batch)
        .select(*orders.columns)
    )
    assert key(v2) == key(expected)
    # time travel: v1 unchanged
    assert key(read_snapshot(spark, path, 1)) == key(orders)


def test_upsert_rewrites_only_touched_buckets(spark, sf_dir, tmp_path):
    """Copy-on-write claim: v2's data dir contains ONLY the buckets the
    update batch touched; v1 files are untouched and still referenced
    for every other bucket."""
    path = str(tmp_path / "snap")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")
    v1_files = set(glob.glob(f"{path}/data/v1/bucket=*/*.parquet"))

    one_key = orders.where(F.col("o_orderkey") == 42).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    upsert_snapshot(spark, path, one_key)
    assert set(glob.glob(f"{path}/data/v1/bucket=*/*.parquet")) == v1_files
    v2_buckets = {
        p.rsplit("bucket=", 1)[1].split("/")[0]
        for p in glob.glob(f"{path}/data/v2/bucket=*/*.parquet")
    }
    assert len(v2_buckets) == 1  # exactly the touched bucket
    # and the merged v2 read fixes the row
    got = read_snapshot(spark, path).where(F.col("o_orderkey") == 42).collect()
    assert len(got) == 1 and got[0]["o_totalprice"] == 1.0


def test_orphaned_data_dir_is_invisible(spark, sf_dir, tmp_path):
    """A crash between data write and manifest commit leaves an
    orphaned data/v2 that readers must ignore (manifest is the commit
    point)."""
    path = str(tmp_path / "snap")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")
    # simulate the crash: data for v2 exists, manifest was never written
    orders.limit(5).withColumn("bucket", F.lit(0)).write.partitionBy(
        "bucket"
    ).parquet(f"{path}/data/v2")
    assert latest_version(spark, path) == 1
    assert key(read_snapshot(spark, path)) == key(orders)


def test_schema_and_existence_validation(spark, sf_dir, tmp_path):
    path = str(tmp_path / "snap")
    orders = _orders(spark, sf_dir)
    with pytest.raises(ValueError, match="no snapshot table"):
        latest_version(spark, path)
    write_snapshot(orders, path, "o_orderkey")
    with pytest.raises(ValueError, match="no snapshot version 9"):
        read_snapshot(spark, path, 9)
    with pytest.raises(ValueError, match="columns"):
        upsert_snapshot(spark, path, orders.drop("o_orderpriority"))
    with pytest.raises(ValueError, match="bucket"):
        write_snapshot(orders.withColumn("bucket", F.lit(1)), path, "o_orderkey")
