"""Small-file compaction: file-count policy, data preservation,
failure-safety of the write-then-swap, crash recovery, and the
partitioned-root guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cli_rag_spark.sources.compaction import compact_parquet, table_file_stats


def _fragmented(spark, tmp_path, n_files=40, rows=4000):
    path = os.path.join(str(tmp_path), "frag.parquet")
    df = spark.range(rows).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.sha2(F.col("id").cast("string"), 256).alias("payload")
    )
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return path, df


def test_compacts_to_byte_targeted_count(spark, tmp_path):
    path, df = _fragmented(spark, tmp_path)
    n_before, total = table_file_stats(spark, path)
    assert n_before == 40
    # target = half the table per file -> 2 files
    new_n = compact_parquet(spark, path, target_file_bytes=(total + 1) // 2)
    assert new_n == 2
    back = spark.read.parquet(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # no temp/backup dirs left behind
    siblings = os.listdir(str(tmp_path))
    assert not any("_compact" in s for s in siblings)


def test_noop_when_already_compact(spark, tmp_path):
    path, _ = _fragmented(spark, tmp_path, n_files=2)
    n, total = table_file_stats(spark, path)
    assert compact_parquet(spark, path, target_file_bytes=max(total // 2, 1)) == n


def test_shuffle_mode_rebalances(spark, tmp_path):
    path, df = _fragmented(spark, tmp_path)
    _, total = table_file_stats(spark, path)
    new_n = compact_parquet(spark, path, target_file_bytes=(total + 2) // 3, shuffle=True)
    assert new_n == 3
    back = spark.read.parquet(path)
    assert back.count() == df.count()


def test_bad_args(spark, tmp_path):
    with pytest.raises(ValueError, match="positive"):
        compact_parquet(spark, str(tmp_path), target_file_bytes=0)
    empty = os.path.join(str(tmp_path), "empty")
    os.makedirs(empty)
    with pytest.raises(ValueError, match="no parquet files"):
        compact_parquet(spark, empty)


def test_partitioned_root_rejected(spark, tmp_path):
    path = os.path.join(str(tmp_path), "part.parquet")
    spark.range(100).select(F.col("id"), (F.col("id") % 3).alias("k")) \
        .write.partitionBy("k").mode("overwrite").parquet(path)
    with pytest.raises(ValueError, match="partitioned"):
        compact_parquet(spark, path)
    # leaf partition dirs compact fine
    leaf = os.path.join(path, "k=0")
    assert compact_parquet(spark, leaf, target_file_bytes=1 << 30) >= 1


def test_crash_recovery_restores_table(spark, tmp_path):
    path, df = _fragmented(spark, tmp_path, n_files=6)
    # simulate a crash between the two swap renames: table moved
    # aside, new data never installed
    os.rename(path, path + "._compact_old")
    _, total = table_file_stats(spark, path + "._compact_old")
    new_n = compact_parquet(spark, path, target_file_bytes=total + 1)
    assert new_n == 1
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == sorted(map(tuple, df.collect()))


def test_stale_tmp_and_old_cleaned(spark, tmp_path):
    path, _ = _fragmented(spark, tmp_path, n_files=6)
    os.makedirs(path + "._compact_tmp")
    os.makedirs(path + "._compact_old")  # garbage: table still present
    _, total = table_file_stats(spark, path)
    compact_parquet(spark, path, target_file_bytes=total + 1)
    assert not os.path.exists(path + "._compact_tmp")
    assert not os.path.exists(path + "._compact_old")


def test_storage_query_guard_fires_on_file_increase(spark, sf_smoke_dir, monkeypatch):
    """The lossless-compaction integrity check in the judged storage
    query must raise a real exception (not a stripped-under-`-O`
    assert) when the file count goes the wrong way."""
    from cli_rag_spark.plans import queries_storage

    counts = iter([(3, 1000), (7, 1000)])  # before=3, after=7: corrupt
    monkeypatch.setattr(
        queries_storage, "table_file_stats", lambda *_: next(counts)
    )
    monkeypatch.setattr(
        queries_storage, "compact_parquet", lambda *a, **k: 1
    )
    with pytest.raises(RuntimeError, match="never add files"):
        queries_storage.q_partitioned_compaction(spark, sf_smoke_dir)
