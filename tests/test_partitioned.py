"""Partitioned layout: round-trip fidelity, partition pruning reaches
the scan (PartitionFilters), and file layout is bounded."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cli_rag_spark.sources.documents import load_table
from cli_rag_spark.sources.partitioned import (
    read_partitioned,
    scan_partition_filters,
    verify_pruned,
    write_partitioned,
)


def test_partitioned_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, ["lang"])

    back = read_partitioned(spark, path)
    assert back.count() == docs.count()
    # schema preserved (partition col read back as string is parquet-
    # hive convention; values must round-trip)
    langs = {r.lang for r in back.select("lang").distinct().collect()}
    assert langs == {r.lang for r in docs.select("lang").distinct().collect()}

    # a lang filter must become a PartitionFilter, not a row filter
    q = back.where(F.col("lang") == "en").select("doc_id")
    assert verify_pruned(q, "lang"), scan_partition_filters(q)

    # one directory per lang, bounded file count inside
    dirs = [d for d in os.listdir(path) if d.startswith("lang=")]
    assert len(dirs) == len(langs)
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1  # files_per_partition=1


def test_unpartitioned_scan_has_no_partition_filter(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").where(F.col("lang") == "en")
    assert not verify_pruned(docs, "lang")


def test_csv_corpus_roundtrip(spark, tmp_path):
    """CSV loader: quoted embedded newlines survive, ids cast/assigned."""
    import csv

    from cli_rag_spark.sources.documents import load_documents

    p = tmp_path / "docs.csv"
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["doc_id", "text"])
        w.writerow([0, "plain text"])
        w.writerow([1, "line one\nline two"])
    got = {r.doc_id: r.text for r in load_documents(spark, str(p), fmt="csv").collect()}
    assert got == {0: "plain text", 1: "line one\nline two"}


def test_write_partitioned_multi_file_fragmentation(spark, sf_dir, tmp_path):
    """files_per_partition=k>1 really fragments (up to k files per
    value, >1 for most) — the precondition for compaction to have
    something to do — and stays lossless."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    path = str(tmp_path / "ev_frag")
    write_partitioned(ev, path, ["day"], files_per_partition=4)
    per_day = []
    for d in os.listdir(path):
        if d.startswith("day="):
            per_day.append(len([f for f in os.listdir(os.path.join(path, d))
                                if f.endswith(".parquet")]))
    assert per_day and max(per_day) > 1 and max(per_day) <= 4
    assert read_partitioned(spark, path).count() == ev.count()


def test_partitioned_compaction_query_prunes(spark, sf_dir):
    """The judged storage query's day-slice must reach the directory
    listing as a PartitionFilter — 29 of 30 day dirs never opened."""
    from cli_rag_spark.plans.queries_storage import q_partitioned_compaction

    df = q_partitioned_compaction(spark, sf_dir)
    assert verify_pruned(df, "day"), scan_partition_filters(df)


def test_orc_loader_roundtrip(spark, tmp_path):
    from cli_rag_spark.sources.documents import load_documents

    df = spark.createDataFrame(
        [(1, "alpha", "en", 5), (2, "beta", "fr", 4), (3, "", "en", 0)],
        "doc_id long, text string, lang string, n_chars long",
    )
    p = str(tmp_path / "corpus_orc")
    df.write.orc(p)
    got = {r.doc_id: (r.text, r.lang, r.n_chars)
           for r in load_documents(spark, p, fmt="orc").collect()}
    assert got == {1: ("alpha", "en", 5), 2: ("beta", "fr", 4), 3: ("", "en", 0)}


def test_unknown_format_raises(spark):
    import pytest as _pytest

    from cli_rag_spark.sources.documents import load_documents

    with _pytest.raises(ValueError, match="unknown format"):
        load_documents(spark, "/nonexistent", fmt="avro")
