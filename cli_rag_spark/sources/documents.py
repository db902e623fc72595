"""E1 — document loading.

Reference: ``texts_from_files`` (load-texts.c:7-35) reads each file
fully into one C string; identity is array position; there is no
metadata. Spark-native: one row per file with explicit provenance
columns (the id the reference never had, SURVEY §1.4).

For the fixture tables the corpus is already parquet
(``documents.parquet``); the file loaders below cover the reference's
actual input mode (raw text files on disk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_documents(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Load a corpus as DF[doc_id, text, source, ...].

    fmt='parquet'  : fixture-style corpus table (expects doc_id/text).
    fmt='text'     : whole text files, one row per file (the
                     reference's mode, load-texts.c:7-35); doc_id is
                     assigned, source is the file path.
    fmt='binary'   : binaryFile source for opaque payloads (E11).
    """
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "text":
        df = spark.read.text(path, wholetext=True)
        return (
            df.select(
                F.col("value").alias("text"),
                F.input_file_name().alias("source"),
            )
            .withColumn("doc_id", F.monotonically_increasing_id())
            .select("doc_id", "text", "source")
        )
    if fmt == "binary":
        return spark.read.format("binaryFile").load(path).select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("content").alias("payload"),
            F.col("path").alias("source"),
            F.col("length").alias("n_bytes"),
            F.col("modificationTime").alias("modified_at"),
        )
    raise ValueError(f"unknown format {fmt!r}")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Fixture-table loader used by every ``queries()`` entry."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
