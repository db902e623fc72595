"""Hive-style partitioned parquet layout — the on-disk organization a
100 TB corpus actually uses.

Partition columns become directory levels (`.../lang=en/...`); a query
filtering on them never opens the other directories (partition
pruning: `PartitionFilters` in the scan, zero IO for pruned
partitions). Rules encoded here:

* partition on low-cardinality, always-filtered columns (date, lang,
  source) — NEVER on high-cardinality keys (one directory per value);
* cap files per partition with a pre-write repartition on the
  partition columns, so a 1000-executor write doesn't emit
  1000 × n_partitions tiny files (the small-files problem);
* readers get pruning for free from Catalyst — `verify_pruned`
  asserts it, for tests and for plan audits at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet write with a bounded file count per value.

    ``files_per_partition=1``: hash-repartition on the partition
    columns — every partition value lands in exactly one task, so each
    directory gets ONE file, and parallelism stays at
    min(distinct values, spark.sql.shuffle.partitions) (a fixed
    numPartitions=1 would serialize the whole write through a single
    task at scale).

    ``files_per_partition=k>1``: for partition values too large for
    one task/file, shuffle on (cols + deterministic row-hash salt in
    [0,k)) so each value is split across exactly k writers → k files.
    The salt is xxhash64 over the row (not rand(): retried tasks must
    re-produce the same layout).
    """
    k = max(1, files_per_partition)
    if k == 1:
        out = df.repartition(*[F.col(c) for c in partition_cols])
    else:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(k))
        # explicit numPartitions: AQE's partition coalescing respects a
        # user-specified count but would otherwise merge this small
        # shuffle into one task and erase the salt split entirely
        n_shuffle = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        out = (
            df.withColumn("_fpp_salt", salt)
            .repartition(max(k, n_shuffle), *[F.col(c) for c in partition_cols], F.col("_fpp_salt"))
            .drop("_fpp_salt")
        )
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def scan_partition_filters(df: DataFrame) -> str:
    """The PartitionFilters clause(s) of the plan's file scans —
    empty string when no partition pruning applies."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = []
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            start = line.index("PartitionFilters: [")
            out.append(line[start : line.index("]", start) + 1])
    return "; ".join(out)


def verify_pruned(df: DataFrame, col: str) -> bool:
    """True iff the physical scan prunes partitions on ``col`` (the
    filter reached the directory listing, not just the row filter)."""
    filters = scan_partition_filters(df)
    return col in filters
