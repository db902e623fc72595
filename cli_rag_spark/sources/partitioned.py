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


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    out = df.repartition(files_per_partition, *partition_cols)
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
