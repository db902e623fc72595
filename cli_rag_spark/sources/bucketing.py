"""Bucketed storage — co-located joins without a shuffle.

At 100 TB the dominant cost of the fact-to-fact joins
(lineitem→orders here; chunk-index→doc-metadata in the RAG domain) is
the shuffle. Pre-bucketing both sides on the join key hash-places
matching rows in the same bucket file, so Spark's sort-merge join
reads both sides bucket-by-bucket with **no Exchange in the plan** —
the join parallelizes bucket-wise across executors.

Rules encoded here:
* same n_buckets on both sides (or an integer multiple);
* bucket columns == join columns;
* `sortBy` the same key so the merge needs no per-bucket sort.

Bucketed tables must go through the catalog (``saveAsTable``) — plain
``parquet(path)`` writes lose the bucket spec. Pass ``path`` to keep
the data external (the catalog holds only metadata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains any Exchange (shuffle or
    broadcast-exchange is excluded — only shuffle exchanges count)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return any(
        line.strip().lstrip("+-: ").startswith("Exchange")
        for line in plan.splitlines()
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), on)
