"""Small-file compaction — the 100 TB housekeeping operator.

Streaming sinks, per-partition writers, and incremental ingest all
fragment a table into many small files; at petabyte scale the task
scheduler and the object store both die by a thousand 2 MB cuts
(listing cost, per-file open overhead, tiny row groups that defeat
parquet statistics). Compaction rewrites a table into files near a
target size.

Policy encoded here:

* target file count = ceil(on-disk bytes / target_file_bytes),
  measured from the actual input files (not a row-count guess);
* ``coalesce`` by default — compaction is a pure narrow repack, no
  shuffle; pass ``shuffle=True`` to rebalance skewed inputs at the
  cost of one round-robin exchange (coalesce cannot SPLIT large
  input partitions, so badly skewed fragments keep their skew);
* write-then-swap: the compacted output lands in a sibling temp dir
  and replaces the input atomically-ish (rename) only after a
  successful write, so a failed compaction never corrupts the table.

Partitioned layouts (e.g. the IVF index's partitionBy(cid)) should
compact per partition directory — pass the leaf directory.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def table_file_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    shuffle: bool = False,
) -> int:
    """Rewrite the parquet directory at ``path`` into
    ceil(bytes / target_file_bytes) files. Returns the new file count.
    """
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")
    n_files, total_bytes = table_file_stats(path)
    if n_files == 0:
        raise ValueError(f"no parquet files under {path!r}")
    n_target = max(1, math.ceil(total_bytes / target_file_bytes))
    if n_target >= n_files:
        return n_files  # already at or below target granularity

    df: DataFrame = spark.read.parquet(path)
    df = df.repartition(n_target) if shuffle else df.coalesce(n_target)
    tmp = path.rstrip("/") + "._compact_tmp"
    df.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "._compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    new_n, _ = table_file_stats(path)
    return new_n
