"""Column profiling — the catalog-statistics pass a lakehouse runs
after ingest (null counts, exact distinct cardinalities).

Scale shape: one independent aggregate JOB per column, each a
SINGLE-COLUMN pruned parquet scan (columnar IO reads just that
column), unioned into the profile table. The tempting one-pass
spelling — one ``agg`` with N ``count(distinct ...)`` — plans as an
EXPAND that multiplies every row ×N before one giant shuffle (Spark's
multi-distinct rewrite), which is strictly worse than N pruned scans
at any scale where profiling matters; the per-column form also lets a
scheduler run the columns in parallel. Exact distinct is the point
(catalog stats feed optimizer estimates); the HLL sketch variant for
quick passes already exists (plans/queries_approx.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: ``column, n_rows, n_nulls, n_distinct``
    (distinct excludes NULLs — both engines' COUNT(DISTINCT)
    contract). Column order of the output follows ``cols``."""
    cols = cols or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    parts = [
        df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(c).isNull().cast("long")).alias("n_nulls"),
            F.count_distinct(F.col(c)).alias("n_distinct"),
        ).select(F.lit(c).alias("column"), "n_rows", "n_nulls", "n_distinct")
        for c in cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
