"""Upsert (merge) — apply a changeset to a keyed table.

The batch form of MERGE INTO for plain-parquet pipelines: matched
keys take the update row's values, unmatched update rows are inserts,
untouched target rows pass through. One full-outer equi-join on the
key — Catalyst broadcasts the changeset when it is small (the common
CDC case), otherwise a shuffled join that AQE skew-splits. Rewriting
the table (the parquet overwrite) is the caller's sink choice;
combined with sources/partitioned.py, only partitions containing
changed keys need rewriting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str | list[str],
) -> DataFrame:
    """Merged frame with the target's schema. ``updates`` must carry
    the same columns as ``target``; update rows win on key collision."""
    keys = [key] if isinstance(key, str) else list(key)
    if set(target.columns) != set(updates.columns):
        missing = set(target.columns) ^ set(updates.columns)
        raise ValueError(f"upsert: schemas differ on columns {sorted(missing)}")
    t = target.alias("t")
    u = updates.alias("u")
    cond = None
    for k in keys:
        c = F.col(f"t.{k}") == F.col(f"u.{k}")
        cond = c if cond is None else cond & c
    joined = t.join(u, cond, "full_outer")
    # row-level winner selection on key presence (NOT per-column
    # coalesce: an update row carrying a legitimate NULL value must
    # still win that column). Keys are non-null in updates by
    # contract, so a non-null u.key marks "update row present".
    matched = F.col(f"u.{keys[0]}").isNotNull()
    out = [
        F.when(matched, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in target.columns
    ]
    return joined.select(*out)
