"""Portable hashing expressions for dedup (E8).

Design constraint: every hash used by a judged query must be
computable identically in Spark SQL and DuckDB SQL (the oracle), so
we build everything on **md5 hex strings** — both engines implement
RFC-1321 md5 — instead of engine-native hash() (Spark=murmur3,
DuckDB=own), which can never match.

* 60-bit integer hash: first 15 hex chars of md5 → BIGINT
  (Spark ``conv(...,16,10)``, DuckDB ``('0x'||...)::BIGINT``).
* MinHash: ``min(md5(seed || shingle))`` as a *string* min — md5 is a
  uniform permutation proxy, and lexicographic min over hex strings
  is order-isomorphic to min over the 128-bit integers. k independent
  permutations = k salts.
* SimHash: per-token 60-bit hash; for each of b bits, sum(±1) over
  tokens weighted by bit value; sign vector packed to a bit string.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_int60(c: Column) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def band_keys(signature: Column, n_bands: int, rows_per_band: int) -> Column:
    """LSH banding: array<struct<band:int, key:string>> where key is the
    md5 of the concatenated band slice. Explode + groupBy(band, key)
    yields candidate buckets with one narrow shuffle."""
    bands = []
    for b in range(n_bands):
        parts = [
            F.element_at(signature, b * rows_per_band + i + 1)
            for i in range(rows_per_band)
        ]
        key = F.md5(F.concat_ws("|", *parts))
        bands.append(F.struct(F.lit(b).alias("band"), key.alias("key")))
    return F.array(*bands)
