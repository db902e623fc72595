"""Portable hashing expressions for dedup (E8).

Design constraint: every hash used by a judged query must be
computable identically in Spark SQL and DuckDB SQL (the oracle), so
we build everything on **md5 hex strings** — both engines implement
RFC-1321 md5 — instead of engine-native hash() (Spark=murmur3,
DuckDB=own), which can never match.

* 60-bit integer hash: first 15 hex chars of md5 → BIGINT
  (Spark ``conv(...,16,10)``, DuckDB ``('0x'||...)::BIGINT``).
* MinHash: ONE 32-bit md5-derived base hash per shingle, then k
  *universal-hash* permutations ``(a_i·h + b_i) mod p`` (p = 2^61−1,
  a_i odd < 2^30, b_i < 2^30 — products stay < 2^62, exact in BIGINT
  on both engines). The textbook construction: k permutations for the
  price of one cryptographic hash, and the per-doc signature is k
  longs (64 B), not k hex strings (256 B), so the signature shuffle
  is 4× narrower. (Round 1 used k salted md5s — measured ~8× more
  hashing for identical candidate quality.)
* SimHash: per-token 60-bit hash; for each of b bits, sum(±1) over
  tokens weighted by bit value; sign vector packed to a bit string.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MINHASH_PRIME = (1 << 61) - 1


def md5_int60(c: Column) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def md5_int32(c: Column) -> Column:
    """First 32 bits of md5 as a non-negative BIGINT — small enough
    that a < 2^30 multiplier keeps products inside signed 64-bit."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def minhash_coeffs(n_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic (a_i, b_i) pairs for the universal-hash family:
    a odd (invertible mod 2^k) and both < 2^30. Literal ints so the
    oracle SQL embeds the exact same family."""
    a = [(_splitmix64(i) & ((1 << 30) - 1)) | 1 for i in range(n_hashes)]
    b = [_splitmix64(i + 1_000_003) & ((1 << 30) - 1) for i in range(n_hashes)]
    return a, b


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
