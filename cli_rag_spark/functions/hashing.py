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


def minhash_value(shingles: Column, seed: int) -> Column:
    """min over shingles of md5(seed||shingle); NULL for empty input."""
    hashed = F.transform(shingles, lambda s: F.md5(F.concat(F.lit(str(seed) + "|"), s)))
    return F.array_min(hashed)


def minhash_signature(shingles: Column, n_hashes: int) -> Column:
    """Array of n_hashes string minhashes (seeds 0..n-1)."""
    return F.array(*[minhash_value(shingles, seed) for seed in range(n_hashes)])


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


def _simhash_bit_cols(toks: Column, n_bits: int) -> list[Column]:
    """bit_j = 1 iff sum over tokens of (bit_j(md5_int60(token)) ? +1 : -1) > 0.

    One aggregate() pass per bit; n_bits is kept small (16) because
    each bit is an array aggregate.
    """
    bits = []
    for j in range(n_bits):
        contrib = lambda t, j=j: (  # noqa: E731
            F.when(F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")
                   .bitwiseAND(F.lit(1 << j)) > 0, 1).otherwise(-1)
        )
        total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + contrib(t))
        bits.append((total > 0).cast("int"))
    return bits


def simhash_bits(toks: Column, n_bits: int = 16) -> Column:
    """SimHash over a token array: array of n_bits sign bits (0/1)."""
    return F.array(*_simhash_bit_cols(toks, n_bits))


def simhash_str(toks: Column, n_bits: int = 16) -> Column:
    """SimHash packed as a '0101...' string key (joinable/groupable)."""
    return F.concat_ws("", *[b.cast("string") for b in _simhash_bit_cols(toks, n_bits)])
