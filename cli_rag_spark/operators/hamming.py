"""Binary (bit-packed) vectors + Hamming distance top-k.

The reference declares a ``BINARY_VECTOR`` type (vector-db.h:1, bit
packing at vector-db.c:58-60,111-113) but ships no producer and no
distance function for it — dead code (SURVEY §1.2). This module is
the live Spark-native version: signatures are packed into a single
LONG (≤64 bits), distance is ``bit_count(a XOR b)`` — both pure JVM
expressions inside whole-stage codegen, no arrays, no Python.

Scale notes: a 64-bit signature column is 8 bytes/row — a 100 TB
corpus's signature index is ~TB-scale and scan-speed bound; Hamming
top-k plans as TakeOrderedAndProject exactly like cosine top-k
(operators/topk.py). The signature producer here is SimHash over
tokens (same exploded-token/partial-aggregate shape as
dedup.simhash_groups: the per-token hash is computed once, in
codegen, and the n_bits bit-sums ride ONE shuffle on the doc id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cli_rag_spark.functions.hashing import md5_int60
from cli_rag_spark.functions.text import tokens


def simhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 16,
) -> DataFrame:
    """DF[id_col, sig: long] — SimHash packed into one long.

    Same bit semantics as dedup.simhash_groups (bit j of doc =
    majority sign of per-token hash bit j), packed positionally
    instead of keyed as a bit string."""
    if not 1 <= n_bits <= 63:
        raise ValueError("n_bits must be in [1, 63] to pack into a signed long")
    toks = df.select(F.col(id_col), F.explode_outer(tokens(F.col(text_col))).alias("_t"))
    hashed = toks.select(id_col, md5_int60(F.col("_t")).alias("_h"))
    sums = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.col("_h").isNull(), 0)
                .when(F.col("_h").bitwiseAND(F.lit(1 << j)) > 0, 1)
                .otherwise(-1)
            ).alias(f"_s{j}")
            for j in range(n_bits)
        ]
    )
    sig: Column = F.lit(0).cast("long")
    for j in range(n_bits):
        sig = sig + (F.col(f"_s{j}") > 0).cast("long") * F.lit(1 << j)
    return sums.select(F.col(id_col), sig.alias("sig"))


def hamming_distance(a: Column, b: Column) -> Column:
    """popcount(a XOR b) — the reference's missing BINARY_VECTOR
    distance, as a codegen-friendly builtin pair."""
    return F.bit_count(a.bitwiseXOR(b))


def hamming_topk(
    signatures: DataFrame,
    query_sig: Column,
    k: int,
    id_col: str = "doc_id",
    sig_col: str = "sig",
    dist_col: str = "hamming",
) -> DataFrame:
    """Top-k nearest signatures by Hamming distance; deterministic
    ties on (distance, id). Plans as TakeOrderedAndProject — no full
    sort, no shuffle beyond the scan (same physical shape as the
    cosine top-k, BENCH.md plan audit)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    return (
        signatures.select(
            F.col(id_col),
            hamming_distance(F.col(sig_col), query_sig).cast("int").alias(dist_col),
        )
        .orderBy(F.col(dist_col).asc(), F.col(id_col).asc())
        .limit(k)
    )
