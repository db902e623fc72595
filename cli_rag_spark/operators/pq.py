"""Product quantization (Jégou, Douze, Schmid 2011) — the memory-side
ANN scale path, complementing IVF (list pruning) and int8 (uniform
scalar quantization, operators/quantize.py).

PQ splits each d-dim vector into ``m_subspaces`` contiguous
sub-vectors and replaces every sub-vector with the id of its nearest
codeword from a per-subspace codebook of ``k_codes`` entries. A
64-dim f32 vector (256 B) becomes 4 small ints (~4 B) — ~64×
compression — and query scoring never touches the original vectors:
Asymmetric Distance Computation (ADC) precomputes the M×K table of
(query sub-vector ↔ codeword) squared L2 distances once per query and
estimates each indexed vector's distance as the sum of M table
lookups.

Reference parity: the reference stores full f64 vectors and scans
them (vector-db.h:6, vector-db.c:148-177); PQ is the standard
published technique for the regime where the index no longer fits —
part of this repo's 100 TB mandate rather than a reference port.

Scale shapes:
* codebook: M×K rows, broadcast everywhere — never a shuffle side;
* encode: one explode to N·M sub-vector rows, broadcast-join the
  codebook, ``min_by`` argmin — the N·M·K candidate evaluations live
  inside one partial-aggregating stage (same shape as
  ann.assign_centroids); encode is the one-time index build;
* ADC scan: the codes table (N·M narrow int rows) broadcast-joins the
  M·K lookup table and sums — the per-query work is a map over codes,
  no vector arithmetic, no shuffle of embeddings;
* determinism: every distance is rounded to ``round_digits`` before
  any argmin/sum, ties broken by lowest code id — identical under any
  partition order and exactly replayable in the DuckDB oracle.

The seeded codebook (sub-slices of the ``k_codes`` lowest-id vectors)
is the SQL-replayable initializer, mirroring ann.seed_centroids; a
production build would Lloyd-refine each subspace codebook
(ann.kmeans_refine on the sub-vector frame) — the operators accept
any codebook DataFrame with columns (m, code, cvec).
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def l2_sq(a: Column, b: Column) -> Column:
    """Squared euclidean distance, summed left-to-right (the order the
    oracle's list_sum(list_transform(...)) replays)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _d_sub(vec: Column, m_subspaces: int) -> Column:
    return (F.size(vec) / m_subspaces).cast("int")


def build_pq_codebook(
    vectors: DataFrame,
    m_subspaces: int = 4,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """[m, code, cvec]: seeded per-subspace codebooks — the sub-slices
    of the ``k_codes`` lowest-id vectors (deterministic and
    oracle-replayable, like ann.seed_centroids)."""
    seeds = vectors.where(F.col(id_col) < k_codes).select(
        F.col(id_col).cast("long").alias("code"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    ds = _d_sub(F.col("_v"), m_subspaces)
    parts = [
        seeds.select(
            F.lit(m).alias("m"),
            "code",
            F.slice("_v", F.lit(m) * ds + 1, ds).alias("cvec"),
        )
        for m in range(m_subspaces)
    ]
    return functools.reduce(DataFrame.unionByName, parts)


def pq_encode(
    vectors: DataFrame,
    codebook: DataFrame,
    m_subspaces: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """[id_col, m, code]: each vector's per-subspace nearest codeword
    (squared L2, rounded, ties → lowest code)."""
    v = vectors.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    ds = _d_sub(F.col("_v"), m_subspaces)
    subs = v.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(m_subspaces - 1))).alias("m"),
        F.col("_v"),
    ).select(
        id_col, "m", F.slice("_v", F.col("m") * ds + 1, ds).alias("subvec")
    )
    scored = subs.join(F.broadcast(codebook), "m").withColumn(
        "_d", F.round(l2_sq(F.col("subvec"), F.col("cvec")), round_digits)
    )
    return scored.groupBy(id_col, "m").agg(
        F.min_by(F.col("code"), F.struct(F.col("_d"), F.col("code"))).alias("code")
    )


def pq_adc_scores(
    codes: DataFrame,
    codebook: DataFrame,
    query: DataFrame,
    m_subspaces: int = 4,
    id_col: str = "vec_id",
    query_col: str = "query_vec",
    round_digits: int = 6,
) -> DataFrame:
    """[id_col, est_d2]: ADC — estimated squared L2 of every encoded
    vector to the single-row ``query`` frame's vector.

    The M×K lookup table is built once (codebook × query, broadcast);
    the scan is codes ⋈ LUT + a sum — no embedding ever touches the
    query path."""
    ds = _d_sub(F.col(query_col).cast("array<double>"), m_subspaces)
    lut = (
        codebook.crossJoin(F.broadcast(query))
        .select(
            "m",
            "code",
            F.round(
                l2_sq(
                    F.col("cvec"),
                    F.slice(
                        F.col(query_col).cast("array<double>"),
                        F.col("m") * ds + 1,
                        ds,
                    ),
                ),
                round_digits,
            ).alias("d2"),
        )
    )
    return (
        codes.join(F.broadcast(lut), ["m", "code"])
        .groupBy(id_col)
        .agg(F.round(F.sum("d2"), round_digits).alias("est_d2"))
    )
