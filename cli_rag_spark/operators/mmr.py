"""Maximal Marginal Relevance rerank — diversity-aware shortlist
selection for context assembly.

The reference stuffs the raw top-k into the prompt best-first
(multirag.c:115-119): k near-identical chunks burn the whole context
budget on one fact. MMR (Carbonell & Goldstein 1998) is the public
fix: greedily pick the candidate maximizing
``lambda * rel(c) - (1 - lambda) * max_{s in S} sim(c, s)`` — relevance
to the query, penalized by similarity to what's already selected — so
the assembled context covers k *distinct* aspects.

Physical shape (the 100 TB story): MMR is O(k·m·d) per query over an
m-row SHORTLIST that an ANN stage (operators/ann.py, knn.py) already
bounded — the expensive distributed work is upstream. Here the
shortlist rows shuffle ONCE on query_id into
``groupBy(query_id).applyInPandas`` and the greedy loop runs
Arrow-batched per group: linear in queries, embarrassingly parallel,
no iteration-per-selection jobs (a driver-side loop would pay the
~0.3 s job floor k times; this pays it once). Selection compares on
raw float64 scores built from 6-digit-rounded similarity inputs —
identical arithmetic to the SQL oracle's chained greedy CTEs, so the
whole selection value-replays.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def _round_half_away(x: float, digits: int) -> float:
    """round() the way the SQL engines do — half AWAY from zero on
    ``x * 10^digits`` (DuckDB's std::round path) — instead of
    Python's round-half-to-even: a score landing exactly on a
    half-ulp boundary (e.g. 0.5 * rel with rel at 6 digits) flips
    the last digit between the two conventions and fails the value
    hash. floor + exact-diff comparison replicates std::round's
    half-away semantics without the y + 0.5 addition (which can
    itself round across the boundary in binary)."""
    import math

    y = x * (10.0**digits)
    f = math.floor(y)
    diff = y - f  # exact for |y| < 2^52
    if diff > 0.5 or (diff == 0.5 and y > 0):
        f += 1
    return f / (10.0**digits)


def mmr_rerank(
    candidates: DataFrame,
    select_k: int,
    lam: float = 0.5,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rel_col: str = "rel_sim",
    round_digits: int = 6,
) -> DataFrame:
    """Greedy MMR selection per query.

    ``candidates``: DF[query_col, id_col, rel_col, vec_col] — the
    per-query shortlist with ``rel_col`` a SIMILARITY (higher =
    better, e.g. ``1 - dist`` from a kNN stage). Returns
    DF[query_col, mmr_rank, id_col, mmr_score] with mmr_rank
    1..min(select_k, m):

    * rank 1 maximizes ``lam * rel`` alone (no penalty term — the
      standard empty-set convention);
    * rank t>1 maximizes ``lam * rel - (1-lam) * max sim`` to the
      already-selected set, pairwise sim = cosine rounded to
      ``round_digits``; the max is the TRUE max over selected sims
      (a negative max legitimately boosts an anti-correlated
      candidate — it is not clamped at 0);
    * ties break on the smaller id (candidates are scanned in id
      order and argmax keeps the first maximum), matching the SQL
      replay's ``ORDER BY score DESC, id ASC``.

    ``mmr_score`` is the winning raw score rounded to
    ``round_digits``; comparisons use the raw value.
    """
    if select_k < 1:
        raise ValueError(f"select_k must be >= 1, got {select_k}")
    if not 0.0 < lam <= 1.0:
        raise ValueError(f"lambda must be in (0, 1], got {lam}")
    from cli_rag_spark.deploy import ensure_package_on_executors

    ensure_package_on_executors(candidates.sparkSession)
    q_field = candidates.schema[query_col]
    i_field = candidates.schema[id_col]
    out_schema = StructType(
        [
            StructField(query_col, q_field.dataType),
            StructField("mmr_rank", LongType()),
            StructField(id_col, i_field.dataType),
            StructField("mmr_score", DoubleType()),
        ]
    )

    def select_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        m = len(pdf)
        vecs = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0.0] = 1.0
        sims = np.round((vecs @ vecs.T) / np.outer(norms, norms), round_digits)
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        ids = pdf[id_col].to_numpy()
        qid = pdf[query_col].iloc[0]
        penalty = None  # empty selected set: rank 1 scores lam*rel alone
        alive = np.ones(m, dtype=bool)
        out = []
        for rank in range(1, min(select_k, m) + 1):
            if penalty is None:
                score = lam * rel
            else:
                score = lam * rel - (1.0 - lam) * penalty
            score[~alive] = -np.inf
            best = int(np.argmax(score))  # first max = smallest id
            out.append(
                (qid, rank, ids[best], _round_half_away(float(score[best]), round_digits))
            )
            alive[best] = False
            col = sims[:, best]
            penalty = col.copy() if penalty is None else np.maximum(penalty, col)
        return pd.DataFrame(out, columns=[query_col, "mmr_rank", id_col, "mmr_score"])

    return candidates.groupBy(query_col).applyInPandas(select_group, schema=out_schema)


def mmr_oracle_sql(
    cand_cte: str,
    emb_table: str,
    select_k: int,
    lam: float = 0.5,
    round_digits: int = 6,
) -> str:
    """The DuckDB replay of :func:`mmr_rerank`, generated for a fixed
    ``select_k`` as chained greedy CTEs (step t's argmax anti-joins
    the union of steps 1..t-1 — greedy selection is inherently
    sequential, and a fixed-k chain is the faithful SQL spelling).

    ``cand_cte`` must be a complete CTE body yielding
    ``cand(query_id, vec_id, rel)`` with rel the rounded similarity;
    ``emb_table`` provides (vec_id, embedding) for the pairwise sims.
    Score arithmetic mirrors the operator exactly: comparisons on the
    raw ``lam*rel - (1-lam)*max(sim)`` double, emitted score rounded.
    """
    pair = f"""
        pair AS (
            SELECT a.query_id, a.vec_id AS ca, b.vec_id AS cb,
                   round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                                eb.embedding::DOUBLE[]),
                         {round_digits}) AS sim
            FROM cand a
            JOIN cand b ON a.query_id = b.query_id AND a.vec_id <> b.vec_id
            JOIN {emb_table} ea ON ea.vec_id = a.vec_id
            JOIN {emb_table} eb ON eb.vec_id = b.vec_id
        )"""
    steps = [
        f"""
        s1 AS (
            SELECT query_id, CAST(1 AS BIGINT) AS mmr_rank, vec_id,
                   round({lam} * rel, {round_digits}) AS mmr_score
            FROM (
                SELECT query_id, vec_id, rel,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY {lam} * rel DESC, vec_id ASC
                       ) AS rn
                FROM cand
            ) WHERE rn = 1
        ),
        sel1 AS (SELECT query_id, vec_id FROM s1)"""
    ]
    for t in range(2, select_k + 1):
        steps.append(f"""
        s{t} AS (
            SELECT query_id, CAST({t} AS BIGINT) AS mmr_rank, vec_id,
                   round(raw_score, {round_digits}) AS mmr_score
            FROM (
                SELECT c.query_id, c.vec_id,
                       {lam} * c.rel - {1.0 - lam} * max(p.sim) AS raw_score,
                       row_number() OVER (
                           PARTITION BY c.query_id
                           ORDER BY {lam} * c.rel - {1.0 - lam} * max(p.sim) DESC,
                                    c.vec_id ASC
                       ) AS rn
                FROM cand c
                JOIN pair p ON p.query_id = c.query_id AND p.ca = c.vec_id
                JOIN sel{t - 1} s ON s.query_id = p.query_id AND s.vec_id = p.cb
                WHERE NOT EXISTS (
                    SELECT 1 FROM sel{t - 1} d
                    WHERE d.query_id = c.query_id AND d.vec_id = c.vec_id
                )
                GROUP BY c.query_id, c.vec_id, c.rel
            ) WHERE rn = 1
        ),
        sel{t} AS (SELECT query_id, vec_id FROM sel{t - 1}
                   UNION ALL SELECT query_id, vec_id FROM s{t})""")
    union = "\n            UNION ALL ".join(
        f"SELECT * FROM s{t}" for t in range(1, select_k + 1)
    )
    return f"""
        WITH {cand_cte},
        {pair},
        {",".join(steps)}
        SELECT query_id, mmr_rank, vec_id, mmr_score
        FROM ({union})
        ORDER BY query_id, mmr_rank
    """
