"""MMR rerank operator tests (operators/mmr.py)."""

from __future__ import annotations

import pytest

from cli_rag_spark.operators.mmr import mmr_rerank


def _cand_df(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, vec_id long, rel_sim double, embedding array<double>"
    )


class TestMmrRerank:
    def test_diversity_beats_redundancy(self, spark):
        # id 2 is nearly identical to id 1 (cos ~ 0.9998): plain top-2
        # would take (1, 2); MMR's similarity penalty makes the
        # orthogonal id 3 win step 2 despite its lower relevance.
        df = _cand_df(
            spark,
            [
                (0, 1, 0.98, [1.0, 0.0]),
                (0, 2, 0.96, [0.9998, 0.02]),
                (0, 3, 0.60, [0.0, 1.0]),
            ],
        )
        rows = mmr_rerank(df, select_k=2).orderBy("mmr_rank").collect()
        assert [(r["mmr_rank"], r["vec_id"]) for r in rows] == [(1, 1), (2, 3)]
        assert rows[0]["mmr_score"] == 0.49  # 0.5 * rel, empty-set penalty 0
        assert rows[1]["mmr_score"] == 0.3   # 0.5 * 0.60 - 0.5 * 0

    def test_penalty_is_max_over_selected(self, spark):
        # After picking 1 then 3, candidate 2's penalty is the MAX of
        # sim(2,1) ~ 1.0 and sim(2,3) ~ 0 — not the sum or the mean.
        df = _cand_df(
            spark,
            [
                (0, 1, 0.98, [1.0, 0.0]),
                (0, 2, 0.90, [1.0, 0.0]),
                (0, 3, 0.80, [0.0, 1.0]),
            ],
        )
        rows = mmr_rerank(df, select_k=3).orderBy("mmr_rank").collect()
        assert [r["vec_id"] for r in rows] == [1, 3, 2]
        # step 3: 0.5 * 0.90 - 0.5 * max(1.0, 0.0) = -0.05
        assert rows[2]["mmr_score"] == -0.05

    def test_tie_breaks_on_smaller_id(self, spark):
        df = _cand_df(
            spark,
            [
                (0, 7, 0.9, [1.0, 0.0]),
                (0, 5, 0.9, [0.0, 1.0]),
            ],
        )
        rows = mmr_rerank(df, select_k=1).collect()
        assert rows[0]["vec_id"] == 5

    def test_fewer_candidates_than_k(self, spark):
        df = _cand_df(spark, [(0, 1, 0.5, [1.0, 0.0]), (0, 2, 0.4, [0.0, 1.0])])
        rows = mmr_rerank(df, select_k=5).collect()
        assert len(rows) == 2
        assert sorted(r["mmr_rank"] for r in rows) == [1, 2]

    def test_groups_are_independent(self, spark):
        df = _cand_df(
            spark,
            [
                (0, 1, 0.9, [1.0, 0.0]),
                (0, 2, 0.8, [0.0, 1.0]),
                (1, 3, 0.7, [1.0, 0.0]),
                (1, 4, 0.6, [0.0, 1.0]),
            ],
        )
        rows = mmr_rerank(df, select_k=1).orderBy("query_id").collect()
        assert [(r["query_id"], r["vec_id"]) for r in rows] == [(0, 1), (1, 3)]

    def test_round_half_away_matches_sql_engines(self):
        from cli_rag_spark.operators.mmr import _round_half_away

        # exact half boundaries round AWAY from zero (SQL convention),
        # not to-even (Python's round)
        assert _round_half_away(0.1234565, 6) == 0.123457  # py round -> .123456
        assert _round_half_away(-0.1234565, 6) == -0.123457
        assert _round_half_away(0.1234564, 6) == 0.123456
        assert _round_half_away(0.49, 6) == 0.49
        assert _round_half_away(-0.05, 6) == -0.05

    def test_param_guards(self, spark):
        df = _cand_df(spark, [(0, 1, 0.5, [1.0])])
        with pytest.raises(ValueError, match="select_k"):
            mmr_rerank(df, select_k=0)
        with pytest.raises(ValueError, match="lambda"):
            mmr_rerank(df, select_k=1, lam=0.0)
        with pytest.raises(ValueError, match="lambda"):
            mmr_rerank(df, select_k=1, lam=1.5)


def _python_mmr_reference(cands, select_k, lam=0.5):
    """Brute greedy reference: cands = [(vec_id, rel, vec)] sorted any
    order; returns [(rank, vec_id)] with the operator's tie rule."""
    import numpy as np

    cands = sorted(cands)
    ids = [c[0] for c in cands]
    rel = np.array([c[1] for c in cands])
    V = np.stack([np.asarray(c[2], dtype=np.float64) for c in cands])
    norms = np.linalg.norm(V, axis=1)
    norms[norms == 0] = 1.0
    S = np.round((V @ V.T) / np.outer(norms, norms), 6)
    alive = [True] * len(ids)
    penalty = None
    out = []
    for rank in range(1, min(select_k, len(ids)) + 1):
        best, best_score = None, None
        for i in range(len(ids)):
            if not alive[i]:
                continue
            p = 0.0 if penalty is None else penalty[i]
            score = lam * rel[i] - (0.0 if penalty is None else (1 - lam) * p)
            if best is None or score > best_score:
                best, best_score = i, score
        out.append((rank, ids[best]))
        alive[best] = False
        col = S[:, best]
        penalty = col.copy() if penalty is None else np.maximum(penalty, col)
    return out


def test_mmr_matches_python_reference_on_random_data(spark):
    import random

    rng = random.Random(123)
    rows = []
    expected = {}
    for q in range(12):
        cands = []
        for i in range(rng.randint(3, 12)):
            vid = 100 * q + i
            vec = [rng.uniform(-1, 1) for _ in range(6)]
            rel = round(rng.uniform(0, 1), 6)
            cands.append((vid, rel, vec))
            rows.append((q, vid, rel, vec))
        expected[q] = _python_mmr_reference(cands, select_k=4)
    df = spark.createDataFrame(
        rows, "query_id long, vec_id long, rel_sim double, embedding array<double>"
    )
    got = {}
    for r in mmr_rerank(df, select_k=4).collect():
        got.setdefault(r["query_id"], []).append((r["mmr_rank"], r["vec_id"]))
    for q in expected:
        assert sorted(got[q]) == sorted(expected[q]), q
