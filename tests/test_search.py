"""BM25 + RRF sanity: term-frequency monotonicity, idf down-weighting,
length normalization, fusion ordering, error paths."""

from __future__ import annotations

import math

import pytest

from cli_rag_spark.operators.text_search import bm25_scores, bm25_topk, rrf_fuse


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tf_monotonic_and_missing_docs_excluded(spark):
    docs = _docs(spark, [(0, "cat cat cat dog"), (1, "cat dog"), (2, "fish fish")])
    s = {r.doc_id: r.score for r in bm25_scores(docs, ["cat"]).collect()}
    assert set(s) == {0, 1}  # doc 2 has no query term
    assert s[0] > s[1]


def test_idf_downweights_ubiquitous_terms(spark):
    # 'the' appears in all docs, 'rare' in one — same tf, rare must win
    docs = _docs(spark, [(0, "the rare"), (1, "the x"), (2, "the y"), (3, "the z")])
    s = {r.doc_id: r.score for r in bm25_scores(docs, ["the", "rare"]).collect()}
    the_only = s[1]
    assert s[0] > 2 * the_only  # rare's idf dominates
    # exact idf check for 'the': df=4, N=4 → ln(1 + 0.5/4.5)
    k1, b = 1.2, 0.75
    dl, avgdl = 2, 2.0
    expected_the = math.log(1 + 0.5 / 4.5) * (1 * (k1 + 1)) / (1 + k1 * (1 - b + b * dl / avgdl))
    assert abs(the_only - round(expected_the, 6)) < 1e-6


def test_length_normalization(spark):
    # same tf, longer doc scores lower
    docs = _docs(spark, [(0, "cat " + "pad " * 50), (1, "cat pad")])
    s = {r.doc_id: r.score for r in bm25_scores(docs, ["cat"]).collect()}
    assert s[1] > s[0]


def test_topk_rank_and_duplicate_query_terms(spark):
    docs = _docs(spark, [(0, "a b"), (1, "a a b"), (2, "c")])
    out = bm25_topk(docs, "a a b", 2).collect()
    assert [r.rank for r in out] == [1, 2]
    assert out[0].doc_id == 1  # higher tf wins


def test_rrf_both_lists_beat_one(spark):
    l1 = spark.createDataFrame([(0, 1), (1, 2)], "doc_id long, rank long")
    l2 = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank long")
    fused = {r.doc_id: (r.rrf_score, r.n_lists) for r in rrf_fuse([l1, l2]).collect()}
    assert fused[1][1] == 2 and fused[0][1] == 1 and fused[2][1] == 1
    assert fused[1][0] > fused[0][0] > fused[2][0]
    assert fused[1][0] == round(1 / 62 + 1 / 61, 6)


def test_error_paths(spark):
    docs = _docs(spark, [(0, "x")])
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(docs, [])
    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([])


def test_ngram_overlap_decontamination(spark):
    from cli_rag_spark.operators.dedup import ngram_overlap

    corpus = _docs(spark, [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "quick brown fox jumps over something else entirely"),
        (2, "completely unrelated text with no overlap at all"),
    ])
    probes = spark.createDataFrame(
        [(100, "brown fox jumps over the")], "probe_id long, probe_text string"
    )
    hits = {(r.probe_id, r.doc_id): r.n_shared for r in ngram_overlap(corpus, probes, n=5).collect()}
    # probe's 5-grams: {"brown fox jumps over the"} — only doc 0 has it
    assert hits == {(100, 0): 1}
    # 3-grams hit both docs 0 and 1, never doc 2
    hits3 = {(r.probe_id, r.doc_id): r.n_shared for r in ngram_overlap(corpus, probes, n=3).collect()}
    assert set(hits3) == {(100, 0), (100, 1)}
    assert hits3[(100, 0)] == 3  # all three 3-grams of the probe


def test_tfidf_identical_doc_scores_cosine_one(spark):
    """A verbatim copy of the query doc must rank first with cosine
    1.0; a vocabulary-disjoint doc must not appear at all."""
    from cli_rag_spark.operators.text_search import tfidf_cosine_topk

    rows = [
        (0, "alpha beta beta gamma"),
        (1, "alpha beta beta gamma"),      # identical -> cosine 1.0
        (2, "alpha gamma delta"),          # partial overlap
        (3, "zeta eta theta"),             # disjoint -> absent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in tfidf_cosine_topk(df, 0, 10).collect()}
    assert got[1].cosine == 1.0 and got[1].rank == 1
    assert 3 not in got
    assert 0.0 < got[2].cosine < 1.0


def test_tfidf_max_df_pruning(spark):
    """Terms above the df cutoff must not contribute: with 'common' in
    every doc and max_df_frac=0.5, similarity via 'common' alone
    disappears."""
    from cli_rag_spark.operators.text_search import tfidf_cosine_topk

    rows = [
        (0, "common rare1"),
        (1, "common rare1"),   # shares a rare term with 0
        (2, "common other"),   # shares only the pruned stopword
        (3, "common other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r.doc_id for r in tfidf_cosine_topk(df, 0, 10, max_df_frac=0.5).collect()}
    assert kept == {1}
