"""BPE merge training (operators/bpe.py) on hand-checkable corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cli_rag_spark.operators.bpe import (
    bpe_train_merges,
    pair_counts,
    word_frequencies,
)


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_known_merge_sequence(spark):
    # 'aab' x3, 'ab' x2  ->  pairs: (a,a)=3, (a,b)=5  => merge1 = (a,b)
    # after merge: 'a|ab' x3, 'ab' x2 -> (a,ab)=3     => merge2 = (a,ab)
    docs = _docs(spark, ["aab aab ab", "aab ab"])
    merges, syms = bpe_train_merges(docs, n_merges=2)
    assert [(m["a"], m["b"], m["n"]) for m in merges] == [
        ("a", "b", 5),
        ("a", "ab", 3),
    ]
    final = {r["syms"] for r in syms.collect()}
    assert final == {"|aab|", "|ab|"}


def test_left_to_right_non_overlap(spark):
    # 'aaaa': pairs (a,a)=3 -> merge (a,a) applies L2R: aa, aa
    docs = _docs(spark, ["aaaa"])
    merges, syms = bpe_train_merges(docs, n_merges=1)
    assert (merges[0]["a"], merges[0]["b"], merges[0]["n"]) == ("a", "a", 3)
    assert [r["syms"] for r in syms.collect()] == ["|aa||aa|"]


def test_tie_breaks_lexicographic(spark):
    # 'ab' and 'cd' once each: (a,b)=1 and (c,d)=1 -> (a,b) wins
    docs = _docs(spark, ["ab cd"])
    merges, _ = bpe_train_merges(docs, n_merges=1)
    assert (merges[0]["a"], merges[0]["b"]) == ("a", "b")


def test_non_alpha_words_excluded(spark):
    wf = word_frequencies(_docs(spark, ["abc a1c ABC d-e |x|"]))
    words = {r["word"]: r["freq"] for r in wf.collect()}
    assert words == {"abc": 2}  # ABC lowercased; a1c/d-e/|x| dropped


def test_weighted_counts_use_word_freq(spark):
    docs = _docs(spark, ["xy xy xy", "xy"])
    wf = word_frequencies(docs)
    syms = wf.select(
        F.array_join(F.transform(F.split("word", ""), lambda c: F.concat(F.lit("|"), c, F.lit("|"))), "").alias("syms"),
        "freq",
    )
    counts = {(r["a"], r["b"]): r["n"] for r in pair_counts(syms).collect()}
    assert counts == {("x", "y"): 4}


def test_validates_n_merges(spark):
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train_merges(_docs(spark, ["ab"]), 0)


def test_bpe_encode_counts_matches_manual(spark):
    from pyspark.sql import functions as F
    from cli_rag_spark.operators.bpe import bpe_encode_counts, bpe_train_merges

    # corpus: "aaab aaab ab xyz" — merge 1 is (a,a); with 2 merges the
    # trainer picks a second pair; encode must reflect the rewrites
    docs = spark.createDataFrame(
        [(1, "aaab aaab ab"), (2, "xyz ab aaab")], ["doc_id", "text"]
    )
    merges, _ = bpe_train_merges(docs, n_merges=1)
    assert (merges[0]["a"], merges[0]["b"]) == ("a", "a")
    enc = {r.doc_id: (r.n_words, r.n_bpe_tokens) for r in bpe_encode_counts(docs, merges).collect()}
    # after (a,a)->aa: aaab = |aa||a||b| (3 syms, L2R non-overlap), ab = |a||b| (2), xyz = 3
    assert enc[1] == (3, 3 + 3 + 2)
    assert enc[2] == (3, 3 + 2 + 3)


def test_bpe_encode_empty_merges_is_char_count(spark):
    from cli_rag_spark.operators.bpe import bpe_encode_counts

    docs = spark.createDataFrame([(1, "abc de")], ["doc_id", "text"])
    enc = bpe_encode_counts(docs, []).collect()[0]
    assert (enc.n_words, enc.n_bpe_tokens) == (2, 5)


def test_bpe_encode_keeps_tokenless_rows(spark):
    from cli_rag_spark.operators.bpe import bpe_encode_counts

    docs = spark.createDataFrame(
        [(1, "abc de"), (2, "123 !!!"), (3, "")], ["doc_id", "text"]
    )
    enc = {r.doc_id: (r.n_words, r.n_bpe_tokens) for r in bpe_encode_counts(docs, []).collect()}
    assert enc == {1: (2, 5), 2: (0, 0), 3: (0, 0)}
