"""Near-dup strategy auto-dispatch (operators/dedup.py, VERDICT r9
#7b) — the third dispatcher after fuzzy_join_auto (sampled gram
selectivity) and knn_join_auto (pure pair-ops arithmetic): the exact
all-pairs Jaccard path while the projected shingle self-join volume is
bounded, banded MinHash candidates past it."""

from __future__ import annotations

from pyspark.sql import functions as F

from cli_rag_spark.operators.dedup import (
    ALLPAIRS_MAX_JOIN_ROWS,
    choose_dedup_strategy,
    dedup_near,
    dedup_near_auto,
    jaccard_pairs,
)
from cli_rag_spark.sources.documents import load_table


def test_choose_allpairs_on_natural_text_fixture(spark, sf_dir):
    """sf0.01 documents: hapax-dominated trigram postings, small
    corpus — the projected join volume sits far under the cap."""
    docs = load_table(spark, sf_dir, "documents")
    assert choose_dedup_strategy(docs) == "allpairs"


def test_choose_minhash_on_posting_skew(spark):
    """A corpus whose sampled shingles are shared by EVERY doc (the
    stopword-shingle hazard): Σdf² alone exceeds the cap even before
    the (N/n)² projection — must route to banding."""
    n = 1500
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # identical docs: every shingle's sample df = n, sum_df2 = S*n^2
    assert choose_dedup_strategy(df) == "minhash"
    # and the full-corpus hint projects even a mild sample past the cap
    mild = spark.createDataFrame(rows[:50], "doc_id long, text string")
    assert (
        choose_dedup_strategy(mild, n_docs=ALLPAIRS_MAX_JOIN_ROWS) == "minhash"
    )


def test_choose_degenerate_inputs(spark):
    one = spark.createDataFrame([(1, "just one doc here")], "doc_id long, text string")
    assert choose_dedup_strategy(one) == "allpairs"
    # docs too short to emit a shingle: no posting evidence -> exact
    short = spark.createDataFrame([(1, "hi"), (2, "yo")], "doc_id long, text string")
    assert choose_dedup_strategy(short) == "allpairs"


def test_dedup_near_auto_allpairs_route_is_exact(spark):
    """On the exact route the survivor set equals the brute-force
    greedy rule applied to ALL verified pairs (no banding recall
    dependence): a planted near-dup pair below LSH's radar must still
    collapse."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base + " extra"),          # near-dup of 0
        (2, "completely different words in this text body entirely"),
        (3, base),                      # exact dup of 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert choose_dedup_strategy(df) == "allpairs"
    survivors = {r["doc_id"] for r in dedup_near_auto(df, threshold=0.5).collect()}
    verified = jaccard_pairs(df, pairs=None).where(F.col("jaccard") >= 0.5)
    drops = {r["id_b"] for r in verified.collect()}
    assert survivors == {0, 1, 2, 3} - drops
    assert 0 in survivors and 2 in survivors and 3 not in survivors


def test_dedup_near_auto_minhash_route_equals_dedup_near(spark, sf_dir):
    """Forcing the corpus-scale branch via the n_docs hint must yield
    exactly dedup_near's survivors (same banding, same verify, same
    greedy rule)."""
    docs = load_table(spark, sf_dir, "documents")
    auto = dedup_near_auto(docs, threshold=0.8, n_docs=10**9)
    direct = dedup_near(docs, threshold=0.8)
    assert {r["doc_id"] for r in auto.select("doc_id").collect()} == {
        r["doc_id"] for r in direct.select("doc_id").collect()
    }


def test_choose_strategy_short_doc_corpus_not_inflated(spark):
    """Second r10 review: shingle-less docs (titles, snippets) must
    count in the sampled population — otherwise the (N/n)² projection
    inflates quadratically and a small exact-path corpus flips to
    banding for no reason."""
    rows = [(i, "hi") for i in range(1900)] + [
        (1900 + i, f"unique words number {i} appear here in this longer text")
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # 100 shingled docs with near-hapax shingles: true volume is tiny;
    # the old estimator projected it x(2000/100)^2 = 400x
    assert choose_dedup_strategy(df) == "allpairs"


def test_build_ivf_index_trailing_slash_path(spark, sf_dir, tmp_path):
    """Second r10 review: a trailing slash must not place the staging
    INSIDE the index dir (where the pre-rename delete would destroy
    it)."""
    from cli_rag_spark.operators.ann import build_ivf_index, read_ivf_index
    from cli_rag_spark.sources.documents import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_slash") + "/"
    build_ivf_index(emb, path, n_centroids=4)
    idx = read_ivf_index(spark, str(tmp_path / "ivf_slash"), n_centroids=4)
    assert idx.count() == emb.count()


def test_choose_strategy_sample_not_head_biased(spark):
    """ADVICE r10: the 2000-doc probe must be REPRESENTATIVE, not the
    head of the first partitions — a corpus whose duplicate cluster
    lives entirely past the head (sorted/clustered input) must still
    route to banding. The hash-of-id filter samples every ~rate-th doc
    by content, so the tail cluster is seen."""
    uniq = [
        (i, f"totally unique words {i} alpha{i} beta{i} gamma{i} delta{i}")
        for i in range(3000)
    ]
    dup = [(3000 + i, "same stop words every single time here") for i in range(2000)]
    df = spark.createDataFrame(uniq + dup, "doc_id long, text string").coalesce(1)
    # head-2000 sampling would see ONLY hapax docs -> "allpairs" (and a
    # ~4e6-row misrouted self-join); the representative sample sees the
    # cluster's df ~ 2000/rate and projects past the cap
    assert choose_dedup_strategy(df) == "minhash"
    # deterministic: the hash draw does not depend on partitioning
    assert choose_dedup_strategy(df.repartition(7)) == "minhash"
