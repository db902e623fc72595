"""Training-data operators: split determinism/stability/distribution
and packing invariants (token conservation, contiguity, capacity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cli_rag_spark.operators.training import hash_split, pack_concat_chunks
from cli_rag_spark.sources.documents import load_table

FR = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_split_deterministic_and_stable_under_growth(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r.doc_id: r.split for r in hash_split(docs, "doc_id", FR).collect()}
    b = {r.doc_id: r.split for r in hash_split(docs, "doc_id", FR).collect()}
    assert a == b
    # stability: assignment on a SUBSET matches the full corpus
    sub = {r.doc_id: r.split for r in hash_split(docs.limit(100), "doc_id", FR).collect()}
    assert all(a[k] == v for k, v in sub.items())
    # different salt → different partition of ids
    c = {r.doc_id: r.split for r in hash_split(docs, "doc_id", FR, salt="other").collect()}
    assert a != c


def test_split_fractions_roughly_hold(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    counts = {
        r.split: r.n
        for r in hash_split(docs, "doc_id", FR).groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / n - 0.8) < 0.06
    assert abs(counts["val"] / n - 0.1) < 0.05


def test_split_validates_fractions(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.2})


def test_packing_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    cap = 512
    packed = pack_concat_chunks(docs, cap, shard_col="lang").collect()
    by_shard: dict = {}
    for r in packed:
        by_shard.setdefault(r.lang, []).append(r)
    assert len(by_shard) > 1
    for lang, rows in by_shard.items():
        # token conservation: every token lands in exactly one bin
        assert sum(r.bin_tokens for r in rows) == sum(
            r.n_tokens for r in {r.doc_id: r for r in rows}.values()
        )
        # bins are contiguous 0..max and every bin except the last is full
        per_bin: dict = {}
        for r in rows:
            per_bin[r.bin] = per_bin.get(r.bin, 0) + r.bin_tokens
        assert sorted(per_bin) == list(range(len(per_bin)))
        last = max(per_bin)
        assert all(v == cap for b, v in per_bin.items() if b != last)
        assert 0 < per_bin[last] <= cap
        # a doc's windows are consecutive
        spans: dict = {}
        for r in rows:
            spans.setdefault(r.doc_id, []).append(r.bin)
        for bins in spans.values():
            bins = sorted(bins)
            assert bins == list(range(bins[0], bins[-1] + 1))


def test_packing_rejects_bad_cap(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="cap"):
        pack_concat_chunks(docs, 0, shard_col="lang")


def test_dsir_weights_separate_target_from_offdomain(spark):
    """With disjoint vocabularies, target-domain docs must get positive
    importance weights and off-domain docs negative ones (Xie 2023
    semantics: log p_target - log p_raw)."""
    from pyspark.sql import functions as F

    from cli_rag_spark.functions.text import tokens
    from cli_rag_spark.operators.training import dsir_bucket, dsir_logratios

    rows = (
        [(i, "en", "alpha beta gamma delta " * 5) for i in range(10)]
        + [(i + 10, "xx", "omega psi chi phi " * 5) for i in range(10)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    tb = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("term")
    ).select("doc_id", "lang", dsir_bucket(F.col("term")).alias("b"))
    lr = dsir_logratios(tb, F.col("lang") == "en")
    wt = {
        r.doc_id: float(r.wt)
        for r in tb.groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(F.sum(F.col("n") * F.col("lr")).alias("wt"))
        .collect()
    }
    assert all(wt[i] > 0 for i in range(10))
    assert all(wt[i + 10] < 0 for i in range(10))


def test_token_budget_sample_contract(spark, sf_dir):
    """Greedy prefix semantics: preceding-kept tokens < budget for
    every kept row; the first excluded row per group would have
    crossed it; under-budget groups keep everything."""
    from cli_rag_spark.operators.training import token_budget_sample
    from cli_rag_spark.sources.documents import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    budget = 1500
    kept = token_budget_sample(docs, "source", "doc_id", budget, salt="t")
    rows = kept.groupBy("source").agg(
        F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("n")
    ).collect()
    # total per group may overshoot by at most the last doc; check via
    # per-row recompute: every kept row's cum-minus-self < budget
    import pandas as pd
    pdf = kept.select("source", "doc_id", "n_tokens").toPandas()
    import hashlib
    pdf["h"] = pdf["doc_id"].map(
        lambda i: hashlib.md5(f"t|{i}".encode()).hexdigest()
    )
    for src, grp in pdf.sort_values(["h", "doc_id"]).groupby("source"):
        cum = grp["n_tokens"].cumsum() - grp["n_tokens"]
        assert (cum < budget).all()
    # determinism: second run identical
    again = token_budget_sample(docs, "source", "doc_id", budget, salt="t")
    assert again.select("doc_id").subtract(kept.select("doc_id")).count() == 0
    assert kept.count() == again.count()


def test_token_budget_sample_under_budget_keeps_all(spark, sf_smoke_dir):
    from cli_rag_spark.operators.training import token_budget_sample
    from cli_rag_spark.sources.documents import load_table

    docs = load_table(spark, sf_smoke_dir, "documents")
    kept = token_budget_sample(docs, "source", "doc_id", 10_000_000)
    assert kept.count() == docs.count()


def test_token_budget_sample_validates(spark, sf_smoke_dir):
    import pytest as _pytest
    from cli_rag_spark.operators.training import token_budget_sample
    from cli_rag_spark.sources.documents import load_table

    docs = load_table(spark, sf_smoke_dir, "documents")
    with _pytest.raises(ValueError, match="budget"):
        token_budget_sample(docs, "source", "doc_id", 0)


def test_leakproof_split_no_cluster_straddles(spark, sf_dir):
    """Every connected component lands in exactly one split; singletons
    keep their own id as group; fractions roughly honored."""
    from pyspark.sql import functions as F
    from cli_rag_spark.operators.dedup import minhash_candidates
    from cli_rag_spark.operators.training import leakproof_split
    from cli_rag_spark.sources.documents import load_table

    docs = load_table(spark, sf_dir, "documents")
    edges = minhash_candidates(docs, shingle_words=3, n_hashes=8, n_bands=4)
    out = leakproof_split(
        docs, edges, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    # a group maps to exactly one split
    assert (
        out.groupBy("split_group")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
        == 0
    )
    # no candidate edge crosses splits
    a = out.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa"))
    b = out.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb"))
    crossed = edges.join(a, "id_a").join(b, "id_b").where(F.col("sa") != F.col("sb"))
    assert crossed.count() == 0
    # all docs assigned, each exactly once
    assert out.count() == docs.count()
    shares = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = docs.count()
    assert shares["train"] / n > 0.6  # hash noise tolerance at small N
