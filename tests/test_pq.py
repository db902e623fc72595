"""Product quantization (operators/pq.py): codebook shape, encode
semantics, ADC estimate quality, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from cli_rag_spark.operators.pq import (
    build_pq_codebook,
    l2_sq,
    pq_adc_scores,
    pq_encode,
)
from cli_rag_spark.sources.documents import load_table

M, KC = 4, 16


def test_codebook_shape(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cb = build_pq_codebook(emb, M, KC).collect()
    assert len(cb) == M * KC
    dim = len(emb.first().embedding)
    assert all(len(r.cvec) == dim // M for r in cb)
    assert {(r.m, r.code) for r in cb} == {(m, k) for m in range(M) for k in range(KC)}


def test_encode_codewords_are_fixed_points(spark, sf_dir):
    """A seed vector's sub-slices have distance 0 to their own
    codeword, so each seed must encode to its own id in every
    subspace (tie-break can't beat an exact zero)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cb = build_pq_codebook(emb, M, KC)
    codes = pq_encode(emb, cb, M)
    bad = codes.where(F.col("vec_id") < KC).where(F.col("vec_id") != F.col("code"))
    assert bad.count() == 0
    # every vector gets exactly M codes, all in [0, KC)
    stats = codes.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("code").alias("lo"),
        F.max("code").alias("hi"),
    )
    assert stats.where(
        (F.col("n") != M) | (F.col("lo") < 0) | (F.col("hi") >= KC)
    ).count() == 0


def test_adc_estimate_tracks_exact_distance(spark, sf_dir):
    """ADC is approximate — assert the rank correlation that makes it
    usable: the true nearest neighbor set is substantially recovered
    (recall@50 ≥ 0.3 with seeded codebooks; measured 0.42 at sf0.01)
    and the query vector itself lands in the ADC top set."""
    emb = load_table(spark, sf_dir, "embeddings")
    cb = build_pq_codebook(emb, M, KC)
    codes = pq_encode(emb, cb, M)
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("query_vec"))
    adc_top = [
        r.vec_id
        for r in pq_adc_scores(codes, cb, q, M)
        .orderBy("est_d2", "vec_id")
        .limit(50)
        .collect()
    ]
    exact_top = [
        r.vec_id
        for r in emb.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            l2_sq(
                F.col("embedding").cast("array<double>"),
                F.col("query_vec").cast("array<double>"),
            ).alias("d2"),
        )
        .orderBy("d2", "vec_id")
        .limit(50)
        .collect()
    ]
    assert 0 in adc_top
    assert len(set(adc_top) & set(exact_top)) >= 15


def test_encode_deterministic_across_partitionings(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cb = build_pq_codebook(emb, M, KC)
    a = sorted(
        (r.vec_id, r.m, r.code) for r in pq_encode(emb.repartition(3), cb, M).collect()
    )
    b = sorted(
        (r.vec_id, r.m, r.code) for r in pq_encode(emb.repartition(17), cb, M).collect()
    )
    assert a == b
