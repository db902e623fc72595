"""Int8 quantization: reconstruction bound, schema, zero vectors, and
top-k recall vs the exact index."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, ByteType

from cli_rag_spark.functions.vectors import cosine_distance
from cli_rag_spark.operators.quantize import dequantize, quantize_int8
from cli_rag_spark.sources.documents import load_table


def test_schema_and_reconstruction_bound(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qz = dequantize(quantize_int8(emb))
    assert isinstance(qz.schema["q"].dataType, ArrayType)
    assert isinstance(qz.schema["q"].dataType.elementType, ByteType)
    rows = qz.select("embedding", "q", "scale", "embedding_deq").limit(200).collect()
    assert len(rows) > 0
    for r in rows:
        assert all(-127 <= v <= 127 for v in r.q)
        # per-element error of symmetric rounding is <= scale/2
        bound = (r.scale or 0.0) / 2 + 1e-12
        for x, d in zip(r.embedding, r.embedding_deq):
            assert abs(float(x) - d) <= bound


def test_zero_vector_roundtrip(spark):
    df = spark.createDataFrame([(0, [0.0, 0.0, 0.0])], "vec_id long, embedding array<double>")
    r = dequantize(quantize_int8(df)).collect()[0]
    assert r.scale is None
    assert list(r.q) == [0, 0, 0]
    assert list(r.embedding_deq) == [0.0, 0.0, 0.0]


def test_quantized_topk_recall(spark, sf_dir):
    """int8 distortion must not scramble the neighborhood: ≥ 4 of the
    exact top-5 survive in the quantized top-5 for a sample of
    queries."""
    emb = load_table(spark, sf_dir, "embeddings")
    deq = dequantize(quantize_int8(emb)).cache()
    for qid in (0, 7, 42):
        exact_q = emb.where(F.col("vec_id") == qid).select(F.col("embedding").alias("qv"))
        quant_q = deq.where(F.col("vec_id") == qid).select(F.col("embedding_deq").alias("qv"))
        exact = [
            r.vec_id
            for r in emb.crossJoin(F.broadcast(exact_q))
            .select("vec_id", cosine_distance(F.col("embedding"), F.col("qv")).alias("d"))
            .orderBy("d", "vec_id").limit(5).collect()
        ]
        quant = [
            r.vec_id
            for r in deq.crossJoin(F.broadcast(quant_q))
            .select("vec_id", cosine_distance(F.col("embedding_deq"), F.col("qv")).alias("d"))
            .orderBy("d", "vec_id").limit(5).collect()
        ]
        assert len(set(exact) & set(quant)) >= 4, (qid, exact, quant)
    deq.unpersist()
