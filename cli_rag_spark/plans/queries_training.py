"""Training-data pack — deterministic splits and sequence packing
over ``documents`` (operators/training.py). Both fully
oracle-checkable: the split hash and the packing arithmetic replay
exactly in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_rag_spark.operators.training import (
    hash_split,
    mixture_sample,
    pack_concat_chunks,
    stratified_sample_hash,
)
from cli_rag_spark.sources.documents import load_table

FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}
SALT = "split"
CAP = 512  # context-window tokens


def q_hash_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split sizes stratified by language — the reproducibility check
    a training pipeline runs before every job. Pure map + one tiny
    aggregate; assignment never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    out = hash_split(docs, "doc_id", FRACTIONS, salt=SALT)
    return (
        out.groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("split", "lang")
    )


def q_pack_chunks_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing per language shard: windows used,
    doc-window rows (straddles included), boundary straddle count,
    and token conservation (sum of bin_tokens == sum of n_tokens)."""
    docs = load_table(spark, sf_dir, "documents")
    packed = pack_concat_chunks(docs, CAP, shard_col="lang")
    return (
        packed.groupBy("lang")
        .agg(
            (F.max("bin") + 1).alias("n_bins"),
            F.count(F.lit(1)).alias("n_doc_windows"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("bin_tokens").alias("packed_tokens"),
        )
        .orderBy("lang")
    )


SAMPLE_N = 20


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language subsample (smallest md5(salt|id)
    per group): reproducible across engines, unlike rand()-based
    sampleBy. Returns the sampled ids themselves — the strongest
    checkable claim."""
    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample_hash(docs, "lang", "doc_id", SAMPLE_N, salt="sample")
    return out.select("lang", "doc_id").orderBy("lang", "doc_id")


MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}
MIX_DEFAULT = 0.05
MIX_SALT = "mix"


def q_mixture_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture reweighting (operators/training.py
    mixture_sample): per-source keep counts + surviving chars under
    explicit per-source rates — deterministic, shuffle-free map
    sampling; the filter pushes to the scan."""
    docs = load_table(spark, sf_dir, "documents")
    kept = mixture_sample(docs, "source", MIX_RATES, MIX_DEFAULT, salt=MIX_SALT)
    return (
        kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("source")
    )


QUERIES = {
    "hash_split_counts": q_hash_split_counts,
    "pack_chunks_stats": q_pack_chunks_stats,
    "stratified_sample": q_stratified_sample,
    "mixture_sample_counts": q_mixture_sample_counts,
}

_BUCKET = f"('0x' || substr(md5('{SALT}' || '|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000"

_MIX_BUCKET = (
    f"('0x' || substr(md5('{MIX_SALT}' || '|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000"
)
_MIX_BOUND = "CASE source " + " ".join(
    f"WHEN '{s}' THEN {int(round(r * 10000))}" for s, r in sorted(MIX_RATES.items())
) + f" ELSE {int(round(MIX_DEFAULT * 10000))} END"

ORACLE = {
    "mixture_sample_counts": f"""
        SELECT source, count(*) AS n_kept,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE {_MIX_BUCKET} < {_MIX_BOUND}
        GROUP BY source ORDER BY source
    """,
    "hash_split_counts": f"""
        WITH assigned AS (
          SELECT lang, n_chars,
                 CASE WHEN {_BUCKET} < 8000 THEN 'train'
                      WHEN {_BUCKET} < 9000 THEN 'val'
                      ELSE 'test' END AS split
          FROM documents
        )
        SELECT split, lang, count(*) AS n,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM assigned GROUP BY split, lang ORDER BY split, lang
    """,
    "stratified_sample": f"""
        SELECT lang, doc_id FROM (
          SELECT lang, doc_id,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5('sample' || '|' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                 ) AS rk
          FROM documents
        ) WHERE rk <= {SAMPLE_N}
        ORDER BY lang, doc_id
    """,
    "pack_chunks_stats": f"""
        WITH toks AS (
          SELECT doc_id, lang,
                 len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS n_tokens
          FROM documents
        ), spans AS (
          SELECT doc_id, lang, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS tok_end
          FROM toks WHERE n_tokens > 0
        ), exploded AS (
          SELECT doc_id, lang, n_tokens, tok_end - n_tokens AS tok_start, tok_end,
                 unnest(range(CAST(floor((tok_end - n_tokens) / {CAP}) AS BIGINT),
                              CAST(floor((tok_end - 1) / {CAP}) AS BIGINT) + 1)) AS bin
          FROM spans
        )
        SELECT lang,
               CAST(max(bin) + 1 AS BIGINT) AS n_bins,
               count(*) AS n_doc_windows,
               count(DISTINCT doc_id) AS n_docs,
               CAST(sum(least(tok_end, (bin + 1) * {CAP}) - greatest(tok_start, bin * {CAP})) AS BIGINT)
                   AS packed_tokens
        FROM exploded GROUP BY lang ORDER BY lang
    """,
}
