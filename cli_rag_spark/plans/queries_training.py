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


MIX_ALPHA = 0.3          # temperature exponent (multinomial sampling)
TOKEN_BUDGET = 10_000_000  # tokens the training run will consume


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture weights — the sampling-weight
    computation of multilingual/multi-corpus pretraining (the
    p_i ∝ share_i^α multinomial temperature of XLM-R / mT5, public
    method): per source, token counts, raw share, α=0.3 temperature
    weight, and the implied epochs over each source for a fixed token
    budget (epochs > 1 ⇒ the source is upsampled/repeated; the
    low-resource boost temperature sampling exists to provide).

    Scale shape: one corpus scan → per-source token totals (partial-
    agg, ~sources rows); the normalizer is a second aggregate over
    that tiny frame, broadcast back — no row-level data moves twice.
    Float ops (pow/divide) are identical IEEE expressions in both
    engines; rounding bounds the libm ulp drift."""
    docs = load_table(spark, sf_dir, "documents")
    from cli_rag_spark.functions.text import token_count

    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text")).cast("long")).alias("n_tokens"),
    )
    tots = per.agg(F.sum("n_tokens").alias("tot_tokens"))
    raw = per.crossJoin(F.broadcast(tots)).withColumn(
        "share", F.col("n_tokens").cast("double") / F.col("tot_tokens")
    ).withColumn("pw", F.pow(F.col("share"), F.lit(MIX_ALPHA)))
    z = raw.agg(F.sum("pw").alias("z"))
    return (
        raw.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round("share", 6).alias("raw_share"),
            F.round(F.col("pw") / F.col("z"), 6).alias("weight"),
            F.round(
                F.lit(TOKEN_BUDGET) * (F.col("pw") / F.col("z")) / F.col("n_tokens"),
                4,
            ).alias("epochs"),
        )
        .orderBy("source")
    )


TB_BUDGET = 2000  # tokens per source
TB_SALT = "budget"


def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget cap (operators/training.py
    token_budget_sample): each source keeps a deterministic
    hash-ordered prefix of documents until ~2000 tokens — the unit a
    pretraining mix spec is written in. Per source: kept docs, kept
    tokens, and the kept-id sum (exact-membership witness: any row
    swapped for another breaks it)."""
    from cli_rag_spark.operators.training import token_budget_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = token_budget_sample(
        docs, "source", "doc_id", TB_BUDGET, salt=TB_SALT
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tokens").alias("kept_tokens"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("source")
    )


QUERIES = {
    "token_budget_sample": q_token_budget_sample,
    "mixture_weights": q_mixture_weights,
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
    "token_budget_sample": f"""
        WITH toks AS (
          SELECT source, doc_id,
                 CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
          FROM documents
        ), ranked AS (
          SELECT source, doc_id, n_tokens,
                 sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY md5('{TB_SALT}' || '|' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                   ROWS UNBOUNDED PRECEDING
                 ) AS cum
          FROM toks
        )
        SELECT source, count(*) AS n_kept,
               CAST(sum(n_tokens) AS BIGINT) AS kept_tokens,
               CAST(sum(doc_id) AS BIGINT) AS id_sum
        FROM ranked WHERE cum - n_tokens < {TB_BUDGET}
        GROUP BY source ORDER BY source
    """,
    "mixture_weights": f"""
        WITH per AS (
          SELECT source, count(*) AS n_docs,
                 CAST(sum(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                          x -> x <> ''))) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source
        ), tots AS (
          SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens FROM per
        ), raw AS (
          SELECT source, n_docs, n_tokens,
                 CAST(n_tokens AS DOUBLE) / tot_tokens AS share,
                 pow(CAST(n_tokens AS DOUBLE) / tot_tokens, {MIX_ALPHA}) AS pw
          FROM per, tots
        ), z AS (
          SELECT sum(pw) AS z FROM raw
        )
        SELECT source, n_docs, n_tokens,
               round(share, 6) AS raw_share,
               round(pw / z, 6) AS weight,
               round({TOKEN_BUDGET} * (pw / z) / n_tokens, 4) AS epochs
        FROM raw, z ORDER BY source
    """,
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
