"""Keyword retrieval (BM25) and hybrid rank fusion (RRF).

The reference retrieves by embedding cosine only (multirag.c:94-98);
production RAG stacks pair that with lexical retrieval and fuse the
two rankings. Both halves are pure DataFrame algebra:

* **BM25** — Okapi BM25 with the standard parameters::

      idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
      score(d,q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))

  Scale shape: tokens explode ONCE and are filtered to the query's
  terms *before* any aggregation, so the exploded frame is
  O(matches), not O(corpus tokens); document length and N/avgdl are
  separate tiny aggregates broadcast back in. At index-build time
  the same frame (term → doc postings) written to parquet bucketed
  by term IS an inverted index — scoring then prunes to the query's
  term buckets.

* **RRF** — reciprocal-rank fusion: ``Σ_lists 1/(k + rank)``. Input
  rankings are tiny (top-k per retriever), so fusion is driver-scale
  arithmetic kept as DataFrame ops for composability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cli_rag_spark.functions.text import token_count, tokens

BM25_K1 = 1.2
BM25_B = 0.75
RRF_K = 60


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """DF[id_col, score] for every document matching ≥1 query term.

    Duplicate query terms are counted once (set semantics, the common
    BM25 convention)."""
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")

    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(token_count(F.col(text_col))).alias("avgdl"),
    )

    tok = docs.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("dl"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    ).where(F.col("term").isin(terms))
    tf = tok.groupBy(id_col, "dl", "term").agg(F.count(F.lit(1)).alias("tf"))

    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(df_counts), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return scored.groupBy(id_col).agg(F.round(F.sum("contrib"), 6).alias("score"))


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k by (score desc, id asc) with a 1-based ``rank`` column —
    TakeOrderedAndProject, then rank assigned within the k-row result."""
    terms = [t for t in query.split() if t]
    top = (
        bm25_scores(docs, terms, text_col=text_col, id_col=id_col)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = RRF_K,
) -> DataFrame:
    """Fuse rank lists: DF[id_col, rrf_score, n_lists]. Each input
    needs (id_col, rank_col); ids missing from a list simply
    contribute nothing (the standard RRF treatment)."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    parts = [r.select(F.col(id_col), F.col(rank_col).cast("long").alias("_rk")) for r in rankings]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    return unioned.groupBy(id_col).agg(
        F.round(F.sum(F.lit(1.0) / (F.lit(k) + F.col("_rk"))), 6).alias("rrf_score"),
        F.count(F.lit(1)).alias("n_lists"),
    )
