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


def tfidf_weights(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_frac: float = 1.0,
) -> DataFrame:
    """Sparse TF-IDF document vectors: DF[id_col, term, w] with the
    sklearn-style smoothed idf ``ln((1+N)/(1+df)) + 1`` (never
    negative, never div-by-zero) and ``w = round(tf · idf, 6)``.

    ``max_df_frac`` is the scale lever: terms appearing in more than
    that fraction of documents are dropped BEFORE weighting — on real
    corpora the df distribution is Zipf, and the handful of stopword
    terms above the cutoff contribute ~nothing to cosine but dominate
    posting-list sizes (exactly the skew that would make the
    similarity join below straggle at 100 TB). The df table is a tiny
    per-term aggregate, broadcast back onto the postings.
    """
    tok = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w = (
        tf.join(F.broadcast(dfc), "term")
        .crossJoin(F.broadcast(stats))
        .where(F.col("df") <= F.lit(max_df_frac) * F.col("n_docs"))
    )
    idf = F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df"))) + 1.0
    return w.select(
        id_col, "term", F.round(F.col("tf") * idf, 6).alias("w")
    )


def tfidf_cosine_topk(
    docs: DataFrame,
    query_doc_id: int,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_frac: float = 1.0,
) -> DataFrame:
    """Top-k documents most cosine-similar to ``query_doc_id`` in
    TF-IDF space — the sparse lexical complement to the dense
    embedding kNN operators (classic IR, public since Salton's SMART).

    Scale shape: the query vector is a handful of (term, w) rows —
    broadcast; the corpus postings are filtered to the query's terms
    BY the broadcast-join itself before any aggregation, so the dot
    product costs O(postings of query terms), never O(corpus tokens)
    — the same posting-pruned shape as bm25_scores. Norms are one
    narrow per-doc aggregate. With ``max_df_frac`` < 1 the stopword
    posting lists never enter the join (see :func:`tfidf_weights`).
    All intermediates round to 6 before the final division, so the
    full ranking replays exactly in the SQL oracle.
    """
    vec = tfidf_weights(docs, text_col, id_col, max_df_frac)
    n2 = vec.groupBy(id_col).agg(
        F.round(F.sum(F.col("w") * F.col("w")), 6).alias("n2")
    )
    qvec = vec.where(F.col(id_col) == query_doc_id).select(
        "term", F.col("w").alias("qw")
    )
    qn2 = n2.where(F.col(id_col) == query_doc_id).select(
        F.col("n2").alias("qn2")
    )
    dots = (
        vec.where(F.col(id_col) != query_doc_id)
        .join(F.broadcast(qvec), "term")
        .groupBy(id_col)
        .agg(F.round(F.sum(F.col("w") * F.col("qw")), 6).alias("dot"))
    )
    scored = (
        dots.join(n2, id_col)
        .crossJoin(F.broadcast(qn2))
        .select(
            id_col,
            F.round(
                F.col("dot") / F.sqrt(F.col("n2") * F.col("qn2")), 6
            ).alias("cosine"),
        )
    )
    top = scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)
    w_rank = Window.orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w_rank).cast("long"))


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
