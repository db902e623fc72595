"""cli_rag_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of haschka/CLI-RAG, generalized for
100 TB-scale LLM data pipelines.

The reference (see SURVEY.md) is a single-threaded C RAG client: it
builds an on-disk vector database (text -> chunks -> embeddings ->
``.vdb``) and serves brute-force cosine top-k retrieval. This package
re-expresses every one of those capabilities — plus the LLM-pipeline
operator family the capability set implies at scale (dedup, batch
similarity search, text analysis, multimodal columns) — as declarative
Spark DataFrame plans so Catalyst/Tungsten pick the physical strategy.

Layout:
    session      SparkSession builder with scale-oriented defaults
    sources      document loaders (E1), ``.vdb`` fidelity codec (R5/R6)
    functions    column-level expressions: vectors, text, shared hashes
    operators    chunk (E2), embed (E3), index (E4), topk (E6),
                 knn_join (E7), dedup (E8), text_stats (E9),
                 context assembly (E10), multimodal (E11), ann
    plans        relational query pack (E12), events/window analytics
    streaming    Structured Streaming variants of the batch operators
"""

__version__ = "0.1.0"
