"""E4 — batch index build: the reference's flagship pipeline
(build-vector-db-from-server.c:9-78) as one declarative DataFrame
chain:

    load → chunk → embed → (validate) → write parquet

The reference runs this serially, one HTTP call per chunk, dimension
taken from the *last* response (a latent bug,
build-vector-db-from-server.c:72). Here every stage is distributed
and the dimension is validated uniformly before the write (SURVEY
§4.3.3).

Sink is Parquet (columnar, splittable, predicate-pushdown-able) —
the scale replacement for the bespoke ``.vdb`` binary (vector-db.c:42-79);
a byte-exact ``.vdb`` codec lives in sources/vdb.py for fidelity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cli_rag_spark.operators.chunk import chunk
from cli_rag_spark.operators.embed import embed


class DimensionError(ValueError):
    pass


def validate_dimension(df: DataFrame, vec_col: str = "embedding", expected: int | None = None) -> int:
    """Uniform-dimension check the reference skips. One cheap agg pass;
    returns the dimension."""
    dims = (
        df.select(F.size(F.col(vec_col)).alias("d"))
        .groupBy("d")
        .count()
        .collect()
    )
    observed = sorted(r["d"] for r in dims)
    if len(observed) != 1:
        raise DimensionError(f"non-uniform embedding dimensions: {observed}")
    if expected is not None and observed[0] != expected:
        raise DimensionError(f"dimension {observed[0]} != expected {expected}")
    return observed[0]


def build_index(
    docs: DataFrame,
    out_path: str | None = None,
    chunk_size: int = 2000,  # reference README example (README.md:47)
    chunk_mode: str = "clean",
    embed_mode: str = "mock",
    dim: int = 8,
    partition_cols: list[str] | None = None,
    **embed_kwargs,
) -> DataFrame:
    """documents → chunks → embeddings [→ parquet].

    Returns DF[doc_id, chunk_index, chunk_text, n_chars, embedding,
    id] where ``id`` is the explicit row identity the reference kept
    implicit (array index, SURVEY §1.1). When ``out_path`` is given
    the index is also written (optionally partitioned — at 100 TB
    partition by a coarse key like source/date so searches prune).
    """
    chunks = chunk(docs, size=chunk_size, mode=chunk_mode)
    embedded = embed(chunks, mode=embed_mode, dim=dim, **embed_kwargs)
    # monotonically_increasing_id, NOT a global row_number window: a
    # single unpartitioned window would serialize the whole index
    # through one task at 100 TB. (doc_id, chunk_index) remains the
    # stable logical identity; id is a physical handle.
    indexed = embedded.withColumn("id", F.monotonically_increasing_id())
    if out_path:
        writer = indexed.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(out_path)
    return indexed
