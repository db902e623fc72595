"""E2 — text chunking (the reference's UDTF-shaped 1→N operator).

Reference: ``cut_texts_in_subtexts`` (load-texts.c:37-105). Exact
semantics, reproduced byte-for-byte in ``mode="reference"``:

* text shorter than the window → one chunk, the whole text
  (load-texts.c:48-57);
* cut at ``requested_length``, then backtrack to the last ``' '``
  (load-texts.c:61-63) — so every chunk after the first *starts with
  the space* it backtracked to;
* if no space exists in the window, emit a full fixed-width window
  (load-texts.c:65-68: ``position += requested_length`` restores the
  pre-backtrack cut point);
* tail chunk ends at ``text_length - 1`` → the final character of the
  text is always dropped (load-texts.c:89). This is a reference bug
  we reproduce only under ``mode="reference"`` (SURVEY §7 quirks
  ledger);
* loop runs while the *pre-backtrack* cut point ``< len - 1``
  (load-texts.c:59).

``mode="clean"`` is the engine's default: word-boundary chunks with
optional character overlap, no dropped characters, full coverage.

Scale: chunking is a pure per-row function → ``pandas_udf`` returning
``array<string>`` (Arrow-batched) + ``posexplode``. No shuffle; the
explode multiplies rows inside the same stage, and downstream ops see
an honest per-chunk row count for AQE to size partitions with.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


def cut_reference(text: str, requested_length: int) -> list[str]:
    """Pure-Python port of load-texts.c:37-105 (0-based indices)."""
    n = len(text)
    r = requested_length
    if n < r:
        return [text]
    chunks: list[str] = []
    prev = 0
    pos = r
    while pos < n - 1:
        # C-speed twin of the reference's backtrack loop (`while pos >
        # prev and text[pos] != ' ': pos -= 1`): the highest space
        # index in (prev, pos] — prev itself is excluded because the
        # loop stops on pos == prev without testing text[prev]
        sp = text.rfind(" ", prev + 1, pos + 1)
        pos = sp if sp != -1 else prev
        if pos == prev:
            # "No new words found on interval" fallback (load-texts.c:65-68)
            pos += r
        chunks.append(text[prev:pos])
        prev = pos
        pos += r
    if prev < n and pos >= n - 1:
        pos = n - 1
        chunks.append(text[prev:pos])  # final char dropped (load-texts.c:89)
    return chunks


def cut_clean(text: str, size: int, overlap: int = 0) -> list[str]:
    """Sane default: word-boundary-aligned windows, optional overlap,
    no dropped characters, chunks stripped of the boundary space."""
    if size <= 0:
        raise ValueError("size must be positive")
    if overlap >= size:
        raise ValueError("overlap must be smaller than size")
    n = len(text)
    if n == 0:
        return []
    if n <= size:
        return [text]
    chunks: list[str] = []
    start = 0
    while start < n:
        end = min(start + size, n)
        if end < n:
            cut = text.rfind(" ", start + 1, end + 1)
            if cut > start:
                end = cut
        chunks.append(text[start:end].strip())
        if end >= n:
            break
        start = max(start + 1, end - overlap)
        if text[start - 1] != " " and overlap == 0 and text[start:].startswith(" "):
            start += 1
    return [c for c in chunks if c]


def chunk(
    df: DataFrame,
    size: int,
    mode: str = "clean",
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DF[doc_id, ...] → DF[doc_id, chunk_index, chunk_text, n_chars].

    Adds the provenance the reference never had (SURVEY §1.1: its only
    chunk identity was array position).
    """
    if mode == "fixed":
        if overlap:
            raise ValueError("mode='fixed' does not support overlap")
        return chunk_fixed(df, size, text_col=text_col, id_col=id_col)
    if mode == "reference":
        fn = lambda s: cut_reference(s, size)  # noqa: E731
    elif mode == "clean":
        fn = lambda s: cut_clean(s, size, overlap)  # noqa: E731
    else:
        raise ValueError(f"unknown mode {mode!r}")

    from cli_rag_spark.deploy import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)

    @F.pandas_udf(ArrayType(StringType()))
    def chunk_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: fn(t) if t is not None else [])

    return (
        df.select(F.col(id_col), chunk_udf(F.col(text_col)).alias("_chunks"))
        .select(
            id_col,
            F.posexplode("_chunks").alias("chunk_index", "chunk_text"),
        )
        .withColumn("n_chars", F.length("chunk_text"))
    )


def chunk_sliding(
    df: DataFrame,
    size: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping sliding-window chunks, zero Python — the RAG
    practice the reference's non-overlapping cutter (load-texts.c:37)
    can't express: a fact straddling a chunk boundary is retrievable
    only if some window contains it whole, so production chunkers
    overlap by ``size - stride`` characters.

    Window k covers ``[k·stride, k·stride + size)``; emission stops at
    the FIRST window reaching the end of the text (``k·stride + size
    >= n``) — every character is covered and no fully-redundant tail
    windows are emitted (a window starting past ``n - size`` adds no
    content the previous one lacked). Empty texts yield no rows;
    texts ``<= size`` yield exactly one window.

    DF[id, chunk_index, start_char, chunk_text, n_chars]. Pure JVM
    (sequence + posexplode + substr): per-row generate, no shuffle,
    same scale shape as chunk_fixed. SQL-replayable exactly —
    substring semantics agree across engines."""
    if size <= 0:
        raise ValueError("size must be positive")
    if not 0 < stride <= size:
        raise ValueError("stride must be in (0, size]")
    n = F.length(text_col)
    n_win = F.when(n <= size, F.lit(1)).otherwise(
        F.ceil((n - size) / F.lit(stride)).cast("int") + 1
    )
    return (
        df.where(n > 0)
        .select(F.col(id_col), F.col(text_col), n_win.alias("_nw"))
        .select(
            id_col,
            text_col,
            F.explode(F.sequence(F.lit(0), F.col("_nw") - 1)).alias("chunk_index"),
        )
        .select(
            id_col,
            "chunk_index",
            (F.col("chunk_index") * stride).alias("start_char"),
            F.expr(f"substring({text_col}, chunk_index * {stride} + 1, {size})").alias(
                "chunk_text"
            ),
        )
        .withColumn("n_chars", F.length("chunk_text"))
    )


def chunk_fixed(
    df: DataFrame,
    size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-width chunking with zero Python: sequence + transform +
    posexplode, fully JVM-side. The scale path when word alignment
    doesn't matter (and the SQL-oracle-checkable baseline for E2)."""
    n_chunks = F.ceil(F.length(text_col) / F.lit(size)).cast("int")
    pieces = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.col(text_col).substr(i * size + 1, F.lit(size)),
    )
    # sequence(0, -1) would infer step -1; guard the empty-text case
    pieces = F.when(F.length(text_col) > 0, pieces).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col), pieces.alias("_chunks"))
        .select(id_col, F.posexplode("_chunks").alias("chunk_index", "chunk_text"))
        .withColumn("n_chars", F.length("chunk_text"))
    )
