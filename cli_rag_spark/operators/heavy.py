"""Exact corpus heavy hitters — two-pass frequent-token mining.

"Which terms exceed phi of all corpus tokens?" is the vocabulary /
stopword / boilerplate-marker question a curation pipeline asks of a
new crawl. The naive plan shuffles EVERY token occurrence into a
global wordcount — at 100 TB that shuffle (trillions of rows, Zipf-
skewed keys) dwarfs the answer, which is a handful of rows.

Two-pass exact algorithm (the distributed heavy-hitters folklore
built on the pigeonhole bound; the deterministic cousin of
Misra-Gries summaries):

pass 1 (candidates, NO token shuffle): each partition counts its own
  tokens in-memory (mapInPandas; a dict, O(distinct-local)) and emits
  only tokens with local_count / local_total >= phi. PIGEONHOLE
  GUARANTEE: if a token's GLOBAL frequency is >= phi, then in at
  least one partition its local frequency is >= phi (a weighted mean
  cannot exceed every term), so the candidate union has NO FALSE
  NEGATIVES. Per-partition output is <= 1/phi rows — the only data
  that ever leaves a partition in pass 1.

pass 2 (exact counts, candidate-bounded shuffle): re-scan, explode
  tokens, broadcast-semi-join the (tiny) candidate set BEFORE the
  aggregation — the groupBy now shuffles only occurrences of
  candidate tokens, and the final integer-exact filter
  ``count * 1_000_000 >= phi_ppm * N`` keeps true heavy hitters.

The result is EXACT (the prefilter is complete, the confirm pass is
exact), so the DuckDB oracle is the plain wordcount-HAVING spec —
the driver verifies the pigeonhole lemma end-to-end. phi is taken in
parts-per-million so thresholds compare in integer arithmetic (no
float-boundary flakes in either engine).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cli_rag_spark.functions.text import token_count, tokens

# exactly Java's \s class (used by functions.text.tokens via split):
# python's \s would also match unicode whitespace and could disagree.
_JAVA_WS = re.compile(r"[ \t\n\x0B\f\r]+")


def _local_frequent(text_series_iter: Iterator[pd.DataFrame], phi_ppm: int):
    counts: dict[str, int] = {}
    total = 0
    for pdf in text_series_iter:
        for text in pdf["text"]:
            if text is None:
                continue
            # no str.strip(): python strip is UNICODE whitespace and
            # would disagree with Spark's Java-\s tokens() at text
            # boundaries; leading/trailing separators just produce
            # empty fields that the truthiness check drops
            for tok in _JAVA_WS.split(text):
                if tok:
                    counts[tok] = counts.get(tok, 0) + 1
                    total += 1
    out = [t for t, c in counts.items() if c * 1_000_000 >= phi_ppm * total]
    yield pd.DataFrame({"token": out})


def frequent_tokens(df: DataFrame, text_col: str, phi_ppm: int) -> DataFrame:
    """DF[token, count, freq] — every token whose corpus frequency is
    >= phi_ppm / 1e6 of all tokens, with its exact count. See module
    docstring for the two-pass plan."""
    if not 0 < phi_ppm <= 1_000_000:
        raise ValueError(f"phi_ppm must be in (0, 1e6], got {phi_ppm}")
    texts = df.select(F.col(text_col).alias("text"))
    candidates = (
        texts.mapInPandas(
            lambda it: _local_frequent(it, phi_ppm), schema="token string"
        )
        .distinct()
    )

    n_total = texts.agg(F.sum(token_count(F.col("text")).cast("long")).alias("n")).withColumnRenamed("n", "n_tokens")
    exact = (
        texts.select(F.explode(tokens(F.col("text"))).alias("token"))
        .join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
        .crossJoin(F.broadcast(n_total))
        .where(F.col("count") * 1_000_000 >= F.lit(phi_ppm) * F.col("n_tokens"))
    )
    return exact.select(
        "token",
        "count",
        F.round(F.col("count") / F.col("n_tokens"), 6).alias("freq"),
    )
