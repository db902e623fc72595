"""Text query pack — E2 chunking, E9 text analysis, fingerprinting.

chunk_reference is the crown piece: the Spark side runs the exact
port of the reference chunker (load-texts.c:37-105) as an
Arrow-batched UDF, and the oracle reproduces the same state machine
as a DuckDB *recursive CTE* — so even the quirky C semantics are
fully value-checked, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_rag_spark.functions.text import (
    BPE_ISH_TOKEN_RE,
    STOPWORDS,
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    token_count,
    tokens,
)
from cli_rag_spark.functions.quality import with_quality_metrics
from cli_rag_spark.operators.chunk import chunk, chunk_fixed, chunk_sliding
from cli_rag_spark.operators.pii import EMAIL_RE, IPV4_RE, PHONE_RE, pii_count, pii_scrub
from cli_rag_spark.sources.documents import load_table

CHUNK_SIZE = 64


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9: per-language corpus statistics, all built-ins (one shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(F.avg(token_count(F.col("text")).cast("double")), 4).alias("avg_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("ws_tokens"),
        bpe_ish_token_count(F.col("text")).cast("long").alias("bpe_tokens"),
    ).orderBy("doc_id")


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristic + punct ratio per doc."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(quality_score(F.col("text")), 6).alias("quality"),
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
    ).orderBy("doc_id")


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic vs the labeled lang column (confusion counts)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "lang_pred")
    )


def q_fingerprint_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup groups by normalized-text md5 fingerprint (E8 exact)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keep_doc_id"))
        .orderBy("keep_doc_id")
    )


def q_chunk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width chunking, zero-Python JVM path."""
    docs = load_table(spark, sf_dir, "documents")
    out = chunk_fixed(docs, CHUNK_SIZE)
    return out.select(
        "doc_id",
        F.col("chunk_index").cast("long").alias("chunk_index"),
        "chunk_text",
        F.col("n_chars").cast("long").alias("n_chars"),
    ).orderBy("doc_id", "chunk_index")


def q_chunk_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-exact chunker (load-texts.c:37-105) over the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    out = chunk(docs, CHUNK_SIZE, mode="reference")
    return out.select(
        "doc_id",
        F.col("chunk_index").cast("long").alias("chunk_index"),
        "chunk_text",
    ).orderBy("doc_id", "chunk_index")


SLIDE_SIZE = 96
SLIDE_STRIDE = 64  # 32-char overlap between consecutive windows


def q_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunks (operators/chunk.py
    chunk_sliding) — the RAG-practice chunker the reference's
    non-overlapping cutter can't express (a fact straddling a cut is
    only retrievable if some window holds it whole). Pure JVM
    sequence+substr, full provenance (start_char), and the emission
    stops at the first end-covering window, so the oracle replays
    every window cell-exact."""
    docs = load_table(spark, sf_dir, "documents")
    out = chunk_sliding(docs, SLIDE_SIZE, SLIDE_STRIDE)
    return out.select(
        "doc_id",
        F.col("chunk_index").cast("long").alias("chunk_index"),
        F.col("start_char").cast("long").alias("start_char"),
        "chunk_text",
        F.col("n_chars").cast("long").alias("n_chars"),
    ).orderBy("doc_id", "chunk_index")


def q_chunk_clean_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clean-mode chunker, verified on per-doc aggregates (chunk count
    and post-strip char coverage). The oracle replays the cut_clean
    state machine (operators/chunk.py) as a DuckDB recursive CTE —
    same technique as chunk_reference — so this is fully value-checked,
    not rows-only."""
    docs = load_table(spark, sf_dir, "documents")
    out = chunk(docs, CHUNK_SIZE, mode="clean")
    return (
        out.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_chunks"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("doc_id")
    )


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style quality metrics + accept flag per document
    (functions/quality.py with_quality_metrics) — all JVM HOFs, one
    scan, no shuffle, and each doc tokenized exactly once (staged
    projections; the naive per-metric spelling re-splits ~30x/row)."""
    docs = load_table(spark, sf_dir, "documents")
    m = with_quality_metrics(docs.select("doc_id", "text"))
    return m.select(
        "doc_id",
        "n_words",
        F.round("mean_word_len", 4).alias("mean_word_len"),
        F.round("top_word_frac", 6).alias("top_word_frac"),
        F.round("dup_word_frac", 6).alias("dup_word_frac"),
        "n_stop",
        F.round("alpha_word_frac", 6).alias("alpha_word_frac"),
        F.col("keep").cast("long").alias("keep"),
    ).orderBy("doc_id")


def q_pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (operators/pii.py) value-checked end-to-end: the
    corpus carries no PII, so a deterministic synthetic contact tail
    (email + phone + IPv4 derived from doc_id) is appended first;
    per-language totals prove match counts, redacted char volume, and
    scrub idempotence (residual == 0) against the DuckDB twin."""
    docs = load_table(spark, sf_dir, "documents")
    # staged projections (the with_quality_metrics lesson): _aug is
    # referenced 5x and _scrubbed 4x below — materialized behind
    # aliases so the concat and the triple-regex scrub each run ONCE
    # per row instead of being inlined into every output column
    staged = docs.withColumn(
        "_aug",
        F.concat(
            F.col("text"),
            F.lit(" reach user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-123-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" at 10.0.0."), (F.col("doc_id") % 256).cast("string"),
        ),
    ).withColumn("_scrubbed", pii_scrub(F.col("_aug")))
    aug, scrubbed = F.col("_aug"), F.col("_scrubbed")
    residual = pii_count(scrubbed, EMAIL_RE) + pii_count(scrubbed, PHONE_RE) + pii_count(scrubbed, IPV4_RE)
    return (
        staged.select(
            "lang",
            pii_count(aug, EMAIL_RE).alias("_e"),
            pii_count(aug, PHONE_RE).alias("_p"),
            pii_count(aug, IPV4_RE).alias("_i"),
            (F.length(aug) - F.length(scrubbed)).alias("_d"),
            residual.alias("_r"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_e").cast("long").alias("emails"),
            F.sum("_p").cast("long").alias("phones"),
            F.sum("_i").cast("long").alias("ips"),
            F.sum("_d").cast("long").alias("redacted_chars"),
            F.sum("_r").cast("long").alias("residual_matches"),
        )
        .orderBy("lang")
    )


VOCAB_K = 20


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: term frequency + document frequency of
    the top-20 tokens — the canonical wordcount shape. explode →
    partial-agg count (map-side combined) → TakeOrderedAndProject;
    the shuffle carries (token, partial-count) pairs only, and the
    top-k never global-sorts. Ties broken by token for determinism."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(VOCAB_K)
    )


QUERIES = {
    "text_stats": q_text_stats,
    "vocab_topk": q_vocab_topk,
    "gopher_quality_flags": q_gopher_quality,
    "pii_redaction_stats": q_pii_redaction_stats,
    "token_counts": q_token_counts,
    "quality_scores": q_quality_scores,
    "lang_id_confusion": q_lang_id,
    "fingerprint_dups": q_fingerprint_dups,
    "chunk_fixed": q_chunk_fixed,
    "chunk_reference": q_chunk_reference,
    "chunk_clean_stats": q_chunk_clean_stats,
    "chunk_sliding": q_chunk_sliding,
}

_WS_TOKENS = r"list_filter(regexp_split_to_array(trim({col}), '\s+'), x -> x <> '')"

_QUALITY = r"""
    (CASE WHEN length(text) BETWEEN 50 AND 100000 THEN 1.0 ELSE 0.0 END) * 0.4
  + (CASE WHEN list_sum(list_transform({toks}, x -> length(x)))::DOUBLE
          / greatest(len({toks}), 1) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) * 0.3
  + (1.0 - least(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))::DOUBLE
                 / greatest(length(text), 1) * 5, 1.0)) * 0.3
""".format(toks=_WS_TOKENS.format(col="text"))


def _lang_case() -> str:
    """argmax with alphabetical tie-break, mirroring functions/text.py."""
    score = {
        lang: f"len(list_filter({_WS_TOKENS.format(col='lower(text)')}, "
        f"x -> x IN ({', '.join(repr(w) for w in sorted(words))})))"
        for lang, words in STOPWORDS.items()
    }
    # fold in alphabetical order: strictly-greater replaces
    expr_lang, expr_score = "'und'", "0"
    for lang in sorted(score):
        s = score[lang]
        expr_lang = f"CASE WHEN {s} > {expr_score} THEN '{lang}' ELSE {expr_lang} END"
        expr_score = f"CASE WHEN {s} > {expr_score} THEN {s} ELSE {expr_score} END"
    return expr_lang


from cli_rag_spark.functions.quality import (  # noqa: E402  (thresholds for the oracle twins)
    MAX_DUP_WORD_FRACTION,
    MAX_TOP_WORD_FRACTION,
    MAX_WORDS,
    MEAN_WORD_LEN_RANGE,
    MIN_ALPHA_WORD_FRACTION,
    MIN_STOPWORDS,
    MIN_WORDS,
)

_EN_STOP = ", ".join(repr(w) for w in STOPWORDS["en"])

_GOPHER_SQL = rf"""
    WITH t AS (
      SELECT doc_id,
             {_WS_TOKENS.format(col='text')} AS toks,
             {_WS_TOKENS.format(col='lower(text)')} AS ltoks
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(toks)::BIGINT AS n_words,
             CASE WHEN len(toks) > 0
                  THEN list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks)
                  ELSE 0.0 END AS mwl,
             CASE WHEN len(toks) > 0
                  THEN list_max(list_transform(list_distinct(toks),
                                               d -> len(list_filter(toks, x -> x = d))))::DOUBLE / len(toks)
                  ELSE 0.0 END AS topf,
             CASE WHEN len(toks) > 0
                  THEN 1.0 - len(list_distinct(toks))::DOUBLE / len(toks)
                  ELSE 0.0 END AS dupf,
             len(list_filter(ltoks, x -> x IN ({_EN_STOP})))::BIGINT AS n_stop,
             CASE WHEN len(toks) > 0
                  THEN len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE / len(toks)
                  ELSE 0.0 END AS alphaf
      FROM t
    )
    SELECT doc_id, n_words,
           round(mwl, 4) AS mean_word_len,
           round(topf, 6) AS top_word_frac,
           round(dupf, 6) AS dup_word_frac,
           n_stop,
           round(alphaf, 6) AS alpha_word_frac,
           CAST(CASE WHEN n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS}
                      AND mwl >= {MEAN_WORD_LEN_RANGE[0]} AND mwl <= {MEAN_WORD_LEN_RANGE[1]}
                      AND topf <= {MAX_TOP_WORD_FRACTION} AND dupf <= {MAX_DUP_WORD_FRACTION}
                      AND n_stop >= {MIN_STOPWORDS} AND alphaf >= {MIN_ALPHA_WORD_FRACTION}
                     THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM m ORDER BY doc_id
"""

# patterns substituted literally (RE2-safe, no quotes inside)
_PII_SQL = """
    WITH aug AS (
      SELECT lang,
             text || ' reach user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-123-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' at 10.0.0.' || CAST(doc_id % 256 AS VARCHAR) AS a
      FROM documents
    ), s AS (
      SELECT lang, a,
             regexp_replace(regexp_replace(regexp_replace(
               a, '@EMAIL@', '[EMAIL]', 'g'), '@IP@', '[IP]', 'g'), '@PHONE@', '[PHONE]', 'g') AS sc
      FROM aug
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(len(regexp_extract_all(a, '@EMAIL@'))) AS BIGINT) AS emails,
           CAST(sum(len(regexp_extract_all(a, '@PHONE@'))) AS BIGINT) AS phones,
           CAST(sum(len(regexp_extract_all(a, '@IP@'))) AS BIGINT) AS ips,
           CAST(sum(length(a) - length(sc)) AS BIGINT) AS redacted_chars,
           CAST(sum(len(regexp_extract_all(sc, '@EMAIL@'))
                    + len(regexp_extract_all(sc, '@PHONE@'))
                    + len(regexp_extract_all(sc, '@IP@'))) AS BIGINT) AS residual_matches
    FROM s GROUP BY lang ORDER BY lang
""".replace("@EMAIL@", EMAIL_RE).replace("@IP@", IPV4_RE).replace("@PHONE@", PHONE_RE)

ORACLE = {
    "vocab_topk": rf"""
        SELECT token, count(*) AS n, count(DISTINCT doc_id) AS df
        FROM (
          SELECT doc_id, unnest({_WS_TOKENS.format(col='text')}) AS token
          FROM documents
        )
        GROUP BY token ORDER BY n DESC, token ASC LIMIT {VOCAB_K}
    """,
    "gopher_quality_flags": _GOPHER_SQL,
    "pii_redaction_stats": _PII_SQL,
    "text_stats": rf"""
        SELECT lang,
               count(*) AS n_docs,
               round(avg(n_chars), 4) AS avg_chars,
               round(avg(len({_WS_TOKENS.format(col='text')})::DOUBLE), 4) AS avg_tokens,
               min(n_chars) AS min_chars,
               max(n_chars) AS max_chars
        FROM documents GROUP BY lang ORDER BY lang
    """,
    "token_counts": rf"""
        SELECT doc_id,
               len({_WS_TOKENS.format(col='text')})::BIGINT AS ws_tokens,
               len(regexp_extract_all(text, '{BPE_ISH_TOKEN_RE}'))::BIGINT AS bpe_tokens
        FROM documents ORDER BY doc_id
    """,
    "quality_scores": rf"""
        SELECT doc_id,
               round({_QUALITY}, 6) AS quality,
               round(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))::DOUBLE
                     / greatest(length(text), 1), 6) AS punct_ratio
        FROM documents ORDER BY doc_id
    """,
    "lang_id_confusion": f"""
        SELECT lang, {_lang_case()} AS lang_pred, count(*) AS n
        FROM documents GROUP BY 1, 2 ORDER BY lang, lang_pred
    """,
    "fingerprint_dups": r"""
        SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
               count(*) AS n_dups,
               min(doc_id) AS keep_doc_id
        FROM documents GROUP BY 1 ORDER BY keep_doc_id
    """,
    "chunk_fixed": f"""
        SELECT doc_id,
               (gs - 1)::BIGINT AS chunk_index,
               substr(text, ((gs - 1) * {CHUNK_SIZE} + 1)::INTEGER, {CHUNK_SIZE}) AS chunk_text,
               length(substr(text, ((gs - 1) * {CHUNK_SIZE} + 1)::INTEGER, {CHUNK_SIZE}))::BIGINT AS n_chars
        FROM documents
        -- generate_series needs constant bounds in DuckDB 1.0; 512 windows
        -- of 64 chars covers any fixture doc (max n_chars << 32k)
        CROSS JOIN generate_series(1, 512) t(gs)
        WHERE (gs - 1) * {CHUNK_SIZE} < length(text)
        ORDER BY doc_id, chunk_index
    """,
    # Sliding windows: window k covers [k*stride, k*stride+size);
    # emission stops at the first end-covering window (keep k iff
    # k == 0 OR window k-1 did NOT reach the end) — the operator's
    # documented no-redundant-tail contract, replayed cell-exact.
    "chunk_sliding": f"""
        SELECT doc_id,
               (gs - 1)::BIGINT AS chunk_index,
               ((gs - 1) * {SLIDE_STRIDE})::BIGINT AS start_char,
               substr(text, ((gs - 1) * {SLIDE_STRIDE} + 1)::INTEGER, {SLIDE_SIZE}) AS chunk_text,
               length(substr(text, ((gs - 1) * {SLIDE_STRIDE} + 1)::INTEGER, {SLIDE_SIZE}))::BIGINT AS n_chars
        FROM documents
        -- constant series bound: 512 windows of stride 64 covers 32k chars,
        -- far beyond any fixture doc (same convention as chunk_fixed)
        CROSS JOIN generate_series(1, 512) t(gs)
        WHERE length(text) > 0
          AND (gs = 1 OR (gs - 2) * {SLIDE_STRIDE} + {SLIDE_SIZE} < length(text))
        ORDER BY doc_id, chunk_index
    """,
    # The reference chunker's state machine (load-texts.c:37-105) as a
    # recursive CTE: backtrack-to-last-space via strpos(reverse(window)),
    # full-window fallback when no space, tail chunk dropping the final
    # character — validated cell-exact against the Python port.
    "chunk_reference": f"""
        WITH RECURSIVE st AS (
          SELECT doc_id, text, length(text)::BIGINT AS L, 0::BIGINT AS prev,
                 -1::BIGINT AS idx, CAST(NULL AS VARCHAR) AS chunk, FALSE AS done
          FROM documents WHERE length(text) >= {CHUNK_SIZE}
          UNION ALL
          SELECT doc_id, text, L,
                 CASE WHEN is_tail THEN L ELSE pos END,
                 idx + 1,
                 CASE WHEN is_tail THEN substr(text, CAST(prev+1 AS INTEGER), CAST(L-1-prev AS INTEGER))
                      ELSE substr(text, CAST(prev+1 AS INTEGER), CAST(pos-prev AS INTEGER)) END,
                 is_tail
          FROM (
            SELECT *, CASE WHEN sp > 0 THEN prev + {CHUNK_SIZE} - sp + 1 ELSE prev + {CHUNK_SIZE} END AS pos,
                   (prev + {CHUNK_SIZE} >= L - 1) AS is_tail
            FROM (
              SELECT *, strpos(reverse(substr(text, CAST(prev+2 AS INTEGER), {CHUNK_SIZE})), ' ') AS sp
              FROM st WHERE NOT done
            )
          )
        )
        SELECT doc_id, idx AS chunk_index, chunk AS chunk_text FROM st WHERE idx >= 0
        UNION ALL
        SELECT doc_id, 0::BIGINT, text FROM documents WHERE length(text) < {CHUNK_SIZE}
        ORDER BY doc_id, chunk_index
    """,
    # cut_clean (operators/chunk.py) as a recursive CTE, validated
    # chunk-exact against the Python twin at sf0.001/sf0.01:
    # window end backtracks to the last space via strpos(reverse(...)),
    # the emitted chunk is whitespace-stripped, empties are dropped,
    # and the next start skips a single boundary space when the cut
    # landed just before one. Docs with length <= CHUNK_SIZE pass
    # through whole and unstripped, exactly like the Python early-out.
    "chunk_clean_stats": f"""
        WITH RECURSIVE cst AS (
          SELECT doc_id, text, length(text)::BIGINT AS L, 0::BIGINT AS s,
                 FALSE AS done, CAST(NULL AS VARCHAR) AS chunk
          FROM documents WHERE length(text) > {CHUNK_SIZE}
          UNION ALL
          SELECT doc_id, text, L,
                 CASE WHEN NOT fin AND substr(text, CAST(e AS INT), 1) <> ' '
                           AND substr(text, CAST(e+1 AS INT), 1) = ' '
                      THEN e + 1 ELSE e END,
                 fin,
                 substr(text, CAST(s+1 AS INT), CAST(e - s AS INT))
          FROM (
            SELECT *, (e >= L) AS fin FROM (
              SELECT *, CASE WHEN e0 < L AND sp > 0 THEN s + {CHUNK_SIZE} - sp + 1 ELSE e0 END AS e
              FROM (
                SELECT *, least(s + {CHUNK_SIZE}, L) AS e0,
                       strpos(reverse(substr(text, CAST(s+2 AS INT), {CHUNK_SIZE})), ' ') AS sp
                FROM cst WHERE NOT done
              )
            )
          )
        ),
        chunks AS (
          SELECT doc_id, trim(chunk, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) AS ct
          FROM cst WHERE chunk IS NOT NULL
          UNION ALL
          SELECT doc_id, text FROM documents
          WHERE length(text) <= {CHUNK_SIZE} AND length(text) > 0
        )
        SELECT doc_id, count(*) AS n_chunks, CAST(sum(length(ct)) AS BIGINT) AS sum_chars
        FROM chunks WHERE ct <> '' GROUP BY doc_id ORDER BY doc_id
    """,
}


# --- context-length truncation accounting (r8) ------------------------

TRUNC_BUDGET = 64


def q_token_truncation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trim-to-token-budget accounting: what a fixed per-document
    context budget (TRUNC_BUDGET whitespace tokens) keeps and drops,
    per source — the loss report a pipeline publishes before cutting
    long documents to a model's context. Pure single-scan integer
    arithmetic (token counts, least/greatest), one partial-agg
    groupBy on the 20-key source column — scan-bound at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    n = token_count(F.col("text")).cast("long")
    return (
        docs.select(
            "source",
            n.alias("n"),
            F.least(n, F.lit(TRUNC_BUDGET)).alias("kept"),
            F.greatest(n - TRUNC_BUDGET, F.lit(0)).alias("dropped"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n") > TRUNC_BUDGET).cast("long")).alias("n_truncated"),
            F.sum("kept").alias("tokens_kept"),
            F.sum("dropped").alias("tokens_dropped"),
        )
        .orderBy("source")
    )


QUERIES["token_truncation_stats"] = q_token_truncation_stats

ORACLE["token_truncation_stats"] = rf"""
    WITH t AS (
      SELECT source,
             len({_WS_TOKENS.format(col='text')})::BIGINT AS n
      FROM documents
    )
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN n > {TRUNC_BUDGET} THEN 1 ELSE 0 END)::BIGINT
             AS n_truncated,
           sum(least(n, {TRUNC_BUDGET}))::BIGINT AS tokens_kept,
           sum(greatest(n - {TRUNC_BUDGET}, 0))::BIGINT AS tokens_dropped
    FROM t GROUP BY source ORDER BY source
"""
