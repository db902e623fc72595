"""Dedup query pack (E8) — every strategy oracle-checked.

The md5-derived hashing makes MinHash/SimHash reproducible in DuckDB:
MinHash takes one 32-bit md5 base hash per shingle and k universal-
hash permutations ``(a·h+b) mod p`` (functions/hashing.py — exact
BIGINT arithmetic in both engines), and simhash bits come from
hex-substring→BIGINT bit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_rag_spark.operators.dedup import (
    dedup_exact,
    dedup_near,
    dedup_near_auto,
    embedding_near_pairs,
    jaccard_pairs,
    minhash_candidates,
    minhash_candidates_incremental,
    minhash_signatures,
    ngram_overlap,
    simhash_groups,
)
from cli_rag_spark.functions.hashing import MINHASH_PRIME, minhash_coeffs
from cli_rag_spark.operators.components import connected_components
from cli_rag_spark.operators.hamming import hamming_topk, simhash_signature
from cli_rag_spark.sources.documents import load_table

SHINGLE_WORDS = 3
N_HASHES = 8
N_BANDS = 4
JACCARD_DOC_LIMIT = 100  # brute-force Jaccard bounded to first N docs
NEAR_DUP_DIST = 0.6  # fixture vectors are near-orthogonal; 0.6 yields a small true pair set
NEAR_DUP_JACCARD = 0.8  # verified-duplicate threshold (fixture dups sit at ~0.97+)


def q_dedup_exact_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor count + ids checksum after exact dedup."""
    docs = load_table(spark, sf_dir, "documents")
    out = dedup_exact(docs)
    return out.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_ids"),
    )


INCR_SPLIT_ID = 400  # docs >= this id are the "new ingest batch"


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: candidate pairs touching the new ingest
    batch only, with the old corpus contributing just its (persisted)
    signature table — no re-shingling of already-ingested data
    (operators/dedup.py minhash_candidates_incremental). The oracle
    is the FULL-corpus candidate set filtered to new-side pairs,
    which is exactly the operator's equivalence contract."""
    docs = load_table(spark, sf_dir, "documents")
    old_sigs = minhash_signatures(
        docs.where(F.col("doc_id") < INCR_SPLIT_ID),
        shingle_words=SHINGLE_WORDS, n_hashes=N_HASHES,
    )
    new_sigs = minhash_signatures(
        docs.where(F.col("doc_id") >= INCR_SPLIT_ID),
        shingle_words=SHINGLE_WORDS, n_hashes=N_HASHES,
    )
    return minhash_candidates_incremental(
        new_sigs, old_sigs, n_hashes=N_HASHES, n_bands=N_BANDS
    ).orderBy("id_a", "id_b")


def q_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_candidates(
        docs, shingle_words=SHINGLE_WORDS, n_hashes=N_HASHES, n_bands=N_BANDS
    ).orderBy("id_a", "id_b")


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force 3-gram Jaccard over the first 100 docs, pairs with
    any overlap."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < JACCARD_DOC_LIMIT)
    return jaccard_pairs(docs, shingle_words=SHINGLE_WORDS).orderBy("id_a", "id_b")


def q_simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_groups(docs).orderBy("min_doc_id")


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_pairs(emb, NEAR_DUP_DIST).orderBy("id_a", "id_b")


def q_dedup_near_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dedup (operators/dedup.dedup_near): MinHash-LSH
    candidates → candidate-driven exact Jaccard → greedy
    keep-lowest-id. Survivor count + id checksum."""
    docs = load_table(spark, sf_dir, "documents")
    out = dedup_near(
        docs,
        threshold=NEAR_DUP_JACCARD,
        shingle_words=SHINGLE_WORDS,
        n_hashes=N_HASHES,
        n_bands=N_BANDS,
    )
    return out.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_ids"),
    )


def q_dedup_near_auto_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dup AUTO-DISPATCH (operators/dedup.dedup_near_auto,
    r10's third dispatcher) as a judged query: choose_dedup_strategy
    samples shingle-posting skew and routes exact all-pairs Jaccard
    under the measured 2e6 projected-join-rows crossover, banded
    MinHash past it. At every oracle scale (fixture, sf0.01) the
    projection sits orders of magnitude under the crossover (the sf0.1
    ground truth is 2.79e6 rows at 5,000 docs; (N/10)² scaling puts
    sf0.01 near 2.8e4), so the committed route is "allpairs" and the
    oracle replays EXACT all-pairs Jaccard — meaning a dispatch
    misroute to banding at this scale would surface as a value
    mismatch wherever banding loses a pair. Survivor count + id
    checksum, same contract as dedup_near_count."""
    docs = load_table(spark, sf_dir, "documents")
    out = dedup_near_auto(
        docs,
        threshold=NEAR_DUP_JACCARD,
        shingle_words=SHINGLE_WORDS,
        n_hashes=N_HASHES,
        n_bands=N_BANDS,
    )
    return out.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_ids"),
    )


HAMMING_K = 5
HAMMING_QUERY_DOC = 0


def q_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-vector path (the reference's dead BINARY_VECTOR type,
    vector-db.h:1, made live): 16-bit packed SimHash signatures,
    popcount(xor) distance, TakeOrderedAndProject top-k to doc 0's
    signature — all codegen expressions."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = simhash_signature(docs, n_bits=16)
    q = sigs.where(F.col("doc_id") == HAMMING_QUERY_DOC).select(
        F.col("sig").alias("qsig")
    )
    joined = sigs.crossJoin(F.broadcast(q))
    return hamming_topk(joined, F.col("qsig"), k=HAMMING_K).orderBy(
        "hamming", "doc_id"
    )


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dup clusters: MinHash candidate pairs → connected
    components via iterative min-label propagation
    (operators/components.py). The oracle is a recursive-CTE
    transitive closure — a completely different algorithm arriving at
    the same fixpoint."""
    docs = load_table(spark, sf_dir, "documents")
    edges = minhash_candidates(
        docs, shingle_words=SHINGLE_WORDS, n_hashes=N_HASHES, n_bands=N_BANDS
    )
    comp = connected_components(edges, src="id_a", dst="id_b")
    return comp.select(F.col("node").alias("doc_id"), "component").orderBy("doc_id")


DECON_N = 5          # word-gram width (the GPT-3-style knob)
DECON_PROBES = 5     # probes = substrings of the first 5 docs


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.ngram_overlap): the
    'eval set' is derived deterministically from the corpus itself
    (substrings of the first 5 docs → guaranteed hits), the corpus is
    scanned ONCE against the broadcast probe n-grams. Output: per
    probe, how many corpus docs share ≥1 5-gram and the total shared
    gram count."""
    docs = load_table(spark, sf_dir, "documents")
    probes = docs.where(F.col("doc_id") < DECON_PROBES).select(
        F.col("doc_id").alias("probe_id"),
        F.substring("text", 11, 80).alias("probe_text"),
    )
    hits = ngram_overlap(docs, probes, n=DECON_N)
    return (
        hits.groupBy("probe_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_shared").alias("total_shared"),
        )
        .orderBy("probe_id")
    )


LEAK_SALT = "leak"
LEAK_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}


def q_leakproof_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-proof train/val/test split (operators/training.py
    leakproof_split): the split unit is the MinHash near-dup CLUSTER
    (same banding as dedup_components), so near-duplicates can never
    straddle train and test. Per split: docs, distinct split groups,
    id-sum membership witness — plus n_cross_split_edges, the leakage
    count the construction forces to zero, carried as a checked value
    (the oracle recomputes it from its own closure)."""
    from cli_rag_spark.operators.training import leakproof_split

    docs = load_table(spark, sf_dir, "documents")
    edges = minhash_candidates(
        docs, shingle_words=SHINGLE_WORDS, n_hashes=N_HASHES, n_bands=N_BANDS
    )
    out = leakproof_split(
        docs, edges, "doc_id", LEAK_FRACTIONS, salt=LEAK_SALT
    ).select("doc_id", "split_group", "split")
    assign = out.select("doc_id", "split")
    leaks = (
        edges.join(assign.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("split", "split_a")
        .join(assign.withColumnRenamed("doc_id", "id_b"), "id_b")
        .withColumnRenamed("split", "split_b")
        .where(F.col("split_a") != F.col("split_b"))
        .agg(F.count(F.lit(1)).alias("n_cross_split_edges"))
    )
    return (
        out.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("split_group").alias("n_groups"),
            F.sum("doc_id").alias("id_sum"),
        )
        .crossJoin(F.broadcast(leaks))
        .orderBy("split")
    )


QUERIES = {
    "leakproof_split_counts": q_leakproof_split_counts,
    "dedup_exact_count": q_dedup_exact_count,
    "decontamination": q_decontamination,
    "dedup_components": q_dedup_components,
    "hamming_topk": q_hamming_topk,
    "dedup_near_count": q_dedup_near_count,
    "dedup_near_auto_count": q_dedup_near_auto_count,
    "minhash_candidates": q_minhash_candidates,
    "dedup_incremental": q_dedup_incremental,
    "ngram_jaccard": q_ngram_jaccard,
    "simhash_groups": q_simhash_groups,
    "embedding_near_dups": q_embedding_near_dups,
}

# shared SQL fragments (DuckDB) mirroring functions/text.py + hashing.py
_TOKS = r"list_filter(regexp_split_to_array(trim({src}), '\s+'), x -> x <> '')"
_SHINGLES = (
    "list_transform(range(1, greatest(len({toks}) - %d + 2, 1)), "
    "i -> array_to_string({toks}[i:i+%d], ' '))"
    % (SHINGLE_WORDS, SHINGLE_WORDS - 1)
).format(toks=_TOKS.format(src="text"))
_MH_A, _MH_B = minhash_coeffs(N_HASHES)
_H32 = "(('0x' || substr(md5(s), 1, 8))::BIGINT)"
_MINHASH = ", ".join(
    f"list_min(list_transform(list_distinct(sh), s -> ({_MH_A[i]} * {_H32} + {_MH_B[i]}) % {MINHASH_PRIME}))"
    for i in range(N_HASHES)
)


def _band_key(b: int, rows_per_band: int) -> str:
    parts = " || '|' || ".join(f"sig[{b * rows_per_band + i + 1}]" for i in range(rows_per_band))
    return f"md5({parts})"


_SIMHASH_BIT = (
    "CASE WHEN list_sum(list_transform(toks, t -> "
    "CASE WHEN (('0x' || substr(md5(t), 1, 15))::BIGINT & {mask}) > 0 THEN 1 ELSE -1 END)) > 0 "
    "THEN 1 ELSE 0 END"
)
_SIMHASH = " || ".join(
    "CAST(" + _SIMHASH_BIT.format(mask=1 << j) + " AS VARCHAR)" for j in range(16)
)
# same bits packed positionally into one integer (operators/hamming.py)
_SIMHASH_INT = " + ".join(
    "(" + _SIMHASH_BIT.format(mask=1 << j) + f") * {1 << j}" for j in range(16)
)

ORACLE = {
    "dedup_exact_count": r"""
        WITH keep AS (
          SELECT min(doc_id) AS doc_id
          FROM (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
                FROM documents)
          GROUP BY fp
        )
        SELECT count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids FROM keep
    """,
    "dedup_near_count": f"""
        WITH sh0 AS (
          SELECT doc_id, {_SHINGLES} AS sh FROM documents
        ), sig AS (
          SELECT doc_id, [{_MINHASH}] AS sig FROM sh0 WHERE len(sh) >= 1
        ), banded AS (
          {" UNION ALL ".join(
              f"SELECT doc_id, {b} AS band, {_band_key(b, N_HASHES // N_BANDS)} AS key FROM sig"
              for b in range(N_BANDS)
          )}
        ), cand AS (
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
          FROM banded l
          JOIN banded r ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
        ), shex AS (
          SELECT doc_id, unnest(list_distinct(sh)) AS shingle FROM sh0
        ), sizes AS (
          SELECT doc_id, count(*) AS n FROM shex GROUP BY doc_id
        ), inter AS (
          SELECT c.id_a, c.id_b, count(*) AS n_inter
          FROM cand c
          JOIN shex a ON a.doc_id = c.id_a
          JOIN shex b ON b.doc_id = c.id_b AND b.shingle = a.shingle
          GROUP BY c.id_a, c.id_b
        ), drops AS (
          SELECT DISTINCT id_b AS doc_id
          FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE round(n_inter::DOUBLE / (sa.n + sb.n - n_inter), 6) >= {NEAR_DUP_JACCARD}
        )
        SELECT count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids
        FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM drops)
    """,
    # the AUTO route at oracle scale is provably "allpairs" (projected
    # self-join volume ≪ the 2e6 crossover — see the query docstring),
    # so the oracle is EXACT all-pairs Jaccard with no banding step: a
    # misroute to banding would hash-mismatch wherever banding loses a
    # pair
    "dedup_near_auto_count": f"""
        WITH sh0 AS (
          SELECT doc_id, {_SHINGLES} AS sh FROM documents
        ), shex AS (
          SELECT doc_id, unnest(list_distinct(sh)) AS shingle FROM sh0
        ), sizes AS (
          SELECT doc_id, count(*) AS n FROM shex GROUP BY doc_id
        ), inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
          FROM shex a
          JOIN shex b ON b.shingle = a.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ), drops AS (
          SELECT DISTINCT id_b AS doc_id
          FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE round(n_inter::DOUBLE / (sa.n + sb.n - n_inter), 6) >= {NEAR_DUP_JACCARD}
        )
        SELECT count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids
        FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM drops)
    """,
    "decontamination": f"""
        WITH corpus AS (
          SELECT doc_id,
                 unnest(list_distinct(
                   list_transform(
                     range(1, greatest(len({_TOKS.format(src="text")}) - {DECON_N - 2}, 1)),
                     i -> array_to_string(({_TOKS.format(src="text")})[i:i+{DECON_N - 1}], ' '))
                 )) AS gram
          FROM documents
        ), probes AS (
          SELECT doc_id AS probe_id,
                 unnest(list_distinct(
                   list_transform(
                     range(1, greatest(len({_TOKS.format(src="substr(text, 11, 80)")}) - {DECON_N - 2}, 1)),
                     i -> array_to_string(({_TOKS.format(src="substr(text, 11, 80)")})[i:i+{DECON_N - 1}], ' '))
                 )) AS gram
          FROM documents WHERE doc_id < {DECON_PROBES}
        ), hits AS (
          SELECT probe_id, doc_id, count(DISTINCT gram) AS n_shared
          FROM corpus JOIN probes USING (gram)
          GROUP BY probe_id, doc_id
        )
        SELECT probe_id, count(*) AS n_docs,
               CAST(sum(n_shared) AS BIGINT) AS total_shared
        FROM hits GROUP BY probe_id ORDER BY probe_id
    """,
    "leakproof_split_counts": f"""
        WITH RECURSIVE sh AS (
          SELECT doc_id, {_SHINGLES} AS sh FROM documents
        ), sig AS (
          SELECT doc_id, [{_MINHASH}] AS sig FROM sh WHERE len(sh) >= 1
        ), banded AS (
          {" UNION ALL ".join(
              f"SELECT doc_id, {b} AS band, {_band_key(b, N_HASHES // N_BANDS)} AS key FROM sig"
              for b in range(N_BANDS)
          )}
        ), cand AS (
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
          FROM banded l
          JOIN banded r ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
        ), edges AS (
          SELECT id_a AS a, id_b AS b FROM cand
          UNION
          SELECT id_b AS a, id_a AS b FROM cand
        ), reach AS (
          SELECT DISTINCT a AS node, a AS r FROM edges
          UNION
          SELECT reach.node, e.b AS r FROM reach JOIN edges e ON e.a = reach.r
        ), comp AS (
          SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node
        ), grouped AS (
          SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS split_group
          FROM documents d LEFT JOIN comp c USING (doc_id)
        ), assigned AS (
          SELECT doc_id, split_group,
                 CASE WHEN ('0x' || substr(md5('{LEAK_SALT}' || '|' || CAST(split_group AS VARCHAR)), 1, 15))::BIGINT % 10000 < 8000 THEN 'train'
                      WHEN ('0x' || substr(md5('{LEAK_SALT}' || '|' || CAST(split_group AS VARCHAR)), 1, 15))::BIGINT % 10000 < 9000 THEN 'val'
                      ELSE 'test' END AS split
          FROM grouped
        ), leaks AS (
          SELECT count(*) AS n_cross FROM cand e
          JOIN assigned x ON e.id_a = x.doc_id
          JOIN assigned y ON e.id_b = y.doc_id
          WHERE x.split <> y.split
        )
        SELECT split, count(*) AS n_docs,
               count(DISTINCT split_group) AS n_groups,
               CAST(sum(doc_id) AS BIGINT) AS id_sum,
               (SELECT CAST(n_cross AS BIGINT) FROM leaks) AS n_cross_split_edges
        FROM assigned GROUP BY split ORDER BY split
    """,
    "dedup_components": f"""
        WITH RECURSIVE sh AS (
          SELECT doc_id, {_SHINGLES} AS sh FROM documents
        ), sig AS (
          SELECT doc_id, [{_MINHASH}] AS sig FROM sh WHERE len(sh) >= 1
        ), banded AS (
          {" UNION ALL ".join(
              f"SELECT doc_id, {b} AS band, {_band_key(b, N_HASHES // N_BANDS)} AS key FROM sig"
              for b in range(N_BANDS)
          )}
        ), cand AS (
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
          FROM banded l
          JOIN banded r ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
        ), edges AS (
          SELECT id_a AS a, id_b AS b FROM cand
          UNION
          SELECT id_b AS a, id_a AS b FROM cand
        ), reach AS (
          SELECT DISTINCT a AS node, a AS r FROM edges
          UNION
          SELECT reach.node, e.b AS r FROM reach JOIN edges e ON e.a = reach.r
        )
        SELECT node AS doc_id, min(r) AS component
        FROM reach GROUP BY node ORDER BY doc_id
    """,
    "dedup_incremental": f"""
        WITH sh AS (
          SELECT doc_id, {_SHINGLES} AS sh FROM documents
        ), sig AS (
          SELECT doc_id, [{_MINHASH}] AS sig FROM sh WHERE len(sh) >= 1
        ), banded AS (
          {" UNION ALL ".join(
              f"SELECT doc_id, {b} AS band, {_band_key(b, N_HASHES // N_BANDS)} AS key FROM sig"
              for b in range(N_BANDS)
          )}
        )
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM banded l
        JOIN banded r ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
        WHERE l.doc_id >= {INCR_SPLIT_ID} OR r.doc_id >= {INCR_SPLIT_ID}
        ORDER BY id_a, id_b
    """,
    "minhash_candidates": f"""
        WITH sh AS (
          SELECT doc_id, {_SHINGLES} AS sh FROM documents
        ), sig AS (
          SELECT doc_id, [{_MINHASH}] AS sig FROM sh WHERE len(sh) >= 1
        ), banded AS (
          {" UNION ALL ".join(
              f"SELECT doc_id, {b} AS band, {_band_key(b, N_HASHES // N_BANDS)} AS key FROM sig"
              for b in range(N_BANDS)
          )}
        )
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM banded l
        JOIN banded r ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
        ORDER BY id_a, id_b
    """,
    "ngram_jaccard": f"""
        WITH sh AS (
          SELECT doc_id, unnest(list_distinct({_SHINGLES})) AS shingle
          FROM documents WHERE doc_id < {JACCARD_DOC_LIMIT}
        ), sizes AS (
          SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(n_inter::DOUBLE / (sa.n + sb.n - n_inter), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        ORDER BY id_a, id_b
    """,
    "hamming_topk": f"""
        WITH sig AS (
          SELECT doc_id, CAST({_SIMHASH_INT} AS BIGINT) AS sig
          FROM (SELECT doc_id, {_TOKS.format(src="text")} AS toks FROM documents)
        ), q AS (
          SELECT sig AS qsig FROM sig WHERE doc_id = {HAMMING_QUERY_DOC}
        )
        SELECT s.doc_id, CAST(bit_count(xor(s.sig, q.qsig)) AS INTEGER) AS hamming
        FROM sig s, q
        ORDER BY hamming, s.doc_id LIMIT {HAMMING_K}
    """,
    "simhash_groups": f"""
        WITH keyed AS (
          SELECT doc_id, {_SIMHASH} AS simhash
          FROM (SELECT doc_id, {_TOKS.format(src="text")} AS toks FROM documents)
        )
        SELECT simhash, count(*) AS n_docs, min(doc_id) AS min_doc_id
        FROM keyed GROUP BY simhash ORDER BY min_doc_id
    """,
    "embedding_near_dups": f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(1 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS dist
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(1 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) < {NEAR_DUP_DIST}
        ORDER BY id_a, id_b
    """,
}


# --- C4-style span dedup (r7) ----------------------------------------

SPAN_W = 3


def q_span_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REWRITE member of the dedup family (operators/dedup.py
    dedup_spans, C4 §2.2 at 3-word-segment granularity): every exact
    duplicate segment occurrence corpus-wide is dropped except its
    first (smallest doc, then position), and documents are
    reassembled from the survivors. Per-source doc count, segment
    totals, and the reassembled-character sum — the last is the
    strong witness: a wrong winner, a mis-sliced segment, or a
    reassembly in the wrong order all shift kept_chars."""
    from cli_rag_spark.operators.dedup import dedup_spans

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    out = dedup_spans(docs, span_words=SPAN_W, carry=["source"])
    return (
        out.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_segs").cast("long").alias("total_segs"),
            F.sum("n_kept").cast("long").alias("kept_segs"),
            F.sum(F.length("text")).cast("long").alias("kept_chars"),
        )
        .orderBy("source")
    )


QUERIES["span_dedup_stats"] = q_span_dedup_stats

# Oracle segment enumeration is bounded at generate_series(0, 63) = 64
# segments/doc = docs up to 64*SPAN_W={64 * SPAN_W} words (ADVICE r7
# low #3: the bound must be visible, like chunk_fixed's 512-window
# convention). Fixture docs max out at 100 words (34 segments), so the
# cap sits ~1.9x above fixture growth (192-word cap / 100-word max —
# same ratio in segments, 64/34); a fixture regeneration pushing docs
# past {64 * SPAN_W} words would silently drop oracle segments and
# read as an operator bug — the headroom test
# (test_span_oracle_segment_cap_clears_fixture) trips first; raise
# the 63 here when it does.
ORACLE["span_dedup_stats"] = f"""
    WITH w AS (
      SELECT doc_id, source, gs AS seg_idx,
             array_to_string(words[(gs*{SPAN_W}+1):(gs*{SPAN_W}+{SPAN_W})], ' ') AS seg
      FROM (
        SELECT doc_id, source, string_split(text, ' ') AS words
        FROM documents
      )
      CROSS JOIN generate_series(0, 63) t(gs)
      WHERE gs * {SPAN_W} < len(words)
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
      FROM w
    ), per_doc AS (
      SELECT doc_id, source, count(*) AS n_segs,
             count(CASE WHEN rn = 1 THEN 1 END) AS n_kept,
             coalesce(length(string_agg(CASE WHEN rn = 1 THEN seg END, ' '
                                        ORDER BY seg_idx)), 0) AS kept_chars
      FROM r GROUP BY doc_id, source
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_segs) AS BIGINT) AS total_segs,
           CAST(sum(n_kept) AS BIGINT) AS kept_segs,
           CAST(sum(kept_chars) AS BIGINT) AS kept_chars
    FROM per_doc GROUP BY source
    ORDER BY source
"""
