"""Scale-ops pack — the operators a 100 TB deployment runs ABOUT its
own data and plans: join-key skew profiling (the measurement that
decides salting / broadcast-head pinning), the Bloom runtime-filter
join (the canonical shuffle-reduction shape), CUSUM change-point
detection (level-shift monitoring over ingest series), weighted label
propagation (community structure, the density-aware complement to
connected components), the Poisson bootstrap (confidence intervals
in one pass, no global resample), and bounded k-core peeling (the
robustness view of the near-dup graph).

Not in the reference (its scope stops at single-query RAG); these are
the standard companions any large-scale corpus pipeline adds around
the core, same rationale as operators/drift.py. Every oracle is the
plain-SQL spec: the Bloom join's oracle is the UNfiltered join (the
filter must lose nothing), LPA's is the chained-CTE replay of the
exact synchronous rounds, the bootstrap's re-derives every md5-based
Poisson draw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_rag_spark.operators.bloom import bloom_filtered_join
from cli_rag_spark.operators.bootstrap import (
    MAX_MULT,
    POISSON1_THRESHOLDS,
    bootstrap_ci,
)
from cli_rag_spark.operators.components import label_propagation
from cli_rag_spark.operators.drift import cusum_changepoints
from cli_rag_spark.operators.skew import key_skew_profile
from cli_rag_spark.sources.documents import load_table

# --- join-key skew profile ------------------------------------------


def q_key_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew profile of the orders->customer join key: exact integer
    percentiles of the per-key row count via the count-histogram
    two-level plan (operators/skew.py:key_skew_profile) — the number
    that says whether o_custkey needs salting before a 100 TB join."""
    orders = load_table(spark, sf_dir, "orders")
    return key_skew_profile(orders, F.col("o_custkey"))


# --- Bloom runtime-filter join --------------------------------------

BLOOM_JOIN_SEGMENT = "BUILDING"
BLOOM_JOIN_BITS = 1 << 16


def q_bloom_join_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by priority for one market segment, computed through
    the Bloom-prefiltered join (operators/bloom.py:bloom_filtered_join)
    — non-segment orders are dropped MAP-SIDE by the broadcast bitmap
    before the join shuffle. The oracle is the plain join: a green row
    proves the runtime filter lost nothing."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == BLOOM_JOIN_SEGMENT
    )
    orders = load_table(spark, sf_dir, "orders")
    j = bloom_filtered_join(orders, cust, "o_custkey", "c_custkey", BLOOM_JOIN_BITS)
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_rev"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            # the decimal_exact_totals dtype discipline: exact decimal
            # sum, emitted as the identical nearest double
            F.col("_rev").cast("decimal(38,2)").cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


# --- CUSUM change-point detection -----------------------------------


def q_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type CUSUM change point over the daily count series
    (operators/drift.py:cusum_changepoints): the day where cumulative
    deviation from the month's mean rate peaks — exact-integer n-scaled
    statistic, no floats anywhere."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    out = cusum_changepoints(daily, F.col("event_type"), F.col("day"), F.col("x"))
    return out.select(
        F.col("group").alias("event_type"),
        F.col("n_points").alias("n_days"),
        "total",
        # string-format the date (the established timestamp-output
        # discipline: pandas resolution must not decide the hash)
        F.date_format("cp_t", "yyyy-MM-dd").alias("cp_day"),
        "cusum_abs",
    ).orderBy("event_type")


# --- weighted label propagation communities -------------------------

LP_ITERS = 2
LP_TOPN = 20


def _trade_edges_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional customer<->supplier trade graph with BIGINT
    lineitem-count weights (the queries_mining pagerank graph, integer
    weights so LPA's argmax is exact). r9: reads the persisted pair
    artifact (plans/trade_graph.py) like the rest of the family."""
    from cli_rag_spark.plans.trade_graph import trade_edges_bidir_int

    return trade_edges_bidir_int(spark, sf_dir)


def q_lp_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 trade communities by size after 2 synchronous weighted
    label-propagation rounds (operators/components.py:
    label_propagation) — market clusters, not mere reachability: the
    bipartite trade graph is one near-connected component, but LPA
    splits it where edge weight is thin."""
    labels = label_propagation(
        _trade_edges_int(spark, sf_dir), "src", "dst", "w", iters=LP_ITERS
    )
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.col("n_members").desc(), F.col("community").asc())
        .limit(LP_TOPN)
    )


# --- Poisson bootstrap CI -------------------------------------------

BOOT_REPLICAS = 32


def q_bootstrap_ci_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~94% bootstrap interval on total order revenue in ONE pass
    (operators/bootstrap.py): 32 Poisson-resampled replica totals from
    md5-derived integer-threshold draws, rank-based bounds — the
    distributed answer to "how certain is this aggregate"."""
    orders = load_table(spark, sf_dir, "orders")
    return bootstrap_ci(
        orders, F.col("o_orderkey"), F.col("o_totalprice"), BOOT_REPLICAS, trim=1
    )


QUERIES = {
    "key_skew_stats": q_key_skew_stats,
    "bloom_join_stats": q_bloom_join_stats,
    "cusum_changepoints": q_cusum_changepoints,
    "lp_communities": q_lp_communities,
    "bootstrap_ci_revenue": q_bootstrap_ci_revenue,
}

_T = POISSON1_THRESHOLDS

_LP_ROUND = """
        sc{i} AS (
          SELECT e.dst AS node, l.label, sum(e.w)::BIGINT AS sw
          FROM edges e JOIN lab{prev} l ON e.src = l.node
          GROUP BY e.dst, l.label
        ), lab{i} AS (
          SELECT node, label FROM (
            SELECT node, label,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY sw DESC, label ASC) AS rn
            FROM sc{i}
          ) WHERE rn = 1
        )"""


def _lp_oracle() -> str:
    rounds = ",".join(_LP_ROUND.format(i=i + 1, prev=i) for i in range(LP_ITERS))
    return f"""
        WITH ed AS (
          SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s,
                 count(*)::BIGINT AS w
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2
        ), edges AS (
          SELECT c AS src, s AS dst, w FROM ed
          UNION ALL
          SELECT s AS src, c AS dst, w FROM ed
        ), lab0 AS (
          SELECT DISTINCT src AS node, src AS label FROM edges
        ),{rounds}
        SELECT label AS community, count(*)::BIGINT AS n_members
        FROM lab{LP_ITERS}
        GROUP BY label
        ORDER BY n_members DESC, community ASC
        LIMIT {LP_TOPN}
    """


ORACLE = {
    "key_skew_stats": """
        WITH counts AS (
          SELECT o_custkey AS k, count(*)::BIGINT AS cnt
          FROM orders GROUP BY o_custkey
        ), hist AS (
          SELECT cnt, count(*)::BIGINT AS n_keys FROM counts GROUP BY cnt
        ), cum AS (
          SELECT cnt, n_keys, sum(n_keys) OVER (ORDER BY cnt)::BIGINT AS cum
          FROM hist
        ), tot AS (
          SELECT sum(cnt * n_keys)::BIGINT AS total_rows,
                 sum(n_keys)::BIGINT AS n,
                 max(cnt) AS max_cnt
          FROM hist
        )
        SELECT total_rows,
               n AS distinct_keys,
               max_cnt,
               (SELECT min(cnt) FROM cum, tot WHERE cum * 2 >= n) AS p50_cnt,
               (SELECT min(cnt) FROM cum, tot WHERE cum * 100 >= n * 99) AS p99_cnt,
               CAST(floor(max_cnt * 1000000 / total_rows) AS BIGINT) AS max_share_ppm,
               CAST(floor(max_cnt * 100 /
                    (SELECT min(cnt) FROM cum, tot WHERE cum * 2 >= n)) AS BIGINT
               ) AS skew_x100
        FROM tot
    """,
    "bloom_join_stats": f"""
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
                    AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = '{BLOOM_JOIN_SEGMENT}'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "cusum_changepoints": """
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day, count(*)::BIGINT AS x
          FROM events GROUP BY 1, 2
        ), st AS (
          SELECT event_type, day, x,
                 count(*) OVER (PARTITION BY event_type)::BIGINT AS n,
                 sum(x) OVER (PARTITION BY event_type)::BIGINT AS total
          FROM daily
        ), cs AS (
          SELECT event_type, day, n, total,
                 sum(n * x - total) OVER (PARTITION BY event_type ORDER BY day
                                          ROWS UNBOUNDED PRECEDING)::BIGINT AS s
          FROM st
        ), rk AS (
          SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY abs(s) DESC, day ASC) AS rn
          FROM cs
        )
        SELECT event_type, n AS n_days, total,
               strftime(day, '%Y-%m-%d') AS cp_day,
               abs(s) AS cusum_abs
        FROM rk WHERE rn = 1
        ORDER BY event_type
    """,
    "lp_communities": _lp_oracle(),
    "bootstrap_ci_revenue": f"""
        WITH grp AS (
          SELECT CAST(g AS BIGINT) AS g FROM range(0, {BOOT_REPLICAS // 4}) t(g)
        ), cells AS (
          -- one md5 per (row, replica-GROUP): each digest's 128 bits
          -- supply FOUR 32-bit uniforms (slots), matching
          -- operators/bootstrap.py's hash-quartering exactly
          SELECT g, CAST(o_totalprice AS DECIMAL(18,2)) AS v,
                 md5(CAST(o_orderkey AS VARCHAR) || ':' ||
                     CAST(g AS VARCHAR)) AS d
          FROM orders CROSS JOIN grp
        ), slt AS (
          SELECT CAST(s AS BIGINT) AS s FROM range(0, 4) t(s)
        ), drawn AS (
          SELECT g * 4 + s AS b, v,
                 ('0x' || substr(d, s * 8 + 1, 8))::BIGINT AS u
          FROM cells CROSS JOIN slt
        ), weighted AS (
          SELECT b, v,
                 CASE WHEN u < {_T[0]} THEN 0
                      WHEN u < {_T[1]} THEN 1
                      WHEN u < {_T[2]} THEN 2
                      WHEN u < {_T[3]} THEN 3
                      ELSE {MAX_MULT} END AS m
          FROM drawn
        ), sums AS (
          SELECT b, CAST(sum(v * m) AS DECIMAL(18,2)) AS rs
          FROM weighted GROUP BY b
        ), ranked AS (
          SELECT rs,
                 row_number() OVER (ORDER BY rs ASC) AS ra,
                 row_number() OVER (ORDER BY rs DESC) AS rd
          FROM sums
        )
        SELECT CAST({BOOT_REPLICAS} AS BIGINT) AS n_replicas,
               CAST(CAST((SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
                          FROM orders) AS DECIMAL(18,2)) AS DOUBLE) AS point_est,
               CAST((SELECT rs FROM ranked WHERE ra = 2) AS DOUBLE) AS ci_lo,
               CAST((SELECT rs FROM ranked WHERE rd = 2) AS DOUBLE) AS ci_hi
    """,
}


# --- k-core of the near-dup graph -----------------------------------

KCORE_K = 2
KCORE_ROUNDS = 3


def q_kcore_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the MinHash candidate graph after 3 peeling rounds
    (operators/components.py:k_core_stats) — the ROBUSTNESS
    diagnostic next to triangle_census's clique-ness: nodes kept only
    by a single candidate edge (the chain links most likely to be
    MinHash false positives) are peeled away; what survives needs
    >= 2 independent supporting edges. n_below_k == 0 certifies the
    peel converged, i.e. the numbers describe the true 2-core."""
    from cli_rag_spark.operators.components import k_core_stats
    from cli_rag_spark.operators.dedup import minhash_candidates
    from cli_rag_spark.plans.queries_dedup import N_BANDS, N_HASHES, SHINGLE_WORDS

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidates(
        docs, shingle_words=SHINGLE_WORDS, n_hashes=N_HASHES, n_bands=N_BANDS
    )
    return k_core_stats(pairs, KCORE_K, KCORE_ROUNDS, src="id_a", dst="id_b")


QUERIES["kcore_stats"] = q_kcore_stats

# every e{i} is referenced three times by the next round (degree
# UNION twice + the edge filter) — AS MATERIALIZED stops DuckDB from
# re-INLINING the whole upstream banding per reference, which would
# make the chain exponential in rounds (observed: the un-hinted form
# ran >10 min where the materialized one takes seconds)
_KCORE_ROUND = """
        d{i} AS MATERIALIZED (
          SELECT node, count(*)::BIGINT AS deg
          FROM (SELECT a AS node FROM e{prev}
                UNION ALL SELECT b FROM e{prev})
          GROUP BY node
        ), n{i} AS MATERIALIZED (
          SELECT node FROM d{i} WHERE deg >= {k}
        ), e{i} AS MATERIALIZED (
          SELECT e.a, e.b FROM e{prev} e
          JOIN n{i} x ON e.a = x.node
          JOIN n{i} y ON e.b = y.node
        )"""


def _kcore_oracle() -> str:
    from cli_rag_spark.plans import queries_dedup as _qd

    pairs_sql = _qd.ORACLE["minhash_candidates"]
    rounds = ",".join(
        _KCORE_ROUND.format(i=i + 1, prev=i, k=KCORE_K) for i in range(KCORE_ROUNDS)
    )
    return f"""
        WITH pairs AS MATERIALIZED (
          SELECT id_a AS ra, id_b AS rb FROM ({pairs_sql})
        ), e0 AS MATERIALIZED (
          SELECT DISTINCT least(ra, rb) AS a, greatest(ra, rb) AS b
          FROM pairs WHERE ra <> rb
        ),{rounds},
        dfin AS MATERIALIZED (
          SELECT node, count(*)::BIGINT AS deg
          FROM (SELECT a AS node FROM e{KCORE_ROUNDS}
                UNION ALL SELECT b FROM e{KCORE_ROUNDS})
          GROUP BY node
        )
        SELECT CAST({KCORE_K} AS BIGINT) AS k,
               CAST({KCORE_ROUNDS} AS BIGINT) AS rounds,
               (SELECT count(*) FROM dfin)::BIGINT AS core_nodes,
               (SELECT count(*) FROM e{KCORE_ROUNDS})::BIGINT AS core_edges,
               (SELECT count(*) FROM dfin WHERE deg < {KCORE_K})::BIGINT
                 AS n_below_k
    """


ORACLE["kcore_stats"] = _kcore_oracle()


# --- cross-corpus n-gram novelty ------------------------------------

NOVELTY_SHINGLE = 3


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source novelty: the fraction (ppm) of each source's 3-word
    shingles that appear in EXACTLY ONE document corpus-wide — the
    diversity signal curation pipelines weigh against dedup's
    similarity signals (repetition_scores is within-doc,
    decontamination is cross-SET; this is cross-CORPUS uniqueness).

    Scale shape: shingles travel as md5 fingerprints (the
    bloom_decontamination key discipline — identical fp derivation in
    the oracle keeps parity exact while the shuffle key stays fixed
    width); one partial-agg ``groupBy(fp)`` document-frequency count,
    one fp-keyed join back, two partial-agg rollups. Docs with fewer
    than 3 words have no shingles and drop out of n_docs — stated
    contract, identical in the oracle. novelty_ppm is floor-integer."""
    from cli_rag_spark.functions.text import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    # materialize the fingerprint stream ONCE (r15, guide §1.2): it
    # feeds the document-frequency aggregate AND the join probe side,
    # and without the checkpoint the scan+tokenize+shingle+md5 pass
    # runs twice per plan (the source_overlap_matrix discipline)
    # spread_small_input was A/B'd here (r16) and NOT shipped: the
    # interleaved runs read 1.48 s / 2.8 CPU-s unspread vs 1.36 / 10.8
    # spread — the SMJ sort over 32 checkpoint partitions quadruples
    # CPU for ~0.1 s of wall; a losing trade on the evidence axis
    per_doc = (
        docs.select(
            "doc_id",
            "source",
            F.explode(F.array_distinct(word_shingles(F.col("text"), NOVELTY_SHINGLE))).alias("g"),
        )
        .withColumn("fp", F.md5("g"))
        .drop("g")
        .localCheckpoint(eager=False)
    )
    dfc = per_doc.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        # big-big join: the df table is ~|distinct shingles| rows and
        # grows with the corpus — it must NEVER broadcast, whatever
        # the size estimate says (the 64 MB session threshold let AQE
        # attempt it at sf0.1 inside a long-lived bench JVM and blew
        # the driver heap); the merge hint pins the sort-merge plan,
        # which is also the only shape that survives 100 TB
        per_doc.join(dfc.hint("merge"), "fp")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("n_unique"),
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_grams").alias("total_grams"),
            F.sum("n_unique").alias("unique_grams"),
        )
        .select(
            "source",
            "n_docs",
            "total_grams",
            "unique_grams",
            F.floor(F.col("unique_grams") * 1000000 / F.col("total_grams")).alias(
                "novelty_ppm"
            ),
        )
        .orderBy("source")
    )


QUERIES["ngram_novelty"] = q_ngram_novelty


def _novelty_oracle() -> str:
    from cli_rag_spark.plans.queries_mining import _shingle_sql

    sh = _shingle_sql(NOVELTY_SHINGLE)
    return f"""
        WITH sh AS (
          SELECT doc_id, source, md5(g) AS fp
          FROM (SELECT doc_id, source, unnest({sh}) AS g FROM documents)
        ), dfc AS (
          SELECT fp, count(*) AS df FROM sh GROUP BY fp
        ), per_doc AS (
          SELECT s.doc_id, s.source,
                 count(*)::BIGINT AS n_grams,
                 sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique
          FROM sh s JOIN dfc d ON s.fp = d.fp
          GROUP BY s.doc_id, s.source
        )
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_grams) AS BIGINT) AS total_grams,
               CAST(sum(n_unique) AS BIGINT) AS unique_grams,
               CAST(floor(sum(n_unique) * 1000000 / sum(n_grams)) AS BIGINT)
                 AS novelty_ppm
        FROM per_doc GROUP BY source ORDER BY source
    """


ORACLE["ngram_novelty"] = _novelty_oracle()
