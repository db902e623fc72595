"""Merge all query packs into the single judged surface."""

from __future__ import annotations

import functools
from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

from cli_rag_spark.deploy import ensure_package_on_executors

_PACKS = [
    "cli_rag_spark.plans.queries_vectors",
    "cli_rag_spark.plans.queries_text",
    "cli_rag_spark.plans.queries_dedup",
    "cli_rag_spark.plans.queries_relational",
    "cli_rag_spark.plans.queries_relational_ext",
    "cli_rag_spark.plans.queries_relational_more",
    "cli_rag_spark.plans.queries_approx",
    "cli_rag_spark.plans.queries_events",
    "cli_rag_spark.plans.queries_temporal",
    "cli_rag_spark.plans.queries_training",
    "cli_rag_spark.plans.queries_search",
    "cli_rag_spark.plans.queries_pipeline",
    "cli_rag_spark.plans.queries_streaming",
    "cli_rag_spark.plans.queries_storage",
    "cli_rag_spark.plans.queries_corpus",
    "cli_rag_spark.plans.queries_mining",
    "cli_rag_spark.plans.queries_scale",
    "cli_rag_spark.plans.queries_quantiles",
]

# Registry ORDER is part of the external contract: the external audit
# verifies exactly the first 50 registry entries per round (VERDICT.md
# round 1, "Registry order starves the oracle"), so the head of the
# ordering decides which queries receive a driver verdict.
#
# ROTATION POLICY (VERDICT r2 "Next round #2"): the 50-slot head is
# rebuilt each round as
#   1. SENTINELS — one stable representative per operator family,
#      verified every round so a regression in any family is caught
#      the round it happens;
#   2. every query whose implementation or oracle CHANGED since its
#      last verdict;
#   3. every query that has NEVER had a driver verdict;
#   4. remaining slots filled least-recently-verified-first.
#
# STALENESS BOUND (kept current per VERDICT r7 "What's wrong #3";
# the arithmetic below MUST be updated whenever the registry count
# changes): with 197 registered queries, 17 sentinels and exactly 33
# rotating slots per round, a full pass over the 180 non-sentinel
# queries takes ceil(180/33) = 6 rounds, so the honest worst-case
# staleness of a driver verdict is ≤ 6 rounds (rounding DOWN here is
# how the r6 "~2 rounds" claim went wrong — count whole rounds, and
# remember category-2/3 load eats into the 33 before stale fill gets
# any) — PROVIDED the
# registry stops outgrowing the window. r6 left a 12-query
# never-judged backlog; r7 left 22; r9 cleared it to ZERO; the
# backlog stays zero through r12 (195/195 ever-judged, all green).
# NEW-QUERY CAP (adopted r8): at most 12 new judged queries per
# round; r13 adds TWO (ann_default_rules, knn_join_ivfpq_residual).
# The every-run
# correctness gate is NOT the driver window: every registered query
# is value- and dtype-exactly replayed against its DuckDB oracle on
# every local test run (tests/test_parity.py); the driver window is
# the independent external sample on top.
#
# Round-13 window: 17 sentinels; SIX category-2 re-entries whose
# implementation changed this round — knn_join_auto (the dispatched
# ivfpq branch now RERANKS BY DEFAULT through default_rerank_depth
# with ivfpq_rerank=0 as the explicit opt-out, and the LSH fallback
# geometry now comes from default_lsh_geometry(n_index) instead of
# the fixed 16/4 — VERDICT r12 #1 and #3), knn_join_ivfpq and
# ivfpq_rerank_topk (operators/pq.py grew default_rerank_depth
# around the operators both exercise; VERDICT r12 #1's "Done"
# explicitly names both green in CORRECTNESS_r13), knn_join_lsh
# (operators/knn.py grew default_lsh_geometry beside it; VERDICT
# r12 #3's "Done" names it green), and ivfpq_residual_topk (the
# nonzero-residual codebook seeding fix — residual_codebook — changed
# its values AND its oracle: plain lowest-id seeding picks the coarse
# centroids' identically-zero residuals, which at k_codes ≤ C zeroes
# the whole book), and tuner_widths (the two tuners gained a shared
# `exact=` ground-truth frame — VERDICT r12 #7's fusion; values
# unchanged, plan changed); TWO never-judged (category 3,
# within the 12-cap): ann_default_rules (the whole measured-default
# rule family — lsh geometry, rerank depth, C/√C, PQ birthday-bound
# geometry — evaluated over a seven-decade ladder with the oracle
# replaying the arithmetic in SQL, so the dispatch constants are
# judged data) and knn_join_ivfpq_residual (batch residual-encoded
# IVFADC — the measured fix for raw codes' noise-ranked home lists on
# the clustered corpus; full chain incl. per-(query, list) LUT in one
# oracle statement). Then least-recently-verified fill (25 slots,
# from CORRECTNESS_r1–r12 last-verdict rounds, oldest first,
# alphabetical within a round): 25 of the 28 remaining r7-verified
# queries, led by bloom_join_stats (the debt the r12 rotation comment
# named first). The r14 head is owed streaming_cusum, token_counts
# and video_frame_stats (the three displaced r7 queries), then the
# r8-verified cohort oldest-first
# (ann_ndcg_metrics, ann_rank_metrics, audio_fingerprint_groups,
# ...), then r9-verified.
_SENTINELS = [
    "chunk_reference",            # E2 chunking
    "mock_index_topk",            # E3/E4 embed+index pipeline
    "rag_context",                # E10 context assembly
    "image_decode_stats",         # E11 multimodal
    "cosine_topk",                # E5/E6 vector scoring + top-k
    "knn_join",                   # E7 kNN join
    "minhash_candidates",         # E8 dedup (LSH path)
    "dedup_components",           # E8 graph clustering
    "text_stats",                 # E9 text analysis
    "pricing_summary",            # E12 relational
    "bm25_topk",                  # lexical search
    "asof_click_attribution",     # temporal joins
    "salted_user_totals",         # skew-proof paths
    "hash_split_counts",          # training-data ops
    "streaming_sessionization",   # structured streaming
    "approx_distinct_users",      # approximate aggregates
    "hamming_topk",               # binary vectors (BINARY_VECTOR)
]
_PRIORITY = _SENTINELS + [
    # (2) changed since last verdict (one representative per changed
    # family, the r6 batching protocol — details in the rotation
    # comment above)
    "knn_join_auto", "knn_join_ivfpq", "ivfpq_rerank_topk",
    "knn_join_lsh", "ivfpq_residual_topk", "tuner_widths",
    # (3) never driver-checked: the two r13 additions
    "ann_default_rules", "knn_join_ivfpq_residual",
    # (4) least-recently-verified fill: 27 of the 28 remaining
    # r7-verified queries (alphabetical; video_frame_stats, displaced
    # by the second cat-3 entry, heads the r14 fill before the
    # r8-verified cohort)
    "bloom_join_stats", "bootstrap_ci_revenue", "bpe_pair_stats",
    "cheapest_supplier_per_part", "chunk_clean_stats",
    "cusum_changepoints", "decimal_exact_totals", "dedup_canonical",
    "dedup_incremental", "embedding_dim_stats", "embedding_norms",
    "event_type_stats", "funnel_counts", "gopher_quality_flags",
    "hourly_event_windows", "ivf_refined_topk", "json_props",
    "kcore_stats", "key_skew_stats", "label_centroids",
    "large_orders", "lm_perplexity", "lsh_recall_stats",
    "mixture_sample_counts", "ngram_novelty",
]


def _load():
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod_name in _PACKS:
        mod = import_module(mod_name)
        for name, fn in mod.QUERIES.items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} in {mod_name}")

            @functools.wraps(fn)
            def wrapped(spark, sf_dir, _fn=fn):
                # make queries self-sufficient regardless of how the
                # driver built its session / cwd:
                # - package importable on executor Python workers
                # - UTC session TZ (timestamp literals + formatting
                #   must match the oracle's naive-timestamp semantics)
                ensure_package_on_executors(spark)
                spark.conf.set("spark.sql.session.timeZone", "UTC")
                return _fn(spark, sf_dir)

            queries[name] = wrapped
        for name, sql in getattr(mod, "ORACLE", {}).items():
            if name not in mod.QUERIES:
                raise ValueError(f"oracle {name!r} in {mod_name} has no query")
            oracles[name] = sql

    missing = [n for n in _PRIORITY if n not in queries]
    if missing:
        raise ValueError(f"_PRIORITY names without a query: {missing}")
    ordered = {n: queries[n] for n in _PRIORITY}
    ordered.update((n, f) for n, f in queries.items() if n not in ordered)
    return ordered, oracles


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _load()[0]


def all_oracles() -> dict[str, str]:
    return _load()[1]
