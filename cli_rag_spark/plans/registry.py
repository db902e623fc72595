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
# changes): with 193 registered queries, 17 sentinels and exactly 33
# rotating slots per round, a full pass over the 176 non-sentinel
# queries takes ceil(176/33) = 6 rounds, so the honest worst-case
# staleness of a driver verdict is ≤ 6 rounds (rounding DOWN here is
# how the r6 "~2 rounds" claim went wrong — count whole rounds, and
# remember category-2/3 load eats into the 33 before stale fill gets
# any) — PROVIDED the
# registry stops outgrowing the window. r6 left a 12-query
# never-judged backlog; r7 left 22; r9 cleared it to ZERO; the
# backlog stays zero through r10 (190/190 ever-judged, all green).
# NEW-QUERY CAP (adopted r8): at most 12 new judged queries per
# round; r11 adds THREE (dedup_near_auto_count,
# overlap_matrix_incremental, knn_join_ivfpq). The every-run
# correctness gate is NOT the driver window: every registered query
# is value- and dtype-exactly replayed against its DuckDB oracle on
# every local test run (tests/test_parity.py); the driver window is
# the independent external sample on top.
#
# Round-11 window: 17 sentinels; EIGHT category-2 re-entries whose
# implementation or oracle changed this round — lp_communities
# (label_propagation round-1 identity fusion: no |V| distinct, no
# first join — VERDICT r10 #3), hits_top_suppliers (hub_0 = 1.0
# count-free seed, ORACLE CHANGED with it; also re-covers the
# artifacts.py staging-sweep hardening from ADVICE r10, since its
# edges load through the persisted pair artifact), knn_join_auto
# (verify_index_content fingerprint gate + pre-collect GEMM element
# budget + the √C default probe width — ADVICE r10 + VERDICT r10
# #1), vdb_roundtrip_stats (read_vdb_distributed length/offset
# validation, ADVICE r10 #4), source_overlap_matrix (the
# scale-aware shuffle-width rule + columnar-cache materialization
# ahead of its distinct, VERDICT r10 #2 — first driver verdict for
# this query since the rule landed), curation_funnel (the measured
# materialization policy from the 1000× composed rehearsal: the
# quality-kept and exact-dedup survivor tables persist through the
# columnar cache — 5.35 → 0.82-1.32 s at sf0.1, VERDICT r10 #6),
# and ivf_recall_stats + ivf_sqrt_partition_stats (VERDICT r10 #1's
# "Done" names both explicitly; operators/ann.py changed this round
# — default_n_probe is now knn_join_auto's unset default and
# tune_n_probe shares the module — so the IVF probe/recall chain
# gets fresh external verdicts alongside the grown-C recall booking);
# THREE never-judged (category 3, within the 12-cap): the r11
# additions dedup_near_auto_count (the near-dup dispatcher judged
# end-to-end; its oracle pins the allpairs route at oracle scale,
# closing the r10 gap where choose_dedup_strategy was test-only —
# and d604c4b changed its sampling, so the dispatcher is also
# freshly changed code) and overlap_matrix_incremental (VERDICT
# r10 #7a — snapshot + delta maintenance, oracle = the batch
# recomputation verbatim) and knn_join_ivfpq (the batch IVFADC
# join — the sub-linear E7 member the routed-shape measurement
# demanded; full-chain oracle). Then least-recently-verified fill
# (22 slots, reconstructed from CORRECTNESS_r1–r10 last-verdict
# rounds, oldest first, alphabetical within a round): ALL 17
# remaining r5-verified (matryoshka_topk, maxsim_topk,
# ols_token_chars, quality_drift_ks, quality_drift_psi,
# setsim_pairs, snapshot_cdc_stats, snapshot_ref_travel,
# snapshot_schema_evolution, snapshot_time_travel,
# snapshot_vacuum_stats, streaming_incremental_dedup,
# streaming_trending, tfidf_cosine_topk, token_budget_sample,
# triangle_census, weighted_sample_stats) and the first 5 r6-verified
# (anomalous_events, audio_window_stats, binary_metadata,
# chunk_fixed, cosine_histogram — 22 fill slots after the three
# extra cat-2 entries and the three cat-3 entries displaced the
# last five r6 fills, decontamination, dedup_exact_count,
# event_transitions, fingerprint_dups and hybrid_rrf_topk, to the
# r12 head). The r12 head is owed: decontamination,
# dedup_exact_count, event_transitions, fingerprint_dups,
# hybrid_rrf_topk, then the remaining r6-verified oldest-first
# (lang_id_confusion, maxsim_rerank, mixture_weights,
# ngram_jaccard, pack_chunks_stats, price_percentiles, ...), then
# r7-verified.
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
    "lp_communities", "hits_top_suppliers", "knn_join_auto",
    "vdb_roundtrip_stats", "source_overlap_matrix", "curation_funnel",
    "ivf_recall_stats", "ivf_sqrt_partition_stats",
    # (3) never driver-checked: the three r11 additions
    "dedup_near_auto_count", "overlap_matrix_incremental",
    "knn_join_ivfpq",
    # (4) least-recently-verified fill: all 17 remaining r5-verified...
    "matryoshka_topk", "maxsim_topk", "ols_token_chars",
    "quality_drift_ks", "quality_drift_psi", "setsim_pairs",
    "snapshot_cdc_stats", "snapshot_ref_travel",
    "snapshot_schema_evolution", "snapshot_time_travel",
    "snapshot_vacuum_stats", "streaming_incremental_dedup",
    "streaming_trending", "tfidf_cosine_topk", "token_budget_sample",
    "triangle_census", "weighted_sample_stats",
    # ...then the first 5 r6-verified (alphabetical)
    "anomalous_events", "audio_window_stats", "binary_metadata",
    "chunk_fixed", "cosine_histogram",
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
