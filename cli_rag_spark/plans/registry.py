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
#      last verdict (this round: the three sessionization oracles
#      re-typed to BIGINT, and decimal_exact_totals re-typed to
#      double — VERDICT r2 "What's wrong #1" / commit 663ae48);
#   3. every query that has NEVER had a driver verdict (this round:
#      the 17 carried from r1/r2 — all seven r2 LLM-pipeline ops,
#      three relational, seven events — plus the six new r3 queries:
#      partitioned_compaction and the corpus-curation pack);
#   4. remaining slots filled least-recently-verified-first (r1-only
#      queries, rotated out of the r2 window).
# After this round every one of the 96 registered queries has a green
# verdict in r1 ∪ r2 ∪ r3.
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
    # (2) changed since last verdict: oracle re-typed in 663ae48
    "sessionization", "session_log", "decimal_exact_totals",
    # (3) never driver-checked: r2 LLM-pipeline additions
    "kmeans_clusters", "knn_join_ivf", "vocab_topk",
    "gopher_quality_flags", "pii_redaction_stats", "dedup_incremental",
    "mixture_sample_counts",
    # (3) never driver-checked: relational + events carried from r1
    "large_orders", "cheapest_supplier_per_part", "top_revenue_suppliers",
    "event_type_stats", "ordered_funnel", "rolling_user_value",
    "hourly_event_windows", "json_props", "user_running_value",
    "funnel_counts",
    # (3) never driver-checked: new r3 storage + corpus + vector +
    # streaming ops
    "partitioned_compaction",
    "repetition_scores", "bpe_pair_stats", "dedup_canonical",
    "semantic_dedup", "embedding_dim_stats", "lm_perplexity",
    "pq_topk", "streaming_interval_join",
    # (4) least-recently-verified fill (r1-only, rotated out in r2)
    "embedding_norms", "label_centroids", "returned_item_customers",
    "orders_upsert_stats",
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
