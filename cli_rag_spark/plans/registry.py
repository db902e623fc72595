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
    return queries, oracles


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _load()[0]


def all_oracles() -> dict[str, str]:
    return _load()[1]
