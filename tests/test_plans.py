"""Physical-plan regression tests — the BENCH.md plan audit, automated.

These lock in the scale-critical plan properties: a refactor that
silently turns a broadcast join into a nested loop, drops a pushdown,
or adds a full sort should fail HERE, not at 100 TB.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def _plan(spark, sf_dir, name: str) -> str:
    df = entrymod.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_topk_never_full_sorts(spark, sf_dir):
    for name in ("cosine_topk", "hamming_topk", "quantized_topk", "mock_index_topk"):
        plan = _plan(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in plan, name


def test_pricing_summary_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # column pruning: the scan must not read all 11 lineitem columns
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert read_schema.count(",") < 10


def test_asof_is_a_window_not_a_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "asof_click_attribution")
    assert "Window" in plan
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan, bad


def test_no_nested_loops_anywhere_it_matters(spark, sf_dir):
    # these queries join real row sets — a nested loop is a scale bug
    # (1-row-broadcast topk queries are exempt: NLJ against one row is fine)
    for name in ("range_click_burst", "minhash_candidates", "knn_join_lsh",
                 "shipping_priority", "returned_item_customers", "orders_upsert_stats"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        if name != "minhash_candidates":  # its tiny stats frame may NLJ under AQE
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_dim_joins_broadcast(spark, sf_dir):
    for name in ("shipping_priority", "top_customers_per_nation", "returned_item_customers"):
        plan = _plan(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, name


def test_streaming_free_queries_have_single_wide_shuffle(spark, sf_dir):
    # sessionization: both window passes must reuse ONE (user_id) shuffle
    plan = _plan(spark, sf_dir, "sessionization")
    n_user_shuffles = plan.count("Exchange hashpartitioning(user_id")
    assert n_user_shuffles == 1, plan[:500]


def test_bad_sf_dir_is_clean_analysis_error(spark):
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException, match="PATH_NOT_FOUND|Path does not exist"):
        entrymod.queries()["cosine_topk"](spark, "/root/testdata/sf-nope").count()


def test_filter_suite_stays_jvm_side(spark, sf_dir):
    # the quality/PII/mixture pipeline ops must plan as pure JVM maps:
    # a Python UDF sneaking in (BatchEvalPython / ArrowEvalPython)
    # would cut throughput ~10-100x at scale
    for name in ("gopher_quality_flags", "pii_redaction_stats", "mixture_sample_counts",
                 "session_log"):
        plan = _plan(spark, sf_dir, name)
        assert "EvalPython" not in plan, name
    # each doc is tokenized exactly once per token stream (text +
    # lowered text): the staged projections in with_quality_metrics
    # must survive CollapseProject — ~30 split() copies otherwise
    plan = _plan(spark, sf_dir, "gopher_quality_flags")
    assert plan.count("split(") == 2, plan.count("split(")


def test_mixture_sample_is_pre_aggregation_filter(spark, sf_dir):
    # the sampling filter must run before the groupBy shuffle (a map-
    # side filter), never after it — at scale it prunes the shuffle
    plan = _plan(spark, sf_dir, "mixture_sample_counts")
    filter_pos = plan.index("Filter")
    exchange_pos = plan.index("Exchange")
    # executedPlan prints top-down: the Exchange node appears ABOVE
    # (before, textually) the Filter it consumes
    assert exchange_pos < filter_pos
