"""Unit tests for the scale-ops pack's operators (queries_scale.py):
key-skew profiling, Bloom runtime-filter join, CUSUM change points,
weighted label propagation, Poisson bootstrap. Oracle parity for the
judged queries lives in test_parity.py; these pin the operator
CONTRACTS on handcrafted inputs where the right answer is computable
by eye."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cli_rag_spark.operators.bloom import bloom_filtered_join
from cli_rag_spark.operators.bootstrap import (
    MAX_MULT,
    POISSON1_THRESHOLDS,
    bootstrap_ci,
    poisson_bootstrap_sums,
)
from cli_rag_spark.operators.components import label_propagation
from cli_rag_spark.operators.drift import cusum_changepoints
from cli_rag_spark.operators.skew import key_skew_profile

# --- key_skew_profile -----------------------------------------------


def test_key_skew_profile_hand_computed(spark):
    # keys: a x6, b x2, c x1, d x1  -> counts {6,2,1,1}
    df = spark.createDataFrame([("a",)] * 6 + [("b",)] * 2 + [("c",), ("d",)], "k string")
    out = key_skew_profile(df, F.col("k")).collect()[0]
    assert out["total_rows"] == 10
    assert out["distinct_keys"] == 4
    assert out["max_cnt"] == 6
    # sorted per-key counts: [1,1,2,6]; rank ceil(4/2)=2 -> 1;
    # rank ceil(0.99*4)=4 -> 6
    assert out["p50_cnt"] == 1
    assert out["p99_cnt"] == 6
    assert out["max_share_ppm"] == 600000
    assert out["skew_x100"] == 600


def test_key_skew_profile_uniform(spark):
    df = spark.createDataFrame([(i % 5,) for i in range(25)], "k int")
    out = key_skew_profile(df, F.col("k")).collect()[0]
    assert out["max_cnt"] == out["p50_cnt"] == out["p99_cnt"] == 5
    assert out["skew_x100"] == 100
    assert out["max_share_ppm"] == 200000


# --- bloom_filtered_join --------------------------------------------


def test_bloom_filtered_join_equals_plain_join(spark):
    fact = spark.createDataFrame(
        [(i, i * 10) for i in range(200)], "fk long, payload long"
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(0, 200, 7)], "dk long, name string"
    )
    got = (
        bloom_filtered_join(fact, dim, "fk", "dk", n_bits=1 << 10)
        .select("fk", "payload", "name")
        .collect()
    )
    want = (
        fact.join(dim, fact.fk == dim.dk).select("fk", "payload", "name").collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) == len(range(0, 200, 7))


# --- cusum_changepoints ---------------------------------------------


def test_cusum_finds_level_shift(spark):
    # 10 points: five 1s then five 9s — mean 5, the cumulative
    # deviation peaks exactly at the last low point (t=5)
    rows = [("a", t, 1 if t <= 5 else 9) for t in range(1, 11)]
    df = spark.createDataFrame(rows, "g string, t int, x int")
    out = cusum_changepoints(df, F.col("g"), F.col("t"), F.col("x")).collect()
    assert len(out) == 1
    r = out[0]
    assert r["group"] == "a"
    assert r["n_points"] == 10 and r["total"] == 50
    assert r["cp_t"] == 5
    # n*S_5 = sum of 5 terms (10*1 - 50) = -200
    assert r["cusum_abs"] == 200


def test_cusum_tie_breaks_to_earliest(spark):
    # constant series: every prefix sum is 0 — earliest t wins
    df = spark.createDataFrame([("a", t, 3) for t in range(1, 6)], "g string, t int, x int")
    r = cusum_changepoints(df, F.col("g"), F.col("t"), F.col("x")).collect()[0]
    assert r["cusum_abs"] == 0 and r["cp_t"] == 1


def test_cusum_multiple_groups_independent(spark):
    rows = [("a", t, 1 if t <= 2 else 5) for t in range(1, 5)]
    rows += [("b", t, 7) for t in range(1, 4)]
    df = spark.createDataFrame(rows, "g string, t int, x int")
    out = {r["group"]: r for r in cusum_changepoints(df, F.col("g"), F.col("t"), F.col("x")).collect()}
    assert out["a"]["cp_t"] == 2
    assert out["b"]["cusum_abs"] == 0 and out["b"]["cp_t"] == 1


# --- label_propagation ----------------------------------------------


def _edges(spark, pairs):
    bidir = [(a, b, w) for a, b, w in pairs] + [(b, a, w) for a, b, w in pairs]
    return spark.createDataFrame(bidir, "src long, dst long, w long")


def test_lpa_splits_two_dense_clusters(spark):
    # two triangles (heavy internal edges) joined by one thin bridge:
    # ONE connected component but TWO communities
    pairs = [
        (0, 1, 10), (1, 2, 10), (0, 2, 10),
        (10, 11, 10), (11, 12, 10), (10, 12, 10),
        (2, 10, 1),
    ]
    labels = label_propagation(_edges(spark, pairs), iters=2, weight="w")
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert len(got) == 6
    left = {got[n] for n in (0, 1, 2)}
    right = {got[n] for n in (10, 11, 12)}
    assert len(left) == 1 and len(right) == 1
    assert left != right


def test_lpa_tie_breaks_to_smallest_label(spark):
    # node 1 sees nodes 0 and 2 with EQUAL weight: label 0 must win
    labels = label_propagation(_edges(spark, [(0, 1, 5), (1, 2, 5)]), iters=1, weight="w")
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert got[1] == 0


def test_lpa_unweighted_defaults_to_count(spark):
    labels = label_propagation(
        spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long"), iters=1
    )
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert got == {0: 1, 1: 0}  # one synchronous swap round


def test_lpa_rejects_negative_ids_and_bad_iters(spark):
    neg = spark.createDataFrame([(-1, 2, 1)], "src long, dst long, w long")
    # inline raise_error fires during the eager edge checkpoint —
    # still inside the call, but surfaced as a Spark execution error
    with pytest.raises(Exception, match="non-negative"):
        label_propagation(neg, weight="w")
    ok = spark.createDataFrame([(1, 2, 1)], "src long, dst long, w long")
    with pytest.raises(ValueError, match="iters"):
        label_propagation(ok, weight="w", iters=0)


# --- Poisson bootstrap ----------------------------------------------


def test_poisson_thresholds_monotone():
    t = POISSON1_THRESHOLDS
    assert t == sorted(t) and len(t) == MAX_MULT
    assert 0 < t[0] < t[-1] < 1 << 32


def test_bootstrap_sums_shape_and_determinism(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(1, 101)], "k long, v double")
    a = poisson_bootstrap_sums(df, F.col("k"), F.col("v"), 8).collect()
    b = poisson_bootstrap_sums(df, F.col("k"), F.col("v"), 8).collect()
    assert sorted((r["b"], str(r["replica_sum"])) for r in a) == sorted(
        (r["b"], str(r["replica_sum"])) for r in b
    )
    assert {r["b"] for r in a} == set(range(8))
    # Poisson(1) replica totals hover around the true total (5050):
    # all within a factor of 2 is a loose sanity envelope, not a
    # statistical assertion
    for r in a:
        assert 2525 < float(r["replica_sum"]) < 10100


def test_bootstrap_ci_bounds_ordered(spark):
    df = spark.createDataFrame([(i, 10.0) for i in range(200)], "k long, v double")
    r = bootstrap_ci(df, F.col("k"), F.col("v"), n_replicas=16, trim=1).collect()[0]
    assert r["n_replicas"] == 16
    assert r["point_est"] == 2000.0
    assert r["ci_lo"] <= r["ci_hi"]
    assert 1000.0 < r["ci_lo"] and r["ci_hi"] < 4000.0


def test_bootstrap_ci_single_scan_plan(spark):
    """r16: the point estimate rides the replica aggregation (every
    digest group's plain sum(v) IS the full total), so bootstrap_ci
    scans its input once — no second scan, no crossJoin."""
    df = spark.createDataFrame([(i, float(i)) for i in range(50)], "k long, v double")
    plan = (
        bootstrap_ci(df, F.col("k"), F.col("v"), n_replicas=8, trim=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ExistingRDD") == 1, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_bootstrap_ci_empty_input_null_row(spark):
    """Empty frame -> one row of NULLs, not an ANSI
    ARRAY_INDEX_OUT_OF_BOUNDS from element_at on the empty replica
    array (ADVICE r6)."""
    df = spark.createDataFrame([], "k long, v double")
    r = bootstrap_ci(df, F.col("k"), F.col("v"), n_replicas=8, trim=1).collect()[0]
    assert r["n_replicas"] == 8
    assert r["point_est"] is None and r["ci_lo"] is None and r["ci_hi"] is None


def test_bootstrap_validates_params(spark):
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    with pytest.raises(ValueError, match="n_replicas"):
        poisson_bootstrap_sums(df, F.col("k"), F.col("v"), 1)
    with pytest.raises(ValueError, match="trim"):
        bootstrap_ci(df, F.col("k"), F.col("v"), n_replicas=4, trim=2)


# --- k_core ---------------------------------------------------------


def test_kcore_peels_chain_keeps_cycle(spark):
    # a 4-cycle (every node degree 2) with a pendant chain hanging
    # off it: the 2-core is exactly the cycle — round 1 peels the
    # chain tip, round 2 the next link, round 3 the last
    from cli_rag_spark.operators.components import k_core, k_core_stats

    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    core = {r["node"] for r in k_core(edges, k=2, rounds=3).collect()}
    assert core == {0, 1, 2, 3}
    stats = k_core_stats(edges, k=2, rounds=3).collect()[0]
    assert (stats["core_nodes"], stats["core_edges"], stats["n_below_k"]) == (4, 4, 0)


def test_kcore_partial_peel_reports_nonconvergence(spark):
    # a 5-link chain needs 3 peels from EACH end to empty; after 1
    # round the survivors still contain degree-1 nodes -> n_below_k>0
    from cli_rag_spark.operators.components import k_core_stats

    chain = [(i, i + 1) for i in range(6)]
    edges = spark.createDataFrame(chain, "src long, dst long")
    one = k_core_stats(edges, k=2, rounds=1).collect()[0]
    assert one["n_below_k"] > 0
    full = k_core_stats(edges, k=2, rounds=3).collect()[0]
    assert (full["core_nodes"], full["core_edges"], full["n_below_k"]) == (0, 0, 0)


def test_kcore_ignores_self_loops_and_validates(spark):
    from cli_rag_spark.operators.components import k_core

    loops = spark.createDataFrame([(1, 1), (1, 2)], "src long, dst long")
    assert k_core(loops, k=2, rounds=1).count() == 0
    with pytest.raises(ValueError, match="k must be"):
        k_core(loops, k=0)
    with pytest.raises(ValueError, match="rounds"):
        k_core(loops, k=1, rounds=0)


def test_bloom_filtered_join_preserves_duplicate_fact_rows(spark):
    # inner-join multiplicity: three fact rows on one dim key must
    # all survive the prefilter and appear once each
    fact = spark.createDataFrame([(7, 1), (7, 2), (7, 3), (8, 4)], "fk long, payload long")
    dim = spark.createDataFrame([(7, "d7")], "dk long, name string")
    got = sorted(
        (r["fk"], r["payload"]) for r in
        bloom_filtered_join(fact, dim, "fk", "dk", n_bits=1 << 8).collect()
    )
    assert got == [(7, 1), (7, 2), (7, 3)]


def test_key_skew_profile_single_key(spark):
    df = spark.createDataFrame([(1,)] * 9, "k int")
    out = key_skew_profile(df, F.col("k")).collect()[0]
    assert out["distinct_keys"] == 1
    assert out["max_cnt"] == out["p50_cnt"] == out["p99_cnt"] == 9
    assert out["max_share_ppm"] == 1000000
    assert out["skew_x100"] == 100


class TestScaledShuffleWidth:
    """session.scaled_shuffle_width (VERDICT r10 #2): the scale-aware
    exchange-width rule behind the overlap matrix's 1000x fix."""

    def test_rule_arithmetic(self, spark):
        from cli_rag_spark.session import scaled_shuffle_width

        base = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # under budget: caller changes nothing
        assert scaled_shuffle_width(spark, 0) is None
        assert scaled_shuffle_width(spark, base * 32 * 1024 * 1024) is None
        # one byte over the base budget: first width past base
        got = scaled_shuffle_width(spark, base * 32 * 1024 * 1024 + 1)
        assert got == base + 1
        # cap bounds scheduler pressure
        assert scaled_shuffle_width(spark, 10**15) == 4096
        import pytest

        with pytest.raises(ValueError, match="non-negative"):
            scaled_shuffle_width(spark, -1)

    def test_keyed_repartition_plus_distinct_is_one_exchange(self, spark):
        """The distinct's HashAggregate must REUSE the keyed
        repartition exchange (same keys satisfy ClusteredDistribution)
        — the claim that the widened plan still has exactly one
        shuffle."""
        df = spark.range(1000).select(
            (F.col("id") % 7).alias("a"), (F.col("id") % 11).alias("b")
        )
        out = df.repartition(64, "a", "b").distinct()
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert final.count("Exchange") == 1, plan
        assert "hashpartitioning(a" in final and ", 64)" in final

    def test_overlap_matrix_local_plan_unchanged(self, spark, sf_dir):
        """At fixture scale the estimate sits far under the base
        budget: the rule returns None and the judged plan carries NO
        repartition node (zero local tax, byte-identical to r10)."""
        from cli_rag_spark.plans.registry import all_queries

        df = all_queries()["source_overlap_matrix"](spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "RoundRobinPartitioning" not in plan
        # hash-partitioned exchanges exist (distinct, join) but none at
        # a widened explicit count: the explicit repartition would show
        # hashpartitioning(source, fp, <n>) with n > shuffle.partitions
        base = int(spark.conf.get("spark.sql.shuffle.partitions"))
        import re

        for m in re.finditer(r"hashpartitioning\([^)]*?(\d+)\)", plan):
            assert int(m.group(1)) <= base, m.group(0)

    def test_dir_bytes_counts_data_files_only(self, spark, tmp_path):
        from cli_rag_spark.sources.artifacts import dir_bytes

        p = str(tmp_path / "t")
        spark.range(100).write.parquet(p)
        import os as _os

        want = sum(
            _os.path.getsize(_os.path.join(root, f))
            for root, _, files in _os.walk(p)
            for f in files
            if not f.startswith(("_", "."))
        )
        assert dir_bytes(spark, p) == want > 0
        import pytest

        with pytest.raises(ValueError, match="does not exist"):
            dir_bytes(spark, str(tmp_path / "nope"))
