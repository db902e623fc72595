"""Unit tests for the mining pack operators: setsim (prefix-filter
exactness), pagerank (numpy parity, dangling mass), heavy hitters
(pigeonhole completeness across partitions), bloom semi-join (no
false negatives, prefilter pruning), weighted sampling (determinism,
weight monotonicity)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cli_rag_spark.operators.bloom import bloom_might_contain, bloom_semi_join, build_bloom
from cli_rag_spark.operators.heavy import frequent_tokens
from cli_rag_spark.operators.pagerank import pagerank
from cli_rag_spark.operators.setsim import setsim_join, setsim_join_brute
from cli_rag_spark.operators.training import weighted_sample
from cli_rag_spark.sources.documents import load_table


# --------------------------------------------------------------- setsim

def test_setsim_prefix_filter_equals_brute(spark, sf_smoke_dir):
    docs = load_table(spark, sf_smoke_dir, "documents")
    for tau in (0.4, 0.7):
        fast = setsim_join(docs, "doc_id", "text", tau, shingle_words=3)
        brute = setsim_join_brute(docs, "doc_id", "text", tau, shingle_words=3)
        f = sorted(map(tuple, fast.collect()))
        b = sorted(map(tuple, brute.collect()))
        assert f == b, f"tau={tau}: prefix filtering changed the result"
        assert len(f) > 0 or tau > 0.5  # fixture has near-dup pairs at low tau


def test_setsim_single_scan_plan(spark, sf_smoke_dir):
    """r16 (VERDICT r15 #1): the shared tokenize+df derivation
    materializes ONCE as the narrow (id, h, df) token-stream
    localCheckpoint — every consumer (both prefix join sides, both
    verify sides) derives from that RDD, so the visible plan carries
    ZERO parquet scans (r14: 8 — the corpus was re-tokenized per
    consumer) and the one scan+tokenize pass lives inside the
    checkpoint's own lineage. The checkpoint rows are narrow: no
    array column is ever materialized."""
    docs = load_table(spark, sf_smoke_dir, "documents")
    out = setsim_join(docs, "doc_id", "text", 0.5, shingle_words=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 0, plan
    assert "Scan ExistingRDD" in plan, plan
    # the narrow checkpoint schema: id, h, df — no toks array
    import re

    rdd_cols = re.findall(r"Scan ExistingRDD\[([^\]]*)\]", plan)
    assert rdd_cols and all("toks" not in c for c in rdd_cols), rdd_cols


def test_setsim_unigram_mode(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "x y z w")], ["id", "t"]
    )
    out = {(r.id_a, r.id_b): r.jaccard for r in setsim_join(df, "id", "t", 0.5).collect()}
    # |{a,b,c}| / |{a,b,c,d,e}| = 3/5
    assert out == {(1, 2): 0.6}


def test_setsim_threshold_validation(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "t"])
    with pytest.raises(ValueError):
        setsim_join(df, "id", "t", 0.0)
    with pytest.raises(ValueError):
        setsim_join(df, "id", "t", 1.5)


def test_setsim_identical_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "p q r"), (2, "p q r"), (3, "   "), (4, "")], ["id", "t"]
    )
    rows = setsim_join(df, "id", "t", 1.0).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in rows] == [(1, 2, 1.0)]


# ------------------------------------------------------------- pagerank

def _numpy_pagerank(edges, damping, iters):
    """Plain-double reference WITHOUT the dyadic grid: the operator
    must agree to ~grid resolution, proving the grid only snaps."""
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outw = np.zeros(n)
    for s, d, w in edges:
        outw[idx[s]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        dangling = 0.0
        for i in range(n):
            if outw[i] == 0:
                dangling += r[i]
        for s, d, w in edges:
            contrib[idx[d]] += r[idx[s]] * w / outw[idx[s]]
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {nodes[i]: r[i] for i in range(n)}


def test_pagerank_matches_numpy_with_dangling(spark):
    # 4 is a dangling sink (no out-edges): its mass must redistribute
    edges = [(1, 2, 1.0), (2, 3, 2.0), (3, 1, 1.0), (1, 4, 3.0), (2, 4, 1.0)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {r.node: r.rank for r in pagerank(df, weight="w", iters=4).collect()}
    want = _numpy_pagerank(edges, 0.85, 4)
    assert set(got) == set(want)
    for node in want:
        assert abs(got[node] - want[node]) < 1e-6, node


def test_pagerank_mass_conserved(spark):
    edges = [(1, 2, 1.0), (2, 1, 1.0), (2, 3, 1.0), (3, 2, 1.0)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    total = pagerank(df, weight="w", iters=3).agg(F.sum("rank")).first()[0]
    # dyadic floors only ever lose mass, and at most ~edges * 2^-30
    assert 0.999 < total <= 1.0


def test_pagerank_unweighted_default_and_validation(spark):
    df = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
    got = {r.node: r.rank for r in pagerank(df, iters=2).collect()}
    assert got[1] == pytest.approx(0.5, abs=1e-6)
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError):
        pagerank(df, iters=0)


def test_personalized_pagerank_hand_computed_with_dangling(spark):
    from cli_rag_spark.operators.pagerank import personalized_pagerank

    # A -> B, A is the only seed, B dangles; d = 0.5, 2 iterations:
    # r0: A=1, B=0
    # r1: A = 0.5 (teleport) + 0.5*dmass(0)/1 = 0.5; B = 0.5*1 = 0.5
    # r2: A = 0.5 + 0.5*0.5 (B's dangling mass -> seed) = 0.75
    #     B = 0.5 * rank(A)=0.5 -> 0.25
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.rank
        for r in personalized_pagerank(edges, seeds, damping=0.5, iters=2).collect()
    }
    assert got[1] == pytest.approx(0.75, abs=1e-6)
    assert got[2] == pytest.approx(0.25, abs=1e-6)


def test_personalized_pagerank_mass_concentrates_near_seeds(spark):
    from cli_rag_spark.operators.pagerank import personalized_pagerank

    # cycle 1 -> 2 -> 3 -> 4 -> 1 with seed {1}: at (near-)stationarity
    # rank decays geometrically with distance from the seed along the
    # edge direction (r_{k+1} = d * r_k for non-seeds). d = 0.5 makes
    # the wave mix fast; few-iteration snapshots of high-damping
    # cycles legitimately oscillate, which is NOT a defect.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.rank
        for r in personalized_pagerank(edges, seeds, damping=0.5, iters=8).collect()
    }
    assert got[1] > got[2] > got[3] > got[4] > 0.0
    # geometric profile: each hop halves the mass (within dyadic slack)
    assert got[2] == pytest.approx(got[1] / 2, rel=0.02)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-3)


def test_personalized_pagerank_unreached_node_gets_zero(spark):
    from cli_rag_spark.operators.pagerank import personalized_pagerank

    # 3 has no in-edges and is not a seed: nothing ever reaches it
    edges = spark.createDataFrame([(1, 2), (2, 1), (3, 1)], ["src", "dst"])
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.rank
        for r in personalized_pagerank(edges, seeds, iters=3).collect()
    }
    assert got[3] == 0.0


def test_personalized_pagerank_validation(spark):
    from cli_rag_spark.operators.pagerank import personalized_pagerank

    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    absent = spark.createDataFrame([(99,)], "node long")
    with pytest.raises(ValueError, match="seed"):
        personalized_pagerank(edges, absent)
    seeds = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(ValueError):
        personalized_pagerank(edges, seeds, damping=0.0)
    with pytest.raises(ValueError):
        personalized_pagerank(edges, seeds, iters=0)


# ------------------------------------------------------- heavy hitters

def test_frequent_tokens_exact_across_partitions(spark, sf_smoke_dir):
    docs = load_table(spark, sf_smoke_dir, "documents")
    for parts in (1, 7):
        got = {
            (r.token, r["count"])
            for r in frequent_tokens(docs.repartition(parts), "text", 5000).collect()
        }
        exact = (
            docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
            .where(F.col("token") != "")
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        n = exact.agg(F.sum("c")).first()[0]
        want = {
            (r.token, r.c)
            for r in exact.where(F.col("c") * 1_000_000 >= 5000 * n).collect()
        }
        assert got == want, f"parts={parts}"
        assert len(want) > 0


def test_frequent_tokens_validation(spark):
    df = spark.createDataFrame([("a",)], ["text"])
    with pytest.raises(ValueError):
        frequent_tokens(df, "text", 0)
    with pytest.raises(ValueError):
        frequent_tokens(df, "text", 2_000_000)


# ---------------------------------------------------------------- bloom

def test_bloom_semi_join_exact(spark):
    corpus = spark.range(2000).select(F.md5(F.col("id").cast("string")).alias("fp"), "id")
    probes = spark.range(0, 2000, 13).select(F.md5(F.col("id").cast("string")).alias("fp"))
    got = sorted(r.id for r in bloom_semi_join(corpus, probes, "fp").collect())
    want = sorted(r.id for r in corpus.join(probes, "fp", "semi").collect())
    assert got == want and len(want) == len(range(0, 2000, 13))


def test_bloom_no_false_negatives_and_prunes(spark):
    corpus = spark.range(5000).select(F.md5(F.col("id").cast("string")).alias("fp"), "id")
    probes = spark.range(10).select(F.md5((F.col("id") + 100000).cast("string")).alias("fp"))
    bf = build_bloom(probes, "fp", n_bits=1 << 12)
    # every true probe key passes its own filter (no false negatives)
    self_hits = probes.crossJoin(F.broadcast(bf)).where(
        bloom_might_contain(F.col("bf"), F.col("fp"), 1 << 12)
    )
    assert self_hits.count() == 10
    # disjoint corpus: the prefilter alone removes almost everything
    cand = corpus.crossJoin(F.broadcast(bf)).where(
        bloom_might_contain(F.col("bf"), F.col("fp"), 1 << 12)
    )
    assert cand.count() < 250  # << 5000; FP rate at m/n=409, k=7 is tiny
    # and the composed join is exactly empty
    assert bloom_semi_join(corpus, probes, "fp", n_bits=1 << 12).count() == 0


def test_bloom_validation(spark):
    probes = spark.range(5).select(F.col("id").cast("string").alias("fp"))
    with pytest.raises(ValueError):
        build_bloom(probes, "fp", n_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        build_bloom(probes, "fp", n_bits=1 << 10, k=0)


# ------------------------------------------------------ weighted sample

def test_weighted_sample_deterministic_and_bounded(spark, sf_smoke_dir):
    docs = load_table(spark, sf_smoke_dir, "documents")
    a = sorted(r.doc_id for r in weighted_sample(docs, "doc_id", "n_chars", 10).collect())
    b = sorted(r.doc_id for r in weighted_sample(docs, "doc_id", "n_chars", 10).collect())
    assert a == b and len(a) == 10
    n_pos = docs.where(F.col("n_chars") > 0).count()
    everything = weighted_sample(docs, "doc_id", "n_chars", n_pos + 50)
    assert everything.count() == n_pos
    with pytest.raises(ValueError, match="top-k envelope"):
        weighted_sample(docs, "doc_id", "n_chars", 10**9)


def test_weighted_sample_weight_monotonicity(spark):
    # one row with overwhelming weight is (essentially) always drawn:
    # its key is ~1e9 times smaller than any competitor's
    rows = [(i, 1.0) for i in range(100)] + [(999, 1e9)]
    df = spark.createDataFrame(rows, ["id", "w"])
    picked = {r.id for r in weighted_sample(df, "id", "w", 5).collect()}
    assert 999 in picked and len(picked) == 5


def test_weighted_sample_excludes_nonpositive(spark):
    df = spark.createDataFrame([(1, 0.0), (2, -3.0), (3, 2.0)], ["id", "w"])
    assert [r.id for r in weighted_sample(df, "id", "w", 10).collect()] == [3]
    with pytest.raises(ValueError):
        weighted_sample(df, "id", "w", 0)


# ------------------------------------------------------------- OLS

def test_ols_matches_numpy(spark, sf_dir):
    import numpy as np
    from cli_rag_spark.plans.queries_mining import q_ols_token_chars
    from cli_rag_spark.functions.text import tokens as tok_expr
    from cli_rag_spark.sources.documents import load_table

    got = {r.source: (r.slope, r.intercept, r.r2) for r in q_ols_token_chars(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "n_chars", F.size(tok_expr(F.col("text"))).alias("y")
    ).collect()
    by_src = {}
    for r in docs:
        by_src.setdefault(r.source, []).append((r.n_chars, r.y))
    for src, pts in by_src.items():
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        gs, gi, gr2 = got[src]
        assert abs(gs - slope) < 1e-4, src
        assert abs(gi - intercept) < 1e-3, src
        assert abs(gr2 - r * r) < 1e-4, src


# ------------------------------------------------------------- fuzzy join

def test_fuzzy_join_equals_brute(spark, sf_smoke_dir):
    # BOTH physical strategies (q-gram prefix + FastSS deletions) must
    # equal the brute-force spec
    from cli_rag_spark.operators.fuzzy import (
        deletion_join,
        fuzzy_join,
        fuzzy_join_brute,
    )

    cust = load_table(spark, sf_smoke_dir, "customer")
    for d in (1, 2):
        brute = sorted(map(tuple, fuzzy_join_brute(cust, "c_custkey", "c_name", d).collect()))
        grams = sorted(map(tuple, fuzzy_join(cust, "c_custkey", "c_name", d).collect()))
        dels = sorted(map(tuple, deletion_join(cust, "c_custkey", "c_name", d).collect()))
        assert grams == brute, f"gram strategy d={d}"
        assert dels == brute, f"deletion strategy d={d}"
        assert len(brute) > 0


def test_deletion_join_validation(spark):
    from cli_rag_spark.operators.fuzzy import deletion_join

    df = spark.createDataFrame([(1, "abc")], ["id", "s"])
    with pytest.raises(ValueError):
        deletion_join(df, "id", "s", -1)
    with pytest.raises(ValueError, match="neighborhood"):
        deletion_join(df, "id", "s", 3)


def test_fuzzy_join_short_string_fallback(spark):
    from cli_rag_spark.operators.fuzzy import fuzzy_join, fuzzy_join_brute

    # "ab" vs "cd": zero shared 2-grams yet within distance 2 — only
    # the short-string fallback can find it
    df = spark.createDataFrame(
        [(1, "ab"), (2, "cd"), (3, "wxyz"), (4, "wxya")], ["id", "s"]
    )
    fast = sorted(map(tuple, fuzzy_join(df, "id", "s", 2).collect()))
    brute = sorted(map(tuple, fuzzy_join_brute(df, "id", "s", 2).collect()))
    assert fast == brute
    assert (1, 2, 2) in fast


def test_fuzzy_join_validation_and_nulls(spark):
    import pytest
    from cli_rag_spark.operators.fuzzy import fuzzy_join

    df = spark.createDataFrame([(1, "aa"), (2, None)], ["id", "s"])
    assert fuzzy_join(df, "id", "s", 1).count() == 0  # null excluded
    with pytest.raises(ValueError):
        fuzzy_join(df, "id", "s", -1)
    with pytest.raises(ValueError):
        fuzzy_join(df, "id", "s", 1, q=0)


def test_fuzzy_auto_dispatch_pins_both_corpus_shapes(spark):
    """choose_fuzzy_strategy must pick FastSS on low-entropy
    identifier keys (the measured 222M-candidate q-gram blow-up
    corpus shape) and q-gram on high-entropy text — plus the hard
    gates (d=0 → fastss equi-join, d>2 → qgram, long-string d=2 →
    qgram). VERDICT r5 #6."""
    from cli_rag_spark.operators.fuzzy import choose_fuzzy_strategy

    # identifier-shaped: long constant region + zero-padded numerals —
    # every gram is shared by nearly every row
    ids = spark.createDataFrame(
        [(i, f"Customer#{i:09d}") for i in range(400)], ["id", "s"]
    )
    assert choose_fuzzy_strategy(ids, "id", "s", 1) == "fastss"
    assert choose_fuzzy_strategy(ids, "id", "s", 2) == "fastss"

    # high-entropy: random strings over a 36-char alphabet — the
    # rarest (prefix) grams are near-hapax. (A 16-char hex alphabet
    # is NOT high-entropy at q=2: only 256 possible grams, posting
    # lists grow with n, and fastss is genuinely the right pick.)
    import hashlib

    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"

    def rnd(i: int) -> str:
        h = hashlib.md5(bytes([i % 256, i // 256])).digest()
        return "".join(alpha[b % 36] for b in h[:12])

    words = spark.createDataFrame(
        [(i, rnd(i)) for i in range(400)], ["id", "s"]
    )
    assert choose_fuzzy_strategy(words, "id", "s", 1) == "qgram"

    # hard gates
    assert choose_fuzzy_strategy(ids, "id", "s", 0) == "fastss"
    assert choose_fuzzy_strategy(ids, "id", "s", 3) == "qgram"
    long_ids = spark.createDataFrame(
        [(i, f"Customer#{i:09d}" + "x" * 60) for i in range(100)], ["id", "s"]
    )
    assert choose_fuzzy_strategy(long_ids, "id", "s", 2) == "qgram"


def test_fuzzy_join_auto_equals_brute_on_both_shapes(spark):
    from cli_rag_spark.operators.fuzzy import fuzzy_join_auto, fuzzy_join_brute

    import hashlib

    ids = spark.createDataFrame(
        [(i, f"Customer#{i:09d}") for i in range(150)], ["id", "s"]
    )
    words = spark.createDataFrame(
        [(i, hashlib.md5(bytes([i])).hexdigest()[:10]) for i in range(150)],
        ["id", "s"],
    )
    for corpus in (ids, words):
        brute = sorted(map(tuple, fuzzy_join_brute(corpus, "id", "s", 1).collect()))
        auto = sorted(map(tuple, fuzzy_join_auto(corpus, "id", "s", 1).collect()))
        assert auto == brute


def test_pagerank_plan_shape_r6_invariants(spark):
    """Plan armor for the r6 restructure (BENCH.md ledger 0i): the
    iteration must never contain the old per-iteration dangling
    ANTI-join, and a dangling-FREE (e.g. bidirectional) graph must
    not even build the dangling crossJoin branch."""
    bidir = spark.createDataFrame(
        [(1, 2, 1.0), (2, 1, 1.0), (2, 3, 1.0), (3, 2, 1.0)],
        ["src", "dst", "w"],
    )
    # checkpoint=False keeps the full iteration lineage visible (the
    # lazy checkpoint otherwise hides it behind a LogicalRDD leaf)
    ranks = pagerank(bidir, weight="w", iters=2, checkpoint=False)
    plan = ranks._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan  # full lineage actually visible
    # dangling-free fast path: no 1-row dangling broadcast crossJoin
    assert "BroadcastNestedLoopJoin" not in plan
    assert "left_anti" not in plan.lower()

    dangling = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0)], ["src", "dst", "w"]  # 3 is a sink
    )
    ranks2 = pagerank(dangling, weight="w", iters=2, checkpoint=False)
    plan2 = ranks2._jdf.queryExecution().executedPlan().toString()
    # dangling branch present as the broadcast crossJoin of the 1-row
    # mass aggregate — but still NEVER as an anti-join
    assert "BroadcastNestedLoopJoin" in plan2
    assert "left_anti" not in plan2.lower()
    # both modes produce identical ranks
    with_ckpt = sorted(map(tuple, pagerank(dangling, weight="w", iters=2).collect()))
    without = sorted(map(tuple, ranks2.collect()))
    assert with_ckpt == without


def test_trade_edges_single_scan(spark, sf_smoke_dir):
    """The bidirectional edge emit must be ONE explode over the
    lineitem⋈orders aggregate, not a self-union that re-runs it
    (ledger 0i fix 3): exactly one Generate and one aggregate chain
    in the plan."""
    from cli_rag_spark.plans.queries_mining import _trade_edges

    plan = _trade_edges(spark, sf_smoke_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate") == 1
    assert "Union" not in plan


# --- HITS hubs & authorities (r7) ------------------------------------


def _numpy_hits(edges, iters):
    """Grid-free float reference — the dyadic snap only loses
    ~2^-30 per term, far below the 1e-6 assert tolerance."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    # hub_0 = 1.0 (r11): replays the operator's count-free uniform
    # seed; the first half-step L1-normalizes it away
    hub = [1.0] * n
    auth = [0.0] * n
    for _ in range(iters):
        auth = [0.0] * n
        for s, d, w in edges:
            auth[idx[d]] += hub[idx[s]] * w
        t = sum(auth)
        auth = [a / t if t > 0 else 0.0 for a in auth]
        hub = [0.0] * n
        for s, d, w in edges:
            hub[idx[s]] += auth[idx[d]] * w
        t = sum(hub)
        hub = [h / t if t > 0 else 0.0 for h in hub]
    return {v: (hub[idx[v]], auth[idx[v]]) for v in nodes}


def test_hits_matches_reference_weighted(spark):
    from cli_rag_spark.operators.pagerank import hits

    edges = [(1, 10, 1.0), (1, 11, 2.0), (2, 10, 3.0), (3, 11, 1.0), (10, 3, 1.0)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {r.node: (r.hub, r.auth) for r in hits(df, weight="w", iters=3).collect()}
    want = _numpy_hits(edges, 3)
    assert set(got) == set(want)
    for node in want:
        assert got[node][0] == pytest.approx(want[node][0], abs=1e-6), node
        assert got[node][1] == pytest.approx(want[node][1], abs=1e-6), node


def test_hits_bipartite_sides_and_l1(spark):
    from cli_rag_spark.operators.pagerank import hits

    # strictly bipartite: hubs only on sources, authority only on dsts
    edges = [(1, 10, 1.0), (2, 10, 1.0), (2, 11, 1.0)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    rows = {r.node: r for r in hits(df, weight="w", iters=2).collect()}
    assert rows[10].hub == 0.0 and rows[11].hub == 0.0
    assert rows[1].auth == 0.0 and rows[2].auth == 0.0
    # L1-normalized (dyadic floors lose at most ~nodes * 2^-30)
    assert 0.999 < sum(r.hub for r in rows.values()) <= 1.0
    assert 0.999 < sum(r.auth for r in rows.values()) <= 1.0
    # node 10 has two in-edges vs 11's one; 2 buys from both
    assert rows[10].auth > rows[11].auth
    assert rows[2].hub > rows[1].hub


def test_hits_validation(spark):
    from cli_rag_spark.operators.pagerank import hits

    df = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        hits(df, iters=0)
