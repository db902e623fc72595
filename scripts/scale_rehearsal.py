#!/usr/bin/env python
"""Scale rehearsal: measure how the compute-bound operator family
scales from sf0.1 to sf1-equivalent (1x/2x/5x/10x synthetic copies)
and fit the scaling exponent alpha in t ~ n^alpha.

Replica construction preserves the WORKLOAD SHAPE per replica while
destroying cross-replica similarity, so measured growth reflects the
engine, not an artifact of duplicated data:

- documents: replica i rotates the alphabet by i (translate()) —
  word/doc lengths, token structure, and intra-replica dup groups are
  identical to the original, but shingles never collide across
  replicas (no quadratic blow-up of MinHash candidate pairs).
- embeddings: replica i flips the sign of coordinate j where bit j of
  splitmix64(i) is set — an isometry (norms and intra-replica cosine
  distances exactly preserved) that scrambles cross-replica cosine
  structure and LSH buckets.
- orders/lineitem (the pagerank trade graph): replica i offsets every
  key (orderkey/custkey/suppkey) by i x (max+1) — the replicated
  graph is m disconnected copies, so per-iteration join/agg work
  grows exactly with edges while the rank dynamics stay comparable.

Usage: python scripts/scale_rehearsal.py [--runs 2]
Prints one JSON line per query with per-scale seconds and the fitted
exponent; paste the table into BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import string
import sys
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

# Local mode puts every executor thread in the driver JVM; the default
# 1g heap GC-thrashes on the 10x gram explosions (observed: GCLocker
# retry failure in repetition_scores at 10x). Must be set before the
# JVM launches.
os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 24g pyspark-shell")

from pyspark.sql import functions as F  # noqa: E402

from cli_rag_spark.functions.hashing import _splitmix64  # noqa: E402
from cli_rag_spark.plans import registry  # noqa: E402
from cli_rag_spark.session import get_session  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# cache key includes the base SF so switching SPARK_GRAFT_SF_DIR never
# silently reuses wrong-scale replicas
WORK = os.path.join(
    "/tmp/scale_rehearsal", os.path.basename(os.path.normpath(BASE_SF))
)
MULTIPLES = [1, 2, 5, 10]
QUERIES = [
    "minhash_candidates",
    "dedup_components",
    "knn_join_lsh",
    "embedding_near_dups",
    "bm25_topk",
    # r3 operators (VERDICT r3 "Next round #4")
    "repetition_scores",
    "lm_perplexity",
    "semantic_dedup",
    "pq_topk",
    # r5 operators: sparse lexical ranking (df-capped posting join),
    # DSIR (hashed-bucket log-ratio broadcast), iterative BPE (the
    # only corpus-scan is the word-freq build; 3 merge rounds then
    # touch vocabulary-sized state only)
    "tfidf_cosine_topk",
    "dsir_selection",
    "bpe_merges",
    # late-r5 mining pack: prefix-filtered setsim (inverted-index
    # candidate join), two-pass heavy hitters (pigeonhole prefilter),
    # bloom decontamination (broadcast bitmap), MaxSim late
    # interaction (broadcast query parts), PageRank (per-iteration
    # edge join over the replicated trade graph)
    "setsim_pairs",
    "heavy_hitter_terms",
    "bloom_decontamination",
    "maxsim_topk",
    "pagerank_top_nodes",
    # r6 stragglers (VERDICT r5 "Next round #7"): triangle census on
    # the (naturally skewed) MinHash candidate graph — replicated
    # docs keep per-replica dup-cluster degree skew while adding no
    # cross-replica edges, so wedge growth measures the
    # degree-orientation bound under skew
    "triangle_census",
    # late-r6 scale-ops pack: LPA over the replicated trade graph
    # (m disconnected copies — per-round join/agg work grows exactly
    # with edges), one-pass Poisson bootstrap (replica fan-out is a
    # map over orders rows — must be linear), key-skew profile (the
    # count-histogram stays m-invariant while groupBy input grows),
    # Bloom runtime-filter join (bitmap build grows with the dim,
    # probe with the fact — both linear, selectivity held constant
    # by construction), CUSUM (pre-agg scan linear, window frame
    # fixed at 30 days x 5 types)
    "lp_communities",
    "bootstrap_ci_revenue",
    "key_skew_stats",
    "bloom_join_stats",
    "cusum_changepoints",
    # k-core: rotated-alphabet replicas add candidate edges linearly
    # (no cross-replica shingle collisions), so peel work must track
    # the banding's α, not exceed it
    "kcore_stats",
    # r7 (VERDICT r6 #8): cross-corpus n-gram novelty — the open axis
    # is SHINGLE VOLUME: rotated-alphabet replicas grow the distinct
    # 3-gram space ~linearly (no cross-replica collisions), so both
    # the df-count groupBy and the fp-keyed novelty join must scale
    # with the shingle stream, pinned sort-merge (never broadcast)
    "ngram_novelty",
    # r7 additions. mmr_rerank: queries fixed at 10, so the axis is
    # the INDEX — the exact top-20 shortlist chain grows linearly
    # with replicated embeddings while the greedy stage stays
    # O(queries × 20²). image_dhash_groups: payload synth + decode +
    # hash are one map stage — must be linear in documents with the
    # groupBy key space fixed at ≤37 gradients per replica.
    # brand_affinity_pairs: replicated orders are m disconnected
    # basket populations over the SAME 25 brands, so basket-item
    # volume grows ×m while relative supports are invariant — the
    # set-build shuffle is the axis, the pair space is fixed.
    "mmr_rerank",
    "image_dhash_groups",
    "brand_affinity_pairs",
    # late-r7 session additions. hits_top_suppliers: replicated trade
    # graphs are m disconnected copies (pagerank axis) — each of the
    # 6 half-step join/agg passes must grow with edges, L1 totals are
    # 1-row aggregates at every scale. span_dedup_stats: rotated
    # alphabets keep per-replica span-dup structure and add no
    # cross-replica collisions — the segment-window shuffle is the
    # axis. video_scene_cuts: Arrow map stage over synthesized AVI
    # payloads — must be linear in documents like the decode rows.
    # streaming_quality_router: stateless tokenize scan through the
    # micro-batch machinery — scan-linear above the streaming floor.
    # ohlc_daily: disjoint-user event replicas grow window+agg input
    # linearly while the (type, day) key space is fixed.
    "hits_top_suppliers",
    "span_dedup_stats",
    "video_scene_cuts",
    "streaming_quality_router",
    "ohlc_daily",
    # late-r7. audio_fingerprint_groups: same map-stage genus as the
    # image dHash — linear per-payload work, nothing else grows.
    # hard_negative_mining: the exact scoring pass is the axis (the
    # index side grows; queries fixed at 10) — the anti-join + window
    # tail is output-bounded. ppr_top_nodes: per-iteration work grows
    # with edges exactly like pagerank (same replicated trade graph,
    # same dyadic machinery) — its alpha should track pagerank's 0.57.
    "audio_fingerprint_groups",
    "hard_negative_mining",
    "ppr_top_nodes",
    # r8 additions. curriculum_buckets: the score histogram is pinned
    # at <=1001 keys whatever the corpus — only the scan + map-side
    # histogram combine grow; the broadcast join-back is grid-sized.
    # mad_outlier_stats: same genus, cents grid bounded by the value
    # domain, per-type histograms. decayed_item_popularity: one scan
    # + a fixed 5-type aggregate — must be scan-linear under the
    # floor. source_overlap_matrix: rotated alphabets grow the
    # distinct (fp, source) table ~linearly with no cross-replica fp
    # collisions; the pinned sort-merge self-join is the axis, the
    # pair space stays at |sources|**2. token_truncation_stats: pure
    # scan + 20-key partial agg — the floor-flat control row.
    "curriculum_buckets",
    "mad_outlier_stats",
    "decayed_item_popularity",
    "source_overlap_matrix",
    "token_truncation_stats",
    # degree_distribution: replicated trade graphs are m disjoint
    # copies — the distinct-pair and per-node degree aggregates grow
    # with edges, the bin rollup stays <=64 keys per role.
    # table_profile: six pruned single-column scans + exact distinct
    # aggs over the growing orders table — distinct key spaces grow
    # with the replicas (keys are offset per replica), so this is the
    # scan+agg-linear member, never quadratic.
    "degree_distribution",
    "table_profile",
    # quantile-values consumers: both are histogram-grid-bounded like
    # curriculum/mad — the scan grows, the CDF window never does.
    "source_quality_quantiles",
    "winsorized_revenue_stats",
]


def _semantic_dedup_scaled_k(m: int):
    """SemDeDup with k GROWING with N (8·m centroids at m×): the
    per-cluster O((N/k)²) contract says constant cluster size keeps
    within-cluster GEMM work LINEAR in N — this variant demonstrates
    it, next to the registry query's fixed-k=8 run whose within-
    cluster work is O(N²/k)."""
    from cli_rag_spark.operators.ann import assign_centroids, seed_centroids
    from cli_rag_spark.operators.dedup import embedding_near_pairs
    from cli_rag_spark.plans.queries_corpus import SEM_EPS
    from cli_rag_spark.sources.documents import load_table

    def run(spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        cent = seed_centroids(emb, 8 * m)
        assign = assign_centroids(emb, cent)
        v = emb.join(assign, "vec_id").select("vec_id", "cid", "embedding")
        pairs = embedding_near_pairs(
            v, SEM_EPS, id_col="vec_id", vec_col="embedding",
            bucket_col="cid", n_blocks=4,
        )
        dup_ids = pairs.select(F.col("id_b").alias("vec_id")).distinct()
        return (
            v.join(dup_ids.withColumn("_dup", F.lit(1)), ["vec_id"], "left")
            .groupBy("cid")
            .agg(
                F.count(F.lit(1)).alias("n_vectors"),
                F.sum(F.coalesce(F.col("_dup"), F.lit(0))).alias("n_dropped"),
            )
        )

    return run


def _resample_all_users(m: int):
    """resample_ffill over EVERY user (the judged query bounds to 10
    users to keep its oracle small — the rehearsal measures the grid-
    explosion envelope instead): grid rows = users × span-hours, and
    replicas add disjoint user populations over the same span, so the
    envelope grows linearly in m. The explosive axis at 100 TB is the
    SPAN (users × years × fine steps) — the knob is ``step`` (coarser
    slots) or a span filter; this measures the users axis."""
    from cli_rag_spark.operators.resample import resample_ffill
    from cli_rag_spark.sources.documents import load_table

    def run(spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        return resample_ffill(ev, "user_id", "ts", "value", 3600, agg="sum")

    return run


def _snapshot_optimize_cycle(m: int):
    """The lakehouse maintenance lifecycle under SUSTAINED
    fragmentation: base table from orders at m×, then 4 bucket-CoW
    upsert rounds (each leaves multi-file buckets behind), then
    OPTIMIZE back to ≤1 file/bucket. Timed end-to-end; the optimize
    report is printed as its own JSON line so files_before/after are
    on the record next to the α row."""
    import shutil as _sh
    import tempfile

    from cli_rag_spark.sources.snapshots import (
        optimize_snapshot,
        upsert_snapshot,
        write_snapshot,
    )

    def run(spark, sf_dir):
        root = os.path.join("/tmp/scale_rehearsal_snap", f"x{m}")
        if os.path.isdir(root):
            _sh.rmtree(root)
        os.makedirs(root, exist_ok=True)
        path = os.path.join(root, "tbl")
        orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        write_snapshot(orders, path, "o_orderkey")
        for r in range(4):
            batch = orders.where(F.col("o_orderkey") % 4 == r).withColumn(
                "o_orderstatus", F.lit(f"R{r}")
            )
            upsert_snapshot(spark, path, batch)
        report = optimize_snapshot(spark, path, max_files_per_bucket=1)
        print(json.dumps({"query": "snapshot_optimize_cycle", "scale": m,
                          **{k: report[k] for k in ("files_before", "files_after")},
                          "optimized_buckets": len(report["optimized_buckets"])}),
              flush=True)
        return spark.createDataFrame(
            [(report["files_before"], report["files_after"])],
            "files_before long, files_after long",
        )

    return run


# name -> factory(m) -> callable(spark, sf_dir); measured alongside
# the registry queries but with scale-aware parameters
SCALED_QUERIES = {
    "semantic_dedup_k_scaled": _semantic_dedup_scaled_k,
    "resample_ffill_all_users": _resample_all_users,
    "snapshot_optimize_cycle": _snapshot_optimize_cycle,
}


def _rotated(alpha: str, i: int) -> str:
    r = i % len(alpha)
    return alpha[r:] + alpha[:r]


def generate(spark, m: int) -> str:
    out = os.path.join(WORK, f"x{m}")
    # marker versioned: v3 adds customer.parquet (late-r6 bloom-join
    # rehearsal); v4 adds part.parquet (r7 brand-affinity rehearsal) —
    # older dirs regenerate rather than silently missing tables
    done = os.path.join(out, "_DONE_v4")
    if os.path.exists(done):  # only a fully-written dir is reusable
        return out
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(os.path.join(BASE_SF, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(BASE_SF, "embeddings.parquet"))
    orders = spark.read.parquet(os.path.join(BASE_SF, "orders.parquet"))
    li = spark.read.parquet(os.path.join(BASE_SF, "lineitem.parquet"))
    events = spark.read.parquet(os.path.join(BASE_SF, "events.parquet"))
    cust = spark.read.parquet(os.path.join(BASE_SF, "customer.parquet"))
    doc_off = docs.agg(F.max("doc_id")).first()[0] + 1
    vec_off = emb.agg(F.max("vec_id")).first()[0] + 1
    ord_off = orders.agg(F.max("o_orderkey")).first()[0] + 1
    cust_off = orders.agg(F.max("o_custkey")).first()[0] + 1
    supp_off = li.agg(F.max("l_suppkey")).first()[0] + 1
    user_off = events.agg(F.max("user_id")).first()[0] + 1
    evt_off = events.agg(F.max("event_id")).first()[0] + 1
    dim = len(emb.select("embedding").first()[0])

    lower, upper = string.ascii_lowercase, string.ascii_uppercase
    d_parts, e_parts = [], []
    for i in range(m):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * doc_off))
        if i:
            d = d.withColumn(
                "text",
                F.translate("text", lower + upper, _rotated(lower, i) + _rotated(upper, i)),
            )
        d_parts.append(d)
        pattern = _splitmix64(i) if i else 0
        signs = F.array(*[F.lit(-1.0 if (pattern >> (j % 64)) & 1 else 1.0) for j in range(dim)])
        e = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * vec_off))
        if i:
            e = e.withColumn(
                "embedding", F.zip_with("embedding", signs, lambda x, s: (x * s).cast("float"))
            )
        e_parts.append(e)

    o_parts, l_parts, ev_parts, c_parts = [], [], [], []
    for i in range(m):
        o_parts.append(
            orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * ord_off))
            .withColumn("o_custkey", F.col("o_custkey") + F.lit(i * cust_off))
        )
        l_parts.append(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * ord_off))
            .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(i * supp_off))
        )
        # customer shares orders' custkey offset so the replicated
        # fact<->dim join keys stay CONSISTENT (each replica joins only
        # its own customers); c_mktsegment untouched => the bloom-join
        # dim selectivity is scale-invariant
        c_parts.append(
            cust.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * cust_off))
        )
        # events: replica i is a DISJOINT user population over the SAME
        # time span — resample's hour grid (users × span) grows exactly
        # with users, never quadratically
        ev_parts.append(
            events.withColumn("user_id", F.col("user_id") + F.lit(i * user_off))
            .withColumn("event_id", F.col("event_id") + F.lit(i * evt_off))
        )

    d_all, e_all, o_all, l_all = d_parts[0], e_parts[0], o_parts[0], l_parts[0]
    ev_all, c_all = ev_parts[0], c_parts[0]
    for d in d_parts[1:]:
        d_all = d_all.unionByName(d)
    for e in e_parts[1:]:
        e_all = e_all.unionByName(e)
    for o in o_parts[1:]:
        o_all = o_all.unionByName(o)
    for l in l_parts[1:]:
        l_all = l_all.unionByName(l)
    for ev in ev_parts[1:]:
        ev_all = ev_all.unionByName(ev)
    for c in c_parts[1:]:
        c_all = c_all.unionByName(c)
    d_all.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    e_all.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    o_all.write.mode("overwrite").parquet(os.path.join(out, "orders.parquet"))
    l_all.write.mode("overwrite").parquet(os.path.join(out, "lineitem.parquet"))
    ev_all.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    c_all.write.mode("overwrite").parquet(os.path.join(out, "customer.parquet"))
    # part is a pure dimension for the brand-affinity rehearsal:
    # lineitem replicas keep l_partkey UNCHANGED, so one shared part
    # table joins every replica — basket volume grows ×m over the
    # same 25 brands, relative supports invariant by construction
    spark.read.parquet(os.path.join(BASE_SF, "part.parquet")).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "part.parquet"))
    open(done, "w").close()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2, help="best-of-N per point")
    ap.add_argument("--fresh", action="store_true", help="regenerate synthetic data")
    ap.add_argument("--only", nargs="*", default=None,
                    help="restrict to these query names (default: all)")
    args = ap.parse_args()
    if args.fresh and os.path.isdir(WORK):
        shutil.rmtree(WORK)

    spark = get_session(app_name="cli-rag-spark-scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()

    dirs = {m: generate(spark, m) for m in MULTIPLES}
    # warm-up
    qs["minhash_candidates"](spark, dirs[1]).write.mode("overwrite").format("noop").save()

    results = {}
    names = QUERIES + list(SCALED_QUERIES)
    if args.only:
        names = [n for n in names if n in set(args.only)]
    for name in names:
        factory = SCALED_QUERIES.get(name)
        per_scale = {}
        for m in MULTIPLES:
            fn = factory(m) if factory else (lambda s, d, _n=name: qs[_n](s, d))
            best = math.inf
            for _ in range(args.runs):
                t0 = time.perf_counter()
                fn(spark, dirs[m]).write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            per_scale[m] = round(best, 3)
        # least-squares slope of log(t) vs log(m)
        xs = [math.log(m) for m in MULTIPLES]
        ys = [math.log(per_scale[m]) for m in MULTIPLES]
        xbar, ybar = sum(xs) / len(xs), sum(ys) / len(ys)
        alpha = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / sum(
            (x - xbar) ** 2 for x in xs
        )
        results[name] = {"sec": per_scale, "alpha": round(alpha, 3)}
        print(json.dumps({"query": name, **results[name]}), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
