#!/usr/bin/env python
"""A/B for the r11 structural fusions (VERDICT r10 #3), bench protocol:
matched-interleaved runs on the same box, wall seconds AND scheduled
job counts, keep only if >=15% on a clean pass, book either way.

- lp_communities: round-1 identity fusion (components.label_propagation)
  vs the r10 spelling (explicit |V|-distinct identity label table +
  first-round join) — values bit-identical by algebra.
- hits_top_suppliers: count-free hub_0 = 1.0 seed (pagerank.hits) vs
  the r10 spelling (nodes.count() + eager nodes checkpoint + 1/n seed)
  — values differ on the dyadic grid only; both oracles replay their
  own spelling.

The OLD spellings are reconstructed verbatim here (they left the
package in the r11 commit); the NEW paths are called through the
operators so the A/B measures exactly what shipped.

Usage: python scripts/fusion_ab_r11.py [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark.sql import functions as F  # noqa: E402

from cli_rag_spark.session import get_session  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_label_propagation(edges, src="src", dst="dst", weight=None, iters=2):
    """The r10 spelling: identity label table built with a distinct,
    joined every round including round 1."""
    w = F.col(weight) if weight is not None else F.lit(1).cast("long")
    e = edges.select(
        F.col(src).alias("e_src"), F.col(dst).alias("e_dst"), w.alias("e_w")
    ).localCheckpoint(eager=True)
    labels = (
        e.select(F.col("e_src").alias("node"))
        .unionByName(e.select(F.col("e_dst").alias("node")))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for i in range(iters):
        scored = (
            e.join(labels, e.e_src == labels.node)
            .select(F.col("e_dst").alias("node"), "label", "e_w")
            .repartition(F.col("node"))
            .groupBy("node", "label")
            .agg(F.sum("e_w").alias("sw"))
        )
        labels = (
            scored.groupBy("node")
            .agg(F.max(F.struct(F.col("sw"), (-F.col("label")).alias("nl"))).alias("m"))
            .select("node", (-F.col("m.nl")).alias("label"))
        )
        if (i + 1) % 3 == 0 and (i + 1) < iters:
            labels = labels.localCheckpoint(eager=True)
    return labels


def old_hits(edges, weight=None, iters=3, broadcast_ranks=False):
    """The r10 spelling: eager nodes checkpoint, nodes.count(),
    hub_0 = dyadic(1/n)."""
    from cli_rag_spark.operators.pagerank import _dyadic

    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = (
        edges.select(F.col("src").alias("src"), F.col("dst").alias("dst"), w.alias("w"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()

    def _half(r, score_in, edge_key, out_key, score_out):
        raw = (
            r.join(e, r["node"] == e[edge_key])
            .select(
                F.col(out_key).alias("node"),
                _dyadic(F.col(score_in) * F.col("w")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        ).localCheckpoint(eager=False)
        total = raw.agg(F.coalesce(F.sum("c"), F.lit(0.0)).alias("_t"))
        return raw.crossJoin(F.broadcast(total)).select(
            "node",
            F.when(F.col("_t") > 0, _dyadic(F.col("c") / F.col("_t")))
            .otherwise(F.lit(0.0))
            .alias(score_out),
        )

    ranks = nodes.withColumn("hub", _dyadic(F.lit(1.0 / n_nodes)))
    auth_ranks = None
    for _ in range(iters):
        r = F.broadcast(ranks) if broadcast_ranks else ranks
        auth_ranks = _half(r, "hub", "src", "dst", "auth")
        a = F.broadcast(auth_ranks) if broadcast_ranks else auth_ranks
        ranks = _half(a, "auth", "dst", "src", "hub")
    hc = F.broadcast(ranks) if broadcast_ranks else ranks
    ac = F.broadcast(auth_ranks) if broadcast_ranks else auth_ranks
    return (
        nodes.join(hc, "node", "left_outer")
        .join(ac, "node", "left_outer")
        .select(
            "node",
            F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"),
            F.coalesce(F.col("auth"), F.lit(0.0)).alias("auth"),
        )
    )


def lp_shape(labels):
    from cli_rag_spark.plans.queries_scale import LP_TOPN

    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.col("n_members").desc(), F.col("community").asc())
        .limit(LP_TOPN)
    )


def hits_shape(scored):
    from cli_rag_spark.plans.queries_mining import HITS_TOPN

    return (
        scored.orderBy(F.col("auth").desc(), F.col("node").asc())
        .limit(HITS_TOPN)
        .select("node", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("auth"))
    )


def timed(spark, tag, thunk):
    # the THUNK runs inside the timer and the job group: eager
    # checkpoints and count() jobs at DataFrame-construction time are
    # part of what the fusion removes, so they must be measured
    sc = spark.sparkContext
    group = f"ab-{tag}-{time.monotonic_ns()}"
    sc.setJobGroup(group, tag)
    t0 = time.perf_counter()
    thunk().write.mode("overwrite").format("noop").save()
    sec = time.perf_counter() - t0
    sc.setJobGroup("idle", "idle")
    jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    return round(sec, 3), jobs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    spark = get_session(app_name="cli-rag-spark-fusion-ab-r11")
    spark.sparkContext.setLogLevel("ERROR")

    from cli_rag_spark.operators.components import label_propagation
    from cli_rag_spark.operators.pagerank import hits
    from cli_rag_spark.plans.queries_mining import HITS_ITERS
    from cli_rag_spark.plans.queries_scale import LP_ITERS
    from cli_rag_spark.plans.trade_graph import (
        trade_edges_bidir_int,
        trade_edges_directed,
    )

    e_lpa = trade_edges_bidir_int(spark, SF)
    e_hits = trade_edges_directed(spark, SF)

    variants = {
        "lpa_old": lambda: lp_shape(
            old_label_propagation(e_lpa, "src", "dst", "w", iters=LP_ITERS)
        ),
        "lpa_new": lambda: lp_shape(
            label_propagation(e_lpa, "src", "dst", "w", iters=LP_ITERS)
        ),
        "hits_old": lambda: hits_shape(
            old_hits(e_hits, weight="w", iters=HITS_ITERS, broadcast_ranks=True)
        ),
        "hits_new": lambda: hits_shape(
            hits(e_hits, weight="w", iters=HITS_ITERS, broadcast_ranks=True)
        ),
    }
    # warmup (JVM + artifact read)
    for name in variants:
        variants[name]().write.mode("overwrite").format("noop").save()

    out = {n: {"sec": [], "jobs": []} for n in variants}
    for _ in range(args.reps):
        for name in variants:  # interleaved ABAB
            sec, jobs = timed(spark, name, variants[name])
            out[name]["sec"].append(sec)
            out[name]["jobs"].append(jobs)
    summary = {
        n: {
            "best_sec": min(v["sec"]),
            "runs_sec": v["sec"],
            "jobs": max(v["jobs"]),
        }
        for n, v in out.items()
    }
    for pair in ("lpa", "hits"):
        old_b, new_b = summary[f"{pair}_old"]["best_sec"], summary[f"{pair}_new"]["best_sec"]
        summary[f"{pair}_gain_pct"] = round(100 * (old_b - new_b) / old_b, 1)
    print(json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
