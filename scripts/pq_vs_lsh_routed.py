#!/usr/bin/env python
"""Measure knn_join_auto's PQ choice at the shape the gate exists for
(VERDICT r10 #4).

PQ_MAX_ADC_ROWS was shipped as a shuffle-volume ENVELOPE because the
sf0.1 calibration (scripts/calibrate_pq_vs_lsh.py) was floor-shadowed:
both ADC and LSH are Θ(Q·N) at default banding, and no local shape was
big enough for either to leave the job floor decisively. This script
builds the real memory-bound case on the 1000× replica embeddings
(2M × 64 f64 ≈ 1 GB raw — past GEMM_MAX_PAIR_OPS for Q ≥ 391):

    Q = 400 queries × N = 2,000,000 index rows, dim 64
    → pair-ops 5.12e10 > GEMM_MAX_PAIR_OPS (GEMM ineligible)
    → Q·N = 8e8 ADC pair rows ≤ PQ_MAX_ADC_ROWS (PQ eligible)

and measures, end-to-end at k=10:

1. knn_join_auto WITH a persisted PQ index → must route "pq"
   (asserted); wall time of the full ADC join.
2. knn_join_auto WITHOUT pq_path → routes "lsh" (asserted); wall time
   of the full banded join at the default 16/4 geometry.
3. recall@10 of BOTH against exact GEMM ground truth (GEMM is
   policy-capped in the dispatcher, not hardware-capped — it still
   computes fine as an offline oracle).

Build time for the PQ index is reported separately (cold path,
amortized across queries in deployment).

Heap: the standard 24 GB rehearsal heap (inherited from
scale_rehearsal_100x import). Paste the JSON into SCALING.md and cite
the measured numbers at knn.py PQ_MAX_ADC_ROWS.

Usage: python scripts/pq_vs_lsh_routed.py [--multiple 1000] [--nq 400]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for _p in (_REPO_DIR, os.path.join(_REPO_DIR, "scripts")):
    if _p not in sys.path:
        sys.path.insert(0, _p)

from scale_rehearsal_100x import generate_docs_only  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from cli_rag_spark.session import get_session, scratch_root  # noqa: E402
from cli_rag_spark.sources.documents import load_table  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--multiple", type=int, default=1000)
    ap.add_argument("--nq", type=int, default=400)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from cli_rag_spark.operators.knn import (
        GEMM_MAX_PAIR_OPS,
        choose_knn_strategy,
        knn_join_auto,
        knn_join_gemm,
        topk_recall,
    )
    from cli_rag_spark.operators.pq import build_pq_index, pq_index_ready

    spark = get_session(app_name="cli-rag-spark-pq-vs-lsh-routed")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = generate_docs_only(spark, args.multiple)

    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    n_index = emb.count()
    queries = emb.where(F.col("vec_id") < args.nq).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    n_q = queries.count()
    dim = 64
    ops = n_q * n_index * dim
    assert ops > GEMM_MAX_PAIR_OPS, (
        f"shape too small to leave the GEMM region: {ops:.3g} pair-ops"
    )
    print(json.dumps({"n_queries": n_q, "n_index": n_index, "dim": dim,
                      "pair_ops": ops, "adc_pair_rows": n_q * n_index}),
          flush=True)

    pq_path = f"{scratch_root()}/cli_rag_spark_pqroute_x{args.multiple}"
    t0 = time.perf_counter()
    if not pq_index_ready(spark, pq_path, dim, 4):
        build_pq_index(emb, pq_path, m_subspaces=4, k_codes=16)
        build_sec = round(time.perf_counter() - t0, 2)
    else:
        build_sec = 0.0  # reused from a prior run
    print(json.dumps({"pq_build_sec": build_sec}), flush=True)

    # dispatch assertions: the cost model must route pq with the index
    # and lsh without it, at this exact shape
    assert choose_knn_strategy(n_q, n_index, dim, pq_available=True) == "pq"
    assert choose_knn_strategy(n_q, n_index, dim, pq_available=False) == "lsh"

    # the timed materialization is an eager localCheckpoint: the
    # output is only Q·k rows (4,000 here), so storage cost is nil
    # and the checkpointed frame feeds the recall pass without
    # re-running a 10+-minute join
    results = {}
    approx_frames = {}
    for label, kwargs in (
        ("pq", {"pq_path": pq_path}),
        ("lsh", {}),
    ):
        t0 = time.perf_counter()
        out = knn_join_auto(
            queries, emb, k=args.k, dim=dim,
            n_queries=n_q, n_index=n_index, **kwargs,
        ).localCheckpoint(eager=True)
        sec = round(time.perf_counter() - t0, 2)
        results[label] = {"sec": sec}
        approx_frames[label] = out
        print(json.dumps({"strategy": label, "sec": sec}), flush=True)

    # ground truth + recall (not part of any timed row)
    t0 = time.perf_counter()
    exact = knn_join_gemm(queries, emb, k=args.k, dim=dim).localCheckpoint()
    gt_sec = round(time.perf_counter() - t0, 2)
    for label, approx in approx_frames.items():
        r = (
            topk_recall(exact, approx, k=args.k)
            .agg(F.avg("recall").alias("r"))
            .first()
        )
        results[label]["recall"] = round(float(r["r"]), 4)

    print(
        json.dumps(
            {
                "experiment": "pq_vs_lsh_routed",
                "multiple": args.multiple,
                "n_queries": n_q,
                "n_index": n_index,
                "k": args.k,
                "pq_build_sec": build_sec,
                "gemm_ground_truth_sec": gt_sec,
                "results": results,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
