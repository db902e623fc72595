#!/usr/bin/env python
"""Measure the PQ-vs-LSH wall crossover AT an actually-high dim
(VERDICT r11 optional #8).

PQ_MIN_DIM=160 ships on per-pair costs measured at dim 64 (LSH ≈
1.9e-8 s·dim·~25% collisions, ADC ≈ 6.6e-7 s dim-free → crossover
≈ dim 139, rounded up). This script runs BOTH flat paths at dim 192
— past the gate — on a deterministic synthetic corpus, turning the
extrapolated crossover into a measurement:

    N index rows × dim 192, Q queries, k=10
    PQ: persisted m=4 × K=16 index (the geometry the constant was
        derived with — the wall question is per-pair cost, for which
        M is what matters; recall is reported but not the gate's
        subject), pq_knn_join end-to-end.
    LSH: knn_join_lsh at the default 16/4 banding.
    Ground truth: exact GEMM (inside the envelope at this shape —
    which is WHY the dispatcher would route gemm here; the flat paths
    are forced directly because the constant under test is their
    per-pair cost, not the routing).

Expected from the r11 per-pair model at dim 192, Q=200 × N=500k:
ADC ≈ 66 s, LSH ≈ 91 s — ADC ahead, confirming the gate's direction.

Usage: python scripts/pq_min_dim_confirm.py [--n 500000] [--nq 200]
           [--dim 192]
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

import scale_rehearsal_100x  # noqa: E402,F401  (24 GB heap env)

from pyspark.sql import functions as F  # noqa: E402

from cli_rag_spark.session import get_session, scratch_root  # noqa: E402


def synth_embeddings(spark, n: int, dim: int, path: str):
    """Deterministic hash-derived vectors in [-1, 1), persisted to
    parquet so the measured scans are real file scans."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        emb = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda j: (
                    F.pmod(
                        F.xxhash64(F.col("id") * dim + j), F.lit(100000)
                    ).cast("double")
                    / 50000.0
                    - 1.0
                ),
            ).alias("embedding"),
        )
        emb.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--nq", type=int, default=200)
    ap.add_argument("--dim", type=int, default=192)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from cli_rag_spark.operators.knn import (
        knn_join_gemm,
        knn_join_lsh,
        topk_recall,
    )
    from cli_rag_spark.operators.pq import (
        build_pq_index,
        pq_index_ready,
        pq_knn_join,
        read_pq_index,
    )

    spark = get_session(app_name="cli-rag-spark-pq-min-dim")
    spark.sparkContext.setLogLevel("ERROR")
    root = scratch_root()
    emb = synth_embeddings(
        spark, args.n, args.dim, f"{root}/pq_min_dim_emb_{args.n}_{args.dim}"
    )
    n_index = emb.count()
    queries = emb.where(F.col("vec_id") < args.nq).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    n_q = queries.count()
    print(json.dumps({
        "n_queries": n_q, "n_index": n_index, "dim": args.dim,
        "adc_pair_rows": n_q * n_index,
        "pair_ops": n_q * n_index * args.dim,
    }), flush=True)

    pq_path = f"{root}/pq_min_dim_idx_{args.n}_{args.dim}"
    t0 = time.perf_counter()
    if not pq_index_ready(spark, pq_path, args.dim, 4):
        build_pq_index(emb, pq_path, m_subspaces=4, k_codes=16)
        build_sec = round(time.perf_counter() - t0, 2)
    else:
        build_sec = 0.0
    print(json.dumps({"pq_build_sec": build_sec}), flush=True)

    results = {}
    frames = {}
    codes, cb = read_pq_index(spark, pq_path, m_subspaces=4, dim=args.dim)
    t0 = time.perf_counter()
    frames["pq"] = pq_knn_join(
        queries, codes, cb, k=args.k, m_subspaces=4
    ).localCheckpoint(eager=True)
    results["pq"] = {"sec": round(time.perf_counter() - t0, 2)}
    print(json.dumps({"strategy": "pq", **results["pq"]}), flush=True)

    t0 = time.perf_counter()
    frames["lsh"] = knn_join_lsh(
        queries, emb, k=args.k, dim=args.dim
    ).localCheckpoint(eager=True)
    results["lsh"] = {"sec": round(time.perf_counter() - t0, 2)}
    print(json.dumps({"strategy": "lsh", **results["lsh"]}), flush=True)

    t0 = time.perf_counter()
    exact = knn_join_gemm(
        queries, emb, k=args.k, dim=args.dim
    ).localCheckpoint(eager=True)
    gt_sec = round(time.perf_counter() - t0, 2)
    for label, fr in frames.items():
        r = (
            topk_recall(exact, fr, k=args.k)
            .agg(F.avg("recall").alias("r"))
            .first()
        )
        results[label]["recall"] = round(float(r["r"]), 4)

    print(json.dumps({
        "experiment": "pq_min_dim_confirm",
        "n_queries": n_q, "n_index": n_index, "dim": args.dim,
        "k": args.k, "pq_build_sec": build_sec,
        "gemm_ground_truth_sec": gt_sec,
        "results": results,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
