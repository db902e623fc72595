#!/usr/bin/env python
"""Measured grounding for PQ_MAX_ADC_ROWS (operators/knn.py) — the
PQ-vs-LSH leg of the E7 dispatcher cost model (VERDICT r9 #2).

What is measured, at sf0.1 (N=2000 embeddings, dim 64):

* ADC throughput: pq_knn_join's wall time at growing Q·N pair volume
  (its join+groupBy stage processes exactly Q·N narrow sum rows — the
  pair volume IS the cost model, dim-free).
* LSH throughput: knn_join_lsh's wall time at the same Q, plus the
  MEASURED collision volume (band-join candidates before dedup) so the
  per-candidate verify cost is separable from the collision rate.

Both are best-of-N on a warm JVM. The numbers feed the comment block
above PQ_MAX_ADC_ROWS; the threshold itself is a shuffle-volume
envelope (Q·N narrow rows the cluster must move for ADC) — these
measurements bound the LOCAL compute side of the comparison and the
collision fraction that decides when LSH's candidate stream is the
smaller stream.

Usage: python scripts/calibrate_pq_vs_lsh.py [--runs 3]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark.sql import functions as F  # noqa: E402

from cli_rag_spark.operators.knn import knn_join_lsh  # noqa: E402
from cli_rag_spark.operators.pq import (  # noqa: E402
    build_pq_index,
    pq_knn_join,
    read_pq_index,
)
from cli_rag_spark.session import get_session, scratch_root  # noqa: E402
from cli_rag_spark.sources.documents import load_table  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LSH_PLANES, LSH_BANDS, LSH_SEED = 16, 4, 42
PQ_M, PQ_K = 4, 16


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    spark = get_session(app_name="cli-rag-spark-calibrate-pq-lsh")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, BASE_SF, "embeddings")
    n_index = emb.count()
    tag = hashlib.md5(BASE_SF.encode()).hexdigest()[:12]
    pq_path = f"{scratch_root()}/cli_rag_spark_pqcal_{tag}"
    build_pq_index(emb, pq_path, PQ_M, PQ_K)
    codes, cb = read_pq_index(spark, pq_path, m_subspaces=PQ_M, k_codes=PQ_K)

    # warm-up both kernels
    q0 = emb.limit(50).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    _noop(pq_knn_join(q0, codes, cb, k=3, m_subspaces=PQ_M))
    _noop(knn_join_lsh(q0, emb, k=3, dim=64, n_planes=LSH_PLANES,
                       n_bands=LSH_BANDS, seed=LSH_SEED))

    for q_n in (125, 500, 2000):
        queries = emb.where(F.col("vec_id") < q_n).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        pair_rows = q_n * n_index

        adc_best = math.inf
        for _ in range(args.runs):
            t0 = time.perf_counter()
            _noop(pq_knn_join(queries, codes, cb, k=3, m_subspaces=PQ_M))
            adc_best = min(adc_best, time.perf_counter() - t0)

        lsh_best = math.inf
        for _ in range(args.runs):
            t0 = time.perf_counter()
            _noop(knn_join_lsh(queries, emb, k=3, dim=64, n_planes=LSH_PLANES,
                               n_bands=LSH_BANDS, seed=LSH_SEED))
            lsh_best = min(lsh_best, time.perf_counter() - t0)

        # measured collision volume: distinct candidate pairs the band
        # join emits (what the exact verify must score), and the raw
        # band-join rows (what the shuffle moves) — one extra job,
        # not part of the timed runs
        lsh_pairs = (
            knn_join_lsh(queries, emb, k=10**9, dim=64, n_planes=LSH_PLANES,
                         n_bands=LSH_BANDS, seed=LSH_SEED)
            .count()
        )
        print(json.dumps({
            "q": q_n,
            "n_index": n_index,
            "pair_rows": pair_rows,
            "adc_sec": round(adc_best, 3),
            "adc_pair_rows_per_sec": round(pair_rows / adc_best, 0),
            "lsh_sec": round(lsh_best, 3),
            "lsh_candidate_pairs": lsh_pairs,
            "lsh_collision_frac": round(lsh_pairs / pair_rows, 4),
            "lsh_candidates_per_sec": round(lsh_pairs / lsh_best, 0),
        }), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
