#!/usr/bin/env python
"""Diagnose the 0.900 out-of-sample recall plateau at 100× (VERDICT
r11 #4).

The r11 grown-C booking (SCALING.md) showed OOS recall@3 stuck at
0.900 at C=447 for BOTH fixed-2 and the √C rule (n_probe=21), booked
as "boundary geometry more probes don't recover" but never diagnosed.
This script points the full probe ladder at the C=447 rehearsal index
with the SAME out-of-sample perturbed query set
(q' = q + 0.5·‖q‖·rademacher/√dim, seeded by vec_id — the
scale_rehearsal_100x recipe verbatim) and books the recall@3 curve up
to the terminal rung (n_probe = C = exact by construction):

* if recall rises to 1.0 only at rungs far above √C, the misses are
  DEEP boundary assignments (the query's true NNs live in lists far
  down the probe order) — a corpus-geometry fact, not a rule bug;
* if it recovers at a small multiple of √C, the √C rule needs a
  corpus-aware floor;
* the tune_n_probe row shows what the recall-TARGETED tuner would
  pick for this exact workload (target 0.95), closing the "the tuner
  exists; it was never pointed at the rehearsal index" gap.

Usage: python scripts/oos_plateau_r12.py [--multiple 100] [--k 3]
Prints one JSON line per rung and a summary; paste into SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for _p in (_REPO_DIR, os.path.join(_REPO_DIR, "scripts")):
    if _p not in sys.path:
        sys.path.insert(0, _p)

from scale_rehearsal_100x import (  # noqa: E402
    _ivf_sqrtc_parts,
    generate,
)

from pyspark.sql import functions as F  # noqa: E402

from cli_rag_spark.functions.hashing import _splitmix64  # noqa: E402
from cli_rag_spark.session import get_session  # noqa: E402


def perturbed_queries(spark, queries):
    """The OOS set: q + 0.5*||q||*rademacher/sqrt(dim), seeded by
    vec_id — copied verbatim from _ivf_recall_at_scale so this curve
    diagnoses exactly the set that plateaued."""
    q_rows = queries.orderBy("query_id").collect()
    dim = len(q_rows[0]["query_vec"])
    pert = []
    for r in q_rows:
        v = list(r["query_vec"])
        nrm = math.sqrt(sum(x * x for x in v)) or 1.0
        eps = 0.5 * nrm / math.sqrt(dim)
        pv = [
            x + (eps if _splitmix64(r["query_id"] * 64 + j) & 1 else -eps)
            for j, x in enumerate(v)
        ]
        pert.append((r["query_id"], pv))
    return spark.createDataFrame(
        pert, "query_id long, query_vec array<double>"
    ).select(
        "query_id", F.col("query_vec").cast("array<float>").alias("query_vec")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--multiple", type=int, default=100)
    ap.add_argument("--k", type=int, default=3)
    args = ap.parse_args()

    from cli_rag_spark.operators.ann import (
        default_n_probe,
        knn_join_ivf,
        tune_n_probe,
    )
    from cli_rag_spark.operators.knn import knn_join_gemm, topk_recall

    spark = get_session(app_name="cli-rag-spark-oos-plateau")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = generate(spark, args.multiple)

    emb, index, c, queries = _ivf_sqrtc_parts(spark, sf_dir)
    oos = perturbed_queries(spark, queries)
    exact = knn_join_gemm(oos, emb, k=args.k, dim=64).localCheckpoint(
        eager=True
    )
    print(json.dumps({
        "multiple": args.multiple, "C": c,
        "n_probe_rule": default_n_probe(c), "k": args.k,
    }), flush=True)

    # full power-of-two ladder to the terminal rung, plus the rule
    ladder = []
    w = 1
    while w < c:
        ladder.append(w)
        w *= 2
    ladder.append(c)
    rule = default_n_probe(c)
    if rule not in ladder:
        ladder = sorted(set(ladder + [rule]))

    curve = {}
    # per-query misses at the rule width, to name the constraint
    per_q_rule = None
    for probe in ladder:
        t0 = time.perf_counter()
        approx = knn_join_ivf(
            oos, index, k=args.k, n_centroids=c, n_probe=probe,
            validate_cid=False,
        )
        rec = topk_recall(exact, approx, k=args.k)
        row = rec.agg(F.avg("recall").alias("r")).first()
        r = round(float(row["r"]), 4)
        curve[probe] = r
        if probe == rule:
            per_q_rule = {
                int(x["query_id"]): float(x["recall"])
                for x in rec.collect()
            }
        print(json.dumps({
            "n_probe": probe, "recall": r,
            "sec": round(time.perf_counter() - t0, 2),
        }), flush=True)

    # what the recall-targeted tuner picks for this workload
    import hashlib

    from cli_rag_spark.session import scratch_root

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = f"{scratch_root()}/cli_rag_spark_ivfsqrt100x_{tag}"
    t0 = time.perf_counter()
    tuned_w, tuned_r = tune_n_probe(spark, path, oos, target_recall=0.95,
                                    k=args.k)
    print(json.dumps({
        "experiment": "oos_plateau_r12",
        "multiple": args.multiple,
        "C": c,
        "rule_n_probe": rule,
        "curve": curve,
        "per_query_recall_at_rule": per_q_rule,
        "tune_n_probe_095": {"n_probe": tuned_w, "recall": tuned_r,
                             "sec": round(time.perf_counter() - t0, 2)},
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
