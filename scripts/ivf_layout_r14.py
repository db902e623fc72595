#!/usr/bin/env python
"""Measure the r14 sorted single-dir IVF layout against the pre-r14
dir-per-list layout at the shape that exposed the problem (VERDICT
r13 #3): the 2M-row clustered f64 IVF build took 2,826 s at C=1414 —
37× the IVFPQ build on identical rows — with ~all of it in the
1,414-directory dynamic-partition write. The sorted layout is the
same ONE shuffle (range instead of hash) but a plain parquet sink
with small row groups, so cid min/max footer stats replace directory
pruning.

Rows printed (one JSON line each; paste into SCALING.md):
  sorted_build      — timed build_ivf_index(layout default) at 2M
  layout_equality   — row-for-row identity of the two artifacts
  probe_batch_*     — knn_join_ivf wall + recall@10 vs exact GEMM,
                      per layout (Q=400, k=10, n_probe=√C)
  probe_single_*    — ivf_topk_persisted wall, mean over queries
                      (the static cid IN (...) scan is where the
                      pruning mechanism actually differs)

The partitioned comparand is the r13 artifact at its original path
(reused, NOT rebuilt — its 2,826 s build row is already booked);
pass --build-partitioned to rebuild it if /tmp was wiped.
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

from scale_rehearsal_100x import generate_clustered  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from cli_rag_spark.session import get_session, scratch_root  # noqa: E402
from cli_rag_spark.sources.documents import load_table  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--nq", type=int, default=400)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-single", type=int, default=5,
                    help="queries for the single-probe scan timing")
    ap.add_argument("--build-partitioned", action="store_true",
                    help="rebuild the dir-per-list comparand (~47 min "
                         "at 2M — only if /tmp lost the r13 artifact)")
    ap.add_argument("--filestats", action="store_true",
                    help="report the sorted artifact's real file-width "
                         "distribution (empty files, buckets/file, "
                         "size spread — ADVICE r14 balls-into-bins)")
    args = ap.parse_args()
    spark = get_session(app_name="cli-rag-spark-ivf-layout-r14")
    spark.sparkContext.setLogLevel("ERROR")

    from cli_rag_spark.operators.ann import (
        _read_ivf_meta,
        build_ivf_index,
        default_n_probe,
        ivf_topk_persisted,
        knn_join_ivf,
        read_ivf_index,
    )
    from cli_rag_spark.operators.knn import knn_join_gemm

    n, dim, nq, k = args.n, args.dim, args.nq, args.k
    sf_dir = generate_clustered(spark, n, dim=dim)
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    queries = emb.where(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    n_index = emb.count()
    print(json.dumps({"stage": "ivf_layout", "corpus": sf_dir,
                      "n_index": n_index, "nq": nq, "k": k}), flush=True)

    t0 = time.perf_counter()
    exact = knn_join_gemm(queries, emb, k=k, dim=dim).localCheckpoint(
        eager=True
    )
    print(json.dumps({"row": "gemm_exact",
                      "sec": round(time.perf_counter() - t0, 2)}),
          flush=True)

    tag = f"gm{n}_d{dim}"
    part_path = f"{scratch_root()}/cli_rag_spark_r13ivf_{tag}"
    sorted_path = f"{scratch_root()}/cli_rag_spark_r14ivfsorted_{tag}"

    # --- timed sorted build (the row VERDICT r13 #3 asks for) ---------
    # ADVICE r14: reuse_if_exists short-circuits on a warm scratch dir,
    # so an unconditional print would book the near-zero reuse wall as
    # the measured build — probe artifact absence FIRST and label the
    # row honestly (the stage_residual versioned-path discipline).
    try:
        was_built = _read_ivf_meta(spark, sorted_path) is not None
    except ValueError:
        was_built = False
    t0 = time.perf_counter()
    build_ivf_index(emb, sorted_path, reuse_if_exists=True)
    sorted_build_sec = round(time.perf_counter() - t0, 2)
    meta_s = _read_ivf_meta(spark, sorted_path)
    print(json.dumps({"row": "sorted_build", "sec": sorted_build_sec,
                      "reused": was_built,
                      "C": meta_s["n_centroids"],
                      "layout": meta_s.get("layout")}), flush=True)

    if args.filestats:
        # ADVICE r14 / VERDICT r14 #5: the sorted layout's
        # repartition(F, bucket) is balls-into-bins — measure the real
        # file-width distribution (empty files, buckets per file, size
        # spread) so the placement claim in ann.py stays a measured
        # number, and a sort-based exact placement has a before-row.
        import glob as _glob

        parts = sorted(_glob.glob(f"{sorted_path}/part-*.parquet"))
        sizes = [os.path.getsize(p) for p in parts]
        f_count = len(parts)
        per_file = (
            spark.read.parquet(sorted_path)
            .withColumn("_file", F.input_file_name())
            .withColumn(
                "_bucket",
                F.least(
                    F.lit(f_count - 1),
                    F.floor(
                        F.col("cid") * f_count / meta_s["n_centroids"]
                    ),
                ),
            )
            .groupBy("_file")
            .agg(
                F.countDistinct("_bucket").alias("n_buckets"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            .collect()
        )
        widths = sorted((int(r["n_buckets"]) for r in per_file),
                        reverse=True)
        print(json.dumps({
            "row": "sorted_filestats",
            "n_files": f_count,
            "n_empty": f_count - len(per_file),
            "buckets_per_file_max": widths[0] if widths else 0,
            "buckets_per_file_top5": widths[:5],
            "size_mb_max": round(max(sizes) / 1e6, 1) if sizes else 0,
            "size_mb_mean": round(sum(sizes) / max(1, len(sizes)) / 1e6, 1),
        }), flush=True)

    if args.build_partitioned:
        t0 = time.perf_counter()
        build_ivf_index(
            emb, part_path, reuse_if_exists=True, layout="partitioned"
        )
        print(json.dumps({"row": "partitioned_build",
                          "sec": round(time.perf_counter() - t0, 2)}),
              flush=True)
    meta_p = _read_ivf_meta(spark, part_path)
    assert meta_p["n_centroids"] == meta_s["n_centroids"], (
        "layouts built different C — not comparable"
    )
    c = int(meta_s["n_centroids"])
    n_probe = default_n_probe(c)

    # --- row-for-row identity ----------------------------------------
    srt = spark.read.parquet(sorted_path).select(
        "vec_id", F.col("cid").cast("long").alias("cid")
    )
    prt = spark.read.parquet(part_path).select(
        "vec_id", F.col("cid").cast("long").alias("cid")
    )
    diff = srt.exceptAll(prt).count() + prt.exceptAll(srt).count()
    print(json.dumps({"row": "layout_equality", "row_diff": diff}),
          flush=True)

    # --- batch probe: wall + recall per layout -------------------------
    for label, path in (("sorted", sorted_path),
                        ("partitioned", part_path)):
        idx = read_ivf_index(spark, path)
        t0 = time.perf_counter()
        out = knn_join_ivf(
            queries, idx, k=k, n_centroids=c, n_probe=n_probe,
            validate_cid=False,
        ).localCheckpoint(eager=True)
        sec = round(time.perf_counter() - t0, 2)
        from cli_rag_spark.operators.knn import topk_recall

        rec = (
            topk_recall(exact, out, k=k)
            .agg(F.avg("recall").alias("r")).first()["r"]
        )
        print(json.dumps({
            "row": f"probe_batch_{label}", "sec": sec,
            "n_probe": n_probe, "recall_at_k": round(float(rec), 4),
        }), flush=True)

    # --- single-query persisted probe (static cid IN scan) ------------
    for label, path in (("sorted", sorted_path),
                        ("partitioned", part_path)):
        walls = []
        for qid in range(args.n_single):
            qv = emb.where(F.col("vec_id") == qid).select(
                F.col("embedding").alias("query_vec")
            )
            t0 = time.perf_counter()
            ivf_topk_persisted(
                spark, path, qv, k=k, n_probe=n_probe
            ).collect()
            walls.append(time.perf_counter() - t0)
        print(json.dumps({
            "row": f"probe_single_{label}",
            "mean_sec": round(sum(walls) / len(walls), 3),
            "walls": [round(w, 3) for w in walls],
        }), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
