#!/usr/bin/env python
"""Capture .explain("formatted") for the r15-touched judged queries.

Usage: python scripts/capture_plans_r15.py <outdir> <suffix> [query ...]

Writes <outdir>/<query>_<suffix>.txt for each query (default: the
r15-touched set). Runs each registry query builder against
$SPARK_GRAFT_SF_DIR (default sf0.1) — builders that persist index
artifacts will build/reuse them exactly as a judged run would, so the
captured plan is the plan the bench times.
"""

from __future__ import annotations

import os
import sys

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from cli_rag_spark.session import get_session  # noqa: E402
from cli_rag_spark.plans import registry  # noqa: E402

DEFAULT = [
    "knn_join_ivfpq",
    "ivfpq_rerank_topk",
    "knn_join_ivfpq_residual",
    "knn_join_auto",
]


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="r15-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
