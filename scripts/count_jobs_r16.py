#!/usr/bin/env python
"""Count Spark jobs per timed run of a registry query (r16 evidence).

Usage: python scripts/count_jobs_r16.py [query ...]   (default: tuner_widths)

Methodology behind OPTIMIZATION_r16.md's "tuner_widths jobs per timed
run: 45 -> 28": warm the session (one warmup query + one untimed run of
the target so artifact builds/reuse settle), then diff the max job id
around one noop-sink run. Run from this repo for the AFTER number and
from a pre-change checkout for the BEFORE; both sides include the
fingerprint-reuse jobs, the exact GEMM, AQE sub-jobs and the noop
write, so the relative delta is the signal.
"""

from __future__ import annotations

import os
import sys

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from cli_rag_spark.session import get_session  # noqa: E402
from cli_rag_spark.plans import registry  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or ["tuner_widths"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="job-count")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    mat(qs["cosine_topk"](spark, sf_dir))  # JVM/codegen warmup
    st = spark.sparkContext.statusTracker()
    for name in names:
        mat(qs[name](spark, sf_dir))  # artifact build/reuse settles
        before = max(st.getJobIdsForGroup() or [0])
        mat(qs[name](spark, sf_dir))
        after = max(st.getJobIdsForGroup() or [0])
        print(f"{name} jobs per timed run: {after - before}")
    spark.stop()


if __name__ == "__main__":
    main()
