#!/usr/bin/env python
"""Bench-marathon survival check (r6 postmortem, VERDICT r6 #2).

Runs the ENTIRE bench.py HEADLINE list once, in ONE long-lived
SparkSession, at $SPARK_GRAFT_SF_DIR (default sf0.1) — the exact
execution shape that OOM'd the driver in round 6
(notEnoughMemoryToBuildAndBroadcastTable after ~1700 accumulated
stages; per-query tests in fresh JVMs could never see it).

Usage:
    python scripts/marathon_check.py            # current session config
    SPARK_GRAFT_DRIVER_MEM=1g python scripts/marathon_check.py
        # reproduces the r6 failure mode (pre-fix session config had
        # no explicit driver memory -> 1g default heap)

Exit 0 = every headline query materialized; exit 1 = any failure,
with the dying query named. The bench protocol (BENCH.md) runs this
before trusting a bench number; acceptance for the r6 fix was >=3
consecutive clean passes at the default config.
"""

from __future__ import annotations

import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from cli_rag_spark.session import get_session  # noqa: E402


def main() -> int:
    from bench import HEADLINE, _materialize

    from cli_rag_spark.plans import registry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="cli-rag-spark-marathon")
    spark.sparkContext.setLogLevel("ERROR")
    jvm_max_gb = spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory() / (1 << 30)
    print(f"marathon: {len(HEADLINE)} queries @ {sf_dir}, driver heap {jvm_max_gb:.1f} GiB", flush=True)

    queries = registry.all_queries()
    t_start = time.perf_counter()
    for i, name in enumerate(HEADLINE, 1):
        t0 = time.perf_counter()
        try:
            _materialize(queries[name](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — report and fail loudly
            print(f"marathon FAILED at {i}/{len(HEADLINE)} {name}: {type(exc).__name__}: {exc}", flush=True)
            return 1
        print(f"  [{i:2d}/{len(HEADLINE)}] {name}: {time.perf_counter() - t0:.2f}s", flush=True)
    print(f"marathon OK: {len(HEADLINE)} queries in {time.perf_counter() - t_start:.1f}s", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
