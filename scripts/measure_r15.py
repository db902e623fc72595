#!/usr/bin/env python
"""Targeted per-query measurement for the r15 optimization round.

Usage: python scripts/measure_r15.py [-n RUNS] query [query ...]

Replicates bench.py's timing protocol for a SUBSET of queries — same
session factory, same noop sink, best-of-N wall, per-query JVM+py CPU
deltas — plus the per-run hypervisor steal delta so a throttled run is
visibly throttled (the full pass's cleanliness gate, per query).
Numbers printed here feed OPTIMIZATION_r15.md's before/after tables;
the official artifact stays bench.py's full pass.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from cli_rag_spark.session import get_session  # noqa: E402
from cli_rag_spark.plans import registry  # noqa: E402


def _steal() -> float:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0


def _jvm_pid(spark) -> int | None:
    try:
        import subprocess

        out = subprocess.run(
            ["pgrep", "-f", "org.apache.spark.deploy.SparkSubmit"],
            capture_output=True, text=True,
        ).stdout.split()
        return int(out[0]) if out else None
    except Exception:
        return None


def _proc_cpu(pid: int | None) -> float:
    if pid is None:
        return 0.0
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / 100.0
    except Exception:
        return 0.0


def _py_cpu() -> float:
    t = os.times()
    return t.user + t.system + t.children_user + t.children_system


def main() -> None:
    args = sys.argv[1:]
    n_runs = 2
    if args and args[0] == "-n":
        n_runs = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="r15-measure")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    jvm = _jvm_pid(spark)

    def materialize(df):
        df.write.mode("overwrite").format("noop").save()

    # warm-up: JVM/codegen/Arrow, not measured (bench.py protocol)
    spark.sparkContext.setJobDescription("warmup")
    materialize(queries["cosine_topk"](spark, sf_dir))

    out = {}
    for name in names:
        best, best_cpu, best_steal = float("inf"), None, None
        runs = []
        for _ in range(n_runs):
            spark.sparkContext.setJobDescription(f"measure:{name}")
            j0, p0, s0 = _proc_cpu(jvm), _py_cpu(), _steal()
            t0 = time.perf_counter()
            materialize(queries[name](spark, sf_dir))
            wall = time.perf_counter() - t0
            cpu = (_proc_cpu(jvm) - j0) + (_py_cpu() - p0)
            st = _steal() - s0
            runs.append((round(wall, 3), round(cpu, 2), round(st, 2)))
            if wall < best:
                best, best_cpu, best_steal = wall, cpu, st
        out[name] = {
            "wall": round(best, 4),
            "cpu_sec": round(best_cpu, 3),
            "steal_sec": round(best_steal, 3),
            "runs": runs,
        }
        print(name, json.dumps(out[name]), flush=True)
    print("TOTAL_WALL", round(sum(v["wall"] for v in out.values()), 3))
    spark.stop()


if __name__ == "__main__":
    main()
