"""Session-config regression gates (r6 postmortem).

Round 6's driver bench crashed with a flaky cumulative broadcast OOM:
local-mode execution puts every broadcast build on the DRIVER heap,
the session never set spark.driver.memory (Spark default 1g), and a
59-query marathon in one JVM accumulated broadcast blocks faster than
the ContextCleaner freed them (periodicGC default 30min > the whole
marathon). Per-query tests in fresh JVMs passed throughout — exactly
how the failure escaped every gate. These tests pin the fix at the
root: they FAIL under the pre-r7 session config (1g heap, no periodic
GC, 64MB broadcast threshold) and pass on the fixed one.

The full-fidelity rehearsal is scripts/marathon_check.py (the entire
bench HEADLINE in one session at sf0.1); these assertions are the
fast every-run subset.
"""

from __future__ import annotations

from cli_rag_spark.session import configure

from pyspark.sql import SparkSession


def _configured_conf() -> dict[str, str]:
    builder = configure(SparkSession.builder)
    # Builder internals: _options is the staged config map.
    return dict(builder._options)


def test_driver_memory_is_explicit():
    conf = _configured_conf()
    mem = conf.get("spark.driver.memory", "")
    assert mem.endswith("g") and int(mem[:-1]) >= 4, (
        "session must pin spark.driver.memory >= 4g: local-mode broadcast "
        "builds land on the driver heap and the 1g default OOMs the bench "
        "marathon (BENCH_r06 rc=1)"
    )


def test_periodic_gc_inside_marathon_runtime():
    conf = _configured_conf()
    interval = conf.get("spark.cleaner.periodicGC.interval", "30min")
    assert interval.endswith("min") and int(interval[:-3]) <= 5, (
        "ContextCleaner frees broadcast blocks only after a GC collects "
        "their weak refs; the default 30min periodic GC never fires inside "
        "a bench marathon"
    )


def test_broadcast_threshold_bounded():
    conf = _configured_conf()
    threshold = int(conf["spark.sql.autoBroadcastJoinThreshold"])
    assert threshold <= 32 * 1024 * 1024, (
        "64MB let AQE broadcast mid-size derived tables whose size "
        "estimate was under the threshold but whose built relation was "
        "~5x bigger (r6 ngram_novelty incident)"
    )


def test_live_jvm_heap_reflects_config(spark):
    # The conftest session is the process's first get_session(), so the
    # driver-memory config must have reached the JVM launch. Under the
    # pre-r7 config this reads ~0.9 GiB.
    max_bytes = spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()
    assert max_bytes > 4 * (1 << 30), (
        f"driver JVM -Xmx is {max_bytes / (1 << 30):.2f} GiB; "
        "spark.driver.memory did not reach the JVM launch"
    )
