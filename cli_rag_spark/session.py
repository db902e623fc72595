"""SparkSession construction with scale-oriented defaults.

The reference engine is a single process with the whole index in RAM
(multirag.c:359). Our execution substrate is Spark; these defaults are
chosen so the same logical plans survive a 1000-executor / 100 TB
deployment:

* AQE on (runtime coalescing, skew-join splitting, dynamic join
  selection) — at 100 TB the static plan is always wrong somewhere.
* Arrow on — every pandas_udf / mapInPandas boundary is Arrow-batched.
* UTC session timezone — deterministic timestamp semantics across
  engines (and vs. the DuckDB oracle).
* shuffle partitions sized for the local harness; on a real cluster
  AQE coalesces from a deliberately-high initial number instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def scratch_root() -> str:
    """Root directory for persisted derived artifacts (the trade-pairs
    graph, IVF/PQ index scratch, …): ``$SPARK_GRAFT_SCRATCH_DIR`` when
    set, else the system tempdir.

    The tempdir default is right for the local bench sandbox, but
    tempdirs are node-local and GC-swept — a real deployment must
    point this at a warehouse path all executors can read (VERDICT r9
    "What's wrong #4"). Callers keep their deterministic per-fixture
    tags under this root, so distinct source dirs never collide
    regardless of where the root points."""
    root = os.environ.get("SPARK_GRAFT_SCRATCH_DIR")
    if root:
        return root.rstrip("/")
    import tempfile

    return tempfile.gettempdir()


def scaled_shuffle_width(
    spark: SparkSession,
    est_shuffle_bytes: int,
    bytes_per_partition: int = 32 * 1024 * 1024,
    cap: int = 4096,
) -> int | None:
    """Scale-aware shuffle width (VERDICT r10 #2): the number of
    partitions a corpus-sized exchange should use so per-task
    sort/agg buffers stay bounded as data grows — or ``None`` when the
    session's configured ``spark.sql.shuffle.partitions`` already
    suffices (the caller then changes NOTHING: zero plan delta and
    zero exchange tax at local/sf0.1 scale, where the r9 A/B measured
    a ~10% headline cost for blanket-wide shuffles).

    ``est_shuffle_bytes`` is the caller's estimate of the bytes the
    exchange will carry — typically ``artifacts.dir_bytes(input) ×
    expansion`` where the expansion factor states how the plan blows
    the input up (e.g. the overlap matrix's compressed-text →
    exploded shingle-fp rows is ~20×, measured at the 1000×
    rehearsal: 555 MB parquet → ~11 GB of distinct (source, fp)
    rows). 32 MB per partition keeps each reduce task's hash/sort
    footprint comfortably inside any sane executor heap; the 4096 cap
    bounds scheduler pressure (at 100 TB × any expansion the answer
    is more executors, not more than 4096 partitions per exchange).

    Returns an int to pass to ``DataFrame.repartition(n, *keys)``
    ahead of the wide operator. An explicit keyed repartition is the
    session-safe form of the ledger-0r AQE initialPartitionNum lever:
    the width is baked into THIS plan instead of leaking a session
    conf into every later query, and a distinct/groupBy on the same
    keys reuses the exchange (ClusteredDistribution is satisfied), so
    the plan still has exactly one shuffle."""
    if est_shuffle_bytes < 0:
        raise ValueError(
            f"est_shuffle_bytes must be non-negative, got {est_shuffle_bytes}"
        )
    base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    need = -(-est_shuffle_bytes // bytes_per_partition)  # ceil
    if need <= base:
        return None
    return min(cap, need)


def spread_small_input(df: DataFrame) -> DataFrame:
    """Round-robin a below-parallelism input ahead of CPU-heavy
    per-row work (r16, guide §2.1): a small table is one parquet
    split — and the fixtures are single-row-group files, so the scan
    CANNOT parallelize — which serializes everything up to the first
    exchange (tokenize/shingle/md5 fan-outs measured 2-3 CPU-s on one
    core while 31 idle). When the scan's partition count is below the
    session's parallelism, repartition the (narrow, pre-explode) rows
    out; otherwise return the frame UNCHANGED — at real scale the
    splits already exceed the core count, so this is a no-op by
    construction, not a local tuning constant.

    Callers must be order-insensitive downstream (exact aggregates,
    sorted collects, min/max, distinct): a round-robin exchange
    permutes row order. Every call site in this repo states why it
    qualifies."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)


def configure(builder: SparkSession.Builder, shuffle_partitions: int | None = None) -> SparkSession.Builder:
    """Apply engine defaults to an existing builder (used by the driver's
    entry point, which owns the master URL)."""
    # Shuffles can START wide and let AQE coalesce DOWN to the
    # advisory size — the canonical way to keep per-partition
    # sort/spill bounded as data grows without retuning
    # shuffle.partitions. Measured BOTH ways (r9, BENCH.md ledger
    # 0r): at 100× of sf0.1 a fixed 32-partition shuffle sorts 100×
    # more rows per partition (source_overlap_matrix 52.4 s vs
    # 14.3 s at 256 initial) — but at sf0.1 itself, 256 initial
    # partitions tax EVERY exchange ~0.1-0.4 s (map-side shuffle
    # files + coalesce planning), a measured ~10% headline
    # regression. So the default stays data-proportionate-by-config:
    # unset locally (AQE starts from shuffle.partitions), opt-in via
    # SPARK_GRAFT_INITIAL_PARTITIONS for deployments and the 100×
    # rehearsals (which set 256).
    initial = os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS")
    if initial:
        # fail fast with a readable message (the SPARK_GRAFT_SHUFFLE
        # discipline) instead of an opaque Spark-internal requirement
        # error at plan time
        if int(initial) < 1:
            raise ValueError(
                f"SPARK_GRAFT_INITIAL_PARTITIONS must be >= 1, got {initial!r}"
            )
        builder = builder.config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum", initial
        )
    return (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Explicit driver heap (r6 postmortem): local[*] is driver-mode
        # execution, so EVERY broadcast build lands on the driver heap.
        # Spark's default is 1g; a 59-query bench marathon in one
        # long-lived JVM accumulated broadcast blocks faster than the
        # ContextCleaner freed them and OOM'd flakily
        # (notEnoughMemoryToBuildAndBroadcastTable, BENCH_r06 rc=1).
        # Must be set BEFORE JVM launch — getOrCreate on an existing
        # JVM cannot apply it, which is fine: get_session is the
        # process's first session in every entry point (bench.py, CLI,
        # tests' conftest). Ignored/overridable via spark-submit on a
        # real cluster.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # The ContextCleaner frees a broadcast block only after a JVM
        # GC collects its weak reference; an 8g heap may not GC for the
        # whole marathon, so force a periodic System.gc() well inside
        # the bench's runtime (default 30min would never fire).
        .config("spark.cleaner.periodicGC.interval", "2min")
        # Joins against small dimension tables should broadcast; 16 MB
        # covers every dim table in the star schema at any SF we meet
        # locally, while on a cluster AQE re-derives this at runtime.
        # (r6 postmortem: the previous 64 MB let AQE broadcast
        # mid-size derived tables whose size ESTIMATE was under the
        # threshold but whose built relation was ~5x bigger — each
        # such block parks on the driver heap until a GC cycle.)
        .config("spark.sql.autoBroadcastJoinThreshold", str(16 * 1024 * 1024))
        # Parquet scans: keep splits big enough that a 100 TB table
        # doesn't explode into millions of tiny tasks.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )


def get_session(app_name: str = "cli-rag-spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` for the test
    harness; production deployments pass their own master / rely on
    spark-submit.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    return configure(builder).getOrCreate()
