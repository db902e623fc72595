"""Versioned snapshot tables — time travel + bucket-level
copy-on-write upserts (the lakehouse table-format core, à la the
public Iceberg/Delta designs, re-expressed as plain parquet + JSON
manifests so the engine needs nothing beyond Spark itself).

Why this exists at 100 TB: a mutable table needs (a) readers that see
a CONSISTENT version while writers commit, (b) upserts that do not
rewrite the other 99.99% of the data, and (c) the ability to query
yesterday's state (reproducing a training run, auditing a dedup pass).
Plain ``mode("overwrite")`` gives none of those.

Layout::

    <path>/data/v{N}/bucket={b}/*.parquet   -- only buckets vN rewrote
    <path>/_manifest_v{N}.json              -- the COMMIT POINT

A manifest maps every bucket to the version that owns its current
files (``owners``). Version N's data directory contains only the
buckets N rewrote; untouched buckets keep pointing at older data dirs
— file-level sharing, so an upsert touching k of B buckets costs
O(k/B · table), not O(table).

Commit protocol (optimistic concurrency, the Iceberg/Delta contract):
data files are STAGED into a unique dot-prefixed attempt dir, then the
writer atomically CLAIMS its target version (O_EXCL lock file — exactly
one writer per version wins), renames the staged dir into
``data/v{N}``, and finally publishes the manifest (tmp + atomic
rename — a reader sees a complete manifest or none). A losing
concurrent writer raises ConcurrentCommitError with its staging
deleted and the table untouched; a crash mid-commit leaves only
invisible staging/orphan dirs (collected by vacuum). Readers resolve
"latest" by listing manifests, so a half-written commit is simply
invisible. A writer that crashes BETWEEN claim and manifest publish
leaves a stale lock at its target version; recovery is TTL-based
claim expiry (the same contract lock-file lakehouse layouts use on
stores without compare-and-swap): a later claimant may STEAL a lock
older than ``CLAIM_TTL_SECONDS`` whose manifest never appeared, and
vacuum collects such aged manifest-less locks too.
:func:`force_unlock` is the operator override for a known-dead
writer. The documented tradeoff: a LIVE writer stalled past the TTL
can lose its claim — the TTL must exceed any plausible
stage-to-publish gap (staging happens BEFORE the claim, so the
claim-to-publish window is metadata-only and short).

Bucketing is the md5(key) % B pattern shared with operators/training.py
— deterministic, engine-replayable (the DuckDB oracle reproduces
bucket routing exactly), and stable under data growth, so a key's
bucket never moves between versions.

Reference parity: the reference's storage is a single rewritten-in-full
.vdb file (vector-db.c write path); versioned bucket-CoW is what that
contract must become at petabyte scale.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS_DEFAULT = 16
_BUCKET_COL = "bucket"
_MODULUS = 10_000  # md5 bucket space, shared convention with training.py
_STAGING_PREFIX = ".staged_v"


def _fs(spark: SparkSession, path: str):
    """Canonical Hadoop FileSystem helper — one implementation for the
    whole package (compaction, snapshots, streaming bridges import
    this name; operators/ann.py delegates here too)."""
    from cli_rag_spark.sources.compaction import _fs as _compaction_fs

    return _compaction_fs(spark, path)


def bucket_of(key, n_buckets: int):
    """Deterministic bucket id of a key column: md5(key) % B via the
    same 15-hex-digit prefix trick as training.split_assignment —
    replayable in any engine with md5."""
    from cli_rag_spark.functions.hashing import md5_int60

    return md5_int60(key.cast("string")) % _MODULUS % n_buckets


def _column_types(df: DataFrame) -> dict[str, str]:
    """Column -> Spark DDL type string, recorded in the manifest so
    readers can backfill columns that predate a bucket's files (see
    read_snapshot's schema-evolution path)."""
    return {f.name: f.dataType.simpleString() for f in df.schema.fields}


def _manifest_path(spark: SparkSession, path: str, version: int):
    return spark._jvm.org.apache.hadoop.fs.Path(path, f"_manifest_v{version}.json")


class ConcurrentCommitError(RuntimeError):
    """Optimistic-concurrency loser: another writer committed the same
    target version between this writer's base read and its commit.
    The losing transaction leaves only an invisible orphan data dir
    (collected by vacuum); the table stays readable throughout —
    the Iceberg/Delta optimistic contract. Retry = re-read the new
    latest version and re-apply."""


def _lock_path(spark: SparkSession, path: str, version: int):
    return spark._jvm.org.apache.hadoop.fs.Path(path, f"._commit_v{version}.lock")


# Stale-claim expiry: a lock THIS old with no manifest for its version
# is a crashed writer (the claim→publish window is metadata-only; a
# live writer crosses it in milliseconds). 15 minutes is orders of
# magnitude above that window while still unwedging a table within one
# maintenance cycle.
CLAIM_TTL_SECONDS = 15 * 60


def _steal_stale_lock(
    spark: SparkSession, path: str, version: int, ttl_seconds: float
) -> bool:
    """Race-tolerant removal of a STALE claim lock (ADVICE r7 #1: the
    old check-then-delete could delete a CONCURRENT STEALER'S fresh
    lock — stealer A deletes + re-creates, stealer B's staleness
    check ran against the old lock, B deletes A's fresh claim, both
    publish). Guards, in order:

    1. staleness re-verified here (exists, no manifest, mtime older
       than ``ttl_seconds``) — the observed mtime identifies WHICH
       lock we intend to remove;
    2. identity re-checked immediately before removal: if the mtime
       changed, someone re-claimed — our steal is lost;
    3. removal is ``rename`` to a stealer-unique grave name, not
       delete: two stealers renaming the same source race and
       exactly one rename succeeds (the loser sees source-missing),
       so a won rename proves we removed the lock we measured;
       the grave is then deleted (vacuum also sweeps orphaned
       graves from a stealer that crashed mid-steal).

    Returns True iff THIS caller removed the stale lock. The
    mtime-check→rename pair is two filesystem calls, not one atomic
    primitive, so a sub-millisecond interleaving (fresh lock swapped
    in between them) can still lose a fresh claim — see
    :func:`_claim_version`'s invariant note."""
    import time

    fs, _ = _fs(spark, path)
    lock = _lock_path(spark, path, version)
    if fs.exists(_manifest_path(spark, path, version)):
        return False
    try:
        mtime_ms = fs.getFileStatus(lock).getModificationTime()
    except Exception:
        return False  # lock gone — another stealer won
    if (time.time() - mtime_ms / 1000.0) <= ttl_seconds:
        return False
    grave = spark._jvm.org.apache.hadoop.fs.Path(
        path, f"._commit_v{version}.lock.steal_{uuid.uuid4().hex[:12]}"
    )
    try:
        if fs.getFileStatus(lock).getModificationTime() != mtime_ms:
            return False  # re-claimed since we measured: not ours to steal
        if not fs.rename(lock, grave):
            return False  # concurrent stealer renamed it first
    except Exception:
        return False
    try:
        fs.delete(grave, False)
    except Exception:
        pass  # steal already WON (lock is off the claim path); an IO
        # hiccup deleting the grave must not void it — vacuum sweeps
        # orphaned graves
    return True


def force_unlock(spark: SparkSession, path: str, version: int) -> bool:
    """Operator override: drop the claim lock for ``version`` so the
    version number becomes committable again. Refuses (returns False)
    when the version has a committed manifest — that lock is history,
    not a wedge — or when no lock exists. Use when a writer is KNOWN
    dead before the TTL expires; the TTL path (:data:`CLAIM_TTL_SECONDS`)
    recovers the same state automatically."""
    fs, _ = _fs(spark, path)
    lock = _lock_path(spark, path, version)
    if not fs.exists(lock) or fs.exists(_manifest_path(spark, path, version)):
        return False
    return bool(fs.delete(lock, False))


def _claim_version(
    spark: SparkSession, path: str, version: int, ttl_seconds: float = CLAIM_TTL_SECONDS
) -> None:
    """Atomically claim the right to commit ``version``. Exactly one
    writer per version wins the CREATE; every loser raises
    ConcurrentCommitError. Local filesystem: java.io.File.createNewFile
    (POSIX O_CREAT|O_EXCL — atomic; Hadoop's RawLocalFileSystem
    create(overwrite=False) is check-then-create and races).
    Distributed stores: create with overwrite=False, which IS the
    atomic claim primitive on HDFS; any OTHER failure (IO,
    permissions) propagates as itself — only a lost race maps to
    ConcurrentCommitError.

    A lost claim against a STALE lock (older than ``ttl_seconds``,
    manifest never published — a crashed writer) goes through
    :func:`_steal_stale_lock`: the steal re-verifies the lock's
    identity (mtime) and removes it by rename-to-grave, so a stealer
    can no longer delete a CONCURRENT stealer's freshly re-created
    claim (ADVICE r7 #1); a caller whose steal is lost raises rather
    than retrying the create. Invariant note: the steal's
    mtime-check → rename is two filesystem calls, not one atomic
    primitive, so one-writer-per-version is guaranteed by the O_EXCL
    create for LIVE locks, and held for stale-lock recovery up to a
    sub-millisecond mtime-granularity interleaving — a claim
    re-created inside the same filesystem timestamp tick as the
    measured stale lock is indistinguishable from it. Writers that
    cannot tolerate even that window must not share a version number
    within a TTL of a crash (or use force_unlock under operator
    serialization)."""
    fs, _ = _fs(spark, path)
    lock = _lock_path(spark, path, version)

    def _try_claim() -> bool:
        if fs.getUri().getScheme() in (None, "file"):
            jfile = spark._jvm.java.io.File(lock.toUri().getPath())
            return bool(jfile.createNewFile())
        try:
            fs.create(lock, False).close()
            return True
        except Exception:
            # Only an already-held lock is a race; anything else
            # (IO error, permissions) must surface as itself, not
            # masquerade as a lost commit race (ADVICE r6).
            if fs.exists(lock):
                return False
            raise

    claimed = _try_claim()
    if not claimed and _steal_stale_lock(spark, path, version, ttl_seconds):
        claimed = _try_claim()
    if not claimed:
        raise ConcurrentCommitError(
            f"version {version} at {path} was already claimed by a "
            "concurrent writer; re-read the latest version and retry "
            f"(a crashed writer's claim expires after {ttl_seconds:.0f}s; "
            "force_unlock() overrides sooner)"
        )


def _staging_data_dir(path: str, version: int) -> str:
    """Unique per-attempt data staging dir under data/ (dot-prefixed,
    so readers — which resolve dirs via the owners map — and vacuum's
    ``v*`` scan never see it). Writers stage their data here and it is
    RENAMED into ``data/v{version}`` only after the version claim, so
    a losing concurrent writer can never clobber the winner's
    committed files."""
    return f"{path}/data/{_STAGING_PREFIX}{version}_{uuid.uuid4().hex[:12]}"


def _write_manifest(spark: SparkSession, path: str, manifest: dict) -> None:
    """Publish the manifest content atomically: tmp file + rename — a
    reader either sees the complete manifest or no manifest at all.
    Callers must hold the version claim (_commit_version), which
    guarantees the final path is absent."""
    fs, root = _fs(spark, path)
    version = manifest["version"]
    final = _manifest_path(spark, path, version)
    tmp = spark._jvm.org.apache.hadoop.fs.Path(
        path, f"._manifest_v{version}.json.tmp"
    )
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(manifest, sort_keys=True).encode("utf-8")))
    finally:
        out.close()
    if not fs.rename(tmp, final):
        raise RuntimeError(f"manifest commit failed for version {version} at {path}")


def _commit_version(
    spark: SparkSession, path: str, manifest: dict, staged: str | None = None
) -> None:
    """The writer commit point, in order: (1) atomic version claim —
    exactly one writer per version wins, every other raises
    ConcurrentCommitError and its staged data is deleted (the table
    is untouched); (2) rename the staged data dir into
    ``data/v{version}`` — the claim guarantees no committed dir is
    ever overwritten; (3) publish the manifest (atomic rename), the
    point at which readers see the new version."""
    fs, _ = _fs(spark, path)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    version = manifest["version"]
    try:
        _claim_version(spark, path, version)
    except ConcurrentCommitError:
        if staged is not None:
            fs.delete(jpath(staged), True)
        raise
    if staged is not None and fs.exists(jpath(staged)):
        dst = jpath(f"{path}/data/v{version}")
        if not fs.rename(jpath(staged), dst):
            raise RuntimeError(
                f"staged data publish failed for version {version} at {path}"
            )
    _write_manifest(spark, path, manifest)


def _read_manifest(spark: SparkSession, path: str, version: int) -> dict:
    fs, _ = _fs(spark, path)
    mp = _manifest_path(spark, path, version)
    if not fs.exists(mp):
        raise ValueError(f"no snapshot version {version} at {path}")
    stream = fs.open(mp)
    try:
        return json.loads(bytes(stream.readAllBytes()).decode("utf-8"))
    finally:
        stream.close()


def latest_version(spark: SparkSession, path: str) -> int:
    """Highest committed version, resolved by listing manifests (the
    only authority — orphaned data dirs don't count)."""
    fs, root = _fs(spark, path)
    if not fs.exists(root):
        raise ValueError(f"no snapshot table at {path}")
    versions = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if name.startswith("_manifest_v") and name.endswith(".json"):
            versions.append(int(name[len("_manifest_v"):-len(".json")]))
    if not versions:
        raise ValueError(f"no committed snapshot at {path}")
    return max(versions)


def write_snapshot(
    df: DataFrame,
    path: str,
    key_col: str,
    n_buckets: int = N_BUCKETS_DEFAULT,
) -> int:
    """Create version 1 of a snapshot table: all buckets written under
    ``data/v1``, manifest committed last. Returns the version (1)."""
    if _BUCKET_COL in df.columns:
        raise ValueError(f"input already has a {_BUCKET_COL!r} column")
    spark = df.sparkSession
    fs, _ = _fs(spark, path)
    if fs.exists(_manifest_path(spark, path, 1)):
        # Re-initialization is NOT idempotent under the staged-commit
        # protocol (v1's claim is taken forever); surface that as the
        # clear error it is instead of a misleading "concurrent
        # writer" from the claim (ADVICE r6). Evolve an existing
        # table with upsert/delete/optimize, or write to a new path.
        raise ValueError(
            f"snapshot table already exists at {path} (committed "
            "_manifest_v1.json); use upsert_snapshot/delete_snapshot "
            "to evolve it, or choose a new path"
        )
    staged = _staging_data_dir(path, 1)
    (
        df.withColumn(_BUCKET_COL, bucket_of(F.col(key_col), n_buckets))
        .write.mode("overwrite")
        .partitionBy(_BUCKET_COL)
        .parquet(staged)
    )
    _commit_version(spark, path, {
        "version": 1,
        "key_col": key_col,
        "n_buckets": n_buckets,
        "columns": df.columns,
        "column_types": _column_types(df),
        "owners": {str(b): 1 for b in range(n_buckets)},
    }, staged=staged)
    return 1


def read_snapshot(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    buckets: list[int] | None = None,
) -> DataFrame:
    """Read a snapshot AS OF ``version`` (default: latest). Buckets are
    gathered from each owning version's data dir with a filter on the
    PARTITION column — partition pruning keeps the read to exactly the
    owned leaves. ``buckets`` restricts the read to a subset of bucket
    ids (still via the partition column, so the pruning composes —
    the CDC reader's manifest-pruned scan rides this)."""
    if version is None:
        version = latest_version(spark, path)
    manifest = _read_manifest(spark, path, version)
    by_owner: dict[int, list[int]] = {}
    for b, v in manifest["owners"].items():
        if buckets is not None and int(b) not in buckets:
            continue
        by_owner.setdefault(int(v), []).append(int(b))
    if not by_owner:
        # schema must come from a data dir that still exists (vacuum
        # may have collected v1): any dir referenced by THIS manifest,
        # else any surviving data/v* dir
        fs, _ = _fs(spark, path)
        candidates = sorted({int(v) for v in manifest["owners"].values()})
        if not candidates:
            data_root = spark._jvm.org.apache.hadoop.fs.Path(path, "data")
            if fs.exists(data_root):
                candidates = sorted(
                    int(st.getPath().getName()[1:])
                    for st in fs.listStatus(data_root)
                    if st.getPath().getName().startswith("v")
                )
        if not candidates:
            raise ValueError(
                f"snapshot at {path} has no data files to derive a schema from"
            )
        empty = spark.read.parquet(
            f"{path}/data/v{candidates[-1]}"
        ).where(F.lit(False))
        return _conform(empty, manifest)
    parts = []
    for v, owned in sorted(by_owner.items()):
        part = (
            spark.read.parquet(f"{path}/data/v{v}")
            .where(F.col(_BUCKET_COL).isin(owned))
        )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        # allowMissingColumns: buckets written before an add-column
        # evolution lack the added columns; the union NULL-fills them
        out = out.unionByName(p, allowMissingColumns=True)
    return _conform(out, manifest)


def _conform(df: DataFrame, manifest: dict) -> DataFrame:
    """Project ``df`` to the manifest's schema, backfilling columns no
    read file carried (possible when every read bucket predates an
    add-column evolution) as typed NULLs from the manifest's recorded
    column types."""
    missing = [c for c in manifest["columns"] if c not in df.columns]
    if missing:
        types = manifest.get("column_types") or {}
        untyped = [c for c in missing if c not in types]
        if untyped:
            raise ValueError(
                f"cannot backfill columns {untyped}: no recorded types "
                "(manifest predates schema-evolution support)"
            )
        for c in missing:
            df = df.withColumn(c, F.lit(None).cast(types[c]))
    return df.select(*manifest["columns"])


def upsert_snapshot(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    version: int | None = None,
    allow_evolution: bool = False,
) -> int:
    """Commit a new version applying MERGE semantics (update wins on
    key match, new keys insert) with bucket-level copy-on-write: only
    buckets containing an updated key are rewritten; every other
    bucket's files are shared with the parent version via the manifest.

    ``allow_evolution=True`` permits ADD-COLUMN schema evolution — the
    metadata-only kind real table formats allow by default: ``updates``
    may carry columns the table does not have yet. Added columns are
    appended to the table schema in the manifest; existing rows
    (untouched buckets AND unmatched rows inside touched buckets) read
    back as NULL for them — no historical file is rewritten. Drops and
    renames stay errors (they would be silent data loss under CoW file
    sharing). Old versions keep their own column list, so time travel
    across the evolution boundary shows each version's true schema.

    The touched-bucket list is one bounded collect (≤ n_buckets rows).
    Returns the new version number."""
    if version is None:
        version = latest_version(spark, path)
    manifest = _read_manifest(spark, path, version)
    key_col, n_buckets = manifest["key_col"], manifest["n_buckets"]
    added = [c for c in updates.columns if c not in manifest["columns"]]
    missing = [c for c in manifest["columns"] if c not in updates.columns]
    if _BUCKET_COL in added:
        # same guard write_snapshot applies: the physical partition
        # column must never enter the logical schema (an empty-batch
        # evolution would otherwise commit it into the manifest)
        raise ValueError(
            f"updates may not add a column named {_BUCKET_COL!r} "
            "(reserved for the physical bucket layout)"
        )
    if missing or (added and not allow_evolution):
        raise ValueError(
            f"updates columns {sorted(updates.columns)} != table columns "
            f"{sorted(manifest['columns'])}"
            + (" (pass allow_evolution=True to add columns)" if added and not missing else "")
        )
    table_columns = manifest["columns"] + added
    column_types = dict(manifest.get("column_types") or {})
    if added:
        column_types.update(
            {c: t for c, t in _column_types(updates).items() if c in added}
        )
    new_version = version + 1

    upd = updates.withColumn(_BUCKET_COL, bucket_of(F.col(key_col), n_buckets))
    touched = sorted(
        r[_BUCKET_COL]
        for r in upd.select(_BUCKET_COL).distinct().collect()
    )
    staged = _staging_data_dir(path, new_version) if touched else None
    if touched:
        # the touched slice rides read_snapshot's PARTITION-column
        # filter (pruned scan of the touched leaves only — the
        # O(k/B · table) contract; the bucket column is re-derived
        # afterwards purely for the partitioned write)
        current = read_snapshot(
            spark, path, version, buckets=touched
        ).withColumn(_BUCKET_COL, bucket_of(F.col(key_col), n_buckets))
        cols = table_columns + [_BUCKET_COL]
        merged = (
            current.join(upd.select(key_col), key_col, "left_anti")
            # evolution: surviving current rows lack the added columns
            # and take NULLs; the final select pins the column order
            .unionByName(
                upd.select(*[c for c in cols if c in upd.columns]),
                allowMissingColumns=True,
            )
            .select(*cols)
        )
        (
            merged.write.mode("overwrite")
            .partitionBy(_BUCKET_COL)
            .parquet(staged)
        )
    owners = dict(manifest["owners"])
    for b in touched:
        owners[str(b)] = new_version
    _commit_version(spark, path, {
        "version": new_version,
        "key_col": key_col,
        "n_buckets": n_buckets,
        "columns": table_columns,
        "column_types": column_types,
        "owners": owners,
    }, staged=staged)
    return new_version


def delete_snapshot(
    spark: SparkSession,
    path: str,
    keys: DataFrame,
    version: int | None = None,
) -> int:
    """Commit a new version with the given keys DELETED, bucket-level
    copy-on-write: only buckets containing a deleted key are rewritten
    (anti-join inside the touched slice); everything else stays shared
    with the parent version. ``keys`` is a 1-column frame of key
    values. Same commit protocol as upsert_snapshot — data first,
    manifest rename last. Returns the new version."""
    if len(keys.columns) != 1:
        raise ValueError(f"keys must have exactly 1 column, got {keys.columns}")
    if version is None:
        version = latest_version(spark, path)
    manifest = _read_manifest(spark, path, version)
    key_col, n_buckets = manifest["key_col"], manifest["n_buckets"]
    new_version = version + 1

    dk = keys.toDF(key_col).withColumn(
        _BUCKET_COL, bucket_of(F.col(key_col), n_buckets)
    )
    touched = sorted(
        r[_BUCKET_COL] for r in dk.select(_BUCKET_COL).distinct().collect()
    )
    emptied: set[int] = set()
    staged: str | None = None
    if touched:
        # pruned read of the touched leaves only (same contract as
        # upsert_snapshot)
        current = read_snapshot(
            spark, path, version, buckets=touched
        ).withColumn(_BUCKET_COL, bucket_of(F.col(key_col), n_buckets))
        cols = manifest["columns"] + [_BUCKET_COL]
        remaining = current.join(dk.select(key_col), key_col, "left_anti").select(*cols)
        # a delete can empty SOME or ALL touched buckets. A partition
        # missing from the new data dir reads as zero rows (fine), but
        # a dir with NO part files at all fails schema inference on
        # read — so fully-emptied buckets leave the owners map instead
        # of pointing at a fileless dir, and if nothing remains the
        # dir isn't written. One extra narrow aggregate per delete
        # commit pays for the guarantee.
        kept_buckets = {
            r[_BUCKET_COL]
            for r in remaining.select(_BUCKET_COL).distinct().collect()
        }
        emptied = set(touched) - kept_buckets
        if kept_buckets:
            staged = _staging_data_dir(path, new_version)
            (
                remaining.write.mode("overwrite")
                .partitionBy(_BUCKET_COL)
                .parquet(staged)
            )
    owners = dict(manifest["owners"])
    for b in touched:
        if b in emptied:
            owners.pop(str(b), None)  # bucket has no rows in this version
        else:
            owners[str(b)] = new_version
    _commit_version(spark, path, {
        "version": new_version,
        "key_col": key_col,
        "n_buckets": n_buckets,
        "columns": manifest["columns"],
        "column_types": manifest.get("column_types"),
        "owners": owners,
    }, staged=staged)
    return new_version


def snapshot_changes(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int,
) -> DataFrame:
    """CDC between two committed versions: one row per changed key with
    ``change_type`` ∈ insert / update / delete and the post-image
    columns (pre-image for deletes).

    The manifests make this cheap: a bucket whose owner entry is the
    SAME in both versions is physically the same files — it cannot
    contain a change and is never read. Only owner-divergent buckets
    are scanned and full-outer-joined on the key (bucket-colocated on
    both sides, so at scale the join shuffles only rewritten buckets).
    Rows rewritten byte-identically (co-resident in a touched bucket)
    compare equal and are filtered out — the diff is semantic, not
    physical.
    """
    if from_version >= to_version:
        raise ValueError(f"need from < to, got {from_version} >= {to_version}")
    mf = _read_manifest(spark, path, from_version)
    mt = _read_manifest(spark, path, to_version)
    key_col = mt["key_col"]
    cols = [c for c in mt["columns"] if c != key_col]
    changed = sorted(
        int(b)
        for b in set(mf["owners"]) | set(mt["owners"])
        if mf["owners"].get(b) != mt["owners"].get(b)
    )

    def _slice(version: int) -> DataFrame:
        # restriction goes through read_snapshot's partition-column
        # filter — the owner-divergent buckets are PRUNED at the scan,
        # not filtered after a full read (plan-asserted in tests)
        return read_snapshot(spark, path, version, buckets=changed)

    old = _slice(from_version).select(
        F.col(key_col), F.struct(*cols).alias("_pre")
    )
    new = _slice(to_version).select(
        F.col(key_col), F.struct(*cols).alias("_post")
    )
    joined = old.join(new, key_col, "full_outer")
    change = (
        F.when(F.col("_pre").isNull(), F.lit("insert"))
        .when(F.col("_post").isNull(), F.lit("delete"))
        .when(F.col("_pre") != F.col("_post"), F.lit("update"))
    )
    image = F.coalesce(F.col("_post"), F.col("_pre"))
    return (
        joined.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(F.col(key_col), F.col("change_type"), image.alias("_img"))
        .select(key_col, "change_type", "_img.*")
    )


def vacuum_snapshots(
    spark: SparkSession, path: str, keep_last: int = 2
) -> dict:
    """Expire all but the last ``keep_last`` versions and delete data
    directories no retained manifest references — the table-format
    lifecycle's garbage collection (time travel is only affordable if
    history can be bounded).

    Safety order: expired MANIFESTS are deleted FIRST, then data dirs
    that are no longer referenced by any remaining manifest. A crash
    mid-vacuum therefore leaves either (a) extra unreferenced data
    (invisible to readers, re-collected next vacuum) or (b) expired
    manifests still present with their data intact — never a
    referenced-but-deleted bucket. A version's data dir is retained if
    ANY kept manifest's owners map points into it (bucket CoW means
    old dirs keep serving buckets newer versions never rewrote).

    Driver-only metadata operation: cost is O(versions + buckets),
    no Spark job. Returns {"kept_versions", "removed_versions",
    "removed_data_dirs", "removed_stale_locks"}.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    fs, root = _fs(spark, path)
    latest = latest_version(spark, path)
    all_versions = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if name.startswith("_manifest_v") and name.endswith(".json"):
            all_versions.append(int(name[len("_manifest_v"):-len(".json")]))
    # named refs PIN their versions against GC (tag_snapshot's
    # contract): a tagged training-run snapshot survives any
    # keep_last window until the ref is deleted
    pinned = set(list_refs(spark, path).values())
    keep = sorted(
        v for v in all_versions if v > latest - keep_last or v in pinned
    )
    drop = sorted(v for v in all_versions if v not in keep)

    referenced: set[int] = set()
    for v in keep:
        manifest = _read_manifest(spark, path, v)
        referenced.update(int(owner) for owner in manifest["owners"].values())

    for v in drop:
        fs.delete(_manifest_path(spark, path, v), False)
        fs.delete(_lock_path(spark, path, v), False)  # stale claim files go with their version

    # Crashed-writer claim locks: a manifest-less lock older than the
    # claim TTL is a writer that died between claim and publish; left
    # in place it would burn its version number forever (every future
    # committer of latest+1 loses). Same staleness predicate as the
    # claim-time steal, so vacuum and claimants agree on what "dead"
    # means. Younger manifest-less locks may be in-flight commits and
    # are never touched.
    removed_locks = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if name.startswith("._commit_v") and ".lock.steal_" in name:
            # orphaned steal grave: a stealer that crashed between
            # rename and delete (_steal_stale_lock step 3). The grave
            # is off the claim path already — always collectable.
            fs.delete(status.getPath(), False)
            continue
        if name.startswith("._commit_v") and name.endswith(".lock"):
            v = int(name[len("._commit_v"):-len(".lock")])
            # route through the race-tolerant steal (ADVICE r7 #1
            # genus): a plain stale-check-then-delete here could
            # delete a claimant's FRESH re-claim created between the
            # check and the delete
            if _steal_stale_lock(spark, path, v, CLAIM_TTL_SECONDS):
                removed_locks.append(v)

    removed_dirs = []
    data_root = spark._jvm.org.apache.hadoop.fs.Path(path, "data")
    newest_kept = max(keep) if keep else 0
    if fs.exists(data_root):
        for status in fs.listStatus(data_root):
            name = status.getPath().getName()
            if name.startswith(_STAGING_PREFIX):
                # crashed-writer staging garbage: same version-ordering
                # age gate as orphan dirs (a staging dir AT or BELOW
                # the newest kept manifest lost its race or crashed —
                # its version is committed or expired either way)
                v = int(name[len(_STAGING_PREFIX):].split("_")[0])
                if v <= newest_kept:
                    fs.delete(status.getPath(), True)
                continue
            if not name.startswith("v"):
                continue
            v = int(name[1:])
            # version-ordering gate: a dir NEWER than the newest kept
            # manifest may be an IN-FLIGHT commit (data written,
            # manifest rename pending — the documented commit order),
            # so it is never collected here; once a later manifest
            # commits, a crashed orphan falls behind and is collected
            # on the next vacuum. This is the age-gating real table
            # formats apply to orphan deletion, keyed on the version
            # counter instead of mtime.
            if v not in referenced and v <= newest_kept:
                fs.delete(status.getPath(), True)
                removed_dirs.append(v)

    return {
        "kept_versions": keep,
        "removed_versions": drop,
        "removed_data_dirs": sorted(removed_dirs),
        "removed_stale_locks": sorted(removed_locks),
    }


def optimize_snapshot(
    spark: SparkSession,
    path: str,
    max_files_per_bucket: int = 1,
    version: int | None = None,
) -> dict:
    """OPTIMIZE — coalesce each bucket's small files into at most
    ``max_files_per_bucket``, committed as a NEW version with
    byte-identical data (the lakehouse maintenance op next to vacuum:
    CoW rewrites and parallel writers leave every bucket as many part
    files as tasks touched it; small files tax every subsequent scan).

    Only buckets whose current file count exceeds the target are
    rewritten — untouched buckets keep sharing their parent version's
    files, so OPTIMIZE costs O(fragmented fraction), not O(table).
    Same commit protocol as every other writer here: data first,
    manifest rename last; a crash leaves an invisible orphan dir.

    Returns {"version", "optimized_buckets", "files_before",
    "files_after"} — version is unchanged (and nothing is written)
    when no bucket is fragmented."""
    if max_files_per_bucket < 1:
        raise ValueError("max_files_per_bucket must be >= 1")
    if version is None:
        version = latest_version(spark, path)
    manifest = _read_manifest(spark, path, version)
    n_buckets = manifest["n_buckets"]
    fs, _ = _fs(spark, path)
    Path = spark._jvm.org.apache.hadoop.fs.Path

    def _bucket_files_at(data_dir: str, b: int) -> int:
        d = Path(f"{data_dir}/{_BUCKET_COL}={b}")
        if not fs.exists(d):
            return 0
        return sum(
            1
            for st in fs.listStatus(d)
            if st.getPath().getName().endswith(".parquet")
        )

    counts = {
        int(b): _bucket_files_at(f"{path}/data/v{int(v)}", int(b))
        for b, v in manifest["owners"].items()
    }
    fragmented = sorted(b for b, c in counts.items() if c > max_files_per_bucket)
    files_before = sum(counts.values())
    if not fragmented:
        return {
            "version": version,
            "optimized_buckets": [],
            "files_before": files_before,
            "files_after": files_before,
        }

    new_version = version + 1
    cols = manifest["columns"] + [_BUCKET_COL]
    data = (
        read_snapshot(spark, path, version, buckets=fragmented)
        .withColumn(
            _BUCKET_COL, bucket_of(F.col(manifest["key_col"]), n_buckets)
        )
        .select(*cols)
        # hash-repartition on the partition column (plus a
        # deterministic key-derived salt when >1 file per bucket is
        # allowed): every bucket lands in at most max_files_per_bucket
        # tasks -> at most that many files per bucket dir
        .repartition(
            len(fragmented) * max_files_per_bucket,
            F.col(_BUCKET_COL),
            F.pmod(
                F.xxhash64(F.col(manifest["key_col"])),
                F.lit(max_files_per_bucket),
            ),
        )
    )
    staged = _staging_data_dir(path, new_version)
    data.write.mode("overwrite").partitionBy(_BUCKET_COL).parquet(staged)
    # integrity check BEFORE the commit, against the STAGED dir: a
    # failed target is deleted uncommitted — never a committed
    # version the guard meant to reject
    after = {
        b: (_bucket_files_at(staged, b) if b in fragmented else c)
        for b, c in counts.items()
    }
    bad = {b: c for b, c in after.items() if b in fragmented and c > max_files_per_bucket}
    if bad:
        fs.delete(Path(staged), True)
        raise RuntimeError(
            f"optimize left fragmented buckets {bad} (> {max_files_per_bucket} files); "
            "staged data abandoned uncommitted"
        )
    owners = dict(manifest["owners"])
    for b in fragmented:
        owners[str(b)] = new_version
    _commit_version(spark, path, {
        "version": new_version,
        "key_col": manifest["key_col"],
        "n_buckets": n_buckets,
        "columns": manifest["columns"],
        "column_types": manifest.get("column_types"),
        "owners": owners,
    }, staged=staged)
    files_after = sum(after.values())
    return {
        "version": new_version,
        "optimized_buckets": fragmented,
        "files_before": files_before,
        "files_after": files_after,
    }


_REF_PREFIX = "_ref_"


def tag_snapshot(
    spark: SparkSession, path: str, name: str, version: int | None = None
) -> int:
    """Attach a NAMED REF to a committed version — the table-format
    tag ("training-run-2024-07", "pre-dedup-audit") that makes time
    travel addressable by meaning instead of by number. Refs are tiny
    ``_ref_<name>.json`` files beside the manifests, written with the
    same tmp+rename atomicity; re-tagging an existing name moves it
    (the mutable-branch-head semantics of lakehouse refs). The tagged
    version must be committed — a ref can never dangle at creation.

    Vacuum interplay (documented contract, enforced by vacuum):
    :func:`vacuum_snapshots` retains any version a ref points to, so
    tagging is also a PIN against history GC."""
    if not name or not name.replace("-", "").replace("_", "").isalnum():
        raise ValueError(
            f"ref name must be non-empty [-_ alphanumeric], got {name!r}"
        )
    if version is None:
        version = latest_version(spark, path)
    _read_manifest(spark, path, version)  # must exist (no dangling refs)
    fs, _ = _fs(spark, path)
    Path = spark._jvm.org.apache.hadoop.fs.Path
    final = Path(path, f"{_REF_PREFIX}{name}.json")
    tmp = Path(path, f".{_REF_PREFIX}{name}.json.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps({"name": name, "version": version}).encode()))
    finally:
        out.close()
    fs.delete(final, False)
    if not fs.rename(tmp, final):
        raise RuntimeError(f"ref commit failed for {name!r} at {path}")
    return version


def resolve_ref(spark: SparkSession, path: str, name: str) -> int:
    """Version a named ref points to (ValueError if absent)."""
    fs, _ = _fs(spark, path)
    rp = spark._jvm.org.apache.hadoop.fs.Path(path, f"{_REF_PREFIX}{name}.json")
    if not fs.exists(rp):
        raise ValueError(f"no ref {name!r} at {path}")
    stream = fs.open(rp)
    try:
        return int(json.loads(bytes(stream.readAllBytes()).decode())["version"])
    finally:
        stream.close()


def list_refs(spark: SparkSession, path: str) -> dict[str, int]:
    """All named refs: {name: version}."""
    fs, root = _fs(spark, path)
    out: dict[str, int] = {}
    if not fs.exists(root):
        return out
    for status in fs.listStatus(root):
        n = status.getPath().getName()
        if n.startswith(_REF_PREFIX) and n.endswith(".json"):
            out[n[len(_REF_PREFIX):-len(".json")]] = resolve_ref(
                spark, path, n[len(_REF_PREFIX):-len(".json")]
            )
    return out


def read_snapshot_ref(spark: SparkSession, path: str, name: str) -> DataFrame:
    """Time travel by name: read the version the ref pins."""
    return read_snapshot(spark, path, resolve_ref(spark, path, name))
