"""Versioned snapshot tables (sources/snapshots.py): time travel,
bucket-level copy-on-write, merge semantics, commit protocol."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from cli_rag_spark.sources.documents import load_table
from cli_rag_spark.sources.snapshots import (
    latest_version,
    read_snapshot,
    upsert_snapshot,
    write_snapshot,
)


def _orders(spark, sf_dir, n=2000):
    return load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < n)


def key(df):
    return sorted(map(tuple, df.collect()))


def test_v1_roundtrip(spark, sf_dir, tmp_path):
    path = str(tmp_path / "snap")
    orders = _orders(spark, sf_dir)
    assert write_snapshot(orders, path, "o_orderkey") == 1
    assert latest_version(spark, path) == 1
    assert key(read_snapshot(spark, path)) == key(orders)


def test_upsert_merge_semantics_and_time_travel(spark, sf_dir, tmp_path):
    """Update wins on key match, inserts appear, untouched rows carry
    over — and version 1 still reads EXACTLY the original data."""
    path = str(tmp_path / "snap")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")

    updates = orders.where(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_orderstatus", F.lit("R")
    )
    inserts = orders.where(F.col("o_orderkey") % 501 == 5).withColumn(
        "o_orderkey", F.col("o_orderkey") + 1_000_000
    )
    batch = updates.unionByName(inserts)
    assert upsert_snapshot(spark, path, batch) == 2

    v2 = read_snapshot(spark, path, 2)
    expected = (
        orders.join(batch.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(batch)
        .select(*orders.columns)
    )
    assert key(v2) == key(expected)
    # time travel: v1 unchanged
    assert key(read_snapshot(spark, path, 1)) == key(orders)


def test_upsert_rewrites_only_touched_buckets(spark, sf_dir, tmp_path):
    """Copy-on-write claim: v2's data dir contains ONLY the buckets the
    update batch touched; v1 files are untouched and still referenced
    for every other bucket."""
    path = str(tmp_path / "snap")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")
    v1_files = set(glob.glob(f"{path}/data/v1/bucket=*/*.parquet"))

    one_key = orders.where(F.col("o_orderkey") == 42).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    upsert_snapshot(spark, path, one_key)
    assert set(glob.glob(f"{path}/data/v1/bucket=*/*.parquet")) == v1_files
    v2_buckets = {
        p.rsplit("bucket=", 1)[1].split("/")[0]
        for p in glob.glob(f"{path}/data/v2/bucket=*/*.parquet")
    }
    assert len(v2_buckets) == 1  # exactly the touched bucket
    # and the merged v2 read fixes the row
    got = read_snapshot(spark, path).where(F.col("o_orderkey") == 42).collect()
    assert len(got) == 1 and got[0]["o_totalprice"] == 1.0


def test_orphaned_data_dir_is_invisible(spark, sf_dir, tmp_path):
    """A crash between data write and manifest commit leaves an
    orphaned data/v2 that readers must ignore (manifest is the commit
    point)."""
    path = str(tmp_path / "snap")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")
    # simulate the crash: data for v2 exists, manifest was never written
    orders.limit(5).withColumn("bucket", F.lit(0)).write.partitionBy(
        "bucket"
    ).parquet(f"{path}/data/v2")
    assert latest_version(spark, path) == 1
    assert key(read_snapshot(spark, path)) == key(orders)


def test_schema_and_existence_validation(spark, sf_dir, tmp_path):
    path = str(tmp_path / "snap")
    orders = _orders(spark, sf_dir)
    with pytest.raises(ValueError, match="no snapshot table"):
        latest_version(spark, path)
    write_snapshot(orders, path, "o_orderkey")
    with pytest.raises(ValueError, match="no snapshot version 9"):
        read_snapshot(spark, path, 9)
    with pytest.raises(ValueError, match="columns"):
        upsert_snapshot(spark, path, orders.drop("o_orderpriority"))
    with pytest.raises(ValueError, match="bucket"):
        write_snapshot(orders.withColumn("bucket", F.lit(1)), path, "o_orderkey")


def test_delete_cow_and_time_travel(spark, sf_dir, tmp_path):
    """DELETE rewrites only buckets holding a deleted key; other
    buckets stay file-shared with the parent; the pre-delete version
    still reads the full table."""
    import json

    from cli_rag_spark.sources.snapshots import delete_snapshot

    path = str(tmp_path / "snap")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")
    # sparse delete set (a % 13 slice touches all 16 buckets and
    # would rewrite everything — no sharing left to observe)
    keys = orders.where(F.col("o_orderkey") % 499 == 0).select("o_orderkey")
    assert keys.count() > 0
    assert delete_snapshot(spark, path, keys) == 2

    v2 = read_snapshot(spark, path, 2)
    expected = orders.join(keys, "o_orderkey", "left_anti")
    assert key(v2) == key(expected)
    assert key(read_snapshot(spark, path, 1)) == key(orders)

    # file sharing: some buckets must still be owned by v1
    mani = json.load(open(glob.glob(f"{path}/_manifest_v2.json")[0]))
    owners = set(mani["owners"].values())
    assert 1 in owners and 2 in owners


def test_delete_validates_key_frame(spark, sf_dir, tmp_path):
    from cli_rag_spark.sources.snapshots import delete_snapshot

    path = str(tmp_path / "snap")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")
    with pytest.raises(ValueError, match="exactly 1 column"):
        delete_snapshot(spark, path, orders.select("o_orderkey", "o_custkey"))


def test_snapshot_changes_classification(spark, sf_dir, tmp_path):
    """insert/update/delete classified exactly; unchanged co-resident
    rows in rewritten buckets do NOT appear; images are post (upsert)
    and pre (delete)."""
    from cli_rag_spark.sources.snapshots import delete_snapshot, snapshot_changes

    path = str(tmp_path / "snap")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")

    updates = orders.where(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_orderstatus", F.lit("R")
    )
    inserts = orders.where(F.col("o_orderkey") % 501 == 5).withColumn(
        "o_orderkey", F.col("o_orderkey") + 1_000_000
    )
    upsert_snapshot(spark, path, updates.unionByName(inserts))

    diff = snapshot_changes(spark, path, 1, 2)
    got = {r["o_orderkey"]: r["change_type"] for r in diff.collect()}
    exp_updates = {r["o_orderkey"] for r in updates.select("o_orderkey").collect()}
    exp_inserts = {r["o_orderkey"] for r in inserts.select("o_orderkey").collect()}
    assert {k for k, t in got.items() if t == "update"} == exp_updates
    assert {k for k, t in got.items() if t == "insert"} == exp_inserts
    assert len(got) == len(exp_updates) + len(exp_inserts)
    # post-image carried for updates
    st = {r["o_orderkey"]: r["o_orderstatus"] for r in diff.where(F.col("change_type") == "update").collect()}
    assert set(st.values()) == {"R"}

    del_keys = read_snapshot(spark, path, 2).where(
        F.col("o_orderkey") % 11 == 0
    ).select("o_orderkey")
    delete_snapshot(spark, path, del_keys)
    d23 = snapshot_changes(spark, path, 2, 3)
    assert set(d23.select("change_type").distinct().toPandas()["change_type"]) == {"delete"}
    assert d23.count() == del_keys.count()

    with pytest.raises(ValueError, match="from < to"):
        snapshot_changes(spark, path, 2, 2)


def test_snapshot_changes_skips_shared_buckets(spark, sf_dir, tmp_path):
    """CDC must not read buckets whose owner is identical in both
    manifests: diff of a version with itself-plus-empty-merge has no
    divergent buckets and returns an empty frame without scanning."""
    from cli_rag_spark.sources.snapshots import snapshot_changes, upsert_snapshot

    path = str(tmp_path / "snap")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")
    # merge a single key -> exactly the buckets of that one key diverge
    one = orders.where(F.col("o_orderkey") == 7).withColumn(
        "o_orderstatus", F.lit("R")
    )
    upsert_snapshot(spark, path, one)
    diff = snapshot_changes(spark, path, 1, 2)
    rows = diff.collect()
    assert [r["o_orderkey"] for r in rows] == [7]
    assert rows[0]["change_type"] == "update"


def test_vacuum_expires_history_and_preserves_latest(spark, sf_dir, tmp_path):
    """keep_last=1: old versions become unreadable, the latest is
    byte-identical to pre-vacuum, and shared bucket data dirs survive
    (v1's dir still serves buckets never rewritten)."""
    import glob as _glob

    from cli_rag_spark.sources.snapshots import (
        delete_snapshot,
        vacuum_snapshots,
    )

    path = str(tmp_path / "snap")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")
    # SPARSE writes: a broad (%7) upsert would touch all 16 buckets
    # and legitimately unreference v1's data dir — the sharing claim
    # needs v3's owners to still point into v1
    upsert_snapshot(
        spark, path,
        orders.where(F.col("o_orderkey") == 42).withColumn(
            "o_orderstatus", F.lit("R")
        ),
    )
    delete_snapshot(
        spark, path,
        orders.where(F.col("o_orderkey") % 499 == 0).select("o_orderkey"),
    )
    before = key(read_snapshot(spark, path, 3))

    report = vacuum_snapshots(spark, path, keep_last=1)
    assert report["kept_versions"] == [3]
    assert report["removed_versions"] == [1, 2]
    # v3's owners still reference v1 (CoW sharing) -> v1 data survives
    assert _glob.glob(f"{path}/data/v1/bucket=*")
    assert key(read_snapshot(spark, path)) == before
    for gone in (1, 2):
        with pytest.raises(ValueError, match="no snapshot version"):
            read_snapshot(spark, path, gone)
    # idempotent: nothing left to collect
    again = vacuum_snapshots(spark, path, keep_last=1)
    assert again["removed_versions"] == [] and again["removed_data_dirs"] == []

    with pytest.raises(ValueError, match="keep_last"):
        vacuum_snapshots(spark, path, keep_last=0)


def test_vacuum_collects_fully_unreferenced_dirs(spark, sf_dir, tmp_path):
    """A version whose every bucket was later rewritten loses its data
    dir at vacuum."""
    from cli_rag_spark.sources.snapshots import vacuum_snapshots

    path = str(tmp_path / "snap")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")
    # rewrite EVERY bucket (update all rows) -> v1 fully superseded
    upsert_snapshot(
        spark, path, orders.withColumn("o_orderstatus", F.lit("X"))
    )
    report = vacuum_snapshots(spark, path, keep_last=1)
    assert report["removed_versions"] == [1]
    assert report["removed_data_dirs"] == [1]
    import os

    assert not os.path.isdir(f"{path}/data/v1")


def test_snapshot_changes_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    """The CDC slice read must touch ONLY the owner-divergent bucket
    leaves — verified at the file level, not just the filter."""
    from cli_rag_spark.sources.snapshots import snapshot_changes

    path = str(tmp_path / "snap")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")
    one = orders.where(F.col("o_orderkey") == 7).withColumn(
        "o_orderstatus", F.lit("R")
    )
    upsert_snapshot(spark, path, one)
    diff = snapshot_changes(spark, path, 1, 2)
    # the restriction must reach the scans as a PARTITION filter on the
    # bucket column (inputFiles() lists pre-pruning, so probe the plan)
    plan = diff._jdf.queryExecution().executedPlan().toString()
    import re as _re

    pfs = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pfs and all("bucket" in pf for pf in pfs)
    assert diff.count() == 1


def test_delete_that_empties_a_bucket_keeps_table_readable(spark, sf_dir, tmp_path):
    """Review r5 (confirmed repro): deleting every row of a touched
    bucket must not commit a fileless data dir — the emptied bucket
    leaves the owners map, reads skip it, and a later insert recreates
    it."""
    from cli_rag_spark.sources.snapshots import (
        bucket_of,
        delete_snapshot,
    )

    path = str(tmp_path / "snap")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")
    # every key of ONE bucket
    b0 = (
        orders.withColumn("b", bucket_of(F.col("o_orderkey"), 16))
        .where(F.col("b") == 3)
        .select("o_orderkey")
    )
    n_b0 = b0.count()
    assert n_b0 > 0
    delete_snapshot(spark, path, b0)

    v2 = read_snapshot(spark, path)  # must not crash on schema inference
    assert v2.count() == orders.count() - n_b0
    expected = orders.join(b0, "o_orderkey", "left_anti")
    assert key(v2) == key(expected)
    # the bucket comes back on insert
    back = orders.join(b0, "o_orderkey", "semi").limit(3)
    upsert_snapshot(spark, path, back)
    v3 = read_snapshot(spark, path)
    assert v3.count() == orders.count() - n_b0 + 3


def test_vacuum_spares_inflight_newer_data_dir(spark, sf_dir, tmp_path):
    """Review r5: a data dir NEWER than the newest kept manifest may be
    an in-flight commit (data written, manifest rename pending) and
    must survive vacuum; it is collected only once later manifests
    supersede it."""
    from cli_rag_spark.sources.snapshots import vacuum_snapshots

    path = str(tmp_path / "snap")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")
    upsert_snapshot(
        spark, path,
        orders.where(F.col("o_orderkey") == 42).withColumn(
            "o_orderstatus", F.lit("R")
        ),
    )
    # simulate writer mid-commit of v3: data present, manifest not yet
    orders.limit(5).withColumn("bucket", F.lit(0)).write.partitionBy(
        "bucket"
    ).parquet(f"{path}/data/v3")

    report = vacuum_snapshots(spark, path, keep_last=1)
    import os

    assert os.path.isdir(f"{path}/data/v3")  # spared: newer than kept v2
    assert 3 not in report["removed_data_dirs"]
    # the in-flight writer can now finish: nothing it references is gone
    assert key(read_snapshot(spark, path)) == key(read_snapshot(spark, path, 2))


def test_schema_evolution_add_column(spark, sf_dir, tmp_path):
    path = str(tmp_path / "snapevo")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")

    updates = orders.where(F.col("o_orderkey") % 10 == 0).withColumn(
        "flag", F.lit("X")
    )
    # without the flag, evolution is rejected
    with pytest.raises(ValueError, match="allow_evolution"):
        upsert_snapshot(spark, path, updates)
    upsert_snapshot(spark, path, updates, allow_evolution=True)

    # v1 keeps its original schema across the boundary
    v1 = read_snapshot(spark, path, 1)
    assert "flag" not in v1.columns
    # v2: new column present, NULL exactly outside the update set
    v2 = read_snapshot(spark, path, 2)
    assert v2.columns[-1] == "flag"
    flagged = {r.o_orderkey for r in v2.where(F.col("flag").isNotNull()).collect()}
    want = {r.o_orderkey for r in orders.where(F.col("o_orderkey") % 10 == 0).collect()}
    assert flagged == want
    assert v2.count() == orders.count()


def test_schema_evolution_backfills_old_buckets(spark, sf_dir, tmp_path):
    # read restricted to buckets the evolving commit never touched:
    # no read file carries the column, so the manifest's recorded type
    # must backfill it (the _conform path)
    from cli_rag_spark.sources.snapshots import _read_manifest

    path = str(tmp_path / "snapevo2")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")
    one_key = orders.select("o_orderkey").orderBy("o_orderkey").limit(1)
    updates = orders.join(one_key, "o_orderkey").withColumn("score", F.lit(1.5))
    upsert_snapshot(spark, path, updates, allow_evolution=True)

    m = _read_manifest(spark, path, 2)
    untouched = [int(b) for b, v in m["owners"].items() if v == 1][:2]
    assert untouched, "expected v1-owned buckets to survive a 1-key evolution"
    sl = read_snapshot(spark, path, 2, buckets=untouched)
    assert dict(sl.dtypes)["score"] == "double"  # lit(1.5) commits as double
    assert sl.where(F.col("score").isNotNull()).count() == 0


def test_schema_evolution_rejects_missing_columns(spark, sf_dir, tmp_path):
    path = str(tmp_path / "snapevo3")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")
    bad = orders.drop("o_orderdate").withColumn("flag", F.lit(1))
    with pytest.raises(ValueError):
        upsert_snapshot(spark, path, bad, allow_evolution=True)


def test_schema_evolution_then_delete_keeps_types(spark, sf_dir, tmp_path):
    from cli_rag_spark.sources.snapshots import delete_snapshot

    path = str(tmp_path / "snapevo4")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")
    updates = orders.where(F.col("o_orderkey") % 10 == 0).withColumn(
        "flag", F.lit("X")
    )
    upsert_snapshot(spark, path, updates, allow_evolution=True)
    delete_snapshot(
        spark, path, orders.where(F.col("o_orderkey") % 4 == 0).select("o_orderkey")
    )
    v3 = read_snapshot(spark, path, 3)
    assert "flag" in v3.columns
    flagged = {r.o_orderkey for r in v3.where(F.col("flag").isNotNull()).collect()}
    want = {
        r.o_orderkey
        for r in orders.where(
            (F.col("o_orderkey") % 10 == 0) & (F.col("o_orderkey") % 4 != 0)
        ).collect()
    }
    assert flagged == want


def test_optimize_coalesces_and_preserves_data(spark, sf_dir, tmp_path):
    import os
    from cli_rag_spark.sources.snapshots import optimize_snapshot

    path = str(tmp_path / "snapopt")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders.repartition(6), path, "o_orderkey")
    before = key(read_snapshot(spark, path))
    report = optimize_snapshot(spark, path)
    assert report["version"] == 2
    assert report["files_after"] < report["files_before"]
    assert key(read_snapshot(spark, path)) == before  # lossless
    assert key(read_snapshot(spark, path, 1)) == before  # v1 untouched
    # every optimized bucket dir now holds exactly one file
    for b in report["optimized_buckets"]:
        d = f"{path}/data/v2/bucket={b}"
        assert len([f for f in os.listdir(d) if f.endswith(".parquet")]) == 1


def test_optimize_noop_when_compact(spark, sf_dir, tmp_path):
    from cli_rag_spark.sources.snapshots import optimize_snapshot

    path = str(tmp_path / "snapopt2")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders.repartition(6), path, "o_orderkey")
    optimize_snapshot(spark, path)
    again = optimize_snapshot(spark, path)  # already 1 file/bucket
    assert again["optimized_buckets"] == []
    assert again["version"] == 2  # nothing written
    with pytest.raises(ValueError):
        optimize_snapshot(spark, path, max_files_per_bucket=0)


def test_optimize_respects_max_files_target(spark, sf_dir, tmp_path):
    import os
    from cli_rag_spark.sources.snapshots import optimize_snapshot

    path = str(tmp_path / "snapopt3")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders.repartition(8), path, "o_orderkey")
    before = key(read_snapshot(spark, path))
    report = optimize_snapshot(spark, path, max_files_per_bucket=2)
    assert key(read_snapshot(spark, path)) == before
    for b in report["optimized_buckets"]:
        d = f"{path}/data/v2/bucket={b}"
        assert len([f for f in os.listdir(d) if f.endswith(".parquet")]) <= 2


def test_evolution_rejects_bucket_column_name(spark, sf_dir, tmp_path):
    path = str(tmp_path / "snapevo5")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")
    bad = orders.limit(0).withColumn("bucket", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        upsert_snapshot(spark, path, bad, allow_evolution=True)


def test_refs_tag_resolve_retag_and_validation(spark, sf_dir, tmp_path):
    from cli_rag_spark.sources.snapshots import (
        list_refs,
        read_snapshot_ref,
        resolve_ref,
        tag_snapshot,
    )

    path = str(tmp_path / "snapref")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")
    assert tag_snapshot(spark, path, "stable") == 1
    upsert_snapshot(
        spark, path, orders.where(F.col("o_orderkey") % 5 == 0).withColumn(
            "o_orderstatus", F.lit("X")
        )
    )
    assert resolve_ref(spark, path, "stable") == 1
    assert key(read_snapshot_ref(spark, path, "stable")) == key(orders)
    # retag moves the ref (mutable head semantics)
    tag_snapshot(spark, path, "stable")  # defaults to latest = 2
    assert resolve_ref(spark, path, "stable") == 2
    assert list_refs(spark, path) == {"stable": 2}
    with pytest.raises(ValueError, match="no ref"):
        resolve_ref(spark, path, "missing")
    with pytest.raises(ValueError, match="no snapshot version"):
        tag_snapshot(spark, path, "dangling", 9)
    with pytest.raises(ValueError, match="ref name"):
        tag_snapshot(spark, path, "bad name!")


def test_vacuum_honors_ref_pins(spark, sf_dir, tmp_path):
    from cli_rag_spark.sources.snapshots import tag_snapshot, vacuum_snapshots

    path = str(tmp_path / "snapref2")
    orders = _orders(spark, sf_dir)
    write_snapshot(orders, path, "o_orderkey")
    tag_snapshot(spark, path, "pin", 1)
    for m in (5, 7):
        upsert_snapshot(
            spark, path,
            orders.where(F.col("o_orderkey") % m == 0).withColumn(
                "o_orderstatus", F.lit("X")
            ),
        )
    report = vacuum_snapshots(spark, path, keep_last=1)
    assert 1 in report["kept_versions"]      # pinned survives
    assert 2 in report["removed_versions"]   # unpinned mid history GC'd
    assert key(read_snapshot(spark, path, 1)) == key(orders)


class TestOptimisticConcurrency:
    """Two writers racing the same base version: exactly ONE commits,
    the loser raises ConcurrentCommitError cleanly, the winner's data
    survives byte-for-byte, and the table is readable throughout —
    the Iceberg/Delta optimistic-concurrency contract (VERDICT r5
    #5)."""

    def test_interleaved_upserts_exactly_one_commits(self, spark, sf_dir, tmp_path):
        from cli_rag_spark.sources.snapshots import ConcurrentCommitError

        path = str(tmp_path / "snap")
        orders = _orders(spark, sf_dir)
        write_snapshot(orders, path, "o_orderkey")

        upd_a = orders.where(F.col("o_orderkey") % 11 == 0).withColumn(
            "o_orderstatus", F.lit("A")
        )
        upd_b = orders.where(F.col("o_orderkey") % 13 == 0).withColumn(
            "o_orderstatus", F.lit("B")
        )
        # writer A commits v2 from base v1
        assert upsert_snapshot(spark, path, upd_a, version=1) == 2
        expected_v2 = key(
            orders.join(upd_a.select("o_orderkey"), "o_orderkey", "left_anti")
            .unionByName(upd_a)
            .select(*orders.columns)
        )
        # writer B raced from the SAME base v1 (its read happened
        # before A's commit) — it must lose cleanly
        with pytest.raises(ConcurrentCommitError, match="version 2"):
            upsert_snapshot(spark, path, upd_b, version=1)
        # exactly one commit: latest is still v2, with A's data intact
        assert latest_version(spark, path) == 2
        assert key(read_snapshot(spark, path, 2)) == expected_v2
        assert key(read_snapshot(spark, path)) == expected_v2
        # v1 untouched (time travel through the failed commit)
        assert key(read_snapshot(spark, path, 1)) == key(orders)
        # the loser left no visible artifact: no staging dirs, no
        # orphan data/v3, no manifest beyond v2
        import os

        leftovers = [
            d for d in os.listdir(os.path.join(path, "data"))
            if d.startswith(".staged_v")
        ]
        assert leftovers == []
        assert not os.path.exists(os.path.join(path, "data", "v3"))
        assert not os.path.exists(os.path.join(path, "_manifest_v3.json"))
        # B retries against the NEW latest and succeeds as v3
        assert upsert_snapshot(spark, path, upd_b) == 3
        assert latest_version(spark, path) == 3

    def test_delete_racing_upsert_loses_cleanly(self, spark, sf_dir, tmp_path):
        from cli_rag_spark.sources.snapshots import (
            ConcurrentCommitError,
            delete_snapshot,
        )

        path = str(tmp_path / "snap")
        orders = _orders(spark, sf_dir)
        write_snapshot(orders, path, "o_orderkey")
        upd = orders.where(F.col("o_orderkey") % 5 == 0).withColumn(
            "o_orderstatus", F.lit("U")
        )
        assert upsert_snapshot(spark, path, upd, version=1) == 2
        with pytest.raises(ConcurrentCommitError):
            delete_snapshot(
                spark, path, orders.select("o_orderkey").limit(10), version=1
            )
        assert latest_version(spark, path) == 2

    def test_vacuum_collects_crashed_staging_dirs(self, spark, sf_dir, tmp_path):
        from cli_rag_spark.sources.snapshots import vacuum_snapshots

        path = str(tmp_path / "snap")
        orders = _orders(spark, sf_dir)
        write_snapshot(orders, path, "o_orderkey")
        upd = orders.limit(50).withColumn("o_orderstatus", F.lit("X"))
        upsert_snapshot(spark, path, upd)  # v2

        import os

        # simulate a writer that crashed mid-stage for an already-
        # decided version (<= newest kept): must be collected
        crashed = os.path.join(path, "data", ".staged_v2_deadbeef0000")
        os.makedirs(crashed)
        open(os.path.join(crashed, "part-0.parquet"), "wb").close()
        # and an IN-FLIGHT staging for the next version: must survive
        inflight = os.path.join(path, "data", ".staged_v3_cafecafe0000")
        os.makedirs(inflight)

        vacuum_snapshots(spark, path, keep_last=2)
        assert not os.path.exists(crashed)
        assert os.path.exists(inflight)

    def test_truly_concurrent_upserts_one_winner(self, spark, sf_dir, tmp_path):
        """TWO THREADS upserting from the same base at the same time —
        the O_EXCL claim must serialize them: exactly one commit,
        exactly one ConcurrentCommitError, winner's data intact
        (the sequential stale-base test above can't exercise the
        claim under real overlap)."""
        import threading

        from cli_rag_spark.sources.snapshots import ConcurrentCommitError

        path = str(tmp_path / "snap")
        orders = _orders(spark, sf_dir)
        write_snapshot(orders, path, "o_orderkey")
        outcomes: dict[str, object] = {}

        def writer(tag: str, mod: int):
            upd = orders.where(F.col("o_orderkey") % mod == 0).withColumn(
                "o_orderstatus", F.lit(tag)
            )
            try:
                outcomes[tag] = upsert_snapshot(spark, path, upd, version=1)
            except ConcurrentCommitError:
                outcomes[tag] = "lost"
            except Exception as e:  # pragma: no cover - diagnostic
                outcomes[tag] = f"unexpected: {e}"

        ta = threading.Thread(target=writer, args=("A", 11))
        tb = threading.Thread(target=writer, args=("B", 13))
        ta.start(); tb.start(); ta.join(); tb.join()

        vals = sorted(str(v) for v in outcomes.values())
        assert vals == ["2", "lost"], outcomes
        winner = next(t for t, v in outcomes.items() if v == 2)
        assert latest_version(spark, path) == 2
        v2 = read_snapshot(spark, path, 2)
        # the winner's status value is present, the loser's absent
        stats = {r["o_orderstatus"] for r in v2.select("o_orderstatus").distinct().collect()}
        assert winner in stats
        assert ({"A", "B"} - {winner}).pop() not in stats

    def test_crashed_claim_expires_by_ttl(self, spark, sf_dir, tmp_path):
        """A writer that crashes BETWEEN claim and manifest publish
        leaves a lock at latest+1. Within the TTL that claim is
        honored (could be in-flight) and commits of v2 lose cleanly;
        once the lock AGES past CLAIM_TTL_SECONDS with no manifest,
        the next claimant steals it and the table unwedges — the
        ADVICE r6 permanent-wedge is gone."""
        import os
        import time

        from cli_rag_spark.sources.snapshots import (
            ConcurrentCommitError,
        )

        path = str(tmp_path / "snap")
        orders = _orders(spark, sf_dir)
        write_snapshot(orders, path, "o_orderkey")
        # simulate the crash: claim v2 exists, no manifest
        lock = os.path.join(path, "._commit_v2.lock")
        open(lock, "wb").close()
        upd = orders.limit(20).withColumn("o_orderstatus", F.lit("X"))
        # fresh lock: honored — may be a live in-flight commit
        with pytest.raises(ConcurrentCommitError, match="version 2"):
            upsert_snapshot(spark, path, upd)
        assert latest_version(spark, path) == 1
        # age the lock past the TTL: the claim is stolen and the
        # previously-wedged upsert succeeds
        old = time.time() - 16 * 60
        os.utime(lock, (old, old))
        assert upsert_snapshot(spark, path, upd) == 2
        assert latest_version(spark, path) == 2

    def test_vacuum_collects_aged_stale_lock(self, spark, sf_dir, tmp_path):
        """Vacuum removes a manifest-less claim lock older than the
        TTL (crashed writer) but never a fresh one (possible
        in-flight commit) nor a committed version's lock."""
        import os
        import time

        from cli_rag_spark.sources.snapshots import vacuum_snapshots

        path = str(tmp_path / "snap")
        orders = _orders(spark, sf_dir)
        write_snapshot(orders, path, "o_orderkey")
        stale = os.path.join(path, "._commit_v2.lock")
        fresh = os.path.join(path, "._commit_v3.lock")
        open(stale, "wb").close()
        open(fresh, "wb").close()
        old = time.time() - 16 * 60
        os.utime(stale, (old, old))
        report = vacuum_snapshots(spark, path, keep_last=5)
        assert report["removed_stale_locks"] == [2]
        assert not os.path.exists(stale)
        assert os.path.exists(fresh)
        # v1 committed -> its (historical) lock is never collected
        assert os.path.exists(os.path.join(path, "._commit_v1.lock"))

    def test_force_unlock_overrides_known_dead_writer(self, spark, sf_dir, tmp_path):
        """Operator override for a writer known dead before the TTL:
        force_unlock drops a manifest-less lock immediately, refuses
        committed versions and missing locks."""
        import os

        from cli_rag_spark.sources.snapshots import force_unlock

        path = str(tmp_path / "snap")
        orders = _orders(spark, sf_dir)
        write_snapshot(orders, path, "o_orderkey")
        open(os.path.join(path, "._commit_v2.lock"), "wb").close()
        assert force_unlock(spark, path, 2) is True
        assert not os.path.exists(os.path.join(path, "._commit_v2.lock"))
        assert force_unlock(spark, path, 2) is False  # nothing to drop
        assert force_unlock(spark, path, 1) is False  # committed version
        upd = orders.limit(20).withColumn("o_orderstatus", F.lit("X"))
        assert upsert_snapshot(spark, path, upd) == 2

    def test_write_snapshot_existing_table_clear_error(self, spark, sf_dir, tmp_path):
        """Re-initializing a committed table is a user error with a
        clear message, not a misleading ConcurrentCommitError
        (ADVICE r6)."""
        path = str(tmp_path / "snap")
        orders = _orders(spark, sf_dir)
        write_snapshot(orders, path, "o_orderkey")
        with pytest.raises(ValueError, match="already exists"):
            write_snapshot(orders, path, "o_orderkey")
        assert latest_version(spark, path) == 1


class TestStealRaceTolerance:
    def test_steal_refuses_fresh_and_recreated_locks(self, spark, sf_dir, tmp_path):
        """ADVICE r7 #1: the steal must re-verify the lock's identity
        (mtime) before removal — a lock re-created since the staleness
        observation is a CONCURRENT STEALER'S fresh claim and must
        survive."""
        import os
        import time

        from cli_rag_spark.sources.snapshots import _steal_stale_lock

        path = str(tmp_path / "snap")
        write_snapshot(_orders(spark, sf_dir), path, "o_orderkey")
        lock = os.path.join(path, "._commit_v2.lock")
        open(lock, "wb").close()

        # fresh lock: never stolen
        assert _steal_stale_lock(spark, path, 2, ttl_seconds=900) is False
        assert os.path.exists(lock)

        # aged lock: stolen exactly once, file gone, no grave left
        old = time.time() - 16 * 60
        os.utime(lock, (old, old))
        assert _steal_stale_lock(spark, path, 2, ttl_seconds=900) is True
        assert not os.path.exists(lock)
        assert _steal_stale_lock(spark, path, 2, ttl_seconds=900) is False
        graves = [n for n in os.listdir(path) if ".lock.steal_" in n]
        assert graves == []

    def test_steal_refuses_committed_version_lock(self, spark, sf_dir, tmp_path):
        import os
        import time

        from cli_rag_spark.sources.snapshots import _steal_stale_lock

        path = str(tmp_path / "snap")
        write_snapshot(_orders(spark, sf_dir), path, "o_orderkey")
        lock = os.path.join(path, "._commit_v1.lock")  # committed v1
        old = time.time() - 16 * 60
        os.utime(lock, (old, old))
        assert _steal_stale_lock(spark, path, 1, ttl_seconds=900) is False
        assert os.path.exists(lock)

    def test_vacuum_sweeps_orphaned_steal_grave(self, spark, sf_dir, tmp_path):
        """A stealer that crashed between rename and delete leaves a
        grave file; vacuum collects it unconditionally (it is off the
        claim path) while honoring the normal lock rules."""
        import os

        from cli_rag_spark.sources.snapshots import vacuum_snapshots

        path = str(tmp_path / "snap")
        write_snapshot(_orders(spark, sf_dir), path, "o_orderkey")
        grave = os.path.join(path, "._commit_v2.lock.steal_deadbeef0123")
        open(grave, "wb").close()
        vacuum_snapshots(spark, path, keep_last=5)
        assert not os.path.exists(grave)
        # committed v1's historical lock untouched
        assert os.path.exists(os.path.join(path, "._commit_v1.lock"))
